"""Versioned tokenizer-dictionary cache: the reference's
download-once protocol, re-expressed for a multi-executor deployment.

The reference fetches prebuilt Lindera dictionaries on first use and
installs them under a versioned cache directory with a cross-process
lockfile and an atomic temp-extract + rename
(``/root/reference/src/lindera_dict.rs:29-200``). This module is the
Spark-side analog of that protocol:

- **Versioned layout**: ``${LINDERA_DICT_PATH:-$HOME/.cache/ldaca}/
  <stem>-<version>/`` — the SAME env var, default root, and directory
  naming as the reference, so a machine that already ran the
  reference shares its dictionary cache byte-for-byte.
- **Sentinel short-circuit**: a complete install always contains
  ``matrix.mtx`` (every Lindera dict ships one); its presence means
  "installed", checked lock-free first.
- **Cross-process lockfile**: ``.<dir>.lock`` acquired with
  ``O_CREAT|O_EXCL`` and a bounded retry loop — on a Spark executor
  with 32 task slots, the first ``tokenize`` call otherwise races 32
  Python workers into 32 concurrent downloads of a 100 MB archive.
  One worker fetches; the rest wait on the lock, re-check the
  sentinel, and return.
- **Atomic install**: the fetcher populates a fresh temp directory
  (pid + nonce suffixed); only after the sentinel validates is it
  renamed into place, so a killed worker can never leave a
  half-extracted directory that later calls mistake for a dict.
- **Bounded fetch**: the built-in downloader caps the archive at
  ``MAX_ARCHIVE_BYTES`` like the reference.

The network fetch itself is pluggable (``fetch=`` callable) and the
built-in HTTP fetcher is opt-in via ``POLARS_TEXT_ALLOW_DOWNLOAD=1``
— a 1000-executor job should stage dictionaries deliberately
(``prefetch_dictionary(model_id, spark)``) rather than stampede a
release server from every fresh container.
"""

from __future__ import annotations

import os
import time
import uuid
from pathlib import Path

#: Pinned upstream release — part of the cache directory name, so a
#: version bump can never silently mix files from two releases
#: (lindera_dict.rs:29 pins the same way).
DICT_VERSION = "3.0.7"

#: model id -> artifact stem (lindera_dict.rs:50-59 artifact_stem).
DICT_STEMS = {
    "lindera:cc-cedict": "lindera-cc-cedict",
    "lindera:jieba": "lindera-jieba",
    "lindera:ja-ipadic": "lindera-ipadic",
    "lindera:ja-ipadic-neologd": "lindera-ipadic-neologd",
    "lindera:ja-unidic": "lindera-unidic",
    "lindera:ko-dic": "lindera-ko-dic",
}

#: Every prebuilt Lindera dict contains this file; it doubles as the
#: installed-completely sentinel (lindera_dict.rs:144-147).
SENTINEL = "matrix.mtx"

_ENV_ROOT = "LINDERA_DICT_PATH"
_ENV_ALLOW_DOWNLOAD = "POLARS_TEXT_ALLOW_DOWNLOAD"
_RELEASE_BASE_URL = "https://github.com/lindera/lindera/releases/download"
MAX_ARCHIVE_BYTES = 128 * 1024 * 1024
_LOCK_RETRIES = 300
_LOCK_DELAY_S = 0.1


def cache_root(root: str | os.PathLike | None = None) -> Path:
    """``root`` if given, else ``$LINDERA_DICT_PATH``, else
    ``~/.cache/ldaca`` — the reference's resolution order
    (lindera_dict.rs:76-88) plus an explicit override, because env
    vars set on the driver after JVM start do NOT propagate to
    executor Python workers; cluster callers pass ``root=``."""
    if root is not None:
        return Path(root)
    env = os.environ.get(_ENV_ROOT, "")
    if env:
        return Path(env)
    home = os.environ.get("HOME")
    if not home:
        raise RuntimeError(
            "HOME is not set; cannot resolve the dictionary cache root "
            f"(set {_ENV_ROOT} explicitly)"
        )
    return Path(home) / ".cache" / "ldaca"


def _stem(model_id: str) -> str:
    try:
        return DICT_STEMS[model_id]
    except KeyError:
        raise ValueError(
            f"no prebuilt dictionary for model id {model_id!r}; known: "
            f"{sorted(DICT_STEMS)}"
        ) from None


def dict_dir(
    model_id: str, root: str | os.PathLike | None = None
) -> Path:
    """Where a complete install of this model's dictionary lives."""
    return cache_root(root) / f"{_stem(model_id)}-{DICT_VERSION}"


def archive_url(model_id: str) -> str:
    """Official release-asset URL (lindera_dict.rs:68-74)."""
    stem = _stem(model_id)
    return (
        f"{_RELEASE_BASE_URL}/v{DICT_VERSION}/{stem}-{DICT_VERSION}.zip"
    )


class _DictLock:
    """``O_CREAT|O_EXCL`` lockfile with bounded retry — mutual
    exclusion across PROCESSES (Spark Python workers are separate
    interpreters, so an in-process mutex is useless here). Mirrors
    acquire_dict_lock (lindera_dict.rs:98-120): a leaked lock from a
    SIGKILLed worker times the waiters out with an explicit error
    naming the path, never a silent hang."""

    def __init__(self, path: Path) -> None:
        self.path = path
        self._fd: int | None = None

    def __enter__(self) -> "_DictLock":
        for _ in range(_LOCK_RETRIES):
            try:
                self._fd = os.open(
                    self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY
                )
                os.write(self._fd, str(os.getpid()).encode())
                return self
            except FileExistsError:
                time.sleep(_LOCK_DELAY_S)
        raise RuntimeError(
            f"timed out waiting for dictionary lock {self.path} — if no "
            "other process is installing this dictionary, a crashed "
            "worker leaked the lock; remove the file and retry"
        )

    def __exit__(self, *exc) -> None:
        if self._fd is not None:
            os.close(self._fd)
        try:
            os.remove(self.path)
        except FileNotFoundError:
            pass


def _download_fetcher(model_id: str):
    """Built-in HTTP fetcher: download the official release zip
    (size-capped) and extract it into the destination directory.
    Opt-in: spontaneous network from every executor is the wrong
    default for a cluster — raise with the exact URL and the env flag
    unless downloads were explicitly allowed."""

    def fetch(dest: Path) -> None:
        if os.environ.get(_ENV_ALLOW_DOWNLOAD, "") != "1":
            raise RuntimeError(
                f"dictionary for {model_id!r} is not installed and "
                f"downloads are disabled; either set "
                f"{_ENV_ALLOW_DOWNLOAD}=1, pre-stage {archive_url(model_id)} "
                f"into {dict_dir(model_id)}, or pass an explicit fetch= "
                "callable"
            )
        import io
        import urllib.request
        import zipfile

        req = urllib.request.Request(
            archive_url(model_id), headers={"User-Agent": "polars-text"}
        )
        buf = io.BytesIO()
        with urllib.request.urlopen(req) as resp:
            while True:
                chunk = resp.read(1 << 20)
                if not chunk:
                    break
                buf.write(chunk)
                if buf.tell() > MAX_ARCHIVE_BYTES:
                    raise RuntimeError(
                        f"dictionary archive for {model_id!r} exceeds "
                        f"{MAX_ARCHIVE_BYTES} bytes; refusing"
                    )
        with zipfile.ZipFile(buf) as zf:
            names = zf.namelist()
            # releases wrap contents in a single root dir; unwrap it
            # (extract_unwrapped_root_dir in lindera_dict.rs:199-204)
            roots = {n.split("/", 1)[0] for n in names if n.strip("/")}
            strip = (
                f"{next(iter(roots))}/"
                if len(roots) == 1 and all("/" in n for n in names if n.strip("/"))
                else ""
            )
            for n in names:
                rel = n[len(strip):] if n.startswith(strip) else n
                if not rel or rel.endswith("/"):
                    continue
                target = dest / rel
                if not str(target.resolve()).startswith(str(dest.resolve())):
                    raise RuntimeError(f"zip entry escapes dest: {n!r}")
                target.parent.mkdir(parents=True, exist_ok=True)
                target.write_bytes(zf.read(n))

    return fetch


def ensure_dict(
    model_id: str, fetch=None, *, root: str | os.PathLike | None = None
) -> Path:
    """Path to a complete dictionary install for ``model_id``,
    fetching + installing it first if absent (ensure_dict,
    lindera_dict.rs:138-180).

    ``fetch(dest_dir)`` populates a fresh temp directory; the default
    is the opt-in HTTP fetcher. The install is atomic: validate the
    sentinel in the temp dir, then rename into place. Raises if the
    fetcher produced no sentinel (truncated archive / changed layout)
    — and leaves the cache untouched, so the next call retries from
    scratch rather than trusting a half-install.
    """
    target = dict_dir(model_id, root)
    if (target / SENTINEL).is_file():
        return target
    root = cache_root(root)
    root.mkdir(parents=True, exist_ok=True)
    with _DictLock(root / f".{target.name}.lock"):
        if (target / SENTINEL).is_file():  # raced: winner installed it
            return target
        tmp = root / f".{target.name}.extract.{os.getpid()}.{uuid.uuid4().hex}"
        tmp.mkdir(parents=True)
        try:
            (fetch or _download_fetcher(model_id))(tmp)
            if not (tmp / SENTINEL).is_file():
                raise RuntimeError(
                    f"dictionary fetch for {model_id!r} did not produce "
                    f"{SENTINEL} — archive layout may have changed; "
                    "nothing was installed"
                )
            if target.exists():  # stale incomplete install: replace
                import shutil

                shutil.rmtree(target)
            os.rename(tmp, target)
        finally:
            if tmp.exists():
                import shutil

                shutil.rmtree(tmp, ignore_errors=True)
    return target


def prefetch_dictionary(
    model_id: str,
    spark=None,
    fetch=None,
    *,
    root: str | os.PathLike | None = None,
) -> Path:
    """Stage a dictionary before the first tokenize call — locally,
    and (when ``spark`` is given) on every executor via a small warm-up
    job, the ``prefetch_model`` pattern. On a 1000-executor cluster
    this turns "every container downloads on first use" into one
    deliberate staging pass; per-executor the lockfile still collapses
    concurrent task slots to one fetch. The resolved cache root is
    shipped to the warm tasks explicitly — executor Python workers do
    NOT see driver-side env-var changes made after JVM start."""
    out = ensure_dict(model_id, fetch=fetch, root=root)
    if spark is not None:
        slots = spark.sparkContext.defaultParallelism
        resolved = str(cache_root(root))

        def _warm(_idx):
            ensure_dict(model_id, fetch=fetch, root=resolved)
            return []

        spark.sparkContext.parallelize(range(slots), slots).flatMap(
            _warm
        ).count()
    return out
