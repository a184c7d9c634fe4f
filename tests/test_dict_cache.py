"""Dictionary-cache protocol (functions/dict_cache.py): versioned
layout, sentinel short-circuit, cross-process lock, atomic install —
the reference's lindera_dict.rs contract, testable without network."""

from __future__ import annotations

import threading

import pytest

from polars_text_spark.functions import dict_cache as dc


@pytest.fixture()
def root(tmp_path, monkeypatch):
    monkeypatch.setenv("LINDERA_DICT_PATH", str(tmp_path))
    return tmp_path


def _fake_fetch(calls):
    def fetch(dest):
        calls.append(dest)
        (dest / dc.SENTINEL).write_text("0 0 0")
        (dest / "dict.words").write_text("w")

    return fetch


def test_versioned_layout_and_env_root(root):
    p = dc.dict_dir("lindera:ja-unidic")
    assert p == root / f"lindera-unidic-{dc.DICT_VERSION}"
    assert dc.archive_url("lindera:ko-dic").endswith(
        f"v{dc.DICT_VERSION}/lindera-ko-dic-{dc.DICT_VERSION}.zip"
    )


def test_unknown_model_id_rejected(root):
    with pytest.raises(ValueError, match="no prebuilt dictionary"):
        dc.ensure_dict("lindera:nope")


def test_install_once_then_sentinel_short_circuits(root):
    calls = []
    p1 = dc.ensure_dict("lindera:jieba", fetch=_fake_fetch(calls))
    assert (p1 / dc.SENTINEL).is_file()
    assert len(calls) == 1
    # second call must not fetch again — lock-free sentinel path
    p2 = dc.ensure_dict("lindera:jieba", fetch=_fake_fetch(calls))
    assert p2 == p1 and len(calls) == 1
    # no stray lock or temp dirs left behind
    leftovers = [q.name for q in root.iterdir() if q.name.startswith(".")]
    assert leftovers == []


def test_fetch_without_sentinel_installs_nothing(root):
    def bad_fetch(dest):
        (dest / "partial.bin").write_text("x")  # no matrix.mtx

    with pytest.raises(RuntimeError, match="did not produce"):
        dc.ensure_dict("lindera:cc-cedict", fetch=bad_fetch)
    assert not dc.dict_dir("lindera:cc-cedict").exists()
    # cache recovers: a good fetch afterwards installs cleanly
    calls = []
    p = dc.ensure_dict("lindera:cc-cedict", fetch=_fake_fetch(calls))
    assert (p / dc.SENTINEL).is_file() and len(calls) == 1


def test_fetch_exception_releases_lock_and_cleans_temp(root):
    def boom(dest):
        (dest / "garbage").write_text("g")
        raise OSError("network died mid-archive")

    with pytest.raises(OSError, match="network died"):
        dc.ensure_dict("lindera:ko-dic", fetch=boom)
    leftovers = [q.name for q in root.iterdir() if q.name.startswith(".")]
    assert leftovers == []  # lock released, temp extract removed
    calls = []
    dc.ensure_dict("lindera:ko-dic", fetch=_fake_fetch(calls))
    assert len(calls) == 1


def test_stale_incomplete_dir_is_replaced(root):
    # a killed process left a dict dir WITHOUT the sentinel
    stale = dc.dict_dir("lindera:ja-ipadic")
    stale.mkdir(parents=True)
    (stale / "half.bin").write_text("h")
    calls = []
    p = dc.ensure_dict("lindera:ja-ipadic", fetch=_fake_fetch(calls))
    assert len(calls) == 1
    assert (p / dc.SENTINEL).is_file()
    assert not (p / "half.bin").exists()  # replaced, not merged


def test_concurrent_ensures_fetch_exactly_once(root):
    started = threading.Event()
    release = threading.Event()
    calls = []

    def slow_fetch(dest):
        calls.append(dest)
        started.set()
        assert release.wait(10)
        (dest / dc.SENTINEL).write_text("0")

    results, errors = [], []

    def run(fetch):
        try:
            results.append(dc.ensure_dict("lindera:ja-unidic", fetch=fetch))
        except Exception as exc:  # pragma: no cover - failure reporting
            errors.append(exc)

    t1 = threading.Thread(target=run, args=(slow_fetch,))
    t1.start()
    assert started.wait(10)
    # second caller arrives while the first holds the lock
    t2 = threading.Thread(target=run, args=(_fake_fetch(calls),))
    t2.start()
    release.set()
    t1.join(20)
    t2.join(20)
    assert not errors
    assert len(results) == 2 and results[0] == results[1]
    assert len(calls) == 1  # loser re-checked the sentinel, never fetched


def test_lock_timeout_names_the_path(root, monkeypatch):
    monkeypatch.setattr(dc, "_LOCK_RETRIES", 3)
    monkeypatch.setattr(dc, "_LOCK_DELAY_S", 0.01)
    target = dc.dict_dir("lindera:jieba")
    lock = root / f".{target.name}.lock"
    lock.write_text("12345")  # leaked by a crashed worker
    with pytest.raises(RuntimeError, match="leaked the lock"):
        dc.ensure_dict("lindera:jieba", fetch=_fake_fetch([]))


def test_default_fetcher_refuses_without_optin(root, monkeypatch):
    monkeypatch.delenv("POLARS_TEXT_ALLOW_DOWNLOAD", raising=False)
    with pytest.raises(RuntimeError, match="downloads are disabled"):
        dc.ensure_dict("lindera:jieba")


def test_prefetch_dictionary_warms_executors(spark, root):
    calls = []
    p = dc.prefetch_dictionary(
        "lindera:ja-ipadic-neologd",
        spark=spark,
        fetch=_fake_fetch(calls),
        # explicit root: executor Python workers do NOT inherit
        # driver env-var changes made after JVM start, so the env
        # override alone would silently point them at ~/.cache
        root=root,
    )
    assert (p / dc.SENTINEL).is_file()
    assert p.parent == root
    # driver fetched once; executor warm tasks (same local FS here)
    # short-circuited on the sentinel instead of re-fetching
    assert len(calls) == 1
    import os

    assert not os.path.exists(
        os.path.expanduser("~/.cache/ldaca")
    ), "warm tasks resolved the default root instead of the override"
