"""Driver-side dimensionality reduction for chunk embeddings.

The reference reduces with PaCMAP (seeded, PCA-initialized —
/root/reference/src/topic_modeling/reduce.rs:69-83) and enforces a
hard minimum of 12 points (reduce.rs:44,52-56). PaCMAP/UMAP are not
installed in this environment, so the always-available reducer is a
seeded PCA (numpy SVD with deterministic sign convention) — a
documented deviation. PaCMAP itself is only seeded-approximately
reproducible (reduce.rs:122-135), and the reference keeps exact
reduction output out of CI (mod.rs:21-24), so downstream checks are
structural either way. When the ``pacmap`` package is importable it
is used instead.

Scale note: reduction sees an (n_chunks x dim) float32 matrix on the
driver — at 384-dim MiniLM, 1M chunks ≈ 1.5 GB, the same practical
ceiling the reference has in one process. Beyond that, sample chunks
for the fit (flagged in pipeline docs).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "MIN_POINTS_FOR_REDUCTION",
    "LinearProjector",
    "fit_linear_projector",
    "reduce_embeddings",
    "reduce_with_sampled_fit",
]

MIN_POINTS_FOR_REDUCTION = 12  # reduce.rs:44


class LinearProjector:
    """Picklable fitted linear reduction: ``x -> (x - mean) @ W.T``.

    Small enough (dims x d float64) to ship in a pandas-UDF closure, so
    out-of-sample projection runs ON EXECUTORS — the distributed
    sampled-fit path never materializes the full matrix driver-side."""

    def __init__(self, mean: np.ndarray, components: np.ndarray) -> None:
        self.mean = np.asarray(mean, dtype=np.float64)
        self.components = np.asarray(components, dtype=np.float64)

    def transform(self, matrix: np.ndarray) -> np.ndarray:
        return (
            (np.asarray(matrix, dtype=np.float64) - self.mean)
            @ self.components.T
        ).astype(np.float32)


def fit_linear_projector(fit: np.ndarray, dims: int) -> LinearProjector:
    """Fit the deterministic PCA on ``fit`` rows only (numpy SVD with a
    sign convention making the largest-|loading| coordinate of each
    component positive, so output is unique)."""
    fit64 = np.asarray(fit, dtype=np.float64)
    mean = fit64.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(fit64 - mean, full_matrices=False)
    components = vt[:dims]
    for i in range(components.shape[0]):
        j = int(np.argmax(np.abs(components[i])))
        if components[i, j] < 0:
            components[i] = -components[i]
    return LinearProjector(mean, components)


def _pca(matrix: np.ndarray, dims: int, seed: int) -> np.ndarray:
    # seed is unused by exact PCA but kept for the PaCMAP path.
    return fit_linear_projector(matrix, dims).transform(matrix)


def reduce_embeddings(
    matrix: np.ndarray, dims: int = 5, seed: int = 42
) -> np.ndarray:
    """Reduce (n, d) -> (n, dims). Raises below the 12-point minimum —
    callers branch to the trivial-topic guard first (mod.rs:263-267)."""
    n, d = matrix.shape
    if n < MIN_POINTS_FOR_REDUCTION:
        raise ValueError(
            f"reduction needs >= {MIN_POINTS_FOR_REDUCTION} points, got {n}"
        )
    dims = max(1, min(dims, d, n - 1))
    try:  # pragma: no cover - optional dep
        import pacmap

        reducer = pacmap.PaCMAP(
            n_components=dims,
            MN_ratio=0.5,
            FP_ratio=2.0,
            num_iters=(100, 100, 250),
            random_state=seed,
            apply_pca=True,
        )
        return np.asarray(
            reducer.fit_transform(matrix.astype(np.float32)), dtype=np.float32
        )
    except ImportError:
        return _pca(matrix.astype(np.float64), dims, seed)


def reduce_with_sampled_fit(
    matrix: np.ndarray, fit_idx: np.ndarray, dims: int = 5, seed: int = 42
) -> np.ndarray:
    """Fit the reduction on ``matrix[fit_idx]`` only, then project ALL
    rows — the sampled-fit scale path (SCALING.md, topic modeling):
    above the driver's O(n^2) clustering capacity the fit runs on a
    uniform sample and the projection is a matrix multiply over
    everything. PCA projects exactly; pacmap (when installed) uses its
    ``transform`` for out-of-sample points."""
    n, d = matrix.shape
    fit = matrix[fit_idx]
    if len(fit) < MIN_POINTS_FOR_REDUCTION:
        raise ValueError(
            f"sampled fit needs >= {MIN_POINTS_FOR_REDUCTION} points"
        )
    dims = max(1, min(dims, d, len(fit) - 1))
    try:  # pragma: no cover - optional dep
        import pacmap

        reducer = pacmap.PaCMAP(
            n_components=dims,
            MN_ratio=0.5,
            FP_ratio=2.0,
            num_iters=(100, 100, 250),
            random_state=seed,
            apply_pca=True,
        )
        reducer.fit(fit.astype(np.float32))
        return np.asarray(
            reducer.transform(matrix.astype(np.float32)), dtype=np.float32
        )
    except ImportError:
        return fit_linear_projector(fit, dims).transform(matrix)
