"""Driver-side density clustering of reduced chunk embeddings.

The reference clusters with HDBSCAN (Euclidean over L2-normalized
vectors — /root/reference/src/topic_modeling/cluster.rs). No HDBSCAN
implementation ships in this environment, so this module provides a
deterministic density clustering with the same *contract*
(cluster.rs:47-95):

- outliers labeled ``-1``; real labels contiguous from 0;
- ``min_cluster_size`` clamped to [2, n]; ``min_samples`` defaults to
  ``min_cluster_size``;
- ``n < 2`` -> trivial single topic (n_topics = 0 when n == 0);
- deterministic given identical input.

Mechanism (HDBSCAN's skeleton, simplified flat extraction): core
distances from the ``min_samples``-th neighbor, mutual-reachability
distances, a minimum spanning tree, then a single density cut at the
largest significant edge-weight gap; components >= min_cluster_size
become topics, everything else is noise. On separated density peaks
(the regime the reference's own unit tests exercise,
cluster.rs:96-141) this matches HDBSCAN's output; it does not
reproduce HDBSCAN's full condensed-tree extraction on gradual density
fields — a documented deviation. If the ``hdbscan`` package is
importable it is used instead.

O(n^2) distance matrix on the driver — same ceiling as the reduction
stage; fine to ~50k chunks at float32.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "OUTLIER_LABEL",
    "assign_to_clusters",
    "cluster",
    "cluster_geometry",
    "nearest_centroid_labels",
]

OUTLIER_LABEL = -1

# A cut is only taken when the inter-cluster edge is this much longer
# than the intra-cluster scale — prevents fragmenting one uniform blob.
_MIN_GAP_RATIO = 2.0


def _mst_edges(mreach: np.ndarray) -> list[tuple[float, int, int]]:
    """Prim's algorithm over the dense mutual-reachability matrix."""
    n = mreach.shape[0]
    in_tree = np.zeros(n, dtype=bool)
    best = np.full(n, np.inf)
    best_from = np.zeros(n, dtype=np.int64)
    in_tree[0] = True
    best = mreach[0].copy()
    best_from[:] = 0
    edges: list[tuple[float, int, int]] = []
    for _ in range(n - 1):
        candidates = np.where(~in_tree, best, np.inf)
        j = int(np.argmin(candidates))
        edges.append((float(best[j]), int(best_from[j]), j))
        in_tree[j] = True
        improved = mreach[j] < best
        update = improved & ~in_tree
        best[update] = mreach[j][update]
        best_from[update] = j
    return edges


class _UnionFind:
    def __init__(self, n: int) -> None:
        self.parent = list(range(n))

    def find(self, x: int) -> int:
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: int, b: int) -> None:
        self.parent[self.find(a)] = self.find(b)


def cluster(
    points: np.ndarray,
    *,
    min_cluster_size: int = 10,
    min_samples: int | None = None,
) -> tuple[np.ndarray, int]:
    """Label points into topics. Returns (labels, n_topics)."""
    n = len(points)
    if n == 0:
        return np.empty(0, dtype=np.int32), 0
    if n == 1:
        return np.zeros(1, dtype=np.int32), 1

    try:  # pragma: no cover - optional dep
        import hdbscan

        mcs = int(np.clip(min_cluster_size, 2, n))
        kwargs = {"min_cluster_size": mcs, "metric": "euclidean"}
        if min_samples is not None:
            kwargs["min_samples"] = int(np.clip(min_samples, 1, n))
        labels = hdbscan.HDBSCAN(**kwargs).fit_predict(np.asarray(points))
        return _relabel(np.asarray(labels, dtype=np.int32))
    except ImportError:
        pass

    pts = np.asarray(points, dtype=np.float32)
    mcs = int(np.clip(min_cluster_size, 2, n))
    ms = int(np.clip(min_samples if min_samples is not None else mcs, 1, n))

    # Pairwise Euclidean via the Gram matrix: |a-b|^2 = |a|^2 + |b|^2
    # - 2ab. Everything in-place on ONE (n, n) float32 buffer — the
    # n^2 matrix is reused as dist then as mutual reachability, which
    # matters: at n=5k these are 100 MB buffers and the element-wise
    # passes are memory-bandwidth-bound.
    sq = (pts * pts).sum(axis=1)
    buf = pts @ pts.T
    buf *= -2.0
    buf += sq[:, None]
    buf += sq[None, :]
    np.maximum(buf, 0.0, out=buf)
    np.sqrt(buf, out=buf)
    np.fill_diagonal(buf, 0.0)
    # Core distance: distance to the ms-th nearest neighbor (self is
    # the 0th), clamped to the available neighbor count. partition is
    # O(n^2) vs sort's O(n^2 log n).
    k = min(ms, n - 1)
    core = np.partition(buf, k, axis=1)[:, k]
    # Mutual reachability, in place: max(dist, core_i, core_j).
    np.maximum(buf, core[:, None], out=buf)
    np.maximum(buf, core[None, :], out=buf)
    np.fill_diagonal(buf, 0.0)
    mreach = buf

    edges = sorted(_mst_edges(mreach))
    weights = np.array([e[0] for e in edges])

    # Density cut: the FIRST significant jump in the ascending MST edge
    # weights — everything below it is intra-cluster density, everything
    # above is a separation (including any farther jumps, e.g. a lone
    # outlier's edge). Scanning from min_cluster_size-1 keeps noise in
    # the first few near-zero weights from faking a jump.
    threshold = np.inf
    start = max(mcs - 1, 1)
    for i in range(start, len(weights) - 1):
        lo, hi = weights[i], weights[i + 1]
        # lo == 0 (duplicate points) -> any positive hi is an infinite
        # density jump; otherwise require the configured ratio.
        if hi - lo > 1e-9 and hi >= lo * _MIN_GAP_RATIO:
            threshold = (lo + hi) / 2.0
            break

    uf = _UnionFind(n)
    for w, a, b in edges:
        if w <= threshold:
            uf.union(a, b)
    roots = np.array([uf.find(i) for i in range(n)])
    labels = np.full(n, OUTLIER_LABEL, dtype=np.int32)
    for root in np.unique(roots):
        members = np.where(roots == root)[0]
        if len(members) >= mcs:
            labels[members] = root  # temporary; relabeled below
    return _relabel(labels)


def cluster_geometry(
    fit_points: np.ndarray, fit_labels: np.ndarray, n_topics: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-topic (centroid, radius) of a fitted clustering, where the
    radius is the max fit-member distance to its centroid. Small
    (n_topics x dims) — broadcastable to executors for distributed
    nearest-centroid assignment."""
    pts = np.asarray(fit_points, dtype=np.float32)
    centroids = np.zeros((n_topics, pts.shape[1]), dtype=np.float32)
    radii = np.zeros(n_topics, dtype=np.float32)
    for t in range(n_topics):
        members = pts[fit_labels == t]
        centroids[t] = members.mean(axis=0)
        radii[t] = float(
            np.sqrt(((members - centroids[t]) ** 2).sum(axis=1)).max()
        )
    return centroids, radii


def nearest_centroid_labels(
    points: np.ndarray,
    centroids: np.ndarray,
    radii: np.ndarray,
    *,
    radius_slack: float = 1.5,
) -> np.ndarray:
    """Label each point with its nearest centroid when it falls within
    ``radius_slack`` x that topic's fit radius, else OUTLIER_LABEL —
    keeping the fit's noise semantics instead of force-assigning
    everything. Deterministic; O(n * n_topics) batched numpy."""
    pts = np.asarray(points, dtype=np.float32)
    labels = np.full(len(pts), OUTLIER_LABEL, dtype=np.int32)
    if len(pts) == 0 or len(centroids) == 0:
        return labels
    diff = pts[:, None, :] - centroids[None, :, :]
    dist = np.sqrt((diff * diff).sum(axis=2))
    nearest = dist.argmin(axis=1)
    nearest_dist = dist[np.arange(len(pts)), nearest]
    within = nearest_dist <= radii[nearest] * radius_slack
    labels[within] = nearest[within].astype(np.int32)
    return labels


def assign_to_clusters(
    points: np.ndarray,
    fit_idx: np.ndarray,
    fit_labels: np.ndarray,
    n_topics: int,
    *,
    radius_slack: float = 1.5,
) -> np.ndarray:
    """Extend a sampled-fit clustering to every point (driver-side
    form; the distributed pipeline uses :func:`cluster_geometry` +
    :func:`nearest_centroid_labels` inside a pandas UDF instead).

    Fit points keep their fit labels; the rest get nearest-centroid
    labels via :func:`nearest_centroid_labels`."""
    pts = np.asarray(points, dtype=np.float32)
    labels = np.full(len(pts), OUTLIER_LABEL, dtype=np.int32)
    labels[fit_idx] = fit_labels
    if n_topics == 0:
        return labels
    centroids, radii = cluster_geometry(pts[fit_idx], fit_labels, n_topics)
    rest = np.setdiff1d(np.arange(len(pts)), fit_idx, assume_unique=False)
    if len(rest) == 0:
        return labels
    labels[rest] = nearest_centroid_labels(
        pts[rest], centroids, radii, radius_slack=radius_slack
    )
    return labels


def _relabel(labels: np.ndarray) -> tuple[np.ndarray, int]:
    """Make non-outlier labels contiguous from 0, ordered by first
    appearance (deterministic; cluster.rs:58-61 relies on contiguity)."""
    out = labels.copy()
    mapping: dict[int, int] = {}
    for value in labels:
        if value != OUTLIER_LABEL and value not in mapping:
            mapping[value] = len(mapping)
    for old, new in mapping.items():
        out[labels == old] = new
    return out, len(mapping)
