"""2D topic coordinates (bubble-chart layout).

≙ /root/reference/src/topic_modeling/coords.rs: the orchestrator
reduces ALL chunk embeddings to 2D once (a second, visualization-only
pass — mod.rs:69,289-305) and each topic's (x, y) is the centroid of
its member chunks; outliers excluded; memberless topics sit at the
origin (coords.rs:31-59). Pure numpy given the already-collected
matrix — the centroid math is trivial driver-side.
"""

from __future__ import annotations

import numpy as np

from polars_text_spark.operators.topic_modeling.cluster import OUTLIER_LABEL

__all__ = ["topic_coords_2d"]


def topic_coords_2d(
    points_2d: np.ndarray, labels: np.ndarray, n_topics: int
) -> list[tuple[float, float]]:
    coords: list[tuple[float, float]] = []
    for t in range(n_topics):
        members = points_2d[labels == t]
        if len(members) == 0:
            coords.append((0.0, 0.0))
        else:
            centroid = members[:, :2].mean(axis=0)
            coords.append((float(centroid[0]), float(centroid[1])))
    assert all(l == OUTLIER_LABEL or 0 <= l < n_topics for l in np.unique(labels))
    return coords
