"""Driver-window rotation sanity (queries.py::_DRIVER_PRIORITY).

The driver signs only the first ~50 registry entries per round; the
priority list exists so every query eventually gets a signed row. A
typo'd name in the list — or a new query that never enters it —
fails SILENTLY (the query just never gets signed), so pin both
properties here.
"""

from __future__ import annotations

import glob
import json
import os

from polars_text_spark import queries as Q

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_priority_names_all_exist():
    missing = [n for n in Q._DRIVER_PRIORITY if n not in Q.QUERIES]
    assert missing == [], f"typo'd names in _DRIVER_PRIORITY: {missing}"


def test_registry_front_matches_priority_order():
    front = list(Q.QUERIES)[: len(Q._DRIVER_PRIORITY)]
    assert front == [n for n in Q._DRIVER_PRIORITY if n in Q.QUERIES]


def test_never_signed_queries_sit_inside_the_driver_window():
    """Every query with NO driver-signed row in any CORRECTNESS_r*.json
    must sit within the first 50 registry entries, or it cannot get
    one this round either."""
    signed: set[str] = set()
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        try:
            signed |= set(json.load(open(path)))
        except Exception:
            pass
    if not signed:  # fresh clone without driver artifacts
        return
    unsigned = [n for n in Q.QUERIES if n not in signed]
    window = set(list(Q.QUERIES)[:50])
    stranded = [n for n in unsigned if n not in window]
    assert stranded == [], (
        f"never-driver-signed queries outside the 50-row window: "
        f"{stranded} — move them into _DRIVER_PRIORITY's front block"
    )


# every no-oracle fast path and the hash-replayed query that vouches
# for it — sha twins for the seeded fast paths, the oracle-checked
# assemble stage for the full topic pipeline, and the hash-checked
# exact top-k for the recall report built on it. The pair must be
# signed in the SAME driver window, so adjacency in registry order is
# required.
_NO_ORACLE_TWINS = {
    "similarity_topk_lsh": "similarity_topk_lsh_sha",
    "similarity_topk_ivf": "similarity_topk_ivf_sha",
    "near_dedup_simhash": "near_dedup_simhash_sha",
    "embedding_docs": "embedding_docs_sha",
    "topic_modeling": "topic_assemble",
    "similarity_ann_recall": "similarity_topk",
}


def test_no_oracle_fast_paths_adjacent_to_sha_twins():
    """A regression in a seeded fast path (no oracle hash by design)
    must never be driver-signed in a window that excludes its
    hash-checked sha twin: each pair sits ADJACENT in registry order,
    inside the 50-row window."""
    order = list(Q.QUERIES)
    window = set(order[:50])
    for fast, twin in _NO_ORACLE_TWINS.items():
        assert fast in Q.QUERIES and twin in Q.QUERIES
        i, j = order.index(fast), order.index(twin)
        assert abs(i - j) == 1, (
            f"{fast} (pos {i}) not adjacent to {twin} (pos {j})"
        )
        assert fast in window and twin in window, (
            f"twin pair {fast}/{twin} not inside the 50-row window"
        )
