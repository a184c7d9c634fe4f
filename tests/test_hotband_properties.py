"""Property tests for the hot-band guard: for ANY corpus and ANY cap,
the guarded pair set is a SUBSET of the unguarded one (star edges are
clique edges; small buckets are byte-identical), every surviving pair
is exactly verified, and a cap that clears the biggest bucket is a
strict no-op. Hypothesis drives the corpus shapes the unit fixtures
don't: mixed duplicate-family sizes, singletons, near-dups that share
only some buckets."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from polars_text_spark.operators.dedup import (
    lsh_band_stats,
    minhash_lsh_pairs,
)

# a corpus is a list of family sizes; family i gets `size` docs with
# identical text from vocab slice i (disjoint across families), so
# bucket sizes are exactly family sizes and pairs are exact-jaccard 1.0
_FAMILIES = st.lists(st.integers(min_value=1, max_value=12), min_size=1, max_size=5)
_VOCAB = [
    "aqua borea cedar delta ember",
    "fjord glade heath iris juno",
    "karst lumen moss nadir onyx",
    "pique quarry rune sable tarn",
    "umber vale wren xenon yarrow",
]


def _corpus(spark, sizes):
    rows = []
    doc_id = 0
    for fam, size in enumerate(sizes):
        for _ in range(size):
            rows.append((doc_id, _VOCAB[fam]))
            doc_id += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sizes=_FAMILIES, cap=st.integers(min_value=1, max_value=15))
def test_guarded_subset_and_noop_properties(spark, sizes, cap):
    docs = _corpus(spark, sizes)
    kw = dict(jaccard_threshold=0.9, num_perm=16, bands=4)
    guarded = {
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_pairs(docs, band_cap=cap, **kw).collect()
    }
    unguarded = {
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_pairs(docs, band_cap=None, **kw).collect()
    }
    # star + small-bucket pairs are all clique pairs
    assert guarded <= unguarded
    # verification invariant: identical-text families -> jaccard 1.0
    assert all(j == 1.0 for _, _, j in guarded)
    # expected counts: family > cap contributes size-1 star edges,
    # family <= cap its full clique (families never share buckets)
    expect_g = sum(
        (s - 1) if s > cap else s * (s - 1) // 2 for s in sizes
    )
    expect_u = sum(s * (s - 1) // 2 for s in sizes)
    assert len(guarded) == expect_g
    assert len(unguarded) == expect_u
    # a cap clearing the max bucket is a no-op, and the stats frame
    # agrees about saturation
    if cap >= max(sizes):
        assert guarded == unguarded
    stats = lsh_band_stats(
        docs, band_cap=cap, num_perm=16, bands=4
    ).collect()[0]
    assert stats.max_bucket_size == max(sizes)
    assert stats.n_saturated_buckets == 4 * sum(1 for s in sizes if s > cap)
