"""Arrow-batched dense scoring (similarity._fold_dot_batch and its
consumers): the bit-exactness contract vs the zip_with/aggregate
expression fold, ragged/null semantics, bounded query-side collects,
and the no-pair-join plan shape.

Round-10 context: the HOF pair dot is CodegenFallback (interpreted,
~7 us/pair measured at dim 64) and an unrolled 64-term expression
blows HotSpot's huge-method JIT limit (2.3x SLOWER than the HOF —
SCALING.md), so the dense O(rows x queries) paths moved to one
vectorized numpy pass that replays the engine's exact left-fold order.
These tests pin that the move changed NOTHING about the values."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_text_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_quantized,
    dot,
    with_l2_normalized,
)


def test_fold_dot_batch_bit_identical_to_hof_expression(spark):
    """Every (vector, query) dot from the Arrow fold must equal the
    zip_with/aggregate expression's left fold EXACTLY (==, not
    approx): same multiply-then-add sequence per element."""
    rng = np.random.default_rng(11)
    vec_rows = [(i, [float(x) for x in rng.standard_normal(64)]) for i in range(200)]
    df = spark.createDataFrame(vec_rows, "vec_id long, embedding array<double>")
    queries = df.filter(F.col("vec_id") < 7)

    got = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in cosine_topk(df, queries, k=200, exclude_self=False).collect()
    }
    # expression-side replay of the same normalized pair dots
    v = with_l2_normalized(
        df.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        "embedding",
        "vv",
    ).select("neighbor_id", "vv")
    q = with_l2_normalized(
        queries.select(F.col("vec_id").alias("query_id"), "embedding"),
        "embedding",
        "qv",
    ).select("query_id", "qv")
    want = {
        (r.query_id, r.neighbor_id): r.c
        for r in v.crossJoin(F.broadcast(q))
        .select("query_id", "neighbor_id", dot(F.col("qv"), F.col("vv")).alias("c"))
        .collect()
    }
    assert set(got) == set(want)
    diffs = [k for k in want if got[k] != want[k]]
    assert diffs == []


def test_cosine_topk_ragged_and_null_semantics(spark):
    """Dim-mismatched and null vectors must produce NULL cosines that
    rank last — matching zip_with's null padding in the old pair-join
    plan — never an exception or a silent drop."""
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.5, 0.5]),
            (3, [1.0, 0.0, 0.0]),  # ragged: 3 dims
            (4, None),             # null vector
        ],
        "vec_id long, embedding array<double>",
    )
    queries = df.filter(F.col("vec_id") == 1)
    rows = {
        r.neighbor_id: r
        for r in cosine_topk(df, queries, k=10).collect()
    }
    assert rows[2].cosine == pytest.approx(2 ** -0.5)
    assert rows[3].cosine is None and rows[4].cosine is None
    # null scores sort after real ones
    assert rows[2].rank < rows[3].rank and rows[2].rank < rows[4].rank


def test_cosine_topk_empty_query_side_keeps_schema(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = cosine_topk(df, df.filter("vec_id < 0"), k=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "neighbor_id", "cosine", "rank",
    ]
    assert out.schema["query_id"].dataType.simpleString() == "bigint"


def test_cosine_topk_bounded_query_collect(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="exceeds 3 rows"):
        cosine_topk(df, df, k=2, max_query_rows=3)


def test_cosine_topk_bounded_query_bytes(spark):
    """The row cap bounds ROWS; the byte budget bounds the PAYLOAD
    (rows x dim x 8) that ships to every executor — a few wide
    vectors must fail as loudly as too many rows."""
    from polars_text_spark.operators.similarity import _collect_query_side

    wide = spark.range(3).select(
        F.col("id").alias("query_id"),
        F.array_repeat(F.lit(1.0), 200_000).alias("__qvec"),
    )
    with pytest.raises(ValueError, match="vector payload"):
        _collect_query_side(
            wide, 10, "test query", vec_field="__qvec", max_bytes=1 << 20
        )


def test_array_lit_builds_single_literal_node(spark):
    """On classic PySpark, F.lit(list) expands to an N-child
    CreateArray; _array_lit's numpy route must build ONE Literal node
    (analyzed plan shows `[...]`, not `array(...)`), so the pos->id
    maps never bloat the Catalyst tree at the 65k row cap."""
    from pyspark.sql import types as T

    from polars_text_spark.operators.similarity import _array_lit

    col = _array_lit(list(range(100)), T.LongType())
    analyzed = (
        spark.range(1)
        .select(col.alias("a"))
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "array(" not in analyzed, analyzed
    # string ids take the CreateArray fallback (folded before exec)
    s = _array_lit(["a", "b"], T.StringType())
    assert spark.range(1).select(s.alias("a")).collect()[0].a == ["a", "b"]


def test_cosine_topk_query_payload_not_in_closure(spark):
    """The query vectors ship via sc.broadcast, not the pickled task
    closure: the mapInPandas fn must reference a Broadcast handle."""
    from polars_text_spark.operators.similarity import _dots_map_fn

    bc = spark.sparkContext.broadcast([[1.0, 0.0]])
    fn = _dots_map_fn(bc, 1, "dots")
    freevars = dict(
        zip(fn.__code__.co_freevars, (c.cell_contents for c in fn.__closure__))
    )
    from pyspark.broadcast import Broadcast

    assert isinstance(freevars["qvecs_bc"], Broadcast)
    assert not any(
        isinstance(v, list) and v and isinstance(v[0], list)
        for v in freevars.values()
    ), "raw query vectors captured in the closure"


def test_cosine_topk_string_ids(spark):
    """id_col is generic — string ids must survive the literal
    pos->query_id array (cast to the id type, no int narrowing)."""
    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.9, 0.1]), ("c", [0.0, 1.0])],
        "vec_id string, embedding array<double>",
    )
    rows = cosine_topk(df, df.filter("vec_id = 'a'"), k=1).collect()
    assert rows[0].query_id == "a" and rows[0].neighbor_id == "b"


def test_quantized_idots_exact_vs_expression_fold(spark):
    """The BLAS integer matmul must reproduce the quantized-dot SCORES
    of the expression fold exactly: integer sums are associative, so
    any accumulation order is bit-identical, and the scale multiplies
    keep the oracle's (idot * qscale) * vscale association."""
    from polars_text_spark.operators.similarity import with_quantized

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.standard_normal(64)]) for i in range(150)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter(F.col("vec_id") < 4)
    got = {
        (r.query_id, r.neighbor_id): r.score
        for r in cosine_topk_quantized(
            df, queries, k=150, exclude_self=False
        ).collect()
    }

    def _side(d, out_id, out_z):
        d = d.select(F.col("vec_id").alias(out_id), "embedding")
        d = with_l2_normalized(d, "embedding", "__unit")
        d = with_quantized(d, "__unit", out_z)
        return d.select(out_id, out_z)

    qs = _side(queries, "query_id", "zq")
    vs = _side(df, "neighbor_id", "zv")
    idot = F.aggregate(
        F.zip_with(F.col("zq.q"), F.col("zv.q"), lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    want = {
        (r.query_id, r.neighbor_id): r.s
        for r in vs.crossJoin(F.broadcast(qs))
        .select(
            "query_id",
            "neighbor_id",
            (idot.cast("double") * F.col("zq.scale") * F.col("zv.scale")).alias("s"),
        )
        .collect()
    }
    assert set(got) == set(want)
    assert [k for k in want if got[k] != want[k]] == []


def test_cosine_topk_plan_has_no_pair_join(spark, sf_dir):
    """The dense scoring happens inside one Arrow pass over the
    vectors scan: no BroadcastNestedLoopJoin / CartesianProduct pair
    frame anywhere, and the wide per-row dots array is exploded in the
    same stage (no Exchange between the Python node and the
    Generate)."""
    from polars_text_spark.plans.explain import explain_str

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = explain_str(
        cosine_topk(vecs, vecs.filter(F.col("vec_id") < 3), k=5), "formatted"
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    tree = plan.split("\n\n")[0].splitlines()
    py = [i for i, l in enumerate(tree) if "MapInPandas" in l or "ArrowEvalPython" in l]
    gen = [i for i, l in enumerate(tree) if "Generate" in l]
    assert py and gen
    # formatted explain prints top-down: Generate (above) consumes the
    # Python node (below) with no Exchange line between them
    between = tree[min(gen): max(py)]
    assert not any("Exchange" in l for l in between)


def test_non_finite_vectors_score_null_and_rank_last(spark):
    """Pinned NON-FINITE policy (deliberate divergence from the old
    expression plan, where NaN's sorts-greatest ordering put a corrupt
    vector at rank 1): NaN/inf vectors score NULL and rank LAST."""
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [float("nan"), 1.0]),
            (3, [0.9, 0.1]),
            (4, [float("inf"), 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    rows = {
        r.neighbor_id: r
        for r in cosine_topk(df, df.filter("vec_id = 1"), k=10).collect()
    }
    assert rows[3].cosine is not None and rows[3].rank == 1
    assert rows[2].cosine is None and rows[4].cosine is None
    assert {rows[2].rank, rows[4].rank} == {2, 3}

    q = {
        r.neighbor_id: r
        for r in cosine_topk_quantized(
            df, df.filter("vec_id = 1"), k=10
        ).collect()
    }
    assert q[3].score is not None and q[3].rank == 1
    assert q[2].score is None and q[4].score is None


def test_contamination_skips_non_finite_pairs(spark):
    """A corrupt EVAL vector must not null every train row's max over
    its remaining finite pairs; a fully-corrupt TRAIN vector gets a
    null max and stays un-flagged (documented fail-open, surfaced
    upstream by embedding_norms)."""
    from polars_text_spark.operators.decontam import embedding_contamination

    train = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [float("nan"), 1.0])],
        "vec_id long, embedding array<double>",
    )
    ev = spark.createDataFrame(
        [(10, [2.0, 0.0]), (11, [float("nan"), 1.0])],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.vec_id: r
        for r in embedding_contamination(train, ev, threshold=0.9).collect()
    }
    # train 1: the NaN eval pair is skipped, the finite pair still max
    assert got[1].max_eval_cosine == pytest.approx(1.0)
    assert got[1].contaminated
    # train 2: every pair non-finite -> null max, un-flagged
    assert got[2].max_eval_cosine is None and not got[2].contaminated


def test_ivf_empty_vectors_degenerates_lazily(spark):
    """The empty-codebook fallback must not detour through
    cosine_topk's bounded query collect — a large query frame against
    an empty vectors table returns an empty frame, never raises."""
    from polars_text_spark.operators.similarity import cosine_topk_ivf

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    queries = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    out = cosine_topk_ivf(empty, queries, k=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "neighbor_id", "cosine", "rank",
    ]
