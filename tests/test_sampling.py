"""Quality-weighted deterministic sampling (round 8): per-row
keep-probability from a quality score, via the engine-portable
sha-uniform draw. The oracle twin is `quality_weighted_sample`."""

from __future__ import annotations


def test_weighted_sample_extremes_and_determinism(spark):
    from pyspark.sql import functions as F

    from polars_text_spark.operators.sampling import weighted_sample

    df = spark.range(2000).select(F.col("id").alias("k"))
    # weight 1 keeps everything; weight 0 keeps nothing; weights
    # outside [0, 1] clamp rather than corrupt the predicate
    assert weighted_sample(df, F.lit(1.0), "k").count() == 2000
    assert weighted_sample(df, F.lit(0.0), "k").count() == 0
    assert weighted_sample(df, F.lit(7.5), "k").count() == 2000
    assert weighted_sample(df, F.lit(-3.0), "k").count() == 0
    # constant weight w ~ keeps ~w fraction, deterministically
    a = {r.k for r in weighted_sample(df, F.lit(0.3), "k").collect()}
    b = {r.k for r in weighted_sample(df, F.lit(0.3), "k").collect()}
    assert a == b
    assert 0.25 < len(a) / 2000 < 0.35
    # monotone: raising the weight only ADDS rows (same key, same salt)
    c = {r.k for r in weighted_sample(df, F.lit(0.6), "k").collect()}
    assert a < c


def test_weighted_sample_per_row_weights(spark):
    from pyspark.sql import functions as F

    from polars_text_spark.operators.sampling import weighted_sample

    df = spark.range(4000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, F.lit(0.9)).otherwise(F.lit(0.1)).alias("w"),
    )
    kept = weighted_sample(df, F.col("w"), "k").groupBy(
        (F.col("k") % 2).alias("par")
    ).count().collect()
    by_par = {r.par: r["count"] for r in kept}
    assert 0.84 < by_par[0] / 2000 < 0.96  # high-quality stratum
    assert 0.05 < by_par[1] / 2000 < 0.16  # low-quality stratum


def test_key_uniform_range_and_salt(spark):
    from pyspark.sql import functions as F

    from polars_text_spark.operators.sampling import key_uniform

    df = spark.range(500).select(key_uniform(F.col("id")).alias("u"),
                                 key_uniform(F.col("id"), "s2").alias("u2"))
    row = df.agg(F.min("u").alias("lo"), F.max("u").alias("hi"),
                 F.avg("u").alias("mean"),
                 F.avg((F.col("u") == F.col("u2")).cast("int")).alias("same")).collect()[0]
    assert 0.0 <= row.lo and row.hi < 1.0
    assert 0.4 < row.mean < 0.6  # uniform-ish
    assert row.same < 0.01  # salt decorrelates


def test_fim_transform_reconstructs_and_rate(spark):
    """FIM invariants: stripped sentinels reconstruct the original
    characters (as prefix+suffix+middle), non-applied rows pass
    through, and the applied fraction tracks fim_rate."""
    from pyspark.sql import functions as F

    from polars_text_spark.operators.packing import fim_transform

    df = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id").cast("string"),
                 F.lit(" body abcdefghij")).alias("text"),
    )
    out = fim_transform(df, "text", "doc_id", fim_rate=0.5).collect()
    n_applied = 0
    for r in out:
        if r.fim_applied:
            n_applied += 1
            assert r.fim_text.startswith("<PRE>")
            body = r.fim_text[len("<PRE>"):]
            pre, rest = body.split("<SUF>", 1)
            suf, mid = rest.split("<MID>", 1)
            assert pre + mid + suf == r.text  # PSM reassembles PM S
        else:
            assert r.fim_text == r.text
    assert 0.4 < n_applied / len(out) < 0.6
    # deterministic across reruns
    again = fim_transform(df, "text", "doc_id", fim_rate=0.5).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]


def test_fim_transform_edges(spark):
    from pyspark.sql import functions as F

    from polars_text_spark.operators.packing import fim_transform

    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "x")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in
            fim_transform(df, "text", "doc_id", fim_rate=1.0).collect()}
    assert rows[1].fim_text == "<PRE><SUF><MID>"  # empty doc, all-empty spans
    assert rows[2].fim_text is None and not rows[2].fim_applied
    assert rows[3].fim_text.count("x") == 1  # single char lands in one span


def test_dedup_threshold_sweep_counts(spark):
    from polars_text_spark.operators.dedup import dedup_threshold_sweep

    pairs = spark.createDataFrame(
        [("a", "b", 0.95), ("a", "c", 0.5), ("d", "e", 0.2)],
        "id_a string, id_b string, jaccard double",
    )
    got = {
        r.threshold: (r.n_pairs, r.n_docs)
        for r in dedup_threshold_sweep(pairs, [0.1, 0.4, 0.9, 0.99]).collect()
    }
    assert got[0.1] == (3, 5)
    assert got[0.4] == (2, 3)  # a,b,c
    assert got[0.9] == (1, 2)
    assert got[0.99] == (0, 0)  # zero row reported, not missing


def test_mojibake_signals_counts(spark):
    from pyspark.sql import functions as F

    from polars_text_spark.functions.analysis import mojibake_signals

    art = chr(0xC3) + chr(0xA9)              # Ã©  (double-decoded é)
    smart = chr(0xE2) + chr(0x20AC) + chr(0x2122)  # â€™ (cp1252 flavor)
    c1 = chr(0x85)                            # NEL
    rep = chr(0xFFFD)
    rows = {
        r.i: r.m.asDict()
        for r in spark.createDataFrame(
            [
                (1, "clean ascii text"),
                (2, f"caf{art} it{smart}s"),
                (3, f"bad{rep}and{c1}ctl"),
                (4, ""),
                (5, None),
            ],
            "i int, s string",
        ).select("i", mojibake_signals("s").alias("m")).collect()
    }
    assert rows[1]["score"] == 0.0 and rows[1]["n_artifacts"] == 0
    assert rows[2]["n_artifacts"] == 2      # Ã + â€
    assert rows[2]["n_replacement"] == 0
    assert rows[3]["n_replacement"] == 1 and rows[3]["n_c1_controls"] == 1
    assert rows[3]["score"] > 0.0
    assert rows[4]["score"] == 0.0 and rows[4]["n_chars"] == 0
    assert rows[5]["score"] is None and rows[5]["n_chars"] is None


def test_containment_pairs_quote_shape(spark):
    """The wrapper/quote shape: a short doc inside a long one has tiny
    Jaccard but containment ~1 — exactly what the one-sided score
    surfaces and the symmetric one misses."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from polars_text_spark.operators.dedup import containment_pairs

    short = "alpha beta gamma delta epsilon zeta"
    long = ("preamble words here " + short + " and then a very long tail "
            + " ".join(f"w{i}" for i in range(60)))
    df = spark.createDataFrame(
        [(1, short, "s"), (2, long, "s"), (3, "unrelated totally", "s")],
        "doc_id long, text string, src string",
    )
    got = {
        (r.id_a, r.id_b): (round(r.c_a_in_b, 3), round(r.c_b_in_a, 3))
        for r in containment_pairs(
            df, "text", "doc_id", block_cols=("src",), threshold=0.8
        ).collect()
    }
    assert (1, 2) in got
    a_in_b, b_in_a = got[(1, 2)]
    assert a_in_b == 1.0      # the short doc is fully contained
    assert b_in_a < 0.2       # the long one is not
    assert (1, 3) not in got and (2, 3) not in got
    with _pytest.raises(ValueError, match="block_cols"):
        containment_pairs(df, "text", "doc_id")


def test_dehyphenate_fixtures(spark):
    from pyspark.sql import functions as F

    from polars_text_spark.functions.analysis import dehyphenate

    rows = {
        r.i: r.out
        for r in spark.createDataFrame(
            [
                (1, "exam-\nple"),            # plain wrap
                (2, "exam-\n   ple"),         # indented continuation
                (3, "pages 3-\n4 follow"),    # numeric range: untouched
                (4, "dash-\n\nparagraph"),    # blank line: untouched
                (5, "no wraps here"),
                (6, None),
                (7, "exam-\r\nple"),          # Windows CRLF wrap
                (8, "exam-\r\n\tple"),        # CRLF + tab indent
                (9, "pages 3-\r\n4"),         # CRLF numeric: untouched
            ],
            "i int, s string",
        ).select("i", dehyphenate("s").alias("out")).collect()
    }
    assert rows[1] == "example"
    assert rows[2] == "example"
    assert rows[3] == "pages 3-\n4 follow"
    assert rows[4] == "dash-\n\nparagraph"
    assert rows[5] == "no wraps here"
    assert rows[6] is None
    assert rows[7] == "example"
    assert rows[8] == "example"
    assert rows[9] == "pages 3-\r\n4"


def test_round8_map_only_ops_have_zero_exchange(spark):
    """The map-only claims, plan-asserted: weighted_sample, fim,
    mojibake, dehyphenate over a parquet-like scan plan contain NO
    Exchange — they fuse into the scan stage at any scale."""
    from pyspark.sql import functions as F

    from polars_text_spark.functions.analysis import (
        dehyphenate,
        mojibake_signals,
        ws_token_array,
    )
    from polars_text_spark.operators.packing import fim_transform
    from polars_text_spark.operators.sampling import weighted_sample
    from polars_text_spark.plans import explain_str

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("text"),
    )
    composed = fim_transform(
        weighted_sample(
            df, F.size(ws_token_array("text")) / F.lit(200.0), "doc_id"
        ),
        "text",
        "doc_id",
    ).select("doc_id", "fim_text", mojibake_signals("fim_text"),
             dehyphenate("fim_text"))
    plan = explain_str(composed, "simple")
    assert "Exchange" not in plan, plan


def test_temperature_rates_closed_form():
    import math

    import pytest

    from polars_text_spark.operators.sampling import temperature_rates

    counts = {"en": 1600, "de": 400, "fr": 100}
    r = temperature_rates(counts, 0.5)
    # smallest stratum kept whole; larger ones by sqrt(n_min/n)
    assert r["fr"] == 1.0
    assert r["de"] == math.sqrt(100 / 400)
    assert r["en"] == math.sqrt(100 / 1600)
    # alpha=1 is the natural mixture: keep everything
    assert set(temperature_rates(counts, 1.0).values()) == {1.0}
    # flatter alpha upsamples the tail harder (relative to the head)
    r_flat = temperature_rates(counts, 0.3)
    assert r_flat["en"] < r["en"]
    # surviving composition is proportional to n^alpha
    kept = {s: counts[s] * r[s] for s in counts}
    ratio = {s: kept[s] / counts[s] ** 0.5 for s in counts}
    assert max(ratio.values()) == pytest.approx(min(ratio.values()))
    # null strata and invalid alphas rejected
    assert "x" not in temperature_rates({"x": 0, "y": 5}, 0.5)
    with pytest.raises(ValueError):
        temperature_rates(counts, 0.0)
    with pytest.raises(ValueError):
        temperature_rates({"x": 0}, 0.5)


def test_temperature_rebalance_is_scan_filter(spark, sf_dir):
    from polars_text_spark.operators.sampling import temperature_rebalance
    from polars_text_spark.plans import explain_str

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = temperature_rebalance(docs, "lang", "doc_id", alpha=0.5)
    # content-keyed filter fused into the scan: no Exchange at all
    assert "Exchange" not in explain_str(out)
    # deterministic: identical rerun selects the identical rows
    a = {r.doc_id for r in out.select("doc_id").collect()}
    b = {
        r.doc_id
        for r in temperature_rebalance(docs, "lang", "doc_id", alpha=0.5)
        .select("doc_id")
        .collect()
    }
    assert a == b and len(a) > 0
