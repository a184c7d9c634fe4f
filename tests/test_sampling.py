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
