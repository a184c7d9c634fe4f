"""Partitioned-layout sink/source: round-trip fidelity + plan-level
partition pruning (the 100 TB scan-avoidance contract)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from polars_text_spark.plans import explain_str
from polars_text_spark.sources.layout import read_partitioned, write_partitioned


def test_partitioned_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, out, ("lang",), files_per_partition=2)

    back = read_partitioned(spark, out)
    # Round-trip fidelity (lang becomes a partition column but the
    # row multiset is unchanged).
    a = sorted((r.doc_id, r.lang, r.text) for r in docs.collect())
    b = sorted((r.doc_id, r.lang, r.text) for r in back.collect())
    assert a == b

    # lang filter must prune directories at plan time...
    q = back.filter(F.col("lang") == "de").select("doc_id")
    plan = explain_str(q)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "lang" in m.group(1)
    # ...and the data read must not include the partition column.
    assert "lang" not in "".join(re.findall(r"ReadSchema: (\S+)", plan))


def test_files_per_partition_bound(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "docs_sized")
    write_partitioned(docs, out, ("lang",), files_per_partition=1)
    import glob

    for d in glob.glob(out + "/lang=*"):
        files = [f for f in glob.glob(d + "/*.parquet")]
        assert len(files) == 1, f"{d} has {len(files)} files"


def test_training_shards_write_order_and_parity(spark, sf_dir, tmp_path):
    """write_training_shards: shard membership + order must equal
    shard_assignment's (same hash recipe, no join), each shard dir
    holds exactly ONE parquet file whose physical row order is the
    shard_pos order, and a rewrite is byte-stable."""
    import os

    from polars_text_spark.operators.splits import shard_assignment
    from polars_text_spark.sources.layout import write_training_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    out = tmp_path / "shards"
    write_training_shards(docs, str(out), "doc_id", n_shards=8, salt="tr")

    expected = {
        r["doc_id"]: (r["shard"], r["shard_pos"])
        for r in shard_assignment(
            docs, "doc_id", n_shards=8, salt="tr"
        ).collect()
    }

    total = 0
    for d in sorted(os.listdir(out)):
        if not d.startswith("shard="):
            continue
        k = int(d.split("=")[1])
        files = [f for f in os.listdir(out / d) if f.endswith(".parquet")]
        assert len(files) == 1, f"{d}: expected 1 ordered file, got {files}"
        # physical row order in the single file == shard_pos order
        import pyarrow.parquet as pq

        tbl = pq.read_table(str(out / d / files[0]))
        pos = tbl.column("shard_pos").to_pylist()
        ids = tbl.column("doc_id").to_pylist()
        assert pos == list(range(len(pos)))
        for doc_id, p in zip(ids, pos):
            assert expected[doc_id] == (k, p)
        total += len(ids)
    assert total == len(expected) == docs.count()

    # rewrite determinism: same membership + order
    write_training_shards(docs, str(out), "doc_id", n_shards=8, salt="tr")
    again = {
        (r["doc_id"], r["shard"], r["shard_pos"])
        for r in spark.read.parquet(str(out)).collect()
    }
    assert again == {(i, s, p) for i, (s, p) in expected.items()}
