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
