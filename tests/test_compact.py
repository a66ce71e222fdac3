"""Compaction: many small files -> few target-sized files, content
identical, and the sorted variant restores per-file data skipping."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_cloner_spark.pipeline.compact import compact
from database_cloner_spark.sources import load


def _fragment(spark, sf_dir, out, n_files):
    load(spark, sf_dir, "orders").repartition(n_files).write.mode(
        "overwrite"
    ).parquet(out)


def test_compact_reduces_file_count_preserving_rows(spark, sf_dir, tmp_path):
    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compacted")
    _fragment(spark, sf_dir, src, 37)

    res = compact(spark, src, dst, target_file_bytes=64 * 1024 * 1024)

    assert res.n_files_before == 37
    assert res.n_files_after < res.n_files_before
    assert res.rows == load(spark, sf_dir, "orders").count()
    # content identical, not just counts
    a = spark.read.parquet(src).select("o_orderkey", "o_totalprice")
    b = spark.read.parquet(dst).select("o_orderkey", "o_totalprice")
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0


def test_compact_sorted_splits_by_range(spark, sf_dir, tmp_path):
    src = str(tmp_path / "frag2")
    dst = str(tmp_path / "sorted")
    _fragment(spark, sf_dir, src, 8)

    res = compact(
        spark, src, dst, target_file_bytes=16 * 1024, sort_by=["o_orderkey"]
    )
    assert res.n_files_after > 1
    # range partitioning => per-file key ranges are disjoint, the
    # precondition for parquet min/max row-group skipping on the key
    per_file = (
        spark.read.parquet(dst)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next
