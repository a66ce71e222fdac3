"""Partition-count hygiene for map-heavy operators.

A columnar scan's parallelism is bounded by its split count, and a
single small parquet file (one row group) yields ONE split — so an
operator whose cost is dominated by per-row expression work (shingle
explosion, gram hashing, Arrow-batched python UDFs) runs on one core
no matter how many the cluster has. At the 100 TB target this never
happens (row groups >> cores); it is the signature of small/local
datasets — exactly where benchmarks run.

`spread()` round-robin-repartitions ONLY when the incoming partition
count underutilizes the configured parallelism. On a production-sized
input the condition is false and the function is the identity — no
extra exchange is ever planned at scale. The repartition shuffles the
narrow projection it is given (callers project doc_id+text first), and
Spark's round-robin repartition locally sorts for deterministic retry,
so results are unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition `df` to the session's default parallelism iff it
    currently has fewer partitions than that (identity otherwise —
    production-scale scans never trigger it)."""
    target = (
        min_partitions
        if min_partitions is not None
        else df.sparkSession.sparkContext.defaultParallelism
    )
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
