"""spread() contract: parallelize single-split local inputs, identity at scale.

The helper exists because a map-heavy operator's parallelism is bounded
by its scan's split count (SCALE.md pitfall #5); these tests pin the two
sides of its contract so a regression in either direction is loud:
under-partitioned inputs get repartitioned to the session default, and
inputs already at-or-above the default are returned with the SAME plan
(no exchange added — the production-scale case).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from database_cloner_spark.functions.partitioning import spread


def test_spread_parallelizes_single_split(spark):
    par = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    out = spread(df)
    assert out.rdd.getNumPartitions() == par
    # Rows unchanged (round-robin repartition moves, never drops/dups).
    assert out.count() == 1000
    assert out.agg(F.sum("id")).first()[0] == 999 * 1000 // 2


def test_spread_identity_when_already_parallel(spark):
    par = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000, numPartitions=par)
    out = spread(df)
    # Identity: the SAME DataFrame object, so no exchange can have been
    # added to the plan — the production-scale contract.
    assert out is df
    wider = spark.range(0, 1000, numPartitions=par * 2)
    assert spread(wider) is wider


def test_spread_explicit_min_partitions(spark):
    df = spark.range(0, 100).coalesce(1)
    assert spread(df, min_partitions=4).rdd.getNumPartitions() == 4
    already = spark.range(0, 100, numPartitions=4)
    assert spread(already, min_partitions=4) is already
