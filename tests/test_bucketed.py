"""Bucketed co-located join: correct results AND a shuffle-free plan."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from database_cloner_spark.sources import load
from database_cloner_spark.sources.bucketed import bucketed_join, write_bucketed

SF = "/root/testdata/sf0.001"


def test_bucketed_join_is_shuffle_free_and_correct(spark):
    suffix = uuid.uuid4().hex[:8]
    lt, rt = f"li_b_{suffix}", f"od_b_{suffix}"
    li = load(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    od = load(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    # Force the big-big join shape (at sf0.001 the planner would rightly
    # broadcast instead; at 100 TB neither side fits the threshold and
    # the bucketed layout is what removes the shuffle).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(li, lt, "l_orderkey", n_buckets=8)
        write_bucketed(od, rt, "l_orderkey", n_buckets=8)

        joined = bucketed_join(spark, lt, rt, "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert "SortMergeJoin" in plan

        # correctness vs the plain (shuffled) join
        want = li.join(od, "l_orderkey").count()
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {rt}")


def test_bucket_count_mismatch_rejected(spark):
    import pytest

    suffix = uuid.uuid4().hex[:8]
    lt, rt = f"a_b_{suffix}", f"b_b_{suffix}"
    nat = load(spark, SF, "nation").select("n_nationkey", "n_name")
    reg = load(spark, SF, "region").select(
        F.col("r_regionkey").alias("n_nationkey"), "r_name"
    )
    try:
        write_bucketed(nat, lt, "n_nationkey", n_buckets=8)
        write_bucketed(reg, rt, "n_nationkey", n_buckets=4)
        with pytest.raises(ValueError, match="matching bucket counts"):
            bucketed_join(spark, lt, rt, "n_nationkey")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {rt}")
