"""§2.6 sorts/limits/top-k and §2.7 set operations (SURVEY.md).

Reference grounding: LIMIT-1 existence probes (clone_databases.sh:725,:728),
work-list-ordered report records (:574-589), credential-record accumulation
(:476,:887 -> :574,:972), and the [V]-tier source-minus-target diff the
copy contract implies (:246,:817-818).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_cloner_spark.registry import register
from database_cloner_spark.sources import load


_ORACLE_LIMIT_PROBE = """
SELECT 1 AS probe FROM region LIMIT 1
"""


@register("q_limit_probe", oracle=_ORACLE_LIMIT_PROBE, tier="C")
def q_limit_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT-1 existence probe (`listCollections limit:1`,
    clone_databases.sh:725,:728). CollectLimit short-circuits the scan:
    reads one row-group of one file regardless of table size."""
    return load(spark, sf_dir, "region").select(F.lit(1).alias("probe")).limit(1)


_ORACLE_SORT = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey
"""


@register("q_sort", oracle=_ORACLE_SORT, tier="C")
def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic report ordering (summary written in work-list order,
    clone_databases.sh:574-589). Range-partitioned global sort."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )


_ORACLE_TOPK = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


@register("q_topk", oracle=_ORACLE_TOPK, tier="X")
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: largest orders first (clone-scheduling at scale). Spark
    compiles orderBy+limit to TakeOrderedAndProject — per-partition
    heaps, no global sort, no full shuffle."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


_ORACLE_UNION = """
SELECT c_name AS principal_name, 'owner' AS principal_role FROM customer
UNION ALL
SELECT s_name AS principal_name, 'app' AS principal_role FROM supplier
"""


@register("q_union_append", oracle=_ORACLE_UNION, tier="C")
def q_union_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accumulate per-db credential records into one dataset — append then
    read-all (clone_databases.sh:476,:887). unionByName is a zero-shuffle
    concatenation of partitions."""
    owners = load(spark, sf_dir, "customer").select(
        F.col("c_name").alias("principal_name"), F.lit("owner").alias("principal_role")
    )
    apps = load(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("principal_name"), F.lit("app").alias("principal_role")
    )
    return owners.unionByName(apps)


_ORACLE_EXCEPT = """
SELECT o_orderkey FROM orders
EXCEPT
SELECT l_orderkey AS o_orderkey FROM lineitem
"""


@register("q_except_diff", oracle=_ORACLE_EXCEPT, tier="V")
def q_except_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-minus-target diff for clone verification: orders with no
    lineitems ~ rows present only in the source (grounded in
    clone_databases.sh:246 copy contract)."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey")
    li = load(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("o_orderkey"))
    # EXCEPT as pre-distinct + anti-join + distinct. The explicit
    # distinct on the big side partial-aggregates MAP-SIDE: same-key
    # lineitem rows co-locate in row groups, so the shuffle moves ~1
    # row per key instead of every row (~4-7x less at lineitem's dup
    # factor), and the anti-join probes the reduced side. Measured at
    # sf0.1 (best of 5): 0.68s vs 0.84s for df.subtract(), whose plan
    # ships the full non-distinct side into the join.
    return orders.join(li.distinct(), "o_orderkey", "left_anti").distinct()


_ORACLE_INTERSECT = """
SELECT o_orderkey FROM orders
INTERSECT
SELECT l_orderkey AS o_orderkey FROM lineitem
"""


@register("q_intersect", oracle=_ORACLE_INTERSECT, tier="V")
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common rows present in both source and clone ([V] companion of
    q_except_diff)."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey")
    li = load(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("o_orderkey"))
    return orders.intersect(li)


def _zorder_oracle() -> str:
    from database_cloner_spark.functions.zorder import z_value_sql

    z = z_value_sql("o_custkey", "day_nr")
    return f"""
SELECT o_orderkey, CAST({z} AS BIGINT) AS zval
FROM (
  SELECT o_orderkey, o_custkey,
         CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT) AS day_nr
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
)
ORDER BY zval, o_orderkey
LIMIT 20
"""


@register("q_sort_zorder", oracle=_zorder_oracle(), tier="X")
def q_sort_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) multi-dimensional sort key (functions/zorder.py):
    interleave the low 8 bits of customer key and order-date day-number
    into one long and take the 20 smallest — the code is a pure
    whole-stage-codegen bit expression, and the identical SQL form
    (z_value_sql) lets the oracle hash-check every interleaved value
    cross-engine. The 100 TB use is LAYOUT, not this query: writing
    files range-partitioned on z bounds each file's (custkey, date)
    min/max to a Morton rectangle so filters on EITHER dimension prune
    files (tests/test_zorder.py measures the second-dimension span
    collapse vs a single-key sort). Top-k is TakeOrderedAndProject —
    per-partition heaps, no global sort."""
    from database_cloner_spark.functions.zorder import z_value

    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull()
    )
    day_nr = F.datediff(
        F.to_date("o_orderdate"), F.to_date(F.lit("1992-01-01"))
    )
    with_z = orders.select(
        "o_orderkey",
        z_value(F.col("o_custkey"), day_nr).alias("zval"),
    )
    return with_z.orderBy(F.asc("zval"), F.asc("o_orderkey")).limit(20)


_ORACLE_UNPIVOT = """
SELECT l_orderkey, l_linenumber, metric, value
FROM (
  SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS value
  FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
)
WHERE l_orderkey < 500
"""


@register("q_unpivot_melt", oracle=_ORACLE_UNPIVOT, tier="X")
def q_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape (the inverse of q_pivot_events): four metric
    columns melt to (metric, value) rows via df.unpivot — ONE pass
    planned as Expand (each input row fans out to 4 in the same task),
    never the 4-scan UNION ALL the oracle spells out for portability.
    The melt shape is how per-metric ML feature tables and long-format
    stats exports are produced from wide fact tables; Expand keeps it
    map-side at any scale (no shuffle, no re-read)."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 500)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("extendedprice"),
            F.col("l_discount").alias("discount"),
            F.col("l_tax").alias("tax"),
        )
    )
    # Values pass through UNROUNDED: both engines emit the parquet-stored
    # double verbatim, which is bit-identical by construction — rounding
    # a computed double is the documented cross-engine tie pitfall
    # (SCALE.md pitfall 4) and buys nothing here.
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["quantity", "extendedprice", "discount", "tax"],
        "metric",
        "value",
    )
