"""Flagship end-to-end query (SURVEY.md §7 phase-1 exit criterion).

A TPC-H-Q1-style pricing summary over `lineitem`: filter -> group -> 8
aggregates -> sort. Exercises the same shapes as the reference's core
loop — filtered counts (clone_databases.sh:632-641) and deterministic
report ordering (clone_databases.sh:574-589) — on real fact data.

Scale notes: single shuffle (partial hash-agg map-side, final agg after
exchange on the 2 low-cardinality group keys); the shipdate filter and
7-column projection push down to the parquet scan. No driver-side data
movement. This plan survives a 100x scale-up untouched: cardinality of
the group-by output is 4-6 rows regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_cloner_spark.registry import register
from database_cloner_spark.sources import load

CUTOFF = "1998-09-02"

_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
  ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
  ROUND(AVG(l_quantity), 2)                                        AS avg_qty,
  ROUND(AVG(l_extendedprice), 2)                                   AS avg_price,
  ROUND(AVG(l_discount), 2)                                        AS avg_disc,
  COUNT(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_ORACLE, tier="C")
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: filter + hash-agg + sort."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(f"{CUTOFF} 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 2).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q3_DATE = "1998-06-15"

_ORACLE_Q3 = f"""
SELECT l.l_orderkey,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
  AND l.l_shipdate > TIMESTAMP '{Q3_DATE} 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=_ORACLE_Q3, tier="X")
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment filter pushed into the customer scan,
    customer join reduced to a semi-ish key filter before the big
    lineitem join, top-10 via TakeOrderedAndProject. Both date filters
    prune at their scans; the only large shuffle is lineitem on
    l_orderkey (orders arrives already keyed)."""
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit(f"{Q3_DATE} 00:00:00").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit(f"{Q3_DATE} 00:00:00").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q18_QTY = 180

_ORACLE_Q18 = f"""
WITH big AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING SUM(l_quantity) > {Q18_QTY}
)
SELECT c.c_name, o.o_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       ROUND(o.o_totalprice, 2) AS o_totalprice,
       ROUND(SUM(l.l_quantity), 2) AS total_qty
FROM orders o
JOIN big ON o.o_orderkey = big.l_orderkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@register("q18_large_orders", oracle=_ORACLE_Q18, tier="X")
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): the HAVING subquery is a
    pre-aggregation of lineitem that reuses the SAME l_orderkey
    partitioning as the main join — Spark plans one exchange for both
    the qualifying-keys agg and the re-join. The qualifying set is NOT
    force-broadcast: it grows with the fact table (selective, but
    unbounded), so a hint would bypass AQE's size check and can OOM
    executors at 100× — AQE flips the join to broadcast from the
    RUNTIME size whenever the set actually is small (it is at bench
    scale; asserted on the post-execution adaptive plan in
    tests/test_plans.py)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > Q18_QTY)
        .select("l_orderkey")
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(li.alias("l2"), F.col("o_orderkey") == F.col("l2.l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l2.l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# One ANSI-SQL text, two engines: registered as BOTH the Spark-side
# implementation (spark.sql over a temp view) and the DuckDB oracle.
# Guards the engine's SQL entry path — a user of the reference writes
# SQL, not DataFrame calls, and this proves the dialect-common subset
# (timestamp literals, ROUND, positional GROUP BY) runs unchanged.
_SQL_COMMON_PRICING = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q_sql_surface", oracle=_SQL_COMMON_PRICING, tier="C")
def q_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql() entry path: the IDENTICAL SQL text the oracle
    runs, executed by Spark SQL over a temp view of the same scan.
    Catalyst plans it exactly like the DataFrame form of q1 (pushed
    filter, two-phase agg) — API surface parity, not a new operator."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_SQL_COMMON_PRICING)
