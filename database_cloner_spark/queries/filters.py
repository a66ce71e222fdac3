"""§2.2 Projections / filters / predicates (SURVEY.md).

Every predicate shape the reference ships to psql/mongosh, re-expressed
as Catalyst filter expressions so they push down to the parquet scan:
equality (clone_databases.sh:228,:615-616), inequality (:633,:640),
conjunction (:633), IN-list (:693-698), filter-vs-computed-scalar
(:667-670), explicit projection (:662-664), regex verdicts (:758), and
prefix matching (:299,:487).

All of these are single-stage, shuffle-free plans (except the scalar
subquery, which is a 1-row broadcast) — at 100 TB they are pure
embarrassingly-parallel scans with pushed-down predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_cloner_spark.registry import register
from database_cloner_spark.sources import load


_ORACLE_EQ = """
SELECT n_nationkey, n_name FROM nation WHERE n_name = 'NATION_7'
"""


@register("q_filter_eq", oracle=_ORACLE_EQ, tier="C")
def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality probe on a catalog-shaped table: `WHERE datname = <db>`
    (clone_databases.sh:228). Pushed to the parquet footer."""
    return (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_7")
        .select("n_nationkey", "n_name")
    )


_ORACLE_NEQ = """
SELECT event_id, event_type FROM events WHERE event_type != 'view'
"""


@register("q_filter_neq", oracle=_ORACLE_NEQ, tier="C")
def q_filter_neq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inequality predicate: `state != 'idle'` (clone_databases.sh:633)."""
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") != "view")
        .select("event_id", "event_type")
    )


_ORACLE_CONJ = """
SELECT event_id, event_type, value FROM events
WHERE event_type = 'click' AND value > 100.0
"""


@register("q_filter_conj", oracle=_ORACLE_CONJ, tier="C")
def q_filter_conj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunction: `datname = X AND state != 'idle'` (clone_databases.sh:633)."""
    return (
        load(spark, sf_dir, "events")
        .filter((F.col("event_type") == "click") & (F.col("value") > 100.0))
        .select("event_id", "event_type", "value")
    )


_ORACLE_IN = """
SELECT o_orderkey, o_orderpriority FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
"""


@register("q_filter_in", oracle=_ORACLE_IN, tier="C")
def q_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list predicate — the kill-connections advice SQL shape
    (clone_databases.sh:693-698)."""
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
    )


_ORACLE_NOTPID = """
SELECT event_id, user_id FROM events
WHERE user_id != (SELECT MIN(user_id) FROM events)
"""


@register("q_filter_notpid", oracle=_ORACLE_NOTPID, tier="C")
def q_filter_notpid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter against a computed scalar: `pid != pg_backend_pid()`
    (clone_databases.sh:667-670). The scalar is a 1-row aggregate
    broadcast-crossed against the scan — no full shuffle."""
    ev = load(spark, sf_dir, "events")
    min_uid = ev.agg(F.min("user_id").alias("min_uid"))
    return (
        ev.crossJoin(F.broadcast(min_uid))
        .filter(F.col("user_id") != F.col("min_uid"))
        .select("event_id", "user_id")
    )


_ORACLE_PROJECT = """
SELECT event_id AS pid, user_id AS usename, event_type AS state, value AS query_cost
FROM events
"""


@register("q_project", oracle=_ORACLE_PROJECT, tier="C")
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit projection (clone_databases.sh:662-664): column pruning
    reaches the scan — ReadSchema carries only 4 of 6 columns."""
    return load(spark, sf_dir, "events").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("usename"),
        F.col("event_type").alias("state"),
        F.col("value").alias("query_cost"),
    )


_ORACLE_RLIKE = """
SELECT doc_id FROM documents WHERE regexp_matches(text, 'scan.*join')
"""


@register("q_filter_rlike", oracle=_ORACLE_RLIKE, tier="C")
def q_filter_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex verdict over text — `grep -q "ok.*1"` (clone_databases.sh:758)."""
    return (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").rlike("scan.*join"))
        .select("doc_id")
    )


_ORACLE_PREFIX = """
SELECT c_custkey, c_name FROM customer WHERE c_name LIKE 'Customer#00000001%'
"""


@register("q_filter_prefix", oracle=_ORACLE_PREFIX, tier="C")
def q_filter_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix predicate: `[[ "$target_db" == "$DB_PREFIX"* ]]`
    (clone_databases.sh:299,:487). StartsWith pushes down as a
    string-range filter."""
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_name").startswith("Customer#00000001"))
        .select("c_custkey", "c_name")
    )
