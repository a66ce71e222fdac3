"""Partitioned JDBC source/sink — the live-PostgreSQL face of the clone
pipeline (clone_databases.sh:137-190 connection handling, :209-210 dump,
:245-246 server-side clone).

No database server exists in the test environment (SURVEY.md §7 "What's
hard"), so this connector is a thin, isolated layer: the clone pipeline
and all oracle queries run on parquet; swap `load`/`save` here to run
the same pipeline against a live server.

Design rules for 100 TB (always enforced, not optional):
- reads are ALWAYS partitioned (numPartitions + partitionColumn bounds) —
  a single-connection JDBC read serializes the whole table through one
  executor;
- predicate/column pushdown is free via the DataFrame API — never
  pre-render SQL strings;
- same-server clones should use `server_side_clone_sql` (compute-to-data:
  the reference's zero-client-byte CREATE DATABASE ... TEMPLATE).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class JdbcTarget:
    url: str  # jdbc:postgresql://host:port/db
    user: str
    password: str
    driver: str = "org.postgresql.Driver"

    def options(self) -> dict[str, str]:
        return {
            "url": self.url,
            "user": self.user,
            "password": self.password,
            "driver": self.driver,
        }


def load_table(
    spark: SparkSession,
    target: JdbcTarget,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 32,
) -> DataFrame:
    """Partitioned read: numPartitions parallel range scans."""
    return (
        spark.read.format("jdbc")
        .options(**target.options())
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
        .load()
    )


def save_table(df: DataFrame, target: JdbcTarget, table: str, mode: str = "error") -> None:
    """Parallel JDBC write (one connection per partition; batch inserts)."""
    (
        df.write.format("jdbc")
        .options(**target.options())
        .option("dbtable", table)
        .option("batchsize", "10000")
        .mode(mode)
        .save()
    )


def server_side_clone_sql(source_db: str, target_db: str) -> str:
    """The reference's zero-data-movement fast path
    (CREATE DATABASE ... TEMPLATE, clone_databases.sh:245-246): when
    source and target share a server, ship one DDL string instead of
    moving rows through the cluster. Returned as SQL for an external
    driver connection to execute."""
    return f'CREATE DATABASE "{target_db}" WITH TEMPLATE "{source_db}"'
