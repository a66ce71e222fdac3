"""Engine catalog — queryable metadata over parquet namespaces.

The reference's catalog surface: `pg_database` (clone_databases.sh:228),
`pg_tables` (:415), `information_schema.tables/schemata` (:511,:530),
existence guards (:227-231). Here a "database" is a parquet namespace
directory and the catalog is a set of engine-maintained DataFrames —
row-for-row queryable with the same §2.2-§2.4 operators the reference
runs against Postgres catalogs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from database_cloner_spark.sources.parquet import table_names


def table_exists(namespace_dir: str, table: str) -> bool:
    """Idempotence guard (clone_databases.sh:227-231)."""
    return os.path.exists(os.path.join(namespace_dir, f"{table}.parquet"))


def tables_df(spark: SparkSession, namespace_dir: str, schemaname: str = "main") -> DataFrame:
    """`pg_tables` analogue: (schemaname, tablename, owner)."""
    rows = [(schemaname, t, "engine") for t in table_names(namespace_dir)]
    return spark.createDataFrame(rows, "schemaname string, tablename string, owner string")


def databases_df(spark: SparkSession, root_dir: str) -> DataFrame:
    """`pg_database` analogue: each subdirectory of root is a namespace."""
    rows = [
        (d,)
        for d in sorted(os.listdir(root_dir))
        if os.path.isdir(os.path.join(root_dir, d))
    ]
    return spark.createDataFrame(rows, "datname string")


def columns_df(spark: SparkSession, namespace_dir: str, schemaname: str = "main") -> DataFrame:
    """`information_schema.columns` analogue, read from parquet footers
    (no data scan)."""
    import pyarrow.parquet as pq

    rows = []
    for t in table_names(namespace_dir):
        path = os.path.join(namespace_dir, f"{t}.parquet")
        if os.path.isdir(path):
            parts = [f for f in os.listdir(path) if f.endswith(".parquet")]
            if not parts:
                continue
            path = os.path.join(path, parts[0])
        schema = pq.read_schema(path)
        for i, f in enumerate(schema):
            rows.append((schemaname, t, f.name, str(f.type), i + 1))
    return spark.createDataFrame(
        rows,
        "table_schema string, table_name string, column_name string, data_type string, ordinal_position int",
    )
