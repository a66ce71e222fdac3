"""Parquet source — the engine's at-rest format.

The reference's "full database scan" is `pg_dump` reading every row
server-side (clone_databases.sh:209-210); our equivalent is a columnar
parquet scan with Catalyst pushdown (filters + column pruning reach the
footer/row-group level for free).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The driver-generated star schema (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — footer-only read."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    if os.path.isdir(path):  # Spark-written dataset: read one part footer
        parts = [f for f in os.listdir(path) if f.endswith(".parquet")]
        if not parts:
            return []
        path = os.path.join(path, sorted(parts)[0])
    schema = pq.read_schema(path)
    return [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Plain `spark.read.parquet` — no schema inference
    cost (parquet is self-describing), pushdown-capable, splittable at
    row-group granularity so a 100 TB table parallelizes to the cluster.

    TIMESTAMP(NANOS) columns (rejected by Spark's reader) arrive as raw
    nano longs via spark.sql.legacy.parquet.nanosAsLong and are converted
    back here; sub-microsecond precision is truncated (testdata is
    microsecond-granular, so lossless)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Runtime-settable SQL conf — MUST be set here, not only in the
    # session factory: harnesses that build their own plain SparkSession
    # (e.g. the correctness driver) would otherwise die with
    # PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS) columns.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    spark_types = dict(df.dtypes)
    for c in _nanos_timestamp_cols(path):
        # Guard on the Spark-side type: INT96 files also look like ns to
        # pyarrow, but Spark reads them as proper timestamps — only raw
        # TIMESTAMP(NANOS) arrives as bigint (via nanosAsLong).
        if spark_types.get(c) != "bigint":
            continue
        # Integer `div`, NOT `/`: epoch-nanos (~1.7e18) exceed double's
        # 53-bit mantissa, so float division would corrupt microseconds.
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # MICROS-at-rest files (isAdjustedToUTC=false) arrive as TIMESTAMP_NTZ.
    # Normalize to TIMESTAMP (instant) with the wall-clock read as UTC —
    # to_utc_timestamp(ntz, 'UTC') is session-timezone-independent, so the
    # epoch value matches DuckDB's epoch_us() on any harness session. This
    # keeps every downstream unix_micros/window-range consumer on one type
    # regardless of which parquet timestamp flavor the dataset was written
    # with (the driver regenerated testdata from NANOS to MICROS between
    # rounds; both now load identically).
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.to_utc_timestamp(F.col(c), "UTC"))
    return df


def table_names(sf_dir: str) -> list[str]:
    """Tables present in a dataset directory (catalog scan of the at-rest
    namespace — the parquet analogue of `pg_tables`, clone_databases.sh:415)."""
    found = [
        f[: -len(".parquet")]
        for f in sorted(os.listdir(sf_dir))
        if f.endswith(".parquet")
    ]
    return found
