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


# Prior timezones already warned about (one warning per foreign zone,
# not one per table load — load() runs hundreds of times per session).
_TZ_WARNED: set = set()


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


def load(
    spark: SparkSession, sf_dir: str, name: str, pin_utc_session: bool = True
) -> DataFrame:
    """Scan one table. Plain `spark.read.parquet` — no schema inference
    cost (parquet is self-describing), pushdown-capable, splittable at
    row-group granularity so a 100 TB table parallelizes to the cluster.

    TIMESTAMP(NANOS) columns (rejected by Spark's reader) arrive as raw
    nano longs via spark.sql.legacy.parquet.nanosAsLong and are converted
    back here; sub-microsecond precision is truncated (testdata is
    microsecond-granular, so lossless).

    SESSION-MUTATION WARNING: this function sets three session-level SQL
    confs (nanosAsLong, inferTimestampNTZ=false, session.timeZone=UTC)
    on the session it is given. The first two must be set before the
    read and are harmless policy; the timezone pin changes how the REST
    of the session parses timestamp literals and formats dates. This is
    deliberate — the engine's correctness contract (DuckDB oracle
    equality) requires UTC literal semantics even on foreign harness
    sessions, and a restore-after-read would silently flip LATER-built
    query literals back to the foreign zone, which is worse. Scoping
    (ADVICE r3): the pin is opt-out (`pin_utc_session=False` reads the
    table without touching the zone — literal-bearing queries built on
    such a session are on the caller), and overriding a non-UTC zone
    logs one warning per prior zone so the mutation is never silent."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Runtime-settable SQL confs — MUST be set here, not only in the
    # session factory: harnesses that build their own plain SparkSession
    # (e.g. the correctness driver) would otherwise die with
    # PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS) columns.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # MICROS-at-rest files with isAdjustedToUTC=false would otherwise be
    # inferred as TIMESTAMP_NTZ. Disabling NTZ inference makes the READER
    # produce TIMESTAMP (instant) directly: the stored int64 micros are
    # taken as micros-since-epoch, bit-identical to DuckDB's epoch_us()
    # and session-timezone-independent (verified empirically: the same
    # file yields the same unix_micros under UTC and America/Los_Angeles
    # sessions). Crucially this keeps the column a plain scan output —
    # no projection sits between scan and filter, so timestamp predicates
    # still push down to the parquet footer (row-group pruning at 100 TB).
    # The previous approach (withColumn(to_utc_timestamp(...))) destroyed
    # pushdown on every timestamp filter. Applies to nested fields too.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # Timestamp LITERALS (and date formatting) parse in the session zone;
    # pin UTC so query constants mean the same instant on any harness.
    if pin_utc_session:
        try:
            prev_tz = spark.conf.get("spark.sql.session.timeZone")
        except Exception:
            prev_tz = None
        if prev_tz not in (None, "UTC") and prev_tz not in _TZ_WARNED:
            _TZ_WARNED.add(prev_tz)
            import logging

            logging.getLogger(__name__).warning(
                "load(): pinning spark.sql.session.timeZone=UTC (was %r) "
                "for oracle-identical literal semantics; pass "
                "pin_utc_session=False to keep the session zone.",
                prev_tz,
            )
        spark.conf.set("spark.sql.session.timeZone", "UTC")
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
    return df


def table_names(sf_dir: str, ext: str = ".parquet") -> list[str]:
    """Tables present in a dataset directory (catalog scan of the at-rest
    namespace — the parquet analogue of `pg_tables`, clone_databases.sh:415).
    `ext` selects the at-rest format (".orc" for ORC namespaces)."""
    return [
        f[: -len(ext)] for f in sorted(os.listdir(sf_dir)) if f.endswith(ext)
    ]
