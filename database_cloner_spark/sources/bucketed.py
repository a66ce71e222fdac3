"""Bucketed tables: pre-shuffled storage for co-located joins.

The single biggest repeated cost in a 100 TB fact-to-fact workload is
re-shuffling the same table on the same key for every join. Bucketing
pays that shuffle ONCE at write time: both sides stored with
`bucketBy(n, key)` hash-place rows so that bucket i of table A only
ever joins bucket i of table B — the join plan has NO Exchange on
either side (asserted in tests/test_bucketed.py by inspecting the
physical plan).

Rules encoded here:
- bucket counts must match across join partners (enforced);
- sortBy(key) within buckets lets the join run as a zip-merge without
  even an in-task sort;
- bucketed tables go through the session catalog (saveAsTable) because
  bucket metadata lives in the table catalog, not in parquet footers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 32, sort: bool = True
) -> None:
    """Persist df hash-bucketed (and bucket-sorted) by `key`."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key —
    shuffle-free by construction."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)

    def buckets_of(t: str) -> int | None:
        rows = spark.sql(f"DESCRIBE TABLE EXTENDED {t}").collect()
        for r in rows:
            if r.col_name == "Num Buckets":
                return int(r.data_type)
        return None

    nl, nr = buckets_of(left_table), buckets_of(right_table)
    if nl is None or nr is None or nl != nr:
        raise ValueError(
            f"co-located join needs matching bucket counts; "
            f"{left_table}={nl}, {right_table}={nr}"
        )
    return lt.join(rt, key, how)
