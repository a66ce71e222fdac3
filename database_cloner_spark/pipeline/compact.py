"""Small-file compaction — the operational dual of the clone pipeline.

A long-running clone/ingest pipeline accumulates small files (per-batch
streaming commits, over-partitioned writes). At 100 TB the cost is
real: every file is a scan task plus a footer read, so a million 1 MB
files is ~100x the scheduling and metadata work of the same bytes in
512 MB files. The reference never faces this (its sinks are single
server-side databases), but any parquet-backed deployment of this
engine does — grounded in the same maintenance posture as the
reference's backup/cleanup steps (clone_databases.sh:203-217,:805-806).

Sizing uses the FILESYSTEM byte count, not row counts: parquet bytes
are what scan tasks split on (`spark.sql.files.maxPartitionBytes`).
File sizes come from Spark's Hadoop FileSystem API, so the same code
works on local disk, HDFS, or object stores.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class CompactionResult:
    n_files_before: int
    n_files_after: int
    bytes_total: int
    rows: int


def _dir_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) via the Hadoop FS API (FS-agnostic)."""
    jvm = spark._jvm
    jsc = spark._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    n, total = 0, 0
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue  # _SUCCESS, checksums, hidden commit metadata
        n += 1
        total += st.getLen()
    return n, total


def compact(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 512 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> CompactionResult:
    """Rewrite a parquet directory into ~target_file_bytes files.

    The file count is ceil(input_bytes / target): computed from real
    sizes, never guessed from row counts (row width varies wildly with
    text/binary columns). `coalesce` is used for shrinking when no sort
    is requested — it avoids a shuffle entirely (tasks just read more
    input splits each); with `sort_by`, a repartition-by-range write
    restores row-group data skipping on the sort keys at the same pass
    (same trick as the clone pipeline's sorted writes)."""
    df = spark.read.parquet(src)
    n_before, total_bytes = _dir_stats(spark, src)
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))

    if sort_by:
        out = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(*sort_by)
    else:
        out = df.coalesce(n_out)
    out.write.mode("overwrite").parquet(dst)

    n_after, _ = _dir_stats(spark, dst)
    return CompactionResult(
        n_files_before=n_before,
        n_files_after=n_after,
        bytes_total=total_bytes,
        rows=spark.read.parquet(dst).count(),
    )
