"""File-level zone maps: a manifest of per-file min/max column stats,
used to prune entire files from a scan BEFORE Spark lists/opens them.

Parquet already skips row groups via footer stats, but at 100 TB the
footer read itself is the tax: 100k files × footer fetch per query.
A manifest table (rows = #files, i.e. ~100k rows at 100 TB — trivially
driver-collectable) answers "which files can contain key ∈ [lo, hi]"
with one tiny scan, and only the surviving files are handed to the
reader. This is the engine-level analogue of Delta/Iceberg file
statistics, built from nothing but the parquet data and Spark's
`_metadata.file_path` hidden column.

Effective zone maps need clustered data: files written via
`repartitionByRange(col).sortWithinPartitions(col)` have disjoint
[min,max] bands and prune to ~selectivity × #files; randomly-laid-out
files all overlap and nothing prunes (pipeline/compact.py's sorted
rewrite exists exactly to restore this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_manifest(spark: SparkSession, table_dir: str, cols: list[str]) -> DataFrame:
    """Per-file stats for `cols`: (file, n_rows, <c>_min, <c>_max ...).
    One distributed pass over the table; the groupBy key is the file
    path, so partial aggregation collapses each task's rows to one
    stats row before the (tiny) shuffle."""
    df = spark.read.parquet(table_dir)
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return (
        df.select(F.col("_metadata.file_path").alias("file"), *cols)
        .groupBy("file")
        .agg(*aggs)
    )


def pruned_read(
    spark: SparkSession,
    manifest: DataFrame,
    col: str,
    lo,
    hi,
) -> DataFrame:
    """Read only files whose [min,max] band intersects [lo, hi], then
    apply the exact predicate. The file list is collected driver-side
    (bounded by #files, not data size); the residual filter still
    pushes down into the surviving files' row groups."""
    survivors = (
        manifest.filter(
            ~((F.col(f"{col}_max") < lo) | (F.col(f"{col}_min") > hi))
        )
        .select("file")
        .collect()
    )
    files = [r.file for r in survivors]
    if not files:
        # Empty scan with the right schema: read the full manifest's
        # first file and filter to nothing.
        first = manifest.select("file").limit(1).collect()[0].file
        return (
            spark.read.parquet(first).filter(F.lit(False))
        )
    return spark.read.parquet(*files).filter(
        (F.col(col) >= lo) & (F.col(col) <= hi)
    )
