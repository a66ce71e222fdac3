"""Driver-path streaming check (VERDICT r6 #7): real readStream CDC
apply over the sf0.01 events table, final target checksummed against
the batch twin.

The pytest streaming suite runs at sf0.001 under the test session; this
script is the driver_sim analogue — a PLAIN SparkSession (the real
driver uses one; factory-only confs are latent failures), sf0.01 data,
and the full foreachBatch merge path (streaming/cdc.py) end-to-end:

  events -> change records (op/seq/key/payload)
         -> N seq-ordered parquet files
         -> readStream(maxFilesPerTrigger=1)  [N real micro-batches]
         -> cdc_stream_writer -> chunked parquet target
  vs the batch twin: global latest-change-per-key applied in one pass.

Checksum = xxhash64 over every payload column, summed — order- and
partitioning-insensitive. PASS requires row count AND checksum equality.

Usage: python scripts/streaming_check.py [sf_dir]   (exit 0 = pass)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_FILES = 6
N_KEYS = 500
N_CHUNKS = 16


def build_changes(spark, sf_dir: str):
    """Events as a CDC feed over a keyed state table: key = event_id
    mod N_KEYS (so every key sees multiple updates), seq = event_id
    (monotonic), 'error' events are deletes, everything else upserts
    the (event_type, value) payload."""
    from database_cloner_spark.sources import load

    ev = load(spark, sf_dir, "events").filter(F.col("event_id").isNotNull())
    return ev.select(
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        F.col("event_id").cast("long").alias("seq"),
        (F.col("event_id") % N_KEYS).cast("long").alias("k"),
        F.col("event_type").cast("string").alias("etype"),
        F.col("value").cast("double").alias("value"),
    )


def checksum(df, cols) -> tuple[int, int]:
    """(rows, order-insensitive content hash) over `cols`."""
    row = (
        df.select(
            F.count("*").alias("n"),
            # decimal(38,0) sum: 10k 64-bit hashes overflow a long, and
            # ANSI mode (correctly) raises instead of wrapping.
            F.sum(
                F.xxhash64(
                    *[F.coalesce(F.col(c).cast("string"), F.lit("\0")) for c in cols]
                ).cast("decimal(38,0)")
            ).alias("h"),
        ).first()
    )
    return int(row.n), int(row.h or 0)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("dcs-streaming-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from database_cloner_spark.streaming.cdc import (
        cdc_stream_writer,
        latest_change_per_key,
    )

    work = tempfile.mkdtemp(prefix="dcs_stream_check_")
    feed_dir = os.path.join(work, "feed")
    target = os.path.join(work, "target")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(feed_dir)
    rc = 1
    try:
        changes = build_changes(spark, sf_dir)

        # Seq-ordered delivery: the CDC contract resolves seq ties only
        # WITHIN a batch — across micro-batches, later-arriving wins. So
        # the feed must arrive in seq order for the stream to equal the
        # batch twin: file i holds seq range i, written one at a time so
        # file mtimes (FileStreamSource's discovery order) are monotone.
        max_seq = changes.agg(F.max("seq")).first()[0]
        span = (int(max_seq) // N_FILES) + 1
        pdf = changes.orderBy("seq").toPandas()
        import time as _time

        base_t = _time.time()
        for i in range(N_FILES):
            part = pdf[(pdf["seq"] >= i * span) & (pdf["seq"] < (i + 1) * span)]
            path = os.path.join(feed_dir, f"feed_{i:03d}.parquet")
            part.to_parquet(path)
            # FileStreamSource discovers in mtime order; make it strict.
            os.utime(path, (base_t + i, base_t + i))

        stream = (
            spark.readStream.schema(changes.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed_dir)
        )
        q = (
            cdc_stream_writer(stream, target, "k", n_chunks=N_CHUNKS)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        n_batches = len(q.recentProgress)

        # Batch twin: one global latest-change-per-key pass.
        expected = (
            latest_change_per_key(changes, "k")
            .filter(F.col("op") == "upsert")
            .select("k", "etype", "value")
        )
        got = spark.read.parquet(target).select("k", "etype", "value")

        cols = ["k", "etype", "value"]
        n_exp, h_exp = checksum(expected, cols)
        n_got, h_got = checksum(got, cols)
        ok = n_exp == n_got and h_exp == h_got and n_batches >= N_FILES
        print(
            f"streaming_check: batches={n_batches} rows stream={n_got} "
            f"batch={n_exp} hash stream={h_got} batch={h_exp} "
            f"-> {'PASS' if ok else 'FAIL'}"
        )
        rc = 0 if ok else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
