"""Streaming source for the `events` table.

The reference's only stream is its append-only log (clone_databases.sh:30,
`tee -a`); the [X] tier generalizes that to a real event stream. File
source here (each parquet file appearing in the directory is a
micro-batch); on a cluster the same transforms run unchanged on a Kafka
source — only this module swaps.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # TIMESTAMP(NANOS) arrives as long
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events file(s); ts normalized to a proper
    timestamp exactly like the batch loader (sources/parquet.py)."""
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        # file source needs a directory; glob-select just the events table
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
