"""§2.9 Streaming operators — written once, run in BOTH batch and
streaming mode (the transforms only use operations legal under
Structured Streaming's incremental model; the oracle queries run them
in batch, tests run them via readStream + memory sink).

Output timestamps are formatted to strings at the edge (UTC session TZ)
so results hash identically across Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling-window counts + sums per event type."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", TS_FMT).alias("window_start"),
            F.date_format("w.end", TS_FMT).alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(events: DataFrame, width: str = "1 hour", slide: str = "15 minutes") -> DataFrame:
    """Sliding-window counts: each event lands in width/slide windows."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", TS_FMT).alias("window_start"),
            "event_type",
            "n",
        )
    )


def session_aggregate(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based session windows per user: merged while consecutive
    events are < gap apart; session end = last event + gap."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.date_format("w.start", TS_FMT).alias("session_start"),
            F.date_format("w.end", TS_FMT).alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def with_watermark_filter(events: DataFrame, tolerance: str = "10 minutes") -> DataFrame:
    """Watermark + windowed count. In streaming mode the watermark drops
    data later than `tolerance` behind the max event time and bounds
    state; the batch analog of the state-eviction effect is checked by
    the oracle twin (filter vs max(ts) - tolerance)."""
    return (
        events.withWatermark("ts", tolerance)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.date_format("w.start", TS_FMT).alias("window_start"), "n")
    )


def dedup_events(events: DataFrame, within_watermark: bool = False) -> DataFrame:
    """Stateful dedup on event_id. Streaming: dropDuplicatesWithinWatermark
    bounds the key state; batch: plain dropDuplicates (same result set)."""
    cols = ["event_id", "user_id", "event_type"]
    projected = events.select(*cols)
    if within_watermark:
        return (
            events.withWatermark("ts", "1 hour")
            .dropDuplicatesWithinWatermark(["event_id"])
            .select(*cols)
        )
    return projected.dropDuplicates(["event_id"])
