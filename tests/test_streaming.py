"""Structured Streaming execution tests: the same transforms the oracle
validates in batch, driven incrementally through readStream + memory
sink (file micro-batches, processAllAvailable)."""

from __future__ import annotations

import os
import uuid

import pytest

from pyspark.sql import functions as F

from database_cloner_spark.sources import load
from database_cloner_spark.streaming import events_stream, ops

SF = "/root/testdata/sf0.001"


def _run_to_memory(sdf, name: str, mode: str = "complete"):
    q = (
        sdf.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return name


def test_streaming_tumbling_matches_batch(spark):
    stream = events_stream(spark, SF)
    name = _run_to_memory(ops.tumbling_counts(stream), f"t_{uuid.uuid4().hex[:8]}")
    got = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in ops.tumbling_counts(load(spark, SF, "events")).collect()
    }
    assert got == want


def test_streaming_session_matches_batch(spark):
    stream = events_stream(spark, SF)
    name = _run_to_memory(ops.session_aggregate(stream), f"s_{uuid.uuid4().hex[:8]}")
    got = {
        (r.user_id, r.session_start): (r.n_events, r.sum_value)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        (r.user_id, r.session_start): (r.n_events, r.sum_value)
        for r in ops.session_aggregate(load(spark, SF, "events")).collect()
    }
    assert got == want


def test_streaming_dedup_within_watermark(spark, tmp_path):
    # Two micro-batches with overlapping event_ids: the second batch's
    # duplicates must be dropped by the keyed state.
    src_dir = str(tmp_path / "stream_src")
    os.makedirs(src_dir)
    ev = load(spark, SF, "events").limit(100)
    raw = ev.withColumn("ts", F.unix_micros("ts") * 1000)  # back to nanos longs
    raw.coalesce(1).write.mode("overwrite").parquet(os.path.join(src_dir, "batch1.parquet"))

    from database_cloner_spark.streaming.source import EVENTS_SCHEMA

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(src_dir + "/*")
    ).withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    deduped = ops.dedup_events(stream, within_watermark=True)
    name = f"d_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(processingTime="0 seconds")
        .start()
    )
    q.processAllAvailable()
    n1 = spark.sql(f"SELECT count(*) n FROM {name}").collect()[0].n
    # second batch = same rows again (at-least-once replay)
    raw.coalesce(1).write.mode("overwrite").parquet(os.path.join(src_dir, "batch2.parquet"))
    q.processAllAvailable()
    n2 = spark.sql(f"SELECT count(*) n FROM {name}").collect()[0].n
    q.stop()
    assert n1 == 100
    assert n2 == 100  # replayed duplicates dropped by keyed state


def test_stream_to_log_sink(spark, tmp_path):
    # The streaming log feed must land in the exact LogSink layout and
    # cover every input row once.
    log_path = str(tmp_path / "stream_log")
    stream = events_stream(spark, SF)
    q = (
        ops.stream_to_log(stream, log_path)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(log_path)
    assert got.columns == ["ts", "level", "message"]
    assert got.count() == load(spark, SF, "events").count()
    assert got.filter(F.col("level") != "EVENT").count() == 0


def _ts_median_split(ev):
    """Time-split halves at the median ts: NULL-ts rows ride batch 1 so
    the op's own NULL filter is exercised mid-stream."""
    cutoff = ev.agg(F.percentile_approx("ts", 0.5).alias("c")).collect()[0]["c"]
    half1 = ev.filter(F.col("ts").isNull() | (F.col("ts") <= F.lit(cutoff)))
    half2 = ev.filter(F.col("ts") > F.lit(cutoff))
    return half1, half2


def _drain_two_batches(spark, tmp_path, prefix, half1, half2, op, select_sql):
    """The shared stateful-twin harness: write half1 as a raw-nanos
    parquet batch, open the stream, drain, land half2, drain again,
    and return the memory sink's rows. One definition — the six
    hand-copied versions of this block drifted by round 9 and every
    EVENTS_SCHEMA / ts-encoding change had that many chances to miss
    one (r9 code-review)."""
    src_dir = str(tmp_path / f"{prefix}_src")
    os.makedirs(src_dir)

    def as_raw(df):
        return df.withColumn("ts", F.unix_micros("ts") * 1000)

    as_raw(half1).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src_dir, "b1.parquet")
    )
    from database_cloner_spark.streaming.source import EVENTS_SCHEMA

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(src_dir + "/*")
    ).withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    q = (
        op(stream).writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(processingTime="0 seconds")
        .start()
    )
    q.processAllAvailable()
    as_raw(half2).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src_dir, "b2.parquet")
    )
    q.processAllAvailable()
    rows = spark.sql(f"SELECT {select_sql} FROM {name}").collect()
    q.stop()
    return rows


def test_stateful_running_totals_across_batches(spark, tmp_path):
    # Two micro-batches over disjoint row halves: the keyed state must
    # carry batch-1 counts into batch-2 emissions, and the final totals
    # must equal the batch twin over the full input.
    ev = load(spark, SF, "events")
    rows = _drain_two_batches(
        spark, tmp_path, "rt",
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
        ops.user_running_totals_stream,
        "user_id, n_events, sum_value",
    )
    # last emission per user wins (update mode appends each batch's rows
    # to the memory sink in order)
    final = {}
    for r in rows:
        final[r.user_id] = (r.n_events, r.sum_value)
    want = {
        r.user_id: (r.n_events, r.sum_value)
        for r in ops.user_running_totals_batch(ev).collect()
    }
    assert set(final) == set(want)
    for uid, (n, s) in want.items():
        gn, gs = final[uid]
        assert gn == n
        assert abs(gs - s) < 1e-6


def test_streaming_watermark_drops_late_rows(spark, tmp_path):
    # Batch 1 advances the watermark far ahead; batch 2 is entirely
    # before (max_ts - tolerance) and must not create/extend windows.
    src_dir = str(tmp_path / "late_src")
    os.makedirs(src_dir)
    ev = load(spark, SF, "events")
    on_time = ev.filter(F.col("ts") >= F.lit("2024-01-20").cast("timestamp"))
    late = ev.filter(F.col("ts") < F.lit("2024-01-05").cast("timestamp"))

    def as_raw(df):
        return df.withColumn("ts", F.unix_micros("ts") * 1000)

    as_raw(on_time).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src_dir, "b1.parquet")
    )
    from database_cloner_spark.streaming.source import EVENTS_SCHEMA

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(src_dir + "/*")
    ).withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    agg = ops.with_watermark_filter(stream, tolerance="10 minutes")
    name = f"w_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(processingTime="0 seconds")
        .start()
    )
    q.processAllAvailable()
    rows1 = spark.sql(f"SELECT * FROM {name}").collect()
    as_raw(late).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src_dir, "b2.parquet")
    )
    q.processAllAvailable()
    rows2 = spark.sql(f"SELECT * FROM {name}").collect()
    q.stop()
    starts1 = {r.window_start for r in rows1}
    starts2 = {r.window_start for r in rows2}
    assert starts1  # on-time windows exist
    # no new (pre-Jan-05) windows appeared after the late batch
    assert not {s for s in starts2 if s < "2024-01-05"}


def test_streaming_interval_join_matches_batch(spark):
    stream = events_stream(spark, SF)
    name = _run_to_memory(
        ops.purchase_click_interval_join(stream),
        f"ij_{uuid.uuid4().hex[:8]}",
        mode="append",
    )
    got = {tuple(r) for r in spark.table(name).collect()}
    from database_cloner_spark.sources import load

    want = {
        tuple(r)
        for r in ops.purchase_click_interval_join(load(spark, SF, "events")).collect()
    }
    # The single-file source is one micro-batch; the final watermark may
    # hold back pairs near the stream end, so streaming output is a
    # subset of batch. With availableNow + one batch, all rows emit.
    assert got == want
    assert len(want) > 0


def test_cdc_batch_apply_merges_and_prunes(spark, tmp_path):
    """CDC apply: upsert-over, insert, delete in one batch; untouched
    chunks' files are not rewritten (mtime-stable)."""
    from database_cloner_spark.pipeline.incremental import CHUNK_COL
    from database_cloner_spark.streaming.cdc import apply_cdc_batch

    target = str(tmp_path / "cdc_target")
    seed = spark.createDataFrame(
        [("upsert", 1, k, f"v{k}") for k in range(20)],
        "op string, seq long, k long, val string",
    )
    r1 = apply_cdc_batch(seed, target, "k", n_chunks=8)
    assert r1["upserts"] == 20 and r1["deletes"] == 0

    import glob
    import os as _os

    mtimes_before = {
        p: _os.stat(p).st_mtime
        for p in glob.glob(f"{target}/{CHUNK_COL}=*/*.parquet")
    }

    batch2 = spark.createDataFrame(
        [
            ("upsert", 10, 3, "v3-new"),      # update existing
            ("upsert", 11, 100, "v100"),      # insert new key
            ("delete", 12, 7, None),          # delete existing
            ("upsert", 13, 8, "ghost"),       # upsert then delete, same batch:
            ("delete", 14, 8, None),          # highest seq (delete) wins
        ],
        "op string, seq long, k long, val string",
    )
    r2 = apply_cdc_batch(batch2, target, "k", n_chunks=8)
    assert r2["upserts"] == 2 and r2["deletes"] == 2

    final = {
        r.k: r.val
        for r in spark.read.parquet(target).select("k", "val").collect()
    }
    want = {k: f"v{k}" for k in range(20) if k not in (3, 7, 8)}
    want[3] = "v3-new"
    want[100] = "v100"
    assert final == want

    from database_cloner_spark.pipeline.incremental import with_chunk

    touched = set(r2["touched"])
    for p, old_mtime in mtimes_before.items():
        chunk = int(p.split(f"{CHUNK_COL}=")[1].split("/")[0])
        if chunk not in touched and _os.path.exists(p):
            assert _os.stat(p).st_mtime == old_mtime, f"untouched chunk rewritten: {p}"


def test_cdc_stream_applies_microbatches(spark, tmp_path):
    """Two change files arriving as separate micro-batches leave the
    target equal to applying both batches in order."""
    from pyspark.sql import types as T

    from database_cloner_spark.streaming.cdc import cdc_stream_writer

    src_dir = str(tmp_path / "changes")
    os.makedirs(src_dir)
    target = str(tmp_path / "cdc_target")
    schema = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("k", T.LongType()),
            T.StructField("val", T.StringType()),
        ]
    )
    b1 = spark.createDataFrame(
        [("upsert", 1, k, f"a{k}") for k in range(10)], schema
    )
    b1.coalesce(1).write.mode("overwrite").parquet(os.path.join(src_dir, "b1.parquet"))

    stream = spark.readStream.schema(schema).format("parquet").load(src_dir + "/*")
    q = (
        cdc_stream_writer(
            stream, target, "k", n_chunks=8,
            checkpoint=str(tmp_path / "ckpt"),
        )
        .trigger(processingTime="0 seconds")
        .start()
    )
    q.processAllAvailable()

    b2 = spark.createDataFrame(
        [("delete", 2, 0, None), ("upsert", 3, 5, "a5-new"), ("upsert", 4, 42, "a42")],
        schema,
    )
    b2.coalesce(1).write.mode("overwrite").parquet(os.path.join(src_dir, "b2.parquet"))
    q.processAllAvailable()
    q.stop()

    final = {
        r.k: r.val
        for r in spark.read.parquet(target).select("k", "val").collect()
    }
    want = {k: f"a{k}" for k in range(1, 10)}
    want[5] = "a5-new"
    want[42] = "a42"
    assert final == want


def test_stream_static_enrichment_matches_batch(spark):
    """Stream-static broadcast join: streamed events enriched with the
    static per-user profile equal the batch join, including users
    absent from the profile (left join keeps them with NULL segment)."""
    ev = load(spark, SF, "events")
    profile = ops.user_profiles(ev.filter(F.col("user_id") % 2 == 0))
    stream = events_stream(spark, SF)
    name = _run_to_memory(
        ops.enrich_with_profile(stream, profile),
        f"en_{uuid.uuid4().hex[:8]}",
        mode="append",
    )
    got = {
        (r.event_id, r.segment)
        for r in spark.sql(f"SELECT event_id, segment FROM {name}").collect()
    }
    want = {
        (r.event_id, r.segment)
        for r in ops.enrich_with_profile(ev, profile).collect()
    }
    assert got == want
    assert any(s is None for _, s in want)  # odd users stay, unenriched


def test_streaming_total_on_nasty_events(spark, tmp_path):
    """Adversarial totality for the streaming path: the nasty events
    fixture (NULL columns, malformed props, duplicate timestamps,
    epoch-extreme ts — tests/test_adversarial_events.py) must stream
    through the windowed aggregation without killing the query, and
    match the same transform run in batch over the same files."""
    import uuid as _uuid

    from tests import test_adversarial_events as nasty

    d = str(tmp_path / "nasty_stream")
    os.makedirs(d)
    nasty.write_fixture(d)

    stream = events_stream(spark, d)
    name = _run_to_memory(
        ops.tumbling_counts(stream), f"n_{_uuid.uuid4().hex[:8]}"
    )

    # The nasty fixture's NaN purchase values make some sum_value NaN
    # on BOTH sides (r10 NaN sweep) — stringify so NaN compares equal
    # (Python nan != nan would fail an otherwise identical pair).
    def norm(v):
        return repr(v)

    got = {
        (r.window_start, r.event_type): (r.n, norm(r.sum_value))
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n, norm(r.sum_value))
        for r in ops.tumbling_counts(load(spark, d, "events")).collect()
    }
    assert got == want and got


def test_late_nanos_file_fails_stream_loudly(spark, tmp_path):
    """VERDICT r4 #8: when the footer probe fell back to the MICROS
    schema (no file at stream-definition time), a legacy
    TIMESTAMP(NANOS) file arriving later must FAIL the stream — a
    parquet type mismatch (nanosAsLong surfaces the column as INT64,
    rejected by the declared TimestampType) — never a silent 1000x
    timestamp misread."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest
    from pyspark.errors import StreamingQueryException

    d = str(tmp_path / "late_nanos")
    os.makedirs(d)
    stream = events_stream(spark, d)  # probe falls back: no file yet
    t = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(
                [1700000000_000_000_000, 1700000100_000_000_000],
                pa.timestamp("ns"),
            ),
            "user_id": pa.array([1, 1], pa.int64()),
            "event_type": pa.array(["click", "view"], pa.string()),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(["{}", "{}"], pa.string()),
        }
    )
    pq.write_table(t, os.path.join(d, "events.parquet"))
    q = (
        stream.writeStream.format("memory")
        .queryName("late_nanos_loud")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="MISMATCH|mismatch"):
        q.awaitTermination(120)
        q.processAllAvailable()
    assert q.exception() is not None


def test_streaming_heavy_hitters_matches_batch(spark):
    stream = events_stream(spark, SF)
    name = _run_to_memory(
        ops.windowed_heavy_hitters(stream), f"hh_{uuid.uuid4().hex[:8]}"
    )
    got = {
        (r.window_start, r.user_id): r.n
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        (r.window_start, r.user_id): r.n
        for r in ops.windowed_heavy_hitters(load(spark, SF, "events")).collect()
    }
    assert got == want and want, "heavy-hitter sets must match and be non-empty"


def test_stateful_ewma_stream_bit_equals_batch_twin(spark, tmp_path):
    """user_ewma_stream drained over two TIME-SPLIT micro-batches must
    be BIT-EQUAL (==, not isclose) to q_ts_ewma's batch answer: the
    recurrence folds in the same (ts, event_id) order and Python floats
    are the same IEEE doubles the JVM aggregate HOF produces."""
    # UNFILTERED events: NULL user_id/value/ts rows ride the stream and
    # the op itself must drop them (batch-twin contract)
    half1, half2 = _ts_median_split(load(spark, SF, "events"))
    rows = _drain_two_batches(
        spark, tmp_path, "ewma", half1, half2,
        ops.user_ewma_stream, "user_id, n_events, ewma",
    )
    final = {}
    for r in rows:  # update mode: the emission with the largest n wins
        # (order-independent: memory-sink scans carry no cross-batch
        # ordering guarantee, and n_events grows monotonically)
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, r.ewma)
    from database_cloner_spark.registry import specs

    want = {
        r.user_id: (r.n_events, r.ewma)
        for r in specs()["q_ts_ewma"].builder(spark, SF).collect()
    }
    assert set(final) == set(want)
    for uid, (n, e) in want.items():
        gn, ge = final[uid]
        assert gn == n, (uid, gn, n)
        assert ge == e, (uid, ge, e)  # bit-equality, by construction


def test_stateful_sessions_stream_equals_batch_twin(spark, tmp_path):
    """user_sessions_stream drained over two TIME-SPLIT micro-batches
    must equal user_sessions_batch row for row — every output is an
    exact integer (n_events, epoch-us duration, epoch-us start), so the
    comparison is ==. The split lands mid-stream, so sessions that
    straddle the batch boundary exercise the open-session re-emission
    path (latest emission per (user, session_idx) = largest n_events)."""
    half1, half2 = _ts_median_split(load(spark, SF, "events"))
    rows = _drain_two_batches(
        spark, tmp_path, "sess", half1, half2,
        ops.user_sessions_stream,
        "user_id, session_idx, n_events, duration_us, start_us",
    )
    final = {}
    for r in rows:  # latest emission per session: n_events only grows
        k = (r.user_id, r.session_idx)
        if k not in final or r.n_events > final[k][0]:
            final[k] = (r.n_events, r.duration_us, r.start_us)
    want = {
        (r.user_id, r.session_idx): (r.n_events, r.duration_us, r.start_us)
        for r in ops.user_sessions_batch(load(spark, SF, "events")).collect()
    }
    assert final == want
    # straddle check: at least one user's stream state crossed the
    # split (a session whose start is in half1 but whose batch row has
    # more events than half1 alone contributed) — guarantees the
    # open-session path was actually exercised by this fixture
    assert len(want) > 0


def test_stateful_holt_stream_bit_equals_batch_twin(spark, tmp_path):
    """user_holt_stream drained over two TIME-SPLIT micro-batches must
    be BIT-EQUAL (==, not isclose) to q_ts_holt's batch answer: the
    coupled level/trend recurrence folds in the same (ts, event_id)
    order and Python floats are the same IEEE doubles as the JVM HOF's."""
    half1, half2 = _ts_median_split(load(spark, SF, "events"))
    rows = _drain_two_batches(
        spark, tmp_path, "holt", half1, half2,
        ops.user_holt_stream,
        "user_id, n_events, level, trend, forecast_1",
    )
    final = {}
    for r in rows:  # update mode: the emission with the largest n wins
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, r.level, r.trend, r.forecast_1)
    from database_cloner_spark.registry import specs

    want = {
        r.user_id: (r.n_events, r.level, r.trend, r.forecast_1)
        for r in specs()["q_ts_holt"].builder(spark, SF).collect()
    }
    assert set(final) == set(want)
    for uid, w in want.items():
        assert final[uid] == w, (uid, final[uid], w)  # bit-equality


def test_stateful_running_distinct_stream_equals_batch_twin(spark, tmp_path):
    """user_running_distinct_stream drained over two TIME-SPLIT
    micro-batches must equal q_win_running_distinct's batch answer
    ROW-FOR-ROW (integer-exact drained-equal contract): every event
    emits exactly one row carrying the post-event distinct-type count,
    and the keyed state (the seen-type set) is bounded by the type
    domain, not the stream length."""
    half1, half2 = _ts_median_split(load(spark, SF, "events"))
    rows = _drain_two_batches(
        spark, tmp_path, "rdist", half1, half2,
        ops.user_running_distinct_stream,
        "event_id, user_id, n_types_seen",
    )
    got = {(r.event_id, r.user_id): r.n_types_seen for r in rows}
    assert len(got) == len(rows)  # each event emitted exactly once
    from database_cloner_spark.registry import specs

    want = {
        (r.event_id, r.user_id): r.n_types_seen
        for r in specs()["q_win_running_distinct"].builder(spark, SF).collect()
    }
    assert got == want


def _kill_restart_two_batches(spark, tmp_path, prefix, half1, half2, op,
                              mode="update"):
    """The production failure mode of stateful streaming, as a shared
    harness (one definition for all four stateful ops — the
    _drain_two_batches lesson): batch 1 drains, the query is STOPPED, a
    brand-new query starts from the SAME checkpoint directory, batch 2
    drains through the restarted query. Returns every emitted row. The
    restored keyed state must carry batch-1 folds into batch-2
    emissions. Memory sink cannot recover from a checkpoint in update
    mode, so the harness sinks via foreachBatch into an append-parquet
    log (the fault-tolerant shape production uses); the file SOURCE's
    processed-file log lives in the same checkpoint, so the restarted
    query replays NOTHING — only the restored state plus the new file."""
    src_dir = str(tmp_path / f"{prefix}_src")
    out_dir = str(tmp_path / f"{prefix}_out")
    ckpt = str(tmp_path / f"{prefix}_ckpt")
    os.makedirs(src_dir)

    def as_raw(df):
        return df.withColumn("ts", F.unix_micros("ts") * 1000)

    from database_cloner_spark.streaming.source import EVENTS_SCHEMA

    def start_query():
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .format("parquet")
            .load(src_dir + "/*")
        ).withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out_dir)

        return (
            op(stream)
            .writeStream.outputMode(mode)
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    # run 1: batch 1 only, then KILL the query
    as_raw(half1).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src_dir, "b1.parquet")
    )
    q1 = start_query()
    q1.processAllAvailable()
    q1.stop()

    # run 2: new file lands while the query is down; restart from the
    # same checkpoint with a NEW query object
    as_raw(half2).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src_dir, "b2.parquet")
    )
    q2 = start_query()
    q2.processAllAvailable()
    q2.stop()
    return spark.read.parquet(out_dir).collect()


def test_stateful_ewma_checkpoint_kill_and_restart(spark, tmp_path):
    """Kill-and-restart: the final per-user EWMA must still be
    BIT-EQUAL to the q_ts_ewma batch answer over the full input."""
    half1, half2 = _ts_median_split(load(spark, SF, "events"))
    rows = _kill_restart_two_batches(
        spark, tmp_path, "cks", half1, half2, ops.user_ewma_stream
    )

    final = {}
    for r in rows:
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, r.ewma)
    from database_cloner_spark.registry import specs

    want = {
        r.user_id: (r.n_events, r.ewma)
        for r in specs()["q_ts_ewma"].builder(spark, SF).collect()
    }
    assert set(final) == set(want)
    for uid, w in want.items():
        assert final[uid] == w, (uid, final[uid], w)  # bit-equality

    # Prove the restart actually RESTORED state rather than refolding
    # everything: some user must span both halves, and its batch-2
    # emission count must exceed what batch 2 alone contributed.
    h2_counts = {
        r.user_id: r.cnt
        for r in half2.filter(
            F.col("user_id").isNotNull()
            & F.col("value").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_id").isNotNull()
        ).groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
    }
    spanning = [
        uid for uid, (n, _) in final.items()
        if uid in h2_counts and n > h2_counts[uid]
    ]
    assert spanning, "fixture must have users spanning the restart"


def test_stateful_sessions_checkpoint_kill_and_restart(spark, tmp_path):
    """Kill-and-restart for the sessionizer (VERDICT r10 item 5): the
    restored state must keep OPEN sessions alive across the restart —
    a session straddling the kill point must emit one final row with
    the full event count, bit-equal to user_sessions_batch."""
    half1, half2 = _ts_median_split(load(spark, SF, "events"))
    rows = _kill_restart_two_batches(
        spark, tmp_path, "cksess", half1, half2, ops.user_sessions_stream
    )
    final = {}
    for r in rows:  # latest emission per session: n_events only grows
        k = (r.user_id, r.session_idx)
        if k not in final or r.n_events > final[k][0]:
            final[k] = (r.n_events, r.duration_us, r.start_us)
    want = {
        (r.user_id, r.session_idx): (r.n_events, r.duration_us, r.start_us)
        for r in ops.user_sessions_batch(load(spark, SF, "events")).collect()
    }
    assert final == want
    # the restart must have RESTORED an open session, not restarted
    # numbering: a session emitted in BOTH runs produces two rows for
    # one (user, session_idx) key, so total emissions exceed the number
    # of distinct sessions iff state crossed the kill point
    assert len(rows) > len(final), "no session spanned the restart"


def test_stateful_holt_checkpoint_kill_and_restart(spark, tmp_path):
    """Kill-and-restart for Holt's linear trend: the restored
    (level, trend, n) state must continue the coupled recurrence so the
    final per-user state is BIT-EQUAL to q_ts_holt's batch answer."""
    half1, half2 = _ts_median_split(load(spark, SF, "events"))
    rows = _kill_restart_two_batches(
        spark, tmp_path, "ckholt", half1, half2, ops.user_holt_stream
    )
    final = {}
    for r in rows:
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, r.level, r.trend, r.forecast_1)
    from database_cloner_spark.registry import specs

    want = {
        r.user_id: (r.n_events, r.level, r.trend, r.forecast_1)
        for r in specs()["q_ts_holt"].builder(spark, SF).collect()
    }
    assert set(final) == set(want)
    for uid, w in want.items():
        assert final[uid] == w, (uid, final[uid], w)  # bit-equality


def test_stateful_running_distinct_checkpoint_kill_and_restart(spark, tmp_path):
    """Kill-and-restart for the running-distinct counter: the restored
    seen-type set must make post-restart events count only NEW types,
    so the per-event counts match q_win_running_distinct exactly and
    no event is emitted twice (the file-source log replays nothing)."""
    half1, half2 = _ts_median_split(load(spark, SF, "events"))
    rows = _kill_restart_two_batches(
        spark, tmp_path, "ckdist", half1, half2,
        ops.user_running_distinct_stream,
    )
    got = {(r.event_id, r.user_id): r.n_types_seen for r in rows}
    assert len(got) == len(rows)  # each event emitted exactly once
    from database_cloner_spark.registry import specs

    want = {
        (r.event_id, r.user_id): r.n_types_seen
        for r in specs()["q_win_running_distinct"].builder(spark, SF).collect()
    }
    assert got == want


# --- r13 (VERDICT r12 item 5): kill-and-restart for the four REGISTERED
# built-in stateful streaming keys (the custom applyInPandasWithState
# ops got theirs in r10/commit 986c635; these are Spark's own stateful
# operators — windowed agg, dropDuplicatesWithinWatermark, stream-stream
# join — whose state restore path is different code and deserves its
# own exactly-once proof).


def _split_at_hot_pair(ev):
    """Split the stream BETWEEN two same-user events inside one hour
    window (the sf0.001 fixture is sparse — ~1000 events over a month —
    so a median cut usually lands in a single-event window and nothing
    spans the kill). Cutting at the hot pair's first event guarantees
    both a window and a (window, user) counter straddle the restart."""
    pairs = (
        ev.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("ts").alias("d"),
            F.min("ts").alias("mn"),
        )
        .filter((F.col("n") >= 2) & (F.col("d") >= 2))
        .orderBy(F.desc("n"), F.asc("mn"))
        .limit(1)
        .collect()
    )
    assert pairs, "fixture must hold a >=2-event (window, user) pair"
    cutoff = pairs[0]["mn"]
    half1 = ev.filter(F.col("ts").isNull() | (F.col("ts") <= F.lit(cutoff)))
    half2 = ev.filter(F.col("ts") > F.lit(cutoff))
    return half1, half2


def test_stream_watermark_checkpoint_kill_and_restart(spark, tmp_path):
    """q_stream_watermark_late's streaming form: after a kill/restart,
    the final per-window count must equal the batch twin over the full
    input, and the boundary window must have emitted BOTH its batch-1
    partial and its restored-state total (the total can only come from
    run 2 — run 1 never saw half2's rows — so its presence proves the
    window state was restored, not refolded)."""
    half1, half2 = _split_at_hot_pair(load(spark, SF, "events"))
    rows = _kill_restart_two_batches(
        spark, tmp_path, "ckwm", half1, half2, ops.with_watermark_filter
    )
    emitted = {}
    for r in rows:
        emitted.setdefault(r.window_start, set()).add(r.n)
    final = {w: max(ns) for w, ns in emitted.items()}
    from database_cloner_spark.registry import specs

    want = {
        r.window_start: r.n
        for r in specs()["q_stream_watermark_late"]
        .builder(spark, SF)
        .collect()
    }
    assert final == want

    def wcounts(half):
        return {
            r.window_start: r.n
            for r in ops.with_watermark_filter(half).collect()
        }

    h1, h2 = wcounts(half1), wcounts(half2)
    spanning = [w for w in want if h1.get(w, 0) > 0 and h2.get(w, 0) > 0]
    assert spanning, "median split must leave a window spanning the kill"
    for w in spanning:
        assert emitted[w] >= {h1[w], h1[w] + h2[w]}, (w, emitted[w])


def test_stream_heavy_hitters_checkpoint_kill_and_restart(spark, tmp_path):
    """q_stream_heavy_hitters: a user whose count crosses the
    min_count threshold only across the restart can ONLY be emitted
    with restored state (run 2 alone undercounts and may never promote
    them) — so final == batch twin is itself the exactly-once proof,
    given spanning (window, user) pairs exist (the split constructs
    one: the hot pair contributes 1 event per half, below min_count on
    each side alone)."""
    half1, half2 = _split_at_hot_pair(load(spark, SF, "events"))
    rows = _kill_restart_two_batches(
        spark, tmp_path, "ckhh", half1, half2, ops.windowed_heavy_hitters
    )
    final = {}
    for r in rows:
        k = (r.window_start, r.user_id)
        final[k] = max(final.get(k, 0), r.n)
    from database_cloner_spark.registry import specs

    want = {
        (r.window_start, r.user_id): r.n
        for r in specs()["q_stream_heavy_hitters"]
        .builder(spark, SF)
        .collect()
    }
    assert final == want

    def wu(half):
        out = {}
        for r in (
            half.filter(F.col("ts").isNotNull())
            .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
            .agg(F.count("*").alias("n"))
            .collect()
        ):
            out[(r.w.start.strftime("%Y-%m-%d %H:%M:%S"), r.user_id)] = r.n
        return out

    h1, h2 = wu(half1), wu(half2)
    spanning = [k for k in want if h1.get(k, 0) > 0 and h2.get(k, 0) > 0]
    assert spanning, "median split must leave (window, user) pairs spanning the kill"


def _mk_events(spark, rows):
    """Synthetic events with CONTROLLED timestamps (the fixture halves
    are right for aggregate twins, but dedup/join state eviction is
    watermark-relative, so these tests pin event times explicitly)."""
    from datetime import datetime, timedelta

    base = datetime(2024, 3, 1, 12, 0, 0)
    return spark.createDataFrame(
        [
            (eid, base + timedelta(minutes=m), uid, typ, 1.0, "{}")
            for eid, m, uid, typ in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_stream_dedup_checkpoint_kill_and_restart(spark, tmp_path):
    """q_stream_dedup's streaming form (dropDuplicatesWithinWatermark):
    ids 2 and 3 are RE-DELIVERED after the restart (at-least-once
    upstream, the exact failure this operator exists for). They must
    NOT re-emit — only the restored key state can know they were seen
    before the kill — and the new ids must emit exactly once."""
    b1 = _mk_events(spark, [
        (1, 0, 10, "click"), (2, 5, 11, "view"), (3, 10, 12, "click"),
    ])
    b2 = _mk_events(spark, [
        (2, 5, 11, "view"), (3, 10, 12, "click"),       # re-delivered
        (4, 20, 13, "purchase"), (5, 25, 14, "click"),  # new
    ])
    rows = _kill_restart_two_batches(
        spark, tmp_path, "ckdd", b1, b2,
        lambda df: ops.dedup_events(df, within_watermark=True),
        mode="append",
    )
    ids = sorted(r.event_id for r in rows)
    assert ids == [1, 2, 3, 4, 5], ids  # each exactly once


def test_stream_interval_join_checkpoint_kill_and_restart(spark, tmp_path):
    """q_stream_interval_join's streaming form: a purchase arriving
    AFTER the restart must still pair with a click buffered BEFORE the
    kill — only the restored join state holds that click. Expected
    pairs: (2,1) within run 1; (4,1) across the restart; (5,3) across;
    (7,6) within run 2. No duplicates, no misses."""
    b1 = _mk_events(spark, [
        (1, 0, 1, "click"), (2, 5, 1, "purchase"), (3, 8, 2, "click"),
    ])
    b2 = _mk_events(spark, [
        (4, 30, 1, "purchase"),   # pairs with click 1 (30 min back)
        (5, 35, 2, "purchase"),   # pairs with click 3
        (6, 40, 3, "click"), (7, 50, 3, "purchase"),
    ])
    rows = _kill_restart_two_batches(
        spark, tmp_path, "ckij", b1, b2,
        ops.purchase_click_interval_join, mode="append",
    )
    pairs = sorted((r.purchase_id, r.click_id) for r in rows)
    assert pairs == [(2, 1), (4, 1), (5, 3), (7, 6)], pairs
