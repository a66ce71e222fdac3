"""Drained-stream throughput for the four custom stateful streaming ops
(VERDICT r11 item 6): EWMA, Holt, sessionizer, running-distinct have
bit-equality + kill-and-restart tests but carried no recorded rows/s.

Protocol: readStream over the sf events table (streaming/source.py,
the real file-source path), op -> memory sink, availableNow trigger,
processAllAvailable() timed wall-clock; rows/s = input events / drain
seconds. One warm drain of the CHEAPEST op first (JVM + Python-worker
startup is a fixed cost that would otherwise land on whichever op runs
first). Merges a `streaming_throughput` section into BENCH_DETAIL.json.

Usage: python scripts/streaming_throughput.py [sf_dir]
       (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from database_cloner_spark.session import get_spark  # noqa: E402
from database_cloner_spark.sources import load  # noqa: E402
from database_cloner_spark.streaming import events_stream, ops  # noqa: E402

DETAIL = os.path.join(REPO, "BENCH_DETAIL.json")

OPS = {
    "user_ewma_stream": ops.user_ewma_stream,
    "user_holt_stream": ops.user_holt_stream,
    "user_sessions_stream": ops.user_sessions_stream,
    "user_running_distinct_stream": ops.user_running_distinct_stream,
}


def drain(spark, sf_dir: str, op) -> float:
    name = f"tp_{uuid.uuid4().hex[:8]}"
    q = (
        op(events_stream(spark, sf_dir))
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    t0 = time.perf_counter()
    q.processAllAvailable()
    sec = time.perf_counter() - t0
    q.stop()
    spark.catalog.dropTempView(name)
    return sec


def main(argv: list[str]) -> None:
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    spark = get_spark("dcs-stream-throughput")
    n_events = load(spark, sf_dir, "events").count()
    # warm: one throwaway drain pays JVM/Python-worker startup
    drain(spark, sf_dir, ops.user_ewma_stream)

    out: dict[str, dict] = {}
    for name, op in OPS.items():
        sec = min(drain(spark, sf_dir, op) for _ in range(2))
        out[name] = {
            "input_rows": n_events,
            "drain_sec": round(sec, 4),
            "rows_per_sec": round(n_events / sec) if sec > 0 else 0,
        }
        print(f"{name}: {out[name]['rows_per_sec']} rows/s "
              f"({sec:.2f}s over {n_events})", flush=True)

    with open(DETAIL) as fh:
        detail = json.load(fh)
    detail["streaming_throughput"] = {"sf_dir": sf_dir, "ops": out}
    with open(DETAIL, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({"streaming_throughput": {
        k: v["rows_per_sec"] for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
