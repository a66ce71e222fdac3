"""Isolated best-of-N re-measurement (the BASELINE.md r7 adjudication
protocol): one process, one key at a time, N timed executions with the
bench's noop sink, minimum reported. Run on a QUIET box — this is the
figure per-key sweep numbers (upper bounds, session-crowded) are
adjudicated against.

Each target key is warmed ONCE untimed before its timed passes
(VERDICT r11): the first execution of a heavy key pays whole-stage-
codegen compile (observed 30.7s vs a 1.35s steady state), which used to
eat 1 of the 5 samples.

Usage: python scripts/isolated_bench.py [sf_dir] key [key ...]
       (sf_dir defaults to /root/testdata/sf0.1;
        SPARK_GRAFT_ISOLATED_PASSES overrides the default 5 passes)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_cloner_spark.registry import specs  # noqa: E402
from database_cloner_spark.session import get_spark  # noqa: E402


def main(argv: list[str]) -> None:
    args = list(argv)
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    n_passes = int(os.environ.get("SPARK_GRAFT_ISOLATED_PASSES", "5"))
    registry = specs()
    spark = get_spark("dcs-isolated-bench")
    # warm the JVM/parquet footers once, untimed (bench.py protocol)
    registry["q1_pricing_summary"].builder(spark, sf_dir).count()
    out: dict[str, dict] = {}
    for name in args:
        builder = registry[name].builder
        # per-key untimed warm pass: codegen compile is a fixed cost
        # that amortizes at scale — it must not poison sample 1
        builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times = []
        for _ in range(max(1, n_passes)):
            t0 = time.perf_counter()
            builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.perf_counter() - t0, 4))
        out[name] = {"best": min(times), "series": times}
        print(f"{name}: best {min(times)}s  series {times}", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "isolated": out}))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
