"""Measure the skew tools' PERF claim, not just their parity (VERDICT
r6 #5): on a deliberately skewed fixture (one key owns ~50% of rows),
compare STRAGGLER TASK TIME — max executorRunTime over the run's
stages, from the Spark REST API — salted vs unsalted, best-of-5.

Three join variants separate what salting buys from what AQE's skew
split already gives. Only spark.sql.adaptive.skewJoin.enabled is
toggled — AQE itself (partition coalescing, runtime re-planning) stays
ON in every variant, so the names say "skew split", not "AQE"
(ADVICE r7: the old *_noaqe labels overstated the isolation):
  join_unsalted_noskewsplit — plain shuffle join, skew split OFF: the
                              one-reducer pathology salting exists for;
  join_salted_noskewsplit   — salted_join(16), same confs: the claim
                              under test (straggler bounded to ~1/16);
  join_unsalted_skewsplit   — skew split ON: the runtime alternative,
                              for honest context (when it applies,
                              prefer it; salted_join is for when it
                              doesn't — e.g. the join feeds an agg
                              needing the key whole).
Plus both agg variants (sum/count groupBy), where Spark's map-side
partial aggregation is EXPECTED to flatten the skew already — the
honest negative result goes in SCALE.md either way.

Acts as its own regression guard: exits 1 if the salted join's
straggler is not at least 2x better than the unsalted no-AQE one.

Usage: python scripts/measure_skew.py [n_rows]   (default 4_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_SALTS = 16
BEST_OF = 5


def rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def completed_stage_ids(spark) -> set[tuple[int, int]]:
    return {
        (s["stageId"], s["attemptId"])
        for s in rest(spark, "/stages?status=complete")
    }


def straggler_ms(spark, before: set[tuple[int, int]]) -> float:
    """Max task executorRunTime (ms) across stages completed since
    `before` — the straggler of this run."""
    worst = 0.0
    for s in rest(spark, "/stages?status=complete"):
        sid = (s["stageId"], s["attemptId"])
        if sid in before:
            continue
        summ = rest(
            spark,
            f"/stages/{sid[0]}/{sid[1]}/taskSummary?quantiles=1.0",
        )
        worst = max(worst, float(summ["executorRunTime"][0]))
    return worst


def timed(spark, df) -> tuple[float, float]:
    """(wall sec, straggler task ms) for one noop-sink execution."""
    before = completed_stage_ids(spark)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    return wall, straggler_ms(spark, before)


def best_of(spark, build, n: int = BEST_OF) -> dict:
    walls, strags = [], []
    for _ in range(n):
        w, s = timed(spark, build())
        walls.append(round(w, 3))
        strags.append(round(s, 1))
    return {
        "wall_best": min(walls),
        "straggler_ms_best": min(strags),
        "walls": walls,
        "stragglers_ms": strags,
    }


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("dcs-skew-measure")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from database_cloner_spark.functions.skew import salted_agg, salted_join

    # Skewed fixture: key 0 owns 50% of rows; the rest spread over 999
    # keys. Payload is a non-trivially-wide string so per-row join cost
    # is realistic (a pure-long row underprices the straggler).
    fact = (
        spark.range(n_rows)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(999)) + 1)
            .cast("long")
            .alias("k"),
            (F.col("id") % 997).cast("double").alias("v"),
            F.concat(F.lit("payload_"), F.col("id").cast("string")).alias("p"),
        )
        .localCheckpoint(eager=True)  # freeze: exclude generation cost
    )
    dim = (
        spark.range(1000)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("dim_"), F.col("id").cast("string")).alias("d"),
        )
        .localCheckpoint(eager=True)
    )

    def set_skew_aqe(on: bool) -> None:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(on).lower())

    results: dict[str, dict] = {}

    set_skew_aqe(False)
    results["join_unsalted_noskewsplit"] = best_of(
        spark,
        lambda: fact.join(dim, "k").groupBy("k").agg(
            F.count("*").alias("n"), F.max("d").alias("d")
        ),
    )
    results["join_salted_noskewsplit"] = best_of(
        spark,
        lambda: salted_join(fact, dim, "k", n_salts=N_SALTS)
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.max("d").alias("d")),
    )
    set_skew_aqe(True)
    results["join_unsalted_skewsplit"] = best_of(
        spark,
        lambda: fact.join(dim, "k").groupBy("k").agg(
            F.count("*").alias("n"), F.max("d").alias("d")
        ),
    )

    results["agg_unsalted"] = best_of(
        spark,
        lambda: fact.groupBy("k").agg(
            F.sum("v").alias("sv"), F.count("*").alias("n")
        ),
    )
    results["agg_salted"] = best_of(
        spark,
        lambda: salted_agg(
            fact,
            ["k"],
            [F.sum("v").alias("sv"), F.count("*").alias("n")],
            n_salts=N_SALTS,
        ),
    )

    un = results["join_unsalted_noskewsplit"]["straggler_ms_best"]
    sa = results["join_salted_noskewsplit"]["straggler_ms_best"]
    ratio = un / max(sa, 1.0)
    ok = ratio >= 2.0
    print(
        json.dumps(
            {
                "n_rows": n_rows,
                "n_salts": N_SALTS,
                "results": results,
                "join_straggler_ratio_unsalted_over_salted": round(ratio, 2),
                "guard_pass": ok,
            },
            indent=1,
        )
    )
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
