"""Empirical 10x scale-up validation (VERDICT r11 item 1): run the most
expensive sweep keys, plus the clone/resync pipelines, at sf0.1 AND at
the derived ~sf1 fixture (scripts/build_sf1_derived.py), and merge an
`sf1_derived` section into BENCH_DETAIL.json with per-key time ratios.

Pass criterion: ratio <= ~12x (linear in data plus fixed overhead).
Keys above it are either genuinely superlinear (fix) or quadratic BY
DESIGN (the documented exact-oracle baselines — annotate, their scale
twins are the registered production path).

Protocol: one session; per key and per dir, one untimed warm pass
(codegen compile) then best-of-2 timed with the bench noop sink. Run on
a quiet box.

Usage: python scripts/sf1_scale_run.py [sf1_dir] [key ...]
       (sf1_dir default /tmp/dcs_sf1_derived; keys default to the top
        25 by current BENCH_DETAIL sweep time + the headline joins)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from database_cloner_spark.registry import specs  # noqa: E402
from database_cloner_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
DETAIL = os.path.join(REPO, "BENCH_DETAIL.json")

# Keys whose measured ratio may exceed the ~12x criterion BY THE
# OPERATOR'S OWN SEMANTICS, with the reason recorded next to the number
# (the "quadratic by design -> annotate" branch of the pass criterion).
# An unannotated key over 12x is still a defect.
ANNOTATIONS = {
    # r14: the fixed-domain artifact this annotation described is FIXED
    # in the fixture itself — build_sf1_derived.py now shifts acctbal by
    # copy * 11000 so the value domain grows with the data and overlap
    # pairs grow linearly, the honest 100 TB shape (VERDICT r13 item 8).
    # The annotation stays for any older fixture directory still on
    # disk; rebuild with scripts/build_sf1_derived.py to measure the key
    # without the artifact.
    "q_join_interval_overlap": (
        "overlap-pair COUNT is the operator's semantic work product and "
        "grows ~densityA x densityB when both acctbal interval sets get "
        "10x denser over a FIXED [-999, 9999] value domain (pre-r14 "
        "fixtures; ~100x pairs, ~12x wall was strongly sublinear). The "
        "r14 fixture shifts acctbal per copy so the domain grows with "
        "the data and pair growth is linear; the grid form's "
        "replication factor stays 2."
    ),
}


def default_keys(n: int = 25) -> list[str]:
    with open(DETAIL) as fh:
        d = json.load(fh)
    pooled = {**(d.get("all_keys_queries") or {}),
              **(d.get("headline_queries") or {})}
    return [k for k, _ in sorted(
        pooled.items(), key=lambda kv: -kv[1])[:n]]


def time_key(spark, builder, d: str) -> float:
    builder(spark, d).write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        builder(spark, d).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def clone_figures(spark, d: str) -> dict:
    import shutil
    import tempfile

    from pyspark.sql import functions as F  # noqa: N812

    from database_cloner_spark.pipeline import incremental as incr
    from database_cloner_spark.pipeline.clone import CloneConfig, ClonePipeline
    from database_cloner_spark.sources.parquet import load

    out: dict = {}
    scratch = tempfile.mkdtemp(prefix="dcs_sf1_clone_")
    try:
        t0 = time.perf_counter()
        run = ClonePipeline(
            spark,
            CloneConfig(source_dir=d, target_dir=scratch,
                        verify_clone=False, overwrite=True, seed=42),
        ).run()
        sec = time.perf_counter() - t0
        rows = sum(r.rows for r in run.results)
        out["clone_rows"] = rows
        out["clone_sec"] = round(sec, 4)
        out["clone_rows_per_sec"] = round(rows / sec) if sec > 0 else 0
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    li = load(spark, d, "lineitem")
    scratch = tempfile.mkdtemp(prefix="dcs_sf1_incr_")
    try:
        incr.incremental_clone(spark, li, scratch, "l_orderkey")
        mutated = li.withColumn(
            "l_quantity",
            F.when(F.pmod(F.xxhash64("l_orderkey"), F.lit(256)) < 4,
                   F.col("l_quantity") + 1).otherwise(F.col("l_quantity")),
        )
        n_rows = li.count()
        t0 = time.perf_counter()
        rep = incr.incremental_clone(spark, mutated, scratch, "l_orderkey")
        sec = time.perf_counter() - t0
        out["resync_table_rows"] = n_rows
        out["resync_sec"] = round(sec, 4)
        out["resync_rows_per_sec"] = round(n_rows / sec) if sec > 0 else 0
        out["resync_chunks_changed"] = rep["changed"]
    finally:
        import shutil as _sh

        _sh.rmtree(scratch, ignore_errors=True)
    return out


def main(argv: list[str]) -> None:
    args = list(argv)
    skip_pipelines = "--skip-pipelines" in args
    args = [a for a in args if a != "--skip-pipelines"]
    sf1 = "/tmp/dcs_sf1_derived"
    if args and os.path.isdir(args[0]):
        sf1 = args.pop(0)
    keys = args or default_keys()
    registry = specs()
    keys = [k for k in keys if k in registry]
    spark = get_spark("dcs-sf1-scale")
    registry["q1_pricing_summary"].builder(spark, SF01).count()  # JVM warm

    per_key: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name in keys:
        b = registry[name].builder
        try:
            t_small = time_key(spark, b, SF01)
            t_big = time_key(spark, b, sf1)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            continue
        ratio = round(t_big / max(t_small, 1e-4), 2)
        per_key[name] = {"sf0.1": t_small, "sf1": t_big, "ratio": ratio}
        print(f"{name}: {t_small}s -> {t_big}s  ({ratio}x)", flush=True)

    pipelines = {}
    if not skip_pipelines:
        try:
            pipelines = {"sf1": clone_figures(spark, sf1),
                         "sf0.1": clone_figures(spark, SF01)}
        except Exception as exc:  # noqa: BLE001
            errors["__pipelines__"] = f"{type(exc).__name__}: {exc}"[:200]

    with open(DETAIL) as fh:
        detail = json.load(fh)
    # MERGE into an existing section (re-measuring individual keys after
    # a fix must not drop the rest of the run)
    prev = detail.get("sf1_derived", {})
    merged_keys = {**prev.get("per_key", {}), **per_key}
    over = sorted(k for k, v in merged_keys.items() if v["ratio"] > 12)
    section = {
        "sf1_dir": sf1,
        "builder": "scripts/build_sf1_derived.py",
        "criterion": "ratio <= ~12x (linear-ish) or documented",
        "per_key": merged_keys,
        "over_12x": over,
        "over_12x_annotations": {
            k: ANNOTATIONS[k] for k in over if k in ANNOTATIONS
        },
        "over_12x_unannotated": [k for k in over if k not in ANNOTATIONS],
        "pipelines": pipelines or prev.get("pipelines", {}),
        "errors": {**prev.get("errors", {}), **errors},
    }
    detail["sf1_derived"] = section
    with open(DETAIL, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({"sf1_derived_keys": len(per_key),
                      "over_12x": section["over_12x"],
                      "errors": list(errors)}))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
