"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Protocol (BASELINE.md): warm JVM (one untimed warm-up pass of the
flagship), then each query timed as a full plan build + execution with a
count-style sink (no driver materialization of result rows beyond the
aggregate — mirrors cluster behavior where results land in a sink).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from database_cloner_spark.registry import specs
from database_cloner_spark.session import get_spark

# Headline set: one representative per operator family, weighted toward
# the shapes that dominate at 100 TB (scan-agg, shuffle joins, windows).
HEADLINE = [
    "q1_pricing_summary",
    "q_agg_count_by_group",
    "q_agg_rollup",
    "q_agg_distinct",
    "q_sort",
    "q_topk",
    "q_filter_conj",
    "q_union_append",
    "q_except_diff",
    "q_scan_document",
    "q_join_multiway",
    "q_join_asof",
    "q_win_rownum_dedup",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_sim_topk",
    "q_corr_subquery",
    "q_sample_split",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("dcs-bench")

    registry = specs()
    names = [n for n in HEADLINE if n in registry]
    # Warm-up: JVM JIT + parquet footer cache (untimed).
    registry["q1_pricing_summary"].builder(spark, sf_dir).count()

    # ONE broken key must cost one `errors` entry, not the whole artifact:
    # r5's never-executed bloom commit crashed the sweep and zeroed
    # BENCH_r05.json (rc 1, parsed null) — the gating figure lost again.
    errors: dict[str, str] = {}
    timings: dict[str, float] = {}
    for name in names:
        builder = registry[name].builder
        best = float("inf")
        try:
            for _ in range(3):
                t0 = time.perf_counter()
                df = builder(spark, sf_dir)
                # Force full execution without driver-side row transfer.
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001 — record, keep benching
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            continue
        timings[name] = round(best, 4)

    # A broken headline key must POISON the gate figure, not shrink its
    # denominator: summing 17 of 18 keys reads as an improvement against
    # the 18-key baseline (review r6). null is unambiguous.
    headline_errs = [n for n in names if n in errors]
    total = None if headline_errs else round(sum(timings.values()), 4)

    # Secondary, NON-GATING figure (VERDICT r3 #8, widened r5): a timed
    # pass over EVERY registered key — oracled AND rows-only — so
    # regressions in non-headline operators (incl. the heavy ANN /
    # packing rows-only keys: simhash, PQ, IVF-PQ, bucketed-embedding,
    # langid, pack_bins) are visible round-over-round. Best-of-2: the
    # first execution of a heavy key is dominated by whole-stage-codegen
    # compile (measured 2-5x steady state — e.g. q_text_fingerprint 7s
    # cold vs 1.9s warm), a fixed cost that amortizes at scale and would
    # otherwise swamp the trend line. The headline metric (above,
    # best-of-3, frozen set) stays the gate. SPARK_GRAFT_SKIP_SWEEP=1
    # skips it.
    def sweep_all(d: str, skip: set[str], errs: dict[str, str]) -> dict[str, float]:
        out: dict[str, float] = {}
        for name, spec in registry.items():
            if name in skip or name in errs:
                continue
            best = float("inf")
            try:
                for _ in range(2):
                    t0 = time.perf_counter()
                    spec.builder(spark, d).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best = min(best, time.perf_counter() - t0)
            except Exception as exc:  # noqa: BLE001 — record, keep benching
                errs[name] = f"{type(exc).__name__}: {exc}"[:200]
                continue
            out[name] = round(best, 4)
        return out

    sweep: dict[str, float] = {}
    if not os.environ.get("SPARK_GRAFT_SKIP_SWEEP"):
        sweep = sweep_all(sf_dir, set(timings), errors)

    # Second-scale sweep (VERDICT r5 #7): the ROUND-tie and AQE-coalescing
    # pathologies were only ever caught by running the SAME plans at a
    # different sf — plan flips (broadcast<->SMJ, coalesce collapse) are
    # scale-dependent. Full sweep incl. the headline keys, single pass
    # economics via best-of-2; recorded per-sf in BENCH_DETAIL.json only
    # (non-gating).
    second_sf_dir = os.environ.get(
        "SPARK_GRAFT_SECOND_SF_DIR", "/root/testdata/sf0.01"
    )
    second_sweep: dict[str, float] = {}
    second_errors: dict[str, str] = {}
    if (
        not os.environ.get("SPARK_GRAFT_SKIP_SWEEP")
        and os.path.isdir(second_sf_dir)
        and os.path.realpath(second_sf_dir) != os.path.realpath(sf_dir)
    ):
        second_sweep = sweep_all(second_sf_dir, set(), second_errors)

    # Automated scale-flip detection over the two sweeps. With ~10x the
    # data a healthy key grows at most ~linearly (ratio <= ~10 plus
    # fixed overhead); flag the two pathology shapes:
    #  - superlinear: big-sf time >> data growth x small-sf time (an
    #    all-pairs/cartesian shape, or AQE collapsing a compute-heavy
    #    stage — the q_dedup_embedding_bucketed class);
    #  - inverted: SMALLER data measurably slower (a plan flip, e.g.
    #    broadcast->SMJ at one size only, or a size-triggered replan).
    # Thresholds are conservative (absolute floors above the ~0.3s
    # noise band) so the list is actionable, not noisy.
    scale_flags: dict[str, str] = {}
    primary = {**timings, **sweep}
    for name, t_small in second_sweep.items():
        t_big = primary.get(name)
        if t_big is None:
            continue
        if t_big > 1.0 and t_big > 12 * max(t_small, 0.05):
            scale_flags[name] = (
                f"superlinear: {t_small}s @sf-small -> {t_big}s @sf-primary"
            )
        elif t_small > t_big + 0.5 and t_small > 1.5 * t_big:
            scale_flags[name] = (
                f"inverted: {t_small}s @sf-small vs {t_big}s @sf-primary"
            )
    # headline keys contribute their (best-of-3) headline timing
    sweep_total = round(sum(sweep.values()) + sum(timings.values()), 4)
    sweep_n = len(sweep) + len(timings)

    # Clone-pipeline throughput (the BASELINE.md protocol's second
    # figure): clone the whole sf namespace to a scratch dir, report
    # rows/sec. Verification off here — it is timed separately by its
    # own tests; this measures the copy path the reference's
    # dump/restore corresponds to.
    import shutil
    import tempfile

    from database_cloner_spark.pipeline.clone import CloneConfig, ClonePipeline

    scratch = tempfile.mkdtemp(prefix="dcs_bench_clone_")
    clone_rows, clone_sec, clone_rps = 0, 0.0, 0
    try:
        t0 = time.perf_counter()
        run = ClonePipeline(
            spark,
            CloneConfig(
                source_dir=sf_dir,
                target_dir=scratch,
                verify_clone=False,
                overwrite=True,
                seed=42,
            ),
        ).run()
        clone_sec = time.perf_counter() - t0
        clone_rows = sum(r.rows for r in run.results)
        clone_rps = round(clone_rows / clone_sec) if clone_sec > 0 else 0
    except Exception as exc:  # noqa: BLE001 — gate line must still print
        errors["__clone_pipeline__"] = f"{type(exc).__name__}: {exc}"[:200]
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    # Full per-key detail (the ~131-key sweep map) goes to a FILE, not
    # stdout: the driver captures only the last 2000 chars of stdout and
    # parses the final JSON line, so the gate figure must ride on a
    # compact line (VERDICT r4 #1 — BENCH_r04.json lost the headline to
    # truncation when the sweep map shared the line).
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(
            {
                "sf": sf,
                "headline_queries": timings,
                "all_keys_queries": sweep,
                "all_keys_total_sec": sweep_total,
                "all_keys_n": sweep_n,
                "errors": errors,
                "second_sf": second_sf_dir.rstrip("/").split("sf")[-1],
                "second_sf_queries": second_sweep,
                "second_sf_total_sec": round(sum(second_sweep.values()), 4),
                "second_sf_errors": second_errors,
                "scale_flags": scale_flags,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
        fh.write("\n")

    # Compact gate line — LAST line on stdout. Headline timings only
    # (~18 keys, ~750 chars): well under the 2000-char tail; the 131-key
    # sweep map lives in BENCH_DETAIL.json.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "all_keys_total_sec": sweep_total,
                "all_keys_n": sweep_n,
                "clone_rows": clone_rows,
                "clone_sec": round(clone_sec, 4),
                "clone_rows_per_sec": clone_rps,
                "n_errors": len(errors),
                "n_scale_flags": len(scale_flags),
                "detail": "BENCH_DETAIL.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
