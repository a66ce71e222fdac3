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
import re
import sys
import time


def sf_label(path: str) -> str:
    """Human label for a fixture dir: the trailing sfN token when present
    (".../sf0.1" -> "0.1"), else the raw basename — a user-pointed dir
    like /data/transfer/small must not parse to garbage (ADVICE r6)."""
    base = os.path.basename(path.rstrip("/"))
    m = re.search(r"sf([\d.]+)$", base)
    return m.group(1) if m else base


def dir_bytes(path: str) -> int:
    """Total on-disk bytes under a fixture dir (orients the scale-flip
    comparison: 'which sweep is the bigger dataset' must come from the
    data, not from which env var it arrived in — ADVICE r6)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from database_cloner_spark.registry import specs
from database_cloner_spark.session import get_spark

# Sections BENCH_DETAIL.json owns (rewritten every bench run); anything
# else in the file was merged by an external script (sf1_scale_run,
# streaming_throughput, ...) and is carried forward verbatim.
_OWN_SECTIONS = frozenset(
    {
        "run",
        "sf",
        "headline_queries",
        "all_keys_queries",
        "all_keys_total_sec",
        "all_keys_n",
        "errors",
        "second_sf",
        "second_sf_queries",
        "second_sf_total_sec",
        "second_sf_errors",
        "scale_flags",
        "scale_flags_note",
        "incremental_resync",
        "cdc_apply",
        "scale_modes",
        "out_of_band_remeasured",
        "bands_file",
    }
)

def load_prev_detail(detail_path: str) -> tuple[int, dict]:
    """Parse the previous BENCH_DETAIL.json for carry-forward.

    Returns (prev_seq, foreign_sections). Any unreadable, non-JSON, or
    non-object file (a corrupt/partial write can leave a top-level array
    or string — r12 ADVICE) is treated as absent: (0, {}).
    """
    try:
        with open(detail_path) as fh:
            prev = json.load(fh)
        if not isinstance(prev, dict):
            return 0, {}
        run = prev.get("run", {})
        seq = int(run.get("seq", 0)) if isinstance(run, dict) else 0
        return seq, {k: v for k, v in prev.items() if k not in _OWN_SECTIONS}
    except (OSError, ValueError, TypeError, AttributeError):
        return 0, {}


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
    sf = sf_label(sf_dir)
    spark = get_spark("dcs-bench")

    registry = specs()
    names = [n for n in HEADLINE if n in registry]
    # Warm-up: JVM JIT + parquet footer cache (untimed).
    registry["q1_pricing_summary"].builder(spark, sf_dir).count()

    # ONE broken key must cost one `errors` entry, not the whole artifact:
    # r5's never-executed bloom commit crashed the sweep and zeroed
    # BENCH_r05.json (rc 1, parsed null) — the gating figure lost again.
    #
    # Multi-PASS series (VERDICT r9 #8): the shared box swings ±25%
    # run-to-run, and round 9's quiet-band adjudication lived in
    # BASELINE.md prose (three hand-run artifacts, min taken by eye).
    # The harness now runs the whole headline block N times (default 3;
    # SPARK_GRAFT_HEADLINE_PASSES overrides) and records `series` = each
    # pass's total (per-query best-of-3 within the pass), so the quiet
    # band is machine-readable in the artifact itself. The gating
    # `value`/`queries` stay what they always were — per-query minima —
    # now taken across all passes.
    errors: dict[str, str] = {}
    timings: dict[str, float] = {}
    series: list[float] = []
    n_passes = int(os.environ.get("SPARK_GRAFT_HEADLINE_PASSES", "3"))
    for _pass in range(max(1, n_passes)):
        pass_timings: dict[str, float] = {}
        for name in names:
            if name in errors:
                continue
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
            pass_timings[name] = best
            prev = timings.get(name, float("inf"))
            timings[name] = round(min(prev, best), 4)
        if len(pass_timings) == len(names):
            series.append(round(sum(pass_timings.values()), 4))

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

    # Band-aware adjudication (VERDICT r11 item 2): run 37 shipped
    # q_sim_topk_multi at 36.8s against a 0.35-0.95s recorded band —
    # box noise masquerading as a 40x regression. Every key whose figure
    # exceeds 3x its recorded quiet-band ceiling (BENCH_BANDS.json,
    # regenerated per round from quiet-box runs via
    # scripts/gen_bench_bands.py) is re-measured best-of-3 in a FRESH
    # isolated process (scripts/isolated_bench.py — own JVM, per-key
    # warm pass) before the artifact is written; the reported figure is
    # the min of both, and the adjudication is recorded either way.
    bands: dict[str, dict] = {}
    bands_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_BANDS.json"
    )
    try:
        with open(bands_path) as fh:
            raw_bands = json.load(fh)
        if raw_bands.get("_meta", {}).get("sf") == sf:
            bands = {k: v for k, v in raw_bands.items() if k != "_meta"}
    except (OSError, ValueError):
        pass

    out_of_band: dict[str, dict] = {}
    if bands and not os.environ.get("SPARK_GRAFT_SKIP_BAND_CHECK"):
        def _over(t: float, hi: float) -> bool:
            return t > 1.0 and t > 3.0 * hi

        flagged = sorted(
            name
            for src in (timings, sweep)
            for name, t in src.items()
            if name in bands and _over(t, bands[name]["hi"])
        )
        if flagged:
            import subprocess

            iso: dict[str, dict] = {}
            try:
                proc = subprocess.run(
                    [
                        sys.executable,
                        os.path.join(
                            os.path.dirname(os.path.abspath(__file__)),
                            "scripts",
                            "isolated_bench.py",
                        ),
                        sf_dir,
                        *flagged,
                    ],
                    capture_output=True,
                    text=True,
                    timeout=600 + 120 * len(flagged),
                    env={**os.environ, "SPARK_GRAFT_ISOLATED_PASSES": "3"},
                )
                iso = json.loads(
                    proc.stdout.strip().splitlines()[-1]
                ).get("isolated", {})
            except Exception as exc:  # noqa: BLE001 — keep sweep figures
                errors["__band_remeasure__"] = (
                    f"{type(exc).__name__}: {exc}"[:200]
                )
            for name in flagged:
                src = timings if name in timings else sweep
                entry = {
                    "sweep": src[name],
                    "band_hi": bands[name]["hi"],
                }
                if name in iso:
                    entry["isolated"] = iso[name]["best"]
                    src[name] = round(min(src[name], iso[name]["best"]), 4)
                    entry["still_over"] = _over(
                        src[name], bands[name]["hi"]
                    )
                out_of_band[name] = entry
            # the gate figure must carry the adjudicated minima
            total = (
                None if headline_errs else round(sum(timings.values()), 4)
            )

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
    # Orient by DATASET SIZE, not by which env var a dir arrived in: with
    # SPARK_GRAFT_SF_DIR=sf0.001 and the default second dir sf0.01 the
    # primary sweep is the SMALL one, and a label scheme keyed on
    # primary/second would silently invert superlinear<->inverted
    # (ADVICE r6). When the two dirs are within 2x of each other there is
    # no scale signal to adjudicate — skip with a logged note.
    scale_flags: dict[str, str] = {}
    scale_flags_note = None
    primary = {**timings, **sweep}
    if second_sweep:
        primary_bytes = dir_bytes(sf_dir)
        second_bytes = dir_bytes(second_sf_dir)
        if max(primary_bytes, second_bytes) < 2 * max(
            1, min(primary_bytes, second_bytes)
        ):
            scale_flags_note = (
                f"skipped: dirs within 2x on disk ({primary_bytes} vs "
                f"{second_bytes} bytes) — no scale signal"
            )
            # all four bound so no later edit outside the (empty) flag
            # loop can hit a NameError (ADVICE r7)
            big_sweep, small_sweep = {}, {}
            big_lbl, small_lbl = sf, sf_label(second_sf_dir)
        elif primary_bytes >= second_bytes:
            big_sweep, small_sweep = primary, second_sweep
            big_lbl, small_lbl = sf, sf_label(second_sf_dir)
        else:
            big_sweep, small_sweep = second_sweep, primary
            big_lbl, small_lbl = sf_label(second_sf_dir), sf
        for name, t_big in big_sweep.items():
            t_small = small_sweep.get(name)
            if t_small is None:
                continue
            if t_big > 1.0 and t_big > 12 * max(t_small, 0.05):
                scale_flags[name] = (
                    f"superlinear: {t_small}s @sf{small_lbl} -> "
                    f"{t_big}s @sf{big_lbl}"
                )
            elif t_small > t_big + 0.5 and t_small > 1.5 * t_big:
                scale_flags[name] = (
                    f"inverted: {t_small}s @sf{small_lbl} vs "
                    f"{t_big}s @sf{big_lbl}"
                )
        # Retest-before-alarming (r10): a flag must SURVIVE a fresh
        # best-of-2 re-measurement of both sides. The sweeps run each
        # key once cold per sf, so a box hiccup during one key's two
        # runs fabricates an "inverted" flag (observed: q_sample_split
        # 0.82s@sf0.01 in-sweep vs 0.28-0.37s warm — no inversion); a
        # real plan flip reproduces, noise doesn't.
        def _best2(name: str, d: str) -> float:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                registry[name].builder(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            return best

        big_dir, small_dir = (
            (sf_dir, second_sf_dir)
            if dir_bytes(sf_dir) >= dir_bytes(second_sf_dir)
            else (second_sf_dir, sf_dir)
        )
        for name in list(scale_flags):
            try:
                t_big = round(_best2(name, big_dir), 4)
                t_small = round(_best2(name, small_dir), 4)
            except Exception:  # noqa: BLE001 — keep the original flag
                continue
            superlinear = t_big > 1.0 and t_big > 12 * max(t_small, 0.05)
            inverted = t_small > t_big + 0.5 and t_small > 1.5 * t_big
            if not (superlinear or inverted):
                del scale_flags[name]
            else:
                scale_flags[name] += (
                    f" (retest: {t_small}s small / {t_big}s big)"
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

    # Best-of-2 (VERDICT r6 #6): a single timed pass swung 102k-181k
    # rows/s (1.8x) between quiet runs because one pass is dominated by
    # job-submission latency + first-write codegen; the second pass is
    # the steady-state figure a long-running cluster clone would see.
    clone_rows, clone_sec, clone_rps = 0, float("inf"), 0
    for _ in range(2):
        scratch = tempfile.mkdtemp(prefix="dcs_bench_clone_")
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
            sec = time.perf_counter() - t0
            if sec < clone_sec:
                clone_sec = sec
                clone_rows = sum(r.rows for r in run.results)
        except Exception as exc:  # noqa: BLE001 — gate line must still print
            errors["__clone_pipeline__"] = f"{type(exc).__name__}: {exc}"[:200]
            break
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
    if clone_sec == float("inf"):
        clone_sec = 0.0
    clone_rps = round(clone_rows / clone_sec) if clone_sec > 0 else 0

    # Incremental re-sync + streaming-CDC apply throughput (VERDICT r10
    # item 6): the reference's only refresh is a cron'd full re-clone;
    # these two figures put the engine's changed-chunk alternatives next
    # to the full-clone rows/s so the comparison is measured, not prose.
    # Non-gating; errors recorded like any other key.
    from pyspark.sql import functions as F  # noqa: N812

    from database_cloner_spark.sources.parquet import load as _load

    resync = {}
    try:
        from database_cloner_spark.pipeline import incremental as incr

        li = _load(spark, sf_dir, "lineitem")
        scratch = tempfile.mkdtemp(prefix="dcs_bench_incr_")
        try:
            incr.incremental_clone(spark, li, scratch, "l_orderkey")  # seed
            # deterministic ~1.5% drift confined to 4 of 256 chunks
            mutated = li.withColumn(
                "l_quantity",
                F.when(
                    F.pmod(F.xxhash64("l_orderkey"), F.lit(256)) < 4,
                    F.col("l_quantity") + 1,
                ).otherwise(F.col("l_quantity")),
            )
            n_rows = li.count()
            t0 = time.perf_counter()
            rep = incr.incremental_clone(spark, mutated, scratch, "l_orderkey")
            sec = time.perf_counter() - t0
            resync = {
                "resync_table_rows": n_rows,
                "resync_sec": round(sec, 4),
                "resync_rows_per_sec": round(n_rows / sec) if sec > 0 else 0,
                "resync_chunks_changed": rep["changed"],
                "resync_rows_rewritten": rep["rows_rewritten"],
            }
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
    except Exception as exc:  # noqa: BLE001
        errors["__incremental_resync__"] = f"{type(exc).__name__}: {exc}"[:200]

    cdc = {}
    try:
        from database_cloner_spark.streaming.cdc import apply_cdc_batch

        orders = _load(spark, sf_dir, "orders")
        scratch = tempfile.mkdtemp(prefix="dcs_bench_cdc_")
        try:
            seed = orders.withColumn("op", F.lit("upsert")).withColumn(
                "seq", F.lit(1).cast("bigint")
            )
            tgt = os.path.join(scratch, "t")
            apply_cdc_batch(seed, tgt, "o_orderkey")  # seed batch, untimed
            h = F.pmod(F.xxhash64("o_orderkey"), F.lit(100))
            ups = (
                orders.filter(h == 0)
                .withColumn("o_totalprice", F.col("o_totalprice") + 1)
                .withColumn("op", F.lit("upsert"))
                .withColumn("seq", F.lit(2).cast("bigint"))
            )
            dels = (
                orders.filter(h == 1)
                .withColumn("op", F.lit("delete"))
                .withColumn("seq", F.lit(2).cast("bigint"))
            )
            batch = ups.unionByName(dels)
            n_changes = batch.count()
            t0 = time.perf_counter()
            rep = apply_cdc_batch(batch, tgt, "o_orderkey")
            sec = time.perf_counter() - t0
            cdc = {
                "cdc_batch_changes": n_changes,
                "cdc_batch_sec": round(sec, 4),
                "cdc_changes_per_sec": round(n_changes / sec)
                if sec > 0
                else 0,
                "cdc_chunks_touched": len(rep["touched"]),
            }
            # Second point (VERDICT r11 item 5): the small batch above is
            # micro-batch-latency-bound (fixed job-submission + commit
            # cost dominates ~3k changes), so changes/s at ONE size says
            # nothing about the scaling term. This batch is ~10x the
            # changes but key-filtered to chunk-hash < 16, so it touches
            # only 16 of 64 chunks — cost ∝ chunks touched, measured.
            chunk_h = F.pmod(F.xxhash64("o_orderkey"), F.lit(64))
            big = (
                orders.filter(chunk_h < 16)
                .withColumn("o_totalprice", F.col("o_totalprice") + 2)
                .withColumn("op", F.lit("upsert"))
                .withColumn("seq", F.lit(3).cast("bigint"))
            )
            n_big = big.count()
            t0 = time.perf_counter()
            rep_big = apply_cdc_batch(big, tgt, "o_orderkey")
            sec_big = time.perf_counter() - t0
            cdc["cdc_large_batch_changes"] = n_big
            cdc["cdc_large_batch_sec"] = round(sec_big, 4)
            cdc["cdc_large_changes_per_sec"] = (
                round(n_big / sec_big) if sec_big > 0 else 0
            )
            cdc["cdc_large_chunks_touched"] = len(rep_big["touched"])
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
    except Exception as exc:  # noqa: BLE001
        errors["__cdc_apply__"] = f"{type(exc).__name__}: {exc}"[:200]

    # 100 TB scale-mode figures (VERDICT r10 item 7): the two flags that
    # swap an exact plan for its scale form now carry measured timings
    # next to the exact keys' sweep entries, not just plan-shape tests.
    scale_modes: dict[str, float] = {}
    for label, fn in (
        (
            "q_dq_profile_approx",
            lambda: registry["q_dq_profile"].builder(
                spark, sf_dir, approx_distinct=True
            ),
        ),
        (
            "q_events_rfm_approx",
            lambda: registry["q_events_rfm"].builder(
                spark, sf_dir, approx_cutpoints=True
            ),
        ),
    ):
        try:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            scale_modes[label] = round(best, 4)
        except Exception as exc:  # noqa: BLE001
            errors[f"__{label}__"] = f"{type(exc).__name__}: {exc}"[:200]

    # Full per-key detail (the ~131-key sweep map) goes to a FILE, not
    # stdout: the driver captures only the last 2000 chars of stdout and
    # parses the final JSON line, so the gate figure must ride on a
    # compact line (VERDICT r4 #1 — BENCH_r04.json lost the headline to
    # truncation when the sweep map shared the line).
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    # Run provenance (VERDICT r6 #3): three same-day sweeps were
    # indistinguishable in-file and the judge had to use git mtimes to
    # attribute figures. A monotonic per-file counter (seeded from the
    # previous detail file — no wall clock) + the config snapshot makes
    # every artifact self-identifying; the same "run" stamp rides the
    # gate line so BENCH_r{N}.json matches its exact detail file.
    # Foreign sections (sf1_derived, streaming_throughput, ...) are
    # merged into the detail file by their own scripts; a bench rewrite
    # must carry them forward, not drop them (an sf0.001 smoke run once
    # silently clobbered the round's sf1 scale-up section).
    prev_seq, foreign = load_prev_detail(detail_path)
    run_stamp = {
        "seq": prev_seq + 1,
        "sf_dir": sf_dir,
        "second_sf_dir": second_sf_dir,
        "skip_sweep": bool(os.environ.get("SPARK_GRAFT_SKIP_SWEEP")),
        "n_keys": len(registry),
        "n_headline": len(names),
    }
    with open(detail_path, "w") as fh:
        json.dump(
            {
                **foreign,
                "run": run_stamp,
                "sf": sf,
                "headline_queries": timings,
                "all_keys_queries": sweep,
                "all_keys_total_sec": sweep_total,
                "all_keys_n": sweep_n,
                "errors": errors,
                "second_sf": sf_label(second_sf_dir),
                "second_sf_queries": second_sweep,
                "second_sf_total_sec": round(sum(second_sweep.values()), 4),
                "second_sf_errors": second_errors,
                "scale_flags": scale_flags,
                "scale_flags_note": scale_flags_note,
                "incremental_resync": resync,
                "cdc_apply": cdc,
                "scale_modes": scale_modes,
                "out_of_band_remeasured": out_of_band,
                "bands_file": bool(bands),
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
                "series": series,
                "sf": sf,
                "all_keys_total_sec": sweep_total,
                "all_keys_n": sweep_n,
                "clone_rows": clone_rows,
                "clone_sec": round(clone_sec, 4),
                "clone_rows_per_sec": clone_rps,
                "resync_rows_per_sec": resync.get("resync_rows_per_sec"),
                "cdc_changes_per_sec": cdc.get("cdc_changes_per_sec"),
                "cdc_large_changes_per_sec": cdc.get(
                    "cdc_large_changes_per_sec"
                ),
                "n_errors": len(errors),
                "n_scale_flags": len(scale_flags),
                # band adjudication summary (VERDICT r11 item 2): every
                # re-measured key, with its still-over verdict — a
                # reader of BENCH_r{N}.json alone sees which figures
                # were box noise vs genuine
                "out_of_band": {
                    k: {
                        "sweep": v["sweep"],
                        "isolated": v.get("isolated"),
                        "genuine": v.get("still_over", True),
                    }
                    for k, v in out_of_band.items()
                },
                "run": run_stamp["seq"],
                "detail": "BENCH_DETAIL.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
