"""Generate BENCH_BANDS.json from one or more quiet-box bench detail
artifacts (VERDICT r11 item 2).

A band is the [min, max] of a key's recorded figures across the input
runs; bench.py re-measures (isolated best-of-3) any figure exceeding
3x the band ceiling before shipping an artifact, so box noise can no
longer masquerade as regression. Regenerate per round from the FINAL
quiet-box runs (the BASELINE.md protocol: no concurrent pytest), then
commit the file alongside BENCH_DETAIL.json.

Usage: python scripts/gen_bench_bands.py DETAIL.json [DETAIL.json ...]
       (inputs are bench.py detail artifacts; keys are pooled from
        headline_queries + all_keys_queries; the sf label must agree
        across inputs and is recorded in _meta so bench.py can refuse
        to band a mismatched sweep)
"""

from __future__ import annotations

import json
import os
import sys

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_BANDS.json",
)


def main(paths: list[str]) -> None:
    if not paths:
        raise SystemExit("usage: gen_bench_bands.py DETAIL.json [...]")
    pooled: dict[str, list[float]] = {}
    sfs = set()
    runs = []
    for p in paths:
        with open(p) as fh:
            d = json.load(fh)
        sfs.add(d.get("sf"))
        runs.append(d.get("run", {}).get("seq"))
        for src in ("headline_queries", "all_keys_queries"):
            for k, v in (d.get(src) or {}).items():
                pooled.setdefault(k, []).append(float(v))
    if len(sfs) != 1:
        raise SystemExit(f"inputs span multiple sf labels: {sorted(sfs)}")
    bands = {
        k: {"lo": round(min(v), 4), "hi": round(max(v), 4), "n": len(v)}
        for k, v in sorted(pooled.items())
    }
    bands["_meta"] = {
        "sf": sfs.pop(),
        "n_inputs": len(paths),
        "runs": runs,
    }
    with open(OUT, "w") as fh:
        json.dump(bands, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"bands: {len(bands) - 1} keys from {len(paths)} runs -> {OUT}")


if __name__ == "__main__":
    main(sys.argv[1:])
