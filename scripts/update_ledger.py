"""Merge driver CORRECTNESS_r*.json results into the driver-green ledger.

The correctness driver verifies only the first N (observed: 50) keys of
``__spark_entry__.queries()`` per round. The ledger records every key that
has EVER received a green driver row, so the registry can order
never-verified keys first and rotate full coverage across rounds
(VERDICT.md round 1, "Next round" item 2).

Usage: python scripts/update_ledger.py CORRECTNESS_r01.json [more...]
"""

from __future__ import annotations

import json
import os
import sys

LEDGER = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "database_cloner_spark",
    "driver_ledger.json",
)


def main(paths: list[str]) -> None:
    # The ledger on disk is a plain sorted LIST of green key names —
    # registry._driver_green() does set(json.load(f)). (An earlier dict
    # format also round-trips: set(dict) is its keys.)
    ledger: set[str] = set()
    if os.path.exists(LEDGER):
        with open(LEDGER) as f:
            ledger = set(json.load(f))
    for path in paths:
        with open(path) as f:
            rows = json.load(f)
        for key, row in rows.items():
            if row.get("hash_match") is True:
                ledger.add(key)
            elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                # Rows-only by design (SURVEY.md marks these ✗-oracle).
                ledger.add(key)
            # FAIL rows and missing keys stay out: they must be re-checked.
    with open(LEDGER, "w") as f:
        json.dump(sorted(ledger), f, indent=0)
        f.write("\n")
    print(f"ledger: {len(ledger)} driver-green keys -> {LEDGER}")


if __name__ == "__main__":
    main(sys.argv[1:])
