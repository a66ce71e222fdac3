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
    ledger: dict[str, dict] = {}
    if os.path.exists(LEDGER):
        with open(LEDGER) as f:
            ledger = json.load(f)
    for path in paths:
        rnd = os.path.basename(path)
        with open(path) as f:
            rows = json.load(f)
        for key, row in rows.items():
            if row.get("hash_match") is True:
                ledger[key] = {"status": "pass", "source": rnd}
            elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                # Rows-only by design (SURVEY.md marks these ✗-oracle).
                ledger[key] = {"status": "rows_only", "source": rnd}
            # FAIL rows and missing keys stay out: they must be re-checked.
    with open(LEDGER, "w") as f:
        json.dump(dict(sorted(ledger.items())), f, indent=1)
        f.write("\n")
    print(f"ledger: {len(ledger)} driver-green keys -> {LEDGER}")


if __name__ == "__main__":
    main(sys.argv[1:])
