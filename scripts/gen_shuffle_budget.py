"""Regenerate the SCALE.md shuffle-budget inventory table.

Builds every registered key's physical plan at sf0.001 (explain only, no
execution) and prints the markdown table that belongs under SCALE.md's
"## Shuffle-budget inventory" heading. Run after adding or reshaping a
key, paste the new/changed rows into SCALE.md, and let
tests/test_shuffle_budget.py enforce them:

    python scripts/gen_shuffle_budget.py [--key q_foo ...]

Budgets are UPPER BOUNDS on Exchange operators visible in the sf0.001
plan: a refactor may lower a count freely (tighten the row when you
notice), but a plan that grows past its budgeted shuffle count fails
the lockstep test and must either be fixed or have its row consciously
raised in the same commit — the "document one shuffle, plan three"
failure mode this table exists to kill.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_cloner_spark.registry import all_queries  # noqa: E402
from database_cloner_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"


def main(argv: list[str]) -> None:
    only = {a for a in argv if not a.startswith("-")}
    spark = get_spark("shuffle-budget-gen", cpus="8")
    rows = []
    for name, fn in sorted(all_queries().items()):
        if only and name not in only:
            continue
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        rows.append(
            (
                name,
                plan.count("Exchange hashpartitioning"),
                plan.count("Exchange rangepartitioning"),
                plan.count("Exchange SinglePartition"),
            )
        )
    print("| key | hash | range | single |")
    print("|---|---|---|---|")
    for name, h, r, s in rows:
        print(f"| `{name}` | {h} | {r} | {s} |")


if __name__ == "__main__":
    main(sys.argv[1:])
