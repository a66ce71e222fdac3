"""Simulate the driver's correctness harness: run every declared query
at sf0.01 (or argv[1]) against its DuckDB oracle and report per-query
match/mismatch. Usage: python scripts/driver_sim.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e  # noqa: E402
from database_cloner_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import compare_query  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("driver-sim")

    rows = e.entry(spark).collect()
    print(f"entry: {len(rows)} rows")

    qs, osql = e.queries(), e.oracle_sql()
    names = sorted(n for n in osql if not only or n in only)
    failures = []
    for name in names:
        try:
            compare_query(spark, name, qs[name], osql[name], sf_dir)
            print(f"OK       {name}")
        except AssertionError as ex:
            failures.append(name)
            print(f"MISMATCH {name}: {ex}")
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            print(f"ERROR    {name}: {type(ex).__name__}: {ex}")
    rows_only = sorted(set(qs) - set(osql))
    for name in rows_only:
        try:
            n = qs[name](spark, sf_dir).count()
            print(f"ROWS     {name}: {n}")
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            print(f"ERROR    {name}: {type(ex).__name__}: {ex}")
    print(f"\n{len(names) + len(rows_only) - len(failures)}/{len(names) + len(rows_only)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
