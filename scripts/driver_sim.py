"""Simulate the driver's correctness harness: run every declared query
at sf0.01 (or argv[1]) against its DuckDB oracle and report per-query
match/mismatch. Usage: python scripts/driver_sim.py [sf_dir] [name ...]

Builds a PLAIN SparkSession (no engine confs) on purpose: the real
driver does the same, so any query that silently depends on a
`session.get_spark`-only config fails here first (VERDICT.md r1 "What's
wrong" §1 — the nanosAsLong crash slipped through because the old sim
used the factory session). Pass --factory to use the engine factory.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e  # noqa: E402
from tests.oracle_harness import compare_query  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--factory"]
    use_factory = "--factory" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if use_factory:
        from database_cloner_spark.session import get_spark

        spark = get_spark("driver-sim")
    else:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("driver-sim")
            .config("spark.sql.shuffle.partitions", "8")
            .getOrCreate()
        )

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
