"""Dump `.explain("formatted")` output for registered query keys.

Usage: python scripts/dump_plan.py OUT_DIR[/suffix] key [key...]

Writes OUT_DIR/<key><suffix>.txt for each key, where a trailing
"/_before" or "/_after" path component on OUT_DIR becomes the file
suffix (e.g. `plans/r14/_before q_graph_pagerank` writes
plans/r14/q_graph_pagerank_before.txt). Pure plan generation — no
query execution beyond what planning itself requires.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_cloner_spark.registry import all_queries  # noqa: E402
from database_cloner_spark.session import get_spark  # noqa: E402


def main() -> None:
    out = sys.argv[1]
    suffix = ""
    base = os.path.basename(out)
    if base.startswith("_"):
        suffix = base
        out = os.path.dirname(out)
    keys = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("dump-plan", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    os.makedirs(out, exist_ok=True)
    reg = all_queries()
    for key in keys:
        df = reg[key](spark, sf_dir)
        txt = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out, f"{key}{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(path)


if __name__ == "__main__":
    main()
