"""Seeded fuzz parity for the JSON-extraction fragments.

Random props strings — valid objects with k of every JSON type, signed
and whitespace-padded numeric strings, nested objects, arrays,
malformed fragments, empty strings, NULLs — must extract and
integer-cast IDENTICALLY through the engine expression
(get_json_object + try_cast) and the DuckDB mirror
(oracle_fragments.json_str / json_bigint). Generalizes the hand-built
rows in tests/test_adversarial_events.py.
"""

from __future__ import annotations

import json
import random

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from database_cloner_spark.queries.oracle_fragments import json_bigint, json_str

_K_VALUES = [
    7, -3, 0, 99999999999, 1.5, -0.25, "12", "+5", " 5 ", "5 ", "+ 5",
    "14.5", "abc", "", True, False, None, {"x": 1}, [1, 2], "你好", "1e3",
    "0x1f", "007", "-", "+",
]
_MALFORMED = ["not json", "", "{", '{"k":', "[1,", "null", "42", '"str"']


def _corpus(seed: int = 7, n: int = 250) -> list[str | None]:
    rng = random.Random(seed)
    out: list[str | None] = [None]
    for _ in range(n):
        roll = rng.random()
        if roll < 0.15:
            out.append(rng.choice(_MALFORMED))
        elif roll < 0.25:
            out.append("{}")
        elif roll < 0.35:
            out.append(json.dumps({"other": rng.randint(0, 9)}))
        else:
            out.append(json.dumps({"k": rng.choice(_K_VALUES)}))
    return out


def test_fuzz_json_extraction_parity(spark):
    strs = _corpus()
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strs)], "id long, props string"
    )
    got = {
        r.id: (r.ks, r.kb)
        for r in df.select(
            "id",
            F.get_json_object("props", "$.k").alias("ks"),
            F.get_json_object("props", "$.k").try_cast("bigint").alias("kb"),
        ).collect()
    }

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"id": range(len(strs)), "props": strs}))
    want = {
        row[0]: (row[1], row[2])
        for row in con.execute(
            f"SELECT id, {json_str('props', '$.k')} AS ks, "
            f"{json_bigint('props', '$.k')} AS kb FROM t"
        ).fetchall()
    }
    con.close()

    mismatches = {
        i: (strs[i], got[i], want[i]) for i in got if got[i] != want[i]
    }
    assert not mismatches, dict(list(mismatches.items())[:5])
