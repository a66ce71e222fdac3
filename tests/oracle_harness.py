"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet
tables; asserts row-count, column-name, and order-insensitive value
equality. Stricter than the driver in one way: exact value comparison
(post-rounding), so any float/tz drift fails HERE first, not in
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb

from database_cloner_spark.sources.parquet import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def compare_query(spark, name: str, builder, oracle: str, sf_dir: str) -> None:
    sdf = builder(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duck_connect(sf_dir)
    res = con.execute(oracle)
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(o_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count spark={len(s_rows)} oracle={len(o_rows)}"
    )
    ns, no = _norm_rows(s_cols, s_rows), _norm_rows(o_cols, o_rows)
    if ns != no:
        diff_s = [r for r in ns if r not in no][:5]
        diff_o = [r for r in no if r not in ns][:5]
        raise AssertionError(
            f"{name}: value mismatch.\n only-spark: {diff_s}\n only-oracle: {diff_o}"
        )
