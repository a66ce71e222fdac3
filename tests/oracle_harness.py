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


def _type_class(t: str) -> str:
    """Collapse a Spark dtype / DuckDB column_type to a comparison class:
    int-width-insensitive, but int-vs-decimal / int-vs-hugeint / int-vs-
    float SENSITIVE. The driver hashes *typed* values, so a DuckDB
    HUGEINT (e.g. SUM(integer)) against a Spark bigint is a real hash
    mismatch even when the digits agree — this classifier makes that
    class of bug fail locally first (VERDICT r2 #2/#3)."""
    t = t.strip().lower()
    if t.endswith("[]"):  # duckdb list
        return f"array<{_type_class(t[:-2])}>"
    if t.startswith("array<") and t.endswith(">"):
        return f"array<{_type_class(t[6:-1])}>"
    if t.startswith("decimal") or t.startswith("numeric"):
        return "decimal"
    if t in ("hugeint", "int128", "uhugeint"):
        return "hugeint"
    if t in ("tinyint", "smallint", "int", "integer", "bigint", "long",
             "int1", "int2", "int4", "int8", "utinyint", "usmallint",
             "uinteger", "ubigint"):
        return "int"
    if t in ("float", "double", "real", "float4", "float8"):
        return "float"
    if t in ("varchar", "string", "text", "char", "bpchar"):
        return "str"
    if t.startswith("timestamp"):
        return "timestamp"
    if t in ("boolean", "bool"):
        return "bool"
    if t == "date":
        return "date"
    if t.startswith("struct") or t.startswith("map"):
        return "nested"
    return t


def oracle_column_types(con, oracle: str) -> dict[str, str]:
    """Column name -> DuckDB type for an oracle query, via DESCRIBE
    (plans only, does not execute the query body)."""
    rows = con.execute(f"DESCRIBE {oracle}").fetchall()
    return {r[0]: r[1] for r in rows}


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:  # -0.0 == 0.0: Spark normalizes the zero sign in
            return "0.0"  # shuffled/sorted paths, DuckDB preserves it —
        return repr(v)  # numerically equal, so compare as one value
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
    o_types = oracle_column_types(con, oracle)  # DESCRIBE plans only
    con.close()

    assert sorted(s_cols) == sorted(o_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    # Type strictness (int-width-insensitive): the driver hashes typed
    # values, so a class mismatch (int vs hugeint/decimal/float) is a
    # guaranteed driver hash failure even when str(values) agree.
    s_types = dict(sdf.dtypes)
    # Driver-canonicalizer shape limit: the driver sorts results through
    # pandas before hashing, and a non-scalar column (array/struct/map)
    # raises `TypeError: unhashable type` there (r3's q_multimodal_frames
    # red row). Every ORACLED query must therefore emit scalars only —
    # explode/flatten before registering (rows-only ✗ keys are exempt;
    # they never reach this comparison).
    nested = {
        c: s_types[c]
        for c in s_cols
        if s_types[c].startswith(("array", "struct", "map"))
    }
    assert not nested, (
        f"{name}: oracled query emits non-scalar columns {nested} — the "
        "driver's hash canonicalizer cannot sort these; register an "
        "exploded/flattened form (e.g. posexplode + UNNEST oracle)."
    )
    bad = {
        c: (s_types[c], o_types[c])
        for c in s_cols
        if _type_class(s_types[c]) != _type_class(o_types[c])
    }
    assert not bad, (
        f"{name}: column TYPE class mismatch (spark, oracle): {bad} — "
        "cast the oracle (e.g. CAST(SUM(x) AS BIGINT)) or the Spark side."
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
