"""Driver-mirror correctness gate: every registered query with an oracle
must match DuckDB exactly at sf0.001 (fast smoke; the driver re-runs the
same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from database_cloner_spark.registry import specs
from tests.oracle_harness import compare_query

_SPECS = specs()
_WITH_ORACLE = sorted(k for k, s in _SPECS.items() if s.oracle is not None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    spec = _SPECS[name]
    if name == "q_scan_binary":
        # Its oracle read_blob()s a CONSTANT glob (DuckDB table-function
        # limitation) pinned to the driver's correctness tree — compare
        # there, exactly as the driver will.
        from tests.conftest import SF_CORRECTNESS

        sf_dir = SF_CORRECTNESS
    compare_query(spark, name, spec.builder, spec.oracle, sf_dir)


def test_type_strict_harness_rejects_hugeint(spark, sf_dir):
    """The harness must fail a value-identical but HUGEINT-typed oracle
    (DuckDB SUM(integer) promotes to int128; the driver hashes typed
    values, so this WOULD be a driver hash failure — VERDICT r2 #2)."""
    from database_cloner_spark.sources import load

    def builder(s, d):
        from pyspark.sql import functions as F

        return load(s, d, "events").agg(F.count("*").cast("bigint").alias("n"))

    # SUM(1) types as HUGEINT in DuckDB even though the digits match COUNT(*).
    bad_oracle = "SELECT SUM(1) AS n FROM events"
    with pytest.raises(AssertionError, match="TYPE class mismatch"):
        compare_query(spark, "hugeint_probe", builder, bad_oracle, sf_dir)


def test_no_registered_oracle_types_hugeint_or_decimal(sf_dir):
    """Registry-wide guard: no oracle may emit HUGEINT or DECIMAL (the
    typed-value hash bombs — DuckDB promotes SUM(int) to int128 and
    fixed-point arithmetic to DECIMAL, neither of which Spark emits) —
    plans every oracle via DESCRIBE, no execution."""
    from tests.oracle_harness import duck_connect, oracle_column_types, _type_class

    con = duck_connect(sf_dir)
    offenders = {}
    try:
        for name in _WITH_ORACLE:
            types = oracle_column_types(con, _SPECS[name].oracle)
            bad = {
                c: t
                for c, t in types.items()
                if _type_class(t) in ("hugeint", "decimal")
            }
            if bad:
                offenders[name] = bad
    finally:
        con.close()
    assert not offenders, offenders


def test_scalar_shape_harness_rejects_array_output(spark, sf_dir):
    """The harness must fail an oracled query whose output has a
    non-scalar column: the driver's canonicalizer sorts through pandas
    and raises `unhashable type: list` on arrays (r3's one red row,
    q_multimodal_frames). Register exploded forms instead."""
    from database_cloner_spark.sources import load

    def builder(s, d):
        from pyspark.sql import functions as F

        return load(s, d, "region").select(
            "r_regionkey", F.array(F.lit(1), F.lit(2)).alias("xs")
        )

    bad_oracle = "SELECT r_regionkey, [1, 2] AS xs FROM region"
    with pytest.raises(AssertionError, match="non-scalar"):
        compare_query(spark, "array_probe", builder, bad_oracle, sf_dir)


def test_no_registered_oracle_query_emits_nested_columns(spark, sf_dir):
    """Registry-wide guard (plans only, no execution): every ORACLED
    query's Spark output schema must be all-scalar, mirroring the
    driver canonicalizer's limits. Rows-only ✗ keys may emit any shape."""
    offenders = {}
    for name in _WITH_ORACLE:
        dtypes = dict(_SPECS[name].builder(spark, sf_dir).dtypes)
        bad = {
            c: t
            for c, t in dtypes.items()
            if t.startswith(("array", "struct", "map"))
        }
        if bad:
            offenders[name] = bad
    assert not offenders, offenders


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(e.oracle_sql()).issubset(set(e.queries()))


@pytest.mark.parametrize(
    "terms",
    [("scan", "window", "batch"), ("join", "filter", "stream", "sort")],
)
def test_bm25_second_term_sets(spark, sf_dir, terms):
    """r7 verdict #8: the registered BM25 key fixes one 3-term query, so
    term-selection luck could mask a scoring/tie-break break. Both the
    builder and the oracle are generated from the term tuple — sweep two
    other term sets (including a 4-term one) through the same parity
    gate."""
    from database_cloner_spark.queries.analytics_ext import (
        _bm25_build,
        _bm25_oracle,
    )

    compare_query(
        spark,
        f"q_text_bm25[{','.join(terms)}]",
        lambda s, d: _bm25_build(s, d, terms),
        _bm25_oracle(terms),
        sf_dir,
    )


@pytest.mark.parametrize("group_col", ["o_orderstatus", "o_orderkey"])
def test_regression_second_group_keys(spark, sf_dir, group_col):
    """r7 verdict #8: sweep the per-group OLS over a second grouping —
    o_orderstatus (different cardinality/skew than the registered
    o_orderpriority) and o_orderkey (every group hits the n=1 /
    zero-variance filter: the output must be EMPTY identically on both
    engines, exercising the denominator guard)."""
    from database_cloner_spark.queries.analytics_ext import (
        _regression_build,
        _regression_oracle,
    )

    compare_query(
        spark,
        f"q_stats_regression[{group_col}]",
        lambda s, d: _regression_build(s, d, group_col),
        _regression_oracle(group_col),
        sf_dir,
    )
