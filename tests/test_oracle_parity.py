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
    compare_query(spark, name, spec.builder, spec.oracle, sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(e.oracle_sql()).issubset(set(e.queries()))
