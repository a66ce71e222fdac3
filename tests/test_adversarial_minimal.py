"""Single-row-input totality + oracle parity, registry-wide.

The companion boundary to tests/test_adversarial_empty.py: every table
holds exactly ONE row (the first row of the sf0.001 fixture), so every
group the operators form has one member and every join side is at its
minimum. This is the classic degenerate-statistics boundary — sample
variance of one observation (Spark stddev_samp -> NaN, DuckDB -> NULL),
regressions/correlations over a single point, windows with one frame
row, medians of one value — plus the smallest non-empty case of every
two-sided join. Contract: no key crashes, and every oracled key still
hash-matches DuckDB.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from database_cloner_spark.registry import specs
from database_cloner_spark.sources.parquet import TABLES
from tests.oracle_harness import compare_query

_SRC = "/root/testdata/sf0.001"

_EXEMPT: dict[str, str] = {
    # (goal state: empty)
}


def write_fixture(d: str) -> None:
    for t in TABLES:
        src = os.path.join(_SRC, f"{t}.parquet")
        pq.write_table(
            pq.read_table(src).slice(0, 1), os.path.join(d, f"{t}.parquet")
        )


@pytest.fixture(scope="module")
def single_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("single_all"))
    write_fixture(d)
    return d


_KEYS = sorted(specs())


@pytest.mark.parametrize("name", _KEYS)
def test_single_row_totality_and_parity(spark, single_dir, name):
    if name in _EXEMPT:
        pytest.skip(_EXEMPT[name])
    spec = specs()[name]
    if spec.oracle is None or name == "q_scan_binary":
        # q_scan_binary: constant-glob read_blob oracle pinned to the
        # driver tree (see tests/test_adversarial_empty.py) — totality
        # only here; parity runs at the pinned tree in
        # tests/test_oracle_parity.py.
        spec.builder(spark, single_dir).count()
    else:
        compare_query(spark, name, spec.builder, spec.oracle, single_dir)
