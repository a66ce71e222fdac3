"""q_graph_pagerank correctness pins.

The scaled-bigint fixed-point iteration (_pagerank_ranks, 1 rank unit =
_PR_SCALE = 10^12) is checked on hand-analyzable graphs where the
answer is exact, plus structural invariants on the registered key's
real input. The full DuckDB hash oracle (5 unrolled CTE iterations in
the same integer arithmetic) is exercised by the registry-wide parity
suite; these tests stay as the property layer the oracle can't express
(fixed points, isomorphism ties, mass conservation).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from database_cloner_spark.queries.joins import (
    _PR_SCALE,
    _pagerank_ranks,
    q_graph_pagerank,
)

SF = "/root/testdata/sf0.001"


def _sym_edges(spark, pairs):
    e = spark.createDataFrame(pairs, "src string, dst string")
    return e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_cycle_is_exact_fixed_point(spark):
    """On a 2-regular cycle every vertex sends 2 * (1/2) = 1: rank
    stays EXACTLY one unit through every iteration — _PR_SCALE is even,
    so rank div 2 is exact and this pins the fixed-point arithmetic
    with zero tolerance."""
    cyc = _sym_edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    rows = _pagerank_ranks(cyc, iters=5).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["deg"] == 2
        assert r["rank"] == _PR_SCALE


def test_star_center_dominates_and_leaves_tie(spark):
    """K1,4: the center outranks the leaves, all four leaves get the
    bit-identical rank (isomorphic vertices), and total rank mass stays
    5 units (teleport in = damped mass out; conservation is exact up to
    the per-vertex floor rounding, bounded by iters * |V| scaled ulps)."""
    star = _sym_edges(spark, [("hub", f"leaf{i}") for i in range(4)])
    rows = {r["src"]: r for r in _pagerank_ranks(star, iters=5).collect()}
    leaves = [rows[f"leaf{i}"]["rank"] for i in range(4)]
    assert len(set(leaves)) == 1
    assert rows["hub"]["rank"] > leaves[0]
    total = sum(r["rank"] for r in rows.values())
    assert abs(total - 5 * _PR_SCALE) <= 5 * 5  # iters * |V| floor ulps


def test_registered_key_shape_and_determinism(spark):
    a = q_graph_pagerank(spark, SF).collect()
    b = q_graph_pagerank(spark, SF).collect()
    assert a == b
    assert 0 < len(a) <= 20
    assert [c for c in a[0].asDict()] == ["vertex", "pagerank_fp", "degree"]
    # sorted by (pagerank_fp desc, vertex asc), ranks positive, real spread
    ranks = [r["pagerank_fp"] for r in a]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r > 0 for r in ranks)
    assert ranks[0] > ranks[-1]  # bipartite graph discriminates
    assert all(r["vertex"][:2] in ("c:", "s:") for r in a)
