"""q_graph_pagerank correctness pins (no SQL oracle — iterative).

The decimal fixed-point iteration (_pagerank_ranks) is checked on
hand-analyzable graphs where the answer is exact, plus structural
invariants on the registered key's real input.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from database_cloner_spark.queries.joins import _pagerank_ranks, q_graph_pagerank

SF = "/root/testdata/sf0.001"


def _sym_edges(spark, pairs):
    e = spark.createDataFrame(pairs, "src string, dst string")
    return e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_cycle_is_exact_fixed_point(spark):
    """On a 2-regular cycle every vertex sends 2 * (1/2) = 1: rank
    stays EXACTLY 1 through every iteration — 1/2 is exact in decimal,
    so this pins the fixed-point arithmetic with zero tolerance."""
    cyc = _sym_edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    rows = _pagerank_ranks(cyc, iters=5).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["deg"] == 2
        assert r["rank"] == Decimal("1")


def test_star_center_dominates_and_leaves_tie(spark):
    """K1,4: the center outranks the leaves, all four leaves get the
    bit-identical rank (isomorphic vertices), and total rank mass stays
    n (teleport in = damped mass out; conservation is exact up to the
    per-division decimal rounding, bounded by iters * n ulps)."""
    star = _sym_edges(spark, [("hub", f"leaf{i}") for i in range(4)])
    rows = {r["src"]: r for r in _pagerank_ranks(star, iters=5).collect()}
    leaves = [rows[f"leaf{i}"]["rank"] for i in range(4)]
    assert len(set(leaves)) == 1
    assert rows["hub"]["rank"] > leaves[0]
    total = sum(r["rank"] for r in rows.values())
    assert abs(total - Decimal(5)) < Decimal("1e-12")


def test_registered_key_shape_and_determinism(spark):
    a = q_graph_pagerank(spark, SF).collect()
    b = q_graph_pagerank(spark, SF).collect()
    assert a == b
    assert 0 < len(a) <= 20
    assert [c for c in a[0].asDict()] == ["vertex", "pagerank", "degree"]
    # sorted by (pagerank desc, vertex asc), ranks positive, real spread
    ranks = [r["pagerank"] for r in a]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r > 0 for r in ranks)
    assert ranks[0] > ranks[-1]  # bipartite graph discriminates
    assert all(r["vertex"][:2] in ("c:", "s:") for r in a)
