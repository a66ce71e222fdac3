"""Semantic properties of the corpus-stats tier (beyond oracle parity):
budget maximality, coverage monotonicity, rarity bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_cloner_spark.queries.corpus_stats import (
    RARE_MAX,
    TOKEN_BUDGET,
    VOCAB_TOP_K,
    q_sample_token_budget,
    q_text_rarity,
    q_text_vocab,
)
from database_cloner_spark.sources import load

SF = "/root/testdata/sf0.001"


def test_token_budget_is_respected_and_greedy_maximal(spark):
    sel = q_sample_token_budget(spark, SF)
    per_source = {
        r.source: r.total
        for r in sel.groupBy("source").agg(F.sum("n_tokens").alias("total")).collect()
    }
    assert per_source, "selection must be non-empty at sf0.001"
    assert all(t <= TOKEN_BUDGET for t in per_source.values())

    # Greedy maximality: for each source, the best-ranked EXCLUDED doc
    # would not have fit (otherwise the operator under-fills).
    docs = load(spark, SF, "documents")
    n_toks = F.size(F.split(F.trim(F.col("text")), " ")).cast("long")
    all_ranked = docs.select(
        "doc_id", "source", "n_chars", n_toks.alias("n_tokens")
    )
    picked = {r.doc_id for r in sel.select("doc_id").collect()}
    excluded = all_ranked.filter(~F.col("doc_id").isin(list(picked)))
    # the excluded doc with the highest quality proxy per source
    first_out = (
        excluded.orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .groupBy("source")
        .agg(F.first("n_tokens").alias("next_tokens"))
        .collect()
    )
    for r in first_out:
        if r.source in per_source:
            assert per_source[r.source] + r.next_tokens > TOKEN_BUDGET, (
                r.source,
                per_source[r.source],
                r.next_tokens,
            )


def test_vocab_coverage_monotone_and_consistent(spark):
    rows = q_text_vocab(spark, SF).orderBy(F.desc("n"), F.asc("term")).collect()
    assert 0 < len(rows) <= VOCAB_TOP_K
    cum = 0
    prev_cov = 0.0
    for r in rows:
        cum += r.n
        assert r.cum_n == cum
        assert 0.0 < r.coverage <= 1.0
        assert r.coverage >= prev_cov
        prev_cov = r.coverage
    # frequencies arrive sorted descending
    freqs = [r.n for r in rows]
    assert freqs == sorted(freqs, reverse=True)


def test_rarity_bounds_and_rare_definition(spark):
    rows = q_text_rarity(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_rare <= r.n_tokens
        assert 0.0 <= r.rare_frac <= 1.0
        # every token occurs at least once corpus-wide, so the mean
        # corpus count of a doc's tokens is >= 1
        assert r.mean_count >= 1.0
    # a token counted "rare" must be possible only when RARE_MAX > 1
    assert RARE_MAX > 1
