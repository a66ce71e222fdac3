"""Corpus-statistics operators for the training-data tier.

Three first-class curation primitives every large-scale pre-training
pipeline runs between raw ingestion and shard writing, each fully
DuckDB-oracle-able (the reference has no analogue — these extend the
§2.11 LLM tier, same registration contract):

- q_sample_token_budget — greedy per-source selection under a token
  budget (data-mixing step: "take the best N tokens of each source").
- q_text_vocab — vocabulary frequency table with cumulative coverage
  (tokenizer-planning / Zipf-audit step).
- q_text_rarity — per-document unigram-frequency quality signal (the
  rational-arithmetic twin of a CCNet-style LM perplexity filter).

Float discipline follows q_text_tfidf: rational expressions and exact
integer sums everywhere; division only at the rounded output edge, on
exactly-summed integers, so both engines divide identical operands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from database_cloner_spark.llm.textprep import n_tokens, tokens
from database_cloner_spark.queries.oracle_fragments import (
    n_tokens_sql,
    tokens_sql,
)
from database_cloner_spark.registry import register
from database_cloner_spark.sources import load

# -- greedy token-budget sampling ------------------------------------------

TOKEN_BUDGET = 5_000  # per-source token budget

_ORACLE_TOKEN_BUDGET = f"""
WITH scored AS (
  SELECT doc_id, source, n_chars,
         {n_tokens_sql()} AS n_tokens
  FROM documents
),
runs AS (
  SELECT doc_id, source, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS tokens_before
  FROM scored
)
SELECT doc_id, source, n_tokens, tokens_before
FROM runs
WHERE tokens_before + n_tokens <= {TOKEN_BUDGET}
"""


@register("q_sample_token_budget", oracle=_ORACLE_TOKEN_BUDGET, tier="X")
def q_sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy per-source selection under a TOKEN_BUDGET: docs ranked by
    a quality proxy (n_chars DESC — swap in any score column), running
    token sum per source, keep while the budget holds. The mixing step
    that turns per-source weights into an actual document subset.

    Scale shape: ONE exchange on `source` and a running-sum window —
    identical to sequence packing (llm/packing.py); no global ordering,
    each source packs its budget independently. Sources far bigger than
    the budget stop contributing rows early, but the window still scans
    them — at 100 TB pre-filter with an approximate per-source quantile
    cutoff to bound the sorted span if a source dwarfs its budget."""
    docs = load(spark, sf_dir, "documents")
    n_toks = n_tokens(F.col("text"))
    base = docs.select(
        "doc_id", "source", F.col("n_chars"), n_toks.alias("n_tokens")
    )
    w = (
        W.partitionBy("source")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    before = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("tokens_before")
    return (
        base.select("doc_id", "source", "n_tokens", before)
        .filter(F.col("tokens_before") + F.col("n_tokens") <= TOKEN_BUDGET)
    )


# -- vocabulary coverage ----------------------------------------------------

VOCAB_TOP_K = 100

_ORACLE_VOCAB = f"""
WITH terms AS (
  SELECT UNNEST({tokens_sql('lower(text)')}) AS term FROM documents
),
counts AS (
  SELECT term, COUNT(*) AS n FROM terms WHERE term <> '' GROUP BY term
),
total AS (SELECT CAST(SUM(n) AS BIGINT) AS total_tokens FROM counts),
top AS (
  SELECT term, n FROM counts ORDER BY n DESC, term LIMIT {VOCAB_TOP_K}
),
cum AS (
  SELECT term, n,
         CAST(SUM(n) OVER (ORDER BY n DESC, term ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_n
  FROM top
)
SELECT term, n, cum_n,
       -- integer-exact round-half-up (ROUND-tie portability class)
       ((2000000*cum_n + total_tokens) // (2*total_tokens)) / 1000000.0
         AS coverage
FROM cum CROSS JOIN total
"""


@register("q_text_vocab", oracle=_ORACLE_VOCAB, tier="X")
def q_text_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K vocabulary with cumulative corpus coverage — the Zipf
    audit behind tokenizer-vocab sizing ("how many types cover 95% of
    tokens?").

    Scale shape: term counts partial-aggregate map-side; the global
    ordering exists ONLY on the K-row result of a TakeOrderedAndProject
    (per-partition heaps), so the single-partition cumulative window
    runs over K rows, never the vocabulary. The corpus total is a
    1-row broadcast (audited BNLJ, same as q_text_tfidf's n_docs)."""
    docs = load(spark, sf_dir, "documents").select("text")
    terms = docs.select(
        F.explode(tokens(F.lower("text"))).alias("term")
    ).filter(F.col("term") != "")
    counts = terms.groupBy("term").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("total_tokens"))
    top = counts.orderBy(F.desc("n"), F.asc("term")).limit(VOCAB_TOP_K)
    w = (
        W.orderBy(F.desc("n"), F.asc("term"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    from database_cloner_spark.llm.text import roundn_ratio

    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("cum_n", F.sum("n").over(w))
        .select(
            "term",
            "n",
            "cum_n",
            roundn_ratio(F.col("cum_n"), F.col("total_tokens"), 6).alias(
                "coverage"
            ),
        )
    )


# -- unigram-frequency rarity signal ---------------------------------------

RARE_MAX = 3  # corpus count below which a token is "rare"

_ORACLE_RARITY = f"""
WITH terms AS (
  SELECT doc_id, UNNEST({tokens_sql('lower(text)')}) AS term
  FROM documents
),
toks AS (SELECT doc_id, term FROM terms WHERE term <> ''),
counts AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term),
joined AS (
  SELECT t.doc_id, c.cnt FROM toks t JOIN counts c USING (term)
),
agg AS (
  SELECT doc_id,
         COUNT(*)::BIGINT AS n_tokens,
         CAST(SUM(CASE WHEN cnt < {RARE_MAX} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_rare,
         CAST(SUM(cnt) AS BIGINT) AS sum_cnt
  FROM joined GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_rare,
       -- integer-exact round-half-up (ROUND-tie portability class)
       ((20000*n_rare + n_tokens) // (2*n_tokens)) / 10000.0 AS rare_frac,
       ((20000*sum_cnt + n_tokens) // (2*n_tokens)) / 10000.0 AS mean_count
FROM agg
"""


@register("q_text_rarity", oracle=_ORACLE_RARITY, tier="X")
def q_text_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram-frequency signal: rare-token fraction and
    mean corpus count of the doc's tokens — the rational-arithmetic
    stand-in for a perplexity/LM quality filter (docs full of
    never-seen-elsewhere tokens are OCR noise or boilerplate-mangled;
    docs of only ultra-common tokens carry no information).

    Scale shape: one (term) aggregation for the corpus counts, joined
    back onto the exploded tokens — the count table is
    vocabulary-sized, the natural broadcast side at any corpus scale —
    then one per-doc aggregation. Integer sums only; division happens
    once per output row on exactly-summed operands, so engine float
    ordering cannot differ."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.explode(tokens(F.lower("text"))).alias("term")
    ).filter(F.col("term") != "")
    counts = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    from database_cloner_spark.llm.text import round4_ratio

    joined = toks.join(counts, "term")
    is_rare = F.when(F.col("cnt") < RARE_MAX, 1).otherwise(0)
    agg = joined.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(is_rare).alias("n_rare"),
        F.sum("cnt").alias("__sum_cnt"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_rare",
        round4_ratio(F.col("n_rare"), F.col("n_tokens")).alias("rare_frac"),
        round4_ratio(F.col("__sum_cnt"), F.col("n_tokens")).alias("mean_count"),
    )
