"""Sequence packing: lay documents end-to-end into fixed-size training
contexts (the concat-and-chunk step every pre-training pipeline runs
between curation and tokenized-shard writing).

Semantics: documents are ordered by a deterministic multiplicative hash
(a reproducible stand-in for the epoch shuffle), token counts are
cumulatively summed, and each doc is assigned the context chunk its
first token lands in: pack = floor(start / ctx_len), offset = start %
ctx_len, where start = cumsum - n_tokens.

100 TB story: a single global running sum would serialize the corpus
through one ordering — instead the corpus is hash-sharded into
`n_shards` independent packing streams (window partitioned BY shard),
so every shard packs in parallel and pack ids are namespaced by shard.
This mirrors real tokenizer-shard layouts (one output file per shard);
shard count scales with the cluster, and the per-shard window is the
only ordered structure. The hash is the same overflow-safe Knuth
multiplicative scheme as the sampling tier (doc_id * 2654435761 mod
2^32 stays far below int64 overflow for any realistic id space).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

KNUTH = 2654435761
HASH_MOD = 4294967296  # 2^32
PACK_NS = 1_000_000  # pack-id namespace stride per shard


def pack_sequences(
    docs: DataFrame,
    ctx_len: int = 512,
    n_shards: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Assign every doc its (pack_id, offset) in the packed token
    stream: shard-parallel greedy concatenation, deterministic under
    retries (hash order, no monotonically_increasing_id)."""
    h = F.pmod(F.col("doc_id") * F.lit(KNUTH), F.lit(HASH_MOD))
    n_toks = F.size(F.split(F.trim(F.col(text_col)), " ")).cast("long")
    base = docs.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        h.alias("__h"),
        F.pmod(h, F.lit(n_shards)).alias("shard"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("__h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("__start")
    return (
        base.select("doc_id", "n_tokens", "shard", start)
        .select(
            "doc_id",
            "n_tokens",
            "shard",
            (
                F.col("shard") * PACK_NS
                + F.floor(F.col("__start") / ctx_len)
            ).alias("pack_id"),
            F.pmod(F.col("__start"), F.lit(ctx_len)).alias("offset"),
        )
    )
