"""Shared text-preparation column builders (pure JVM expressions)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(F.trim(text), r"\s+")


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles, order-sensitive. With a tiny vocabulary
    (the documents table has ~31 words) token SETS are degenerate —
    nearly all pairs share the full vocab — so near-dup detection must
    shingle. Built with sequence+slice: no UDF, stays in codegen."""
    toks = tokens(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def normalized(text: Column) -> Column:
    """Exact-dedup normalization: lowercase, trim, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
