"""Vector math over `array<float>` embedding columns.

Two implementations of the same semantics:

- JVM higher-order-function expressions (dot/norm/cosine): zero
  Python, exact DuckDB-oracle parity (deterministic left-to-right
  summation). Measured note: for PRIMITIVE double arrays the
  zip_with+aggregate fold is efficient — unrolling to dim explicit
  element_at terms was tried and ran 2x SLOWER (per-call null/bounds
  checks beat the fold's tight loop). The interpreter pathology that
  hurt MinHash applies to nested lambdas over strings, not to
  primitive-array folds.
- Arrow-batched pandas scoring (cosine_topk_pandas): the throughput
  path. Each Arrow batch becomes one numpy matrix-vector product
  (BLAS), ~dim-independent per-row overhead. Float summation order
  differs from the HOF form, so results are rounded at the edge and
  verified against the exact form with tolerance, not hashed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two float-array columns (JVM, deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    """L2 norm of a float-array column."""
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two float-array columns.

    try_divide, not `/`: under ANSI mode (Spark 4 default) a plain
    division THROWS on a zero denominator, so ONE all-zero or empty
    vector in a 100 TB corpus would kill the whole scoring job
    (tests/test_adversarial_embeddings.py). try_divide yields NULL —
    which is also exactly DuckDB's `x / 0.0` semantics, so oracles
    need no special-casing. NULL cosines sort last under the engine's
    standard `desc(cosine)` ranking on both engines."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def cosine_topk_pandas(
    embs: DataFrame, probe: list[float], k: int = 10, vec_col: str = "embedding"
) -> DataFrame:
    """Top-k cosine vs a driver-side probe vector, scored in numpy via
    mapInPandas (one BLAS matvec per Arrow batch), ranked by
    TakeOrderedAndProject. The probe travels as a closure constant —
    at 100 TB this is the batch-scoring fast path; for many probes at
    once, stack them into a matrix and this becomes a tall-skinny GEMM
    per batch."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    p = np.asarray(probe, dtype=np.float64)
    p_unit = p / np.linalg.norm(p)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # Unscorable vectors (NULL, probe-dim mismatch, zero norm)
            # get a NULL cosine — the SAME rows the exact HOF path
            # produces via try_divide. Dropping them instead would make
            # the two paths return different row counts whenever fewer
            # than k scorable vectors exist (ADVICE r4): NULL-cosine
            # rows still fill the LIMIT k, ranked last by
            # desc-nulls-last + vec_id. np.stack needs a uniform shape,
            # so scorables are scored as a sub-matrix and scattered
            # back; one ragged batch must not kill the job
            # (tests/test_adversarial_rows_only.py).
            vecs = pdf[vec_col].to_numpy()
            cos = np.full(len(pdf), np.nan)
            idx = [
                i
                for i, v in enumerate(vecs)
                if v is not None and len(v) == p.size
            ]
            if idx:
                m = np.stack([np.asarray(vecs[i]) for i in idx]).astype(
                    np.float64
                )
                norms = np.linalg.norm(m, axis=1)
                sub = np.full(len(idx), np.nan)
                scorable = norms > 0
                sub[scorable] = (m[scorable] @ p_unit) / norms[scorable]
                cos[idx] = sub
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    # nullable Float64: NaN -> <NA> -> Arrow null. A raw
                    # float64 NaN would arrive as Spark NaN, which sorts
                    # ABOVE every number in desc order — the opposite of
                    # the exact path's NULL-last ranking.
                    "cosine": pd.array(np.round(cos, 4), dtype="Float64"),
                }
            )

    scored = embs.select("vec_id", vec_col).mapInPandas(
        score, schema="vec_id long, cosine double"
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
