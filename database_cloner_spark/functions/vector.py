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
            # np.stack needs a uniform shape: drop NULL and
            # probe-dim-mismatched vectors (unscorable — the HOF path
            # yields NULL cosine for them; here they simply don't
            # compete for the top-k). One ragged batch must not kill
            # the job (tests/test_adversarial_rows_only.py).
            valid = pdf[vec_col].map(
                lambda v: v is not None and len(v) == p.size
            )
            pdf = pdf[valid]
            if pdf.empty:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(m, axis=1)
            # zero-norm vectors are unscorable too — the HOF path's
            # try_divide cosine yields NULL for them (ranked last /
            # excluded from the top-k); scoring them 0.0 here would rank
            # them ABOVE negative-cosine neighbors and diverge from the
            # exact form.
            scorable = norms > 0
            pdf, m, norms = pdf[scorable], m[scorable], norms[scorable]
            if pdf.empty:
                continue
            cos = (m @ p_unit) / norms
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "cosine": np.round(cos, 4)})

    scored = embs.select("vec_id", vec_col).mapInPandas(
        score, schema="vec_id long, cosine double"
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
