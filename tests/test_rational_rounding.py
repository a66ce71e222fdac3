"""Property tests for the rational-rounding machinery
(queries/analytics_ext._rr_dec / _rr_sql) — the round-8 core that every
statistics key (OLS, t-test, autocorr, corr-matrix, chi2's cells) rides.

Ground truth is exact fractions.Fraction arithmetic in Python:
round-half-away-from-zero(num/den, d) represented as
ip + fq/10^d with ip = |num| // den and fq = round-half-up of the
remainder fraction, then converted to the nearest double the same way
the engines do (int64 -> double cast + one IEEE add). The properties:

1. Spark (_rr_dec) == DuckDB (_rr_sql) bit-for-bit on the same inputs
   (the parity property every oracle depends on);
2. both equal the Fraction-derived reference double;
3. magnitudes straddle every hazard found this round: > 2^53 (the
   DuckDB HUGEINT double-rounding region), > 2^64 (hi/lo split), and
   integer parts near int64 (the Spark silent-wrap region is guarded
   by raise_error, tested separately).
"""

from __future__ import annotations

from fractions import Fraction

import duckdb
import pytest
from hypothesis import given, settings, strategies as st


def _ref(num: int, den: int, digits: int) -> float:
    """Exact-integer reference for the branched split rational rounding
    (mirrors _rr_dec/_rr_sql: big dens take the single-word path whose
    quotient provably fits int64; small dens take the two-word
    ip = hi*10^18 + lo path, added in the engines' fixed order —
    Python floats are the same IEEE doubles)."""
    scale = 10 ** digits
    mag = abs(num)
    if den >= 2 * 10 ** 19:
        ip = mag // den
        rem = mag % den
        fq = (2 * scale * rem + den) // (2 * den)
        comp = float(ip) + float(fq) / float(scale)
    else:
        den18 = den * 10 ** 18
        hi = mag // den18
        rem_hi = mag % den18
        lo = rem_hi // den
        rem = rem_hi % den
        fq = (2 * scale * rem + den) // (2 * den)
        comp = float(hi) * 1.0e18 + float(lo) + float(fq) / float(scale)
    if num < 0 and comp != 0:
        return -comp
    return comp


# numerators spanning the hazard regions; denominators positive
_NUMS = st.integers(min_value=-(10**25), max_value=10**25)
_DENS = st.integers(min_value=1, max_value=10**22)
_DIGITS = st.sampled_from([4, 6, 8, 12])


@settings(max_examples=300, deadline=None)
@given(num=_NUMS, den=_DENS, digits=_DIGITS)
def test_rr_sql_matches_fraction_reference(num, den, digits):
    """DuckDB's _rr_sql == the Fraction reference on every input —
    including >2^53 and >2^64 operands where a raw HUGEINT->DOUBLE cast
    would double-round (SCALE.md pitfall 8). Skips inputs whose integer
    part exceeds int64 (both engines fail loudly there by design)."""
    from database_cloner_spark.queries.analytics_ext import _rr_sql

    if den < 2 * 10**19 and abs(num) // (den * 10**18) > 2**63 - 1:
        return  # loud-failure domain, covered by the wrap-guard tests
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {_rr_sql(f'CAST({num} AS HUGEINT)', f'CAST({den} AS HUGEINT)', digits)}"
    ).fetchone()[0]
    con.close()
    want = _ref(num, den, digits)
    assert got == want and str(got) == str(want), (num, den, digits, got, want)


def test_rr_dec_matches_fraction_reference_on_hazard_grid(spark):
    """Spark's _rr_dec == the Fraction reference on a deterministic grid
    straddling 2^53 / 2^64 / negative / tie cases (one Spark job for the
    whole grid — hypothesis-per-example Spark jobs would be minutes)."""
    from pyspark.sql import functions as F

    from database_cloner_spark.queries.analytics_ext import _DEC, _rr_dec

    cases = []
    for num in (
        0, 1, -1, 7, -7, 12345678, -12345678,
        2**53 + 1, -(2**53 + 1), 2**64 + 3, -(2**64 + 3),
        21154864837852735588, -21154864837852735588,  # r7 miscast value
        24416857545013081875, 10**24 + 7, -(10**24 + 7),
        5, -5, 15, -15,  # half-way ties at den=10, d=0-ish
    ):
        for den in (1, 2, 3, 7, 10, 997, 10**6 + 3, 10**12,
                    2 * 10**19 - 1, 2 * 10**19, 10**21 + 7):
            for digits in (4, 8, 12):
                if den < 2 * 10**19 and abs(num) // (den * 10**18) > 2**63 - 1:
                    continue
                cases.append((str(num), str(den), digits))
    rows = [(n, d, g) for (n, d, g) in cases]
    df = spark.createDataFrame(rows, "num string, den string, digits int")
    out = {}
    for digits in (4, 8, 12):
        sub = df.filter(F.col("digits") == digits).select(
            "num",
            "den",
            _rr_dec(
                F.col("num").cast(_DEC), F.col("den").cast(_DEC), digits
            ).alias("got"),
        )
        for r in sub.collect():
            out[(r["num"], r["den"], digits)] = r["got"]
    bad = []
    for n_s, d_s, digits in cases:
        want = _ref(int(n_s), int(d_s), digits)
        got = out[(n_s, d_s, digits)]
        if got != want or str(got) != str(want):
            bad.append((n_s, d_s, digits, got, want))
    assert not bad, bad[:5]


def test_rr_dec_wrap_guard_raises_loudly(spark):
    """A ratio past the two-word domain (~9.2e36) must raise the
    _rr_dec guard error — never return a silently-wrapped value
    (SCALE.md pitfall 9). Ratios up to ~9.2e36 are handled by the
    hi/lo split (test grids above cover >int64 integer parts)."""
    from pyspark.sql import functions as F

    from database_cloner_spark.queries.analytics_ext import _DEC, _rr_dec

    df = spark.createDataFrame(
        [("1" + "0" * 37, "1")], "num string, den string"
    )
    with pytest.raises(Exception, match="wraps silently|overflow|Overflow|exceeds"):
        df.select(
            _rr_dec(F.col("num").cast(_DEC), F.col("den").cast(_DEC), 8)
        ).collect()


def test_rr_sql_bigint_cast_raises_loudly_past_int64():
    """DuckDB mirror of the wrap guard: the BIGINT cast of the hi word
    errors loudly instead of wrapping."""
    from database_cloner_spark.queries.analytics_ext import _rr_sql

    con = duckdb.connect()
    with pytest.raises(Exception):
        con.execute(
            "SELECT "
            + _rr_sql(
                "CAST(" + "1" + "0" * 37 + " AS HUGEINT)",
                "CAST(1 AS HUGEINT)",
                8,
            )
        ).fetchone()
    con.close()
