"""Property-based tests (hypothesis) for the string-op family —
SURVEY.md §5.2 item 4: strip∘concat ≡ identity, masking never leaks,
template fill is total.

Each property generates a BATCH of examples and round-trips them through
Spark as ONE DataFrame (per-example sessions would be pathologically
slow), mirroring how the expressions run in production: columnar, many
rows per task.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

# identifiers the reference manipulates are DB/user names: printable,
# no whitespace/control chars
_ident = st.text(
    alphabet=st.characters(whitelist_categories=("L", "N"), max_codepoint=0x2FF),
    min_size=1,
    max_size=30,
)
_password = st.text(
    alphabet="ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789",
    min_size=6,
    max_size=24,
)

_SETTINGS = dict(max_examples=8, deadline=None)

PREFIX = "clone_"


@settings(**_SETTINGS)
@given(st.lists(_ident, min_size=1, max_size=25))
def test_strip_prefix_of_concat_is_identity(names):
    spark = _spark()
    df = spark.createDataFrame([(n,) for n in names], "name string")
    out = df.select(
        "name",
        F.regexp_replace(
            F.concat(F.lit(PREFIX), F.col("name")), f"^{PREFIX}", ""
        ).alias("round_trip"),
    ).collect()
    for r in out:
        assert r.round_trip == r.name


@settings(**_SETTINGS)
@given(st.lists(st.tuples(_ident, _password), min_size=1, max_size=25))
def test_mask_never_leaks_password(pairs):
    spark = _spark()
    df = spark.createDataFrame(pairs, "user string, pw string")
    uri = F.concat(
        F.lit("postgresql://"), "user", F.lit(":"), "pw", F.lit("@pg-lb:5432/db")
    )
    out = df.select(
        "pw",
        F.regexp_replace(uri, "://[^:]*:[^@]*@", "://****:****@").alias("masked"),
    ).collect()
    for r in out:
        assert r.pw not in r.masked
        assert "****:****@" in r.masked


@settings(**_SETTINGS)
@given(st.lists(st.tuples(_ident, _password, _ident), min_size=1, max_size=25))
def test_template_fill_is_total(rows):
    spark = _spark()
    df = spark.createDataFrame(rows, "u string, p string, h string")
    template = F.lit("postgresql://<<USERNAME>>:<<PASSWORD>>@<<HOST>>:5432/db")
    filled = F.replace(
        F.replace(
            F.replace(template, F.lit("<<USERNAME>>"), F.col("u")),
            F.lit("<<PASSWORD>>"),
            F.col("p"),
        ),
        F.lit("<<HOST>>"),
        F.col("h"),
    )
    out = df.select(filled.alias("conn")).collect()
    for r in out:
        assert "<<" not in r.conn and ">>" not in r.conn


def _spark():
    from database_cloner_spark.session import get_spark

    return get_spark("props")


# --- emb_quality grid exactness (SURVEY §5.2 posture, vector family) --------
# The emb_quality tier's oracle story rests on one claim: quantize to
# the integer grid, fold squares in LONG, and the result is EXACT — for
# any float32 input, including magnitudes past the clamp, subnormals,
# and mixtures with NaN/Inf/NULL elements (those gate the vector to
# unscorable). Pin the claim against a pure-Python integer model.

_f32 = st.one_of(
    st.floats(width=32, allow_nan=False, allow_infinity=False),
    st.floats(min_value=-16.0, max_value=16.0, width=32),
)


def _py_quant(x: float) -> int:
    import math

    return int(math.floor(min(max(x * 1048576.0 + 0.5, -8388608.0), 8388608.0)))


@settings(**_SETTINGS)
@given(st.lists(st.lists(_f32, min_size=1, max_size=16), min_size=1, max_size=20))
def test_quantized_normsq_matches_integer_model(spark, vecs):
    from database_cloner_spark.queries.emb_quality import _bad_vec, _qe

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: r["normsq"]
        for r in df.select(
            "vec_id",
            F.when(
                ~_bad_vec(),
                F.aggregate(
                    _qe(),
                    F.lit(0).cast("long"),
                    lambda acc, q: acc + (q * q).cast("long"),
                ),
            ).alias("normsq"),
        ).collect()
    }
    import struct as _s

    for i, v in rows:
        # the engine sees float32 values; round-trip the python floats
        # through float32 before modeling
        v32 = [_s.unpack("f", _s.pack("f", x))[0] for x in v]
        expect = sum(_py_quant(x) ** 2 for x in v32)
        assert got[i] == expect, (i, v32, got[i], expect)
