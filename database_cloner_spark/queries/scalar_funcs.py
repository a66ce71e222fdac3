"""§2.8 Scalar functions — string / date / math / json / struct / map / array.

The reference's scalar surface is bash string manipulation: identifier
construction (clone_databases.sh:222,:304-305,:116), prefix strip (:300),
URL-encoding substitutions (:112-113), template fill (:908), trim (:1030),
CSV/record splitting (:1025,:574), credential masking (:119,:157),
identifier quoting (:416,:427,:438), three timestamp formats (:28,:68,:205),
integer arithmetic (:643), and JSON result parsing (:758,:935).

Everything here is a codegen'd JVM column expression — zero Python in the
row path, so these run at memory bandwidth inside WholeStageCodegen at any
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_cloner_spark.queries.oracle_fragments import json_bigint, json_str
from database_cloner_spark.registry import register
from database_cloner_spark.sources import load


_ORACLE_CONCAT = """
SELECT
  n_name                                            AS source_db,
  'clone_' || n_name                                AS target_db,
  'clone_' || n_name || '_owner'                    AS owner_user,
  'postgresql://' || 'clone_' || n_name || '_owner' || '@pg-lb:5432/' || 'clone_' || n_name AS conn_uri
FROM nation
"""


@register("q_str_concat", oracle=_ORACLE_CONCAT, tier="C")
def q_str_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identifier construction: target="${DB_PREFIX}${source}", owner/app
    usernames, connection URIs (clone_databases.sh:222,:304-305,:116)."""
    nat = load(spark, sf_dir, "nation")
    target = F.concat(F.lit("clone_"), F.col("n_name"))
    owner = F.concat(target, F.lit("_owner"))
    uri = F.concat(F.lit("postgresql://"), owner, F.lit("@pg-lb:5432/"), target)
    return nat.select(
        F.col("n_name").alias("source_db"),
        target.alias("target_db"),
        owner.alias("owner_user"),
        uri.alias("conn_uri"),
    )


_ORACLE_STRIP_PREFIX = """
SELECT c_name AS target_db,
       regexp_replace(c_name, '^Customer#', '') AS source_db
FROM customer
"""


@register("q_str_strip_prefix", oracle=_ORACLE_STRIP_PREFIX, tier="C")
def q_str_strip_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix removal: ${target_db#$DB_PREFIX} (clone_databases.sh:300)."""
    return load(spark, sf_dir, "customer").select(
        F.col("c_name").alias("target_db"),
        F.regexp_replace("c_name", "^Customer#", "").alias("source_db"),
    )


_ORACLE_REPLACE = """
WITH uri AS (
  SELECT s_name || ':p@ss:w0rd@mongo-host:27017' AS raw FROM supplier
)
SELECT raw,
       replace(replace(raw, '@', '%40'), ':', '%3A') AS encoded
FROM uri
"""


@register("q_str_replace", oracle=_ORACLE_REPLACE, tier="C")
def q_str_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-encoding substitution: @ -> %40, : -> %3A
    (clone_databases.sh:112-113)."""
    sup = load(spark, sf_dir, "supplier")
    raw = F.concat(F.col("s_name"), F.lit(":p@ss:w0rd@mongo-host:27017"))
    return sup.select(
        raw.alias("raw"),
        F.replace(F.replace(raw, F.lit("@"), F.lit("%40")), F.lit(":"), F.lit("%3A")).alias(
            "encoded"
        ),
    )


_ORACLE_TRIM = """
SELECT trim('   ' || c_name || '  ') AS item FROM customer
"""


@register("q_str_trim", oracle=_ORACLE_TRIM, tier="C")
def q_str_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Work-list whitespace trim (`xargs`, clone_databases.sh:1030)."""
    cust = load(spark, sf_dir, "customer")
    padded = F.concat(F.lit("   "), F.col("c_name"), F.lit("  "))
    return cust.select(F.trim(padded).alias("item"))


_ORACLE_SPLIT_EXPLODE = """
SELECT doc_id, unnest(string_split(text, ' ')) AS token
FROM documents
WHERE doc_id < 20
"""


@register("q_str_split_explode", oracle=_ORACLE_SPLIT_EXPLODE, tier="C")
def q_str_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split a delimited list into rows (DATABASES_TO_CLONE,
    clone_databases.sh:1025). Explode is a narrow op — no shuffle."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )


_ORACLE_MASK = """
WITH uri AS (
  SELECT 'mongodb://' || s_name || ':s3cret' || CAST(s_suppkey AS VARCHAR)
         || '@mongo-host:27017/admin' AS raw
  FROM supplier
)
SELECT regexp_replace(raw, '://[^:]*:[^@]*@', '://****:****@') AS masked FROM uri
"""


@register("q_str_mask", oracle=_ORACLE_MASK, tier="C")
def q_str_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Credential masking for log output (clone_databases.sh:119,:157):
    the password must never appear in the masked form."""
    sup = load(spark, sf_dir, "supplier")
    raw = F.concat(
        F.lit("mongodb://"),
        F.col("s_name"),
        F.lit(":s3cret"),
        F.col("s_suppkey").cast("string"),
        F.lit("@mongo-host:27017/admin"),
    )
    return sup.select(
        F.regexp_replace(raw, "://[^:]*:[^@]*@", "://****:****@").alias("masked")
    )


_ORACLE_QUOTE_IDENT = """
SELECT '"' || replace(p_name, '"', '""') || '"' AS quoted FROM part
"""


@register("q_str_quote_ident", oracle=_ORACLE_QUOTE_IDENT, tier="C")
def q_str_quote_ident(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identifier quoting — quote_ident (clone_databases.sh:416,:427):
    wrap in quotes, double any embedded quote."""
    part = load(spark, sf_dir, "part")
    quoted = F.concat(
        F.lit('"'), F.replace(F.col("p_name"), F.lit('"'), F.lit('""')), F.lit('"')
    )
    return part.select(quoted.alias("quoted"))


_ORACLE_DATE_FORMAT = """
SELECT
  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts_log,
  strftime(o_orderdate, '%d%m%y')            AS ts_password_file,
  strftime(o_orderdate, '%Y%m%d_%H%M%S')     AS ts_backup
FROM orders
"""


@register("q_date_format", oracle=_ORACLE_DATE_FORMAT, tier="C")
def q_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's three timestamp formats: log lines (CS:28),
    password-file date suffix (CS:68), backup names (CS:205)."""
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("ts_log"),
        F.date_format("o_orderdate", "ddMMyy").alias("ts_password_file"),
        F.date_format("o_orderdate", "yyyyMMdd_HHmmss").alias("ts_backup"),
    )


_ORACLE_MATH = """
SELECT
  l_orderkey,
  l_linenumber,
  CAST(l_quantity + l_linenumber AS DOUBLE) AS total,
  (l_quantity > 30.0)                       AS is_large,
  (l_linenumber = 1)                        AS is_first
FROM lineitem
WHERE l_orderkey < 100
"""


@register("q_math_arith", oracle=_ORACLE_MATH, tier="C")
def q_math_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer add / compare: total=src+tgt, >0 gates, success==total
    (clone_databases.sh:643,:645,:1097)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity") + F.col("l_linenumber")).cast("double").alias("total"),
        (F.col("l_quantity") > 30.0).alias("is_large"),
        (F.col("l_linenumber") == 1).alias("is_first"),
    )


_ORACLE_JSON = f"""
SELECT
  event_id,
  {json_bigint("props", "$.k")}      AS k,
  {json_bigint("props", "$.k")} % 10 AS k_mod,
  {json_str("props", "$.missing")} IS NULL AS missing_is_null
FROM events
"""


@register("q_json_extract", oracle=_ORACLE_JSON, tier="C")
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON result-document parsing — {ok:1}/{test:1} verdicts
    (clone_databases.sh:758,:935), including absent-key null semantics.
    try_cast + TRY_CAST-guarded oracle: malformed/drifted props degrade
    to NULL identically on both engines (tests/test_adversarial_events)."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("bigint")
    return ev.select(
        "event_id",
        k.alias("k"),
        (k % 10).alias("k_mod"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_is_null"),
    )


_ORACLE_STRUCT = """
SELECT event_id, user_id AS role_user, event_type AS role_name
FROM events WHERE event_id < 100
"""


@register("q_struct_access", oracle=_ORACLE_STRUCT, tier="C")
def q_struct_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-document field access (the mongo role doc
    { role: 'readWrite', db: ... }, clone_databases.sh:848-855): build a
    struct column, then project nested fields with dotted paths."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    nested = ev.select(
        "event_id",
        F.struct(
            F.col("user_id").alias("user"), F.col("event_type").alias("name")
        ).alias("role_doc"),
    )
    return nested.select(
        "event_id",
        F.col("role_doc.user").alias("role_user"),
        F.col("role_doc.name").alias("role_name"),
    )


# MAX over the filtered set, not a bare filter: the engine side is a
# scalar map LOOKUP, which yields one row with NULL when the key is
# absent — a WHERE-only oracle would yield zero rows instead
# (tests/test_adversarial_relational.py). Config keys are unique by
# contract, so MAX is the value itself when present.
_ORACLE_MAP = """
SELECT MAX(CAST(n_nationkey AS INTEGER)) AS conf_value
FROM nation WHERE n_name = 'NATION_3'
"""


@register("q_map_config", oracle=_ORACLE_MAP, tier="C")
def q_map_config(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Config-as-map lookup (sourced conf key→value, clone_databases.sh:62):
    fold rows into a MapType column, then getItem a key. NULL keys are
    dropped BEFORE the fold: collect_list skips NULLs, so a NULL key
    row would desynchronize the two collected arrays and
    map_from_arrays dies on the length mismatch (a config map has no
    NULL keys by contract — tests/test_adversarial_relational.py)."""
    nat = load(spark, sf_dir, "nation").filter(F.col("n_name").isNotNull())
    as_map = nat.agg(
        F.map_from_arrays(
            F.collect_list("n_name"), F.collect_list("n_nationkey")
        ).alias("conf")
    )
    return as_map.select(F.col("conf").getItem("NATION_3").alias("conf_value"))


_ORACLE_ARRAY = """
SELECT
  vec_id,
  len(embedding)                                 AS dim,
  CAST(embedding[1] AS DOUBLE)                   AS first_elem,
  CASE WHEN embedding IS NULL THEN NULL
       ELSE ROUND(SQRT(COALESCE(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0.0)), 4)
  END AS l2_norm
FROM embeddings
"""


@register("q_array_ops", oracle=_ORACLE_ARRAY, tier="X")
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops over embedding FLOAT[]: size, element access, and an
    L2 norm via a fold — all JVM higher-order functions, no UDF.
    try_element_at, not element_at: under ANSI mode a bare element_at
    THROWS on the empty array (one empty embedding would kill the job);
    try_element_at yields NULL, matching DuckDB's `embedding[1]`. The
    fold's 0.0 init makes the empty-array norm 0.0 (DuckDB list_sum of
    [] is NULL, so the oracle COALESCEs under a NULL-array guard)."""
    emb = load(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.try_element_at("embedding", F.lit(1)).cast("double").alias("first_elem"),
        F.round(F.sqrt(sq_sum), 4).alias("l2_norm"),
    )


# Portable per-char mixer for q_rand_string (MINSTD multiplier over the
# Mersenne prime 2^31-1): t_i = (key mod P + i·C1) mod P, h_i =
# (t_i · 48271) mod P, char = charset[h_i mod 62]. Every intermediate is
# < 2^47, so the SAME bigint arithmetic runs overflow-free under ANSI in
# Spark and replays verbatim in DuckDB — the r10 portable-hash-family
# precedent (MinHash/SimHash) applied to the charset picks, upgrading
# the key from rows-only to a full hash oracle. xxhash64 (the previous
# mixer) has no DuckDB twin.
_RS_P = 2147483647
_RS_C1 = 1013904223
_RS_C2 = 48271
_RS_CHARSET = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"


def _rand_string_oracle() -> str:
    chars = " || ".join(
        f"SUBSTRING('{_RS_CHARSET}', CAST("
        f"(((((n_nationkey::BIGINT % {_RS_P}) + {_RS_P}) % {_RS_P} + {i * _RS_C1})"
        f" % {_RS_P} * {_RS_C2}) % {_RS_P}) % 62 + 1 AS INT), 1)"
        for i in range(16)
    )
    return f"""
SELECT 'clone_' || n_name AS target_db,
       {chars} AS password
FROM nation
"""


_ORACLE_RAND_STRING = _rand_string_oracle()


@register("q_rand_string", oracle=_ORACLE_RAND_STRING, tier="C")
def q_rand_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-looking 16-char alnum string per row (clone_databases.sh:
    256-261: /dev/urandom | tr -dc 'A-Za-z0-9' | head -c 16) as a PURE
    JVM expression over the portable MINSTD mixer (constants above).
    Hash-keyed instead of rand() so re-runs and task retries produce
    identical rows at any partitioning (a determinism requirement the
    reference can't meet); full DuckDB hash oracle since round 10.
    Length/charset/determinism stay asserted in tests/test_udfs.py.
    NOT a CSPRNG — the clone pipeline's real provisioning passwords come
    from secrets (pipeline/principals.py); contrast q_udf_password:
    the same reference semantics through the Python-UDF surface."""
    nat = load(spark, sf_dir, "nation")
    # bigint BEFORE any arithmetic: n_nationkey is int32 and the mixer's
    # products exceed 2^31 (ANSI would throw ARITHMETIC_OVERFLOW).
    key = F.pmod(F.col("n_nationkey").cast("bigint"), F.lit(_RS_P))
    chars = [
        F.substring(
            F.lit(_RS_CHARSET),
            (
                F.pmod(
                    F.pmod(key + F.lit(i * _RS_C1), F.lit(_RS_P)) * _RS_C2,
                    F.lit(_RS_P),
                )
                % 62
                + 1
            ).cast("int"),
            1,
        )
        for i in range(16)
    ]
    return nat.select(
        F.concat(F.lit("clone_"), F.col("n_name")).alias("target_db"),
        F.concat(*chars).alias("password"),
    )
