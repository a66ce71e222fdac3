"""§2.10 UDF / UDAF / UDTF surface.

The reference's only "functions" are bash helpers: password generation
(clone_databases.sh:256-261) and connection-string template substitution
(:908). Plus the [X]-tier vectorized pandas surface the north star needs.

Policy (SURVEY.md §4): UDFs are the slow path. q_udf_template is shown in
both forms but shipped as a pure column expression; only the password
generator (inherently procedural) and the grouped normalize (per-group
pandas semantics) use Python, and both are Arrow-vectorized.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from database_cloner_spark.registry import register
from database_cloner_spark.sources import load

_CHARSET = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"


@F.pandas_udf(T.StringType())
def generate_password(seed: pd.Series) -> pd.Series:
    """Seeded 16-char alnum password — the deterministic twin of
    `tr -dc 'A-Za-z0-9' < /dev/urandom | head -c 16`
    (clone_databases.sh:256-261). Vectorized: one numpy RNG per batch
    element, Arrow transfer, no per-row Python loop over characters.
    """
    import numpy as np

    out = []
    for s in seed.to_numpy():
        rng = np.random.RandomState(int(s) & 0x7FFFFFFF)
        idx = rng.randint(0, len(_CHARSET), size=16)
        out.append("".join(_CHARSET[i] for i in idx))
    return pd.Series(out)


# Non-deterministic in the reference => rows-only check (oracle=None).
@register("q_udf_password", oracle=None, tier="C")
def q_udf_password(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One password per clone-target database. Properties asserted in
    tests: length 16, charset [A-Za-z0-9], deterministic per seed."""
    nat = load(spark, sf_dir, "nation")
    return nat.select(
        F.concat(F.lit("clone_"), F.col("n_name")).alias("target_db"),
        generate_password(F.col("n_nationkey").cast("long")).alias("owner_password"),
    )


_ORACLE_TEMPLATE = """
WITH t AS (
  SELECT 'postgresql://<<USERNAME>>:<<PASSWORD>>@<<HOST>>:5432/' || n_name AS template,
         'clone_' || n_name || '_app' AS username
  FROM nation
)
SELECT replace(replace(replace(template,
         '<<USERNAME>>', username),
         '<<PASSWORD>>', '****'),
         '<<HOST>>', 'pg-lb.internal') AS conn_string
FROM t
"""


@register("q_udf_template", oracle=_ORACLE_TEMPLATE, tier="C")
def q_udf_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connection-string template fill (clone_databases.sh:908).
    Deliberately NOT a Python UDF: chained `replace` stays in codegen."""
    nat = load(spark, sf_dir, "nation")
    template = F.concat(
        F.lit("postgresql://<<USERNAME>>:<<PASSWORD>>@<<HOST>>:5432/"), F.col("n_name")
    )
    username = F.concat(F.lit("clone_"), F.col("n_name"), F.lit("_app"))
    filled = F.replace(
        F.replace(
            F.replace(template, F.lit("<<USERNAME>>"), username),
            F.lit("<<PASSWORD>>"),
            F.lit("****"),
        ),
        F.lit("<<HOST>>"),
        F.lit("pg-lb.internal"),
    )
    return nat.select(filled.alias("conn_string"))


_ORACLE_PANDAS_NORM = """
SELECT event_id, event_type,
       ROUND((value - AVG(value) OVER (PARTITION BY event_type))
             / STDDEV_SAMP(value) OVER (PARTITION BY event_type), 4) AS value_z
FROM events
WHERE value IS NOT NULL AND isfinite(value)
"""


@register("q_pandas_udf_norm", oracle=_ORACLE_PANDAS_NORM, tier="X")
def q_pandas_udf_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score normalize via applyInPandas — the vectorized
    grouped-transform surface. Each group is one Arrow batch; at 100 TB
    the partition key must be higher-cardinality than event_type (5
    groups), so real pipelines group by (event_type, shard) — here the
    5-group form keeps the oracle simple."""

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        mean, std = pdf["value"].mean(), pdf["value"].std()  # ddof=1 == STDDEV_SAMP
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "value_z": ((pdf["value"] - mean) / std).round(4),
            }
        )

    # Finite values only, filtered JVM-side BEFORE the Arrow boundary:
    # one NaN/Infinity value poisons the whole group's mean/std in
    # pandas AND blows DuckDB's STDDEV_SAMP out of range — non-finite
    # rows have no defined z-score and are dropped on both engines
    # (adversarial events fixture, r10).
    ev = (
        load(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .filter(
            F.col("value").isNotNull()
            & ~F.isnan("value")
            & (F.abs("value") < F.lit(float("inf")))
        )
    )
    return ev.groupBy("event_type").applyInPandas(
        normalize, schema="event_id long, event_type string, value_z double"
    )


# List indexing mirrors F.get (NULL for an '='-less entry, e.g. a
# region name containing ';'); split_part would return '' instead. The
# tail reassembly mirrors the engine's limit-2 split.
_ORACLE_UDTF = """
WITH conf AS (
  SELECT r_regionkey,
         'REGION_NAME=' || r_name || ';REGION_KEY=' || CAST(r_regionkey AS VARCHAR) AS body
  FROM region
),
entries AS (
  SELECT r_regionkey, string_split(unnest(string_split(body, ';')), '=') AS ts
  FROM conf
)
SELECT r_regionkey,
       ts[1] AS conf_key,
       CASE WHEN len(ts) >= 2 THEN array_to_string(ts[2:], '=') END AS conf_value
FROM entries
"""


@register("q_udtf_explode_config", oracle=_ORACLE_UDTF, tier="C")
def q_udtf_explode_config(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-function semantics: one config blob -> many (key,value) rows
    (`source conf`, clone_databases.sh:62) via explode — a narrow,
    shuffle-free lateral view."""
    reg = load(spark, sf_dir, "region")
    body = F.concat(
        F.lit("REGION_NAME="),
        F.col("r_name"),
        F.lit(";REGION_KEY="),
        F.col("r_regionkey").cast("string"),
    )
    exploded = reg.select(
        "r_regionkey", F.explode(F.split(body, ";")).alias("entry")
    )
    kv = F.split(F.col("entry"), "=", 2)
    # F.get, not getItem: an '='-less entry (a region name containing
    # ';') has one part, and getItem(1) kills the job under ANSI.
    return exploded.select(
        "r_regionkey",
        F.get(kv, 0).alias("conf_key"),
        F.get(kv, 1).alias("conf_value"),
    )


_ORACLE_PY_UDTF = """
SELECT doc_id,
       unnest(string_split(text, ' ')) AS sentence_word,
       lang
FROM (SELECT doc_id, text, lang FROM documents WHERE doc_id % 50 = 0)
"""


@register("q_udtf_python", oracle=_ORACLE_PY_UDTF, tier="X")
def q_udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Python UDTF (Spark 4 `@udtf`): one input row -> many output
    rows from arbitrary Python, the escape hatch when a lateral
    expansion can't be written as explode-of-an-expression. Arrow moves
    batches across the Python boundary; the UDTF itself is row-wise
    Python, so this stays the SLOW path — the sibling
    q_udtf_explode_config shows the codegen formulation to prefer
    whenever the expansion IS expressible. Input is pre-filtered to 2%
    of docs so the Python boundary sees only the rows it must."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.functions import lit  # noqa: F401  (exercised via lateral join)

    @udtf(returnType="sentence_word: string")
    class SplitWords:
        def eval(self, text: str):
            for w in text.split(" "):
                yield (w,)

    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 50 == 0)
        .select("doc_id", "text", "lang")
    )
    docs.createOrReplaceTempView("_udtf_docs_in")
    spark.udtf.register("split_words", SplitWords)
    return spark.sql(
        """
        SELECT d.doc_id, t.sentence_word, d.lang
        FROM _udtf_docs_in d, LATERAL split_words(d.text) t
        """
    )
