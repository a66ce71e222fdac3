"""Seeded fuzz parity for the shared text-preparation contracts.

The hand-built adversarial fixtures pin known divergence classes; this
fuzzer generalizes them: a few hundred random strings over an alphabet
deliberately heavy in whitespace-class characters (incl. \\x0B, the
Java-vs-RE2 \\s divergence byte), unicode, and punctuation must
tokenize, count, and normalize IDENTICALLY through the engine columns
(textprep.tokens / n_tokens / normalized) and their DuckDB mirrors
(oracle_fragments.tokens_sql / n_tokens_sql / normalized_sql). One
Spark job + one DuckDB query per run — deterministic (seeded), not
hypothesis-driven, so CI time is flat.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from database_cloner_spark.llm.textprep import n_tokens, normalized, tokens
from database_cloner_spark.queries.oracle_fragments import (
    n_tokens_sql,
    normalized_sql,
    tokens_sql,
)

_ALPHABET = (
    list(" \t\n\r\f\x0b") * 3  # whitespace-heavy on purpose
    + list("abzABZ019")
    + list(".!?,;:-_'\"()[]#")
    + list("éßñ中文あ🙂")
)


def _corpus(seed: int = 42, n: int = 300) -> list[str | None]:
    rng = random.Random(seed)
    out: list[str | None] = [None, "", " ", "\x0b", "a"]
    for _ in range(n):
        out.append(
            "".join(
                rng.choice(_ALPHABET) for _ in range(rng.randint(0, 40))
            )
        )
    return out


def test_fuzz_tokenizer_parity(spark):
    strs = _corpus()
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strs)], "id long, s string"
    )
    got = {
        r.id: (r.toks, r.n, r.norm)
        for r in df.select(
            "id",
            tokens(F.col("s")).alias("toks"),
            n_tokens(F.col("s")).alias("n"),
            normalized(F.col("s")).alias("norm"),
        ).collect()
    }

    con = duckdb.connect()
    pdf = pd.DataFrame({"id": range(len(strs)), "s": strs})
    con.register("t", pdf)
    want = {
        row[0]: (row[1], row[2], row[3])
        for row in con.execute(
            f"SELECT id, {tokens_sql('s')} AS toks, "
            f"{n_tokens_sql('s')} AS n, {normalized_sql('s')} AS norm "
            "FROM t"
        ).fetchall()
    }
    con.close()

    assert set(got) == set(want)
    mismatches = {
        i: (strs[i], got[i], want[i])
        for i in got
        if got[i] != want[i]
    }
    assert not mismatches, dict(list(mismatches.items())[:5])
