"""Shared DuckDB oracle fragments mirroring engine expression semantics.

Single source of truth for cross-engine expression contracts that more
than one oracle uses — mirroring how the engine side shares the
corresponding column builders. Divergences these encode (all verified
empirically, pinned by tests/test_adversarial_events.py):

- DuckDB `props->>'$.k'` ERRORS on malformed JSON where Spark's
  `get_json_object` returns NULL — route through TRY_CAST(... AS JSON)
  so schema-drifted/corrupt props degrade to NULL on both engines (the
  PERMISSIVE posture: a 10-hour 100 TB job must not die on one bad
  record).
- DuckDB `TRY_CAST('14.5' AS BIGINT)` ROUNDS to 15 where Spark's
  `try_cast` yields NULL — gate the cast behind an integer-format
  regex so both engines agree on non-integral strings.
"""

from __future__ import annotations

from database_cloner_spark.llm.textprep import WS_CHARS, WS_CLASS

# WS_CHARS as a DuckDB string expression (chr() concatenation — DuckDB
# quoted strings do not process backslash escapes).
WS_SQL = " || ".join("' '" if c == " " else f"chr({ord(c)})" for c in WS_CHARS)


def tokens_sql(col: str = "text") -> str:
    """DuckDB mirror of textprep.tokens(): charset-trim the shared
    whitespace set off both ends, then split on whitespace RUNS. Built
    from the same WS_CLASS/WS_CHARS literals the engine uses so the two
    tokenizers cannot drift (tests/test_adversarial_docs.py)."""
    return f"string_split_regex(trim({col}, {WS_SQL}), '{WS_CLASS}+')"


def n_tokens_sql(col: str = "text") -> str:
    """Token COUNT with the engine's NULL contract: NULL text counts 0
    (engine side coalesces size(tokens(text)) to 0)."""
    return f"COALESCE(len({tokens_sql(col)}), 0)::BIGINT"


def normalized_sql(col: str = "text") -> str:
    """DuckDB mirror of textprep.normalized(): lowercase, charset-trim,
    collapse whitespace RUNS to single spaces — same WS literals as the
    engine (Java \\s includes \\x0B, RE2 \\s does not, so the shorthand
    classes silently diverge on vertical-tab bytes)."""
    return (
        f"regexp_replace(lower(trim({col}, {WS_SQL})), '{WS_CLASS}+', ' ', 'g')"
    )


def json_str(col: str, path: str) -> str:
    """DuckDB mirror of F.get_json_object(col, path): NULL on malformed
    JSON, NULL on missing key, raw text of the value otherwise."""
    return f"json_extract_string(TRY_CAST({col} AS JSON), '{path}')"


def guarded_int_cast(expr: str, sql_type: str = "BIGINT") -> str:
    """DuckDB mirror of Spark's `try_cast(<string> AS <integral>)`:
    NULL unless the text is an integer literal under Spark's cast
    grammar — optional surrounding whitespace and an optional sign,
    digits only. A bare DuckDB TRY_CAST is NOT equivalent: it ROUNDS
    '14.5' to 15 where Spark yields NULL (verified empirically; both
    engines agree on '+5', ' 5 ', and '+ 5' -> NULL)."""
    return (
        f"CASE WHEN regexp_full_match({expr}, "
        f"'{WS_CLASS}*[+-]?[0-9]+{WS_CLASS}*') "
        f"THEN TRY_CAST({expr} AS {sql_type}) END"
    )


def json_bigint(col: str, path: str) -> str:
    """DuckDB mirror of F.get_json_object(col, path).try_cast('bigint')."""
    return guarded_int_cast(json_str(col, path))
