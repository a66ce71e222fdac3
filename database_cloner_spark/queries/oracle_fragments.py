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


def json_str(col: str, path: str) -> str:
    """DuckDB mirror of F.get_json_object(col, path): NULL on malformed
    JSON, NULL on missing key, raw text of the value otherwise."""
    return f"json_extract_string(TRY_CAST({col} AS JSON), '{path}')"


def json_bigint(col: str, path: str) -> str:
    """DuckDB mirror of F.get_json_object(col, path).try_cast('bigint'):
    NULL unless the extracted text is a plain integer literal."""
    s = json_str(col, path)
    return (
        f"CASE WHEN regexp_full_match({s}, '-?[0-9]+') "
        f"THEN TRY_CAST({s} AS BIGINT) END"
    )
