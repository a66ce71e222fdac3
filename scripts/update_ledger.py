"""Merge driver CORRECTNESS_r*.json results into the driver-green ledger.

The correctness driver verifies only the first N (observed: 50) keys of
``__spark_entry__.queries()`` per round. The ledger records, for every
key that has EVER received a green driver row, the LAST round it was
verified in and HOW it was verified:

    {"q_scan_full": {"round": 8, "mode": "hash"},
     "q_dedup_minhash": {"round": 7, "mode": "rows"}, ...}

- ``mode: "hash"`` — rows + schema + value-hash matched the DuckDB oracle.
- ``mode: "rows"``  — no oracle that round; the driver recorded a
  rows-only pass (SURVEY.md marks these keys ✗-oracle by design).

Since round 11 each green entry also carries ``sig``: the content
signature (registry.sig_of over builder source + oracle SQL) captured
AT MERGE TIME. Run this script at ROUND START, before editing any
query code — the code then on disk is exactly what the driver verified
at the previous round's end, so the captured signature identifies the
verified source. A key edited later stops matching its ledgered sig
and the registry rotation re-queues it ahead of unchanged green keys
(VERDICT r10 item 3). scripts/backfill_ledger_sigs.py reconstructed
the historical sigs from round-boundary commits once.

The registry orders (a) never-verified keys and (b) keys whose ledger
entry is rows-only but that NOW carry an oracle (an upgrade that must
earn a fresh hash row) FIRST, then edited-since-green keys, then all
untouched green keys oldest-round-first, so successive driver rounds
rotate true least-recently-verified coverage
(VERDICT.md round 1 item 2; round 8 "Next round" item 2).

An earlier plain-list ledger format (key names only) also loads: each
listed key is treated as hash-verified in round 0, i.e. maximally stale.

Usage: python scripts/update_ledger.py CORRECTNESS_r01.json [more...]
"""

from __future__ import annotations

import json
import os
import re
import sys

LEDGER = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "database_cloner_spark",
    "driver_ledger.json",
)


def load_ledger(path: str = LEDGER) -> dict[str, dict]:
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        raw = json.load(f)
    if isinstance(raw, list):  # legacy: flat list of green key names
        return {k: {"round": 0, "mode": "hash"} for k in raw}
    return {
        k: (v if isinstance(v, dict) and "round" in v and "mode" in v
            else {"round": 0, "mode": "hash"})
        for k, v in raw.items()
    }


def _round_of(path: str) -> int:
    m = re.search(r"_r(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else 0


def _current_sig(key: str) -> str | None:
    """Signature of the key's CURRENT builder+oracle source — valid as
    the verified-code signature only when this script runs before any
    round-N+1 edits (the documented round-start convention). None for
    keys no longer registered (renamed/removed)."""
    try:
        from database_cloner_spark.registry import content_sig

        return content_sig(key)
    except Exception:
        return None


def main(paths: list[str]) -> None:
    # read the module attribute at CALL time (a def-time default would
    # freeze the original path and defeat test monkeypatching)
    ledger = load_ledger(LEDGER)
    for path in paths:
        rnd = _round_of(path)
        with open(path) as f:
            rows = json.load(f)
        for key, row in rows.items():
            if row.get("hash_match") is True:
                mode = "hash"
            elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                # Rows-only by design (SURVEY.md marks these ✗-oracle).
                mode = "rows"
            else:
                # FAIL row: drop the entry so the key re-enters the
                # never-verified front — but only if this file is at
                # least as new as the ledgered pass (merging an OLDER
                # round's file must not erase a newer green row).
                prev = ledger.get(key)
                if prev is None or rnd >= prev["round"]:
                    ledger.pop(key, None)
                continue
            prev = ledger.get(key)
            if prev is None or rnd >= prev["round"]:
                entry = {"round": rnd, "mode": mode}
                sig = _current_sig(key)
                if sig is not None:
                    entry["sig"] = sig
                ledger[key] = entry
    with open(LEDGER, "w") as f:
        json.dump(dict(sorted(ledger.items())), f, indent=0)
        f.write("\n")
    n_hash = sum(1 for v in ledger.values() if v["mode"] == "hash")
    print(
        f"ledger: {len(ledger)} driver-green keys "
        f"({n_hash} hash, {len(ledger) - n_hash} rows-only) -> {LEDGER}"
    )


if __name__ == "__main__":
    main(sys.argv[1:])
