"""Build the derived ~sf1 fixture: the sf0.1 tables unioned 10x with
key-shifted copies (VERDICT r11 item 1 — /root/testdata is read-only,
so the decade jump is DERIVED into scratch space).

Per-copy transforms (copy 0 is the untouched original):
- every table-local key (custkey, suppkey, partkey, orderkey, event_id,
  user_id, doc_id, vec_id) shifts by copy * 10_000_000, consistently
  across fact/dim references, so referential integrity holds WITHIN a
  copy and key cardinality scales 10x (no artificial hot keys);
- region/nation stay 1x (dimensions don't grow with fact data);
- document text passes through a per-copy rotation cipher over ASCII
  letters (length-preserving, token-structure-preserving) so copies of
  a doc are NOT near-duplicates of each other — dedup keys scale with
  data volume, not with a fabricated 10-way duplicate explosion.
  CAVEAT: non-Latin scripts pass through untouched, so multilingual
  docs retain cross-copy exact/near dups — a realistic trait of grown
  corpora; annotate any key it inflates rather than "fixing" the data;
- embeddings rotate element-wise by the copy index (norm-preserving,
  decorrelates copies so ANN cells and near-dup buckets don't collapse
  into 10-deep stacks of identical vectors);
- timestamps/values/props are untouched: 10x density over the same
  calendar window, which is how real volume growth looks.

Output is one parquet file per table (the testdata layout). DuckDB
writes MICROS timestamps where the originals are NANOS; the engine
loader reads both (sources/parquet.py).

Usage: python scripts/build_sf1_derived.py [out_dir]
       (default /tmp/dcs_sf1_derived; source fixed at sf0.1)
"""

from __future__ import annotations

import os
import string
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10
SHIFT = 10_000_000

LOWER = string.ascii_lowercase
UPPER = string.ascii_uppercase


def _rot(s: str, i: int) -> str:
    return s[i:] + s[:i]


def _cipher(col: str, i: int) -> str:
    if i == 0:
        return col
    return (
        f"translate({col}, '{LOWER}{UPPER}', "
        f"'{_rot(LOWER, i)}{_rot(UPPER, i)}')"
    )


def _text_expr(i: int) -> str:
    return _cipher("text", i)


def _emb_expr(i: int) -> str:
    if i == 0:
        return "embedding"
    # rotate-left by i: norm-preserving, deterministic, decorrelating
    return f"(embedding[{i + 1}:] || embedding[1:{i}])"


# table -> (shifted key columns, extra per-copy select overrides)
PLAN = {
    # high-cardinality NAME columns get the cipher too (found by the
    # first sf1 run: un-decorrelated c_name gave every name 10 exact
    # copies and inflated the ed1 name-dedup 19.6x — real 10x growth
    # brings NEW names); enum-like columns (brand, type, mktsegment,
    # status) stay untouched so group-by cardinalities scale
    # realistically (they don't grow with volume)
    # acctbal shifts by copy * 11000 (the TPC-H acctbal domain is
    # [-999.99, 9999.99], width < 11000): real 10x volume growth widens
    # the value domain with the data instead of packing 10x the
    # intervals into the same band range — without this, the
    # fixed-domain artifact made q_join_interval_overlap's overlap-pair
    # count grow ~100x over the decade jump (the only key over the
    # ~12x wall criterion in r13, annotated as a fixture artifact;
    # VERDICT r13 item 8 asked for the measurement to be made honest).
    # Copies never band-overlap (11000 > 500 + 500), so pair growth is
    # linear, which is what its own annotation argued real growth does.
    "customer": (
        ["c_custkey"],
        {
            "c_name": lambda i: _cipher("c_name", i),
            "c_acctbal": lambda i: f"c_acctbal + {i * 11000}",
        },
    ),
    "supplier": (
        ["s_suppkey"],
        {
            "s_name": lambda i: _cipher("s_name", i),
            "s_acctbal": lambda i: f"s_acctbal + {i * 11000}",
        },
    ),
    "part": (["p_partkey"], {"p_name": lambda i: _cipher("p_name", i)}),
    "orders": (["o_orderkey", "o_custkey"], {}),
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], {}),
    "events": (["event_id", "user_id"], {}),
    "documents": (["doc_id"], {"text": _text_expr}),
    "embeddings": (["vec_id"], {"embedding": _emb_expr}),
}
COPY_ONCE = ("region", "nation")


def main(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in COPY_ONCE:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: 1x copied")
    for t, (keys, overrides) in PLAN.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        selects = []
        for i in range(COPIES):
            parts = []
            for c in cols:
                if c in keys:
                    parts.append(f"{c} + {i * SHIFT} AS {c}")
                elif c in overrides:
                    parts.append(f"{overrides[c](i)} AS {c}")
                else:
                    parts.append(c)
            selects.append(
                f"SELECT {', '.join(parts)} "
                f"FROM read_parquet('{SRC}/{t}.parquet')"
            )
        q = " UNION ALL ".join(selects)
        con.execute(
            f"COPY ({q}) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {COPIES}x -> {n} rows")
    print(f"done -> {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/dcs_sf1_derived")
