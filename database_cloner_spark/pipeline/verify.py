"""Clone verification — the [V] tier.

The reference only existence-checks its clones (clone_databases.sh:791,
:227-231) and probes connectivity (:480-551). A real engine must verify
content. Three levels, all distributed (no driver-side row transfer):

1. fingerprint: count + order-insensitive row-hash sum + per-numeric-column
   checksums — one pass per table.
2. diff: exceptAll in both directions — exact row multiset equality, with
   the differing rows available when it fails.
3. write round-trip: the reference's `insertOne({test:1})` / `deleteOne`
   probe (clone_databases.sh:933-937) against the target namespace.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class TableFingerprint:
    n_rows: int
    row_hash_sum: str  # decimal sum of per-row xxhash64 — order-insensitive
    numeric_sums: dict[str, float]


def _hashable_cols(df: DataFrame) -> list:
    # Sorted by NAME, not schema position: a partitioned write moves the
    # partition column to the end of the read-back schema, and
    # xxhash64(a,b,c) != xxhash64(c,a,b) — identical content must
    # fingerprint identically regardless of column order.
    # Arrays/maps/structs hash fine with xxhash64; floats are stable
    # here because a clone is byte-identical, not recomputed.
    return [F.col(name) for name in sorted(df.columns)]


def fingerprint(df: DataFrame) -> TableFingerprint:
    """One-pass content fingerprint. The row hash is xxhash64 over all
    columns, summed as DECIMAL(38,0): order-insensitive, overflow-free,
    duplicate-sensitive (unlike XOR, two identical rows don't cancel).
    Scales as a single partial-aggregated reduction — constant-size state
    per partition regardless of table size."""
    num_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.LongType, T.IntegerType, T.DoubleType, T.FloatType))
    ]
    aggs = [
        F.count("*").alias("__n"),
        F.sum(F.xxhash64(*_hashable_cols(df)).cast("decimal(38,0)")).alias("__h"),
    ] + [F.round(F.sum(F.col(c).cast("double")), 2).alias(f"__s_{c}") for c in num_cols]
    row = df.agg(*aggs).collect()[0]
    return TableFingerprint(
        n_rows=row["__n"],
        row_hash_sum=str(row["__h"]),
        numeric_sums={c: row[f"__s_{c}"] for c in num_cols},
    )


def diff_counts(src: DataFrame, dst: DataFrame) -> tuple[int, int]:
    """(rows only in src, rows only in dst) — exact multiset diff via
    exceptAll. Shuffles both sides on the full row; use fingerprint()
    first and only diff on mismatch."""
    only_src = src.exceptAll(dst).count()
    only_dst = dst.exceptAll(src).count()
    return only_src, only_dst


def verify_clone(src: DataFrame, dst: DataFrame, deep: bool = False) -> dict:
    """Fingerprint compare; optional deep multiset diff."""
    fs, fd = fingerprint(src), fingerprint(dst)
    ok = fs == fd
    result = {
        "match": ok,
        "src_rows": fs.n_rows,
        "dst_rows": fd.n_rows,
        "src_hash": fs.row_hash_sum,
        "dst_hash": fd.row_hash_sum,
    }
    if deep or not ok:
        only_src, only_dst = diff_counts(src, dst)
        result["only_in_src"] = only_src
        result["only_in_dst"] = only_dst
        result["match"] = ok and only_src == 0 and only_dst == 0
    return result


def write_round_trip(spark, target_dir: str) -> bool:
    """The reference's write-probe (insertOne({test:1}) then deleteOne,
    clone_databases.sh:933-937): write one row into the target namespace,
    read it back, drop it."""
    import os
    import shutil

    probe_path = os.path.join(target_dir, "_write_probe.parquet")
    try:
        probe = spark.createDataFrame([(1,)], "test int")
        probe.write.mode("overwrite").parquet(probe_path)
        back = spark.read.parquet(probe_path).collect()
        return len(back) == 1 and back[0].test == 1
    finally:
        shutil.rmtree(probe_path, ignore_errors=True)
