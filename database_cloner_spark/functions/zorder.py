"""Z-order (Morton) interleaving — multi-dimensional data layout for
file skipping.

The 100 TB problem a single sort key cannot solve: parquet/Delta file
skipping works off per-file min/max stats, and sorting by column A
makes every file span the FULL range of column B — a filter on B prunes
nothing. Interleaving the bits of A and B into one Morton code and
sorting by THAT bounds every file to a small rectangle in (A, B) space,
so range filters on EITHER dimension prune files (the technique behind
Delta/Databricks OPTIMIZE ZORDER and ClickHouse/DuckDB morton
encodings — all public; Morton 1966).

Spark-first: the code is a pure JVM-side bit expression (shift / and /
or over longs — whole-stage-codegen friendly, no UDF), and the layout
step is `repartitionByRange(z)` + `sortWithinPartitions(z)`: one range
shuffle at write time buys min/max-prunable files on every interleaved
dimension forever after. tests/test_zorder.py quantifies it: per-file
span of the SECOND dimension collapses vs a single-key sort.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 8


def z_value(a: Column, b: Column, bits: int = DEFAULT_BITS) -> Column:
    """Morton code of the low `bits` bits of each input: a's bit i lands
    at position 2i, b's at 2i+1. Inputs are long-cast; callers quantize
    wider domains (rank, bucket, day-number) down to `bits` bits first —
    & masking keeps only the low bits, so out-of-range values wrap
    rather than error (layout, not semantics)."""
    a, b = a.cast("long"), b.cast("long")
    terms = [
        F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        for i in range(bits)
    ] + [
        F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        for i in range(bits)
    ]
    return reduce(add, terms)


def z_value_sql(a: str, b: str, bits: int = DEFAULT_BITS) -> str:
    """The identical Morton code as ANSI SQL (shift/mask/multiply —
    runs on DuckDB verbatim), so the oracle computes the same longs."""
    terms = [f"((({a} >> {i}) & 1) * {1 << (2 * i)})" for i in range(bits)] + [
        f"((({b} >> {i}) & 1) * {1 << (2 * i + 1)})" for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def zorder_layout(
    df: DataFrame, col_a: str, col_b: str, n_files: int, bits: int = DEFAULT_BITS
) -> DataFrame:
    """Re-layout df into `n_files` range-partitioned, z-sorted splits:
    write each partition as one file and its (col_a, col_b) min/max
    stats bound a Morton rectangle. The helper returns the arranged
    DataFrame (callers add .write); `__z` is dropped — layout is not
    schema."""
    z = z_value(F.col(col_a), F.col(col_b), bits).alias("__z")
    return (
        df.select("*", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
