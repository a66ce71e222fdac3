"""Z-order layout: the multi-dim file-skipping property, quantified.

The registered key (q_sort_zorder) hash-checks every Morton value
against the DuckDB oracle; these tests pin the LAYOUT claim — that
range-partitioning on z bounds BOTH dimensions per partition, which is
the whole reason to pay the z-sort at write time.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from database_cloner_spark.functions.zorder import z_value, zorder_layout
from database_cloner_spark.sources import load

SF = "/root/testdata/sf0.001"
N_FILES = 8


def _dim_spans(df, col):
    """Per-partition (max-min) span of `col`, averaged."""
    spans = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg((F.max(col) - F.min(col)).alias("span"))
        .agg(F.avg("span"))
        .first()[0]
    )
    return float(spans)


def _quantized(spark):
    orders = load(spark, SF, "orders").filter(
        F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull()
    )
    day = F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1992-01-01")))
    return orders.select(
        (F.col("o_custkey") % 256).alias("a"),
        (day % 256).cast("long").alias("b"),
    )


def test_zorder_layout_bounds_both_dims(spark):
    """Single-key sort leaves dim b's per-file span at ~full range
    (~255); z-layout collapses it (each file is a Morton rectangle).
    The first dim pays a modest widening — that trade IS z-ordering."""
    q = _quantized(spark)
    by_a = q.repartitionByRange(N_FILES, "a").sortWithinPartitions("a")
    by_z = zorder_layout(q, "a", "b", N_FILES)

    b_span_a_sort = _dim_spans(by_a, "b")
    b_span_z_sort = _dim_spans(by_z, "b")
    assert b_span_z_sort < 0.6 * b_span_a_sort, (
        f"z-layout should collapse dim-b spans: {b_span_z_sort} vs "
        f"{b_span_a_sort} under a-sort"
    )
    # and dim a stays bounded too (not traded away entirely)
    a_span_z_sort = _dim_spans(by_z, "a")
    assert a_span_z_sort < 0.8 * 255


def test_z_value_interleave_known_bits(spark):
    """Hand-computed Morton codes: (a=0b11, b=0b00) -> 0b0101 = 5,
    (a=0b00, b=0b11) -> 0b1010 = 10, (5, 3) -> interleave(101, 011)."""
    df = spark.createDataFrame(
        [(3, 0), (0, 3), (5, 3)], "a long, b long"
    ).select(z_value(F.col("a"), F.col("b")).alias("z"))
    got = [r.z for r in df.collect()]
    # (5,3): a bits at even pos: 1,0,1 -> 1+16; b bits at odd: 1,1 -> 2+8
    assert got == [5, 10, 1 + 16 + 2 + 8]


def test_z_value_null_propagates(spark):
    df = spark.createDataFrame([(None, 3)], "a long, b long").select(
        z_value(F.col("a"), F.col("b")).alias("z")
    )
    assert df.first().z is None
