"""Z-order (Morton-curve) data layout — multi-dimensional file skipping.

At 100 TB the scan you avoid is the cheapest scan: parquet/Iceberg readers
prune row groups by min/max column stats, but sorting by one column destroys
locality in every other. Interleaving the bits of two (or more) dimension
keys into one Morton key and sorting by THAT gives every co-sorted dimension
tight min/max ranges per file — the technique behind Delta/Iceberg
``OPTIMIZE ZORDER BY``. This module keeps it Spark-first: the key is a pure
codegen integer expression, the layout is ``repartitionByRange +
sortWithinPartitions`` (one range shuffle, the same cost as any global sort
write), and the benefit is measurable from the written files' stats.

Everything is exact BIGINT bit arithmetic — no float quantization inside the
operator (callers quantize however their domain needs) — so the key, the
range bucketing, and the per-bucket stats all replay bit-identically in the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x_expr: str, y_expr: str, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    integer SQL expressions: result bit 2i is x's bit i, bit 2i+1 is y's
    bit i. Pure fold over a literal bit sequence — stays inside whole-stage
    codegen, no UDF, no shuffle."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint), "
        f"(acc, i) -> acc "
        f"| shiftleft(shiftright(cast(({x_expr}) as bigint), i) & 1, 2 * i) "
        f"| shiftleft(shiftright(cast(({y_expr}) as bigint), i) & 1, 2 * i + 1))"
    )


def zorder_layout(
    df: DataFrame,
    x_expr: str,
    y_expr: str,
    bits: int = 16,
    n_files: int = 16,
) -> DataFrame:
    """Order a table along the Morton curve: adds ``zkey`` and range-
    partitions into ``n_files`` write units, sorted within each — the
    ``OPTIMIZE ZORDER BY (x, y)`` shape. One range exchange; everything
    else is narrow."""
    keyed = df.withColumn("zkey", zorder_key(x_expr, y_expr, bits))
    return keyed.repartitionByRange(n_files, "zkey").sortWithinPartitions(
        "zkey"
    )


def zorder_bucket_stats(
    df: DataFrame,
    x_expr: str,
    y_expr: str,
    bits: int = 16,
    prefix_bits: int = 8,
) -> DataFrame:
    """The skipping evidence: bucket rows by the Morton key's top
    ``prefix_bits`` bits (a proxy for files after a z-ordered write) and
    report each bucket's count and min/max of BOTH dimensions. Tight
    per-bucket ranges on both columns are exactly what lets a reader prune
    files on either predicate; a single-column sort shows tight ranges on
    one dimension and full-span ranges on the other."""
    zk = zorder_key(x_expr, y_expr, bits)
    shift = 2 * bits - int(prefix_bits)
    return (
        df.select(
            F.shiftright(zk, shift).alias("bucket"),
            F.expr(x_expr).cast("long").alias("x"),
            F.expr(y_expr).cast("long").alias("y"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.min("x").alias("x_min"), F.max("x").alias("x_max"),
            F.min("y").alias("y_min"), F.max("y").alias("y_max"),
        )
    )
