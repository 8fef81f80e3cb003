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


def hash_partition_bucket(expr: str, k: int) -> Column:
    """Deterministic node->partition assignment by content hash: the top
    60 bits of sha256 mod ``k``. Engine-portable on purpose (unlike
    Spark's Murmur3 ``hash()``): DuckDB replays it as
    ``('0x' || substr(sha256(x), 1, 15))::BIGINT % k``, so placement
    audits verify cross-engine. Uniform over real key distributions —
    the property the edge-cut audit below is measuring against."""
    return F.expr(
        f"pmod(cast(conv(substring(sha2({expr}, 256), 1, 15), 16, 10) "
        f"as bigint), {int(k)})"
    )


def edge_cut_stats(
    edges: DataFrame,
    k: int = 32,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Placement audit for a hash-partitioned graph: home each edge on
    its source's partition and report, per partition, how many of its
    edges stay internal vs cross to another worker — the communication
    volume every BSP superstep (PageRank/BFS/LPA here) pays per
    iteration, and THE number that decides whether a 1000-executor run
    is compute- or network-bound. Vertex-cut systems and layout papers
    (PowerGraph, OSDI'12) optimize exactly this quantity; this operator
    makes it observable for our layout.

    Output: one row per non-empty home partition —
    ``(part, n_nodes, n_edges, n_cut, cut_frac)`` where ``n_nodes``
    counts distinct sources homed there. Expected cut_frac for uniform
    hash is (k-1)/k, so anything below that documents exploitable
    locality (and a skewed n_edges distribution flags placement
    hot-spots before they become stragglers).

    Scale shape: two codegen hash columns + one groupBy on the home
    partition (k groups, map-side combinable) — one pass, one tiny
    shuffle, no joins.
    """
    e = edges.select(
        F.col(src_col).cast("string").alias("s"),
        F.col(dst_col).cast("string").alias("d"),
    ).withColumn("part", hash_partition_bucket("s", k)).withColumn(
        "dpart", hash_partition_bucket("d", k)
    )
    return (
        e.groupBy("part")
        .agg(
            F.countDistinct("s").cast("long").alias("n_nodes"),
            F.count("*").cast("long").alias("n_edges"),
            F.sum(F.when(F.col("part") != F.col("dpart"), 1).otherwise(0))
            .cast("long")
            .alias("n_cut"),
        )
        .withColumn(
            "cut_frac", F.round(F.col("n_cut") / F.col("n_edges"), 6)
        )
    )


def partition_conductance(
    edges: DataFrame,
    k: int = 32,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Conductance of the hash placement, per partition: phi(S) =
    cut(S) / min(vol(S), vol(V) - vol(S)) — the spectral-partitioning
    quality measure (Shi & Malik; Leskovec et al. NCP, WWW'08) applied
    to the same content-hash placement edge_cut_stats audits. Where
    cut_frac says how much traffic a partition emits, conductance says
    how much it emits RELATIVE to how much it could — the
    load-balance-aware number that flags a partition as
    badly-separated even when it is small.

    Node-keyed placement (each vertex homed by hash_partition_bucket),
    volumes are degree sums, a cut edge charges both sides. Everything
    is exact integers until the final division (rounded 6dp).

    Scale shape: one degree aggregate, one vol aggregate over k groups,
    one edge pass for cuts charged to both endpoint partitions, a
    broadcast of the k-row totals — no joins bigger than the edge list,
    no windows.

    Returns (part, n_nodes, vol, n_cut, conductance).
    """
    e = edges.select(
        F.col(src_col).cast("string").alias("s"),
        F.col(dst_col).cast("string").alias("d"),
    )
    deg = (
        e.select(F.col("s").alias("node"))
        .unionAll(e.select(F.col("d").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .withColumn("part", hash_partition_bucket("node", k))
    )
    vol = deg.groupBy("part").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum("deg").cast("long").alias("vol"),
    )
    total = vol.agg(F.sum("vol").cast("long").alias("tvol"))
    cuts = (
        e.withColumn("ps", hash_partition_bucket("s", k))
        .withColumn("pd", hash_partition_bucket("d", k))
        .filter(F.col("ps") != F.col("pd"))
    )
    per_side = (
        cuts.select(F.col("ps").alias("part"))
        .unionAll(cuts.select(F.col("pd").alias("part")))
        .groupBy("part")
        .agg(F.count(F.lit(1)).cast("long").alias("n_cut"))
    )
    return (
        vol.join(per_side, "part", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "part", "n_nodes", "vol",
            F.coalesce("n_cut", F.lit(0)).cast("long").alias("n_cut"),
            # the whole graph in one partition has min(vol, rest) = 0 and
            # no cut is possible: phi is 0 by convention, not an ANSI
            # divide-by-zero
            F.when(
                F.least(F.col("vol"), F.col("tvol") - F.col("vol")) == 0,
                F.lit(0.0),
            ).otherwise(
                F.round(
                    F.coalesce("n_cut", F.lit(0))
                    / F.least(F.col("vol"), F.col("tvol") - F.col("vol")),
                    6,
                )
            ).alias("conductance"),
        )
    )
