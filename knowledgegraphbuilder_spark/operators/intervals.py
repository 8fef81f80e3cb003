"""Interval-overlap join — bin-expanded equi-join, no range cross-join.

Spark has no native interval (range-overlap) join: ``l.start <= r.end AND
r.start <= l.end`` compiles to BroadcastNestedLoopJoin / CartesianProduct,
which is O(|L|*|R|) and a guaranteed 100 TB scale-killer. The classic fix
(same trick as Databricks' range-join bin hints and the AS-OF merge-union in
``asof.py``) is to discretize the domain into fixed-width bins:

1. every interval explodes to the bins it touches
   (``sequence(floor(s/w), floor(e/w))``),
2. the two sides **equi-join on (key, bin)** — a plain shuffled hash join
   Catalyst can plan, AQE can skew-split, and that scales linearly in
   (rows x bins-per-row),
3. the overlap predicate is re-checked exactly on the joined rows,
4. each surviving pair is emitted **exactly once, with no distinct()**: a
   pair overlapping k shared bins would match k times, so we keep only the
   bin that contains ``greatest(l.start, r.start)`` — the overlap's left
   edge, which lies in exactly one bin. Dedup-by-arithmetic instead of a
   second shuffle.

Cost: one shuffle per side on (key, bin). ``bin_width`` trades fan-out
(short bins -> more exploded rows) against join selectivity (long bins ->
more false candidate pairs); set it near the median interval length.

Reference parity: the reference has no interval join — this is part of the
training-data-pipeline surface (event-window attribution, media-span x
caption-span alignment at scale). Same semantic family as the span
containment join in ``relations.py:84-105``, which stays a broadcast range
join only because chunk tables are per-doc small; this operator is the
shuffle-safe path for two BIG sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str | None = "user_id",
    start: str = "start",
    end: str = "end",
    id_col: str = "interval_id",
    bin_width: int = 3600,
) -> DataFrame:
    """left(key?, id_col, start, end) x right(same) -> one row per
    overlapping (closed-interval) pair:
    (key?, l_id, r_id, overlap_start, overlap_end).

    start/end must be integral (cast upstream); ``key=None`` joins globally
    (use only when the bin histogram is known to be flat — every pair in a
    bin is a candidate).
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    w = F.lit(int(bin_width)).cast("long")

    def binned(df: DataFrame, tag: str) -> DataFrame:
        s = F.col(start).cast("long")
        e = F.col(end).cast("long")
        cols = [
            F.col(id_col).cast("long").alias(f"{tag}_id"),
            s.alias(f"{tag}_s"),
            e.alias(f"{tag}_e"),
            F.explode(
                F.sequence(F.floor(s / w), F.floor(e / w))
            ).alias("_bin"),
        ]
        if key is not None:
            cols.insert(0, F.col(key).alias(key))
        return df.filter(s <= e).select(*cols)

    l = binned(left, "l")
    r = binned(right, "r")
    on = [l["_bin"] == r["_bin"]]
    if key is not None:
        on.insert(0, l[key] == r[key])
    joined = l.join(r, on[0] if len(on) == 1 else (on[0] & on[1]))

    lo = F.greatest(F.col("l_s"), F.col("r_s"))
    hi = F.least(F.col("l_e"), F.col("r_e"))
    out_cols = [
        F.col("l_id"),
        F.col("r_id"),
        lo.alias("overlap_start"),
        hi.alias("overlap_end"),
    ]
    if key is not None:
        out_cols.insert(0, l[key].alias(key))
    return (
        joined
        # exact overlap test (bins only prune)
        .filter((F.col("l_s") <= F.col("r_e")) & (F.col("r_s") <= F.col("l_e")))
        # exactly-once: keep the bin holding the overlap's left edge
        .filter(F.floor(lo / w) == l["_bin"])
        .select(*out_cols)
    )
