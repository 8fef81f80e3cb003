"""Temporal AS-OF join — an operator Spark's DataFrame API lacks natively.

``asof_join`` matches every left row to the latest right row of the same key
with ``right.ts <= left.ts`` (the "most recent fact as of this event"
pattern: trade->quote, purchase->last-view attribution, sensor->config).

Spark-first composition, NO range cross-join: both sides merge into one
key-partitioned stream ordered by (ts, side) and a running
``last(..., ignorenulls=True)`` window carries the newest right payload
forward onto each left row. Cost = one shuffle on the key + one sort — the
same shape as a window aggregate, linear in input, skew-bound only by the
key distribution (same story as every per-user window here). The right side
is pre-deduplicated to one row per (key, ts) with a deterministic winner
(max event id), which also pins tie semantics portably: DuckDB's native
ASOF JOIN (the test oracle) leaves equal-timestamp winners unspecified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    left_id: str = "event_id",
    right_id: str = "event_id",
    right_val: str = "value",
) -> DataFrame:
    """left(key, ts, left_id, ...) x right(key, ts, right_id, right_val) ->
    left rows + (matched_event_id, matched_value) of the latest right row at
    or before each left row's timestamp (NULLs when none exists).

    Both union legs cast ids to long and values to double so a right table
    with e.g. int32 ids or decimal values still unions cleanly against the
    left leg's typed NULL literals."""
    r = (
        right.groupBy(key, ts)
        .agg(
            F.max(right_id).cast("long").alias("_r_id"),
            F.max_by(right_val, right_id).cast("double").alias("_r_val"),
        )
        .withColumn("_side", F.lit(0))
        .withColumn("_l_id", F.lit(None).cast("long"))
    )
    l = left.select(
        key, ts,
        F.col(left_id).cast("long").alias("_l_id"),
        F.lit(None).cast("long").alias("_r_id"),
        F.lit(None).cast("double").alias("_r_val"),
        F.lit(1).alias("_side"),
    )
    u = l.unionByName(r.select(key, ts, "_l_id", "_r_id", "_r_val", "_side"))
    # right rows (side 0) sort before left rows at equal ts -> "at or before"
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        u.withColumn("matched_event_id", F.last("_r_id", ignorenulls=True).over(w))
        .withColumn("matched_value", F.last("_r_val", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select(
            F.col("_l_id").alias("event_id"), key,
            F.col(ts).alias("ts"), "matched_event_id", "matched_value",
        )
    )
