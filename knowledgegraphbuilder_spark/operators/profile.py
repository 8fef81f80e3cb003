"""Table profiling — the data-quality pass every large-scale ingest starts
with (reference analog: none; this is a training-data-pipeline surface).

``profile_table`` computes, per column: row/null/distinct counts, binary
(UTF-8) min/max, average stringified length, and the modal value with its
count — in ONE corpus scan. Columns are unpivoted with ``stack`` (a codegen
projection, no shuffle) into (col, val) rows, so however many columns are
profiled the plan is a single scan + one partial-aggregated groupBy per
rollup level; the per-(col, val) mode computation is the only value-keyed
shuffle and it is map-side combined first. At 100 TB the output stays
#columns rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One row per profiled column:
    (column, n_rows, n_null, n_distinct, min_value, max_value, avg_len,
    top_value, top_count).

    Values are profiled through a CAST to string, so any atomic column type
    composes and min/max/top use binary UTF-8 comparison identically in
    Spark and DuckDB. n_distinct is exact and excludes nulls (count(distinct
    val) semantics both engines); the modal value breaks count ties toward
    the LARGER string (max(struct(cnt, val))) — deterministic, replayable.
    avg_len is rounded 4dp over non-null values only.
    """
    if columns is None:
        columns = list(df.columns)
    stack_args = ", ".join(
        f"'{c}', cast(`{c}` as string)" for c in columns
    )
    kv = df.select(
        F.expr(f"stack({len(columns)}, {stack_args}) as (col, val)")
    )
    base = kv.groupBy("col").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("val").isNull(), 1)).alias("n_null"),
        F.countDistinct("val").alias("n_distinct"),
        F.min("val").alias("min_value"),
        F.max("val").alias("max_value"),
        F.round(F.avg(F.length("val")), 4).alias("avg_len"),
    )
    mode = (
        kv.filter(F.col("val").isNotNull())
        .groupBy("col", "val")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("col")
        .agg(F.max(F.struct(F.col("cnt"), F.col("val"))).alias("m"))
        .select(
            "col",
            F.col("m.val").alias("top_value"),
            F.col("m.cnt").alias("top_count"),
        )
    )
    return (
        base.join(mode, "col", "left")
        .select(
            F.col("col").alias("column"),
            "n_rows", "n_null", "n_distinct",
            "min_value", "max_value", "avg_len",
            "top_value",
            F.coalesce("top_count", F.lit(0).cast("long")).alias("top_count"),
        )
    )
