"""Time-series resampling over the event stream.

The reference pipeline has no time-series surface; this is a
BASELINE.json training-data-pipeline operator: regularizing an event
log onto a fixed grid (counts + gap-filled rolling value) is the first
step of every downstream rate/anomaly job, and doing it wrong (a
driver-side loop over gaps, or a float epoch) is a classic scale
killer.

Design notes
------------
- Buckets are exact integer arithmetic on microseconds
  (``unix_micros(ts) div bucket_us``) — never float epochs, so the
  DuckDB replay (``epoch_us // bucket_us``) is bit-identical.
- Values become exact integer cents (``floor(value * 100)``) before
  any sum — the layout.py/zorder contract — so per-bucket sums are
  order-independent exact integers and only the final avg divides.
- The dense grid is generated DISTRIBUTED: per-key (min, max) bounds
  (a tiny aggregate) then ``explode(sequence(lo, hi))`` — rows are
  produced on executors, proportional to the grid, with no driver
  loop and no join against a driver-collected range.
- Forward fill is ``last(x, ignorenulls=True)`` over
  (key, bucket-order) — one shuffle on the grouping key, per-key
  sort, O(1) state per row. Leading buckets can't be null because
  each key's grid starts at its own first observed bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def resample_events(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_us: int = 900_000_000,
) -> DataFrame:
    """Resample an event log onto a fixed ``bucket_us``-wide grid per
    key, densified over each key's [first, last] bucket with zero-filled
    counts and forward-filled average value.

    Output: (key, bkt, n_events, sum_cents, avg_value, filled) where
    bkt = floor(epoch_us / bucket_us) (exact BIGINT), avg_value is the
    bucket's exact-cents mean (6 dp) carried forward across gaps, and
    filled = 1 marks synthesized gap rows.
    """
    bus = int(bucket_us)
    e = events.select(
        F.col(key_col).alias("key"),
        F.expr(f"unix_micros(cast({ts_col} as timestamp)) div {bus}").alias("bkt"),
        F.expr(f"cast(floor({value_col} * 100) as bigint)").alias("cents"),
    )
    agg = e.groupBy("key", "bkt").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )
    return densify_ffill(agg)


def densify_ffill(agg: DataFrame) -> DataFrame:
    """Densify a (key, bkt, n_events, sum_cents) bucket aggregate over each
    key's [first, last] bucket and forward-fill the average — the shared
    back half of batch resample_events and the streaming fold
    (streaming/ingest.py:read_resampled), so stream state and batch output
    go through literally the same plan."""
    bounds = agg.groupBy("key").agg(
        F.min("bkt").alias("lo"), F.max("bkt").alias("hi")
    )
    grid = bounds.select(
        "key", F.explode(F.expr("sequence(lo, hi)")).alias("bkt")
    )
    dense = grid.join(agg, ["key", "bkt"], "left").select(
        "key",
        "bkt",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.coalesce("sum_cents", F.lit(0)).cast("long").alias("sum_cents"),
        F.when(
            F.col("n_events").isNotNull(),
            F.round(F.col("sum_cents") / (F.col("n_events") * 100.0), 6),
        ).alias("avg_obs"),
        F.col("n_events").isNull().cast("int").alias("filled"),
    )
    w = W.partitionBy("key").orderBy("bkt")
    return dense.select(
        "key",
        "bkt",
        "n_events",
        "sum_cents",
        F.last("avg_obs", ignorenulls=True).over(w).alias("avg_value"),
        "filled",
    )


def burst_detect(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_us: int = 900_000_000,
    trail: int = 8,
    z_thresh: float = 3.0,
) -> DataFrame:
    """Burst detection over the gap-filled resampled grid: flag buckets
    whose count exceeds the trailing ``trail``-bucket mean by more than
    ``z_thresh`` standard deviations — the rate-anomaly primitive
    (error spikes, crawl floods) that only works on a DENSE grid, which
    is exactly why resample_events zero-fills gaps first.

    Exactness: the trailing window sums counts and squared counts as
    exact integers (ROWS BETWEEN trail PRECEDING AND 1 PRECEDING —
    never the current row, so a burst can't suppress itself); mean and
    variance are then one fixed formula over those integers in double,
    and the flag compares (n - mean)^2 against z^2 * var in that same
    exact-derived arithmetic. Warmup rows (fewer than ``trail``
    predecessors) report is_burst = 0 with null z.

    Scale shape: inherits resample_events' one shuffle on the grouping
    key; the window is per-key ROWS-framed O(1)-state. Output: (key,
    bkt, n_events, trail_n, trail_sum, z, is_burst).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    grid = resample_events(
        events, key_col=key_col, ts_col=ts_col,
        value_col=value_col, bucket_us=bucket_us,
    ).select("key", "bkt", "n_events")
    w = W.partitionBy("key").orderBy("bkt").rowsBetween(-int(trail), -1)
    stats = grid.select(
        "key",
        "bkt",
        "n_events",
        F.count("*").over(w).cast("long").alias("trail_n"),
        F.coalesce(F.sum("n_events").over(w), F.lit(0))
        .cast("long").alias("trail_sum"),
        F.coalesce(F.sum(F.expr("n_events * n_events")).over(w), F.lit(0))
        .cast("long").alias("trail_sumsq"),
    )
    zt = float(z_thresh)
    # NESTED case (not AND): ANSI Spark evaluates both conjuncts of a
    # vectorized AND, so `trail_n >= k AND x / trail_n ...` still divides
    # by zero on warmup rows — the outer branch must remove them first
    var = (
        "(cast(trail_sumsq as double) / trail_n"
        " - (cast(trail_sum as double) / trail_n)"
        "   * (cast(trail_sum as double) / trail_n))"
    )
    zexpr = (
        f"(n_events - cast(trail_sum as double) / trail_n) / sqrt({var})"
    )
    withz = stats.selectExpr(
        "key", "bkt", "n_events", "trail_n", "trail_sum",
        # var = E[x^2] - E[x]^2 over the trailing window, exact-int inputs
        f"case when trail_n >= {int(trail)} then"
        f" case when {var} > 0.0d then round({zexpr}, 6) end"
        f" end as z",
    )
    # the flag derives from the ROUNDED z so both engines compare the
    # identical 6-dp value; null z (warmup / zero variance) -> 0
    return withz.selectExpr(
        "*", f"coalesce(cast(z > {zt!r}d as int), 0) as is_burst"
    )


def weekly_churn(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly active/new/retained/churned user flows — the engagement
    ledger behind every growth dashboard, and the lag/lead-window
    complement to the cohort matrix (sql_retention). A user is NEW in
    their first active week, RETAINED-NEXT if also active the
    immediately following week, CHURNED-NEXT otherwise (the trailing
    calendar week of the data therefore reports everyone as churned —
    the consumer clips the boundary week).

    Exactness: weeks are date_trunc('week') dates (ISO Monday on both
    engines), the next-activity test is lead(wk) == wk + 7 days in date
    arithmetic, and every output is an integer count.

    Scale shape: one distinct on (user, week), one per-user lead window
    (shuffle on user_id, tiny per-user partitions), one weekly rollup —
    no self-join of the activity table against next week.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    uw = events.select(
        F.col(user_col).alias("u"),
        F.date_trunc("week", F.col(ts_col)).cast("date").alias("wk"),
    ).distinct()
    w = W.partitionBy("u").orderBy("wk")
    flags = uw.select(
        "wk",
        (F.row_number().over(w) == 1).cast("int").alias("is_new"),
        (F.lead("wk").over(w) == F.date_add(F.col("wk"), 7))
        .cast("int").alias("is_retained_next"),
    )
    return (
        flags.groupBy(F.date_format("wk", "yyyy-MM-dd").alias("week"))
        .agg(
            F.count("*").cast("long").alias("n_active"),
            F.sum("is_new").cast("long").alias("n_new"),
            F.sum(F.coalesce("is_retained_next", F.lit(0)))
            .cast("long").alias("n_retained_next"),
            (F.count("*") - F.sum(F.coalesce("is_retained_next", F.lit(0))))
            .cast("long").alias("n_churned_next"),
        )
    )


def lag1_autocorr(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_us: int = 900_000_000,
) -> DataFrame:
    """Lag-1 autocorrelation of the per-key bucket-count series over the
    DENSE resampled grid — the is-this-series-bursty-or-white-noise
    diagnostic (near 0: Poisson-ish arrivals; near 1: strong clumping;
    negative: alternation). Computing it on the densified grid matters:
    skipping empty buckets silently deletes every zero from the series
    and biases the estimate upward.

    Exactness: the (x_t, x_{t-1}) pair sums (n, sx, sy, sxy, sxx, syy)
    are exact BIGINTs — counts are small integers, so products stay far
    inside long range — and Pearson r is one fixed integer formula in
    double, 6 dp, with a zero-variance guard (constant series -> null).

    Scale shape: inherits the resample grid's one shuffle on key; the
    lag is a per-key ROWS window; the final aggregate is key-sized.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    grid = resample_events(
        events, key_col=key_col, ts_col=ts_col,
        value_col=value_col, bucket_us=bucket_us,
    ).select("key", "bkt", F.col("n_events").alias("x"))
    w = W.partitionBy("key").orderBy("bkt")
    pairs = grid.select(
        "key", "x", F.lag("x").over(w).alias("y")
    ).filter(F.col("y").isNotNull())
    s = pairs.groupBy("key").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("x * y")).cast("long").alias("sxy"),
        F.sum(F.expr("x * x")).cast("long").alias("sxx"),
        F.sum(F.expr("y * y")).cast("long").alias("syy"),
    )
    return s.selectExpr(
        "key", "n",
        "case when (n * sxx - sx * sx) > 0 and (n * syy - sy * sy) > 0 then"
        " round(cast(n * sxy - sx * sy as double)"
        "  / sqrt(cast(n * sxx - sx * sx as double)"
        "         * cast(n * syy - sy * sy as double)), 6)"
        " end as r1",
    )


def cusum_changepoint(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """CUSUM changepoint score per key: on the zero-filled daily count
    grid (the densify_ffill span discipline — gaps MUST count as zero or
    the statistic is blind to outages), the cumulative sum of deviations
    from the key's mean rate peaks at the most likely level-shift point.
    Reported per key: the peak day, the peak magnitude, and a
    0..1-normalized score (max |C| / (D * T), the fraction-of-mass
    displacement).

    Exactness: the deviation is kept INTEGER by scaling — with D days
    and total T, s_i = n_i * D - T (instead of n_i - T/D), so the
    cumulative sum C_i is an exact BIGINT on both engines; only the
    final normalization is one double divide, 6 dp. Peak day ties break
    to the earliest day (row_number over |C| desc, day asc). Headroom:
    |C_i| <= T * D — fine to ~1e12 events over ~1e4 days; widen to
    decimal beyond that.

    Scale shape: one map-side combinable (key, day) count, a per-key
    grid explode, two key-partitioned windows (grid-sized, never
    event-sized), one top-1 filter. Output: one row per key.
    """
    from pyspark.sql import Window as W

    bus = int(bucket_us)
    e = events.select(
        F.col(key_col).alias("key"),
        F.expr(f"unix_micros(cast({ts_col} as timestamp)) div {bus}")
        .alias("bkt"),
    )
    agg = e.groupBy("key", "bkt").agg(
        F.count("*").cast("long").alias("n")
    )
    return cusum_from_bucket_counts(agg, key_col=key_col, bucket_us=bus)


def cusum_from_bucket_counts(
    agg: DataFrame,
    key_col: str = "event_type",
    bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """The densify + scaled-integer CUSUM back half of
    cusum_changepoint over a pre-aggregated (key, bkt, n) table — shared
    with the streaming fold (streaming/ingest.py:read_cusum), so
    streamed state and batch events go through literally the same plan
    (the densify_ffill discipline)."""
    from pyspark.sql import Window as W

    bus = int(bucket_us)
    bounds = agg.groupBy("key").agg(
        F.min("bkt").alias("lo"), F.max("bkt").alias("hi")
    )
    grid = bounds.select(
        "key", F.explode(F.expr("sequence(lo, hi)")).alias("bkt")
    )
    dense = grid.join(agg, ["key", "bkt"], "left").select(
        "key", "bkt", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
    wk = W.partitionBy("key")
    wcum = (
        W.partitionBy("key").orderBy("bkt")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    sized = dense.select(
        "key",
        "bkt",
        "n",
        F.count("*").over(wk).cast("long").alias("d"),
        F.sum("n").over(wk).cast("long").alias("t"),
    )
    scored = sized.select(
        "key",
        "bkt",
        "d",
        "t",
        F.sum(F.expr("n * d - t")).over(wcum).cast("long").alias("c"),
    )
    wpk = W.partitionBy("key").orderBy(
        F.abs(F.col("c")).desc(), F.col("bkt").asc()
    )
    top = scored.withColumn("rn", F.row_number().over(wpk)).filter(
        F.col("rn") == 1
    )
    return top.select(
        F.col("key").alias(key_col),
        F.date_format(
            F.expr(f"timestamp_micros(bkt * {bus})"), "yyyy-MM-dd"
        ).alias("peak_day"),
        F.col("d").alias("n_days"),
        F.col("t").alias("total"),
        F.abs(F.col("c")).cast("long").alias("cusum_abs_max"),
        F.round(
            F.abs(F.col("c"))
            / (F.col("d").cast("double") * F.col("t")), 6
        ).alias("score"),
    )


def ewma_daily(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    span_days: int = 32,
    bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """Exponentially weighted moving average of daily counts with decay
    1/2 per day over a trailing ``span_days`` window — the trend
    smoother. Weights are EXACT powers of two (2^(span-1-lag), integer
    shiftleft), so the weighted sum S and weight mass W are exact
    BIGINTs on both engines and the EWMA is one final divide (6 dp) —
    no float power chains whose libm rounding could differ.

    Scale shape: the SCATTER formulation — each dense day row emits its
    contribution to the next ``span_days`` buckets (a constant 32x
    map-side fan-out), then ONE groupBy((key, bucket)) sums S and W.
    No banded range self-join, no window over an unbounded frame; the
    truncated head windows are handled for free because only existing
    rows scatter. Headroom: S <= max_daily_n * 2^span — keep
    span_days <= 32 so BIGINT holds to ~1e9 events/day/key.
    """
    from pyspark.sql import Window as W

    bus, span = int(bucket_us), int(span_days)
    e = events.select(
        F.col(key_col).alias("key"),
        F.expr(f"unix_micros(cast({ts_col} as timestamp)) div {bus}")
        .alias("bkt"),
    )
    agg = e.groupBy("key", "bkt").agg(
        F.count("*").cast("long").alias("n")
    )
    bounds = agg.groupBy("key").agg(
        F.min("bkt").alias("lo"), F.max("bkt").alias("hi")
    )
    grid = bounds.select(
        "key", "hi", F.explode(F.expr("sequence(lo, hi)")).alias("bkt")
    )
    dense = grid.join(agg, ["key", "bkt"], "left").select(
        "key", "hi", "bkt",
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
    )
    scattered = dense.select(
        "key",
        "n",
        "bkt",
        F.explode(F.expr(f"sequence(0, {span - 1})")).alias("lag"),
        "hi",
    ).select(
        "key",
        (F.col("bkt") + F.col("lag")).alias("t_bkt"),
        F.expr(f"shiftleft(cast(1 as bigint), {span - 1} - lag)")
        .alias("w"),
        "n",
        "hi",
        F.col("bkt").alias("src_bkt"),
    ).filter(F.col("t_bkt") <= F.col("hi"))
    out = scattered.groupBy("key", "t_bkt").agg(
        F.sum(F.expr("n * w")).cast("long").alias("s"),
        F.sum("w").cast("long").alias("wsum"),
        F.max(
            F.when(F.col("src_bkt") == F.col("t_bkt"), F.col("n"))
        ).cast("long").alias("n"),
    )
    return out.select(
        F.col("key").alias(key_col),
        F.date_format(
            F.expr(f"timestamp_micros(t_bkt * {bus})"), "yyyy-MM-dd"
        ).alias("day"),
        "n",
        F.round(F.col("s") / F.col("wsum").cast("double"), 6)
        .alias("ewma"),
    )
