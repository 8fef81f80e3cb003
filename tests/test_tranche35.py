"""Unit tests for the tranche-35 operators: Wald-Wolfowitz runs test
and 3-step path mining — both exercised through the same window plans
the registry queries use."""

import datetime

import pyspark.sql.functions as F
from pyspark.sql import Window as W


def _day(d):
    return datetime.datetime(2024, 1, d, 12, 0, 0)


def _runs_stats(spark, daily_counts):
    """Replicates q_ts_runs' plan on an explicit daily count list."""
    rows = []
    for d, n in enumerate(daily_counts, start=1):
        rows += [("a", _day(d))] * n
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    e = df.select(
        F.col("event_type").alias("key"),
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
        .alias("bkt"),
    )
    agg = e.groupBy("key", "bkt").agg(F.count("*").cast("long").alias("n"))
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
    signed = dense.select(
        "key", "bkt",
        ((F.col("n") * F.count("*").over(wk)) > F.sum("n").over(wk))
        .cast("int").alias("s"),
    )
    wo = W.partitionBy("key").orderBy("bkt")
    runs = signed.select(
        "key", "s",
        F.when(
            F.lag("s").over(wo).isNull()
            | (F.lag("s").over(wo) != F.col("s")), 1
        ).otherwise(0).alias("newrun"),
    )
    r = runs.groupBy("key").agg(
        F.sum("s").cast("long").alias("n_plus"),
        (F.count("*") - F.sum("s")).cast("long").alias("n_minus"),
        F.sum("newrun").cast("long").alias("runs"),
    ).collect()[0]
    return r["n_plus"], r["n_minus"], r["runs"]


class TestRuns:
    def test_alternating_series_maximizes_runs(self, spark):
        # grid spans the OBSERVED [first, last] days: trailing zero day
        # is clipped, so counts are 4,0,...,4 over 9 days; mean 20/9 ->
        # sign flips every day -> 9 runs
        counts = [4, 0] * 5
        n_plus, n_minus, runs = _runs_stats(spark, counts)
        assert (n_plus, n_minus) == (5, 4)
        assert runs == 9

    def test_block_series_has_two_runs(self, spark):
        counts = [1] * 5 + [4] * 5
        n_plus, n_minus, runs = _runs_stats(spark, counts)
        assert (n_plus, n_minus) == (5, 5)
        assert runs == 2

    def test_gap_days_join_the_below_side(self, spark):
        # day 2 missing entirely -> zero-filled, counts [9, 0, 3]:
        # mean 4 -> signs (1, 0, 0) -> 2 runs
        counts = [9, 0, 3]
        n_plus, n_minus, runs = _runs_stats(spark, counts)
        assert (n_plus, n_minus, runs) == (1, 2, 2)


class TestPathFunnel:
    def test_triples_respect_user_boundaries_and_order(self, spark):
        rows = [
            ("u1", _day(1), 1, "view"),
            ("u1", _day(2), 2, "click"),
            ("u1", _day(3), 3, "purchase"),
            ("u1", _day(4), 4, "view"),
            ("u2", _day(1), 5, "view"),
            ("u2", _day(2), 6, "click"),  # only 2 events -> no triple
        ]
        df = spark.createDataFrame(
            rows, "user_id string, ts timestamp, event_id long, "
                  "event_type string"
        )
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        tri = df.select(
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        ).filter(F.col("e3").isNotNull())
        got = {(r["e1"], r["e2"], r["e3"]) for r in tri.collect()}
        assert got == {
            ("view", "click", "purchase"),
            ("click", "purchase", "view"),
        }
