"""Unit tests for the tranche-30 operators: scaled-integer CUSUM
changepoint and the per-user event-type transition matrix."""

import datetime

from knowledgegraphbuilder_spark.operators.timeseries import (
    cusum_changepoint,
)


def _day(d):
    return datetime.datetime(2024, 1, d, 12, 0, 0)


class TestCusum:
    def test_level_shift_peaks_at_the_shift(self, spark):
        # 6 days at rate 1, then 6 days at rate 5: CUSUM peaks at the
        # last low day (day 6)
        rows = []
        for d in range(1, 7):
            rows += [("a", _day(d))] * 1
        for d in range(7, 13):
            rows += [("a", _day(d))] * 5
        df = spark.createDataFrame(rows, "event_type string, ts timestamp")
        r = cusum_changepoint(df).collect()[0]
        assert r["n_days"] == 12 and r["total"] == 36
        assert r["peak_day"] == "2024-01-06"
        # C_6 = sum over first 6 days of (1*12 - 36) = 6 * -24 = -144
        assert r["cusum_abs_max"] == 144
        assert r["score"] == round(144 / (12 * 36), 6)

    def test_gap_days_count_as_zero(self, spark):
        # events on days 1 and 11 only: the grid must include the gap,
        # giving D=11, and the peak lands inside the gap
        rows = [("a", _day(1))] * 10 + [("a", _day(11))]
        df = spark.createDataFrame(rows, "event_type string, ts timestamp")
        r = cusum_changepoint(df).collect()[0]
        assert r["n_days"] == 11 and r["total"] == 11
        # day 1: 10*11-11 = 99; days 2..10 add -11 each; max |C| is 99
        # at day 1
        assert r["cusum_abs_max"] == 99 and r["peak_day"] == "2024-01-01"

    def test_constant_rate_peak_is_zero_everywhere(self, spark):
        rows = [("a", _day(d)) for d in range(1, 8)]
        df = spark.createDataFrame(rows, "event_type string, ts timestamp")
        r = cusum_changepoint(df).collect()[0]
        # n_i*D - T = 7 - 7 = 0 every day -> max |C| = 0, earliest day
        assert r["cusum_abs_max"] == 0 and r["peak_day"] == "2024-01-01"
        assert r["score"] == 0.0


class TestTransitions:
    def test_counts_and_row_normalization(self, spark):
        import pyspark.sql.functions as F
        from pyspark.sql import Window as W

        rows = [
            ("u1", _day(1), 1, "view"),
            ("u1", _day(2), 2, "click"),
            ("u1", _day(3), 3, "view"),
            ("u2", _day(1), 4, "view"),
            ("u2", _day(2), 5, "click"),
            ("u3", _day(1), 6, "view"),  # terminal — no transition
        ]
        df = spark.createDataFrame(
            rows, "user_id string, ts timestamp, event_id long, "
                  "event_type string"
        )
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        tr = df.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        ).filter(F.col("to_type").isNotNull())
        cnt = {(r["from_type"], r["to_type"]): r["n"]
               for r in tr.groupBy("from_type", "to_type")
                          .agg(F.count("*").cast("long").alias("n"))
                          .collect()}
        assert cnt == {("view", "click"): 2, ("click", "view"): 1}
