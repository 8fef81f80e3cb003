"""Unit tests for the tranche-31 operators: exact binary-decay EWMA
(scatter formulation) and SCD Type-2 history intervals."""

import datetime

from knowledgegraphbuilder_spark.operators.timeseries import ewma_daily


def _day(d, h=12):
    return datetime.datetime(2024, 1, d, h, 0, 0)


class TestEwma:
    def test_matches_brute_force_weights(self, spark):
        # counts [3, 0, 6, 1] on days 1..4 (day 2 is a gap the grid must
        # zero-fill)
        rows = [("a", _day(1))] * 3 + [("a", _day(3))] * 6 + [("a", _day(4))]
        df = spark.createDataFrame(rows, "event_type string, ts timestamp")
        got = {r["day"]: (r["n"], r["ewma"])
               for r in ewma_daily(df).collect()}
        counts = [3, 0, 6, 1]

        def brute(t):
            s = w = 0
            for lag in range(0, min(t + 1, 32)):
                wt = 1 << (31 - lag)
                s += counts[t - lag] * wt
                w += wt
            return round(s / w, 6)

        assert got["2024-01-01"] == (3, brute(0))
        assert got["2024-01-02"] == (0, brute(1))
        assert got["2024-01-03"] == (6, brute(2))
        assert got["2024-01-04"] == (1, brute(3))

    def test_first_day_ewma_equals_count(self, spark):
        rows = [("a", _day(1))] * 5
        df = spark.createDataFrame(rows, "event_type string, ts timestamp")
        r = ewma_daily(df).collect()[0]
        assert r["n"] == 5 and r["ewma"] == 5.0

    def test_keys_do_not_leak_into_each_other(self, spark):
        rows = [("a", _day(1))] * 4 + [("b", _day(1))] * 2 + [("b", _day(2))]
        df = spark.createDataFrame(rows, "event_type string, ts timestamp")
        got = {(r["event_type"], r["day"]): r["ewma"]
               for r in ewma_daily(df).collect()}
        assert got[("a", "2024-01-01")] == 4.0
        assert got[("b", "2024-01-01")] == 2.0
        # b day2: (1*2^31 + 2*2^30) / (2^31 + 2^30) = 4/3
        assert got[("b", "2024-01-02")] == round(4 / 3, 6)


class TestScd2:
    def test_intervals_versions_and_current_flag(self, spark):
        import pyspark.sql.functions as F
        from pyspark.sql import Window as W

        rows = [
            ("u1", _day(1), 1, "view"),
            ("u1", _day(2), 2, "view"),    # same regime — not a change
            ("u1", _day(3), 3, "click"),   # change
            ("u1", _day(4), 4, "view"),    # change back
        ]
        df = spark.createDataFrame(
            rows, "user_id string, ts timestamp, event_id long, "
                  "event_type string"
        )
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        marked = df.select(
            "user_id", "ts", "event_id", "event_type",
            F.lag("event_type").over(w).alias("prev"),
        ).filter(F.col("prev").isNull() | (F.col("event_type") != F.col("prev")))
        out = marked.select(
            F.col("event_type").alias("segment"),
            F.lead("ts").over(w).alias("valid_to"),
            F.row_number().over(w).alias("version"),
        ).orderBy("version").collect()
        assert [r["segment"] for r in out] == ["view", "click", "view"]
        assert [r["version"] for r in out] == [1, 2, 3]
        # the in-regime repeat (day 2) must NOT close the first interval
        assert out[0]["valid_to"] == _day(3)
        assert out[-1]["valid_to"] is None
