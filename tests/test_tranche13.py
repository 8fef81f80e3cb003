"""Unit + invariant tests for the tranche-13 operators: classifier
metrics, lag-1 autocorrelation, last-touch attribution, time-to-convert.
DuckDB value-exactness is pinned by ``tools/check_contract.py``."""

import datetime

from knowledgegraphbuilder_spark.operators.mlstats import classifier_metrics
from knowledgegraphbuilder_spark.operators.timeseries import lag1_autocorr


class TestClassifierMetrics:
    def _m(self, spark, rows):
        df = spark.createDataFrame(rows, "label string, pred string")
        return {r["cls"]: r for r in classifier_metrics(df).collect()}

    def test_hand_computed(self, spark):
        # a: tp=2, fn=1 (pred b), fp=1 (true b pred a)
        out = self._m(spark, [("a", "a"), ("a", "a"), ("a", "b"),
                              ("b", "a"), ("b", "b")])
        a = out["a"]
        assert (a["tp"], a["n_true"], a["n_pred"]) == (2, 3, 3)
        assert abs(a["precision"] - round(2 / 3, 6)) < 1e-9
        assert abs(a["recall"] - round(2 / 3, 6)) < 1e-9
        assert abs(a["f1"] - round(2 * 2 / 6, 6)) < 1e-9

    def test_hallucinated_class_surfaces(self, spark):
        # 'c' never appears as a true label but is predicted once
        out = self._m(spark, [("a", "c"), ("a", "a")])
        c = out["c"]
        assert (c["tp"], c["n_true"], c["n_pred"]) == (0, 0, 1)
        assert c["precision"] == 0.0 and c["recall"] == 0.0

    def test_never_predicted_class(self, spark):
        out = self._m(spark, [("a", "b"), ("b", "b")])
        a = out["a"]
        assert (a["n_pred"], a["recall"], a["precision"]) == (0, 0.0, 0.0)


class TestAutocorr:
    def _ev(self, spark, counts):
        # counts[i] events in bucket i (15-min buckets)
        rows = []
        eid = 0
        for b, c in enumerate(counts):
            for _ in range(c):
                rows.append((eid, datetime.datetime(2024, 1, 1)
                             + datetime.timedelta(minutes=15 * b), 1.0))
                eid += 1
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, value double"
        ).selectExpr("'a' as event_type", "ts", "value")

    def test_alternating_series_negative(self, spark):
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        r = lag1_autocorr(self._ev(spark, [1, 3, 1, 3, 1, 3, 1, 3])).collect()
        assert len(r) == 1 and r[0]["n"] == 7
        # strict alternation: r1 is strongly negative
        assert r[0]["r1"] < -0.9

    def test_constant_series_is_null(self, spark):
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        r = lag1_autocorr(self._ev(spark, [2, 2, 2, 2])).collect()
        assert r[0]["r1"] is None

    def test_zero_buckets_enter_the_series(self, spark):
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # buckets [1, 0, 1, 0, 1]: without densification there are no
        # zeros and lag-1 pairs would all be (1,1) -> null; with it,
        # alternation gives r1 = -1
        r = lag1_autocorr(self._ev(spark, [1, 0, 1, 0, 1])).collect()
        assert abs(r[0]["r1"] + 1.0) < 1e-6
