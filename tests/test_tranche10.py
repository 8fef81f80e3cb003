"""Unit + invariant tests for the tranche-10 operators: line-level
dedup, Zipf fit, Simpson diversity, time-series resample, decision
stump. Value-exactness vs DuckDB is pinned by ``tools/check_contract.py``;
these pin the hand-checkable algebra and the degenerate inputs."""

import datetime
import math

import pyspark.sql.functions as F

from knowledgegraphbuilder_spark.operators.dedup import line_dedup_stats
from knowledgegraphbuilder_spark.operators.mlstats import decision_stump
from knowledgegraphbuilder_spark.operators.textstats import (
    simpson_diversity,
    zipf_fit,
)
from knowledgegraphbuilder_spark.operators.timeseries import resample_events


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestLineDedup:
    def test_cross_doc_duplicate_lines_removed(self, spark):
        # words_per_line=2 -> doc 0 = [a b][c d], doc 1 = [a b][x y];
        # doc 1's first line is a dup of doc 0's first line
        out = {
            r["doc_id"]: (r["n_lines"], r["n_kept"], r["n_removed"])
            for r in line_dedup_stats(
                _docs(spark, [(0, "a b c d"), (1, "a b x y")]),
                words_per_line=2,
            ).collect()
        }
        assert out == {0: (2, 2, 0), 1: (2, 1, 1)}

    def test_first_occurrence_is_by_doc_then_line(self, spark):
        # the same line twice WITHIN one doc: second copy removed
        out = {
            r["doc_id"]: (r["n_kept"], r["n_removed"])
            for r in line_dedup_stats(
                _docs(spark, [(7, "a b a b")]), words_per_line=2
            ).collect()
        }
        assert out == {7: (1, 1)}

    def test_ragged_tail_line_counts(self, spark):
        # 5 words at width 2 -> 3 lines, last is the 1-word tail
        out = line_dedup_stats(
            _docs(spark, [(1, "a b c d e")]), words_per_line=2
        ).collect()[0]
        assert out["n_lines"] == 3 and out["n_removed"] == 0

    def test_null_text_contributes_no_lines(self, spark):
        out = line_dedup_stats(
            _docs(spark, [(1, None), (2, "a b")]), words_per_line=2
        ).collect()
        assert {r["doc_id"] for r in out} == {2}


class TestZipf:
    def test_exact_two_point_fit(self, spark):
        # freqs 4 and 2 at ranks 1, 2: slope = (ln2 - ln4)/(ln2 - ln1)
        docs = _docs(spark, [(0, "w w w w v v")])
        row = zipf_fit(docs, top_r=10).collect()[0]
        slope = (math.log(2) - math.log(4)) / (math.log(2) - math.log(1))
        assert row["n_points"] == 2
        assert abs(row["slope"] - round(slope, 6)) < 1e-9
        assert abs(row["r2"] - 1.0) < 1e-9  # two points fit exactly
        # intercept = ln(4) at rank 1 (x = 0)
        assert abs(row["intercept"] - round(math.log(4), 6)) < 1e-9

    def test_rank_tie_break_is_by_word(self, spark):
        # equal counts: rank order must be alphabetical, so the fit is
        # deterministic — just assert it runs and slope is 0 for a
        # uniform distribution
        docs = _docs(spark, [(0, "b a c b a c")])
        row = zipf_fit(docs, top_r=3).collect()[0]
        assert row["n_points"] == 3 and abs(row["slope"]) < 1e-9


class TestSimpson:
    def test_hand_computed(self, spark):
        df = spark.createDataFrame(
            [("s", "en")] * 3 + [("s", "de")], "source string, lang string"
        )
        row = simpson_diversity(df).collect()[0]
        # n=4, sum c^2 = 9 + 1 = 10 -> D = 1 - 10/16 = 0.375, inv = 1.6
        assert row["n"] == 4 and row["n_classes"] == 2
        assert abs(row["simpson"] - 0.375) < 1e-9
        assert abs(row["inv_simpson"] - 1.6) < 1e-9

    def test_single_class_is_zero_diversity(self, spark):
        df = spark.createDataFrame(
            [("s", "en")] * 5, "source string, lang string"
        )
        row = simpson_diversity(df).collect()[0]
        assert row["simpson"] == 0.0 and row["inv_simpson"] == 1.0


class TestResample:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            [
                (k, datetime.datetime(2024, 1, 1) +
                 datetime.timedelta(minutes=m), v)
                for (k, m, v) in rows
            ],
            "event_type string, ts timestamp, value double",
        )

    def test_gap_zero_fill_and_ffill(self, spark):
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # buckets 0 and 2 observed, bucket 1 is a gap (15-min width)
        e = self._events(spark, [("a", 0, 1.00), ("a", 1, 3.00),
                                 ("a", 40, 5.00)])
        out = sorted(
            resample_events(e).collect(), key=lambda r: r["bkt"]
        )
        assert len(out) == 3
        b0, b1, b2 = out
        assert (b0["n_events"], b0["sum_cents"], b0["filled"]) == (2, 400, 0)
        assert abs(b0["avg_value"] - 2.0) < 1e-9
        assert (b1["n_events"], b1["sum_cents"], b1["filled"]) == (0, 0, 1)
        assert abs(b1["avg_value"] - 2.0) < 1e-9  # carried forward
        assert (b2["n_events"], b2["filled"]) == (1, 0)
        assert abs(b2["avg_value"] - 5.0) < 1e-9

    def test_keys_are_independent_grids(self, spark):
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        e = self._events(spark, [("a", 0, 1.0), ("a", 40, 1.0),
                                 ("b", 100, 2.0)])
        out = resample_events(e).collect()
        assert sum(1 for r in out if r["key"] == "a") == 3
        assert sum(1 for r in out if r["key"] == "b") == 1


class TestStump:
    def test_perfectly_separable(self, spark):
        # x <= 2 -> all positive, x > 2 -> all negative; gain = parent
        # gini = 0.5 at threshold 2
        df = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 0), (4, 0)], "x long, y int"
        )
        row = decision_stump(df, x_expr="x", label_expr="y").collect()[0]
        assert row["threshold"] == 2
        assert (row["n_left"], row["pos_left"]) == (2, 2)
        assert (row["n_right"], row["pos_right"]) == (2, 0)
        assert abs(row["gini_gain"] - 0.5) < 1e-9

    def test_uninformative_feature_gain_zero(self, spark):
        # label independent of x: every split has zero gain; tie-break
        # picks the smallest threshold
        df = spark.createDataFrame(
            [(1, 1), (1, 0), (2, 1), (2, 0)], "x long, y int"
        )
        row = decision_stump(df, x_expr="x", label_expr="y").collect()[0]
        assert row["threshold"] == 1 and abs(row["gini_gain"]) < 1e-9
