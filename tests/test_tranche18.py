"""Unit tests for the tranche-18 operators: two-feature closed-form
regression and the streamed line-dedup fold."""

import pyspark.sql.functions as F

from knowledgegraphbuilder_spark.operators.dedup import line_dedup_stats
from knowledgegraphbuilder_spark.operators.mlstats import grouped_ols2


class TestOLS2:
    def test_exact_plane_recovered(self, spark):
        # y = 3*x1 + 2*x2 + 5 exactly, over a non-collinear design
        rows = [("g", x1, x2, 3 * x1 + 2 * x2 + 5)
                for x1 in range(1, 5) for x2 in range(1, 4)]
        df = spark.createDataFrame(rows, "grp string, a long, b long, c long")
        r = grouped_ols2(df, "a", "b", "c", "grp").collect()[0]
        assert abs(r["b1"] - 3.0) < 1e-9
        assert abs(r["b2"] - 2.0) < 1e-9
        assert abs(r["intercept"] - 5.0) < 1e-9

    def test_collinear_features_null(self, spark):
        # x2 = 2*x1: the normal matrix is singular -> null coefficients
        rows = [("g", x, 2 * x, x + 1) for x in range(1, 6)]
        df = spark.createDataFrame(rows, "grp string, a long, b long, c long")
        r = grouped_ols2(df, "a", "b", "c", "grp").collect()[0]
        assert r["b1"] is None and r["b2"] is None


class TestStreamLines:
    def test_stream_equals_batch_doc_ordered(self, spark, tmp_path):
        from knowledgegraphbuilder_spark.streaming.ingest import (
            line_dedup_stats_from_state,
            run_line_dedup_available_now,
        )

        docs = spark.createDataFrame(
            [(0, "a b c d"), (1, "a b x y"), (2, "x y c d"), (3, "p q r s")],
            "doc_id long, text string",
        )
        base = str(tmp_path / "sl")
        for i, (lo, hi) in enumerate([(0, 2), (2, 3), (3, 4)]):
            (docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
             .coalesce(1).write.parquet(f"{base}/in/b{i}"))
        run_line_dedup_available_now(
            spark, f"{base}/in/*", f"{base}/st", f"{base}/ck",
            words_per_line=2)
        # replay: first-wins MERGE must be a no-op
        run_line_dedup_available_now(
            spark, f"{base}/in/*", f"{base}/st", f"{base}/ck2",
            words_per_line=2)
        got = sorted(
            line_dedup_stats_from_state(
                spark, f"{base}/st", docs, words_per_line=2).collect(),
            key=lambda r: r["doc_id"],
        )
        want = sorted(
            line_dedup_stats(docs, words_per_line=2).collect(),
            key=lambda r: r["doc_id"],
        )
        assert [tuple(r) for r in got] == [tuple(r) for r in want]
