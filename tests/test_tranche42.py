"""Unit tests for the tranche-42 operators: sample-ratio-mismatch
guard and per-source modality mix."""

import pyspark.sql.functions as F


class TestSrm:
    def test_balanced_split_z_small(self, spark):
        rows = [(i, i % 2) for i in range(1000)]
        df = spark.createDataFrame(rows, "user_id long, a long")
        r = df.agg(
            F.count("*").cast("long").alias("n"),
            F.sum("a").cast("long").alias("n_a"),
        ).selectExpr(
            "n", "n_a",
            "round((cast(n_a as double) - cast(n as double) / 2.0d)"
            " / nullif(sqrt(cast(n as double) / 4.0d), 0.0d), 6) as z",
        ).collect()[0]
        assert r["z"] == 0.0

    def test_dropped_arm_is_flagged(self, spark):
        # 900 vs 100: z = (900 - 500) / sqrt(250) ~ 25 sigma
        rows = [(i, 1 if i < 900 else 0) for i in range(1000)]
        df = spark.createDataFrame(rows, "user_id long, a long")
        r = df.agg(
            F.count("*").cast("long").alias("n"),
            F.sum("a").cast("long").alias("n_a"),
        ).selectExpr(
            "round((cast(n_a as double) - cast(n as double) / 2.0d)"
            " / sqrt(cast(n as double) / 4.0d), 6) as z",
        ).collect()[0]
        assert r["z"] > 20


class TestModalityMix:
    def test_shares_on_synthesized_spans(self, spark, tmp_path):
        from knowledgegraphbuilder_spark.sources.interleaved import (
            synthesize_spans,
        )

        # doc_id % 5 == 0 -> image; % 10 == 0 -> image + audio
        docs = spark.createDataFrame(
            [(i, "w " * 30 + "end") for i in range(20)],
            "doc_id long, text string",
        )
        spans = synthesize_spans(docs)
        ex = spans.select(
            "doc_id", F.explode("spans").alias("s")
        ).select("doc_id", F.col("s.kind").alias("kind"))
        per = ex.groupBy("doc_id").agg(
            F.sum(F.expr("cast(kind = 'image' as int)")).alias("img"),
            F.sum(F.expr("cast(kind = 'audio' as int)")).alias("aud"),
        )
        n_img = per.filter("img > 0").count()
        n_aud = per.filter("aud > 0").count()
        assert n_img == 4   # doc 0, 5, 10, 15
        assert n_aud == 2   # doc 0, 10
