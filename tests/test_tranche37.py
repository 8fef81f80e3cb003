"""Unit tests for the tranche-37 operators: cross-corpus incremental
dedup and the KMV distinct-count sketch."""

from knowledgegraphbuilder_spark.operators.dedup import cross_dedup
from knowledgegraphbuilder_spark.operators.sketches import kmv_estimate


class TestCrossDedup:
    DOCS = [
        # base corpus
        ("b1", "the quick brown fox jumps over the lazy dog today", "base"),
        ("b2", "completely unrelated base content about spark sql", "base"),
        # incoming shard
        ("i1", "the quick brown fox jumps over the lazy dog today", "in"),
        ("i2", "the quick brown fox jumps over the lazy dog tonight", "in"),
        ("i3", "fresh incoming document with brand new words", "in"),
        ("i4", "fresh incoming document with brand new words", "in"),
    ]

    def test_exact_near_and_intra_shard_policy(self, spark):
        df = spark.createDataFrame(
            self.DOCS, "doc_id string, text string, side string"
        )
        out = {r["doc_id"]: (r["kept"], r["reason"])
               for r in cross_dedup(df, threshold=0.5).collect()}
        assert out["i1"] == (0, "exact")      # byte-identical to b1
        assert out["i2"][0] == 0 and out["i2"][1] == "near"  # 1-word edit
        # i3/i4 are intra-shard exact dups of each other but match no
        # base doc -> BOTH kept (cross-corpus only, by policy)
        assert out["i3"] == (1, None) and out["i4"] == (1, None)
        assert set(out) == {"i1", "i2", "i3", "i4"}  # base never output


class TestKmv:
    def test_exact_below_k(self, spark):
        rows = [(i,) for i in range(100)]
        df = spark.createDataFrame(rows, "user_id long")
        r = kmv_estimate(df, "user_id", k=256).collect()[0]
        assert r["k_used"] == 100
        assert r["n_est"] == 100.0 and r["n_exact"] == 100
        assert r["rel_err"] == 0.0

    def test_estimator_within_sketch_error_above_k(self, spark):
        n = 5000
        rows = [(i,) for i in range(n)]
        df = spark.createDataFrame(rows, "user_id long")
        r = kmv_estimate(df, "user_id", k=256).collect()[0]
        assert r["k_used"] == 256 and r["n_exact"] == n
        # KMV relative error ~ 1/sqrt(k-2) ~ 6.3%; allow 4 sigma
        assert r["rel_err"] < 0.25

    def test_duplicates_do_not_inflate(self, spark):
        rows = [(i % 50,) for i in range(1000)]
        df = spark.createDataFrame(rows, "user_id long")
        r = kmv_estimate(df, "user_id", k=256).collect()[0]
        assert r["n_exact"] == 50 and r["n_est"] == 50.0


class TestStreamKmv:
    def test_streamed_fold_equals_batch_sketch(self, spark, tmp_path):
        import datetime

        import pyspark.sql.functions as F

        from knowledgegraphbuilder_spark.operators.sketches import (
            kmv_estimate,
        )
        from knowledgegraphbuilder_spark.streaming.ingest import (
            read_kmv, run_kmv_available_now,
        )

        rows = [
            (i, datetime.datetime(2024, 1, 1 + i % 5), i % 700,
             "view", 1.0, "{}")
            for i in range(1, 2001)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double, props string"
        )
        base = str(tmp_path / "kmv")
        for i, (lo, hi) in enumerate([(0, 600), (600, 1400), (1400, 2001)]):
            (df.filter((F.col("event_id") > lo) & (F.col("event_id") <= hi))
             .coalesce(1).write.parquet(f"{base}/in/b{i}"))
        run_kmv_available_now(
            spark, f"{base}/in/*", f"{base}/st", f"{base}/ck", k=64)
        # replay against a fresh checkpoint: MERGE must be idempotent
        run_kmv_available_now(
            spark, f"{base}/in/*", f"{base}/st", f"{base}/ck2", k=64)
        got = tuple(read_kmv(spark, f"{base}/st", df, k=64).collect()[0])
        want = tuple(kmv_estimate(df, "user_id", k=64).collect()[0])
        assert got == want
        assert want[3] == 700  # n_exact sanity
