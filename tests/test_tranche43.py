"""Unit tests for the tranche-43 operators: NDCG@k, calibration bins,
taxonomy tagging."""

import hashlib
import math

import pyspark.sql.functions as F

from knowledgegraphbuilder_spark.operators.mlstats import (
    calibration_bins,
    ndcg_at_k,
)
from knowledgegraphbuilder_spark.operators.textstats import taxonomy_tags


class TestNdcg:
    def test_known_answer(self, spark):
        rows = [("a", 1, 100, 0), ("a", 2, 90, 3), ("a", 3, 80, 1)]
        df = spark.createDataFrame(
            rows, "group string, doc_id long, score long, grade long"
        )
        r = ndcg_at_k(df, k=10).collect()[0]
        dcg = 0 / math.log2(2) + 7 / math.log2(3) + 1 / math.log2(4)
        idcg = 7 / math.log2(2) + 1 / math.log2(3) + 0 / math.log2(4)
        assert r["n_docs"] == 3
        assert r["dcg"] == round(dcg, 6)
        assert r["idcg"] == round(idcg, 6)
        assert r["ndcg"] == round(dcg / idcg, 6)

    def test_perfect_ranking_is_one(self, spark):
        # score order == grade order -> DCG == IDCG
        rows = [("a", i, 100 - i, 3 - i) for i in range(4)]
        df = spark.createDataFrame(
            rows, "group string, doc_id long, score long, grade long"
        )
        r = ndcg_at_k(df, k=10).collect()[0]
        assert r["ndcg"] == 1.0

    def test_k_cutoff_ignores_tail(self, spark):
        # rows past position k contribute nothing to either sum
        head = [("a", i, 1000 - i, 1) for i in range(10)]
        tail = [("a", 100 + i, 10 - i, 1) for i in range(5)]
        df = spark.createDataFrame(
            head + tail, "group string, doc_id long, score long, grade long"
        )
        r = ndcg_at_k(df, k=10).collect()[0]
        want = sum(1 / math.log2(p + 1) for p in range(1, 11))
        assert r["dcg"] == round(want, 6)
        assert r["ndcg"] == 1.0


class TestCalibration:
    def test_hand_computed_bins(self, spark):
        # bin 0: pi in {10, 20}, y = {1, 0}; bin 9: pi = 950, y = 1
        rows = [(10, 1), (20, 0), (950, 1)]
        df = spark.createDataFrame(rows, "pi long, y long")
        out = {
            r["bin"]: r
            for r in calibration_bins(df, "pi", "y").collect()
        }
        b0 = out[0]
        assert b0["n"] == 2
        assert b0["mean_p"] == round(30 / (999 * 2), 6)
        assert b0["frac_pos"] == 0.5
        brier0 = ((10 / 999 - 1) ** 2 + (20 / 999 - 0) ** 2) / 2
        assert b0["brier"] == round(brier0, 6)
        b9 = out[9]
        assert b9["n"] == 1
        assert b9["brier"] == round((950 / 999 - 1) ** 2, 6)

    def test_perfect_classifier_brier_zero(self, spark):
        rows = [(999, 1), (0, 0)]
        df = spark.createDataFrame(rows, "pi long, y long")
        for r in calibration_bins(df, "pi", "y").collect():
            assert r["brier"] == 0.0


class TestTaxonomy:
    def test_topics_are_salted_hash_buckets(self, spark):
        docs = spark.createDataFrame(
            [(i, "alpha beta gamma") for i in range(5)]
            + [(10, "alpha delta")],
            "doc_id long, text string",
        )
        out = taxonomy_tags(docs, n_keywords=4, n_topics=6)
        rows = out.collect()

        def topic(w):
            h = hashlib.sha256(f"tax-v1{w}".encode()).hexdigest()
            return int(h[:15], 16) % 6

        # alpha appears in 6 docs; beta/gamma in 5; delta in 1
        want_docs = {}
        for w, n in [("alpha", 6), ("beta", 5), ("gamma", 5), ("delta", 1)]:
            want_docs.setdefault(topic(w), set())
        by_topic = {r["topic"]: r for r in rows}
        assert set(by_topic) == set(want_docs)
        # every doc contains alpha -> alpha's topic covers all 6 docs
        assert by_topic[topic("alpha")]["n_docs"] == 6
        assert by_topic[topic("alpha")]["doc_share"] == 1.0

    def test_short_and_nonalpha_tokens_excluded(self, spark):
        docs = spark.createDataFrame(
            [(0, "abc de19 ok!! wordy wordy")], "doc_id long, text string"
        )
        out = taxonomy_tags(docs, n_keywords=10).collect()
        assert sum(r["n_keywords"] for r in out) == 1  # only "wordy"
