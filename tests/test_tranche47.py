"""Unit tests for the tranche-47 eval/curation stats: Cohen's kappa,
McNemar's paired test, per-group duplicate exposure."""

from knowledgegraphbuilder_spark.operators.dedup import dup_rate_by_group
from knowledgegraphbuilder_spark.operators.mlstats import (
    cohens_kappa,
    mcnemar,
)


class TestKappa:
    def test_hand_computed_2x2(self, spark):
        # classic example: 20 yes-yes, 5 yes-no, 10 no-yes, 15 no-no
        rows = (
            [("y", "y")] * 20 + [("y", "n")] * 5
            + [("n", "y")] * 10 + [("n", "n")] * 15
        )
        df = spark.createDataFrame(rows, "t string, p string")
        r = cohens_kappa(df, "t", "p").collect()[0]
        n, agree = 50, 35
        s = 25 * 30 + 25 * 20  # row*col marginal products
        want = (n * agree - s) / (n * n - s)
        assert r["n"] == n
        assert r["n_agree"] == agree
        assert r["accuracy"] == 0.7
        assert r["kappa"] == round(want, 6)

    def test_perfect_agreement_is_one(self, spark):
        rows = [("a", "a")] * 3 + [("b", "b")] * 7
        df = spark.createDataFrame(rows, "t string, p string")
        assert cohens_kappa(df, "t", "p").collect()[0]["kappa"] == 1.0

    def test_chance_agreement_is_zero(self, spark):
        # independent rater: pred 'a' half the time regardless of truth
        rows = [("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")]
        df = spark.createDataFrame(rows, "t string, p string")
        assert cohens_kappa(df, "t", "p").collect()[0]["kappa"] == 0.0


class TestMcnemar:
    def test_hand_computed_discordants(self, spark):
        # y=1 always; A right on 0-5 (6), B right on 4-9 (6)
        rows = [(True, i < 6, i >= 4) for i in range(10)]
        df = spark.createDataFrame(rows, "y boolean, a boolean, b boolean")
        r = mcnemar(df, "y", "a", "b").collect()[0]
        assert r["b_only_a"] == 4  # A right, B wrong: i in 0..3
        assert r["c_only_b"] == 4  # A wrong, B right: i in 6..9
        assert r["mcnemar_chi2"] == 0.0

    def test_asymmetric_disagreement(self, spark):
        rows = [(True, True, False)] * 9 + [(True, False, True)] * 1
        df = spark.createDataFrame(rows, "y boolean, a boolean, b boolean")
        r = mcnemar(df, "y", "a", "b").collect()[0]
        assert r["mcnemar_chi2"] == round((9 - 1) ** 2 / 10, 6)

    def test_no_discordant_pairs_is_zero(self, spark):
        rows = [(True, True, True), (False, True, True)]
        df = spark.createDataFrame(rows, "y boolean, a boolean, b boolean")
        assert mcnemar(df, "y", "a", "b").collect()[0]["mcnemar_chi2"] == 0.0


class TestDupBySource:
    def test_cross_source_duplicates_count_everywhere(self, spark):
        rows = [
            (0, "srcA", "same text"),
            (1, "srcB", "same text"),   # dup ACROSS sources
            (2, "srcA", "unique one"),
            (3, "srcB", "unique two"),
            (4, "srcB", "unique three"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        out = {r["grp"]: r for r in dup_rate_by_group(df).collect()}
        assert out["srcA"]["n_docs"] == 2
        assert out["srcA"]["n_dup_docs"] == 1
        assert out["srcA"]["dup_share"] == 0.5
        assert out["srcB"]["n_dup_docs"] == 1
        assert out["srcB"]["dup_share"] == round(1 / 3, 6)

    def test_null_text_hashes_consistently(self, spark):
        rows = [(0, "s", None), (1, "s", None), (2, "s", "x")]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        r = dup_rate_by_group(df).collect()[0]
        assert r["n_dup_docs"] == 2
