"""Unit + invariant tests for the tranche-14 operators: PSI drift and
global clustering coefficient (the two new library functions;
sql_dau_wau / sql_streaks are pinned by their oracles)."""

from knowledgegraphbuilder_spark.operators.graphstats import (
    global_clustering,
)
from knowledgegraphbuilder_spark.operators.mlstats import psi_drift


class TestPSI:
    def test_identical_halves_zero_psi(self, spark):
        # value independent of the hash split: both halves see the same
        # two-point distribution -> psi == 0 exactly (each bin's p == q
        # only in expectation, so use a constant value: one bin, p=q=1)
        df = spark.createDataFrame(
            [(i, 100) for i in range(200)], "doc_id long, n_chars long"
        )
        r = psi_drift(df).collect()[0]
        assert r["n_a"] + r["n_b"] == 200
        assert r["n_bins_both"] == 1 and r["psi"] == 0.0

    def test_disjoint_supports_all_one_sided(self, spark):
        # value == hash side: a-docs all tiny, b-docs all huge -> the
        # populated bins are strictly one-sided and psi (over both-sided
        # bins) is 0 with the disjointness surfaced in the counts
        from knowledgegraphbuilder_spark.operators.curation import _H60

        import pyspark.sql.functions as F

        ids = spark.range(400).select(F.col("id").alias("doc_id"))
        side = (
            F.expr(_H60.format(s="concat('psi-v1', ',', cast(doc_id as string))"))
            % 100 < 50
        )
        df = ids.select(
            "doc_id", F.when(side, 0).otherwise(1000).alias("n_chars")
        )
        r = psi_drift(df).collect()[0]
        assert r["n_bins_both"] == 0
        assert r["n_bins_a_only"] == 1 and r["n_bins_b_only"] == 1
        assert r["psi"] == 0.0


class TestGCC:
    def _gcc(self, spark, edges):
        df = spark.createDataFrame(edges, "src string, dst string")
        return global_clustering(df).collect()[0]

    def test_triangle_is_transitivity_one(self, spark):
        r = self._gcc(spark, [("a", "b"), ("b", "c"), ("a", "c")])
        assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (3, 3, 1)
        assert r["n_wedges"] == 3 and abs(r["gcc"] - 1.0) < 1e-9

    def test_path_has_zero_closure(self, spark):
        r = self._gcc(spark, [("a", "b"), ("b", "c")])
        assert r["n_triangles"] == 0 and r["n_wedges"] == 1
        assert r["gcc"] == 0.0

    def test_star_plus_one_closure(self, spark):
        # star center x with leaves a,b,c plus edge a-b:
        # triangles = 1, wedges = C(4,2)... hand-compute:
        # degrees: x=3, a=2, b=2, c=1 -> wedges = 3 + 1 + 1 + 0 = 5
        r = self._gcc(spark, [("x", "a"), ("x", "b"), ("x", "c"),
                              ("a", "b")])
        assert r["n_triangles"] == 1 and r["n_wedges"] == 5
        assert abs(r["gcc"] - 0.6) < 1e-9

    def test_single_edge_null_gcc(self, spark):
        r = self._gcc(spark, [("a", "b")])
        assert r["n_wedges"] == 0 and r["gcc"] is None
