"""Unit + invariant tests for the tranche-8 operators: degree
assortativity, per-edge neighborhood Jaccard, grouped equi-width
histogram, and length-bucketed inference batching. Value-exactness vs
DuckDB is pinned by ``tools/check_contract.py``; these pin the
hand-checkable algebra and the degenerate inputs."""

import pyspark.sql.functions as F
import pytest

from knowledgegraphbuilder_spark.operators.curation import inference_batches
from knowledgegraphbuilder_spark.operators.graphstats import (
    assortativity,
    edge_jaccard,
)
from knowledgegraphbuilder_spark.operators.mlstats import equi_width_histogram


class TestAssortativity:
    def test_star_is_maximally_disassortative(self, spark):
        # star K1,4: every edge joins degree 4 to degree 1 -> r = -1
        edges = spark.createDataFrame(
            [("hub", f"leaf{i}") for i in range(4)], "src string, dst string")
        r = assortativity(edges).collect()[0]
        assert r["n_ends"] == 8 and r["assortativity"] == -1.0

    def test_regular_graph_is_degenerate(self, spark):
        # cycle C4: all degrees equal -> zero variance -> NULL (not crash)
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")],
            "src string, dst string")
        r = assortativity(edges).collect()[0]
        assert r["n_ends"] == 8 and r["assortativity"] is None

    def test_orientation_and_duplicates_ignored(self, spark):
        e1 = spark.createDataFrame(
            [("hub", "x"), ("x", "hub"), ("hub", "y"), ("hub", "z"),
             ("hub", "w")], "src string, dst string")
        e2 = spark.createDataFrame(
            [("hub", "x"), ("hub", "y"), ("hub", "z"), ("hub", "w")],
            "src string, dst string")
        assert assortativity(e1).collect() == assortativity(e2).collect()


class TestEdgeJaccard:
    def test_triangle_plus_tail(self, spark):
        # triangle a-b-c plus tail c-d:
        #   edge (a,b): common {c}, union {c} -> 1.0
        #   edge (a,c): common {b}, union {b,d} -> 0.5
        #   edge (c,d): common {}, union {a,b} -> 0.0
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")],
            "src string, dst string")
        got = {(r["src"], r["dst"]): (r["support"], r["union_size"],
                                      r["jaccard"])
               for r in edge_jaccard(edges).collect()}
        assert got[("a", "b")] == (1, 1, 1.0)
        assert got[("a", "c")] == (1, 2, 0.5)
        assert got[("b", "c")] == (1, 2, 0.5)
        assert got[("c", "d")] == (0, 2, 0.0)

    def test_isolated_edge_null_not_crash(self, spark):
        edges = spark.createDataFrame([("a", "b")], "src string, dst string")
        r = edge_jaccard(edges).collect()[0]
        assert r["support"] == 0 and r["union_size"] == 0
        assert r["jaccard"] is None


class TestHistogram:
    def test_bucket_math_and_empty_buckets(self, spark):
        df = spark.createDataFrame(
            [(float(x),) for x in (0, 1, 2, 9, 10)], "v double")
        rows = equi_width_histogram(df, "v", bins=5).collect()
        # lo=0 hi=10 w=2: buckets [0,2) [2,4) [4,6) [6,8) [8,10]
        assert [r["bucket"] for r in rows] == [0, 1, 2, 3, 4]
        assert [r["n"] for r in rows] == [2, 1, 0, 0, 2]
        assert [r["bucket_lo"] for r in rows] == [0.0, 2.0, 4.0, 6.0, 8.0]

    def test_constant_column_single_bucket(self, spark):
        df = spark.createDataFrame([(7.0,), (7.0,)], "v double")
        rows = equi_width_histogram(df, "v", bins=4).collect()
        assert [r["n"] for r in rows] == [2, 0, 0, 0]

    def test_grouped_shape(self, spark, sf_dir):
        df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        out = equi_width_histogram(
            df, "l_extendedprice", bins=12, group_col="l_returnflag")
        rows = out.collect()
        groups = {r["l_returnflag"] for r in rows}
        assert len(rows) == 12 * len(groups)
        # per-group counts sum back to the group's row count
        per = {}
        for r in rows:
            per[r["l_returnflag"]] = per.get(r["l_returnflag"], 0) + r["n"]
        expect = {r["l_returnflag"]: r["cnt"] for r in
                  df.groupBy("l_returnflag").agg(
                      F.count("*").alias("cnt")).collect()}
        assert per == expect


class TestInferenceBatches:
    def test_padding_accounting(self, spark):
        docs = spark.createDataFrame(
            [(1, "a " * 9 + "a"), (2, "b " * 11 + "b"), (3, "c " * 99 + "c")],
            "doc_id long, text string")
        # 10 and 12 tokens share bucket 0 (width 16); 100 tokens -> bucket 6
        rows = inference_batches(
            docs, max_tokens=64, bucket_width=16).collect()
        by_bucket = {(r["bucket"], r["batch"]): r for r in rows}
        b0 = by_bucket[(0, 0)]
        assert b0["n_docs"] == 2 and b0["tokens"] == 22
        assert b0["padded_tokens"] == 24  # both pad to 12
        assert b0["waste_pct"] == pytest.approx(2 / 24 * 100, abs=1e-4)
        b6 = by_bucket[(6, 0)]
        assert b6["n_docs"] == 1 and b6["waste_pct"] == 0.0

    def test_batch_budget_respected(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        rows = inference_batches(
            docs, max_tokens=512, bucket_width=16).collect()
        assert rows
        # next-fit bound: every batch's payload < budget + its max doc
        for r in rows:
            max_doc = r["padded_tokens"] // r["n_docs"]
            assert r["tokens"] < 512 + max_doc
        # bucketing bound: padding waste within a bucket is < bucket_width
        # per doc, so waste_pct stays far below worst-case unbucketed
        assert all(r["waste_pct"] is None or r["waste_pct"] < 100.0
                   for r in rows)

    def test_every_doc_assigned_once(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        total = inference_batches(docs).agg(
            F.sum("n_docs")).collect()[0][0]
        assert total == docs.count()


class TestKTruss:
    def test_k4_complete_graph_is_4truss(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import k_truss
        vs = ["a", "b", "c", "d"]
        edges = spark.createDataFrame(
            [(x, y) for i, x in enumerate(vs) for y in vs[i + 1:]],
            "src string, dst string")
        rows = k_truss(edges, k=4).collect()
        # every edge of K4 has support 2 within the truss
        assert len(rows) == 6 and all(r["support"] == 2 for r in rows)
        assert k_truss(edges, k=5).count() == 0

    def test_triangle_survives_tail_drops(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import k_truss
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")],
            "src string, dst string")
        got = {(r["src"], r["dst"]) for r in k_truss(edges, k=3).collect()}
        assert got == {("a", "b"), ("a", "c"), ("b", "c")}

    def test_peel_cascades(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import k_truss
        # diamond: bc sits in 2 triangles, every other edge in 1.
        # k=4 keeps bc after round 1, but bc alone has no triangle ->
        # round 2 empties the graph. Catches a one-round (non-iterated)
        # implementation, which would return {bc}.
        edges = spark.createDataFrame(
            [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")],
            "src string, dst string")
        assert k_truss(edges, k=4).count() == 0


class TestDecimalDomainSums:
    """Regression pins for the sufficient-statistics overflow fix: sum(x*x)
    over BIGINT both multiplies and accumulates in LONG, so values whose
    square exceeds 2^63 threw ARITHMETIC_OVERFLOW under ANSI mode before the
    operands were widened to decimal(18,0) pre-product (first observed as a
    bench crash: ml_corr at sf0.1, price_c^2 ~ 1e14 x 6e5 rows)."""

    def test_corr_matrix_survives_huge_values(self, spark):
        from knowledgegraphbuilder_spark.operators.mlstats import corr_matrix

        # 4e9^2 = 1.6e19 > 2^63: a SINGLE product overflows long
        big = 4_000_000_000
        df = spark.createDataFrame(
            [(big + i, 2 * (big + i)) for i in range(4)], "x long, y long")
        rows = corr_matrix(df, {"x": "x", "y": "y"}).collect()
        assert rows[0]["corr"] == 1.0  # y = 2x exactly

    def test_grouped_ols_survives_huge_values(self, spark):
        from knowledgegraphbuilder_spark.operators.mlstats import grouped_ols

        big = 4_000_000_000
        df = spark.createDataFrame(
            [("g", big + i, 3 * (big + i) + 7) for i in range(4)],
            "grp string, x long, y long")
        r = grouped_ols(df, "x", "y").collect()[0]
        assert r["slope"] == 3.0 and r["r2"] == 1.0

    def test_assortativity_survives_huge_degrees(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import (
            assortativity,
        )

        # degrees here are small; the overflow guard is the decimal-domain
        # sum itself — exercised indirectly. Pin the algebra still holds
        # after the rewrite: star K1,3 -> r = -1 exactly.
        edges = spark.createDataFrame(
            [("hub", f"l{i}") for i in range(3)], "src string, dst string")
        assert assortativity(edges).collect()[0]["assortativity"] == -1.0
