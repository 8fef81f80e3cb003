"""Unit tests for the tranche-39 operators: OOV rate against a base
vocabulary and entity-pair PMI over document co-occurrence."""

import math

import pyspark.sql.functions as F


class TestOov:
    def test_token_and_type_rates(self, spark):
        toks = spark.createDataFrame(
            [("base", w) for w in "a b c a b".split()]
            + [("in", w) for w in "a a x y x".split()],
            "side string, w string",
        )
        vocab = (toks.filter(F.col("side") == "base").select("w")
                 .distinct().withColumn("known", F.lit(1)))
        inw = toks.filter(F.col("side") == "in").groupBy("w").agg(
            F.count("*").cast("long").alias("c"))
        j = inw.join(vocab, "w", "left")
        r = j.groupBy().agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.when(F.col("known").isNull(), F.col("c")).otherwise(0))
            .alias("n_oov"),
            F.count("*").alias("n_types"),
            F.sum(F.when(F.col("known").isNull(), 1).otherwise(0))
            .alias("n_oov_types"),
        ).collect()[0]
        # in-tokens: a a x y x -> 3 OOV of 5; types: a, x, y -> 2 of 3
        assert (r["n_tokens"], r["n_oov"]) == (5, 3)
        assert (r["n_types"], r["n_oov_types"]) == (3, 2)


class TestEntityPmi:
    def test_pmi_formula_on_fixed_membership(self, spark):
        # docs: d1{A,B}, d2{A,B}, d3{A,B}, d4{A,C}, d5{C}
        mem = spark.createDataFrame(
            [("d1", "A"), ("d1", "B"), ("d2", "A"), ("d2", "B"),
             ("d3", "A"), ("d3", "B"), ("d4", "A"), ("d4", "C"),
             ("d5", "C")],
            "doc_id string, node string",
        ).distinct()
        nd = mem.groupBy("node").agg(F.count("*").cast("long").alias("nd"))
        ndocs = mem.select("doc_id").distinct().count()
        a = mem.selectExpr("doc_id", "node as e1")
        b = mem.selectExpr("doc_id", "node as e2")
        pairs = (a.join(b, "doc_id").filter(F.col("e1") < F.col("e2"))
                 .groupBy("e1", "e2")
                 .agg(F.count("*").cast("long").alias("n12"))
                 .filter(F.col("n12") >= 3))
        out = (pairs.join(nd.selectExpr("node as e1", "nd as n1"), "e1")
               .join(nd.selectExpr("node as e2", "nd as n2"), "e2")
               .collect())
        # only (A, B) co-occurs >= 3 times
        assert len(out) == 1
        r = out[0]
        assert (r["e1"], r["e2"], r["n12"], r["n1"], r["n2"]) == (
            "A", "B", 3, 4, 3)
        want = math.log(3 * ndocs / (4 * 3))
        assert abs(want - math.log(15 / 12)) < 1e-12  # N = 5 docs
