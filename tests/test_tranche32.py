"""Unit tests for the tranche-32 operators: Jensen-Shannon divergence
between corpus halves and categorical mutual information."""

import math

from knowledgegraphbuilder_spark.operators.textstats import jsd_split


def _brute_jsd(texts_a, texts_b):
    from collections import Counter

    ca = Counter(w for t in texts_a for w in t.split() if w)
    cb = Counter(w for t in texts_b for w in t.split() if w)
    na, nb = sum(ca.values()), sum(cb.values())
    s = 0.0
    for w in set(ca) | set(cb):
        pa, pb = ca[w] / na, cb[w] / nb
        m = 0.5 * (pa + pb)
        if pa > 0:
            s += 0.5 * pa * math.log(pa / m)
        if pb > 0:
            s += 0.5 * pb * math.log(pb / m)
    return s


class TestJsd:
    def test_identical_distributions_zero(self, spark):
        rows = [("a", "x y z"), ("b", "x y z")]
        df = spark.createDataFrame(rows, "side string, text string")
        r = jsd_split(df).collect()[0]
        assert r["jsd"] == 0.0
        assert r["n_a"] == 3 and r["n_b"] == 3 and r["n_words"] == 3

    def test_disjoint_vocab_is_ln2(self, spark):
        rows = [("a", "x x y"), ("b", "p q q")]
        df = spark.createDataFrame(rows, "side string, text string")
        r = jsd_split(df).collect()[0]
        assert r["jsd"] == round(math.log(2), 6)

    def test_matches_brute_force(self, spark):
        ta = ["the cat sat", "the dog ran", "cat and dog"]
        tb = ["the cat sat", "a bird flew", "the the the"]
        rows = [("a", t) for t in ta] + [("b", t) for t in tb]
        df = spark.createDataFrame(rows, "side string, text string")
        r = jsd_split(df).collect()[0]
        assert abs(r["jsd"] - _brute_jsd(ta, tb)) < 1e-6


class TestMi:
    def test_independent_is_zero_dependent_is_marginal_entropy(self, spark):
        import pyspark.sql.functions as F
        from pyspark.sql import Window as W

        def mi_of(rows):
            df = spark.createDataFrame(rows, "source string, lang string")
            ct = df.groupBy("source", "lang").agg(
                F.count("*").cast("long").alias("c")
            )
            cells = ct.select(
                "c",
                F.sum("c").over(W.partitionBy("source")).alias("cx"),
                F.sum("c").over(W.partitionBy("lang")).alias("cy"),
                F.sum("c").over(W.partitionBy()).alias("n"),
            )
            return (
                cells.agg(F.sum(F.expr(
                    "(cast(c as double) / n) * ln(cast(c as double) * n"
                    " / (cast(cx as double) * cy))"
                )).alias("mi")).collect()[0]["mi"]
            )

        # independent: every (source, lang) combination equally likely
        indep = [(s, l) for s in "AB" for l in "xy" for _ in range(5)]
        assert abs(mi_of(indep)) < 1e-12
        # deterministic: lang fully determined by source ->
        # MI = H(source) = ln 2 for a uniform 2-way split
        dep = [("A", "x")] * 10 + [("B", "y")] * 10
        assert abs(mi_of(dep) - math.log(2)) < 1e-12
