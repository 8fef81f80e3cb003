"""Unit tests for the tranche-41 operators: langid confusion matrix
and the deterministic randomization test."""

import pyspark.sql.functions as F


class TestLangConfusion:
    def test_language_id_on_obvious_texts(self, spark):
        from knowledgegraphbuilder_spark.operators.textstats import (
            language_id,
        )

        docs = spark.createDataFrame(
            [
                (1, "the cat and the dog are in the house"),
                (2, "le chat et le chien sont dans la maison"),
                (3, "zzz qqq xxx"),  # no stopword hits -> 'und'
            ],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r["pred_lang"]
               for r in language_id(docs).collect()}
        assert got["1"] == "en"
        assert got["2"] == "fr"
        assert got["3"] == "und"


class TestPermTest:
    def _run(self, spark, rows, b=64):
        from knowledgegraphbuilder_spark.operators.curation import _H60

        d = spark.createDataFrame(rows, "id string, v long, y long")
        tot = d.agg(
            F.count("*").cast("long").alias("n"),
            F.sum("y").cast("long").alias("n1"),
            F.sum("v").cast("long").alias("sv"),
            F.sum(F.expr("v * y")).cast("long").alias("sv1"),
        )
        obs = tot.selectExpr(
            "n", "n1",
            "cast(sv1 as double) / n1"
            " - cast(sv - sv1 as double) / (n - n1) as obs_diff",
        )
        reps = d.select(
            "id", "v", F.explode(F.expr(f"sequence(0, {b - 1})")).alias("r")
        )
        h = _H60.format(s="concat('perm-v1', ',', cast(r as string), ',', id)")
        sided = reps.crossJoin(F.broadcast(obs.select("n", "n1"))).select(
            "r", "v",
            F.expr(f"cast(({h} % n) < n1 as int)").cast("long").alias("s"),
        )
        per = sided.groupBy("r").agg(
            F.sum(F.expr("v * s")).cast("long").alias("sva"),
            F.sum("s").cast("long").alias("na"),
            F.sum("v").cast("long").alias("svt"),
            F.count("*").cast("long").alias("nt"),
        ).selectExpr(
            "case when na > 0 and na < nt then cast(sva as double) / na"
            " - cast(svt - sva as double) / (nt - na) end as diff",
        )
        o = obs.collect()[0]
        diffs = [r["diff"] for r in per.collect()]
        return o["obs_diff"], diffs

    def test_strong_effect_never_exceeded(self, spark):
        # group 1 values ~1000, group 0 values ~10: no random relabel
        # should reach the observed gap
        rows = ([(f"a{i}", 1000 + i, 1) for i in range(30)]
                + [(f"b{i}", 10 + i, 0) for i in range(30)])
        obs, diffs = self._run(spark, rows)
        assert obs > 900
        n_ge = sum(1 for d in diffs if d is not None and abs(d) >= abs(obs))
        assert n_ge == 0  # -> p = 1/65, the test's floor

    def test_null_effect_rarely_extreme(self, spark):
        # labels carry no signal: most relabelings should look like the
        # observed split (p nowhere near the floor)
        rows = [(f"x{i}", 100 + (i % 7), i % 2) for i in range(60)]
        obs, diffs = self._run(spark, rows)
        n_ge = sum(1 for d in diffs if d is not None and abs(d) >= abs(obs))
        assert n_ge >= 16  # p >= ~0.26 — the effect is not significant

    def test_deterministic(self, spark):
        rows = [(f"x{i}", 50 + i, i % 2) for i in range(20)]
        a = self._run(spark, rows)
        b = self._run(spark, rows)
        assert a == b
