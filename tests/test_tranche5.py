"""Round-4 extension tranche: normalized exact dedup, Misra-Gries exact
heavy hitters, ticket-replication weighted reservoir sampling, TPC-H Q5.

The driver-gate oracles pin sf0.01 value-exactness; these tests pin the
operator-level CONTRACTS the oracles can't see — partitioning independence
(the whole point of the MG candidate pass), the two-phase top-k == brute
force equivalence, and the catch-what-exact-misses claim of normalized
dedup."""

import pytest
from pyspark.sql import functions as F

from knowledgegraphbuilder_spark.operators.curation import (
    weighted_reservoir_sample,
)
from knowledgegraphbuilder_spark.operators.dedup import (
    exact_duplicates,
    normalized_exact_duplicates,
)
from knowledgegraphbuilder_spark.operators.sketches import (
    misra_gries_heavy_hitters,
)


class TestNormalizedDedup:
    def test_catches_reformatted_dups_exact_misses(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "Hello, World!"),
                (2, "hello world"),
                (3, "HELLO   world..."),
                (4, "a different document"),
            ],
            "doc_id long, text string",
        )
        assert exact_duplicates(docs).count() == 0
        groups = normalized_exact_duplicates(docs).collect()
        assert len(groups) == 1
        assert groups[0]["n_docs"] == 3
        assert groups[0]["doc_ids_csv"] == "1,2,3"

    def test_degenerate(self, spark):
        docs = spark.createDataFrame(
            [(1, ""), (2, None), (3, "   "), (4, "!!!")],
            "doc_id long, text string",
        )
        # all four normalize to the empty string -> one group of 4
        g = normalized_exact_duplicates(docs).collect()
        assert len(g) == 1 and g[0]["n_docs"] == 4


class TestMisraGriesHeavyHitters:
    def _corpus(self, spark):
        # 500 'hot' + 200 'warm' + 300 distinct cold tokens: n=1000, with
        # k=4 the threshold is cnt*5 > 1000 -> only hot and warm qualify
        rows = (
            [("hot",)] * 500 + [("warm",)] * 201 + [(f"cold{i}",) for i in range(299)]
        )
        return spark.createDataFrame(rows, "tok string")

    def test_exact_and_partitioning_independent(self, spark):
        df = self._corpus(spark)
        expected = {("hot", 500, 1000), ("warm", 201, 1000)}
        for parts in (1, 7, 32):
            got = {
                (r["key"], r["cnt"], r["n_total"])
                for r in misra_gries_heavy_hitters(
                    df.repartition(parts), "tok", k=4
                ).collect()
            }
            assert got == expected, f"parts={parts}"

    def test_matches_bruteforce_on_real_text(self, spark, sf_dir):
        toks = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(F.explode(F.split("text", " ")).alias("tok"))
            .filter(F.col("tok") != "")
        )
        k = 30
        n = toks.count()
        brute = {
            (r["tok"], r["cnt"])
            for r in toks.groupBy("tok")
            .agg(F.count("*").alias("cnt"))
            .filter(F.col("cnt") * (k + 1) > n)
            .collect()
        }
        got = {
            (r["key"], r["cnt"])
            for r in misra_gries_heavy_hitters(toks, "tok", k=k).collect()
        }
        assert got == brute and len(got) > 0

    def test_empty(self, spark):
        df = spark.createDataFrame([], "tok string")
        assert misra_gries_heavy_hitters(df, "tok", k=4).count() == 0


class TestWeightedReservoir:
    def test_two_phase_equals_bruteforce(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        got = weighted_reservoir_sample(docs, k=5).collect()
        # brute force: recompute every key in pandas, single global sort
        import hashlib

        pdf = docs.select("lang", "doc_id", "n_chars").toPandas()

        def key(doc_id, w):
            return min(
                hashlib.sha256(f"{doc_id}:{t}".encode()).hexdigest()
                for t in range(1, w + 1)
            )

        pdf["w"] = pdf["n_chars"].apply(lambda c: max(1, min(32, c // 100)))
        pdf["tkey"] = [key(d, w) for d, w in zip(pdf["doc_id"], pdf["w"])]
        expected = set()
        for lang, grp in pdf.groupby("lang"):
            winners = grp.sort_values(["tkey", "doc_id"]).head(5)
            for rk, (_, row) in enumerate(winners.iterrows(), start=1):
                expected.add((lang, int(row["doc_id"]), int(row["w"]), rk))
        assert {
            (r["lang"], r["doc_id"], r["w"], r["rk"]) for r in got
        } == expected

    def test_weight_floor_and_rank_contract(self, spark):
        docs = spark.createDataFrame(
            [(i, "en", 10) for i in range(20)],
            "doc_id long, lang string, n_chars long",
        )
        rows = weighted_reservoir_sample(docs, k=3).collect()
        assert len(rows) == 3
        assert all(r["w"] == 1 for r in rows)  # floor(10/100)=0 -> clamped
        assert sorted(r["rk"] for r in rows) == [1, 2, 3]
        keys = [r["tkey"] for r in sorted(rows, key=lambda r: r["rk"])]
        assert keys == sorted(keys)

    def test_empty(self, spark):
        docs = spark.createDataFrame(
            [], "doc_id long, lang string, n_chars long"
        )
        assert weighted_reservoir_sample(docs, k=3).count() == 0
