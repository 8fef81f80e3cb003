"""Unit tests for the tranche-29 operators: SymSpell edit-distance-1
dedup (lossless delete-1 blocking + exact verify) and the KG 2-hop
metapath census."""

import itertools

from knowledgegraphbuilder_spark.operators.dedup import editdist1_pairs


def _lev(a, b):
    # textbook DP
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[-1]


class TestEditDist1:
    KEYS = [
        ("d1", "alphabet soup"),
        ("d2", "alphabet soap"),   # substitution of d1 -> dist 1
        ("d3", "alphabet soups"),  # insertion on d1 -> dist 1
        ("d4", "alphabet"),        # far from all
        ("d5", "alphabet soup"),   # exact dup of d1 -> dist 0
        ("d6", "lphabet soup"),    # deletion of d1 -> dist 1
        ("d7", "soup alphabet"),   # same chars, big distance
    ]

    def test_recovers_exactly_the_brute_force_pairs(self, spark):
        df = spark.createDataFrame(self.KEYS, "doc_id string, key string")
        got = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in editdist1_pairs(df).collect()
        }
        want = set()
        for (ia, ka), (ib, kb) in itertools.combinations(self.KEYS, 2):
            d = _lev(ka, kb)
            if d <= 1:
                lo, hi = sorted((ia, ib))
                want.add((lo, hi, d))
        assert got == want
        assert ("d1", "d2", 1) in got and ("d1", "d5", 0) in got
        # the blocking must not leak the distance-2 anagram pair
        assert all(p[0] != "d7" and p[1] != "d7" for p in got)

    def test_transposition_is_not_distance_one(self, spark):
        # 'ab'-style transpositions share delete-1 variants (the
        # over-generation case) — verify must reject them
        df = spark.createDataFrame(
            [("x", "abcdefgh"), ("y", "bacdefgh")],
            "doc_id string, key string",
        )
        assert editdist1_pairs(df).count() == 0

    def test_max_bucket_drops_hot_variants(self, spark):
        # 6 keys sharing one hot delete-variant; cap at 3 drops that
        # variant's bucket but identical keys still pair via other
        # variants
        rows = [(f"k{i}", "aaaaaaab") for i in range(6)]
        df = spark.createDataFrame(rows, "doc_id string, key string")
        full = editdist1_pairs(df).count()
        assert full == 15  # all identical -> all pairs
        capped = editdist1_pairs(df, max_bucket=3).count()
        assert capped == 0  # every shared variant bucket exceeds the cap


class TestMetapaths:
    def test_census_counts_node_paths_not_instances(self, spark):
        import pyspark.sql.functions as F

        # diamond with a duplicated edge instance and a backtrack
        edges = spark.createDataFrame(
            [
                ("a", "b", "r1"),
                ("a", "b", "r1"),  # duplicate instance (two docs)
                ("b", "c", "r2"),
                ("b", "a", "r2"),  # backtrack a->b->a must be excluded
                ("c", "d", "r1"),
            ],
            "head_node_id string, tail_node_id string, rel_type string",
        )
        et = edges.distinct()
        e1 = et.select(
            F.col("head_node_id").alias("a"),
            F.col("tail_node_id").alias("b"),
            F.col("rel_type").alias("rt1"),
        )
        e2 = et.select(
            F.col("head_node_id").alias("b"),
            F.col("tail_node_id").alias("c"),
            F.col("rel_type").alias("rt2"),
        )
        out = {
            (r["rt1"], r["rt2"]): r["n_paths"]
            for r in (
                e1.join(e2, "b")
                .filter(F.col("a") != F.col("c"))
                .select("a", "b", "c", "rt1", "rt2")
                .distinct()
                .groupBy("rt1", "rt2")
                .agg(F.count("*").cast("long").alias("n_paths"))
            ).collect()
        }
        # paths: a-b-c (r1,r2), b-c-d (r2,r1); a-b-a excluded;
        # duplicate a->b instance must not double-count
        assert out == {("r1", "r2"): 1, ("r2", "r1"): 1}
