"""BFS hop distance, label-propagation communities, HLL sketch, TF-IDF, PMI."""

import math

from pyspark.sql import functions as F

from knowledgegraphbuilder_spark.operators.graphstats import bfs_hops, label_propagation
from knowledgegraphbuilder_spark.operators.sketches import M, hll_distinct
from knowledgegraphbuilder_spark.operators.textstats import pmi_collocations, tfidf_topk


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node string")


class TestBfs:
    def test_path_graph_exact_hops(self, spark):
        # a-b-c-d-e: hops from {a} are 0..3 within the cap, e unreached
        e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
        got = {r["node"]: r["hop"] for r in bfs_hops(e, _seeds(spark, ["a"]), max_hops=3).collect()}
        assert got == {"a": 0, "b": 1, "c": 2, "d": 3}

    def test_multi_source_takes_min(self, spark):
        # seeds at both ends of a path: middle node gets the closer distance
        e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
        got = {r["node"]: r["hop"] for r in bfs_hops(e, _seeds(spark, ["a", "e"]), max_hops=3).collect()}
        assert got == {"a": 0, "e": 0, "b": 1, "d": 1, "c": 2}

    def test_direction_agnostic(self, spark):
        # edges are undirected regardless of stored orientation
        e = _edges(spark, [("b", "a"), ("b", "c")])
        got = {r["node"]: r["hop"] for r in bfs_hops(e, _seeds(spark, ["a"]), max_hops=2).collect()}
        assert got == {"a": 0, "b": 1, "c": 2}

    def test_early_stop_on_empty_frontier(self, spark):
        e = _edges(spark, [("a", "b")])
        got = {r["node"]: r["hop"] for r in bfs_hops(e, _seeds(spark, ["a"]), max_hops=10).collect()}
        assert got == {"a": 0, "b": 1}


class TestLabelProp:
    def test_disconnected_cliques_never_share_labels(self, spark):
        # labels can only travel along edges: disjoint components keep
        # disjoint label sets no matter how many rounds run
        tri1 = [("a1", "a2"), ("a2", "a3"), ("a1", "a3")]
        tri2 = [("b1", "b2"), ("b2", "b3"), ("b1", "b3")]
        got = {
            r["node"]: r["community"]
            for r in label_propagation(_edges(spark, tri1 + tri2), rounds=3).collect()
        }
        assert all(got[n].startswith("a") for n in ("a1", "a2", "a3"))
        assert all(got[n].startswith("b") for n in ("b1", "b2", "b3"))
        # within a clique every node sees the same vote multiset each round
        assert len({got["b1"], got["b2"], got["b3"]}) <= 2

    def test_deterministic_across_runs(self, spark):
        e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")])
        r1 = sorted(map(tuple, label_propagation(e, rounds=3).collect()))
        r2 = sorted(map(tuple, label_propagation(e, rounds=3).collect()))
        assert r1 == r2

    def test_star_center_adopts_leaf_max(self, spark):
        # round 1: center sees leaves {l1..l4}, all count 1 -> largest-label
        # tie-break picks l4; every leaf sees only the center c
        e = _edges(spark, [("c", f"l{i}") for i in range(1, 5)])
        got = {r["node"]: r["community"] for r in label_propagation(e, rounds=1).collect()}
        assert got["c"] == "l4"
        assert all(got[f"l{i}"] == "c" for i in range(1, 5))


class TestHll:
    def test_accuracy_within_standard_error(self, spark):
        # 20k distinct values: HLL(m=4096) standard error = 1.04/sqrt(m) ~ 1.6%
        df = spark.range(20000).select(F.lit("g").alias("g"), F.col("id"))
        est = hll_distinct(df, "g", "cast(id as string)").collect()[0]["est_distinct"]
        assert abs(est - 20000) / 20000 < 0.05

    def test_duplicates_do_not_inflate(self, spark):
        base = spark.range(5000).select(F.lit("g").alias("g"), F.col("id"))
        dup = base.unionAll(base).unionAll(base)
        e1 = hll_distinct(base, "g", "cast(id as string)").collect()[0]["est_distinct"]
        e3 = hll_distinct(dup, "g", "cast(id as string)").collect()[0]["est_distinct"]
        assert e1 == e3  # register max is idempotent -> bit-identical

    def test_small_range_linear_counting(self, spark):
        # far below 2.5m with empty registers -> linear-counting branch,
        # which is near-exact at tiny cardinalities
        df = spark.range(50).select(F.lit("g").alias("g"), F.col("id"))
        est = hll_distinct(df, "g", "cast(id as string)").collect()[0]["est_distinct"]
        assert abs(est - 50) < 2
        assert 50 < 2.5 * M

    def test_partitioning_invariance(self, spark):
        # integer-exact accumulation -> result independent of layout
        df = spark.range(8000).select(F.lit("g").alias("g"), F.col("id"))
        e1 = hll_distinct(df.repartition(1), "g", "cast(id as string)").collect()[0]["est_distinct"]
        e32 = hll_distinct(df.repartition(32), "g", "cast(id as string)").collect()[0]["est_distinct"]
        assert e1 == e32


class TestTfidfPmi:
    def test_tfidf_prefers_rare_terms(self, spark):
        docs = spark.createDataFrame(
            [("d1", "common rare"), ("d2", "common other common"), ("d3", "common x y")],
            "doc_id string, text string",
        )
        top = {
            r["doc_id"]: r["term"]
            for r in tfidf_topk(docs, k=1).collect()
        }
        # 'common' appears in every doc (min idf); doc-unique terms win
        assert top["d1"] == "rare"
        expected = 1.0 * (math.log(4.0 / 2.0) + 1.0)
        row = [r for r in tfidf_topk(docs, k=3).collect() if r["doc_id"] == "d1" and r["term"] == "rare"][0]
        assert abs(row["score"] - round(expected, 4)) < 1e-9

    def test_pmi_finds_the_glued_pair(self, spark):
        # 'new york' always together; fillers are independent
        rows = [("x", "new york " + "a b c d " * 3)] * 12
        docs = spark.createDataFrame(rows, "doc_id string, text string")
        top = pmi_collocations(docs, min_count=10, k=5).collect()
        assert (top[0]["w1"], top[0]["w2"]) == ("new", "york")
        assert top[0]["pmi"] > 0

    def test_pmi_survives_degenerate_docs(self, spark):
        # single-token / empty / null docs used to crash: sequence(1, size-1)
        # descends to [1, 0] and indexes ws[-1]/ws[1] out of bounds under
        # ANSI mode (round-3 ADVICE item). They must contribute no bigrams.
        rows = [("x", "new york " + "a b c d " * 3)] * 12
        rows += [("e", ""), ("s", "lonely"), ("n", None), ("w", " ")]
        docs = spark.createDataFrame(rows, "doc_id string, text string")
        top = pmi_collocations(docs, min_count=10, k=5).collect()
        assert (top[0]["w1"], top[0]["w2"]) == ("new", "york")
        assert all("lonely" not in (r["w1"], r["w2"]) for r in top)


class TestCms:
    def test_one_sided_error(self, spark):
        from knowledgegraphbuilder_spark.operators.sketches import cms_topk
        from pyspark.sql import functions as F

        # 5000 distinct keys over 4x1024 counters: collisions guaranteed
        df = spark.range(5000).select(F.col("id"))
        top = cms_topk(df, "cast(id as string)", k=50).collect()
        assert all(r["est_cnt"] >= r["exact_cnt"] for r in top)

    def test_exact_when_sparse(self, spark):
        from knowledgegraphbuilder_spark.operators.sketches import cms_topk
        from pyspark.sql import functions as F

        # 30 keys with skewed counts: no collisions -> est == exact, and the
        # heavy hitter surfaces first
        df = spark.range(300).select((F.col("id") % 30).alias("k")).unionAll(
            spark.range(100).select(F.lit(7).alias("k"))
        )
        top = cms_topk(df, "cast(k as string)", k=5).collect()
        assert top[0]["key"] == "7" and top[0]["est_cnt"] == top[0]["exact_cnt"] == 110


class TestRrfAndSplit:
    def test_rrf_prefers_docs_on_both_legs(self, spark):
        from knowledgegraphbuilder_spark.operators.textsearch import rrf_fuse

        lex = spark.createDataFrame(
            [("a", 3.0), ("b", 2.0), ("c", 1.0)], "doc_id string, score double"
        )
        dense = spark.createDataFrame(
            [("b", 0.9), ("d", 0.8)], "doc_id string, score double"
        )
        got = rrf_fuse([lex, dense], k=4).collect()
        # b: 1/62 + 1/61 beats a: 1/61 alone
        assert got[0]["doc_id"] == "b"
        assert abs(got[0]["rrf"] - round(1 / 62 + 1 / 61, 6)) < 1e-9
        assert {r["doc_id"] for r in got} == {"a", "b", "c", "d"}

    def test_split_stable_and_complete(self, spark):
        from knowledgegraphbuilder_spark.operators.curation import stratified_split
        from pyspark.sql import functions as F

        docs = spark.range(2000).select(
            F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("lang")
        )
        s1 = stratified_split(docs)
        s2 = stratified_split(docs.repartition(17))
        assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))
        frac = {r["split"]: r["n"] for r in s1.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert abs(frac["train"] / 2000 - 0.80) < 0.04
        assert frac["train"] + frac["val"] + frac["test"] == 2000

    def test_split_assignment_survives_corpus_growth(self, spark):
        from knowledgegraphbuilder_spark.operators.curation import stratified_split
        from pyspark.sql import functions as F

        small = spark.range(100).select(F.col("id").alias("doc_id"), F.lit("en").alias("lang"))
        big = spark.range(1000).select(F.col("id").alias("doc_id"), F.lit("en").alias("lang"))
        a = {r["doc_id"]: r["split"] for r in stratified_split(small).collect()}
        b = {r["doc_id"]: r["split"] for r in stratified_split(big).collect()}
        assert all(b[k] == v for k, v in a.items())


class TestKmeans:
    def test_partition_invariance(self, spark):
        # the whole point of quantized Lloyd: byte-identical under any layout
        from knowledgegraphbuilder_spark.operators.clustering import kmeans_quantized

        embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        a = sorted(map(tuple, kmeans_quantized(embs.repartition(1), k=4, iters=2).collect()))
        b = sorted(map(tuple, kmeans_quantized(embs.repartition(13), k=4, iters=2).collect()))
        assert a == b and len(a) > 0

    def test_separated_blobs_recovered(self, spark):
        # two tight blobs far apart: 2-means must split them exactly
        from pyspark.sql import functions as F
        from knowledgegraphbuilder_spark.operators.clustering import kmeans_quantized

        rows = [(i, [10.0 + 0.01 * (i % 5), 10.0]) for i in range(20)]
        rows += [(100 + i, [-10.0 - 0.01 * (i % 5), -10.0]) for i in range(20)]
        embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = kmeans_quantized(embs, k=2, iters=2).collect()
        by_cluster = {}
        for r in got:
            by_cluster.setdefault(r["cluster"], set()).add(int(r["id"]))
        groups = sorted(by_cluster.values(), key=min)
        assert groups == [set(range(20)), {100 + i for i in range(20)}]

    def test_iterations_tighten_inertia(self, spark):
        from pyspark.sql import functions as F
        from knowledgegraphbuilder_spark.operators.clustering import kmeans_quantized

        embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        i0 = kmeans_quantized(embs, k=4, iters=0).agg(F.sum("d2")).collect()[0][0]
        i2 = kmeans_quantized(embs, k=4, iters=2).agg(F.sum("d2")).collect()[0][0]
        assert i2 <= i0  # Lloyd never increases inertia

    def test_dd_resolve_plants_resolve_to_original(self, spark):
        # q_dd_resolve: planted duplicates don't exist in the raw table, but
        # near-identical docs cluster; every cluster rep is its own canonical
        import __spark_entry__ as entry

        out = entry.q_dd_resolve(spark, "/root/testdata/sf0.001").collect()
        canon = {r["doc_id"]: r["canonical_id"] for r in out}
        dups = [r for r in out if r["is_dup"]]
        # representatives map to themselves
        for r in out:
            assert canon[r["canonical_id"]] == r["canonical_id"]
        # dedup keeps exactly one doc per cluster
        kept = {r["doc_id"] for r in out if not r["is_dup"]}
        assert set(canon.values()) <= kept


class TestStreamingHll:
    def test_streamed_registers_equal_batch_and_replay_is_noop(self, spark, tmp_path):
        import glob

        from pyspark.sql import functions as F
        from knowledgegraphbuilder_spark.operators.sketches import hll_registers
        from knowledgegraphbuilder_spark.streaming.ingest import run_hll_available_now

        ev = spark.range(3000).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 700).alias("user_id"),
            F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias("event_type"),
        )
        base = str(tmp_path)
        for i in range(3):
            (ev.filter((F.col("event_id") % 3) == i)
             .coalesce(1).write.mode("overwrite").parquet(f"{base}/in/b{i}"))
        run_hll_available_now(spark, f"{base}/in/*", f"{base}/regs", f"{base}/ck")
        streamed = sorted(map(tuple, spark.read.parquet(f"{base}/regs").collect()))
        batch = sorted(map(tuple, hll_registers(
            ev, "event_type", "cast(user_id as string)").collect()))
        assert streamed == batch  # mergeability: batch boundaries invisible
        # replay with a fresh checkpoint: max-merge must be a no-op
        run_hll_available_now(spark, f"{base}/in/*", f"{base}/regs", f"{base}/ck2")
        again = sorted(map(tuple, spark.read.parquet(f"{base}/regs").collect()))
        assert again == streamed


class TestBloom:
    def test_no_false_negatives_and_probe_counts(self, spark):
        from pyspark.sql import functions as F
        from knowledgegraphbuilder_spark.operators.sketches import (
            BLOOM_K, bloom_build, bloom_probe,
        )

        members = spark.range(200).select(
            F.concat(F.lit("m"), F.col("id")).alias("doc_id"),
            F.concat(F.lit("text-"), F.col("id")).alias("text"),
        )
        others = spark.range(500).select(
            F.concat(F.lit("o"), F.col("id")).alias("doc_id"),
            F.concat(F.lit("other-"), F.col("id")).alias("text"),
        )
        bloom = bloom_build(members, "text")
        hits = {r["id"]: r["hits"] for r in
                bloom_probe(members.unionByName(others), bloom, "text").collect()}
        # one-sided: every member has ALL bits set
        assert all(hits[f"m{i}"] == BLOOM_K for i in range(200))
        # filter is far from saturated at 200 keys / 32768 bits: FP rate ~0
        fp = sum(1 for i in range(500) if hits[f"o{i}"] == BLOOM_K)
        assert fp <= 2


class TestSssp:
    def test_weighted_path_beats_direct_edge(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import sssp_hops

        # a-b(1), b-c(1), a-c(5): best a->c is 2 via b
        e = spark.createDataFrame(
            [("a", "b", 1), ("b", "c", 1), ("a", "c", 5)],
            "src string, dst string, weight long",
        )
        got = {r["node"]: r["dist"] for r in sssp_hops(e, _seeds(spark, ["a"]), rounds=4).collect()}
        assert got == {"a": 0, "b": 1, "c": 2}

    def test_round_cap_bounds_path_length(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import sssp_hops

        # chain of weight-1 edges: rounds=2 only relaxes 2 hops deep
        e = spark.createDataFrame(
            [("a", "b", 1), ("b", "c", 1), ("c", "d", 1)],
            "src string, dst string, weight long",
        )
        got = {r["node"]: r["dist"] for r in sssp_hops(e, _seeds(spark, ["a"]), rounds=2).collect()}
        assert got == {"a": 0, "b": 1, "c": 2}

    def test_multi_source_min(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import sssp_hops

        e = spark.createDataFrame(
            [("a", "b", 10), ("z", "b", 1)], "src string, dst string, weight long"
        )
        got = {r["node"]: r["dist"] for r in sssp_hops(e, _seeds(spark, ["a", "z"]), rounds=3).collect()}
        assert got["b"] == 1 and got["a"] == 0 and got["z"] == 0


class TestHits:
    def test_bipartite_star(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import hits_scores

        # c1 -> {s1, s2}; c2 -> {s1}. Round 1: a(s1)=2, a(s2)=1;
        # h(c1)=3, h(c2)=2. Round 2: a(s1)=h(c1)+h(c2)=5, a(s2)=h(c1)=3;
        # h(c1)=a(s1)+a(s2)=8, h(c2)=a(s1)=5.
        e = spark.createDataFrame(
            [("c1", "s1"), ("c1", "s2"), ("c2", "s1")], "src string, dst string"
        )
        got = {r["node"]: (r["hub"], r["auth"]) for r in hits_scores(e, rounds=2).collect()}
        assert got == {"c1": (8, 0), "c2": (5, 0), "s1": (0, 5), "s2": (0, 3)}

    def test_rounds_zero_is_degree_free_identity(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import hits_scores

        e = spark.createDataFrame([("a", "b")], "src string, dst string")
        got = {r["node"]: (r["hub"], r["auth"]) for r in hits_scores(e, rounds=1).collect()}
        # one round: a(b)=1, h(a)=1
        assert got == {"a": (1, 0), "b": (0, 1)}


class TestWalks:
    def _edges(self, spark):
        return spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")], "src string, dst string"
        )

    def test_walks_follow_edges_and_are_deterministic(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import deterministic_walks

        e = self._edges(spark)
        seeds = spark.createDataFrame([("a",), ("d",)], "node string")
        nbrs = {}
        for r in e.collect():
            nbrs.setdefault(r["src"], set()).add(r["dst"])
            nbrs.setdefault(r["dst"], set()).add(r["src"])
        w1 = deterministic_walks(e, seeds, length=3).collect()
        w2 = deterministic_walks(e, seeds, length=3).collect()
        assert sorted(map(tuple, w1)) == sorted(map(tuple, w2))
        by_walk = {}
        for r in w1:
            by_walk.setdefault(r["seed"], {})[r["step"]] = r["node"]
        for seed, steps in by_walk.items():
            assert steps[0] == seed
            assert sorted(steps) == list(range(4))  # no dead ends here
            for t in range(1, 4):
                assert steps[t] in nbrs[steps[t - 1]]

    def test_dead_end_stops_walk(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import deterministic_walks

        # isolated seed: only step 0 emitted
        e = spark.createDataFrame([("x", "y")], "src string, dst string")
        seeds = spark.createDataFrame([("z",)], "node string")
        rows = deterministic_walks(e, seeds, length=2).collect()
        assert [(r["seed"], r["step"], r["node"]) for r in rows] == [("z", 0, "z")]


class TestStreamingCms:
    def test_summed_batch_sketches_equal_batch_and_replay_is_noop(self, spark, tmp_path):
        from pyspark.sql import functions as F
        from knowledgegraphbuilder_spark.operators.sketches import cms_sketch
        from knowledgegraphbuilder_spark.streaming.ingest import run_cms_available_now

        ev = spark.range(3000).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 97).alias("user_id"),
            F.lit("t").alias("event_type"),
        )
        base = str(tmp_path)
        # contiguous event_id ranges -> distinct content-derived batch keys
        for i in range(3):
            (ev.filter((F.col("event_id") >= i * 1000)
                       & (F.col("event_id") < (i + 1) * 1000))
             .coalesce(1).write.mode("overwrite").parquet(f"{base}/in/b{i}"))
        run_cms_available_now(spark, f"{base}/in/*", f"{base}/sk", f"{base}/ck")
        state = sorted(map(tuple, spark.read.parquet(f"{base}/sk").collect()))
        # one sketch per batch, keyed by a content digest of the batch
        assert len({r[0] for r in state}) == 3
        total = sorted(map(tuple, (
            spark.read.parquet(f"{base}/sk")
            .groupBy("row", "col").agg(F.sum("cnt").cast("long").alias("cnt"))
            .collect()
        )))
        batch = sorted(map(tuple, cms_sketch(
            ev, "cast(user_id as string)").collect()))
        assert total == batch  # additivity: batch boundaries invisible
        # replay against a fresh checkpoint: replace-by-batch-key is a no-op
        run_cms_available_now(spark, f"{base}/in/*", f"{base}/sk", f"{base}/ck2")
        again = sorted(map(tuple, spark.read.parquet(f"{base}/sk").collect()))
        assert again == state

    def test_distinct_batches_sharing_min_event_id_both_counted(self, spark, tmp_path):
        # round-3 ADVICE: keying by min(event_id) alone lets two distinct
        # batches with the same min silently overwrite each other under
        # replace-MERGE. Content-digest keys must keep both.
        from pyspark.sql import functions as F
        from knowledgegraphbuilder_spark.operators.sketches import cms_sketch
        from knowledgegraphbuilder_spark.streaming.ingest import run_cms_available_now

        ev = spark.range(200).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 13).alias("user_id"),
            F.lit("t").alias("event_type"),
        )
        base = str(tmp_path)
        # both files contain event_id 0 -> identical min, different content
        a = ev.filter(F.col("event_id") < 100)
        b = ev.filter((F.col("event_id") == 0) | (F.col("event_id") >= 100))
        a.coalesce(1).write.parquet(f"{base}/in/a")
        b.coalesce(1).write.parquet(f"{base}/in/b")
        run_cms_available_now(spark, f"{base}/in/*", f"{base}/sk", f"{base}/ck")
        assert spark.read.parquet(f"{base}/sk").select("bkey").distinct().count() == 2
        total = sorted(map(tuple, (
            spark.read.parquet(f"{base}/sk")
            .groupBy("row", "col").agg(F.sum("cnt").cast("long").alias("cnt"))
            .collect()
        )))
        both = sorted(map(tuple, cms_sketch(
            a.unionAll(b), "cast(user_id as string)").collect()))
        assert total == both


class TestHdrQuantiles:
    def test_error_bound_and_monotonic(self, spark):
        from pyspark.sql import functions as F
        from knowledgegraphbuilder_spark.operators.sketches import (
            HDR_SUB_BITS, hdr_quantiles,
        )

        # skewed positive integers: v = (i % 97 + 1)^2 * (1 + i % 7)
        df = spark.range(20_000).select(
            (((F.col("id") % 97 + 1) * (F.col("id") % 97 + 1))
             * (F.lit(1) + F.col("id") % 7)).alias("x")
        )
        got = {r.q: r.est for r in hdr_quantiles(df, "x").collect()}
        exact = df.selectExpr(
            *[f"percentile_disc({q}) WITHIN GROUP (ORDER BY x) AS p{i}"
              for i, q in enumerate([0.25, 0.5, 0.75, 0.9, 0.99])]
        ).collect()[0]
        rel = 2.0 ** -HDR_SUB_BITS
        ests = [got[q] for q in sorted(got)]
        assert ests == sorted(ests)  # quantiles are monotone
        for i, q in enumerate([0.25, 0.5, 0.75, 0.9, 0.99]):
            # est is the bucket lower bound: est <= exact < est*(1+2*rel)
            assert got[q] <= exact[i] < got[q] * (1 + 2 * rel) + 1

    def test_sketch_merges_by_summing(self, spark):
        from pyspark.sql import functions as F
        from knowledgegraphbuilder_spark.operators.sketches import hdr_histogram

        df = spark.range(5_000).select((F.col("id") * 37 % 9973 + 1).alias("x"))
        a = hdr_histogram(df.filter(F.col("x") % 2 == 0), "x")
        b = hdr_histogram(df.filter(F.col("x") % 2 == 1), "x")
        merged = sorted(map(tuple, (
            a.unionByName(b).groupBy("b", "hi")
            .agg(F.sum("cnt").cast("long").alias("cnt")).collect()
        )))
        whole = sorted(map(tuple, hdr_histogram(df, "x").collect()))
        assert merged == whole
