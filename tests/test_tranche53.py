"""Unit tests for the tranche-53 operators: BFS path reconstruction
(shortest_paths) and metadata-filtered vector top-k (topk_filtered)."""

import pyspark.sql.functions as F


class TestShortestPaths:
    def test_line_graph_paths(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import (
            shortest_paths,
        )

        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
        )
        got = {
            r["node"]: (r["hop"], r["path"])
            for r in shortest_paths(edges, "a", max_hops=3).collect()
        }
        assert got == {
            "a": (0, "a"),
            "b": (1, "a>b"),
            "c": (2, "a>b>c"),
            "d": (3, "a>b>c>d"),
        }

    def test_min_path_recurrence_tiebreak(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import (
            shortest_paths,
        )

        # two 2-hop routes s->m1->t and s->m2->t: the stored path must be
        # the lexicographic min over parents at the frontier round
        edges = spark.createDataFrame(
            [("s", "m1"), ("s", "m2"), ("m1", "t"), ("m2", "t")],
            "src string, dst string",
        )
        got = {
            r["node"]: (r["hop"], r["path"])
            for r in shortest_paths(edges, "s", max_hops=2).collect()
        }
        assert got["t"] == (2, "s>m1>t")
        assert got["m1"] == (1, "s>m1")
        assert got["m2"] == (1, "s>m2")

    def test_hop_cap_and_undirected(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import (
            shortest_paths,
        )

        # directed input b->a must still reach a from seed a's perspective
        edges = spark.createDataFrame(
            [("b", "a"), ("c", "b"), ("d", "c")], "src string, dst string"
        )
        rows = shortest_paths(edges, "a", max_hops=2).collect()
        got = {r["node"]: r["hop"] for r in rows}
        assert got == {"a": 0, "b": 1, "c": 2}  # d is 3 hops: capped out

    def test_isolated_seed(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import (
            shortest_paths,
        )

        edges = spark.createDataFrame(
            [("x", "y")], "src string, dst string"
        )
        rows = shortest_paths(edges, "z", max_hops=3).collect()
        assert [(r["node"], r["hop"], r["path"]) for r in rows] == [
            ("z", 0, "z")
        ]


class TestTopkFiltered:
    def test_prefilter_keeps_k_hits(self, spark):
        from knowledgegraphbuilder_spark.operators.ann import topk_filtered

        # vectors 0..9: ids 0-4 label 0, ids 5-9 label 1. Query == vec 0.
        rows = [
            (i, [1.0, 0.0] if i < 5 else [0.9, 0.1], i // 5)
            for i in range(10)
        ]
        embs = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        # post-filtering a global top-3 for label=1 could return fewer
        # than 3 (labels 0 dominate); the pre-filter contract returns 3
        got = topk_filtered(
            embs, [1.0, 0.0], F.col("label") == 1, k=3
        ).collect()
        assert len(got) == 3
        assert all(g["id"] in {"5", "6", "7", "8", "9"} for g in got)
        # deterministic tie-break on id among equal scores
        assert [g["id"] for g in got] == ["5", "6", "7"]

    def test_filter_matches_manual_subset(self, spark):
        from knowledgegraphbuilder_spark.operators.ann import (
            topk_bruteforce, topk_filtered,
        )

        rows = [
            (i, [float(i % 3) + 1.0, float(i % 7)], i % 2)
            for i in range(40)
        ]
        embs = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        q = [1.0, 2.0]
        a = topk_filtered(embs, q, "label = 0", k=5).collect()
        b = topk_bruteforce(embs.filter("label = 0"), q, k=5).collect()
        assert [(r["id"], r["score"]) for r in a] == [
            (r["id"], r["score"]) for r in b
        ]


class TestBetweenness:
    def test_diamond_hand_computed(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import (
            betweenness_contrib,
        )

        # a-b-c, a-d-c: sigma(c)=2; delta(b)=delta(d)=0.5, delta(a)=3.0
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("a", "d"), ("d", "c")],
            "src string, dst string",
        )
        got = {
            r["node"]: (r["lvl"], r["sigma"], r["delta"])
            for r in betweenness_contrib(edges, "a", max_hops=3).collect()
        }
        assert got == {
            "a": (0, 1, 3.0),
            "b": (1, 1, 0.5),
            "d": (1, 1, 0.5),
            "c": (2, 2, 0.0),
        }

    def test_truncation_drops_deeper_dependency(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import (
            betweenness_contrib,
        )

        # line a-b-c-d with max_hops=2: d is outside the horizon, so b's
        # delta counts only c (1.0), not c+d (2.0 in untruncated Brandes)
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
        )
        got = {
            r["node"]: (r["lvl"], r["sigma"], r["delta"])
            for r in betweenness_contrib(edges, "a", max_hops=2).collect()
        }
        assert got == {
            "a": (0, 1, 2.0),
            "b": (1, 1, 1.0),
            "c": (2, 1, 0.0),
        }

    def test_sigma_counts_parallel_shortest_paths(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import (
            betweenness_contrib,
        )

        # k=3 middle nodes: sigma(t)=3, each middle delta=1/3
        edges = spark.createDataFrame(
            [("s", m) for m in ("m1", "m2", "m3")]
            + [(m, "t") for m in ("m1", "m2", "m3")],
            "src string, dst string",
        )
        got = {
            r["node"]: (r["sigma"], r["delta"])
            for r in betweenness_contrib(edges, "s", max_hops=2).collect()
        }
        assert got["t"] == (3, 0.0)
        assert got["m1"] == (1, round(1.0 / 3.0, 6))
        assert got["s"][1] == round(3 * (1 + 1.0 / 3.0), 6)


class TestGreedyMatching:
    def test_path4_matches_in_two_rounds(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import (
            greedy_matching,
        )

        # a-b-c-d: round 1 handshake (a,b); residual c-d matches round 2
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
        )
        got = sorted(
            (r["u"], r["v"], r["round"])
            for r in greedy_matching(edges, rounds=3).collect()
        )
        assert got == [("a", "b", 1), ("c", "d", 2)]

    def test_is_a_matching_no_repeated_endpoint(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import (
            greedy_matching,
        )

        import itertools

        # K5 on nodes n0..n4: any output must be a matching
        nodes = [f"n{i}" for i in range(5)]
        edges = spark.createDataFrame(
            list(itertools.combinations(nodes, 2)), "src string, dst string"
        )
        rows = greedy_matching(edges, rounds=3).collect()
        ends = [x for r in rows for x in (r["u"], r["v"])]
        assert len(ends) == len(set(ends))
        assert len(rows) == 2  # K5 perfect-minus-one: 2 pairs, 1 leftover

    def test_empty_graph_schema_stable(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import (
            greedy_matching,
        )

        edges = spark.createDataFrame([], "src string, dst string")
        got = greedy_matching(edges, rounds=3)
        assert got.columns == ["u", "v", "round"]
        assert got.count() == 0


class TestContractGraph:
    def test_path4_contracts_to_single_edge(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import (
            contract_graph, greedy_matching,
        )

        # a-b-c-d matches {(a,b),(c,d)}; both b-c endpoints re-key to the
        # pair minima -> one coarse edge (a, c) with weight 1
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
        )
        got = [
            (r["u"], r["v"], r["weight"])
            for r in contract_graph(edges, greedy_matching(edges)).collect()
        ]
        assert got == [("a", "c", 1)]

    def test_parallel_edges_sum_weights(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import (
            contract_graph,
        )

        # matching (a,b) and (c,d): original edges a-c, a-d, b-c all
        # collapse onto coarse pair (a, c) -> weight 3; b-a self-loop drops
        edges = spark.createDataFrame(
            [("a", "c"), ("a", "d"), ("b", "c"), ("b", "a")],
            "src string, dst string",
        )
        matching = spark.createDataFrame(
            [("a", "b", 1), ("c", "d", 1)], "u string, v string, round int"
        )
        got = [
            (r["u"], r["v"], r["weight"])
            for r in contract_graph(edges, matching).collect()
        ]
        assert got == [("a", "c", 3)]

    def test_empty_matching_is_identity_with_weights(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import (
            contract_graph,
        )

        edges = spark.createDataFrame(
            [("a", "b"), ("b", "a"), ("b", "c")], "src string, dst string"
        )
        matching = spark.createDataFrame([], "u string, v string, round int")
        got = sorted(
            (r["u"], r["v"], r["weight"])
            for r in contract_graph(edges, matching).collect()
        )
        # a-b and b-a dedupe to one canonical edge of weight 1
        assert got == [("a", "b", 1), ("b", "c", 1)]


class TestSchemaInduction:
    def test_counts_and_conditional_share(self, spark):
        from knowledgegraphbuilder_spark.operators.graph_build import (
            schema_induction,
        )

        mentions = spark.createDataFrame(
            [("m1", "PER"), ("m2", "ORG"), ("m3", "PER"), ("m4", "LOC")],
            "mention_id string, label string",
        )
        relations = spark.createDataFrame(
            [
                ("d1", "m1", "m2", "works_at"),
                ("d2", "m3", "m2", "works_at"),
                ("d2", "m1", "m4", "born_in"),
            ],
            "doc_id string, head_mention_id string,"
            " tail_mention_id string, rel_type string",
        )
        got = {
            (r["head_label"], r["rel_type"], r["tail_label"]): (
                r["n_rels"], r["n_docs"], r["share_head"]
            )
            for r in schema_induction(relations, mentions).collect()
        }
        assert got == {
            ("PER", "works_at", "ORG"): (2, 2, round(2 / 3, 6)),
            ("PER", "born_in", "LOC"): (1, 1, round(1 / 3, 6)),
        }


class TestWoeIv:
    def test_hand_computed_two_bins(self, spark):
        import math

        from knowledgegraphbuilder_spark.operators.mlstats import woe_iv

        # x<5 -> bin 0 (3 pos, 1 neg); x>=5 -> bin 1 (1 pos, 3 neg)
        rows = [(0.0, 1), (1.0, 1), (2.0, 1), (3.0, 0),
                (7.0, 0), (8.0, 0), (9.0, 0), (10.0, 1)]
        df = spark.createDataFrame(rows, "value double, y int")
        got = {
            r["bin"]: r for r in woe_iv(df, "value", "y = 1", n_bins=2).collect()
        }
        g, b, k = 4, 4, 2
        pg0, pb0 = (3 + 0.5) / (g + 0.5 * k), (1 + 0.5) / (b + 0.5 * k)
        woe0 = math.log(pg0 / pb0)
        assert got[0]["n"] == 4 and got[0]["n_pos"] == 3
        assert got[0]["woe"] == round(woe0, 6)
        assert got[0]["iv_term"] == round((pg0 - pb0) * woe0, 6)
        # symmetric bins: iv_total = 2 * |iv_term|
        assert got[0]["iv_total"] == round(2 * (pg0 - pb0) * woe0, 6)
        assert got[1]["iv_total"] == got[0]["iv_total"]

    def test_constant_feature_single_bin_zero_iv(self, spark):
        from knowledgegraphbuilder_spark.operators.mlstats import woe_iv

        df = spark.createDataFrame(
            [(5.0, i % 2) for i in range(10)], "value double, y int"
        )
        rows = woe_iv(df, "value", "y = 1", n_bins=10).collect()
        assert len(rows) == 1 and rows[0]["bin"] == 0
        assert rows[0]["woe"] == 0.0 and rows[0]["iv_total"] == 0.0


class TestMaximalIndependentSet:
    def test_path5_picks_isolated_residual_node(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import (
            maximal_independent_set,
        )

        # a-b-c-d-e: round1 picks a (gone a,b); round2 picks c (gone c,d);
        # e is then ISOLATED in the residual and must join in round 3
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
            "src string, dst string",
        )
        got = {
            r["node"]: r["round"]
            for r in maximal_independent_set(edges, rounds=4).collect()
        }
        assert got == {"a": 1, "c": 2, "e": 3}

    def test_star_picks_all_leaves_one_round(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import (
            maximal_independent_set,
        )

        # center 'z' loses every local-min contest; both leaves join at once
        edges = spark.createDataFrame(
            [("z", "a"), ("z", "b")], "src string, dst string"
        )
        got = {
            r["node"]: r["round"]
            for r in maximal_independent_set(edges, rounds=4).collect()
        }
        assert got == {"a": 1, "b": 1}

    def test_independence_and_maximality_on_k33(self, spark):
        from knowledgegraphbuilder_spark.operators.graphstats import (
            maximal_independent_set,
        )

        left, right = ["a1", "a2", "a3"], ["b1", "b2", "b3"]
        edges = spark.createDataFrame(
            [(l, r) for l in left for r in right], "src string, dst string"
        )
        mis = {r["node"] for r in maximal_independent_set(edges, rounds=4).collect()}
        # K3,3: MIS is one full side; local-min picks the 'a' side
        assert mis == set(left)


class TestFunctionalViolations:
    def test_multi_object_subject_flagged(self, spark):
        from knowledgegraphbuilder_spark.operators.graph_build import (
            functional_violations,
        )

        triples = spark.createDataFrame(
            [
                ("alice", "born_in", "paris", "d1"),
                ("alice", "born_in", "lyon", "d2"),
                ("alice", "born_in", "paris", "d3"),
                ("bob", "born_in", "rome", "d1"),
                ("alice", "works_at", "acme", "d1"),
            ],
            "subj string, pred string, obj string, doc_id string",
        )
        rows = functional_violations(triples).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["pred"], r["subj"]) == ("born_in", "alice")
        assert r["n_objs"] == 2 and r["n_rows"] == 3
        assert r["example_objs"] == "lyon,paris"

    def test_example_list_bounded(self, spark):
        from knowledgegraphbuilder_spark.operators.graph_build import (
            functional_violations,
        )

        triples = spark.createDataFrame(
            [("s", "p", f"o{i}", "d") for i in range(9)],
            "subj string, pred string, obj string, doc_id string",
        )
        r = functional_violations(triples, max_examples=3).collect()[0]
        assert r["n_objs"] == 9
        assert r["example_objs"] == "o0,o1,o2"


class TestTargetEncoding:
    def test_shrinks_rare_category_toward_prior(self, spark):
        from knowledgegraphbuilder_spark.operators.mlstats import (
            target_encoding,
        )

        # cat 'big': 50 rows, 40 pos; cat 'rare': 1 row, 1 pos
        rows = [("big", 1 if i < 40 else 0) for i in range(50)] + [("rare", 1)]
        df = spark.createDataFrame(rows, "cat string, y int")
        got = {
            r["category"]: r
            for r in target_encoding(df, "cat", "y = 1", alpha=10.0).collect()
        }
        prior = 41 / 51
        assert got["big"]["prior"] == round(prior, 6)
        assert got["big"]["enc"] == round((40 + 10 * prior) / 60, 6)
        # the one-row category lands near the prior, not at 1.0
        assert got["rare"]["enc"] == round((1 + 10 * prior) / 11, 6)
        assert abs(got["rare"]["enc"] - prior) < 0.02


class TestKeynessLlr:
    def test_overused_token_positive_direction(self, spark):
        import math

        from knowledgegraphbuilder_spark.operators.textstats import (
            keyness_llr,
        )

        # focus docs say 'spark' a lot; rest says 'duck'
        docs = spark.createDataFrame(
            [("f", "spark spark spark common"),
             ("r", "duck duck common common")],
            "source string, text string",
        )
        got = {r["token"]: r for r in
               keyness_llr(docs, "source = 'f'", top_k=10).collect()}
        assert got["spark"]["direction"] == 1
        assert got["duck"]["direction"] == -1
        # hand-check G2 for 'spark': a=3,b=0,c=4,d=4 -> E1=1.5
        g2 = 2 * (3 * math.log(3 / 1.5))
        assert got["spark"]["g2"] == round(g2, 6)
        # balanced token carries ~zero keyness ('common': a=1,b=2 vs c=4,d=4)
        assert abs(got["common"]["g2"]) < got["spark"]["g2"]

    def test_zero_cells_contribute_zero(self, spark):
        from knowledgegraphbuilder_spark.operators.textstats import (
            keyness_llr,
        )

        docs = spark.createDataFrame(
            [("f", "only"), ("r", "other")], "source string, text string"
        )
        rows = keyness_llr(docs, "source = 'f'", top_k=10).collect()
        assert all(r["g2"] is not None for r in rows)


class TestBigramNext:
    def test_argmax_and_tiebreak(self, spark):
        from knowledgegraphbuilder_spark.operators.textstats import (
            bigram_next,
        )

        # 'a b' x2, 'a c' x2 (tie -> min next 'b'), 'b z' x1
        docs = spark.createDataFrame(
            [(1, "a b z"), (2, "a b"), (3, "a c"), (4, "a c")],
            "doc_id long, text string",
        )
        got = {r["head"]: r for r in bigram_next(docs).collect()}
        assert got["a"]["next_tok"] == "b"
        assert got["a"]["cnt"] == 2 and got["a"]["total"] == 4
        assert got["a"]["prob"] == 0.5
        assert got["b"]["next_tok"] == "z" and got["b"]["total"] == 1

    def test_single_token_docs_ignored(self, spark):
        from knowledgegraphbuilder_spark.operators.textstats import (
            bigram_next,
        )

        docs = spark.createDataFrame(
            [(1, "solo"), (2, "x y")], "doc_id long, text string"
        )
        got = {r["head"]: r["next_tok"] for r in bigram_next(docs).collect()}
        assert got == {"x": "y"}


class TestGrowthCurve:
    def test_first_appearance_and_cumsum(self, spark):
        from knowledgegraphbuilder_spark.operators.graph_build import (
            growth_curve,
        )

        # 10 docs, 2 buckets of 5 with n_buckets=2: doc_0..4 -> b0, 5..9 -> b1
        triples = spark.createDataFrame(
            [
                ("a", "p", "b", "doc_0"),
                ("a", "p", "b", "doc_7"),   # triple NOT new in b1
                ("a", "p", "c", "doc_8"),   # new triple, new node c
                ("d", "q", "a", "doc_9"),   # new triple, new node d
            ],
            "subj string, pred string, obj string, doc_id string",
        )
        got = {
            r["bucket"]: r
            for r in growth_curve(triples, n_docs=10, n_buckets=2).collect()
        }
        assert got[0]["n_new_nodes"] == 2 and got[0]["n_new_triples"] == 1
        assert got[1]["n_new_nodes"] == 2 and got[1]["n_new_triples"] == 2
        assert got[1]["cum_nodes"] == 4 and got[1]["cum_triples"] == 3

    def test_last_bucket_clamped(self, spark):
        from knowledgegraphbuilder_spark.operators.graph_build import (
            growth_curve,
        )

        triples = spark.createDataFrame(
            [("x", "p", "y", "doc_9")],
            "subj string, pred string, obj string, doc_id string",
        )
        # n_docs=10, n_buckets=10: doc_9 -> floor(10*9/10)=9, clamp no-op;
        # doc_id beyond range would clamp to 9 as well. The shell keeps
        # all 10 buckets visible with zero-new flat segments.
        rows = {r["bucket"]: r for r in
                growth_curve(triples, n_docs=10, n_buckets=10).collect()}
        assert sorted(rows) == list(range(10))
        assert rows[9]["n_new_nodes"] == 2 and rows[9]["n_new_triples"] == 1
        assert rows[0]["n_new_nodes"] == 0 and rows[0]["cum_nodes"] == 0
        assert rows[9]["cum_nodes"] == 2 and rows[9]["cum_triples"] == 1


class TestCosineLinkEdges:
    def test_variant_surfaces_link_with_high_cosine(self, spark):
        from knowledgegraphbuilder_spark.operators.link import (
            cosine_link_edges,
        )

        mentions = spark.createDataFrame(
            [("anthropic corp",), ("anthropic corps",), ("_anthropic corp",),
             ("zzz qqq xxx",)],
            "text string",
        )
        rows = cosine_link_edges(mentions, cos_threshold=0.3).collect()
        pairs = {(r["src"], r["dst"]): r["cosine"] for r in rows}
        assert ("anthropic corp", "anthropic corps") in pairs
        assert pairs[("anthropic corp", "anthropic corps")] > 0.8
        # the unrelated surface never shares a band with the variants
        assert not any("zzz" in a or "zzz" in b for a, b in pairs)

    def test_threshold_filters(self, spark):
        from knowledgegraphbuilder_spark.operators.link import (
            cosine_link_edges,
        )

        mentions = spark.createDataFrame(
            [("anthropic corp",), ("anthropic corps",)], "text string"
        )
        hi = cosine_link_edges(mentions, cos_threshold=0.999).collect()
        lo = cosine_link_edges(mentions, cos_threshold=0.0).collect()
        assert len(lo) >= 1 and len(hi) <= len(lo)


class TestQuery2Hop:
    def test_typed_path_instances_with_support(self, spark):
        from knowledgegraphbuilder_spark.operators.graph_build import (
            query_2hop,
        )

        triples = spark.createDataFrame(
            [
                ("a", "works_at", "acme", "d1"),
                ("a", "works_at", "acme", "d2"),   # 2 docs of support
                ("acme", "located_in", "paris", "d1"),
                ("b", "works_at", "acme", "d3"),
                ("a", "knows", "b", "d1"),
            ],
            "subj string, pred string, obj string, doc_id string",
        )
        rows = sorted(
            (r["a"], r["b"], r["c"], r["docs_ab"], r["docs_bc"])
            for r in query_2hop(triples, "works_at", "located_in").collect()
        )
        assert rows == [
            ("a", "acme", "paris", 2, 1),
            ("b", "acme", "paris", 1, 1),
        ]

    def test_round_trips_excluded(self, spark):
        from knowledgegraphbuilder_spark.operators.graph_build import (
            query_2hop,
        )

        triples = spark.createDataFrame(
            [("a", "p", "b", "d1"), ("b", "q", "a", "d1")],
            "subj string, pred string, obj string, doc_id string",
        )
        assert query_2hop(triples, "p", "q").count() == 0
