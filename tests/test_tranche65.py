"""TextRank keywords, B-cubed clustering eval, bipartiteness audit."""

import pytest
from pyspark.sql import functions as F

from knowledgegraphbuilder_spark.operators.graphstats import bipartite_check
from knowledgegraphbuilder_spark.operators.mlstats import bcubed_eval
from knowledgegraphbuilder_spark.operators.textstats import textrank_keywords


def rows(df):
    return sorted(tuple(r) for r in df.collect())


# --- TextRank --------------------------------------------------------------

def test_textrank_central_word_wins(spark):
    # 'hub' co-occurs with every other word; peripherals only with hub
    docs = spark.createDataFrame(
        [("hub a hub b hub c hub d",), ("a hub b hub c hub",)],
        "text string",
    )
    got = textrank_keywords(docs, top_k=3)
    top = got.collect()[0]
    assert top["word"] == "hub"
    assert top["score"] > got.collect()[1]["score"]


def test_textrank_scores_sum_to_one(spark):
    docs = spark.createDataFrame(
        [("x y z x y",), ("z x q y",)], "text string"
    )
    got = textrank_keywords(docs, top_k=100)
    total = sum(r["score"] for r in got.collect())
    assert abs(total - 1.0) < 1e-2  # 4dp rounding over few words


def test_textrank_empty_and_single_token_corpus(spark):
    docs = spark.createDataFrame([("solo",), ("",)], "text string")
    assert textrank_keywords(docs).count() == 0


def test_textrank_deterministic_under_repartition(spark):
    docs = spark.createDataFrame(
        [(f"w{i} w{(i * 7) % 13} w{(i * 3) % 13}",) for i in range(40)],
        "text string",
    )
    a = rows(textrank_keywords(docs, top_k=10))
    b = rows(textrank_keywords(docs.repartition(9), top_k=10))
    assert a == b


# --- B-cubed ---------------------------------------------------------------

def test_bcubed_perfect_clustering(spark):
    a = spark.createDataFrame(
        [("1", "c1", "g1"), ("2", "c1", "g1"), ("3", "c2", "g2")],
        "item string, pred string, gold string",
    )
    r = bcubed_eval(a).collect()[0]
    assert r["precision_b3"] == 1.0 and r["recall_b3"] == 1.0
    assert r["f1_b3"] == 1.0 and r["n_items"] == 3


def test_bcubed_overmerged_cluster(spark):
    # one predicted cluster over two gold clusters of sizes 2 and 2:
    # per-item precision = 2/4, recall = 2/2 -> P=0.5, R=1.0
    a = spark.createDataFrame(
        [("1", "c", "g1"), ("2", "c", "g1"), ("3", "c", "g2"), ("4", "c", "g2")],
        "item string, pred string, gold string",
    )
    r = bcubed_eval(a).collect()[0]
    assert r["precision_b3"] == 0.5
    assert r["recall_b3"] == 1.0
    assert abs(r["f1_b3"] - 2 * 0.5 / 1.5) < 1e-6


def test_bcubed_oversplit_cluster(spark):
    # gold cluster of 2 split into singletons: P=1, per-item recall 1/2
    a = spark.createDataFrame(
        [("1", "c1", "g"), ("2", "c2", "g")],
        "item string, pred string, gold string",
    )
    r = bcubed_eval(a).collect()[0]
    assert r["precision_b3"] == 1.0
    assert r["recall_b3"] == 0.5


def test_bcubed_micro_sums_are_exact_integers(spark):
    a = spark.createDataFrame(
        [("1", "c", "g1"), ("2", "c", "g2"), ("3", "c", "g2")],
        "item string, pred string, gold string",
    )
    r = bcubed_eval(a).collect()[0]
    # p_u per item: 1*10^6 DIV 3, 2*10^6 DIV 3 (x2) -> 333333 + 666666*2
    assert r["p_micro_sum"] == 333333 + 2 * 666666
    assert r["r_micro_sum"] == 1_000_000 * 3


# --- Bipartiteness ---------------------------------------------------------

def test_bipartite_even_cycle(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
        "src string, dst string",
    )
    r = bipartite_check(e).collect()
    assert len(r) == 1
    assert r[0]["is_bipartite"] is True and r[0]["n_odd_edges"] == 0
    assert r[0]["n_nodes"] == 4 and r[0]["n_edges"] == 4


def test_bipartite_triangle_has_one_odd_edge(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "src string, dst string"
    )
    r = bipartite_check(e).collect()
    assert r[0]["is_bipartite"] is False
    # BFS from 'a': levels a=0, b=1, c=1 -> exactly edge (b,c) is odd
    assert r[0]["n_odd_edges"] == 1


def test_bipartite_mixed_components(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"),        # triangle
         ("x", "y"), ("y", "z")],                   # path
        "src string, dst string",
    )
    got = {r["component"]: r["is_bipartite"] for r in bipartite_check(e).collect()}
    assert got == {"a": False, "x": True}


def test_bipartite_self_loop_and_duplicate_edges_ignored(spark):
    e = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("b", "a"), ("a", "b")],
        "src string, dst string",
    )
    r = bipartite_check(e).collect()
    assert len(r) == 1
    assert r[0]["n_edges"] == 1 and r[0]["is_bipartite"] is True


# --- partition conductance -------------------------------------------------

from knowledgegraphbuilder_spark.operators.curation import (  # noqa: E402
    k_anonymity_audit,
)
from knowledgegraphbuilder_spark.operators.layout import (  # noqa: E402
    partition_conductance,
)


def test_conductance_invariants(spark):
    e = spark.createDataFrame(
        [(f"n{i}", f"n{(i + 1) % 24}") for i in range(24)]
        + [(f"n{i}", f"n{(i + 7) % 24}") for i in range(24)],
        "src string, dst string",
    )
    got = partition_conductance(e, k=4).collect()
    n_edges = 48
    assert sum(r["n_nodes"] for r in got) == 24
    assert sum(r["vol"] for r in got) == 2 * n_edges
    # every cut edge is charged to exactly two partitions
    assert sum(r["n_cut"] for r in got) % 2 == 0
    assert all(0.0 <= r["conductance"] <= 1.0 for r in got)


def test_conductance_single_partition_graph(spark):
    # k=1: everything internal, no cuts, min(vol, tvol-vol) = 0 -> the
    # operator must not divide by zero for the whole-graph partition
    e = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    got = partition_conductance(e, k=1).collect()
    assert len(got) == 1 and got[0]["n_cut"] == 0


def test_conductance_deterministic(spark):
    e = spark.createDataFrame(
        [(f"x{i}", f"x{i * 3 % 17}") for i in range(1, 17)],
        "src string, dst string",
    )
    a = rows(partition_conductance(e, k=8))
    b = rows(partition_conductance(e.repartition(5), k=8))
    assert a == b


# --- k-anonymity -----------------------------------------------------------

def test_kanonymity_histogram(spark):
    df = spark.createDataFrame(
        [("u1", 30, "a"), ("u2", 30, "a"), ("u3", 30, "a"),
         ("u4", 40, "b"), ("u5", 40, "b"), ("u6", 50, "c")],
        "uid string, age int, zip string",
    )
    got = {r["class_size"]: (r["n_classes"], r["n_rows"], r["at_risk"])
           for r in k_anonymity_audit(df, ["age", "zip"], k=3).collect()}
    assert got == {3: (1, 3, False), 2: (1, 2, True), 1: (1, 1, True)}


def test_kanonymity_all_unique_is_fully_at_risk(spark):
    df = spark.createDataFrame(
        [(f"u{i}", i) for i in range(5)], "uid string, age int"
    )
    got = k_anonymity_audit(df, ["age"], k=2).collect()
    assert len(got) == 1
    assert got[0]["class_size"] == 1 and got[0]["n_rows"] == 5
    assert got[0]["at_risk"] is True


# --- butterfly / cardinality / inverse detection ---------------------------

from knowledgegraphbuilder_spark.operators.graph_build import (  # noqa: E402
    inverse_predicate_detect, predicate_cardinality,
)
from knowledgegraphbuilder_spark.operators.graphstats import (  # noqa: E402
    butterfly_count,
)


def test_butterfly_square_counts_one(spark):
    # two items sharing two groups = exactly one butterfly each
    df = spark.createDataFrame(
        [("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "b")],
        "g string, item string",
    )
    got = {r["item"]: r["n_butterflies"]
           for r in butterfly_count(df, "g", "item").collect()}
    assert got == {"a": 1, "b": 1}


def test_butterfly_three_shared_groups_is_c32(spark):
    df = spark.createDataFrame(
        [(f"g{i}", x) for i in range(3) for x in ("a", "b")],
        "g string, item string",
    )
    got = {r["item"]: r["n_butterflies"]
           for r in butterfly_count(df, "g", "item").collect()}
    assert got == {"a": 3, "b": 3}  # C(3,2)


def test_butterfly_single_shared_group_is_zero(spark):
    df = spark.createDataFrame(
        [("g1", "a"), ("g1", "b")], "g string, item string"
    )
    got = butterfly_count(df, "g", "item").collect()
    assert all(r["n_butterflies"] == 0 for r in got)
    assert all(r["n_pairs"] == 1 for r in got)


def test_predicate_cardinality_classes(spark):
    t = spark.createDataFrame(
        [
            ("a", "one2one", "x"),
            ("a", "one2many", "x"), ("a", "one2many", "y"),
            ("a", "many2one", "z"), ("b", "many2one", "z"),
            ("a", "many2many", "x"), ("a", "many2many", "y"),
            ("b", "many2many", "x"),
        ],
        "subj string, pred string, obj string",
    )
    got = {r["pred"]: r["cardinality"]
           for r in predicate_cardinality(t).collect()}
    assert got == {"one2one": "1:1", "one2many": "1:N",
                   "many2one": "N:1", "many2many": "N:N"}


def test_inverse_detect_finds_exact_inverse_and_symmetric(spark):
    t = spark.createDataFrame(
        [
            ("a", "parent_of", "b"), ("c", "parent_of", "d"),
            ("b", "child_of", "a"), ("d", "child_of", "c"),
            ("x", "sibling", "y"), ("y", "sibling", "x"),
            ("a", "unrelated", "z"),
        ],
        "subj string, pred string, obj string",
    )
    got = {(r["pred_a"], r["pred_b"]): (r["jaccard"], r["axiom"])
           for r in inverse_predicate_detect(t).collect()}
    assert got[("child_of", "parent_of")] == (1.0, "inverse_of")
    assert got[("sibling", "sibling")] == (1.0, "symmetric")
    assert all("unrelated" not in k for pair in got for k in pair)


def test_inverse_detect_partial_overlap_thresholded(spark):
    # rev(p) and q share 1 of 3 statements -> jaccard 1/5 < 0.5: dropped
    t = spark.createDataFrame(
        [
            ("a", "p", "b"), ("c", "p", "d"), ("e", "p", "f"),
            ("b", "q", "a"), ("z", "q", "w"), ("v", "q", "u"),
        ],
        "subj string, pred string, obj string",
    )
    got = inverse_predicate_detect(t, min_jaccard=0.5).collect()
    assert got == []
    low = inverse_predicate_detect(t, min_jaccard=0.1).collect()
    assert len(low) == 1 and low[0]["jaccard"] == 0.2


# --- AMIE-style rule mining ------------------------------------------------

from knowledgegraphbuilder_spark.operators.graph_build import (  # noqa: E402
    mine_composition_rules,
)


def test_rule_mine_finds_perfect_composition(spark):
    # parent_of . parent_of -> grandparent_of holds for both body pairs
    t = spark.createDataFrame(
        [
            ("a", "parent_of", "b"), ("b", "parent_of", "c"),
            ("x", "parent_of", "y"), ("y", "parent_of", "z"),
            ("a", "grandparent_of", "c"), ("x", "grandparent_of", "z"),
        ],
        "subj string, pred string, obj string",
    )
    got = {(r["body_p"], r["body_q"], r["head_r"]):
           (r["n_body"], r["support"], r["confidence"])
           for r in mine_composition_rules(t, 2, 0.5).collect()}
    assert got[("parent_of", "parent_of", "grandparent_of")] == (2, 2, 1.0)


def test_rule_mine_confidence_threshold(spark):
    # composition holds for 1 of 2 body pairs -> confidence 0.5 kept,
    # min_confidence 0.6 drops it
    t = spark.createDataFrame(
        [
            ("a", "p", "b"), ("b", "q", "c"),
            ("x", "p", "y"), ("y", "q", "w"),
            ("a", "r", "c"),
            ("d", "r", "e"), ("f", "r", "g"),  # pad r's support elsewhere
        ],
        "subj string, pred string, obj string",
    )
    kept = mine_composition_rules(t, min_support=1, min_confidence=0.5)
    got = {(r["body_p"], r["body_q"], r["head_r"]): r["confidence"]
           for r in kept.collect()}
    assert got[("p", "q", "r")] == 0.5
    strict = mine_composition_rules(t, min_support=1, min_confidence=0.6)
    assert all(
        (r["body_p"], r["body_q"], r["head_r"]) != ("p", "q", "r")
        for r in strict.collect()
    )


def test_rule_mine_mid_fan_cap_skips_hubs(spark):
    # hub entity with fan > cap contributes no body pairs
    rows_in = [("s%d" % i, "p", "hub") for i in range(5)] + [
        ("hub", "q", "t%d" % i) for i in range(5)
    ]
    t = spark.createDataFrame(rows_in, "subj string, pred string, obj string")
    got = mine_composition_rules(t, min_support=1, min_confidence=0.0,
                                 max_mid_fan=3).collect()
    assert got == []
