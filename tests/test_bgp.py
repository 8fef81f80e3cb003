"""BGP matcher (operators/bgp.py): pattern compilation semantics."""

import pytest

from knowledgegraphbuilder_spark.operators.bgp import bgp_match, plan_order


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        ("a1", "knows", "b1", "d1"),
        ("a1", "knows", "b2", "d1"),
        ("b1", "works_at", "org1", "d2"),
        ("b2", "works_at", "org2", "d2"),
        ("a2", "knows", "b1", "d3"),
        ("org1", "located_in", "city1", "d4"),
        ("loop", "self", "loop", "d5"),
        ("x", "self", "y", "d5"),
        # duplicate statement in a second doc: set semantics must collapse
        ("a1", "knows", "b1", "d9"),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string, doc_id string")


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_chain_join(triples):
    got = bgp_match(triples, [("?p", "knows", "?q"), ("?q", "works_at", "?o")])
    assert got.columns == ["p", "q", "o"]
    assert rows(got) == [("a1", "b1", "org1"), ("a1", "b2", "org2"),
                         ("a2", "b1", "org1")]


def test_three_hop_and_literal_object(triples):
    got = bgp_match(triples, [
        ("?p", "knows", "?q"),
        ("?q", "works_at", "?o"),
        ("?o", "located_in", "city1"),
    ])
    assert rows(got) == [("a1", "b1", "org1"), ("a2", "b1", "org1")]


def test_repeated_var_in_pattern(triples):
    got = bgp_match(triples, [("?x", "self", "?x")])
    assert rows(got) == [("loop",)]


def test_pattern_order_invariance(triples):
    pats = [("?p", "knows", "?q"), ("?q", "works_at", "?o"),
            ("?o", "located_in", "city1")]
    a = rows(bgp_match(triples, pats))
    b = rows(bgp_match(triples, list(reversed(pats))).select("p", "q", "o"))
    assert a == b


def test_disconnected_groups_are_product(triples):
    got = bgp_match(triples, [("?a", "located_in", "?c"),
                              ("?m", "self", "?m")])
    assert rows(got) == [("org1", "city1", "loop")]


def test_plan_order_most_literal_first():
    pats = [("?p", "knows", "?q"), ("?q", "works_at", "?o"),
            ("?o", "located_in", "city1")]
    ordered = plan_order(pats)
    assert ordered[0] == ("?o", "located_in", "city1")
    # second pattern must connect through ?o, not jump to the disconnected one
    assert ordered[1] == ("?q", "works_at", "?o")


def test_ask_literal_pattern_gates(triples):
    hit = bgp_match(triples, [("a1", "knows", "b1"), ("?o", "located_in", "?c")])
    assert rows(hit) == [("org1", "city1")]
    miss = bgp_match(triples, [("a1", "knows", "nobody"), ("?o", "located_in", "?c")])
    assert miss.count() == 0


def test_set_semantics_dedup(triples):
    got = bgp_match(triples, [("?p", "knows", "b1")])
    assert rows(got) == [("a1",), ("a2",)]
