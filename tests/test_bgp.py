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


@pytest.fixture(scope="module")
def chain_triples(spark):
    # chain 1->2->3->4->5 plus cycle 3->1 and a shortcut 1->4, one pred
    rows = [("n1", "p", "n2"), ("n2", "p", "n3"), ("n3", "p", "n4"),
            ("n4", "p", "n5"), ("n3", "p", "n1"), ("n1", "p", "n4"),
            ("n1", "q", "n9")]
    return spark.createDataFrame(
        [(s, p, o, "d") for s, p, o in rows],
        "subj string, pred string, obj string, doc_id string")


def test_path_closure_min_hops(chain_triples):
    from knowledgegraphbuilder_spark.operators.bgp import path_closure

    got = {(r["src"], r["dst"]): r["hops"]
           for r in path_closure(chain_triples, "p", max_hops=3).collect()}
    assert got[("n1", "n2")] == 1
    assert got[("n1", "n4")] == 1      # shortcut beats the 3-hop chain
    assert got[("n1", "n5")] == 2      # via the shortcut
    assert got[("n1", "n3")] == 2
    assert got[("n3", "n3")] == 3      # cycle closes at minimal length 3
    assert got[("n1", "n1")] == 3
    assert ("n1", "n9") not in got     # other predicate excluded
    # cap respected: nothing needs more than max_hops
    assert max(got.values()) <= 3


def test_path_closure_terminates_on_cycle(chain_triples):
    from knowledgegraphbuilder_spark.operators.bgp import path_closure

    # a pure 2-cycle with a generous cap must still terminate (frontier
    # empties once both pairs are known)
    spark = chain_triples.sparkSession
    cyc = spark.createDataFrame(
        [("a", "p", "b", "d"), ("b", "p", "a", "d")],
        "subj string, pred string, obj string, doc_id string")
    got = {(r["src"], r["dst"]): r["hops"]
           for r in path_closure(cyc, "p", max_hops=10).collect()}
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("a", "a"): 2, ("b", "b"): 2}


def test_apply_rule_only_new(chain_triples):
    from knowledgegraphbuilder_spark.operators.bgp import apply_rule

    # rule: x -p-> y -p-> z  =>  x -p2-> z
    body = [("?x", "p", "?y"), ("?y", "p", "?z")]
    got = rows(apply_rule(chain_triples, body, ("?x", "p2", "?z")))
    assert ("n1", "p2", "n3") in got
    # with head pred 'p', existing edges must be anti-joined away:
    # n1->n4 is derivable (n1->n3? no: 2-hop n1..) n2->n4 is derivable and absent
    got_p = rows(apply_rule(chain_triples, body, ("?x", "p", "?z")))
    assert ("n2", "p", "n4") in got_p
    assert ("n1", "p", "n4") not in got_p  # already in the graph
    # every derived statement is genuinely absent from the input
    existing = {(r["subj"], r["pred"], r["obj"]) for r in chain_triples.collect()}
    assert not (set(got_p) & existing)


# --- tranche 64: FILTER / MINUS / aggregates / ASK / DESCRIBE -------------

from knowledgegraphbuilder_spark.operators.bgp import (  # noqa: E402
    agg_match, ask_match, describe_entity, filter_match, minus_match,
)


def test_filter_match_restricts_bindings(triples):
    got = rows(filter_match(triples, [("?p", "knows", "?q")], "q = 'b1'"))
    assert got == [("a1", "b1"), ("a2", "b1")]


def test_filter_match_expression_over_two_vars(triples):
    got = rows(filter_match(triples, [("?p", "knows", "?q")], "p < q"))
    assert got == [("a1", "b1"), ("a1", "b2"), ("a2", "b1")]


def test_minus_match_removes_compatible_bindings(triples):
    # all knows-pairs minus those where the target works at org1
    got = rows(
        minus_match(
            triples,
            [("?p", "knows", "?q")],
            [("?q", "works_at", "?w")],
        )
    )
    # b1 and b2 both work somewhere -> all bindings with a workplace go
    assert got == []


def test_minus_match_literal_narrowing(triples):
    got = rows(
        minus_match(
            triples,
            [("?p", "knows", "?q")],
            [("?q", "works_at", "org1")],
        )
    )
    # only b1 works at org1; bindings targeting b2 survive
    assert got == [("a1", "b2")]


def test_minus_match_no_shared_vars_removes_nothing(triples):
    req = rows(bgp_match(triples, [("?p", "knows", "?q")]))
    got = rows(
        minus_match(triples, [("?p", "knows", "?q")], [("?x", "self", "?y")])
    )
    assert got == req


def test_minus_match_empty_minus_is_identity(triples):
    req = rows(bgp_match(triples, [("?p", "knows", "?q")]))
    assert rows(minus_match(triples, [("?p", "knows", "?q")], [])) == req


def test_agg_match_count_and_min(triples):
    got = rows(
        agg_match(
            triples,
            [("?p", "knows", "?q")],
            ["q"],
            [("count", "*", "n"), ("min", "p", "first_p")],
        )
    )
    assert got == [("b1", 2, "a1"), ("b2", 1, "a1")]


def test_agg_match_count_distinct(triples):
    got = rows(
        agg_match(
            triples,
            [("?p", "knows", "?q")],
            [],
            [("count_distinct", "q", "n_targets")],
        )
    )
    assert got == [(2,)]


def test_ask_match_true_and_false(triples):
    assert ask_match(triples, [("?a", "located_in", "?b")]).collect()[0][0] is True
    assert ask_match(triples, [("?a", "nope", "?b")]).collect()[0][0] is False


def test_describe_entity_both_roles(triples):
    got = rows(describe_entity(triples, "b1"))
    assert got == [
        ("object", "a1", "knows", "b1"),
        ("object", "a2", "knows", "b1"),
        ("subject", "b1", "works_at", "org1"),
    ]


def test_describe_self_loop_appears_once_per_role(triples):
    got = rows(describe_entity(triples, "loop"))
    assert got == [
        ("object", "loop", "self", "loop"),
        ("subject", "loop", "self", "loop"),
    ]


def test_path_alt_forward_and_inverse(triples):
    from knowledgegraphbuilder_spark.operators.bgp import path_alt

    got = rows(path_alt(triples, preds=["works_at"],
                        inverse_preds=["knows"]))
    # forward works_at plus reversed knows, distinct
    assert got == sorted([
        ("b1", "org1"), ("b2", "org2"),
        ("b1", "a1"), ("b2", "a1"), ("b1", "a2"),
    ])


def test_path_alt_requires_a_predicate(triples):
    from knowledgegraphbuilder_spark.operators.bgp import path_alt

    with pytest.raises(ValueError):
        path_alt(triples)
