"""SHACL-style validation (operators/shapes.py) and WL refinement
(operators/graphstats.py:wl_refine)."""

import pytest

from knowledgegraphbuilder_spark.operators.graphstats import wl_refine
from knowledgegraphbuilder_spark.operators.shapes import shacl_validate


@pytest.fixture(scope="module")
def kg(spark):
    triples = spark.createDataFrame(
        [
            ("alice", "works_at", "acme", "d1"),
            ("alice", "works_at", "globex", "d1"),
            ("bob", "works_at", "acme", "d2"),
            ("carol", "knows", "alice", "d3"),
            # duplicate statement: set semantics must collapse it
            ("alice", "works_at", "acme", "d9"),
        ],
        "subj string, pred string, obj string, doc_id string",
    )
    types = spark.createDataFrame(
        [
            ("alice", "person"),
            ("bob", "person"),
            ("carol", "person"),
            ("acme", "org"),
            ("globex", "org"),
        ],
        "entity string, label string",
    )
    return triples, types


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_shacl_min_count_violation_surfaces_zero_edges(kg):
    triples, types = kg
    rep = shacl_validate(
        triples, types, [("person", "works_at", "out", 1, None)]
    )
    got = {r["entity"]: (r["observed"], r["conforms"]) for r in rep.collect()}
    # carol has no works_at edge at all: observed must be 0, not absent
    assert got == {"alice": (2, True), "bob": (1, True), "carol": (0, False)}


def test_shacl_max_count_and_bound_rendering(kg):
    triples, types = kg
    rep = shacl_validate(
        triples, types, [("person", "works_at", "out", None, 1)]
    ).collect()
    by_entity = {r["entity"]: r for r in rep}
    assert by_entity["alice"]["conforms"] is False  # 2 > 1
    assert by_entity["bob"]["conforms"] is True
    assert by_entity["alice"]["bound"] == "max=1"


def test_shacl_both_bounds_render_joined(kg):
    triples, types = kg
    rep = shacl_validate(
        triples, types, [("org", "works_at", "in", 1, 3)]
    ).collect()
    assert all(r["bound"] == "min=1,max=3" for r in rep)
    got = {r["entity"]: r["conforms"] for r in rep}
    assert got == {"acme": True, "globex": True}


def test_shacl_set_semantics_ignores_duplicate_statements(kg):
    triples, types = kg
    rep = shacl_validate(
        triples, types, [("person", "works_at", "out", None, 2)]
    ).collect()
    alice = [r for r in rep if r["entity"] == "alice"][0]
    # the duplicated (alice, works_at, acme) counts once
    assert alice["observed"] == 2 and alice["conforms"] is True


def test_shacl_in_direction(kg):
    triples, types = kg
    rep = shacl_validate(
        triples, types, [("org", "works_at", "in", 2, None)]
    ).collect()
    got = {r["entity"]: (r["observed"], r["conforms"]) for r in rep}
    assert got == {"acme": (2, True), "globex": (1, False)}


@pytest.fixture(scope="module")
def wl_graph(spark):
    # x1 and x2 are 1-hop twins; y1 has an extra incoming q-edge, so
    # round 1 separates y1 from y2 and round 2 separates x1 from x2.
    return spark.createDataFrame(
        [
            ("x1", "p", "y1"),
            ("x2", "p", "y2"),
            ("z", "q", "y1"),
        ],
        "subj string, pred string, obj string",
    )


def colors(df):
    return {r["node"]: r["color"] for r in df.collect()}


def test_wl_round0_is_uniform(wl_graph):
    c = colors(wl_refine(wl_graph, rounds=0))
    assert set(c.values()) == {"wl0"}
    assert set(c) == {"x1", "x2", "y1", "y2", "z"}


def test_wl_round1_separates_by_local_signature(wl_graph):
    c = colors(wl_refine(wl_graph, rounds=1))
    # identical 1-hop neighborhoods -> same color
    assert c["x1"] == c["x2"]
    # y1 has an extra incoming q-edge -> differs from y2
    assert c["y1"] != c["y2"]


def test_wl_round2_propagates_neighbor_difference(wl_graph):
    c = colors(wl_refine(wl_graph, rounds=2))
    # x1's neighbor y1 was separated in round 1 -> x1 splits from x2
    assert c["x1"] != c["x2"]
    assert len(set(c.values())) == 5


def test_wl_direction_tags_matter(spark):
    # a->b vs b->a must give a different coloring for the endpoints
    g1 = spark.createDataFrame([("a", "p", "b")], "subj string, pred string, obj string")
    c = colors(wl_refine(g1, rounds=1))
    assert c["a"] != c["b"]


def test_wl_color_is_deterministic(wl_graph):
    c1 = colors(wl_refine(wl_graph, rounds=2))
    c2 = colors(wl_refine(wl_graph.repartition(7), rounds=2))
    assert c1 == c2


# --- RDFS entailment (operators/ontology.py) ------------------------------

from knowledgegraphbuilder_spark.operators.ontology import (  # noqa: E402
    close_hierarchy, rdfs_types,
)


def test_close_hierarchy_transitive_and_reflexive():
    closed = close_hierarchy([("a", "b"), ("b", "c")])
    assert ("a", "c") in closed           # transitive
    assert ("a", "a") in closed           # reflexive
    assert ("c", "a") not in closed       # not symmetric


def test_close_hierarchy_cycle_terminates():
    closed = close_hierarchy([("a", "b"), ("b", "a")])
    assert ("a", "b") in closed and ("b", "a") in closed
    assert ("a", "a") in closed and ("b", "b") in closed


def test_rdfs_types_entails_ancestors(kg):
    _, types = kg
    got = rows(rdfs_types(types, [("person", "agent"), ("org", "agent")]))
    assert ("alice", "person") in got
    assert ("alice", "agent") in got
    assert ("acme", "agent") in got
    # nothing invents a downward type
    assert ("alice", "org") not in got


def test_rdfs_types_label_outside_hierarchy_survives(kg):
    _, types = kg
    got = rows(rdfs_types(types, [("org", "agent")]))
    # person isn't in the hierarchy: entities keep their own label only
    assert ("bob", "person") in got
    assert all(t != "agent" for e, t in got if e == "bob")
