"""G4 connected components + G3 weighted personalized PageRank."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from knowledgegraphbuilder_spark.operators.canonicalize import connected_components
from knowledgegraphbuilder_spark.operators.pagerank import personalized_pagerank


def _components(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    out = connected_components(df).collect()
    comp = {}
    for r in out:
        comp.setdefault(r["component"], set()).add(r["vertex"])
    return set(frozenset(v) for v in comp.values()), {r["vertex"]: r["component"] for r in out}


def test_cc_two_components(spark):
    sets, assign = _components(spark, [("a", "b"), ("b", "c"), ("x", "y")])
    assert sets == {frozenset({"a", "b", "c"}), frozenset({"x", "y"})}
    assert assign["c"] == "a" and assign["y"] == "x"  # min-id representative


def test_cc_long_chain(spark):
    # path graph: worst case for naive propagation; large/small star converges O(log n)
    edges = [(f"v{i:03d}", f"v{i + 1:03d}") for i in range(40)]
    sets, assign = _components(spark, edges)
    assert sets == {frozenset({f"v{i:03d}" for i in range(41)})}
    assert all(c == "v000" for c in assign.values())


def test_cc_deterministic(spark):
    edges = [("b", "a"), ("c", "b"), ("q", "z"), ("m", "m")]
    _, a1 = _components(spark, edges)
    _, a2 = _components(spark, edges)
    assert a1 == a2


def numpy_ppr(edges, sources, d=0.85, iters=200):
    verts = sorted({v for e in edges for v in e[:2]} | set(sources))
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    W = np.zeros((n, n))
    for s, t, w in edges:  # undirected
        W[idx[s], idx[t]] += w
        W[idx[t], idx[s]] += w
    out = W.sum(axis=1)
    p = np.zeros(n)
    for s in sources:
        p[idx[s]] = 1.0 / len(sources)
    r = p.copy()
    for _ in range(iters):
        inflow = np.zeros(n)
        for u in range(n):
            if out[u] > 0:
                inflow += r[u] * W[u] / out[u]
        dangling = r[out == 0].sum()
        r = (1 - d) * p + d * (inflow + dangling * p)
    return {v: r[idx[v]] for v in verts}


@pytest.mark.parametrize("sources", [["a"], ["a", "d"]])
def test_ppr_matches_numpy(spark, sources):
    edges = [
        ("a", "b", 1.0), ("b", "c", 0.5), ("c", "a", 0.2),
        ("c", "d", 2.0), ("d", "e", 0.2), ("e", "a", 1.5),
    ]
    edf = spark.createDataFrame(edges, "head_node_id string, tail_node_id string, weight double")
    sdf = spark.createDataFrame([(s,) for s in sources], "node_id string")
    got = {
        r["node_id"]: r["score"]
        for r in personalized_pagerank(
            edf, sdf, 0.85, 60, 1e-12, checkpoint_every=10, small_graph_threshold=0
        ).collect()
    }
    want = numpy_ppr(edges, sources)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-6, (v, got[v], want[v])
    # the adaptive driver-side path must agree with the distributed loop
    fast = {
        r["node_id"]: r["score"]
        for r in personalized_pagerank(edf, sdf, 0.85, 60, 1e-12).collect()
    }
    for v in want:
        assert abs(fast[v] - want[v]) < 1e-6, (v, fast[v], want[v])


def test_ppr_isolated_source_dangling(spark):
    # a source node with no edges: its rank mass recycles through p(v)
    edges = [("a", "b", 1.0)]
    edf = spark.createDataFrame(edges, "head_node_id string, tail_node_id string, weight double")
    sdf = spark.createDataFrame([("z",)], "node_id string")
    got = {r["node_id"]: r["score"] for r in
           personalized_pagerank(edf, sdf, 0.85, 40, 1e-12, checkpoint_every=8,
                                 small_graph_threshold=0).collect()}
    want = numpy_ppr(edges, ["z"])
    for v in want:
        assert abs(got[v] - want[v]) < 1e-6
