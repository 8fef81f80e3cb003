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


# ---------------------------------------------------------------------------
# G5: co-occurrence projection + triangle counting
# ---------------------------------------------------------------------------

from knowledgegraphbuilder_spark.operators.graphstats import (  # noqa: E402
    cooccurrence_edges,
    triangle_clustering,
)


def _tri(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: (r["degree"], r["triangles"], r["clustering"])
            for r in triangle_clustering(df).collect()}


def test_triangles_k4(spark):
    # complete graph on 4 nodes: every node in C(3,2)=3 triangles, coeff 1.0
    nodes = ["a", "b", "c", "d"]
    edges = [(x, y) for x in nodes for y in nodes if x < y]
    out = _tri(spark, edges)
    assert out == {n: (3, 3, 1.0) for n in nodes}


def test_triangles_path_has_none(spark):
    out = _tri(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert all(t == 0 and c == 0.0 for (_, t, c) in out.values())
    assert out["b"][0] == 2


def test_triangles_canonicalizes_input(spark):
    # duplicates, reversed orientation, and self-loops must not change counts
    messy = [("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"), ("c", "c"), ("a", "b")]
    out = _tri(spark, messy)
    assert out["a"] == (2, 1, 1.0) and out["b"] == (2, 1, 1.0) and out["c"] == (2, 1, 1.0)


def test_cooccurrence_projection_and_cap(spark):
    rows = (
        [("g1", i) for i in ["x", "y", "z"]]          # emits 3 pairs
        + [("g2", i) for i in ["x", "y"]]             # reinforces (x,y)
        + [("big", f"i{k}") for k in range(10)]       # dropped by the cap
        + [("g1", "x")]                               # duplicate membership
    )
    df = spark.createDataFrame(rows, "g string, item string")
    out = {(r["src"], r["dst"]): r["weight"]
           for r in cooccurrence_edges(df, "g", "item", max_group_size=5).collect()}
    assert out == {("x", "y"): 2, ("x", "z"): 1, ("y", "z"): 1}


def test_semantic_dedup_first_wins(spark):
    # two tight clusters in 2-d; stride 3 selects exactly {b, x} as centroids
    # (sha256 residues: b=0, x=0; a=2, c=2, y=2), so assignment groups
    # {a,b,c} under b and {x,y} under x — first-wins drops everything but the
    # smallest id of each cluster
    from knowledgegraphbuilder_spark.operators.dedup import semantic_dedup

    rows = [
        ("a", [1.0, 0.0]), ("b", [0.999, 0.01]), ("c", [0.998, 0.02]),
        ("x", [0.0, 1.0]), ("y", [0.01, 0.999]),
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    out = {r["id"]: r["dup_of"]
           for r in semantic_dedup(df, threshold=0.99, centroid_stride=3).collect()}
    assert "a" not in out and "x" not in out
    assert out == {"b": "a", "c": "a", "y": "x"}


def test_semantic_dedup_empty_centroid_fallback(spark):
    # a stride larger than any sha256 residue present -> no centroids ->
    # single-cluster exact fallback must still find the duplicate pair
    from knowledgegraphbuilder_spark.operators.dedup import semantic_dedup

    rows = [("a", [1.0, 0.0]), ("b", [1.0, 0.001])]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    out = semantic_dedup(df, threshold=0.99, centroid_stride=10**6).collect()
    assert len(out) == 1 and out[0]["id"] == "b" and out[0]["dup_of"] == "a"


def test_kcore_peels_cascade(spark):
    from knowledgegraphbuilder_spark.operators.graphstats import k_core

    # triangle core {a,b,c} + a pendant chain c-d-e: 2-core keeps only the
    # triangle, and d is removed in a LATER round than e (cascade)
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r["node"]: r["core_degree"] for r in k_core(df, k=2).collect()}
    assert out == {"a": 2, "b": 2, "c": 2}


def test_kcore_empty_when_k_exceeds_density(spark):
    from knowledgegraphbuilder_spark.operators.graphstats import k_core

    df = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    assert k_core(df, k=3).count() == 0


def test_kcore_fixed_point_idempotent(spark):
    from knowledgegraphbuilder_spark.operators.graphstats import k_core

    # K4 is already a 3-core: peeling must terminate round 1 with K4 intact,
    # and extra allowed rounds must not change the answer
    nodes = ["a", "b", "c", "d"]
    edges = [(x, y) for x in nodes for y in nodes if x < y]
    df = spark.createDataFrame(edges, "src string, dst string")
    r1 = sorted(k_core(df, k=3, max_rounds=1).collect())
    r9 = sorted(k_core(df, k=3, max_rounds=9).collect())
    assert r1 == r9 and len(r1) == 4 and all(r["core_degree"] == 3 for r in r1)


from knowledgegraphbuilder_spark.operators.graphstats import link_prediction  # noqa: E402


def _lp_edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_linkpred_square_predicts_diagonals(spark):
    # 4-cycle a-b-c-d-a: the two missing diagonals (a,c) and (b,d) each
    # share 2 common neighbors of degree 2 -> ra_units = 2 * (1e12 // 2)
    got = {
        (r.src, r.dst): (r.cn, r.ra_units, r.jaccard)
        for r in link_prediction(
            _lp_edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")])
        ).collect()
    }
    assert got == {
        ("a", "c"): (2, 1_000_000_000_000, 1.0),
        ("b", "d"): (2, 1_000_000_000_000, 1.0),
    }


def test_linkpred_excludes_existing_edges(spark):
    # triangle + pendant: every 2-hop pair is already an edge except (a, p)
    out = link_prediction(
        _lp_edges(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("b", "p")])
    ).collect()
    assert {(r.src, r.dst) for r in out} == {("a", "p"), ("c", "p")}
    row = {(r.src, r.dst): r for r in out}[("a", "p")]
    # one common neighbor b of degree 3; jaccard = 1 / (2 + 1 - 1)
    assert (row.cn, row.ra_units, row.jaccard) == (1, 1_000_000_000_000 // 3, 0.5)


def test_linkpred_hub_cap_drops_wedge_centers(spark):
    # star: hub h connects x0..x4 -> all candidate pairs go through h
    star = [("h", f"x{i}") for i in range(5)]
    assert link_prediction(_lp_edges(spark, star)).count() == 10
    assert link_prediction(_lp_edges(spark, star), max_hub_degree=4).count() == 0


def test_linkpred_top_n_is_deterministic_total_order(spark):
    star = [("h", f"x{i}") for i in range(5)]
    top = link_prediction(_lp_edges(spark, star), top_n=3).collect()
    assert [(r.src, r.dst) for r in top] == [
        ("x0", "x1"), ("x0", "x2"), ("x0", "x3")
    ]


def test_skipgram_pairs_window_semantics(spark):
    from knowledgegraphbuilder_spark.operators.graphstats import skipgram_pairs

    walks = spark.createDataFrame(
        [("w1", 0, "a"), ("w1", 1, "b"), ("w1", 2, "c"), ("w1", 3, "a"),
         ("w2", 0, "x"), ("w2", 1, "y")],
        "seed string, step int, node string",
    )
    got = {(r.center, r.context): r.cnt
           for r in skipgram_pairs(walks, window=1).collect()}
    # adjacent pairs only, both directions; walk w1 = a b c a
    assert got == {
        ("a", "b"): 1, ("b", "a"): 1,
        ("b", "c"): 1, ("c", "b"): 1,
        ("c", "a"): 1, ("a", "c"): 1,
        ("x", "y"): 1, ("y", "x"): 1,
    }
    # window=3 sees across the whole 4-walk; walks never mix
    wide = {(r.center, r.context): r.cnt
            for r in skipgram_pairs(walks, window=3).collect()}
    assert wide[("a", "a")] == 2  # a@0 x a@3, both directions
    assert ("a", "x") not in wide and ("x", "a") not in wide


def test_negative_samples_are_filtered_and_deterministic(spark):
    from knowledgegraphbuilder_spark.operators.graphstats import (
        negative_sample_edges,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"), ("b", "d")],
        "src string, dst string",
    )
    out = negative_sample_edges(edges, k=3).collect()
    truth = {("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"), ("b", "d")}
    for r in out:
        assert r.dst_neg != r.src
        assert (r.src, r.dst_neg) not in truth
        assert (r.dst_neg, r.src) not in truth
        assert 0 <= r.sample_idx < 3
    assert len(out) <= 5 * 3
    assert sorted(map(tuple, out)) == sorted(
        map(tuple, negative_sample_edges(edges, k=3).collect())
    )


def test_negative_samples_rank_matches_global_sort(spark):
    """The prefix-bucketed two-phase dictionary must equal row_number over
    the global sort exactly — including nodes shorter than the 2-char
    prefix, unicode, and shared-prefix runs."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from knowledgegraphbuilder_spark.operators.graphstats import (
        negative_sample_edges,
    )

    names = ["a", "ab", "abc", "b", "ba", "zz", "zza", "é", "éa", "0", "00"]
    edges = spark.createDataFrame(
        [(names[i], names[(i + 1) % len(names)]) for i in range(len(names))],
        "src string, dst string",
    )
    out = negative_sample_edges(edges, k=4)
    # reference dictionary via the (non-scalable) global window
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    ref_vocab = {
        r.node: r.rank
        for r in nodes.select(
            "node", (F.row_number().over(Window.orderBy("node")) - 1).alias("rank")
        ).collect()
    }
    # replay the hash pick against the reference dictionary
    import hashlib

    n = len(ref_vocab)
    inv = {v: k for k, v in ref_vocab.items()}
    truth = {(r.src, r.dst) for r in edges.collect()}
    expected = set()
    for r in edges.collect():
        for i in range(4):
            h = int(hashlib.sha256(f"{r.src}|{r.dst}|{i}".encode()).hexdigest()[:15], 16)
            neg = inv[h % n]
            if neg != r.src and (r.src, neg) not in truth and (neg, r.src) not in truth:
                expected.add((r.src, neg, i))
    assert {(r.src, r.dst_neg, r.sample_idx) for r in out.collect()} == expected


def test_negative_samples_plan_has_no_vocab_sized_global_window(spark):
    """Plan pin for the r4 verdict's scale-killer: the node dictionary must
    not funnel the vocabulary through a single-partition window. Any
    remaining SinglePartition exchange may only feed from an aggregate
    (histogram/1-row shaped), never directly from the node projection."""
    from pyspark.sql import functions as F
    from knowledgegraphbuilder_spark.operators.graphstats import (
        negative_sample_edges,
    )

    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 7) % 50}") for i in range(200)],
        "src string, dst string",
    )
    plan = (
        negative_sample_edges(edges, k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        # the child operator must be an aggregate, not a row-level scan
        child = lines[i + 1] if i + 1 < len(lines) else ""
        assert "HashAggregate" in child or "SortAggregate" in child, (
            "vocab-sized SinglePartition exchange:\n" + child
        )


def test_harmonic_centrality_path_graph(spark):
    from knowledgegraphbuilder_spark.operators.graphstats import (
        harmonic_centrality,
    )

    # path a-b-c-d-e, seeds {a, c}: a reaches b@1 c@2 d@3 (e beyond cap);
    # c reaches b@1 d@1 a@2 e@2
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",), ("c",)], "node string")
    got = {r.seed: (r.n_reached, r.harmonic_units)
           for r in harmonic_centrality(edges, seeds, max_hops=3).collect()}
    assert got == {
        "a": (3, 1_000_000 + 500_000 + 333_333),
        "c": (4, 2 * 1_000_000 + 2 * 500_000),
    }


def test_modularity_hand_checked(spark):
    from knowledgegraphbuilder_spark.operators.graphstats import modularity

    # triangle {1,2,3} + disjoint pair {4,5}: m=4; each community
    # contributes in/m - (deg/2m)^2 = 0.1875; global Q = 0.375
    edges = spark.createDataFrame(
        [("1", "2"), ("2", "3"), ("1", "3"), ("4", "5")], "src string, dst string"
    )
    comm = spark.createDataFrame(
        [("1", "c1"), ("2", "c1"), ("3", "c1"), ("4", "c2"), ("5", "c2")],
        "node string, community string",
    )
    rows = {r["community"]: r for r in modularity(edges, comm).collect()}
    assert rows["c1"]["n_nodes"] == 3 and rows["c1"]["in_edges"] == 3
    assert rows["c1"]["deg_sum"] == 6 and rows["c1"]["q"] == 0.1875
    assert rows["c2"]["q"] == 0.1875
    assert abs(sum(r["q"] for r in rows.values()) - 0.375) < 1e-12


def test_modularity_singleton_partition_nonpositive(spark):
    from knowledgegraphbuilder_spark.operators.graphstats import modularity

    edges = spark.createDataFrame(
        [("1", "2"), ("2", "3"), ("1", "3")], "src string, dst string"
    )
    comm = spark.createDataFrame(
        [(n, n) for n in "123"], "node string, community string"
    )
    rows = modularity(edges, comm).collect()
    # singletons have no internal edges: q_c = -(deg/2m)^2 < 0
    assert all(r["in_edges"] == 0 and r["q"] < 0 for r in rows)


def test_modularity_lpa_composition_and_stability(spark):
    from knowledgegraphbuilder_spark.operators.graphstats import (
        label_propagation, modularity,
    )

    # two 4-cliques bridged by one edge: LPA must find structure (Q > 0)
    clique = lambda ns: [(a, b) for i, a in enumerate(ns) for b in ns[i + 1:]]
    edges = spark.createDataFrame(
        clique(["a1", "a2", "a3", "a4"]) + clique(["b1", "b2", "b3", "b4"])
        + [("a1", "b1")],
        "src string, dst string",
    )
    part = label_propagation(edges, rounds=3)
    out1 = sorted(map(tuple, modularity(edges, part).collect()))
    assert sum(r[4] for r in out1) > 0.2
    out2 = sorted(map(tuple, modularity(edges.repartition(7), part).collect()))
    assert out1 == out2


def _n2v_reference(adj, seed, length, rw, bw, dw):
    """Pure-Python replay of biased_walks' derandomized contract."""
    import hashlib

    h = lambda s: hashlib.sha256(s.encode()).hexdigest()
    out = [(seed, 0, seed)]
    if not adj.get(seed):
        return out
    cur = min(adj[seed], key=lambda v: (h(f"{seed}|1|{seed}|{v}|1"), v))
    prev = seed
    out.append((seed, 1, cur))
    for t in range(2, length + 1):
        if not adj.get(cur):
            break
        tickets = []
        for v in sorted(adj[cur]):
            w = rw if v == prev else (bw if v in adj[prev] else dw)
            for i in range(1, w + 1):
                tickets.append((h(f"{seed}|{t}|{cur}|{v}|{i}"), v))
        nxt = min(tickets)[1]
        prev, cur = cur, nxt
        out.append((seed, t, cur))
    return out


def test_biased_walks_pure_python_parity(spark):
    from knowledgegraphbuilder_spark.operators.graphstats import biased_walks

    edge_list = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c"),
                 ("b", "e"), ("e", "f"), ("f", "a")]
    adj = {}
    for s, d in edge_list:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    edges = spark.createDataFrame(edge_list, "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("e",)], "node string")
    got = sorted(
        (r["seed"], r["step"], r["node"])
        for r in biased_walks(edges, seeds, length=4, ret_w=1, bfs_w=4, dfs_w=2).collect()
    )
    want = sorted(
        _n2v_reference(adj, s, 4, 1, 4, 2)[i]
        for s in ("a", "e")
        for i in range(5)
    )
    assert got == want


def test_biased_walks_weight_extremes_change_path(spark):
    from knowledgegraphbuilder_spark.operators.graphstats import biased_walks

    # weights must actually influence the choice: compare (1,1,1) uniform
    # tickets vs an extreme BFS bias on a graph with both class types
    edge_list = [("a", "b"), ("b", "c"), ("b", "d"), ("a", "c")]
    edges = spark.createDataFrame(edge_list, "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "node string")
    uni = {(r["step"]): r["node"]
           for r in biased_walks(edges, seeds, length=2, ret_w=1, bfs_w=1, dfs_w=1).collect()}
    bfs = {(r["step"]): r["node"]
           for r in biased_walks(edges, seeds, length=2, ret_w=1, bfs_w=500, dfs_w=1).collect()}
    assert uni[0] == bfs[0] == "a" and uni[1] == bfs[1]
    # with bfs_w=500 the distance-1 candidate ("c" if step1 went to b, since
    # a-c closes the triangle) wins with overwhelming ticket mass
    if uni[1] == "b":
        assert bfs[2] in ("c",)  # c is prev-adjacent; d is distance-2; a is return


def test_biased_walks_rejects_zero_weight(spark):
    from knowledgegraphbuilder_spark.operators.graphstats import biased_walks

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "node string")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        biased_walks(edges, seeds, ret_w=0)


def _anf_reference(adj, max_hops, p=4):
    """Pure-Python replay of anf_hyperball's integer contract."""
    import hashlib
    import math

    m = 1 << p
    w_bits, rho_max = 28, 29
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))
    c_micro = round(alpha * m * m * (1 << rho_max) * 1e6)
    lc = {v: round(m * math.log(m / v) * 1e6) for v in range(1, m)}

    def reg_of(node):
        hv = int(hashlib.sha256(node.encode()).hexdigest()[:15], 16)
        w = (hv >> p) & ((1 << w_bits) - 1)
        rho = rho_max if w == 0 else rho_max - w.bit_length()
        return (hv & (m - 1), rho)

    regs = {n: {reg_of(n)[0]: reg_of(n)[1]} for n in adj}
    rows = []
    for hop in range(0, max_hops + 1):
        if hop > 0:
            new = {}
            for n in adj:
                d = dict(regs[n])
                for nb in adj[n]:
                    for idx, r in regs[nb].items():
                        d[idx] = max(d.get(idx, 0), r)
                new[n] = d
            regs = new
        total = 0
        for n in adj:
            s = sum(1 << (rho_max - r) for r in regs[n].values())
            v_empty = m - len(regs[n])
            s_int = s + v_empty * (1 << rho_max)
            if c_micro <= int(2.5 * m * 1e6) * s_int and v_empty > 0:
                total += lc[v_empty]
            else:
                total += c_micro // s_int
        rows.append((hop, len(adj), total, round(total / 1e6, 4)))
    return rows


def test_anf_pure_python_parity(spark):
    from knowledgegraphbuilder_spark.operators.graphstats import anf_hyperball

    edge_list = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("a", "c"),
                 ("e", "f"), ("f", "g"), ("g", "a"), ("x", "y")]
    adj = {}
    for s, d in edge_list:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    edges = spark.createDataFrame(edge_list, "src string, dst string")
    got = sorted(map(tuple, anf_hyperball(edges, max_hops=3, p=4).collect()))
    want = sorted(_anf_reference(adj, 3))
    assert got == want


def test_anf_monotone_and_saturates_on_clique(spark):
    from knowledgegraphbuilder_spark.operators.graphstats import anf_hyperball

    ns = [f"n{i}" for i in range(6)]
    edges = spark.createDataFrame(
        [(a, b) for i, a in enumerate(ns) for b in ns[i + 1:]],
        "src string, dst string",
    )
    rows = {r["hop"]: r for r in anf_hyperball(edges, max_hops=2, p=4).collect()}
    # hop 0 ~ one per node; hop 1 reaches the whole clique; hop 2 adds nothing
    assert rows[0]["anf"] < rows[1]["anf"]
    assert rows[1]["anf_micro"] == rows[2]["anf_micro"]


def test_anf_repartition_stable(spark):
    from knowledgegraphbuilder_spark.operators.graphstats import anf_hyperball

    edge_list = [(f"a{i}", f"a{(i * 3 + 1) % 40}") for i in range(40)]
    edges = spark.createDataFrame(edge_list, "src string, dst string")
    a = sorted(map(tuple, anf_hyperball(edges, max_hops=2).collect()))
    b = sorted(map(tuple, anf_hyperball(edges.repartition(11), max_hops=2).collect()))
    assert a == b
