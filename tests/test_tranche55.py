"""Tranche 55: N-Triples round-trip import, SPARQL OPTIONAL, hash-placement
edge-cut audit, link-prediction ranking eval, entity profile."""

import hashlib

import pytest
from pyspark.sql import functions as F


def _sha_bucket(s: str, k: int) -> int:
    return int(hashlib.sha256(s.encode()).hexdigest()[:15], 16) % k


# ---------------------------------------------------------------------------
# rdfio.from_ntriples — parse . serialize == identity, incl. nasty escapes
# ---------------------------------------------------------------------------

NASTY = [
    # (subj, pred, obj) with every ECHAR plus the literal 2-char "\n"
    ('a"quote', "rel_a", "tab\there"),
    ("back\\slash", "rel_a", "line\nbreak"),
    ("carriage\rreturn", "rel_b", "literal\\nbackslash_n"),
    ("plain", "rel_b", "plain2"),
    ("plain", "rel_b", "plain2"),  # duplicate: import is distinct
]


def test_ntriples_roundtrip_identity(spark):
    from knowledgegraphbuilder_spark.operators.export import to_ntriples
    from knowledgegraphbuilder_spark.operators.rdfio import from_ntriples

    t = spark.createDataFrame(NASTY, "subj string, pred string, obj string")
    back = from_ntriples(to_ntriples(t))
    got = {tuple(r) for r in back.collect()}
    want = set(NASTY[:-1])
    assert got == want


def test_ntriples_unescape_order(spark):
    """The escaped backslash must NOT be confused with a real escape:
    the text "literal\\nbackslash_n" (backslash + n) survives while
    "line\nbreak" (newline) also survives — distinct round-trips."""
    from knowledgegraphbuilder_spark.operators.rdfio import unescape_literal

    df = spark.createDataFrame(
        [("line\\nbreak",), ("literal\\\\nbackslash_n",)], "s string"
    ).select(unescape_literal(F.col("s")).alias("u"))
    got = sorted(r["u"] for r in df.collect())
    assert got == sorted(["line\nbreak", "literal\\nbackslash_n"])


def test_ntriples_ignores_foreign_lines(spark):
    from knowledgegraphbuilder_spark.operators.rdfio import from_ntriples

    lines = spark.createDataFrame(
        [("# comment",), ("<urn:other:x> <urn:other:p> <urn:other:y> .",)],
        "nt string",
    )
    assert from_ntriples(lines).count() == 0


# ---------------------------------------------------------------------------
# bgp.optional_match — left-join semantics, both branches
# ---------------------------------------------------------------------------

GRAPH = [
    ("t1", "uses", "org1"),
    ("t2", "uses", "org2"),
    ("org1", "runs", "sys1"),
    ("org1", "runs", "sys2"),
]


def test_optional_match_branches(spark):
    from knowledgegraphbuilder_spark.operators.bgp import optional_match

    t = spark.createDataFrame(GRAPH, "subj string, pred string, obj string")
    out = optional_match(
        t, [("?a", "uses", "?b")], [("?b", "runs", "?s")]
    ).collect()
    rows = {(r["a"], r["b"], r["s"]) for r in out}
    # org1 matches twice (two systems), org2 survives with NULL
    assert rows == {
        ("t1", "org1", "sys1"),
        ("t1", "org1", "sys2"),
        ("t2", "org2", None),
    }


def test_optional_match_disconnected_raises(spark):
    from knowledgegraphbuilder_spark.operators.bgp import optional_match

    t = spark.createDataFrame(GRAPH, "subj string, pred string, obj string")
    with pytest.raises(ValueError):
        optional_match(t, [("?a", "uses", "?b")], [("?x", "runs", "?y")])


def test_optional_match_empty_optional_is_bgp(spark):
    from knowledgegraphbuilder_spark.operators.bgp import bgp_match, optional_match

    t = spark.createDataFrame(GRAPH, "subj string, pred string, obj string")
    a = sorted(map(tuple, optional_match(t, [("?a", "uses", "?b")], []).collect()))
    b = sorted(map(tuple, bgp_match(t, [("?a", "uses", "?b")]).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# layout.edge_cut_stats — hand-computed buckets
# ---------------------------------------------------------------------------


def test_edge_cut_stats_exact(spark):
    from knowledgegraphbuilder_spark.operators.layout import edge_cut_stats

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")]
    k = 4
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["part"]: (r["n_nodes"], r["n_edges"], r["n_cut"])
           for r in edge_cut_stats(df, k=k).collect()}
    want: dict[int, list[int]] = {}
    for s, d in edges:
        p, q = _sha_bucket(s, k), _sha_bucket(d, k)
        rec = want.setdefault(p, [set(), 0, 0])
        rec[0].add(s)
        rec[1] += 1
        rec[2] += int(p != q)
    assert got == {p: (len(v[0]), v[1], v[2]) for p, v in want.items()}


def test_edge_cut_frac_bounds(spark):
    from knowledgegraphbuilder_spark.operators.layout import edge_cut_stats

    df = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 7 + 1) % 40}") for i in range(40)],
        "src string, dst string",
    )
    rows = edge_cut_stats(df, k=8).collect()
    assert sum(r["n_edges"] for r in rows) == 40
    for r in rows:
        assert 0.0 <= r["cut_frac"] <= 1.0


# ---------------------------------------------------------------------------
# graphstats.lp_rank_eval — python brute-force parity on a real split
# ---------------------------------------------------------------------------


def _brute_lp_eval(edges, holdout_mod, max_hub_degree):
    split = {}
    for s, d in edges:
        hv = int(hashlib.sha256(f"{s}|{d}".encode()).hexdigest()[:15], 16)
        split.setdefault(hv % holdout_mod == 0, []).append((s, d))
    test, train = split.get(True, []), split.get(False, [])
    adj: dict[str, set] = {}
    for s, d in train:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    deg = {z: len(ns) for z, ns in adj.items()}
    train_set = set(train)
    cand: dict[tuple, int] = {}
    for z, ns in adj.items():
        if deg[z] > max_hub_degree:
            continue
        ra1 = 10**12 // deg[z]
        ns_sorted = sorted(ns)
        for i, u in enumerate(ns_sorted):
            for v in ns_sorted[i + 1:]:
                if (u, v) not in train_set:
                    cand[(u, v)] = cand.get((u, v), 0) + ra1
    by_src: dict[str, list] = {}
    for (u, v), ra in cand.items():
        by_src.setdefault(u, []).append((v, ra))
    rank = {}
    for u, lst in by_src.items():
        lst.sort(key=lambda t: (-t[1], t[0]))
        for i, (v, _) in enumerate(lst):
            rank[(u, v)] = i + 1
    n_test = len(test)
    ranks = [rank.get(e) for e in test]
    n_ranked = sum(r is not None for r in ranks)
    mrr_units = sum(10**12 // r for r in ranks if r is not None)
    mrr = round(mrr_units / 1e12 / n_test, 6) if n_test else None
    hits = lambda k: sum(1 for r in ranks if r is not None and r <= k)  # noqa: E731
    return (n_test, n_ranked, mrr, hits(1), hits(3), hits(10))


def test_lp_rank_eval_matches_bruteforce(spark):
    from knowledgegraphbuilder_spark.operators.graphstats import lp_rank_eval

    # overlapping 5-cliques: dense triadic structure so held-out edges
    # have training common neighbors (n_ranked > 0, checked below)
    eset = set()
    for start in range(0, 12, 3):
        grp = [f"w{j:02d}" for j in range(start, start + 5)]
        for i in range(len(grp)):
            for j in range(i + 1, len(grp)):
                eset.add((grp[i], grp[j]))
    edges = sorted(eset)
    df = spark.createDataFrame(edges, "src string, dst string")
    row = lp_rank_eval(df, holdout_mod=3, max_hub_degree=100).collect()[0]
    want = _brute_lp_eval(edges, 3, 100)
    got = (row["n_test"], row["n_ranked"], row["mrr"],
           row["hits1"], row["hits3"], row["hits10"])
    assert got == want
    assert row["n_test"] > 0 and row["n_ranked"] > 0  # split non-degenerate


# ---------------------------------------------------------------------------
# graph_build.entity_profile — hand-computed star rows
# ---------------------------------------------------------------------------


def test_entity_profile_exact(spark):
    from knowledgegraphbuilder_spark.operators.graph_build import entity_profile

    triples = [
        ("a", "r1", "b", "d1"),
        ("a", "r1", "c", "d1"),
        ("a", "r2", "b", "d2"),
        ("b", "r2", "a", "d3"),
        ("a", "r2", "c", "d1"),  # ties r1=2 vs r2=2 -> lexicographic r1
    ]
    t = spark.createDataFrame(
        triples, "subj string, pred string, obj string, doc_id string"
    )
    rows = {r["node"]: r for r in entity_profile(t).collect()}
    a, b, c = rows["a"], rows["b"], rows["c"]
    assert (a["out_deg"], a["in_deg"], a["n_rel_types_out"]) == (4, 1, 2)
    assert a["top_out_rel"] == "r1"  # tie 2-2 broken lexicographically
    assert a["n_docs"] == 3
    assert (b["out_deg"], b["in_deg"], b["top_out_rel"]) == (1, 2, "r2")
    assert (c["out_deg"], c["in_deg"], c["top_out_rel"]) == (0, 2, None)
    assert c["n_docs"] == 1


# ---------------------------------------------------------------------------
# streaming N-Triples ingest — out-of-order shards, replay idempotency
# ---------------------------------------------------------------------------


def test_stream_nt_out_of_order_and_replay(spark, tmp_path):
    from knowledgegraphbuilder_spark.operators.export import to_ntriples
    from knowledgegraphbuilder_spark.streaming.ingest import (
        read_nt_triples, run_nt_ingest_available_now,
    )

    t = spark.createDataFrame(NASTY, "subj string, pred string, obj string")
    nt = to_ntriples(t)
    base = str(tmp_path / "nt")
    # shard 0: ALL statements, shard 1: ALL labels — every statement's
    # labels arrive in a later micro-batch, so per-batch resolution would
    # yield zero triples; read-time resolution must yield all of them
    nt.filter("kind = 'rel'").select("nt").coalesce(1).write.mode(
        "overwrite").text(f"{base}/in/b0")
    nt.filter("kind = 'label'").select("nt").coalesce(1).write.mode(
        "overwrite").text(f"{base}/in/b1")
    run_nt_ingest_available_now(spark, f"{base}/in/*", f"{base}/st",
                                f"{base}/ck")
    got = {tuple(r) for r in read_nt_triples(spark, f"{base}/st").collect()}
    assert got == set(NASTY[:-1])
    # full replay against a fresh checkpoint is a no-op
    run_nt_ingest_available_now(spark, f"{base}/in/*", f"{base}/st",
                                f"{base}/ck2")
    again = {tuple(r) for r in read_nt_triples(spark, f"{base}/st").collect()}
    assert again == got


def test_stream_nt_partial_labels_resolve_late(spark, tmp_path):
    """A statement whose object label never arrived stays invisible, then
    appears when the missing shard lands — no partial/corrupt rows."""
    from knowledgegraphbuilder_spark.operators.export import to_ntriples
    from knowledgegraphbuilder_spark.streaming.ingest import (
        read_nt_triples, run_nt_ingest_available_now,
    )

    t = spark.createDataFrame([("x", "r", "y")],
                              "subj string, pred string, obj string")
    nt = to_ntriples(t)
    base = str(tmp_path / "ntp")
    nt.filter("kind = 'rel'").select("nt").coalesce(1).write.mode(
        "overwrite").text(f"{base}/in/b0")
    # only the subject's label in the first feed
    nt.filter("kind = 'label' and nt like '%\"x\"%'").select(
        "nt").coalesce(1).write.mode("overwrite").text(f"{base}/in/b1")
    run_nt_ingest_available_now(spark, f"{base}/in/*", f"{base}/st",
                                f"{base}/ck")
    assert read_nt_triples(spark, f"{base}/st").count() == 0
    # late shard with the object label -> the statement resolves
    nt.filter("kind = 'label' and nt like '%\"y\"%'").select(
        "nt").coalesce(1).write.mode("overwrite").text(f"{base}/in/b2")
    run_nt_ingest_available_now(spark, f"{base}/in/*", f"{base}/st",
                                f"{base}/ck2")
    rows = {tuple(r) for r in read_nt_triples(spark, f"{base}/st").collect()}
    assert rows == {("x", "r", "y")}


# ---------------------------------------------------------------------------
# bgp.union_match — variable-set union with NULL padding
# ---------------------------------------------------------------------------


def test_union_match_null_padding(spark):
    from knowledgegraphbuilder_spark.operators.bgp import union_match

    t = spark.createDataFrame(GRAPH, "subj string, pred string, obj string")
    out = union_match(
        t, [[("?a", "uses", "?b")], [("?x", "runs", "?a")]]
    )
    assert out.columns == ["a", "b", "x"]
    rows = {tuple(r) for r in out.collect()}
    assert rows == {
        ("t1", "org1", None),
        ("t2", "org2", None),
        ("sys1", None, "org1"),
        ("sys2", None, "org1"),
    }


def test_union_match_dedups_across_branches(spark):
    from knowledgegraphbuilder_spark.operators.bgp import union_match

    t = spark.createDataFrame(GRAPH, "subj string, pred string, obj string")
    # identical branches -> same result as one branch (set semantics)
    two = union_match(t, [[("?a", "uses", "?b")], [("?a", "uses", "?b")]])
    one = union_match(t, [[("?a", "uses", "?b")]])
    assert sorted(map(tuple, two.collect())) == sorted(map(tuple, one.collect()))


def test_union_match_empty_groups_raises(spark):
    from knowledgegraphbuilder_spark.operators.bgp import union_match

    t = spark.createDataFrame(GRAPH, "subj string, pred string, obj string")
    with pytest.raises(ValueError):
        union_match(t, [])


# ---------------------------------------------------------------------------
# graphstats.percolation_sweep — hand-built threshold structure
# ---------------------------------------------------------------------------


def test_percolation_sweep_exact(spark):
    from knowledgegraphbuilder_spark.operators.graphstats import percolation_sweep

    # chain a-b-c at weight 3, bridge c-d at weight 2, pair e-f at weight 5
    edges = [
        ("a", "b", 3), ("b", "c", 3), ("c", "d", 2), ("e", "f", 5),
    ]
    df = spark.createDataFrame(edges, "src string, dst string, weight long")
    got = {r["threshold"]: (r["n_nodes"], r["n_edges"], r["n_components"],
                            r["largest"])
           for r in percolation_sweep(df, [2, 3, 4, 6]).collect()}
    assert got[2] == (6, 4, 2, 4)   # {a,b,c,d} + {e,f}
    assert got[3] == (5, 3, 2, 3)   # bridge gone: {a,b,c} + {e,f}
    assert got[4] == (2, 1, 1, 2)   # only {e,f}
    assert got[6] == (None, 0, 0, 0)  # empty graph: NULL node sum, 0 comps


# ---------------------------------------------------------------------------
# clustering.silhouette_profile — separation signal on constructed clusters
# ---------------------------------------------------------------------------


def test_silhouette_separated_clusters(spark):
    from knowledgegraphbuilder_spark.operators.clustering import (
        kmeans_quantized, silhouette_profile,
    )

    # two tight, well-separated blobs in 4-d. Membership follows the
    # sha256 order of the ids so the k=2 seed pick (the two sha-smallest
    # vectors, clustering.py:_fit_centroids) lands one seed per blob —
    # with both seeds in one blob, Lloyd legitimately converges to a
    # split-the-blob solution and the 10/10 assertion would test the
    # init, not the silhouette.
    ids = sorted((f"p{i}" for i in range(20)),
                 key=lambda x: hashlib.sha256(x.encode()).hexdigest())
    rows = []
    for j, pid in enumerate(ids):
        blob = 1.0 if (j % 2 == 0) else -1.0
        rows.append((pid, [blob, blob, 0.0, j * 1e-4]))
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    prof = silhouette_profile(df, k=2, iters=2).collect()
    assert len(prof) == 2
    for r in prof:
        assert r["n"] == 10
        assert r["mean_sil"] > 0.95  # tight blobs, far apart
    # consistency: cluster ids and sizes match the kmeans assignment
    km = kmeans_quantized(df, k=2, iters=2)
    sizes = {r["cluster"]: r["count"]
             for r in km.groupBy("cluster").count().collect()}
    assert sizes == {r["cluster"]: r["n"] for r in prof}


def test_silhouette_boundary_point_low_score(spark):
    from knowledgegraphbuilder_spark.operators.clustering import silhouette_profile

    # two blobs + a point exactly between them; sha-ordered membership
    # (see above) keeps one k=2 seed per blob, and "mid" is pushed past
    # the seed window by construction
    ids = sorted((f"q{i}" for i in range(10)),
                 key=lambda x: hashlib.sha256(x.encode()).hexdigest())
    rows = [(pid, [1.0 if j % 2 == 0 else -1.0, 0.0])
            for j, pid in enumerate(ids)]
    rows.append(("mid", [0.0, 0.0]))
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    prof = {r["cluster"]: r for r in silhouette_profile(df, k=2, iters=1).collect()}
    # the boundary point drags its cluster's mean strictly below the
    # pure cluster's (which stays near 1)
    scores = sorted(r["mean_sil"] for r in prof.values())
    assert scores[0] < scores[1]
    assert scores[1] > 0.9
