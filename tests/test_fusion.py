"""Knowledge fusion & completion operators (operators/fusion.py) plus
eigenvector centrality and the owl:disjointWith audit — hand-computed
expectations and degenerate inputs."""

import pytest
from pyspark.sql import functions as F

from knowledgegraphbuilder_spark.operators.fusion import (
    construct_graph,
    fuse_extractions,
    pra_path_features,
    resolve_functional,
    sameas_rewrite,
)
from knowledgegraphbuilder_spark.operators.graphstats import (
    eigenvector_centrality,
)
from knowledgegraphbuilder_spark.operators.ontology import (
    disjointness_violations,
)

TRIPLE_SCHEMA = "subj string, pred string, obj string, doc_id long"


@pytest.fixture()
def triples(spark):
    rows = [
        ("a", "p", "b", 1), ("a", "p", "b", 2), ("a", "p", "b", 3),
        ("a", "p", "c", 4), ("b", "q", "c", 1), ("b", "q", "c", 2),
        ("c", "r", "a", 5),
    ]
    return spark.createDataFrame(rows, TRIPLE_SCHEMA)


def test_fuse_noisy_or_exact_micro(spark, triples):
    out = {
        (r.subj, r.pred, r.obj): r
        for r in fuse_extractions(
            triples, "CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END",
            {"a": 3, "b": 1},
        ).collect()
    }
    # (a,p,b): docs 1,2,3 -> class a (doc 2): k=1; class b (docs 1,3): k=2
    # residual = 3^1 * 1^2 = 3; p = 1e6 - 3 * 10^(6-3) = 997000
    r = out[("a", "p", "b")]
    assert (r.k_a, r.k_b, r.n_events, r.p_fused_micro) == (1, 2, 3, 997000)
    # (a,p,c): one class-a event -> 1e6 - 3*10^5 = 700000
    assert out[("a", "p", "c")].p_fused_micro == 700000
    # (c,r,a): one class-b event -> 1e6 - 1*10^5 = 900000
    assert out[("c", "r", "a")].p_fused_micro == 900000


def test_fuse_exact_beyond_six_events(spark):
    # r4 advice fix: the old code CLAMPED to 1e6 whenever total > 6; the
    # widened DECIMAL(38,0) fixed point is exact to 38 events.
    rows = [("s", "p", "o", i) for i in range(1, 10)]  # 9 events
    df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    r = fuse_extractions(df, "'a'", {"a": 3, "b": 1}).collect()[0]
    # p = 1e6 - ceil(3^9 / 10^3) = 1e6 - ceil(19.683e3/1e3)=1e6-20
    assert r.n_events == 9 and r.p_fused_micro == 999980


def test_fuse_high_residual_not_reported_as_certain(spark):
    # the advice's failure scenario, at the max supported residual: 7
    # events at residual 0.7 -> true p = 1 - 0.7^7 = 0.9176457, which the
    # old clamp reported as exactly 1.0
    rows = [("s", "p", "o", i) for i in range(7)]
    df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    r = fuse_extractions(df, "'a'", {"a": 7, "b": 1}).collect()[0]
    # 1e6 - ceil(7^7 / 10^1) = 1e6 - ceil(823543/10) = 1e6 - 82355
    assert r.p_fused_micro == 917645


def test_fuse_tail_past_38_events_is_exact_floor(spark):
    # for residuals <= 7 the residual mass past 38 events is < 1 micro,
    # so floor(1e6 * p) is exactly 999999 (not the saturated 1000000)
    rows = [("s", "p", "o", i) for i in range(40)]
    df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    r = fuse_extractions(df, "'a'", {"a": 7, "b": 1}).collect()[0]
    assert r.n_events == 40 and r.p_fused_micro == 999999


def test_fuse_zero_residual_class_is_certain(spark):
    # a zero-residual extractor (never misses) drives the posterior to
    # exactly 1.0 regardless of event count
    rows = [("s", "p", "o", i) for i in range(40)]
    df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    r = fuse_extractions(df, "'z'", {"z": 0, "b": 1}).collect()[0]
    assert r.p_fused_micro == 1000000
    r1 = fuse_extractions(
        spark.createDataFrame(rows[:1], TRIPLE_SCHEMA), "'z'", {"z": 0, "b": 1}
    ).collect()[0]
    assert r1.p_fused_micro == 1000000


def test_fuse_rejects_residuals_past_fixed_point(spark, triples):
    with pytest.raises(ValueError, match="must be in 0..7"):
        fuse_extractions(triples, "'a'", {"a": 9, "b": 1})


def test_fuse_spark_matches_duckdb_oracle_formula(spark):
    # the shared generator must produce bit-identical values in both
    # dialects across the three exactness regimes
    import duckdb

    from knowledgegraphbuilder_spark.operators.fusion import (
        fuse_from_counts,
        noisy_or_micro_sql,
    )

    cases = [(ka, kb) for ka in (0, 1, 3, 6, 7, 20, 38, 39, 50)
             for kb in (0, 2, 10)]
    counts = spark.createDataFrame(
        [("s", "p", f"o{i}", ka, kb) for i, (ka, kb) in enumerate(cases)],
        "subj string, pred string, obj string, k_a long, k_b long",
    )
    got = {
        r.obj: r.p_fused_micro
        for r in fuse_from_counts(counts, {"a": 7, "b": 3}).collect()
    }
    duck_expr = noisy_or_micro_sql({"a": 7, "b": 3}, dialect="duckdb")
    con = duckdb.connect()
    for i, (ka, kb) in enumerate(cases):
        exp = con.sql(
            f"SELECT {duck_expr} FROM (SELECT {ka}::BIGINT AS k_a,"
            f" {kb}::BIGINT AS k_b)"
        ).fetchone()[0]
        # cross-check against arbitrary-precision Python in the exact range
        from fractions import Fraction

        p = 1 - Fraction(7, 10) ** ka * Fraction(3, 10) ** kb
        assert got[f"o{i}"] == exp == (p * 10**6).__floor__(), (ka, kb)


def test_fuse_duplicate_events_collapse(spark):
    # same (statement, doc) twice is ONE extraction event
    rows = [("s", "p", "o", 1), ("s", "p", "o", 1)]
    df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    r = fuse_extractions(df, "'b'", {"a": 3, "b": 1}).collect()[0]
    assert r.n_events == 1 and r.p_fused_micro == 900000


def test_resolve_functional_majority_and_tiebreak(spark):
    rows = [
        # s1/p: 'x' wins 2 votes to 1
        ("s1", "p", "x", 1), ("s1", "p", "x", 2), ("s1", "p", "y", 3),
        # s2/p: tie 1-1 -> lexicographically smaller object
        ("s2", "p", "m", 1), ("s2", "p", "k", 2),
        # filtered predicate
        ("s3", "zz", "v", 1),
    ]
    df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    out = {r.subj: r for r in resolve_functional(df, ["p"]).collect()}
    assert set(out) == {"s1", "s2"}
    assert out["s1"].obj_resolved == "x"
    assert (out["s1"].n_votes, out["s1"].n_candidates,
            out["s1"].n_total_votes) == (2, 2, 3)
    assert out["s2"].obj_resolved == "k" and out["s2"].n_votes == 1


def test_construct_blank_nodes_deterministic_and_idempotent(spark, triples):
    body = [("?x", "p", "?y"), ("?y", "q", "?z")]
    heads = [("_:ev", "about", "?x"), ("_:ev", "links", "?z"),
             ("?x", "plinked", "?z")]
    g1 = construct_graph(triples, body, heads)
    rows = sorted((r.subj, r.pred, r.obj) for r in g1.collect())
    # one binding (a,b,c): 2 blank-node triples + 1 plain
    assert len(rows) == 3
    ev = [s for s, p, _ in rows if p == "about"][0]
    assert ev.startswith("b:") and len(ev) == 66
    assert ("a", "plinked", "c") in rows
    # same binding -> same skolem IRI on re-run
    g2 = construct_graph(triples, body, heads)
    assert rows == sorted((r.subj, r.pred, r.obj) for r in g2.collect())


def test_construct_no_match_is_empty(spark, triples):
    out = construct_graph(triples, [("?x", "nope", "?y")],
                          [("_:e", "t", "?x")])
    assert out.count() == 0


def test_pra_counts_paths_not_witnesses(spark):
    rows = [
        # two distinct p/q paths a->c plus the head assertion
        ("a", "p", "m1", 1), ("m1", "q", "c", 1),
        ("a", "p", "m2", 1), ("m2", "q", "c", 1),
        ("a", "t", "c", 1),
        # path to an UNasserted pair: excluded
        ("a", "p", "m3", 1), ("m3", "q", "d", 1),
    ]
    df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    out = pra_path_features(df, "t").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.x, r.z, r.body_p, r.body_q, r.n_paths) == ("a", "c", "p", "q", 2)


def test_pra_fan_cap_drops_hub_paths(spark):
    rows = [("a", "p", "hub", 1)]
    rows += [("hub", "q", f"z{i}", 1) for i in range(5)]
    rows += [("a", "t", "z0", 1)]
    df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    assert pra_path_features(df, "t", max_fan=3).count() == 0
    assert pra_path_features(df, "t", max_fan=100).count() == 1


def test_sameas_transitive_chain_merges(spark):
    tr = spark.createDataFrame(
        [("a", "p", "b", 1), ("b", "q", "c", 1), ("x", "r", "y", 1)],
        TRIPLE_SCHEMA,
    ).select("subj", "pred", "obj")
    # a—b and b—c equivalent: everything lands on min('a','b','c') = 'a'
    sa = spark.createDataFrame([("a", "b"), ("b", "c")],
                               "src string, dst string")
    rows = sorted((r.subj, r.pred, r.obj)
                  for r in sameas_rewrite(tr, sa).collect())
    assert rows == [("a", "p", "a"), ("a", "q", "a"), ("x", "r", "y")]


def test_sameas_empty_edges_identity(spark):
    tr = spark.createDataFrame([("a", "p", "b", 1)], TRIPLE_SCHEMA)
    sa = spark.createDataFrame([], "src string, dst string")
    rows = [(r.subj, r.pred, r.obj) for r in sameas_rewrite(tr, sa).collect()]
    assert rows == [("a", "p", "b")]


def test_eigenvector_hand_computed(spark):
    ed = spark.createDataFrame(
        [("1", "2"), ("2", "3"), ("3", "1"), ("3", "4")],
        "src string, dst string",
    )
    out = {r.node: r.eig_micro
           for r in eigenvector_centrality(ed, iters=3).collect()}
    # unrolled by hand: degrees (2,2,3,1); three max-normalized rounds
    assert out == {"1": 769230, "2": 769230, "3": 1000000, "4": 384615}


def test_eigenvector_star_center_dominates(spark):
    # a star is bipartite: undamped power iteration oscillates with
    # period 2 (even rounds return to uniform), so probe an ODD round —
    # the documented bounded-round contract, not a convergence claim
    ed = spark.createDataFrame(
        [("c", x) for x in ("l1", "l2", "l3", "l4")], "src string, dst string"
    )
    out = {r.node: r.eig_micro
           for r in eigenvector_centrality(ed, iters=3).collect()}
    assert out["c"] == 1000000
    assert all(out[f"l{i}"] == 250000 for i in range(1, 5))


ONTO = [
    ("technology", "artifact"), ("system", "artifact"),
    ("resource", "artifact"), ("organization", "agent"),
    ("artifact", "thing"), ("agent", "thing"),
]


def test_disjointness_inherited_through_hierarchy(spark):
    ty = spark.createDataFrame(
        [("x", "technology"), ("x", "organization"), ("y", "system")],
        "entity string, label string",
    )
    rows = [(r.entity, r.class_a, r.class_b)
            for r in disjointness_violations(
                ty, ONTO, [("artifact", "agent")]).collect()]
    # neither raw label is in the pair; the violation is entailed
    assert rows == [("x", "agent", "artifact")]


def test_disjointness_clean_typing_no_rows(spark):
    ty = spark.createDataFrame([("y", "system"), ("z", "organization")],
                               "entity string, label string")
    assert disjointness_violations(ty, ONTO, [("artifact", "agent")]).count() == 0


def test_disjointness_pair_order_normalized(spark):
    ty = spark.createDataFrame([("x", "technology"), ("x", "organization")],
                               "entity string, label string")
    a = disjointness_violations(ty, ONTO, [("artifact", "agent")]).collect()
    b = disjointness_violations(ty, ONTO, [("agent", "artifact")]).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_transe_rank_ranks_true_object(spark):
    from knowledgegraphbuilder_spark.operators.fusion import transe_rank_eval

    rows = [(f"e{i}", "r", f"e{(i + 1) % 6}", 1) for i in range(6)]
    df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    out = transe_rank_eval(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_triples == 6 and r.n_candidates == 6
    # every rank in [1, n_candidates]; aggregates are consistent
    assert 6 <= r.sum_rank <= 36
    assert 0 <= r.hits_at1 <= r.hits_at3 <= 6
    assert r.mrr_micro_floor <= 1000000 * 6


def test_transe_rank_candidate_cap_excludes_relation(spark):
    from knowledgegraphbuilder_spark.operators.fusion import transe_rank_eval

    rows = [("s", "r", f"o{i}", 1) for i in range(5)]
    df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    assert transe_rank_eval(df, max_candidates=3).count() == 0
    assert transe_rank_eval(df, max_candidates=5).count() == 1


def test_rdfstar_line_shape_and_confidence(spark):
    from knowledgegraphbuilder_spark.operators.export import to_rdfstar
    from knowledgegraphbuilder_spark.operators.fusion import fuse_extractions

    df = spark.createDataFrame([("a", "p", "b", 1)], TRIPLE_SCHEMA)
    fused = fuse_extractions(df, "'b'", {"a": 3, "b": 1})
    rows = to_rdfstar(fused).collect()
    assert len(rows) == 1
    nt = rows[0].nt
    assert nt.startswith("<< <urn:kg:node:") and nt.endswith(
        '"^^<http://www.w3.org/2001/XMLSchema#integer> .'
    )
    assert '"900000"' in nt and "<urn:kg:meta:confidence_micro>" in nt


def test_phash_dedup_assignment_covers_all_refs(spark, sf_dir):
    from knowledgegraphbuilder_spark.operators.multimodal import (
        media_refs, phash_dedup_resolve,
    )
    from knowledgegraphbuilder_spark.sources.interleaved import (
        read_documents_parquet,
    )

    spans = read_documents_parquet(spark, sf_dir)
    out = phash_dedup_resolve(spans)
    n_refs = media_refs(spans).count()
    rows = out.collect()
    assert len(rows) == n_refs
    # canon is a member-or-self and clusters are Hamming-consistent via
    # chains; every canon_ref is itself an assigned ref
    refs = {r.media_ref for r in rows}
    assert all(r.canon_ref in refs for r in rows)
    # canon is the component MIN, so it never exceeds the member
    assert all(r.canon_ref <= r.media_ref for r in rows)
    canon_self = {r.media_ref: r.canon_ref for r in rows}
    assert all(canon_self[r.canon_ref] == r.canon_ref for r in rows)


def test_fusion_ops_empty_inputs(spark):
    from knowledgegraphbuilder_spark.operators.fusion import transe_rank_eval

    empty = spark.createDataFrame([], TRIPLE_SCHEMA)
    assert fuse_extractions(empty, "'a'", {"a": 3, "b": 1}).count() == 0
    assert resolve_functional(empty, ["p"]).count() == 0
    assert pra_path_features(empty, "t").count() == 0
    assert transe_rank_eval(empty).count() == 0
    sa = spark.createDataFrame([], "src string, dst string")
    assert sameas_rewrite(empty.select("subj", "pred", "obj"), sa).count() == 0


def test_eigenvector_empty_edges(spark):
    ed = spark.createDataFrame([], "src string, dst string")
    assert eigenvector_centrality(ed, iters=3).count() == 0
