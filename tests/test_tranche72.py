"""Tranche 72: quantified / negated property paths (operators/bgp.py)
and grid-accelerated DBSCAN (operators/clustering.py)."""

import pytest

from knowledgegraphbuilder_spark.operators.bgp import (
    negated_property_set,
    path_quantified,
)
from knowledgegraphbuilder_spark.operators.clustering import grid_dbscan


@pytest.fixture()
def chain(spark):
    rows = [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d"),
            ("a", "q", "c"), ("d", "r", "a")]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_path_quantified_bfs_minimal(spark, chain):
    rows = sorted((r.src, r.dst, r.hops)
                  for r in path_quantified(chain, "p", 2, 3).collect())
    assert rows == [("a", "c", 2), ("a", "d", 3), ("b", "d", 2)]


def test_path_quantified_lower_bound_one_is_closure(spark, chain):
    full = sorted((r.src, r.dst, r.hops)
                  for r in path_quantified(chain, "p", 1, 3).collect())
    assert ("a", "b", 1) in full and ("a", "d", 3) in full
    assert len(full) == 6  # 3 edges + ac, bd, ad


def test_path_quantified_exists_is_sparql_spec(spark):
    # a->b directly AND via c: W3C existence semantics INCLUDES (a,b) in
    # p{2,3} (a 2-hop path exists), with hops = the smallest matching
    # length — the r4-advice fix; the old minimal-hop reading excluded it
    rows = [("a", "p", "b"), ("a", "p", "c"), ("c", "p", "b")]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = {(r.src, r.dst): r.hops for r in path_quantified(df, "p", 2, 3).collect()}
    assert out[("a", "b")] == 2


def test_path_quantified_minimal_mode_excludes_shorter(spark):
    # the stricter BFS-minimal reading survives behind semantics="minimal"
    rows = [("a", "p", "b"), ("a", "p", "c"), ("c", "p", "b")]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = [(r.src, r.dst)
           for r in path_quantified(df, "p", 2, 3,
                                    semantics="minimal").collect()]
    assert ("a", "b") not in out


def test_path_quantified_exists_cycle_and_min_length(spark):
    # 2-cycle a<->b: a reaches a at every even length, b at every odd;
    # p{2,3} must report both with the smallest matching length
    rows = [("a", "p", "b"), ("b", "p", "a")]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = {(r.src, r.dst): r.hops for r in path_quantified(df, "p", 2, 3).collect()}
    assert out == {("a", "a"): 2, ("b", "b"): 2, ("a", "b"): 3, ("b", "a"): 3}


def test_path_quantified_validates_bounds(spark, chain):
    with pytest.raises(ValueError):
        path_quantified(chain, "p", 0, 3)
    with pytest.raises(ValueError):
        path_quantified(chain, "p", 3, 2)


def test_negated_property_set(spark, chain):
    rows = [(r.src, r.dst)
            for r in negated_property_set(chain, ["p", "q"]).collect()]
    assert rows == [("d", "a")]
    assert negated_property_set(chain, ["p", "q", "r"]).count() == 0


DB_SCHEMA = "vec_id long, embedding array<float>, label int"


def test_dbscan_blob_core_border_noise(spark):
    rows = [(i, [0.100 + 0.004 * i, 0.100], 0) for i in range(6)]
    rows += [(10, [0.145, 0.100], 0),   # within eps only of point 5
             (11, [0.300, 0.300], 0),   # isolated
             (12, [-0.200, -0.200], 0)]
    df = spark.createDataFrame(rows, DB_SCHEMA)
    out = {r.vec_id: r for r in grid_dbscan(df, eps_milli=25,
                                            min_pts=4).collect()}
    assert all(out[str(i)].role == "core" for i in range(6))
    # blob cluster is the lexicographic-min member id
    assert {out[str(i)].cluster for i in range(6)} == {"0"}
    assert out["10"].role == "border" and out["10"].cluster == "0"
    assert out["11"].role == "noise" and out["11"].cluster is None
    assert out["12"].role == "noise"


def test_dbscan_negative_coords_cells_align(spark):
    # a dense blob entirely in negative coordinate space — the pmod
    # floor-division keeps cell math consistent for any sign
    rows = [(i, [-0.200 - 0.003 * i, -0.300], 0) for i in range(5)]
    df = spark.createDataFrame(rows, DB_SCHEMA)
    out = grid_dbscan(df, eps_milli=25, min_pts=4).collect()
    assert all(r.role == "core" for r in out)
    assert len({r.cluster for r in out}) == 1


def test_dbscan_deep_negative_coords_straddling_cells(spark):
    # r4 advice regression: components <= -4.096 overflowed the old
    # +4096 shift, truncating cell ids toward zero and silently missing
    # eps-neighbors across cell boundaries. A blob straddling a cell
    # boundary around -5.0 must still cluster as one component, and the
    # result must equal a brute-force DBSCAN replay.
    rows = [(i, [-5.000 - 0.004 * i, -5.000], 0) for i in range(6)]
    rows += [(10, [-5.044, -5.000], 0),  # within eps only of point 5
             (11, [-6.000, -6.000], 0)]  # isolated
    df = spark.createDataFrame(rows, DB_SCHEMA)
    out = {r.vec_id: r for r in grid_dbscan(df, eps_milli=25,
                                            min_pts=4).collect()}
    # brute-force replay on quantized integer coords (float32 storage,
    # as the array<float> schema — mirror the engine's f32->f64 cast)
    import math

    import numpy as np

    q = {str(i): (math.floor(float(np.float32(v[0])) * 1000),
                  math.floor(float(np.float32(v[1])) * 1000))
         for i, v, _ in rows}
    ball = {a: {b for b in q
                if (q[a][0] - q[b][0]) ** 2 + (q[a][1] - q[b][1]) ** 2 <= 625}
            for a in q}
    cores = {a for a in q if len(ball[a]) >= 4}
    assert {k for k, r in out.items() if r.role == "core"} == cores
    assert all(out[str(i)].role == "core" for i in range(6))
    assert {out[str(i)].cluster for i in range(6)} == {"0"}
    assert out["10"].role == "border" and out["10"].cluster == "0"
    assert out["11"].role == "noise"


def test_dbscan_two_separate_clusters(spark):
    rows = [(i, [0.0 + 0.002 * i, 0.0], 0) for i in range(4)]
    rows += [(100 + i, [0.300 + 0.002 * i, 0.300], 0) for i in range(4)]
    df = spark.createDataFrame(rows, DB_SCHEMA)
    out = grid_dbscan(df, eps_milli=25, min_pts=4).collect()
    assert len({r.cluster for r in out}) == 2
    assert all(r.role == "core" for r in out)


def test_dbscan_empty_input(spark):
    df = spark.createDataFrame([], DB_SCHEMA)
    assert grid_dbscan(df).count() == 0


def test_temporal_motifs_hand_computed(spark):
    from knowledgegraphbuilder_spark.operators.graphstats import temporal_motifs

    # type x: u1@0s -> u2@10s -> u3@20s (one 2-path); u9@2h isolated
    rows = [
        (1, "2024-01-01 00:00:00", 1, "x"),
        (2, "2024-01-01 00:00:10", 2, "x"),
        (3, "2024-01-01 00:00:20", 3, "x"),
        (4, "2024-01-01 02:30:00", 9, "x"),
        (5, "2024-01-01 00:00:05", 7, "y"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts string, user_id long, event_type string")
    df = df.selectExpr("event_id", "cast(ts as timestamp_ntz) as ts",
                       "user_id", "event_type")
    out = {r.event_type: r for r in temporal_motifs(df).collect()}
    x = out["x"]
    # contacts: (1->2), (1->3), (2->3); 2-paths through shared middle
    # events: (1->2)+(2->3) = 1; (u1 -> u3)
    assert (x.n_events, x.n_contacts, x.n_2paths, x.n_influence_pairs) == (4, 3, 1, 1)
    y = out["y"]
    assert (y.n_events, y.n_contacts, y.n_2paths) == (1, 0, 0)


def test_temporal_motifs_same_user_and_reverse_time_excluded(spark):
    from knowledgegraphbuilder_spark.operators.graphstats import temporal_motifs

    rows = [
        (1, "2024-01-01 00:00:00", 1, "x"),
        (2, "2024-01-01 00:00:10", 1, "x"),   # same user: no contact
        (3, "2024-01-01 00:00:05", 2, "x"),   # 1->3 forward only
    ]
    df = spark.createDataFrame(rows, "event_id long, ts string, user_id long, event_type string")
    df = df.selectExpr("event_id", "cast(ts as timestamp_ntz) as ts",
                       "user_id", "event_type")
    x = temporal_motifs(df).collect()[0]
    # contacts: e1(u1)->e3(u2), e3(u2)->e2(u1); 2-path e1->e3->e2 has
    # u3 == u1 (backtracking) so it is excluded
    assert x.n_contacts == 2 and x.n_2paths == 0


def test_temporal_motifs_window_boundary_inclusive(spark):
    from knowledgegraphbuilder_spark.operators.graphstats import temporal_motifs

    rows = [(1, "2024-01-01 00:00:00", 1, "x"),
            (2, "2024-01-01 01:00:00", 2, "x"),    # dt == W: contact
            (3, "2024-01-01 02:00:00.000001", 3, "x")]  # dt > W from e2
    df = spark.createDataFrame(rows, "event_id long, ts string, user_id long, event_type string")
    df = df.selectExpr("event_id", "cast(ts as timestamp_ntz) as ts",
                       "user_id", "event_type")
    x = temporal_motifs(df).collect()[0]
    assert x.n_contacts == 1


def test_wl_quotient_path_graph(spark):
    from knowledgegraphbuilder_spark.operators.graphstats import wl_quotient

    # directed path a -p-> b -p-> c: after 2 WL rounds all three nodes
    # are structurally distinct (source / middle / sink)
    tr = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c")],
        "subj string, pred string, obj string",
    )
    rows = wl_quotient(tr, rounds=2).collect()
    assert len(rows) == 2
    assert all(r.n_statements == 1 and r.n_src_nodes == 1 for r in rows)
    assert {r.src_exemplar for r in rows} == {"a", "b"}


def test_wl_quotient_merges_equivalent_nodes(spark):
    from knowledgegraphbuilder_spark.operators.graphstats import wl_quotient

    # two leaves with identical typed neighborhoods collapse into one
    # summary node with n_nodes = 2
    tr = spark.createDataFrame(
        [("hub", "p", "l1"), ("hub", "p", "l2")],
        "subj string, pred string, obj string",
    )
    rows = wl_quotient(tr, rounds=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_statements == 2 and r.n_dst_nodes == 2
    assert r.dst_exemplar == "l1"


def test_explain_rule_witness_and_doc_counts(spark):
    from knowledgegraphbuilder_spark.operators.bgp import explain_rule

    rows = [
        ("a", "p", "m1", "d1"), ("m1", "q", "c", "d2"),
        ("a", "p", "m2", "d3"), ("m2", "q", "c", "d1"),
        ("x", "p", "y", "d4"),  # no q continuation
    ]
    tr = spark.createDataFrame(
        rows, "subj string, pred string, obj string, doc_id string")
    out = explain_rule(tr, [("?a", "p", "?b"), ("?b", "q", "?c")],
                       ("?a", "derived", "?c")).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.a, r.c, r.n_witnesses, r.example_witness) == ("a", "c", 2, "m1")
    assert r.n_support_docs == 3  # d1, d2, d3


def test_tranche72_empty_inputs(spark):
    from knowledgegraphbuilder_spark.operators.bgp import (
        negated_property_set, path_quantified,
    )
    from knowledgegraphbuilder_spark.operators.graphstats import (
        temporal_motifs, wl_quotient,
    )

    tr = spark.createDataFrame([], "subj string, pred string, obj string")
    assert path_quantified(tr, "p", 2, 3).count() == 0
    assert negated_property_set(tr, ["p"]).count() == 0
    assert wl_quotient(tr, rounds=2).count() == 0
    ev = spark.createDataFrame(
        [], "event_id long, ts timestamp_ntz, user_id long, event_type string")
    assert temporal_motifs(ev).count() == 0


def test_triad_census_ffl_and_cycle(spark):
    from knowledgegraphbuilder_spark.operators.graphstats import triad_census

    # FFL: a->b, b->c, a->c ; separate cycle: x->y, y->z, z->x
    ed = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"),
         ("x", "y"), ("y", "z"), ("z", "x")],
        "s string, d string",
    )
    r = triad_census(ed).collect()[0]
    assert (r.n_edges, r.n_ffl, r.n_cycle) == (6, 1, 1)
    # wedges: ab+bc, (ac has no continuation), xy+yz, yz+zx, zx+xy
    assert r.n_wedges == 4


def test_triad_census_self_loops_and_dups_removed(spark):
    from knowledgegraphbuilder_spark.operators.graphstats import triad_census

    ed = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("a", "b")], "s string, d string")
    r = triad_census(ed).collect()[0]
    assert (r.n_edges, r.n_wedges, r.n_ffl, r.n_cycle) == (1, 0, 0, 0)


def test_join_cardinality_exact_on_uniform_and_skewed(spark):
    from knowledgegraphbuilder_spark.operators.graph_build import (
        join_cardinality_stats,
    )

    rows = [
        # p: 2 rows to distinct mids; q: each mid continues once ->
        # independence holds exactly: est = 2*2/max(2,2) = 2 = actual
        ("a1", "p", "m1", "d"), ("a2", "p", "m2", "d"),
        ("m1", "q", "z1", "d"), ("m2", "q", "z2", "d"),
        # r: skew — both rows hit ONE mid that fans 2 ways in s
        ("b1", "r", "hub", "d"), ("b2", "r", "hub", "d"),
        ("hub", "s", "w1", "d"), ("hub", "s", "w2", "d"),
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, doc_id string")
    out = {(r.p, r.q): r for r in join_cardinality_stats(df).collect()}
    pq = out[("p", "q")]
    assert (pq.est_rows, pq.actual_rows, pq.rel_err_micro) == (2, 2, 0)
    rs = out[("r", "s")]
    # est = 2*2/max(1,1) = 4 = actual here (single shared mid): err 0
    assert rs.actual_rows == 4 and rs.est_rows == 4


def test_kg_asof_window_semantics(spark):
    from knowledgegraphbuilder_spark.operators.graph_build import (
        asof_statements, statement_validity,
    )

    rows = [("a", "p", "b", "doc_1"), ("a", "p", "b", "doc_9"),
            ("x", "q", "y", "doc_3"), ("m", "r", "n", "doc_8")]
    tr = spark.createDataFrame(
        rows, "subj string, pred string, obj string, doc_id string")
    v = {(r.subj): r for r in statement_validity(tr).collect()}
    assert (v["a"].t_from, v["a"].t_to, v["a"].n_assertions) == (1, 9, 2)
    at5 = {(r.subj, r.pred, r.obj) for r in asof_statements(tr, 5).collect()}
    # a: [1,9] contains 5; x: [3,3] and m: [8,8] do not
    assert at5 == {("a", "p", "b")}


def test_conformal_coverage_near_target_and_stable(spark, sf_dir):
    from knowledgegraphbuilder_spark.operators.mlstats import (
        conformal_intervals,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    args = dict(
        x_expr="cast(l_quantity as bigint)",
        y_expr="cast(floor(l_extendedprice * 100) as bigint)",
        key_expr="concat(cast(l_orderkey as string), '-', "
                 "cast(l_linenumber as string))",
        group_col="l_returnflag",
    )
    out = {r.grp: r for r in conformal_intervals(li, **args).collect()}
    for r in out.values():
        # distribution-free validity: coverage within sampling noise of
        # the 90% target at this calibration size
        assert 820000 <= r.coverage_micro <= 980000
        assert r.qhat_micro > 0 and r.k <= r.n_cal
    # partition-order invariance of the whole exact pipeline
    out2 = {r.grp: r
            for r in conformal_intervals(li.repartition(13), **args).collect()}
    assert {g: tuple(r) for g, r in out.items()} == \
           {g: tuple(r) for g, r in out2.items()}


def test_conformal_under_calibrated_group_visible(spark):
    # r4 advice regression: a group whose calibration split is smaller
    # than k (here a handful of rows at alpha=0.1 -> k = ceil(0.9*(n+1))
    # > n_cal) must SURFACE with qhat_micro NULL (interval = whole line,
    # coverage trivially 1), not silently vanish from the output.
    from knowledgegraphbuilder_spark.operators.mlstats import (
        conformal_intervals,
    )

    # keys chosen so every fold is populated but fold-1 (calibration)
    # stays tiny; y = 3x + noise keeps dd <> 0
    rows = [("g", i, 3 * i + (i % 3), str(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "grp string, x long, y long, k string")
    out = conformal_intervals(
        df, x_expr="x", y_expr="y", key_expr="k", group_col="grp",
        alpha_tenths=1,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.k > r.n_cal          # genuinely under-calibrated fixture
    assert r.qhat_micro is None   # interval undefined — visible, not dropped
    assert r.coverage_micro == 1000000 or r.n_test == 0


def test_completeness_profile_counts(spark):
    from knowledgegraphbuilder_spark.operators.graph_build import (
        completeness_profile,
    )

    ty = spark.createDataFrame(
        [("a", "tech"), ("b", "tech"), ("c", "org")],
        "entity string, label string")
    tr = spark.createDataFrame(
        [("a", "p", "x", "d1"), ("a", "p", "y", "d2"), ("c", "q", "a", "d1")],
        "subj string, pred string, obj string, doc_id string")
    out = {(r.label, r.pred): r
           for r in completeness_profile(tr, ty).collect()}
    # 1 of 2 tech entities asserts p; orgs fully cover q; no dense shell
    assert out[("tech", "p")].coverage_micro == 500000
    assert out[("org", "q")].coverage_micro == 1000000
    assert ("org", "p") not in out
