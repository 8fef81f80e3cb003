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


def test_path_quantified_minimal_hop_wins(spark):
    # a->b directly AND via c: p{2,3} excludes (a,b) — shortest is 1
    rows = [("a", "p", "b"), ("a", "p", "c"), ("c", "p", "b")]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = [(r.src, r.dst) for r in path_quantified(df, "p", 2, 3).collect()]
    assert ("a", "b") not in out


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
    # a dense blob entirely in negative coordinate space — the +4096
    # shift keeps div/floor cell math consistent
    rows = [(i, [-0.200 - 0.003 * i, -0.300], 0) for i in range(5)]
    df = spark.createDataFrame(rows, DB_SCHEMA)
    out = grid_dbscan(df, eps_milli=25, min_pts=4).collect()
    assert all(r.role == "core" for r in out)
    assert len({r.cluster for r in out}) == 1


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
