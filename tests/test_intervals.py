"""Interval-overlap join: exactness vs a naive range join, exactly-once
emission across shared bins, endpoint/edge semantics, and plan shape
(equi-join, never a cartesian/nested-loop product)."""

import random

from pyspark.sql import functions as F

from knowledgegraphbuilder_spark.operators.intervals import interval_overlap_join


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "user_id int, interval_id long, start long, end long"
    )


def _naive(spark, l_rows, r_rows):
    l = _mk(spark, l_rows)
    r = _mk(spark, r_rows)
    return sorted(
        l.alias("l")
        .join(
            r.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("l.start") <= F.col("r.end"))
            & (F.col("r.start") <= F.col("l.end")),
        )
        .select(
            F.col("l.user_id"),
            F.col("l.interval_id").alias("l_id"),
            F.col("r.interval_id").alias("r_id"),
            F.greatest("l.start", "r.start").alias("overlap_start"),
            F.least("l.end", "r.end").alias("overlap_end"),
        )
        .collect()
    )


def _binned(spark, l_rows, r_rows, w):
    return sorted(
        interval_overlap_join(_mk(spark, l_rows), _mk(spark, r_rows), bin_width=w)
        .collect()
    )


def test_edge_semantics(spark):
    l = [
        (1, 1, 100, 200),   # touches r10 at a single point (closed: overlap)
        (1, 2, 500, 600),   # disjoint from everything on user 1
        (2, 3, 0, 10_000),  # spans many bins; nests r12
    ]
    r = [
        (1, 10, 200, 300),
        (1, 11, 601, 700),   # adjacent-but-disjoint (600 < 601)
        (2, 12, 4_000, 4_050),
        (3, 13, 100, 200),   # right user with no left rows
    ]
    got = _binned(spark, l, r, w=128)
    assert got == _naive(spark, l, r)
    pairs = {(x.l_id, x.r_id): (x.overlap_start, x.overlap_end) for x in got}
    assert pairs == {(1, 10): (200, 200), (3, 12): (4_000, 4_050)}


def test_exactly_once_across_shared_bins(spark):
    # both intervals span the same 40 bins -> 40 joined candidates, 1 output
    l = [(1, 1, 0, 4_000)]
    r = [(1, 2, 0, 4_000)]
    got = _binned(spark, l, r, w=100)
    assert len(got) == 1
    assert (got[0].overlap_start, got[0].overlap_end) == (0, 4_000)


def test_randomized_vs_naive_multiple_bin_widths(spark):
    rng = random.Random(20260817)
    l_rows, r_rows = [], []
    for i in range(250):
        u = rng.randrange(6)
        s = rng.randrange(0, 5_000)
        l_rows.append((u, i, s, s + rng.randrange(0, 900)))
    for i in range(250):
        u = rng.randrange(6)
        s = rng.randrange(0, 5_000)
        r_rows.append((u, 1_000 + i, s, s + rng.randrange(0, 900)))
    expect = _naive(spark, l_rows, r_rows)
    assert len(expect) > 100  # fixture actually overlaps
    # exactness must not depend on the bin width (it only tunes cost)
    for w in (1, 64, 1_000, 100_000):
        assert _binned(spark, l_rows, r_rows, w) == expect


def test_plan_is_equi_join(spark):
    l = _mk(spark, [(1, 1, 0, 10)])
    r = _mk(spark, [(1, 2, 5, 15)])
    plan = (
        interval_overlap_join(l, r, bin_width=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
