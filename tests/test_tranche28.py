"""Unit tests for the tranche-28 operators: Mann-Whitney U and
Spearman rank correlation — both checked against scipy-free
hand-computable fixtures (exact ranks are small enough to derive by
hand) and against brute-force Python on a randomized-but-seeded set."""

import math
import random

from knowledgegraphbuilder_spark.operators.mlstats import (
    mann_whitney,
    spearman,
)


def _brute_mwu(a_scores, b_scores):
    """Textbook tie-corrected Mann-Whitney via full midranks."""
    allv = sorted(a_scores + b_scores)
    # midrank per value
    from collections import Counter

    cnt = Counter(allv)
    cum = 0
    mid = {}
    for v in sorted(cnt):
        c = cnt[v]
        mid[v] = cum + (c + 1) / 2.0
        cum += c
    ra = sum(mid[v] for v in a_scores)
    na, nb = len(a_scores), len(b_scores)
    n = na + nb
    u = ra - na * (na + 1) / 2.0
    ties = sum(c**3 - c for c in cnt.values())
    var = na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    z = (u - na * nb / 2.0) / math.sqrt(var) if var > 0 else None
    return u, z


def _brute_spearman(xs, ys):
    from collections import Counter

    def midranks(vals):
        cnt = Counter(vals)
        cum = 0
        mid = {}
        for v in sorted(cnt):
            c = cnt[v]
            mid[v] = cum + (c + 1) / 2.0
            cum += c
        return [mid[v] for v in vals]

    rx, ry = midranks(xs), midranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    dx = math.sqrt(sum((a - mx) ** 2 for a in rx))
    dy = math.sqrt(sum((b - my) ** 2 for b in ry))
    return num / (dx * dy)


class TestMannWhitney:
    def test_matches_brute_force_with_ties(self, spark):
        rng = random.Random(42)
        a = [rng.randint(0, 30) for _ in range(80)]
        b = [rng.randint(5, 40) for _ in range(60)]
        rows = [(v, 1) for v in a] + [(v, 0) for v in b]
        df = spark.createDataFrame(rows, "v long, y int")
        r = mann_whitney(df, "v", "y").collect()[0]
        u, z = _brute_mwu(a, b)
        assert r["n_a"] == 80 and r["n_b"] == 60
        assert r["u_x2"] == int(round(2 * u))
        assert abs(r["z"] - z) < 1e-6

    def test_identical_groups_z_zero(self, spark):
        vals = list(range(10)) * 2
        rows = [(v, i % 2) for i, v in enumerate(sorted(vals))]
        df = spark.createDataFrame(rows, "v long, y int")
        r = mann_whitney(df, "v", "y").collect()[0]
        # every value appears once per group -> U = n_a*n_b/2 -> z = 0
        assert r["z"] == 0.0

    def test_all_tied_scores_null_z(self, spark):
        rows = [(7, 1)] * 5 + [(7, 0)] * 5
        df = spark.createDataFrame(rows, "v long, y int")
        r = mann_whitney(df, "v", "y").collect()[0]
        assert r["z"] is None  # zero variance -> nullif guard


class TestSpearman:
    def test_perfect_monotone_is_one(self, spark):
        rows = [(x, x * x) for x in range(1, 30)]
        df = spark.createDataFrame(rows, "a long, b long")
        r = spearman(df, "a", "b").collect()[0]
        assert r["rho"] == 1.0

    def test_reversed_is_minus_one(self, spark):
        rows = [(x, 100 - x) for x in range(1, 30)]
        df = spark.createDataFrame(rows, "a long, b long")
        r = spearman(df, "a", "b").collect()[0]
        assert r["rho"] == -1.0

    def test_matches_brute_force_with_ties(self, spark):
        rng = random.Random(7)
        xs = [rng.randint(0, 15) for _ in range(120)]
        ys = [x + rng.randint(-5, 5) for x in xs]
        df = spark.createDataFrame(list(zip(xs, ys)), "a long, b long")
        r = spearman(df, "a", "b").collect()[0]
        want = _brute_spearman(xs, ys)
        assert abs(r["rho"] - want) < 1e-6

    def test_constant_column_null(self, spark):
        rows = [(x, 5) for x in range(1, 20)]
        df = spark.createDataFrame(rows, "a long, b long")
        r = spearman(df, "a", "b").collect()[0]
        assert r["rho"] is None
