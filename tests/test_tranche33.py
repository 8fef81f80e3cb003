"""Unit tests for the tranche-33 operators: Kendall tau-b and the
Poisson-bootstrap mean CI."""

import itertools
import math

from knowledgegraphbuilder_spark.operators.mlstats import (
    kendall_tau,
    poisson_bootstrap_mean,
)


def _brute_tau_b(xs, ys):
    from collections import Counter

    n = len(xs)
    c = d = 0
    for i, j in itertools.combinations(range(n), 2):
        s = (xs[i] - xs[j]) * (ys[i] - ys[j])
        c += s > 0
        d += s < 0
    n0 = n * (n - 1) / 2
    n1 = sum(t * (t - 1) / 2 for t in Counter(xs).values())
    n2 = sum(t * (t - 1) / 2 for t in Counter(ys).values())
    return (c - d) / math.sqrt((n0 - n1) * (n0 - n2)), c, d


class TestKendall:
    def test_perfect_agreement(self, spark):
        rows = [(str(i), i, i * 10) for i in range(20)]
        df = spark.createDataFrame(rows, "id string, x long, y long")
        r = kendall_tau(df, "x", "y", "id").collect()[0]
        assert r["tau"] == 1.0
        assert r["concordant"] == 190 and r["discordant"] == 0

    def test_matches_brute_force_with_ties(self, spark):
        import random

        rng = random.Random(3)
        xs = [rng.randint(0, 8) for _ in range(40)]
        ys = [x + rng.randint(-3, 3) for x in xs]
        rows = [(str(i), x, y) for i, (x, y) in enumerate(zip(xs, ys))]
        df = spark.createDataFrame(rows, "id string, x long, y long")
        r = kendall_tau(df, "x", "y", "id").collect()[0]
        want, c, d = _brute_tau_b(xs, ys)
        assert (r["concordant"], r["discordant"]) == (c, d)
        assert abs(r["tau"] - want) < 1e-6

    def test_all_tied_null(self, spark):
        rows = [(str(i), 5, i) for i in range(10)]
        df = spark.createDataFrame(rows, "id string, x long, y long")
        r = kendall_tau(df, "x", "y", "id").collect()[0]
        assert r["tau"] is None


class TestPoissonBootstrap:
    def test_interval_brackets_mean_and_weights_are_poisson_ish(self, spark):
        rows = [(str(i), 100 + (i % 7)) for i in range(400)]
        df = spark.createDataFrame(rows, "id string, v long")
        r = poisson_bootstrap_mean(df, "v", "id").collect()[0]
        assert r["n"] == 400 and r["b"] == 32
        assert abs(r["mean_full"] - sum(100 + (i % 7) for i in range(400))
                   / 400) < 1e-6
        # replicate means concentrate near the true mean; the ~94%
        # interval must bracket it and be sane
        assert r["boot_lo"] <= r["mean_full"] <= r["boot_hi"]
        assert 0 < r["boot_se"] < 1.0  # se of the mean ~ sd/sqrt(n) ~ 0.1

    def test_deterministic_across_runs(self, spark):
        rows = [(str(i), i) for i in range(100)]
        df = spark.createDataFrame(rows, "id string, v long")
        a = poisson_bootstrap_mean(df, "v", "id").collect()[0]
        b = poisson_bootstrap_mean(df, "v", "id").collect()[0]
        assert tuple(a) == tuple(b)
