"""Unit tests for the full coreness decomposition (tranche 16). DuckDB
value-exactness of the kNN-substrate query is pinned by
``tools/check_contract.py``; these pin the shell algebra on hand graphs,
including the multi-round peel cascade."""

from knowledgegraphbuilder_spark.operators.graphstats import coreness


def _core_map(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: r["coreness"] for r in coreness(df).collect()}


class TestCoreness:
    def test_triangle_with_tail(self, spark):
        # triangle {a,b,c} (coreness 2) with a pendant d (coreness 1)
        got = _core_map(spark, [("a", "b"), ("b", "c"), ("a", "c"),
                                ("c", "d")])
        assert got == {"a": 2, "b": 2, "c": 2, "d": 1}

    def test_path_cascade_peels_over_many_rounds(self, spark):
        # a 12-node path: every node has coreness 1, but the k=2 peel
        # removes only the two endpoints per round — exercises the inner
        # fixed-point loop over ~6 rounds
        n = 12
        edges = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(n - 1)]
        got = _core_map(spark, edges)
        assert got == {f"n{i:02d}": 1 for i in range(n)}

    def test_k4_is_coreness_3(self, spark):
        vs = ["a", "b", "c", "d"]
        edges = [(x, y) for i, x in enumerate(vs) for y in vs[i + 1:]]
        got = _core_map(spark, edges)
        assert got == {v: 3 for v in vs}

    def test_two_shells(self, spark):
        # K4 core with a triangle hanging off one vertex
        vs = ["a", "b", "c", "d"]
        k4 = [(x, y) for i, x in enumerate(vs) for y in vs[i + 1:]]
        tri = [("d", "e"), ("e", "f"), ("d", "f")]
        got = _core_map(spark, k4 + tri)
        assert got["a"] == got["b"] == got["c"] == 3
        assert got["d"] == 3  # d survives into the K4's 3-core
        assert got["e"] == got["f"] == 2

    def test_star_is_all_ones(self, spark):
        got = _core_map(spark, [("c", f"l{i}") for i in range(5)])
        assert set(got.values()) == {1}
