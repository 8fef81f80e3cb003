"""Unit tests for the tranche-52 vector ops: MIPS top-k and radius search."""

import math

from knowledgegraphbuilder_spark.operators.ann import range_search, topk_mips


def _embs(spark):
    rows = [
        (0, [1.0, 0.0]),        # query direction, unit norm
        (1, [10.0, 0.0]),       # same direction, big magnitude
        (2, [0.9, 0.1]),        # near direction, small magnitude
        (3, [0.0, 5.0]),        # orthogonal
        (4, [-2.0, 0.0]),       # opposite
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


class TestMips:
    def test_magnitude_wins_over_angle(self, spark):
        out = topk_mips(_embs(spark), [1.0, 0.0], k=3).collect()
        assert [r["id"] for r in out] == ["1", "0", "2"]
        assert out[0]["dot"] == 10.0
        assert out[2]["dot"] == 0.9

    def test_tie_breaks_by_id(self, spark):
        df = spark.createDataFrame(
            [(5, [1.0]), (2, [1.0]), (9, [1.0])],
            "vec_id long, embedding array<double>",
        )
        out = topk_mips(df, [1.0], k=3).collect()
        assert [r["id"] for r in out] == ["2", "5", "9"]


class TestRangeSearch:
    def test_ball_membership(self, spark):
        out = {r["id"]: r["score"]
               for r in range_search(_embs(spark), [1.0, 0.0], 0.9).collect()}
        # cosine: v0=1.0, v1=1.0, v2=0.9939, v3=0.0, v4=-1.0
        assert set(out) == {"0", "1", "2"}
        assert out["1"] == 1.0
        assert out["2"] == round(0.9 / math.sqrt(0.81 + 0.01), 4)

    def test_threshold_is_inclusive(self, spark):
        df = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [1.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        out = range_search(df, [1.0, 0.0], 1.0).collect()
        assert len(out) == 2

    def test_zero_vector_scores_zero_not_crash(self, spark):
        df = spark.createDataFrame(
            [(0, [0.0, 0.0]), (1, [1.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        out = {r["id"] for r in range_search(df, [1.0, 0.0], 0.5).collect()}
        assert out == {"1"}
