"""Unit tests for the tranche-34 operators: typed directed-triangle
motif census (rotation-anchored) and the gains/lift chart."""

import pyspark.sql.functions as F
from pyspark.sql import Window as W


def _typed_triangles(spark, edges):
    e = spark.createDataFrame(
        edges, "head_node_id string, tail_node_id string, rel_type string"
    ).distinct()
    e1 = e.select(F.col("head_node_id").alias("a"),
                  F.col("tail_node_id").alias("b"),
                  F.col("rel_type").alias("rt1"))
    e2 = e.select(F.col("head_node_id").alias("b"),
                  F.col("tail_node_id").alias("c"),
                  F.col("rel_type").alias("rt2"))
    e3 = e.select(F.col("head_node_id").alias("c"),
                  F.col("tail_node_id").alias("a"),
                  F.col("rel_type").alias("rt3"))
    wedges = e1.join(e2, "b").filter(
        (F.col("a") < F.col("b")) & (F.col("a") < F.col("c"))
    )
    tris = wedges.join(e3, ["c", "a"]).select(
        "a", "b", "c", "rt1", "rt2", "rt3"
    ).distinct()
    return {
        (r["rt1"], r["rt2"], r["rt3"]): r["n"]
        for r in tris.groupBy("rt1", "rt2", "rt3")
                     .agg(F.count("*").cast("long").alias("n")).collect()
    }


class TestTypedTriangles:
    def test_each_cycle_counted_once_with_anchored_rotation(self, spark):
        # one 3-cycle n1->n2->n3->n1; anchor is n1, so the census sees
        # exactly (r1, r2, r3) once, not three rotations
        got = _typed_triangles(spark, [
            ("n1", "n2", "r1"), ("n2", "n3", "r2"), ("n3", "n1", "r3"),
        ])
        assert got == {("r1", "r2", "r3"): 1}

    def test_duplicate_edge_instances_do_not_double_count(self, spark):
        got = _typed_triangles(spark, [
            ("n1", "n2", "r1"), ("n1", "n2", "r1"),
            ("n2", "n3", "r2"), ("n3", "n1", "r3"),
        ])
        assert got == {("r1", "r2", "r3"): 1}

    def test_open_wedge_is_not_a_triangle(self, spark):
        got = _typed_triangles(spark, [
            ("n1", "n2", "r1"), ("n2", "n3", "r2"),
        ])
        assert got == {}

    def test_two_cycles_same_types_accumulate(self, spark):
        got = _typed_triangles(spark, [
            ("a1", "b1", "r"), ("b1", "c1", "r"), ("c1", "a1", "r"),
            ("a2", "b2", "r"), ("b2", "c2", "r"), ("c2", "a2", "r"),
        ])
        assert got == {("r", "r", "r"): 2}


class TestLift:
    def test_perfect_ranking_front_loads_gain(self, spark):
        # 100 rows, top 20 scores are the only positives
        rows = [(str(i), 1000 - i, 1 if i < 20 else 0)
                for i in range(100)]
        d = spark.createDataFrame(rows, "doc_id string, s long, y long")
        w = W.orderBy(F.col("s").desc(), F.col("doc_id").asc())
        deciled = d.select(
            "s", "y", F.ntile(10).over(w).cast("long").alias("decile")
        )
        per = deciled.groupBy("decile").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("y").cast("long").alias("pos"),
        ).orderBy("decile").collect()
        assert [r["pos"] for r in per] == [10, 10, 0, 0, 0, 0, 0, 0, 0, 0]
        # decile-1 lift = (10/10) / (20/100) = 5.0
        assert per[0]["pos"] / per[0]["n"] / (20 / 100) == 5.0

    def test_arithmetic_decile_split_equals_ntile(self, spark):
        # the histogram+rank formulation must reproduce ntile(10)'s
        # first-buckets-get-the-remainder split exactly, ties included
        rows = [(str(i), (i * 7) % 23, i % 2) for i in range(103)]
        d = spark.createDataFrame(rows, "doc_id string, s long, y long")
        w = W.orderBy(F.col("s").desc(), F.col("doc_id").asc())
        want = {(r["s"], r["doc_id"]): r["d"]
                for r in d.select(
                    "s", "doc_id", F.ntile(10).over(w).alias("d")
                ).collect()}
        hist = d.groupBy("s").agg(F.count("*").cast("long").alias("c"))
        whist = W.orderBy(F.col("s").desc()).rowsBetween(
            W.unboundedPreceding, -1)
        cb = hist.select(
            "s",
            F.coalesce(F.sum("c").over(whist), F.lit(0)).cast("long")
            .alias("cb"))
        n = d.count()
        q, rmd = n // 10, n % 10
        win = W.partitionBy("s").orderBy("doc_id")
        got = {(r["s"], r["doc_id"]): r["d"]
               for r in d.join(cb, "s").select(
                   "s", "doc_id",
                   (F.col("cb") + F.row_number().over(win)).alias("rank"),
               ).selectExpr(
                   "s", "doc_id",
                   f"case when rank <= {rmd * (q + 1)}"
                   f" then (rank - 1) div {q + 1} + 1"
                   f" else {rmd} + (rank - {rmd * (q + 1)} - 1)"
                   f" div {max(q, 1)} + 1 end as d",
               ).collect()}
        assert got == want
