"""Unit tests for the tranche-40 operators: span-sequence integrity
audit (the north-rule invariant as a query) and KG WCC sizes."""

import pyspark.sql.functions as F
from pyspark.sql import Window as W


def _audit(spark, flat_rows, docs_rows):
    """Replicates q_mm_audit's checks on explicit flattened spans."""
    ex = spark.createDataFrame(
        flat_rows, "doc_id string, p int, kind string, txt string, off int"
    )
    w = W.partitionBy("doc_id").orderBy("p")
    flags = ex.select(
        "doc_id", "kind",
        F.when(
            F.lag("off").over(w).isNotNull()
            & (F.col("off") < F.lag("off").over(w)), 1
        ).otherwise(0).alias("viol"),
    )
    rebuilt = (
        ex.filter(F.col("kind") == "text")
        .groupBy("doc_id")
        .agg(F.expr(
            "concat_ws('', transform(sort_array(collect_list("
            "struct(p, txt))), x -> x.txt))").alias("rebuilt"))
    )
    orig = spark.createDataFrame(docs_rows, "doc_id string, orig string")
    mism = rebuilt.join(orig, "doc_id").select(
        F.when(F.col("rebuilt") != F.col("orig"), 1).otherwise(0)
        .alias("mm"))
    v = flags.agg(F.sum("viol")).collect()[0][0]
    m = mism.agg(F.sum("mm")).collect()[0][0]
    return v, m


class TestSpanAudit:
    def test_healthy_doc_is_clean(self, spark):
        flat = [
            ("d1", 0, "text", "hello ", 0),
            ("d1", 1, "image", None, 6),
            ("d1", 2, "text", "world", 6),
        ]
        v, m = _audit(spark, flat, [("d1", "hello world")])
        assert (v, m) == (0, 0)

    def test_offset_regression_is_flagged(self, spark):
        flat = [
            ("d1", 0, "text", "hello ", 6),
            ("d1", 1, "text", "world", 0),   # offset goes BACKWARD
        ]
        v, _ = _audit(spark, flat, [("d1", "hello world")])
        assert v == 1

    def test_dropped_span_breaks_reassembly(self, spark):
        flat = [("d1", 0, "text", "hello ", 0)]  # second span lost
        _, m = _audit(spark, flat, [("d1", "hello world")])
        assert m == 1

    def test_out_of_order_collect_still_reassembles(self, spark):
        # rows arrive in shuffled order; sort_array(struct(p, txt))
        # must restore span order
        flat = [
            ("d1", 2, "text", "c", 2),
            ("d1", 0, "text", "a", 0),
            ("d1", 1, "text", "b", 1),
        ]
        _, m = _audit(spark, flat, [("d1", "abc")])
        assert m == 0


class TestKgWcc:
    def test_component_sizes(self, spark):
        from knowledgegraphbuilder_spark.operators.canonicalize import (
            connected_components,
        )

        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("x", "y")],
            "src string, dst string",
        )
        cc = connected_components(edges)
        sizes = {r["size"]: r["n"]
                 for r in cc.groupBy("component")
                            .agg(F.count("*").alias("size"))
                            .groupBy("size")
                            .agg(F.count("*").alias("n")).collect()}
        assert sizes == {3: 1, 2: 1}
