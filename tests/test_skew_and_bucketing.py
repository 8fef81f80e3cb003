"""Scale-behavior tests: skew-salting invariance and bucketed co-located
joins (shuffle elimination)."""

import random

from pyspark.sql import functions as F

from knowledgegraphbuilder_spark.config import KGConfig
from knowledgegraphbuilder_spark.operators.canonicalize import cluster_mentions_exact


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_salting_invariant_under_skew(spark):
    """FIXTURES.md skew fixture: one surface form in ~30% of mentions —
    results must be identical for any salt_buckets setting."""
    rng = random.Random(5)
    rows = []
    for i in range(3000):
        text = "Google" if rng.random() < 0.3 else f"ent_{rng.randrange(500)}"
        rows.append((f"m{i}", f"d{i % 400}", 0, len(text), "org", text))
    m = spark.createDataFrame(
        rows, "mention_id string, doc_id string, start int, end int, label string, text string"
    )
    results = {}
    for buckets in (1, 4, 32):
        nodes = cluster_mentions_exact(m, KGConfig(salt_buckets=buckets))
        results[buckets] = sorted(
            (r["text"], r["n_mentions"], tuple(r["mention_ids"])) for r in nodes.collect()
        )
    assert results[1] == results[4] == results[32]
    google = [r for r in results[32] if r[0] == "Google"][0]
    assert 700 < google[1] < 1100  # the skewed head key survived intact


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path_factory):
    """Bucketing both sides of a join on the join key pre-partitions the data
    so the sort-merge join needs NO exchange — the co-located-join strategy
    for repeated large-scale joins (e.g. relations x mentions at 10^12)."""
    wh = str(tmp_path_factory.mktemp("warehouse"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .option("path", f"{wh}/b_orders").mode("overwrite").saveAsTable("b_orders"))
    (lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .option("path", f"{wh}/b_lineitem").mode("overwrite").saveAsTable("b_lineitem"))
    joined = (
        spark.table("b_lineitem")
        .join(spark.table("b_orders"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    plan = _plan(joined)
    # the join itself must not shuffle: no Exchange between the scans and the join
    join_section = plan.split("SortMergeJoin")[0] if "SortMergeJoin" in plan else plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" not in plan
    assert join_section.count("Exchange hashpartitioning(l_orderkey") == 0
    assert join_section.count("Exchange hashpartitioning(o_orderkey") == 0
    # and results match the plain join
    plain = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus").agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
