"""Physical-plan assertions: the properties that matter at 100 TB.

These inspect ``explain`` output to pin down pushdown, broadcast strategy and
the absence of row-at-a-time Python — regressions here are silent perf
killers that correctness tests never catch.
"""

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_parquet_filter_pushdown(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(F.col("lang") == "en").select("doc_id")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    # column pruning: only doc_id + lang read
    assert "ReadSchema" in plan and "text" not in plan.split("ReadSchema")[1][:200]


def test_small_dim_join_is_broadcast(spark, sf_dir):
    import __spark_entry__ as entry

    plan = _plan(entry.q_sql_join_agg(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_no_row_at_a_time_python(spark, sf_dir):
    """North rule: vectorized pandas/Arrow UDFs only — never per-row Python.
    BatchEvalPython is the row-at-a-time operator; it must not appear anywhere
    in the KG pipeline plan."""
    import __spark_entry__ as entry

    entry._PIPE_CACHE.clear()
    kg = entry._kg(spark, sf_dir)
    for df in (kg.mentions, kg.relations, kg.triples):
        assert "BatchEvalPython" not in _plan(df)
    entry._PIPE_CACHE.clear()


def test_topk_uses_take_ordered(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_custkey").count()
        .orderBy(F.desc("count")).limit(10)
    )
    assert "TakeOrderedAndProject" in _plan(df)


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    # map-side combine: HashAggregate appears below the exchange
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy("l_returnflag").count()
    plan = _plan(df)
    assert plan.count("HashAggregate") >= 2 and "Exchange" in plan


def test_salted_agg_two_phase(spark):
    from knowledgegraphbuilder_spark.config import KGConfig
    from knowledgegraphbuilder_spark.operators.canonicalize import cluster_mentions_exact

    m = spark.createDataFrame(
        [(f"m{i}", f"d{i}", 0, 5, "l", "the") for i in range(100)],
        "mention_id string, doc_id string, start int, end int, label string, text string",
    )
    nodes = cluster_mentions_exact(m, KGConfig(salt_buckets=8))
    rows = nodes.collect()
    assert len(rows) == 1 and rows[0]["n_mentions"] == 100
    assert len(rows[0]["mention_ids"]) == 100
    # two aggregation layers (salted partial + final merge)
    assert _plan(nodes).count("Exchange") >= 2


def test_retrieval_topk_is_bucket_filtered(spark):
    """The retrieval vector top-k must scan only LSH-probed candidates: a
    Filter with the bucket OR-condition sits ahead of the cosine scoring +
    TakeOrderedAndProject, and no unfiltered full-index scan exists."""
    from knowledgegraphbuilder_spark.config import KGConfig
    from knowledgegraphbuilder_spark.operators.ann import ann_lsh
    from knowledgegraphbuilder_spark.operators.retrieval import hash_embed_text

    cfg = KGConfig()
    rows = [(f"e{i}", [float((i * 7 + d) % 13) - 6.0 for d in range(cfg.embedding_dim)])
            for i in range(50)]
    idx = spark.createDataFrame(rows, "edge_id string, embedding array<float>")
    qv = hash_embed_text("probe me", cfg.embedding_dim)
    top = ann_lsh(idx, qv, 5, n_bits=cfg.ann_bits, n_tables=cfg.ann_tables,
                  id_col="edge_id", vec_col="embedding")
    plan = _plan(top)
    # the bucket probe is a Filter of bucket-equality cases over the vector
    assert "Filter" in plan
    filter_lines = [ln for ln in plan.splitlines() if "CASE WHEN" in ln and "aggregate" in ln]
    assert filter_lines, plan
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort


def test_round4_ops_have_scale_safe_plans(spark, sf_dir):
    """The round-4 operator family: no row-at-a-time Python, no
    non-broadcast nested-loop join, and the corpus-side plans stay free of
    value-keyed shuffles where the design says 'broadcast back'."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    from knowledgegraphbuilder_spark.operators.ann import scalar_quantize
    from knowledgegraphbuilder_spark.operators.curation import (
        per_group_quantile_filter, substring_dedup_rewrite, temperature_sample,
    )
    from knowledgegraphbuilder_spark.operators.profile import profile_table

    plans = {
        "temperature": _plan(temperature_sample(docs)),
        "adaptive": _plan(per_group_quantile_filter(docs)),
        "profile": _plan(profile_table(docs, ["doc_id", "lang"])),
        "rewrite": _plan(substring_dedup_rewrite(docs.select("doc_id", "text"))),
        "sq8": _plan(scalar_quantize(embs)),
    }
    for name, p in plans.items():
        assert "BatchEvalPython" not in p, name
        # BroadcastNestedLoopJoin is only legal for broadcast-scalar
        # cross-joins (1-row stats frames); a non-broadcast cartesian is not
        assert "CartesianProduct" not in p, name
    # the broadcast-back designs: rates/thresholds/stats join via broadcast
    for name in ("temperature", "adaptive", "sq8"):
        assert "BroadcastExchange" in plans[name], name
