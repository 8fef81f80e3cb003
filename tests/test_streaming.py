"""Structured-Streaming ingest: streamed mentions == batch mentions."""

import os

from knowledgegraphbuilder_spark.config import KGConfig
from knowledgegraphbuilder_spark.plans.pipeline import run_pipeline
from knowledgegraphbuilder_spark.streaming.ingest import run_ingest_available_now


def test_streaming_mentions_match_batch(spark, corpus_df, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("stream"))
    in_dir, out_dir, ck_dir = f"{base}/in", f"{base}/out", f"{base}/ck"
    # land the corpus as multiple files (simulates arriving micro-batches)
    corpus_df.repartition(4).write.mode("overwrite").parquet(in_dir)

    run_ingest_available_now(spark, in_dir, out_dir, ck_dir, KGConfig())
    streamed = {
        tuple(r)
        for r in spark.read.parquet(out_dir)
        .select("mention_id", "doc_id", "start", "end", "label", "text")
        .collect()
    }
    batch = {
        tuple(r)
        for r in run_pipeline(corpus_df, KGConfig())
        .mentions.select("mention_id", "doc_id", "start", "end", "label", "text")
        .collect()
    }
    assert streamed == batch

    # re-running with the same checkpoint is a no-op (exactly-once)
    n_before = spark.read.parquet(out_dir).count()
    run_ingest_available_now(spark, in_dir, out_dir, ck_dir, KGConfig())
    assert spark.read.parquet(out_dir).count() == n_before
