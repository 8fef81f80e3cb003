"""Span synthesis + flatten: the span-sequence invariant and byte-exact
round-trip (BASELINE.json input_hint)."""

from pyspark.sql import functions as F

from knowledgegraphbuilder_spark.operators.flatten import flatten_documents, span_signature
from knowledgegraphbuilder_spark.sources.interleaved import synthesize_spans


def test_spans_roundtrip_exact(spark, sf_dir):
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    spans = synthesize_spans(raw)
    flat = flatten_documents(spans)
    joined = raw.select(
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("doc_id"),
        F.col("text").alias("orig"),
    ).join(flat, "doc_id")
    assert joined.count() == raw.count()
    mismatches = joined.filter(F.col("orig") != F.col("text")).count()
    assert mismatches == 0


def test_media_spans_interleaved(spark, sf_dir):
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    spans = synthesize_spans(raw)
    kinds = (
        spans.select(F.explode("spans").alias("s"))
        .groupBy(F.col("s.kind").alias("kind"))
        .count()
        .collect()
    )
    by_kind = {r["kind"]: r["count"] for r in kinds}
    assert by_kind.get("image", 0) > 0
    assert by_kind.get("audio", 0) > 0
    assert by_kind.get("text", 0) > 0
    # media spans carry refs, text spans carry text
    bad = spans.select(F.explode("spans").alias("s")).filter(
        ((F.col("s.kind") == "text") & F.col("s.text").isNull())
        | ((F.col("s.kind") != "text") & F.col("s.media_ref").isNull())
    )
    assert bad.count() == 0


def test_span_signature_stable(spark, sf_dir):
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = span_signature(synthesize_spans(raw)).orderBy("doc_id").collect()
    b = span_signature(synthesize_spans(raw)).orderBy("doc_id").collect()
    assert a == b
