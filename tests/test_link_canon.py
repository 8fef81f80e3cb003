"""s6 linking (alias dict + LSH blocking) + generalized CC canonicalization +
U3 label generation."""

from pyspark.sql import functions as F

from knowledgegraphbuilder_spark.config import KGConfig
from knowledgegraphbuilder_spark.operators.canonicalize import cluster_mentions_cc
from knowledgegraphbuilder_spark.operators.labels import generate_labels
from knowledgegraphbuilder_spark.operators.link import (
    alias_candidates,
    lsh_similarity_edges,
    similarity_edges,
)

MENTION_SCHEMA = "mention_id string, doc_id string, start int, end int, label string, text string"


def _mentions(spark, texts):
    rows = [(f"m{i}", f"d{i}", 0, len(t), "organization", t) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, MENTION_SCHEMA)


def test_lsh_similarity_edges_cluster_variants(spark):
    texts = ["Google", "google inc", "GOOGLE", "Microsoft", "microsof"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    edges = lsh_similarity_edges(df, KGConfig(synonym_threshold=0.3))
    pairs = {(r["src"], r["dst"]) for r in edges.collect()}
    assert ("GOOGLE", "Google") in pairs  # identical after normalization
    assert any({a, b} == {"Microsoft", "microsof"} for a, b in pairs)
    assert not any("Google" in p and "Microsoft" in p for p in
                   [{a, b} for a, b in pairs])


def test_alias_candidates_broadcast(spark):
    texts = spark.createDataFrame([("Google",), ("MSFT",), ("Banana",)], "text string")
    alias = spark.createDataFrame(
        [("msft", "Microsoft"), ("google", "Alphabet")], "alias string, canonical string"
    )
    got = {(r["src"], r["dst"]) for r in alias_candidates(texts, alias).collect()}
    assert got == {("Google", "Alphabet"), ("MSFT", "Microsoft")}


def test_cluster_mentions_cc(spark):
    m = _mentions(spark, ["Google", "google inc", "GOOGLE", "Microsoft", "microsof", "Apple"])
    edges = similarity_edges(m, KGConfig(synonym_threshold=0.3))
    nodes = cluster_mentions_cc(m, edges, KGConfig())
    by_text = {r["text"]: r for r in nodes.collect()}
    # google variants collapse into one canonical node (min member text)
    assert len(by_text) == 3
    google = [r for t, r in by_text.items() if "oogle" in t.lower() or "GOOGLE" in t]
    assert len(google) == 1 and google[0]["n_mentions"] == 3
    assert by_text["Apple"]["n_mentions"] == 1


def test_generate_labels_normalized_sorted(spark, corpus_df):
    from knowledgegraphbuilder_spark.operators.flatten import flatten_documents

    docs = flatten_documents(corpus_df)
    labels = [r["label"] for r in generate_labels(docs, KGConfig()).collect()]
    assert labels == sorted(labels)
    assert set(labels) <= {"technology", "organization", "system", "resource"}
    assert len(labels) >= 3  # dense corpus: most labels present
    assert all(lbl == lbl.lower() and " " not in lbl for lbl in labels)
