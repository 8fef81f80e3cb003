"""End-to-end KG-construction pipeline: the Spark-native analog of
``KnowledgeGraphGenerator.generate`` (back/kgg/generator.py:30-74).

Stage graph (SURVEY.md §7.2): spans -> flatten -> chunk -> mentions ->
relations -> nodes -> edges -> triples/provenance. Every stage is a pure
DataFrame -> DataFrame function; ``run_pipeline`` composes them lazily (one
Catalyst plan unless checkpointing materializes boundaries — see
plans/checkpoint.py for the resumable runner).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from knowledgegraphbuilder_spark.config import KGConfig
from knowledgegraphbuilder_spark.operators.canonicalize import (
    cluster_mentions_exact,
    node_membership,
)
from knowledgegraphbuilder_spark.operators.chunk import chunk_documents
from knowledgegraphbuilder_spark.operators.flatten import flatten_documents
from knowledgegraphbuilder_spark.operators.graph_build import (
    build_edges,
    build_provenance,
    build_triples,
)
from knowledgegraphbuilder_spark.operators.ner import extract_mentions
from knowledgegraphbuilder_spark.operators.relations import extract_relations


@dataclass
class KGResult:
    documents: DataFrame  # flattened (doc_id, text, media_refs, spans)
    mentions: DataFrame
    relations: DataFrame
    nodes: DataFrame
    membership: DataFrame
    edges: DataFrame
    triples: DataFrame
    provenance: DataFrame


def run_pipeline(
    spans_df: DataFrame,
    config: KGConfig | None = None,
    ner_backend: object | None = None,
    re_backend: object | None = None,
    labels: list[str] | None = None,
    broadcast_nodes: bool = True,
    cache: bool = True,
) -> KGResult:
    """``cache=True`` persists the fan-out points (mentions feeds the relation
    join, the resolution dictionary, clustering and membership; nodes feeds
    edges and triples) so one action computes each inference UDF stage once —
    the lazy-composition analog of the checkpointed runner's materialization.
    At cluster scale prefer plans/checkpoint.py (durable + resumable)."""
    from pyspark.storagelevel import StorageLevel

    cfg = config or KGConfig()
    docs = flatten_documents(spans_df)
    ner_chunks = chunk_documents(docs, cfg.ner_chunk_size, cfg.ner_chunk_overlap)
    mentions = extract_mentions(ner_chunks, cfg, labels=labels, backend=ner_backend)
    if cache:
        mentions = mentions.persist(StorageLevel.MEMORY_AND_DISK)
    re_chunks = chunk_documents(docs, cfg.re_chunk_size, cfg.re_chunk_overlap)
    relations = extract_relations(re_chunks, mentions, cfg, backend=re_backend)
    if cache:
        relations = relations.persist(StorageLevel.MEMORY_AND_DISK)
    nodes = cluster_mentions_exact(mentions, cfg)
    if cache:
        nodes = nodes.persist(StorageLevel.MEMORY_AND_DISK)
    membership = node_membership(mentions)
    edges = build_edges(relations, nodes, cfg.default_edge_weight, broadcast_nodes)
    triples = build_triples(edges, nodes, broadcast_nodes)
    provenance = build_provenance(relations)
    return KGResult(
        documents=docs,
        mentions=mentions,
        relations=relations,
        nodes=nodes,
        membership=membership,
        edges=edges,
        triples=triples,
        provenance=provenance,
    )
