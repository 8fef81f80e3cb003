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
    materialize: str | bool = "none",
) -> KGResult:
    """``materialize`` pins the fan-out points (mentions feeds the relation
    join, the resolution dictionary, clustering and membership; the relation
    backend output feeds parsing):

    - ``"none"`` (default): fully lazy — right for one-shot small queries.
    - ``"ckpt"``: EAGER ``localCheckpoint`` each fan-out point — computes
      every inference UDF stage exactly once and truncates lineage; the fast
      choice for bulk runs (measured: persist's InMemoryRelation barriers
      serialize the job into waves and cost ~2x at high core counts).
      Eagerness matters: with lazy checkpoints, one action over the whole
      graph can schedule the fan-out consumers as CONCURRENT stages, each
      recomputing the full pre-checkpoint inference lineage before the
      checkpoint materializes — measured 1.8-2.3x total CPU, nondeterministic
      (it needs spare task slots, so it inflated only the wide scaling leg).
    - ``"persist"``: MEMORY_AND_DISK persist (many separate consumers).

    At cluster scale prefer plans/checkpoint.py (durable + resumable)."""
    from pyspark.storagelevel import StorageLevel

    if materialize is True:
        materialize = "persist"
    if materialize is False:
        materialize = "none"
    if materialize == "ckpt":
        pin = lambda df: df.localCheckpoint(eager=True)  # noqa: E731
    elif materialize == "persist":
        pin = lambda df: df.persist(StorageLevel.MEMORY_AND_DISK)  # noqa: E731
    else:
        pin = lambda df: df  # noqa: E731
    barrier = None if materialize == "none" else pin

    cfg = config or KGConfig()
    docs = flatten_documents(spans_df)
    ner_chunks = chunk_documents(docs, cfg.ner_chunk_size, cfg.ner_chunk_overlap)
    mentions = pin(extract_mentions(ner_chunks, cfg, labels=labels, backend=ner_backend))
    re_chunks = chunk_documents(docs, cfg.re_chunk_size, cfg.re_chunk_overlap)
    relations = pin(
        extract_relations(re_chunks, mentions, cfg, backend=re_backend, barrier=barrier)
    )
    # normalized membership is the at-scale node representation; the
    # member-ID arrays (reference ``Node.entities`` parity shape) would put
    # every mention id of a head surface form into ONE row — multi-GB at
    # 10^12 mentions — so the pipeline never materializes them (parity tests
    # opt in explicitly via with_member_arrays=True)
    nodes = pin(cluster_mentions_exact(mentions, cfg, with_member_arrays=False))
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
