"""Graph table sinks (S3-S10): bulk materialization + idempotent upsert.

The reference writes the graph through one Neo4j bolt round-trip per node and
per edge (back/kgg/io/graph.py:58-95 — the anti-pattern SURVEY.md §4.1 bans)
and caches the whole graph as one JSON file (generator.py:76-96). Here every
graph table is a partitioned parquet dataset (Iceberg createOrReplace
semantics in the sandbox) written in bulk, and the MERGE-style upsert
(S8, nodes/neo4j_loader.py:34-51) becomes a keyed anti-join + union rewrite —
the parquet-level equivalent of ``MERGE INTO graph.edges USING updates ON
edge_id``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GRAPH_TABLES = ("nodes", "edges", "provenance", "documents", "membership")


def write_graph(base_dir: str, *, nodes: DataFrame, edges: DataFrame,
                provenance: DataFrame, documents: DataFrame | None = None,
                membership: DataFrame | None = None) -> None:
    """S3/S6/S7: bulk createOrReplace of the graph tables. Edges partition by
    rel_type (low-cardinality, supports partition pruning on typed traversals)."""
    nodes.write.mode("overwrite").parquet(f"{base_dir}/nodes")
    edges.write.mode("overwrite").partitionBy("rel_type").parquet(f"{base_dir}/edges")
    provenance.write.mode("overwrite").parquet(f"{base_dir}/provenance")
    if documents is not None:
        documents.drop("spans").write.mode("overwrite").parquet(f"{base_dir}/documents")
    if membership is not None:
        membership.write.mode("overwrite").parquet(f"{base_dir}/membership")


def read_graph(spark: SparkSession, base_dir: str) -> dict[str, DataFrame]:
    """S4/S5: read back whichever graph tables exist (None-if-absent probe,
    like the reference's cache miss, generator.py:98-122)."""
    out = {}
    for t in GRAPH_TABLES:
        p = f"{base_dir}/{t}"
        if os.path.exists(os.path.join(p, "_SUCCESS")) or any(
            f.endswith(".parquet") for f in (os.listdir(p) if os.path.isdir(p) else [])
        ):
            out[t] = spark.read.parquet(p)
    return out


def merge_upsert(spark: SparkSession, table_dir: str, updates: DataFrame,
                 key: str) -> None:
    """S8: idempotent MERGE by key — existing rows not in updates are kept,
    matching keys are replaced. (With Iceberg this is a single MERGE INTO;
    on raw parquet it is anti-join + union + atomic-ish rewrite.)"""
    if os.path.exists(os.path.join(table_dir, "_SUCCESS")):
        current = spark.read.parquet(table_dir)
        kept = current.join(updates.select(key).distinct(), key, "left_anti")
        merged = kept.unionByName(updates)
    else:
        merged = updates
    tmp = table_dir.rstrip("/") + "__tmp"
    merged.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(table_dir)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


def clear_graph(base_dir: str) -> None:
    """S9: DETACH DELETE analog."""
    import shutil

    for t in GRAPH_TABLES:
        shutil.rmtree(f"{base_dir}/{t}", ignore_errors=True)


def sanitize_rel_type(col: str = "rel_type") -> F.Column:
    """F8 (nodes/neo4j_loader.py:42-43): ' '/'-' -> '_', uppercase."""
    return F.upper(F.translate(F.col(col), " -", "__"))
