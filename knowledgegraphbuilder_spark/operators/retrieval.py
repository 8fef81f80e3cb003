"""Query-side retrieval: U5 embeddings, T2 vector top-k, J3 edge fan-out,
G2 weight update, G3 PPR, J4/A5 doc weighting, T3 final ranking.

Reference flow (back/kgg/retriever.py:62-94 + io/graph.py:115-168):
1. embed query, FAISS inner-product top-5 over edge-description embeddings;
2. endpoint node ids of those edges;
3. personalized PageRank from those nodes with retrieved scores as edge
   weights (others default 0.2);
4. sum node scores into per-document weights via node membership;
5. docs sorted desc, top-5.

The deterministic embedding backend is a seeded character-trigram feature
hash -> L2-normalized DIM-float vector (pandas_udf, Arrow-batched — plays
BGE-M3's role, back/kgg/retriever.py:20-33, batch_size=100 becomes the Arrow
batch). Steps 2-5 are pure DataFrame ops.
"""

from __future__ import annotations

import hashlib
import math
import weakref

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType
from pyspark.sql.window import Window

from knowledgegraphbuilder_spark.config import KGConfig
from knowledgegraphbuilder_spark.operators.ann import topk_bruteforce
from knowledgegraphbuilder_spark.operators.pagerank import personalized_pagerank


# edge-count probe cache keyed on the (stable, pinned) edge DataFrame
# object: a QA service answers many queries against one graph, and the PPR
# small-graph probe (limit(threshold).count()) is a whole Spark job — pay it
# once per graph, not once per query
_EDGE_COUNT_CACHE: "weakref.WeakKeyDictionary[DataFrame, int]" = (
    weakref.WeakKeyDictionary()
)
_PPR_SMALL_GRAPH_THRESHOLD = 500_000


def _edge_scale_hint(edges: DataFrame) -> int:
    try:
        return _EDGE_COUNT_CACHE[edges]
    except KeyError:
        n = edges.limit(_PPR_SMALL_GRAPH_THRESHOLD).count()
        _EDGE_COUNT_CACHE[edges] = n
        return n


def hash_embed_text(text: str, dim: int = 64) -> list[float]:
    """Deterministic trigram feature-hash embedding, unit norm."""
    v = np.zeros(dim, dtype=np.float64)
    t = f"^{text}$"
    for i in range(len(t) - 2):
        tri = t[i : i + 3]
        h = int.from_bytes(hashlib.sha256(tri.encode()).digest()[:8], "big")
        v[h % dim] += 1.0 if (h >> 8) % 2 == 0 else -1.0
    n = math.sqrt(float((v * v).sum()))
    if n > 0:
        v /= n
    return [float(x) for x in v]


def embed_column(df: DataFrame, text_col: str, out_col: str = "embedding",
                 dim: int = 64, dtype=None) -> DataFrame:
    """U5: batched Arrow-native embedding of a text column.

    ``dtype`` defaults to float32 (the stored-index convention); query-side
    embeddings pass DoubleType so the batch path carries the same float64
    query vector the single-query path injects as literals — LSH bucket
    signs then replay bit-exactly in the SQL oracle."""
    from pyspark.sql.types import DoubleType  # noqa: F401 (callers import via here)

    @F.pandas_udf(ArrayType(dtype or FloatType()))
    def emb(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: hash_embed_text(t or "", dim))

    return df.withColumn(out_col, emb(F.col(text_col)))


def index_edges(edges: DataFrame, dim: int = 64) -> DataFrame:
    """S10 analog: materialized (edge_id, description, embedding) table."""
    return embed_column(
        edges.select("edge_id", "description"), "description", "embedding", dim
    )


def retrieve_documents(
    edges: DataFrame,
    membership: DataFrame,
    edge_index: DataFrame,
    query: str,
    config: KGConfig | None = None,
    k: int | None = None,
    use_lsh: bool = True,
) -> DataFrame:
    """Full QA retrieval: (doc_id, weight) top-k, reproducing retriever.py:62-94.

    The vector top-k probes the LSH buckets of the query (union over
    ``cfg.ann_tables`` tables) and exact-rescores only the candidates — at
    10^12 edges a brute-force scan of the edge-embedding table per query is
    the one thing this stage must never do. ``use_lsh=False`` keeps the exact
    scan as the small-scale test oracle."""
    from knowledgegraphbuilder_spark.operators.ann import ann_lsh

    cfg = config or KGConfig()
    k = k or cfg.retrieval_k
    qv = hash_embed_text(query, cfg.embedding_dim)

    # T2: vector top-k over edge descriptions (inner product == cosine, both
    # normalized). LSH probe + exact rescore by default; full scan as oracle.
    if use_lsh:
        top_edges = ann_lsh(
            edge_index, qv, k, dim=cfg.embedding_dim,
            n_bits=cfg.ann_bits, n_tables=cfg.ann_tables,
            id_col="edge_id", vec_col="embedding",
        )
    else:
        top_edges = topk_bruteforce(edge_index, qv, k, id_col="edge_id", vec_col="embedding")
    # k rows, consumed twice (weight update + source extraction): pin it so
    # the LSH probe/scan doesn't run once per consumer
    top_edges = top_edges.select(F.col("id").alias("edge_id"), F.col("score")).localCheckpoint()

    # G2: join-update edge weights (reference does one UPDATE per edge,
    # io/graph.py:88-95 — ours is one bulk join). Retrieved cosine scores can
    # be <= 0; PPR divides by summed out-weight, so clamp to a positive floor
    # instead of silently producing negative transition probabilities.
    # NOTE: not coalesce(greatest(score, floor), default) — greatest SKIPS
    # nulls (Spark and DuckDB alike), which would silently floor every
    # non-retrieved edge to 1e-6 instead of keeping its 0.2 default
    weighted = edges.join(top_edges, "edge_id", "left").withColumn(
        "weight",
        F.when(F.col("score").isNotNull(), F.greatest(F.col("score"), F.lit(1.0e-6)))
        .otherwise(F.col("weight").cast("double")),
    ).select("edge_id", "head_node_id", "tail_node_id", "weight")

    # J3: endpoint nodes of retrieved edges
    sources = (
        edges.join(top_edges, "edge_id")
        .select(F.explode(F.array("head_node_id", "tail_node_id")).alias("node_id"))
        .distinct()
    )

    # G3: personalized PageRank (damping 0.85, <=100 iters, weighted,
    # undirected). `weighted` has exactly one row per edge, so the cached
    # per-graph count stands in for the PPR scale probe — one count job per
    # graph instead of one per query.
    ranks = personalized_pagerank(
        weighted, sources, cfg.pagerank_damping, cfg.pagerank_max_iter,
        cfg.pagerank_tol, n_edges=_edge_scale_hint(edges),
    )

    # J4 + A5: sum node scores into document weights through membership
    # (batched variant: retrieve_documents_batch below)
    doc_w = (
        membership.join(ranks, "node_id")
        .groupBy("doc_id")
        .agg(F.sum("score").alias("weight"))
    )
    # T3: top-k docs, deterministic tie-break; weight rounded for portable
    # value comparison (ordering is on the unrounded sum)
    return (
        doc_w.orderBy(F.desc("weight"), F.col("doc_id")).limit(k)
        .select("doc_id", F.round("weight", 6).alias("weight"))
    )


def retrieve_documents_batch(
    edges: DataFrame,
    membership: DataFrame,
    edge_index: DataFrame,
    queries: DataFrame,
    config: KGConfig | None = None,
    k: int | None = None,
    use_lsh: bool = True,
) -> DataFrame:
    """Batched QA retrieval: ``queries(query_id, query_text)`` ->
    ``(query_id, doc_id, weight)`` top-k per query — semantically one
    :func:`retrieve_documents` per row, executed as ONE plan.

    Scale shape: all query texts embed in one Arrow pass; the vector top-k
    probes each query's LSH buckets via one (table, bucket) equi-join against
    the bucketed edge index — the FAISS-probe analog
    (back/kgg/retriever.py:62-68); at 10^12 edges a per-query full scan of
    the index is the one thing this stage must never do
    (``use_lsh=False`` keeps the exact batch scan as the small-scale
    oracle). Per-query weighted graph views are an explicit (query_id, edge)
    expansion — per-query edge weights are what G2 *means*, so the q-fold
    state is inherent, but the iteration count stays max_iter Spark jobs
    TOTAL via the query-keyed batched PPR instead of q independent loops.
    Tests pin batch == per-query singles."""
    from knowledgegraphbuilder_spark.operators.ann import (
        ann_lsh_batch,
        topk_bruteforce_batch,
    )
    from knowledgegraphbuilder_spark.operators.pagerank import (
        personalized_pagerank_batch,
    )
    from pyspark.sql.types import DoubleType

    cfg = config or KGConfig()
    k = k or cfg.retrieval_k
    q_emb = embed_column(
        queries.select(F.col("query_id").cast("string").alias("query_id"),
                       F.col("query_text")),
        "query_text", "embedding", cfg.embedding_dim, dtype=DoubleType(),
    )
    if use_lsh:
        top = ann_lsh_batch(
            edge_index, q_emb, k, dim=cfg.embedding_dim,
            n_bits=cfg.ann_bits, n_tables=cfg.ann_tables,
            id_col="edge_id", vec_col="embedding",
            qid_col="query_id", qvec_col="embedding",
        )
    else:
        top = topk_bruteforce_batch(
            edge_index, q_emb, k,
            id_col="edge_id", vec_col="embedding",
            qid_col="query_id", qvec_col="embedding",
        )
    top = top.select("query_id", F.col("id").alias("edge_id"), "score")
    top = top.localCheckpoint()  # k x q rows, consumed three times

    qids = top.select("query_id").distinct()
    weighted = (
        edges.select("edge_id", "head_node_id", "tail_node_id", "weight")
        .crossJoin(F.broadcast(qids))
        .join(top, ["query_id", "edge_id"], "left")
        .withColumn(
            "weight",
            F.when(F.col("score").isNotNull(),
                   F.greatest(F.col("score"), F.lit(1.0e-6)))
            .otherwise(F.col("weight").cast("double")),
        )
        .select("query_id", "head_node_id", "tail_node_id", "weight")
    )
    sources = (
        edges.join(top, "edge_id")
        .select("query_id",
                F.explode(F.array("head_node_id", "tail_node_id")).alias("node_id"))
        .distinct()
    )
    ranks = personalized_pagerank_batch(
        weighted, sources, cfg.pagerank_damping, cfg.pagerank_max_iter,
        cfg.pagerank_tol,
    )
    doc_w = (
        membership.join(ranks, "node_id")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("score").alias("weight"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("weight"), F.col("doc_id"))
    return (
        doc_w.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "doc_id", F.round("weight", 6).alias("weight"))
    )
