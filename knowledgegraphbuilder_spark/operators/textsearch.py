"""Keyword search over the documents table: BM25 top-k.

The training-data-pipeline counterpart to the embedding retrieval stack
(operators/ann.py, operators/retrieval.py): corpus curation and eval tooling
need a lexical baseline (BM25 is THE standard one — Robertson & Zaragoza,
"The Probabilistic Relevance Framework: BM25 and Beyond", FnTIR 2009) next
to the dense ANN paths. Everything is native Spark SQL expressions — two
map-side-combinable aggregations (per-term doc frequency, per-doc term
frequency) plus one broadcast of the 1-row corpus stats; no Python in the
hot path, no full-corpus sort (top-k is TakeOrderedAndProject).

Reference analog: none (the reference retrieves via FAISS only,
back/kgg/retriever.py:34-41) — this operator is part of the beyond-reference
LLM-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, score) — top-k documents by BM25 over whitespace terms.

    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))  (the Lucene/standard
    non-negative variant); tf saturates with k1 and is length-normalized
    with b against the corpus mean length. Scores rounded to 4dp for
    portable value comparison; ties break on doc_id.

    Shuffle budget: one groupBy(doc, term) over only the matching terms
    (the explode is filtered BEFORE the shuffle — a query touches a tiny
    fraction of the corpus token stream), one per-term df aggregate over
    that same filtered set, and a broadcast 1-row corpus-stats join.
    """
    terms = sorted(set(query_terms))
    d = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.split(F.col(text_col), " ").alias("ws"),
    )
    dl = d.select("doc_id", F.size("ws").alias("dl"))
    # corpus stats: one row, broadcast
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    hits = (
        d.select("doc_id", F.explode("ws").alias("term"))
        .filter(F.col("term").isin(terms))
    )
    tf = hits.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "s",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("s"), 4).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.col("doc_id")).limit(k)


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    c: float = 60.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09) of
    pre-truncated rankings: rrf(d) = sum over legs of 1 / (c + rank_leg(d)),
    ranks 1-based by (score desc, id asc) within each leg; documents missing
    from a leg simply contribute nothing. The standard hybrid-search
    combiner for a lexical (BM25) + dense (embedding) pair — rank-based, so
    the two legs' incomparable score scales never need calibration.

    Each input leg MUST already be a top-N candidate list (the upstream
    operators end in TakeOrderedAndProject) — the global rank window here
    is a single-task sort of N rows per leg, not a corpus sort. Output:
    (id_col, rrf) rounded 6dp, top-k by (rrf desc, id asc).
    """
    from functools import reduce

    legs = []
    for i, df in enumerate(rankings):
        w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
        legs.append(
            df.select(id_col, "score")
            .withColumn("r", F.row_number().over(w))
            .select(id_col, (F.lit(1.0) / (F.lit(float(c)) + F.col("r"))).alias(f"c{i}"))
        )
    fused = reduce(lambda a, b: a.join(b, id_col, "full_outer"), legs)
    contrib = [F.coalesce(F.col(f"c{i}"), F.lit(0.0)) for i in range(len(legs))]
    total = contrib[0]
    for x in contrib[1:]:
        total = total + x
    return (
        fused.select(id_col, F.round(total, 6).alias("rrf"))
        .orderBy(F.col("rrf").desc(), F.col(id_col).asc())
        .limit(k)
    )
