"""Chunking parameter sweep — the analog of the reference's test3 harness
(back/kgg/test/test3.py:28-33,228-249): for each (chunk_size, overlap) config,
run mention extraction and score P/R/F1 against the unchunked whole-document
baseline, plus wall time. One JSON line per config.

With the deterministic gazetteer the expected result is P=R=1.0 whenever
overlap >= max entity word length (chunks are word-aligned, dedup collapses
overlap duplicates) — the harness exists to catch chunking regressions and to
sweep real-model configs, where chunk size genuinely moves quality.

Usage: python tools/chunk_sweep.py [--sf /root/testdata/sf0.001]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from knowledgegraphbuilder_spark.config import KGConfig
    from knowledgegraphbuilder_spark.operators.chunk import chunk_documents
    from knowledgegraphbuilder_spark.operators.flatten import flatten_documents
    from knowledgegraphbuilder_spark.operators.ner import extract_mentions
    from knowledgegraphbuilder_spark.session import build_session
    from knowledgegraphbuilder_spark.sources.interleaved import read_documents_parquet

    spark = build_session("chunk-sweep", parallelism=8, shuffle_partitions=8)
    cfg = KGConfig()
    docs = flatten_documents(read_documents_parquet(spark, args.sf)).localCheckpoint()

    def mentions_at(size: int, overlap: int) -> set:
        chunks = chunk_documents(docs, size, overlap)
        m = extract_mentions(chunks, cfg)
        return {
            (r["doc_id"], r["start"], r["end"], r["label"]) for r in m.collect()
        }

    golden = mentions_at(1_000_000, 0)  # unchunked baseline (test3's golden)
    for size in (64, 100, 200, 300, 384):
        for pct in (10, 15, 30, 40):
            overlap = max(size * pct // 100, 1)
            t0 = time.time()
            got = mentions_at(size, overlap)
            wall = time.time() - t0
            tp = len(got & golden)
            p = tp / len(got) if got else 1.0
            r = tp / len(golden) if golden else 1.0
            f1 = 2 * p * r / (p + r) if p + r else 0.0
            print(json.dumps({
                "chunk_size": size, "overlap": overlap,
                "precision": round(p, 4), "recall": round(r, 4), "f1": round(f1, 4),
                "n_mentions": len(got), "wall_s": round(wall, 2),
            }))
    spark.stop()


if __name__ == "__main__":
    main()
