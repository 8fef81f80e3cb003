"""NER accuracy eval harness — the engine-side analog of the reference's
GLiNER benchmark (back/kgg/test/test.py:85-148: predict over a labeled set,
seqeval BIO micro/per-type P/R/F1).

Instead of BIO tag sequences, the engine's native unit is the mention span
(doc_id, start, end, label), so the metric here is entity-level span-exact
P/R/F1 — the same quantity seqeval's strict mode computes from BIO tags,
without re-encoding through tags. Works with ANY backend that implements the
``extract_batch`` protocol (gazetteer in CI; GLiNER where installed).

Usage:
  python tools/ner_eval.py --gold gold.jsonl [--sf /root/testdata/sf0.01]

gold.jsonl lines: {"doc_id": ..., "text": ...,
                   "entities": [{"start":..,"end":..,"label":..}, ...]}
With no --gold file, a self-check runs: gold = gazetteer matches over the
driver corpus, so the gazetteer backend must score P=R=F1=1.0.
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def span_prf(
    gold: set[tuple], pred: set[tuple]
) -> dict[str, float | int]:
    tp = len(gold & pred)
    p = tp / len(pred) if pred else 0.0
    r = tp / len(gold) if gold else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {"precision": round(p, 4), "recall": round(r, 4), "f1": round(f1, 4),
            "n_gold": len(gold), "n_pred": len(pred), "tp": tp}


def evaluate(gold_rows: list[dict], pred_spans: set[tuple]) -> dict:
    """gold_rows -> overall + per-label span-exact metrics."""
    gold_spans = {
        (str(g["doc_id"]), int(e["start"]), int(e["end"]), e["label"])
        for g in gold_rows for e in g["entities"]
    }
    out = {"overall": span_prf(gold_spans, pred_spans), "per_label": {}}
    labels = {s[3] for s in gold_spans} | {s[3] for s in pred_spans}
    for lb in sorted(labels):
        out["per_label"][lb] = span_prf(
            {s for s in gold_spans if s[3] == lb},
            {s for s in pred_spans if s[3] == lb},
        )
    return out


def predict_spans(spark, gold_rows: list[dict], backend=None) -> set[tuple]:
    """Run the engine's NER stage (chunk -> extract_mentions) over gold texts."""
    from knowledgegraphbuilder_spark.config import KGConfig
    from knowledgegraphbuilder_spark.operators.chunk import chunk_documents
    from knowledgegraphbuilder_spark.operators.ner import extract_mentions

    cfg = KGConfig()
    docs = spark.createDataFrame(
        [(str(g["doc_id"]), g["text"]) for g in gold_rows], "doc_id string, text string"
    )
    chunks = chunk_documents(docs, cfg.ner_chunk_size, cfg.ner_chunk_overlap)
    m = extract_mentions(chunks, cfg, backend=backend)
    return {
        (r["doc_id"], r["start"], r["end"], r["label"])
        for r in m.select("doc_id", "start", "end", "label").collect()
    }


def gazetteer_gold(spark, sf_dir: str, limit: int = 200) -> list[dict]:
    """Self-check gold set: exact gazetteer matches over the driver corpus."""
    from knowledgegraphbuilder_spark.config import DEFAULT_GAZETTEER

    term2label = dict(DEFAULT_GAZETTEER)
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").limit(limit).collect()
    )
    gold = []
    for r in rows:
        ents, pos = [], 0
        for w in r["text"].split(" "):
            if w in term2label:
                ents.append({"start": pos, "end": pos + len(w), "label": term2label[w]})
            pos += len(w) + 1
        gold.append({"doc_id": f"doc_{r['doc_id']}", "text": r["text"], "entities": ents})
    return gold


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--gold", help="labeled JSONL; omit for gazetteer self-check")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=200)
    args = ap.parse_args()

    from knowledgegraphbuilder_spark.session import build_session

    spark = build_session("ner-eval", parallelism=8, shuffle_partitions=8)
    if args.gold:
        gold_rows = [json.loads(ln) for ln in open(args.gold) if ln.strip()]
        backend = None
        try:  # GLiNER where installed (reference model path)
            import gliner  # noqa: F401

            from knowledgegraphbuilder_spark.operators.ner import GLiNERExtractor

            backend = GLiNERExtractor()
        except ImportError:
            print("(GLiNER unavailable — evaluating the gazetteer backend)",
                  file=sys.stderr)
    else:
        gold_rows = gazetteer_gold(spark, args.sf, args.limit)
        backend = None

    result = evaluate(gold_rows, predict_spans(spark, gold_rows, backend))
    print(json.dumps(result, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
