"""Empty-input robustness sweep: run EVERY ``queries()`` entry against
zero-row copies of all ten tables and assert nothing crashes except the
documented precondition cases.

Why this exists: ANSI mode turns silent degenerate-input bugs (descending
``sequence()`` windows, divide-by-zero, array index) into runtime errors —
the round-4 ADVICE found exactly one such trap (pmi_collocations on
single-token docs). Zero-row tables are the sharpest degenerate input:
every aggregate returns NULL/empty, every window is empty, every
broadcast side is empty. A 100 TB pipeline hits empty partitions and
empty filter results constantly, so operators must flow empties through.

Expected non-passes, reviewed case by case (see ROBUSTNESS_r4.json):

- ``precondition``: personalized PageRank explicitly requires >= 1 source
  node (a clear ValueError, the documented contract) — retrieval and QA
  chains built on it inherit that.
- ``needs_corpus``: the query WRAPPER (not the operator) derives its own
  input from the corpus — ANN wrappers collect the vec_id=0 query vector,
  retrieval_hybrid picks a probe document, streaming wrappers synthesize
  micro-batch files from min/max event ids, source-scan wrappers write
  fixture files from the documents table. With zero rows there is nothing
  to derive. The underlying operators take the derived value as an
  argument and are themselves empty-safe (empty-centroid fallbacks in
  ann.py, zero-state folds in streaming/ingest.py).

Usage: ``python tools/empty_sweep.py [--out ROBUSTNESS.json]``.
Exit 1 if any query OUTSIDE the allowlist fails.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

PRECONDITION = {
    # PPR contract: ValueError("personalized pagerank needs at least one
    # source node") — explicit, documented, correct
    "g3_pagerank", "retrieval_topk", "kg_answer",
}

NEEDS_CORPUS = {
    # wrapper collects the query vector / probe doc from the corpus
    "ann_topk", "ann_lsh", "ann_ivf", "ann_pq", "ann_lsh_batch",
    "ann_knn", "ann_knn_cc", "ann_recall", "ann_sq8", "retrieval_hybrid",
    # wrapper synthesizes micro-batch files / fixture inputs from table
    # min/max ids before the streaming fold runs
    "stream_hll", "stream_cms", "stream_join", "stream_relations",
    "stream_dedup", "stream_sessions", "stream_ann", "stream_edges",
    "stream_heavy", "stream_quantile", "stream_minhash", "stream_bloom",
    "kg_incremental", "src_jsonl", "src_txt", "kg_sink_roundtrip",
    "stream_lines", "stream_resample",
    # round-4 session-3 additions, same min/max-id batch synthesis
    "stream_cusum", "stream_kmv",
    # round-5 review of the remaining additions (r5 sweep): ann_mips /
    # ann_range / ann_filtered collect the vec_id=0 query vector;
    # g33_pathrecon / g34_betweenness collect their seed/target node from
    # the corpus projection; kg_asof derives its as-of point from
    # max(doc id); stream_cc / stream_fuse synthesize micro-batch files
    # from table ids before the fold. All verified wrapper-side
    # (collect()[0] / first()["m"] / batch-writer), operators empty-safe.
    "ann_mips", "ann_range", "ann_filtered", "g33_pathrecon",
    "g34_betweenness", "kg_asof", "stream_cc", "stream_fuse",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--dir", default="/tmp/kg_empty_sf")
    args = ap.parse_args()

    import duckdb

    os.makedirs(args.dir, exist_ok=True)
    for t in TABLES:
        duckdb.sql(
            f"COPY (SELECT * FROM '/root/testdata/sf0.001/{t}.parquet' "
            f"LIMIT 0) TO '{args.dir}/{t}.parquet' (FORMAT PARQUET)"
        )

    from knowledgegraphbuilder_spark.session import build_session

    import __spark_entry__ as entry

    spark = build_session("empty-sweep", parallelism=8, shuffle_partitions=8)
    rows, unexpected = [], []
    for name, fn in entry.queries().items():
        try:
            n = fn(spark, args.dir).count()
            rows.append({"query": name, "status": "ok", "rows": n})
        except Exception as e:  # noqa: BLE001 — sweep records, never hides
            kind = (
                "precondition" if name in PRECONDITION
                else "needs_corpus" if name in NEEDS_CORPUS
                else "UNEXPECTED"
            )
            rows.append({
                "query": name, "status": kind,
                "error": f"{type(e).__name__}: {str(e).splitlines()[0][:160]}"
                if str(e) else type(e).__name__,
            })
            if kind == "UNEXPECTED":
                unexpected.append(name)
    spark.stop()

    n_ok = sum(1 for r in rows if r["status"] == "ok")
    summary = {
        "total": len(rows),
        "empty_safe": n_ok,
        "precondition": sum(1 for r in rows if r["status"] == "precondition"),
        "needs_corpus": sum(1 for r in rows if r["status"] == "needs_corpus"),
        "unexpected": unexpected,
        "queries": rows,
    }
    out = json.dumps(summary, indent=None, separators=(",", ":"))
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")
    print(f"{n_ok}/{len(rows)} empty-safe, "
          f"{len(unexpected)} UNEXPECTED: {unexpected}")
    return 1 if unexpected else 0


if __name__ == "__main__":
    raise SystemExit(main())
