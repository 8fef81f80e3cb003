"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "kg_pipeline_e2e_sec", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "kg_docs_per_sec": ..., "scaling": {"n_cpus": ..., "t_n": ..., "t_4n": ...,
   "throughput_ratio": ..., "efficiency": ...}}

Scaling evidence (BASELINE.json north rule, sandbox stand-in for N vs 4N
executors): the same KG pipeline runs in two subprocesses at local[N] and
local[4N] on the same input; efficiency = (T_N / T_4N) / 4.
Set SPARK_GRAFT_SKIP_SCALING=1 to skip the scaling subprocesses.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_of(path: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else 0.0


def run_kg_once(parallelism: int, sf_dir: str) -> tuple[float, int]:
    """Full KG pipeline (spans -> triples), returns (seconds, n_docs)."""
    from knowledgegraphbuilder_spark.config import KGConfig
    from knowledgegraphbuilder_spark.plans.pipeline import run_pipeline
    from knowledgegraphbuilder_spark.session import build_session
    from knowledgegraphbuilder_spark.sources.interleaved import read_documents_parquet

    spark = build_session(f"kg-bench-{parallelism}", parallelism=parallelism,
                          shuffle_partitions=max(parallelism, 8))
    spans = read_documents_parquet(spark, sf_dir)
    n_docs = spans.count()
    t0 = time.time()
    res = run_pipeline(spans, KGConfig())
    res.triples.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    spark.stop()
    return dt, n_docs


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--scale-run":
        par = int(sys.argv[2])
        dt, n = run_kg_once(par, SF_DIR)
        print(json.dumps({"par": par, "sec": dt, "docs": n}))
        return

    from knowledgegraphbuilder_spark.session import build_session

    import __spark_entry__ as entry

    spark = build_session("kg-bench", parallelism=CPUS, shuffle_partitions=max(CPUS, 8))
    qs = entry.queries()
    bench_queries = [
        "kg_triples", "kg_a1_nodes", "kg_u2_mentions",
        "dd_minhash_lsh", "dd_ngram_jaccard", "dd_simhash",
        "ann_topk", "ts_quality", "ts_fingerprint",
        "sql_agg_pushdown", "sql_join_agg", "sql_window_cum", "sql_sessionize",
    ]
    timings: dict[str, float] = {}
    t_total0 = time.time()
    for name in bench_queries:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    # e2e KG pipeline timing in-process (fresh plan, warm JVM)
    entry._PIPE_CACHE.clear()
    from knowledgegraphbuilder_spark.config import KGConfig
    from knowledgegraphbuilder_spark.plans.pipeline import run_pipeline
    from knowledgegraphbuilder_spark.sources.interleaved import read_documents_parquet

    spans = read_documents_parquet(spark, SF_DIR)
    n_docs = spans.count()
    t0 = time.time()
    run_pipeline(spans, KGConfig()).triples.write.format("noop").mode("overwrite").save()
    kg_sec = time.time() - t0
    spark.stop()

    out = {
        "metric": "kg_pipeline_e2e_sec",
        "value": round(kg_sec, 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(SF_DIR),
        "n_docs": n_docs,
        "kg_docs_per_sec": round(n_docs / kg_sec, 2) if kg_sec > 0 else None,
        "bench_wall_sec": round(time.time() - t_total0, 3),
        "cpus": CPUS,
    }

    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        n_small = max(CPUS // 4, 1)
        scaling = {}
        for par, key in ((n_small, "t_n"), (CPUS, "t_4n")):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--scale-run", str(par)],
                capture_output=True, text=True, env=os.environ.copy(),
            )
            line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
            scaling[key] = json.loads(line[-1])["sec"] if line else None
        if scaling.get("t_n") and scaling.get("t_4n"):
            ratio = scaling["t_n"] / scaling["t_4n"]
            scaling.update(
                n_cpus=n_small,
                throughput_ratio=round(ratio, 3),
                efficiency=round(ratio / 4.0, 3),
            )
        out["scaling"] = scaling

    print(json.dumps(out))


if __name__ == "__main__":
    main()
