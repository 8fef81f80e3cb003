"""Hub-skew stress for the graph analytics (round-3 VERDICT item 8).

Replicates a hub node's edge set 10x and measures triangle counting and
k-core decomposition at both scales. The claim under test: the WWW'11
degree-ordered wedge enumeration (operators/graphstats.py:triangle_clustering)
moves every wedge to the LOW-degree corner, so a 10x-degree hub costs ~10x
(its edge count), NOT 100x (its wedge count hub-degree^2 under naive
node-iterator enumeration). k-core's peel rounds are degree aggregations +
semi-joins — linear in edges by construction.

Graph shape: one hub connected to K leaves, plus two leaf-ring edge sets
(i<->i+1, i<->i+3) so real triangles exist away from the hub. At 10x the hub
degree is 10K: naive hub wedges grow (10K choose 2)/(K choose 2) ~ 100x,
ours are bounded by the leaves' out-degrees and grow ~10x.

Prints ONE JSON line; committed as STRESS_HUB_r4.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from knowledgegraphbuilder_spark.operators.graphstats import k_core, triangle_clustering
from knowledgegraphbuilder_spark.session import build_session


def hub_graph(spark, n_leaves: int):
    """Hub 'h' + leaves L0..L{n-1}; hub-leaf star + two leaf rings."""
    leaves = spark.range(n_leaves).select(
        F.format_string("L%09d", F.col("id")).alias("leaf"), F.col("id")
    )
    star = leaves.select(F.lit("h").alias("src"), F.col("leaf").alias("dst"))
    ring1 = leaves.select(
        F.col("leaf").alias("src"),
        F.format_string("L%09d", (F.col("id") + 1) % n_leaves).alias("dst"),
    )
    ring3 = leaves.select(
        F.col("leaf").alias("src"),
        F.format_string("L%09d", (F.col("id") + 3) % n_leaves).alias("dst"),
    )
    return star.unionAll(ring1).unionAll(ring3)


def run_once(spark, n_leaves: int) -> dict:
    edges = hub_graph(spark, n_leaves).localCheckpoint(eager=True)
    n_edges = edges.count()
    t0 = time.time()
    tri = triangle_clustering(edges)
    total_tri = tri.agg(F.sum("triangles")).collect()[0][0] // 3
    t_tri = time.time() - t0
    hub_deg = tri.filter(F.col("node") == "h").collect()[0]["degree"]
    t0 = time.time()
    core = k_core(edges, k=3)
    n_core = core.count()
    t_core = time.time() - t0
    return {
        "n_leaves": n_leaves,
        "n_edges": n_edges,
        "hub_degree": int(hub_deg),
        "naive_hub_wedges": hub_deg * (hub_deg - 1) // 2,
        "triangles": int(total_tri),
        "kcore3_nodes": int(n_core),
        "triangle_sec": round(t_tri, 1),
        "kcore_sec": round(t_core, 1),
    }


def main() -> None:
    base = int(os.environ.get("STRESS_HUB_LEAVES", "30000"))
    spark = build_session("stress-hub", parallelism=32, shuffle_partitions=32)
    # warm-up at a small size: compile the generated wedge/peel codegen
    run_once(spark, 2000)
    r1 = run_once(spark, base)
    r10 = run_once(spark, base * 10)
    spark.stop()
    out = {
        "metric": "hub_skew_stress",
        "x1": r1,
        "x10": r10,
        "triangle_cost_ratio": round(r10["triangle_sec"] / r1["triangle_sec"], 2),
        "kcore_cost_ratio": round(r10["kcore_sec"] / r1["kcore_sec"], 2),
        "naive_wedge_ratio": round(
            r10["naive_hub_wedges"] / r1["naive_hub_wedges"], 1
        ),
        "edge_ratio": round(r10["n_edges"] / r1["n_edges"], 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
