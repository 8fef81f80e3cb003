"""Hot-window stress for substring_dedup_rewrite: amplify planted duplicate
density 10x and show cost tracks duplicated volume (the canonical pick is a
map-side aggregate on the window hash — a window occurring in every doc is
one hot GROUP, never a pairwise join). Writes STRESS_REWRITE_r4.json."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from knowledgegraphbuilder_spark.operators.curation import substring_dedup_rewrite
from knowledgegraphbuilder_spark.session import build_session


def planted(d, every, copies):
    outs = []
    for j in range(copies):
        outs.append(
            d.filter(F.col("doc_id") % every == 0).select(
                (F.col("doc_id") + 10_000_000 * (j + 1)).alias("doc_id"),
                F.concat(
                    F.concat_ws(" ", F.slice(F.split("text", " "), 1, 20)),
                    F.lit(f" tail {j} "),
                    F.col("doc_id").cast("string"),
                ).alias("text"),
            )
        )
    out = d
    for p in outs:
        out = out.unionByName(p)
    return out


def run(d, every, copies):
    corpus = planted(d, every, copies).localCheckpoint(eager=True)
    n_docs = corpus.count()
    t0 = time.time()
    res = substring_dedup_rewrite(corpus, k=8).agg(
        F.sum("n_removed").alias("removed"), F.count("*").alias("rows")
    ).collect()[0]
    wall = time.time() - t0
    return {"n_docs": n_docs, "wall_s": round(wall, 2),
            "tokens_removed": int(res["removed"]), "rows": int(res["rows"])}


def main():
    spark = build_session("stress_rewrite", parallelism=32, shuffle_partitions=32)
    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    # JIT warm-up on the small config before timing
    run(d, 40, 1)
    base = run(d, 40, 1)       # 1x: ~13 planted copies
    hot = run(d, 4, 10)        # 10x denser AND 10x more copies per doc: 1250
    out = {
        "baseline": base, "hot": hot,
        "dup_docs_ratio": round((hot["n_docs"] - 500) / max(base["n_docs"] - 500, 1), 1),
        "removed_ratio": round(hot["tokens_removed"] / max(base["tokens_removed"], 1), 1),
        "time_ratio": round(hot["wall_s"] / base["wall_s"], 2),
    }
    print(json.dumps(out))
    with open("STRESS_REWRITE_r4.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
