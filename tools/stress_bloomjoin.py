"""Dup-rate stress for bloom_anti_join: scale the corpus 10x while keeping
the seen set FIXED, and show the exact-verify join's input tracks the
maybe-seen volume (true dups + the Bloom FP sliver), not the corpus — the
scale claim in the operator docstring. Writes STRESS_BLOOMJOIN_r4.json.

Method: corpus_1x = sf0.1 documents; corpus_10x = 10 shifted-id copies where
only copy 0 keeps the seen texts verbatim (the others get a per-copy suffix,
i.e. 10x corpus, ~1x true-dup volume). The routing split (bloom vs verify)
is read from the operator's own output; if the verify-leg share stays ~flat
while the corpus grows 10x, the shuffle is dup-rate-sized as claimed.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from knowledgegraphbuilder_spark.operators.dedup import bloom_anti_join
from knowledgegraphbuilder_spark.session import build_session


def amplified(d, copies):
    outs = [d]
    for j in range(1, copies):
        outs.append(
            d.select(
                (F.col("doc_id") + 10_000_000 * j).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" copysuffix{j}")).alias("text"),
            )
        )
    out = outs[0].select("doc_id", "text")
    for p in outs[1:]:
        out = out.unionByName(p)
    return out


def run(spark, corpus, seen):
    corpus = corpus.localCheckpoint(eager=True)
    n_docs = corpus.count()
    t0 = time.time()
    out = bloom_anti_join(corpus, seen).groupBy("path").count().collect()
    wall = time.time() - t0
    by_path = {r["path"]: r["count"] for r in out}
    return {
        "n_docs": n_docs,
        "wall_s": round(wall, 2),
        "new_via_bloom": by_path.get("bloom", 0),
        "new_via_verify": by_path.get("verify", 0),
    }


def main():
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("stress-bloomjoin", parallelism=32,
                          shuffle_partitions=64)
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text")
    seen = docs.filter(F.col("doc_id") % 7 == 0).localCheckpoint(eager=True)
    # warm-up (codegen JIT), then timed runs
    run(spark, docs.limit(500), seen.limit(50))
    base = run(spark, docs, seen)
    hot = run(spark, amplified(docs, 10), seen)
    res = {
        "baseline": base,
        "x10": hot,
        "corpus_ratio": round(hot["n_docs"] / base["n_docs"], 1),
        # the verify leg is the only corpus-keyed shuffle; its input is
        # maybe-seen = true dups (fixed) + FP sliver (grows with corpus)
        "verify_leg_ratio": round(
            (hot["new_via_verify"] or 1) / (base["new_via_verify"] or 1), 2),
        "time_ratio": round(hot["wall_s"] / base["wall_s"], 2),
    }
    print(json.dumps(res, indent=1))
    with open("STRESS_BLOOMJOIN_r4.json", "w") as f:
        json.dump(res, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
