"""Scale stress for editdist1_pairs: grow the corpus 10x (with planted
typo density held proportional) and show wall clock tracks corpus
volume times key length — the delete-1 variant table is n*(L+1) rows
and the only join is an equi-join on variant, so cost must scale like
candidates, never corpus^2. Writes STRESS_EDITDIST_r4.json."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from knowledgegraphbuilder_spark.operators.dedup import editdist1_pairs
from knowledgegraphbuilder_spark.session import build_session


def corpus(d, replicas):
    """replicas copies of the doc keys, ids disambiguated, every 12th
    doc also contributing a one-char typo copy (constant dup density)."""
    outs = []
    for j in range(replicas):
        base = d.select(
            F.concat(F.lit(f"r{j}-"), F.col("doc_id").cast("string"))
            .alias("doc_id"),
            # perturb a mid char per replica so replicas are not exact
            # dups of each other (that would quadratically blow the
            # within-variant pair count by construction, which is the
            # OUTPUT growing, not the algorithm degrading)
            F.expr(
                f"concat(substring(key, 1, 5), '{chr(97 + j % 26)}',"
                f" substring(key, 7))"
            ).alias("key"),
        )
        typo = base.filter(
            F.expr("abs(hash(doc_id)) % 12 = 0")
        ).select(
            F.concat(F.lit("t-"), "doc_id").alias("doc_id"),
            F.expr(
                "concat(substring(key, 1, 20), "
                "case when substring(key, 21, 1) = 'q' then 'z' else 'q'"
                " end, substring(key, 22))"
            ).alias("key"),
        )
        outs += [base, typo]
    out = outs[0]
    for p in outs[1:]:
        out = out.unionByName(p)
    return out


def run(d, replicas):
    c = corpus(d, replicas).localCheckpoint(eager=True)
    n = c.count()
    t0 = time.time()
    res = editdist1_pairs(c, key_col="key", id_col="doc_id").agg(
        F.count("*").alias("pairs"),
        F.sum(F.expr("cast(dist = 1 as int)")).alias("d1"),
    ).collect()[0]
    wall = time.time() - t0
    return {"n_keys": int(n), "wall_s": round(wall, 2),
            "pairs": int(res["pairs"]), "dist1_pairs": int(res["d1"] or 0)}


def main():
    spark = build_session("stress_editdist", parallelism=32,
                          shuffle_partitions=32)
    d = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.expr("substring(text, 1, 48)").alias("key"),
        )
        .filter(F.expr("length(key) >= 30 and key rlike '^[ -~]+$'"))
    )
    run(d, 1)  # JIT warm-up before timing
    base = run(d, 1)
    big = run(d, 10)
    out = {
        "baseline": base,
        "x10": big,
        "keys_ratio": round(big["n_keys"] / base["n_keys"], 2),
        "wall_ratio": round(big["wall_s"] / base["wall_s"], 2),
        "note": (
            "delete-1 blocking: variant rows grow linearly with keys; "
            "wall tracking the key ratio (not its square) is the "
            "no-cartesian evidence"
        ),
    }
    with open("STRESS_EDITDIST_r4.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
