"""Seeded bulk sweeps of the round-5 exact-arithmetic rewrites, each
checked against arbitrary-precision Python in ONE Spark pass (no
per-example jobs):

- the MinHash Carter-Wegman family over p = 2^61-1 (64-bit Mersenne
  folding in sketches.minhash_group_signatures),
- the noisy-OR micro-unit posterior (fusion.noisy_or_micro_sql across
  all three exactness regimes),
- the Lorenz closed-form ntile allocation (mlstats.lorenz_deciles).
"""

import hashlib
import random
from fractions import Fraction

from pyspark.sql import functions as F


def test_minhash_folding_sweep_vs_python_bigint(spark):
    from knowledgegraphbuilder_spark.operators.sketches import (
        MINHASH_GROUP_PRIME as P,
        minhash_ab,
        minhash_group_signatures,
    )

    rng = random.Random(20260821)
    # 400 groups x 1 distinct shingle each: every (group, perm) minv IS
    # the permuted hash of that one shingle — 6,400 direct folding checks
    words = [f"w{rng.randrange(10**9)}" for _ in range(1200)]
    docs = [(f"g{i}", " ".join(words[3 * i: 3 * i + 3])) for i in range(400)]
    df = spark.createDataFrame(docs, "source string, text string")
    got = {(r.g, r.perm): r.minv
           for r in minhash_group_signatures(df, k=3).collect()}
    ab = minhash_ab(16)
    for i, (g, text) in enumerate(docs):
        x = int(hashlib.sha256(text.encode()).hexdigest()[:15], 16)
        for perm, (a, b) in enumerate(ab):
            assert got[(g, perm)] == (a * x + b) % P, (g, perm)


def test_noisy_or_sweep_vs_fraction(spark):
    from knowledgegraphbuilder_spark.operators.fusion import fuse_from_counts

    rng = random.Random(20260821)
    cases = sorted(
        {(rng.randrange(0, 61), rng.randrange(0, 61)) for _ in range(200)}
    )
    counts = spark.createDataFrame(
        [("s", "p", f"o{i}", ka, kb) for i, (ka, kb) in enumerate(cases)],
        "subj string, pred string, obj string, k_a long, k_b long",
    )
    got = {r.obj: r.p_fused_micro
           for r in fuse_from_counts(counts, {"a": 7, "b": 2}).collect()}
    for i, (ka, kb) in enumerate(cases):
        p = 1 - Fraction(7, 10) ** ka * Fraction(2, 10) ** kb
        assert got[f"o{i}"] == (p * 10**6).__floor__(), (ka, kb)


def test_lorenz_ntile_closed_form_sweep(spark):
    from pyspark.sql import Window as W

    from knowledgegraphbuilder_spark.operators.mlstats import lorenz_deciles

    for n in (9, 10, 101, 1000):
        df = spark.range(n).select(
            ((F.col("id") * 13) % 37).alias("v"), F.col("id").alias("i")
        )
        got = {r.decile: (r.n_docs, r.sum_x)
               for r in lorenz_deciles(df, "v", "i").collect()}
        ref_t = df.select(
            "v", F.ntile(10).over(W.orderBy("v", "i")).alias("d")
        )
        ref = {r.d: (r.n, r.s)
               for r in ref_t.groupBy("d")
               .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
               .collect()}
        assert got == ref, n
