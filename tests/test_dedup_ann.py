"""Dedup suite + ANN vs brute-force references."""

import math
import random

import pytest
from pyspark.sql import functions as F

from knowledgegraphbuilder_spark.operators import ann as ann_ops
from knowledgegraphbuilder_spark.operators import dedup as dd


@pytest.fixture(scope="module")
def dup_docs(spark):
    rng = random.Random(11)
    vocab = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = []
    for i in range(30):
        words = [rng.choice(vocab) for _ in range(40)]
        rows.append((f"d{i:02d}", " ".join(words)))
        if i % 5 == 0:  # plant a near-duplicate: one word changed
            w2 = list(words)
            w2[rng.randrange(len(w2))] = rng.choice(vocab)
            rows.append((f"d{i:02d}x", " ".join(w2)))
        if i % 7 == 0:  # plant an exact duplicate
            rows.append((f"d{i:02d}e", " ".join(words)))
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_exact_duplicates(dup_docs):
    rows = [(r["doc_id"], r["text"]) for r in dup_docs.collect()]
    by_text = {}
    for i, t in rows:
        by_text.setdefault(t, []).append(i)
    want = {",".join(sorted(v)) for v in by_text.values() if len(v) > 1}
    got = {g["doc_ids_csv"] for g in dd.exact_duplicates(dup_docs).collect()}
    assert got == want and len(got) >= 5  # >= the 5 planted exact dups


def brute_jaccard_pairs(rows, k, thr):
    def sh(text):
        ws = text.split(" ")
        return {" ".join(ws[i : i + k]) for i in range(max(len(ws) - k, 0) + 1)}

    out = {}
    for i, (ia, ta) in enumerate(rows):
        for ib, tb in rows[i + 1 :]:
            a, b = (ia, ib) if ia < ib else (ib, ia)
            sa, sb = sh(ta), sh(tb)
            j = len(sa & sb) / len(sa | sb)
            if j >= thr:
                out[(a, b)] = round(j, 6)
    return out


def test_ngram_jaccard_matches_bruteforce(spark, dup_docs):
    rows = [(r["doc_id"], r["text"]) for r in dup_docs.collect()]
    want = brute_jaccard_pairs(rows, 3, 0.5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in dd.ngram_jaccard_pairs(dup_docs, 0.5, 3).collect()}
    assert got == want


def test_minhash_lsh_recall(spark, dup_docs):
    exact = {(r["id_a"], r["id_b"]) for r in dd.ngram_jaccard_pairs(dup_docs, 0.8, 3).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in
           dd.minhash_lsh_pairs(dup_docs, 0.8, n_perm=32, bands=32, k=3).collect()}
    assert lsh == exact  # verification makes precision exact; bands=32 -> recall 1 here


def test_simhash_near_dups(spark, dup_docs):
    import pytest

    pairs = dd.simhash_pairs(dup_docs, max_hamming=6, n_blocks=10).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # exact duplicates must be at hamming 0
    for r in pairs:
        if r["id_a"].rstrip("e") == r["id_b"].rstrip("e"):
            assert r["hamming"] == 0
    assert ("d00", "d00e") in got
    # incomplete banding configurations must be rejected, not silently lossy
    with pytest.raises(ValueError):
        dd.simhash_pairs(dup_docs, max_hamming=6, n_blocks=4)


def test_simhash_banding_equals_exact(spark, dup_docs):
    """Pigeonhole-complete banding == brute-force Hamming join (the property
    the DuckDB oracle relies on)."""
    sh = {r["id"]: r["simhash"] for r in dd.simhash(dup_docs).collect()}
    want = set()
    for a in sh:
        for b in sh:
            if a < b and bin(sh[a] ^ sh[b]).count("1") <= 3:
                want.add((a, b))
    got = {(r["id_a"], r["id_b"])
           for r in dd.simhash_pairs(dup_docs, max_hamming=3, n_blocks=4).collect()}
    assert got == want


def test_embedding_cosine_vs_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    vecs = rng.randn(20, 8).astype("float32")
    vecs[5] = vecs[2] + 0.01 * rng.randn(8).astype("float32")  # planted near-dup
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in dd.embedding_cosine_pairs(df, 0.9).collect()}
    want = {}
    for i in range(20):
        for j in range(i + 1, 20):
            c = float(np.dot(vecs[i], vecs[j]) / (np.linalg.norm(vecs[i]) * np.linalg.norm(vecs[j])))
            if round(c, 4) >= 0.9:
                want[(str(i), str(j))] = round(c, 4)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) <= 1e-4


def test_ann_topk_and_lsh(spark, sf_dir):
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = list(embs.filter(F.col("vec_id") == 3).select("embedding").collect()[0][0])
    exact = ann_ops.topk_bruteforce(embs, q, 10).collect()
    assert exact[0]["id"] == "3" and exact[0]["score"] == 1.0
    assert [r["score"] for r in exact] == sorted((r["score"] for r in exact), reverse=True)
    approx = ann_ops.ann_lsh(embs, q, 10, n_bits=4, n_tables=8)
    arows = approx.collect()
    assert arows[0]["id"] == "3"  # the vector itself always lands in its own bucket
    # recall vs exact (neighbors here have cosine ~0.4 — a hard LSH regime,
    # hence generous bits/tables and a modest bar)
    recall = len({r["id"] for r in arows} & {r["id"] for r in exact}) / 10
    assert recall >= 0.4
    assert arows == approx.collect()


def test_ann_ivf(spark, sf_dir):
    """IVF probe: query's own cell always probed (its centroid is nearest to
    itself through its assignment), candidates subset of corpus, scores equal
    the exact cosine for returned ids."""
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = list(embs.filter(F.col("vec_id") == 3).select("embedding").collect()[0][0])
    got = ann_ops.ann_ivf(embs, q, 10, centroid_stride=50, nprobe=4).collect()
    assert got and got[0]["id"] == "3" and got[0]["score"] == 1.0
    exact = {r["id"]: r["score"] for r in ann_ops.cosine_scores(embs, q).collect()}
    for r in got:
        assert r["score"] == exact[r["id"]]
    # deterministic across runs
    assert got == ann_ops.ann_ivf(embs, q, 10, centroid_stride=50, nprobe=4).collect()


def test_ngram_prefix_filter_equals_naive(spark, dup_docs):
    """PPJoin prefix filtering must be lossless: identical pairs + values to
    the naive full inverted-index join, at both a loose and a tight
    threshold."""
    for thr in (0.5, 0.9):
        fast = {(r["id_a"], r["id_b"]): r["jaccard"]
                for r in dd.ngram_jaccard_pairs(dup_docs, thr, 3).collect()}
        naive = {(r["id_a"], r["id_b"]): r["jaccard"]
                 for r in dd.ngram_jaccard_pairs(
                     dup_docs, thr, 3, prefix_filter=False).collect()}
        assert fast == naive


def test_ngram_prefix_filter_prunes_hot_shingles(spark):
    """A boilerplate shingle shared by EVERY doc must not become a candidate
    join key: with prefix filtering the candidate count stays near the true
    pair count instead of exploding quadratically."""
    boiler = "lorem ipsum dolor"
    rows = [(f"h{i:03d}", f"{boiler} unique{i} token{i} word{i} extra{i}")
            for i in range(200)]
    rows.append(("h000x", rows[0][1]))  # one exact dup pair
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = dd.ngram_jaccard_pairs(df, 0.9, 3).collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == {("h000", "h000x")}


def test_embedding_cosine_lsh_subset_of_exact(spark, sf_dir):
    """Bucketed variant = exact operator restricted to bucket-sharing pairs:
    every reported pair appears in the exact output with the same cosine, and
    recall on the driver fixture's near-dup pairs stays high."""
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in dd.embedding_cosine_pairs(embs, 0.45).collect()}
    lsh = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in dd.embedding_cosine_pairs_lsh(embs, 0.45).collect()}
    assert set(lsh) <= set(exact)
    for pair, c in lsh.items():
        assert c == exact[pair]
    assert len(lsh) >= len(exact) * 0.5  # high-cosine pairs collide often


def test_asof_join_vs_bruteforce(spark):
    """As-of join == per-row brute-force latest-at-or-before lookup."""
    import datetime as dt

    from knowledgegraphbuilder_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    lefts, rights = [], []
    for uid in (1, 2, 3):
        for off in (0, 100, 100, 250, 900):  # includes an equal-ts pair
            rows.append((eid, t0 + dt.timedelta(seconds=off + uid), uid, "view",
                         float(eid), "{}"))
            rights.append((uid, off + uid, eid, float(eid)))
            eid += 1
        for off in (50, 100, 800, 2000):
            rows.append((eid, t0 + dt.timedelta(seconds=off + uid), uid, "purchase",
                         float(eid), "{}"))
            lefts.append((uid, off + uid, eid))
            eid += 1
    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    e = spark.createDataFrame(rows, schema)
    got = {
        r["event_id"]: (r["matched_event_id"], r["matched_value"])
        for r in asof_join(
            e.filter(F.col("event_type") == "purchase"),
            e.filter(F.col("event_type") == "view"),
        ).collect()
    }
    for uid, lts, lid in lefts:
        cands = [(rid, val) for (ruid, rts, rid, val) in rights
                 if ruid == uid and rts <= lts]
        want = max(cands)[0:2] if cands else (None, None)
        assert got[lid] == want, (lid, got[lid], want)


def test_ann_ivf_batch_equals_per_query(spark, sf_dir):
    """ann_ivf_batch(queries) == one ann_ivf per query vector."""
    from pyspark.sql import functions as F

    from knowledgegraphbuilder_spark.operators import ann as ann_ops

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = embs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    batch = {
        (r["query_id"], r["id"]): r["score"]
        for r in ann_ops.ann_ivf_batch(
            embs, queries, k=5, centroid_stride=50, nprobe=4
        ).collect()
    }
    singles = {}
    for qrow in queries.collect():
        for r in ann_ops.ann_ivf(
            embs, list(qrow["embedding"]), k=5, centroid_stride=50, nprobe=4
        ).collect():
            singles[(str(qrow["query_id"]), r["id"])] = r["score"]
    assert set(batch) == set(singles)
    for key in batch:
        assert batch[key] == pytest.approx(singles[key], abs=1e-9)


def test_bm25_matches_python_reference(spark, corpus_df_flat):
    """bm25_topk == a straightforward python BM25 over the same corpus."""
    import math

    from knowledgegraphbuilder_spark.operators.textsearch import bm25_topk

    terms = ["customer", "stream", "spark"]
    rows = corpus_df_flat.collect()
    docs = {str(r["doc_id"]): r["text"].split(" ") for r in rows}
    n = len(docs)
    avgdl = sum(len(ws) for ws in docs.values()) / n
    df = {
        t: sum(1 for ws in docs.values() if t in ws) for t in terms
    }
    k1, b = 1.2, 0.75
    expected = {}
    for did, ws in docs.items():
        s = 0.0
        for t in terms:
            tf = ws.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * len(ws) / avgdl))
        if s > 0:
            expected[did] = round(s, 4)
    top = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [(r["doc_id"], r["score"]) for r in bm25_topk(
        corpus_df_flat, terms, k=10).collect()]
    assert got == top


def test_ann_pq(spark, sf_dir):
    """PQ ADC shortlist: query ranks itself first (its own codes maximize
    its ADC), returned scores equal the exact cosine, deterministic."""
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = list(embs.filter(F.col("vec_id") == 3).select("embedding").collect()[0][0])
    got = ann_ops.ann_pq(embs, q, 10, m=8, centroid_stride=50, shortlist=50).collect()
    assert got and got[0]["id"] == "3" and got[0]["score"] == 1.0
    exact = {r["id"]: r["score"] for r in ann_ops.cosine_scores(embs, q).collect()}
    for r in got:
        assert r["score"] == exact[r["id"]]
    assert got == ann_ops.ann_pq(
        embs, q, 10, m=8, centroid_stride=50, shortlist=50
    ).collect()


def test_ann_pq_full_shortlist_equals_bruteforce(spark, sf_dir):
    """With shortlist >= corpus size, PQ only reorders the candidate scan —
    the exact rescore must reproduce brute force identically."""
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    q = list(embs.filter(F.col("vec_id") == 3).select("embedding").collect()[0][0])
    pq = ann_ops.ann_pq(embs, q, 10, m=8, centroid_stride=50, shortlist=10_000)
    assert pq.collect() == ann_ops.topk_bruteforce(embs, q, 10).collect()


def test_ann_pq_empty_codebook_falls_back_exact(spark, sf_dir):
    """Corpus smaller than the stride pick -> brute-force answer, not []."""
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id").isin(3, 5, 7)  # none sha256-picked at stride 10^9
    )
    q = list(embs.filter(F.col("vec_id") == 3).select("embedding").collect()[0][0])
    got = ann_ops.ann_pq(embs, q, 10, centroid_stride=1_000_000_000)
    assert got.collect() == ann_ops.topk_bruteforce(embs, q, 10).collect()


def test_containment_prefix_filter_equals_naive(spark, dup_docs):
    """The probe-side prefix filter must be lossless for containment, at a
    loose and a tight threshold."""
    for thr in (0.5, 0.9):
        fast = {(r["id_a"], r["id_b"]): r["containment"]
                for r in dd.ngram_containment_pairs(
                    dup_docs, threshold=thr, prefix_filter=True).collect()}
        naive = {(r["id_a"], r["id_b"]): r["containment"]
                 for r in dd.ngram_containment_pairs(
                     dup_docs, threshold=thr, prefix_filter=False).collect()}
        assert fast == naive


def test_containment_catches_quoted_snippet(spark):
    long_doc = " ".join(f"w{i}" for i in range(80))
    snippet = " ".join(f"w{i}" for i in range(20))       # fully contained
    other = " ".join(f"z{i}" for i in range(50))
    df = spark.createDataFrame(
        [(1, long_doc), (2, snippet), (3, other)], "doc_id long, text string"
    )
    got = {(r.id_a, r.id_b): r.containment
           for r in dd.ngram_containment_pairs(df, threshold=0.9).collect()}
    # snippet -> long_doc is a perfect containment; the reverse is not
    assert got == {("2", "1"): 1.0}
    # and Jaccard at the same threshold misses it entirely
    assert dd.ngram_jaccard_pairs(df, threshold=0.9).count() == 0


def test_recall_at_k_pure_python_parity(spark):
    # hand-built rankings: q0 approx hits 2/3 gold (first hit at rank 1),
    # q1 hits 0/3 (mrr 0.0), q2 hits 3/3 but first hit at rank 2
    exact = spark.createDataFrame(
        [(q, f"d{i}", 1.0 - i / 10.0, i) for q in ["0", "1", "2"] for i in (1, 2, 3)],
        "query_id string, id string, score double, rank int",
    )
    approx = spark.createDataFrame(
        [("0", "d1", 0.9, 1), ("0", "x", 0.8, 2), ("0", "d3", 0.7, 3),
         ("1", "x", 0.9, 1), ("1", "y", 0.8, 2), ("1", "z", 0.7, 3),
         ("2", "x", 0.9, 1), ("2", "d1", 0.8, 2), ("2", "d2", 0.7, 3),
         ("2", "d3", 0.6, 4)],
        "query_id string, id string, score double, rank int",
    )
    got = {r["query_id"]: r for r in ann_ops.recall_at_k(exact, approx).collect()}
    assert got["0"]["n_exact"] == 3 and got["0"]["n_hit"] == 2
    assert got["0"]["recall"] == round(2 / 3, 6) and got["0"]["mrr"] == 1.0
    assert got["1"]["n_hit"] == 0 and got["1"]["recall"] == 0.0 and got["1"]["mrr"] == 0.0
    assert got["2"]["recall"] == 1.0 and got["2"]["mrr"] == 0.5


def test_recall_at_k_lsh_vs_exact_on_fixture(spark, sf_dir):
    # end-to-end over the fixture embeddings: every metric in [0,1], one row
    # per query, and a self-comparison scores perfect recall/mrr
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = embs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = ann_ops.topk_bruteforce_batch(embs, queries, k=5)
    approx = ann_ops.ann_lsh_batch(embs, queries, k=5, n_bits=4, n_tables=8)
    rows = ann_ops.recall_at_k(exact, approx).collect()
    assert len(rows) == 3
    for r in rows:
        assert 0.0 <= r["recall"] <= 1.0 and 0.0 <= r["mrr"] <= 1.0
        assert r["n_exact"] == 5
    perfect = ann_ops.recall_at_k(exact, exact).collect()
    assert all(r["recall"] == 1.0 and r["mrr"] == 1.0 for r in perfect)


def test_pair_metrics_pure_python_parity(spark):
    gold = spark.createDataFrame(
        [(1, 2, 0.95), (3, 4, 0.92), (5, 6, 0.91), (7, 8, 0.90)],
        "id_a long, id_b long, jaccard double",
    )
    # one true hit given in reversed orientation + duplicated, one false
    # positive, two gold pairs missed
    cand = spark.createDataFrame(
        [(2, 1, 0.95), (1, 2, 0.95), (4, 3, 0.92), (9, 10, 0.99)],
        "id_a long, id_b long, jaccard double",
    )
    row = dd.pair_metrics(gold, cand).collect()[0]
    assert (row["n_gold"], row["n_cand"], row["n_hit"]) == (4, 3, 2)
    assert row["precision"] == round(2 / 3, 6)
    assert row["recall"] == 0.5
    p, r = 2 / 3, 0.5
    assert row["f1"] == round(2 * p * r / (p + r), 6)


def test_pair_metrics_empty_candidates(spark):
    gold = spark.createDataFrame([(1, 2, 0.95)], "id_a long, id_b long, jaccard double")
    cand = gold.filter(F.col("id_a") < 0)
    row = dd.pair_metrics(gold, cand).collect()[0]
    assert (row["n_cand"], row["precision"], row["recall"], row["f1"]) == (0, 0.0, 0.0, 0.0)


def test_pair_metrics_simhash_vs_jaccard_fixture(spark, dup_docs):
    gold = dd.ngram_jaccard_pairs(dup_docs, threshold=0.9, k=3)
    cand = dd.simhash_pairs(dup_docs, max_hamming=3, n_blocks=4)
    row = dd.pair_metrics(gold, cand).collect()[0]
    assert row["n_gold"] > 0 and 0.0 <= row["f1"] <= 1.0
    # self-calibration is perfect by definition
    perfect = dd.pair_metrics(gold, gold).collect()[0]
    assert perfect["precision"] == 1.0 and perfect["recall"] == 1.0 and perfect["f1"] == 1.0


def test_scalar_quantize_roundtrip_error_bounded(spark, sf_dir):
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = ann_ops.scalar_quantize(embs).collect()
    assert len(out) == embs.count()
    for r in out[:50]:
        codes = [int(c) for c in r["codes"].split(",")]
        assert len(codes) == 64 and all(0 <= c <= 255 for c in codes)
        assert r["mse"] >= 0.0
    # error bound: per-dim quantization error <= scale/2, so MSE <= max
    # scale^2/4; corpus range is ~[-0.5, 0.5] -> scale ~ 1/255
    assert max(r["mse"] for r in out) < (1.0 / 255.0) ** 2


def test_scalar_quantize_numpy_parity(spark):
    import numpy as np

    rows = [(i, [float(((i * 7 + d * 13) % 101) / 101.0 - 0.5) for d in range(4)])
            for i in range(20)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["id"]: r for r in ann_ops.scalar_quantize(embs, dim=4).collect()}
    arr = np.array([np.array(v, dtype=np.float32).astype(np.float64) for _, v in rows])
    mins, maxs = arr.min(axis=0), arr.max(axis=0)
    scales = np.maximum((maxs - mins) / 255.0, 1e-100)
    codes = np.clip(np.floor((arr - mins) / scales + 0.5), 0, 255).astype(int)
    recon = mins + codes * scales
    mse = ((arr - recon) ** 2).mean(axis=1)
    for i, (vid, _) in enumerate(rows):
        got = [int(c) for c in out[str(vid)]["codes"].split(",")]
        assert got == codes[i].tolist()
        assert abs(out[str(vid)]["mse"] - round(mse[i], 10)) < 1e-9


def test_scalar_quantize_constant_dim_codes_zero(spark):
    embs = spark.createDataFrame(
        [(i, [1.5, float(i)]) for i in range(5)], "vec_id long, embedding array<float>"
    )
    out = ann_ops.scalar_quantize(embs, dim=2).collect()
    # constant dim 0: scale floored, every code 0, zero error contribution
    assert all(r["codes"].split(",")[0] == "0" for r in out)


def _cdc_reference(docs, boundary_mod=4, min_shared=2, max_piece_df=100):
    """Pure-Python replay of cdc_pairs."""
    import hashlib

    h60 = lambda s: int(hashlib.sha256(s.encode()).hexdigest()[:15], 16)
    sigs = {}
    for doc_id, text in docs:
        toks = (text or "").split(" ")
        pieces, cur = [], [toks[0]]
        for j in range(1, len(toks)):
            if h60(toks[j - 1] + chr(31) + toks[j]) % boundary_mod == 0:
                pieces.append(cur)
                cur = []
            cur.append(toks[j])
        pieces.append(cur)
        sigs[doc_id] = {h60(" ".join(p)) for p in pieces}
    df = {}
    for s in sigs.values():
        for p in s:
            df[p] = df.get(p, 0) + 1
    keep = {p for p, c in df.items() if c <= max_piece_df}
    ids = sorted(sigs)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            n = len(sigs[a] & sigs[b] & keep)
            if n >= min_shared:
                out[(a, b)] = n
    return out


def test_cdc_pure_python_parity(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma INSERTED delta epsilon zeta eta theta iota kappa"),
        (3, "completely different words nothing shared here at all ok"),
        (4, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in dd.cdc_pairs(docs, min_shared=1).collect()}
    want = _cdc_reference(rows, min_shared=1)
    assert got == want
    # exact duplicates (1, 4) share every piece; the edited copy (1, 2)
    # still shares pieces on both sides of the insertion
    assert (1, 4) in got and (1, 2) in got and (1, 3) not in got


def test_cdc_insertion_robustness_beats_fixed_windows(spark):
    base = " ".join(f"tok{i}" for i in range(60))
    edited = " ".join(f"tok{i}" for i in range(30)) + " INS " + " ".join(
        f"tok{i}" for i in range(30, 60)
    )
    docs = spark.createDataFrame([(1, base), (2, edited)], "doc_id long, text string")
    pairs = dd.cdc_pairs(docs, min_shared=2).collect()
    assert len(pairs) == 1 and pairs[0]["n_shared"] >= 2


def test_cdc_hot_piece_guard(spark):
    # every doc shares one viral piece; with max_piece_df=2 it stops being
    # pair evidence, so unrelated docs do not pair up
    rows = [(i, f"unique{i} words{i} " + "viral boiler plate text") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    loose = dd.cdc_pairs(docs, min_shared=1, max_piece_df=100).count()
    tight = dd.cdc_pairs(docs, min_shared=1, max_piece_df=2).count()
    assert tight < loose


def test_cdc_repartition_stable(spark):
    rows = [(i, " ".join(f"w{(i * 5 + j) % 23}" for j in range(30))) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, dd.cdc_pairs(docs).collect()))
    b = sorted(map(tuple, dd.cdc_pairs(docs.repartition(9)).collect()))
    assert a == b
