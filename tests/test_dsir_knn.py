"""DSIR importance resampling (curation.dsir_weights) and the LSH kNN
graph (ann.knn_graph): cross-checked against pure-Python references that
re-derive the sha256 buckets/hyperplanes, plus degenerate-input guards
(the single-token bigram trap from ADVICE r3)."""

import hashlib
import math
import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from knowledgegraphbuilder_spark.operators.ann import hyperplane, knn_graph  # noqa: E402
from knowledgegraphbuilder_spark.operators.curation import dsir_weights  # noqa: E402


def _h60(s: str) -> int:
    return int(hashlib.sha256(s.encode()).hexdigest()[:15], 16)


def _py_dsir(rows, target_lang="en", B=64, alpha=0.5):
    """(doc_id, lang, text) -> {doc_id: (n_feats, log_weight)} — same
    hashed uni+bigram buckets, add-alpha bucket LMs, bucket-sorted fold."""
    feats = {}
    for doc_id, lang, text in rows:
        if text is None:
            continue
        ws = text.lower().split(" ")
        fs = list(ws) + [f"{ws[i]} {ws[i+1]}" for i in range(len(ws) - 1)]
        feats[doc_id] = (lang == target_lang, [_h60(f) % B for f in fs])
    ct, cr = {}, {}
    for is_t, bs in feats.values():
        for b in bs:
            cr[b] = cr.get(b, 0) + 1
            if is_t:
                ct[b] = ct.get(b, 0) + 1
    T, R = float(sum(ct.values())), float(sum(cr.values()))
    out = {}
    for doc_id, (_, bs) in feats.items():
        per = {}
        for b in bs:
            per[b] = per.get(b, 0) + 1
        lw = 0.0
        for b in sorted(per):
            lw += per[b] * (
                math.log((ct.get(b, 0) + alpha) / (T + alpha * B))
                - math.log((cr[b] + alpha) / (R + alpha * B))
            )
        out[doc_id] = (len(bs), lw)
    return out


def test_dsir_matches_python_reference(spark):
    rows = [
        (1, "en", "the spark stream joins the table"),
        (2, "en", "the customer reads the stream"),
        (3, "de", "der kunde liest den strom"),
        (4, "fr", "le client lit le flux"),
        (5, "en", "spark spark spark stream stream"),
        (6, "zh", "one two three"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r["doc_id"]: r for r in dsir_weights(docs, sample_k=3).collect()}
    ref = _py_dsir(rows)
    assert set(got) == set(ref)
    for doc_id, (n_feats, lw) in ref.items():
        assert got[doc_id]["n_feats"] == n_feats
        assert got[doc_id]["log_weight"] == pytest.approx(lw, abs=1e-3)
    # target-domain docs must outscore off-domain ones on average
    en = [ref[d][1] for d in (1, 2, 5)]
    other = [ref[d][1] for d in (3, 4, 6)]
    assert min(en) > max(other)
    assert sum(1 for r in got.values() if r["sampled"]) == 3


def test_dsir_sample_size_and_repartition_stability(spark):
    rows = [(i, "en" if i % 3 == 0 else "de",
             f"tok{i % 7} tok{i % 5} tok{i % 3} shared words here")
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    a = dsir_weights(docs, sample_k=10)
    b = dsir_weights(docs.repartition(13), sample_k=10)
    assert a.filter("sampled").count() == 10
    assert sorted(r["doc_id"] for r in a.filter("sampled").collect()) == \
        sorted(r["doc_id"] for r in b.filter("sampled").collect())
    # sample_k > corpus: everything sampled, no crash
    assert dsir_weights(docs, sample_k=1000).filter("sampled").count() == 40


def test_dsir_degenerate_docs(spark):
    # single-token and empty-string docs exercise the sequence(1, size-1)
    # bigram trap (ADVICE r3, pmi_collocations); null text is dropped
    docs = spark.createDataFrame(
        [(1, "en", "solo"), (2, "en", ""), (3, "de", None), (4, "en", "a b")],
        "doc_id long, lang string, text string",
    )
    got = {r["doc_id"]: r for r in dsir_weights(docs, sample_k=2).collect()}
    assert set(got) == {1, 2, 4}
    assert got[1]["n_feats"] == 1  # one unigram, no bigram
    assert got[2]["n_feats"] == 1  # '' splits to [''] in both engines
    assert got[4]["n_feats"] == 3  # two unigrams + one bigram


def _py_knn(vecs, k, n_bits, n_tables, seed=42):
    dim = len(next(iter(vecs.values())))
    planes = {(t, b): hyperplane(seed, t, b, dim)
              for t in range(n_tables) for b in range(n_bits)}

    def bucket(v, t):
        out = 0
        for b in range(n_bits):
            if sum(x * y for x, y in zip(v, planes[(t, b)])) >= 0:
                out |= 1 << b
        return out

    sigs = {i: [bucket(v, t) for t in range(n_tables)] for i, v in vecs.items()}
    out = {}
    for i, v in vecs.items():
        cands = [j for j in vecs if j != i
                 and any(sigs[i][t] == sigs[j][t] for t in range(n_tables))]
        scored = []
        for j in cands:
            w = vecs[j]
            dot = sum(x * y for x, y in zip(v, w))
            nv = max(math.sqrt(sum(x * x for x in v)), 1e-100)
            nw = max(math.sqrt(sum(x * x for x in w)), 1e-100)
            scored.append((round(dot / (nv * nw), 4), str(j)))
        scored.sort(key=lambda s: (-s[0], s[1]))
        out[str(i)] = scored[:k]
    return out


def test_knn_graph_matches_python_reference(spark):
    rng = random.Random(7)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(30)}
    embs = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    # float32 storage: the reference must see the same rounded values
    f32 = {i: [float(__import__("numpy").float32(x)) for x in v]
           for i, v in vecs.items()}
    ref = _py_knn(f32, k=4, n_bits=2, n_tables=3)
    got = {}
    for r in knn_graph(embs, k=4, n_bits=2, n_tables=3).collect():
        got.setdefault(r["src"], []).append((r["rank"], r["score"], r["dst"]))
    for src in got:
        got[src].sort()
    assert set(got) <= set(ref)
    for src, neigh in got.items():
        assert [(s, d) for _, s, d in neigh] == ref[src]
        assert [rk for rk, _, _ in neigh] == list(range(1, len(neigh) + 1))


def test_knn_graph_no_self_edges_and_k_cap(spark):
    rng = random.Random(3)
    embs = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    df = knn_graph(embs, k=3, n_bits=2, n_tables=4).collect()
    per = {}
    for r in df:
        assert r["src"] != r["dst"]
        per.setdefault(r["src"], []).append(r["rank"])
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3


def test_knn_cc_clusters_tight_groups(spark):
    from knowledgegraphbuilder_spark.operators.canonicalize import (
        connected_components,
    )
    from pyspark.sql import functions as F

    # two tight clusters around orthogonal axes + one lone outlier
    base_a = [1.0, 0.0, 0.0, 0.0]
    base_b = [0.0, 1.0, 0.0, 0.0]
    rows = []
    for i in range(4):
        rows.append((i, [x + 0.01 * i for x in base_a]))
    for i in range(4, 8):
        rows.append((i, [x + 0.01 * i for x in base_b]))
    rows.append((99, [0.0, 0.0, 0.0, -1.0]))
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    g = knn_graph(embs, k=3, n_bits=2, n_tables=6)
    comps = {
        r["vertex"]: r["component"]
        for r in connected_components(
            g.filter(F.col("score") >= 0.9).select("src", "dst")
        ).collect()
    }
    assert {comps[str(i)] for i in range(4)} == {"0"}
    assert {comps[str(i)] for i in range(4, 8)} == {"4"}
    assert "99" not in comps  # the outlier joins no cluster
