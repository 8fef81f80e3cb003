"""Curation operators: exact-substring dup stats, decontamination, PII.

Cross-checked against tiny hand-computed fixtures plus a pure-Python
reference over the synthetic corpus (same methodology as test_dedup_ann)."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from knowledgegraphbuilder_spark.operators.curation import (  # noqa: E402
    decontaminate,
    mixture_sample,
    pack_sequences,
    pii_stats,
    quality_filter,
    repetition_stats,
    substring_dup_stats,
    window_hashes,
)
from tests.conftest import make_corpus  # noqa: E402


def _py_windows(text: str, k: int) -> set[str]:
    toks = text.split(" ")
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def test_substring_dup_stats_hand_fixture(spark):
    # a and b share a's full 5-token text (b embeds it); c is disjoint
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "zz alpha beta gamma delta epsilon yy"),
            (3, "one two three four five six"),
            (4, "shorty"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in substring_dup_stats(docs, k=5).collect()}
    assert rows[1]["n_windows"] == 1 and rows[1]["n_dup_windows"] == 1
    assert rows[1]["dup_frac"] == 1.0
    assert rows[2]["n_windows"] == 3 and rows[2]["n_dup_windows"] == 1
    assert rows[2]["dup_frac"] == round(1 / 3, 4)
    assert rows[3]["n_dup_windows"] == 0
    # shorter than k: zero windows, zero frac (no null, no division error)
    assert rows[4]["n_windows"] == 0 and rows[4]["dup_frac"] == 0.0


def test_substring_dup_stats_matches_python_reference(spark):
    corpus = make_corpus(n_docs=25, min_words=5, max_words=60, seed=11)
    docs = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(corpus)], "doc_id long, text string"
    )
    k = 4
    wins = {i: _py_windows(t, k) for i, (_, t) in enumerate(corpus)}
    got = {r["doc_id"]: r for r in substring_dup_stats(docs, k=k).collect()}
    for i, ws in wins.items():
        dup = sum(
            1 for w in ws if any(w in wo for j, wo in wins.items() if j != i)
        )
        assert got[i]["n_windows"] == len(ws)
        assert got[i]["n_dup_windows"] == dup, f"doc {i}"
        expect = round(dup / len(ws), 4) if ws else 0.0
        assert abs(got[i]["dup_frac"] - expect) < 1e-9


def test_window_hashes_distinct_per_doc(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b a b")], "doc_id long, text string"
    )
    # windows: "a b a", "b a b", "a b a", "b a b" -> 2 distinct hashes
    assert window_hashes(docs, k=3).count() == 2


def test_decontaminate_flags_only_overlapping(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely different text with no overlap at all here"),
            (3, "quick brown fox jumps over a lazy cat instead"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "quick brown fox jumps over the lazy")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in decontaminate(train, ev, k=7).collect()}
    assert got[1]["contaminated"] and got[1]["n_shared"] == 1
    assert not got[2]["contaminated"] and got[2]["n_shared"] == 0
    # doc 3 diverges inside every 7-token window ("a" vs "the")
    assert not got[3]["contaminated"]


def test_decontaminate_broadcasts_eval_side(spark):
    train = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} z{i} a b c d") for i in range(50)],
        "doc_id long, text string",
    )
    ev = train.limit(2)
    plan = decontaminate(train, ev, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_pii_stats_counts_and_redaction(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org and alice@ex.io now"),
            (2, "server 10.0.0.1 and 192.168.1.255 up"),
            (3, "card 1234567812345678 leaked but 123456781234567 is not"),
            (4, "clean text with no pii at all"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_stats(docs).collect()}
    assert got[1]["n_emails"] == 2
    assert got[1]["redacted"] == "mail <EMAIL> and <EMAIL> now"
    assert got[2]["n_ipv4"] == 2
    assert got[2]["redacted"] == "server <IP> and <IP> up"
    assert got[3]["n_cards"] == 1
    assert got[3]["redacted"] == "card <CARD> leaked but 123456781234567 is not"
    assert got[4]["redacted"] == "clean text with no pii at all"
    assert (got[4]["n_emails"], got[4]["n_ipv4"], got[4]["n_cards"]) == (0, 0, 0)


def test_pii_no_python_in_plan(spark):
    docs = spark.createDataFrame([(1, "a@b.co")], "doc_id long, text string")
    plan = pii_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_repetition_stats_hand_fixture(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),  # 6 tokens, 2 distinct; top 2gram "a b" x3
            (2, "one two three four"),  # all distinct; every 2gram count 1
            (3, "x"),  # shorter than n: no grams
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs, n=2).collect()}
    assert got[1]["n_tokens"] == 6
    assert got[1]["dup_word_frac"] == round(1 - 2 / 6, 4)
    assert got[1]["top_ngram"] == "a b"
    # "a b" occurs 3x, len 3, text len 11
    assert got[1]["top_ngram_frac"] == round(3 * 3 / 11, 4)
    # tie on count=1 -> lexicographically largest 2-gram wins
    assert got[2]["dup_word_frac"] == 0.0
    assert got[2]["top_ngram"] == "two three"
    assert got[3]["top_ngram"] == "" and got[3]["top_ngram_frac"] == 0.0


def test_quality_filter_reasons(spark):
    docs = spark.createDataFrame(
        [
            # 30 distinct all-letter tokens: kept (digit-bearing tokens like
            # "w1" would trip low_alpha — letters / all chars incl spaces)
            (1, " ".join(chr(97 + i // 26) + chr(97 + i % 26) + "xy" for i in range(30))),
            (2, "a b"),  # too_short
            (3, " ".join(["x y"] * 20)),  # too_short? no: 40 toks; dup+top_ngram
            (4, " ".join(f"t{i}" for i in range(25)) + " 123 456 789 000 111 222 333 444 555 666 777 888 999 101 202 303 404 505 606 707 808 909 110 220 330"),  # digits -> low_alpha
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in quality_filter(
            docs, min_tokens=10, max_dup_word_frac=0.6, max_top_ngram_frac=0.3,
            min_alpha_frac=0.5,
        ).collect()
    }
    assert got[1]["kept"] and got[1]["reasons"] == ""
    assert not got[2]["kept"] and "too_short" in got[2]["reasons"]
    # doc 3: 40 tokens, only 2 distinct -> dup_word_frac 0.95; "x y" dominates
    assert not got[3]["kept"]
    assert "dup_words" in got[3]["reasons"] and "top_ngram" in got[3]["reasons"]
    # reasons are fixed-order comma-joined
    assert got[3]["reasons"] == "dup_words,top_ngram"
    assert not got[4]["kept"] and "low_alpha" in got[4]["reasons"]


def test_quality_filter_max_tokens(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(chr(97 + i // 26) + chr(97 + i % 26) + "qz" for i in range(50)))],
        "doc_id long, text string",
    )
    got = quality_filter(docs, min_tokens=1, max_tokens=10).collect()[0]
    assert not got["kept"] and got["reasons"] == "too_long"


def test_mixture_sample_deterministic_and_rate_accurate(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}", "web" if i % 2 else "wiki") for i in range(2000)],
        "doc_id long, text string, source string",
    )
    kept = mixture_sample(docs, {"wiki": 1.0, "web": 0.25})
    rows = kept.collect()
    # exact re-run determinism (no RNG state)
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in kept.collect()
    )
    by_src = {}
    for r in rows:
        by_src[r["source"]] = by_src.get(r["source"], 0) + 1
    assert by_src["wiki"] == 1000  # rate 1.0 keeps everything
    assert 150 < by_src["web"] < 350  # ~250 expected at rate 0.25
    # unknown sources dropped (default rate 0.0)
    docs2 = spark.createDataFrame(
        [(1, "t", "mystery")], "doc_id long, text string, source string"
    )
    assert mixture_sample(docs2, {"wiki": 1.0}).count() == 0


def test_mixture_sample_stable_under_repartition(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}", "s") for i in range(500)],
        "doc_id long, text string, source string",
    )
    a = {r["doc_id"] for r in mixture_sample(docs, {"s": 0.5}).collect()}
    b = {
        r["doc_id"]
        for r in mixture_sample(docs.repartition(17), {"s": 0.5}).collect()
    }
    assert a == b and 150 < len(a) < 350


def test_pack_sequences_hand_fixture(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (10 * (i + 1)))) for i in range(6)],
        "doc_id long, text string",
    )
    # single shard -> one global stream; doc i has 10*(i+1) tokens
    rows = sorted(
        pack_sequences(docs, seq_len=50, n_shards=1).collect(),
        key=lambda r: r["doc_id"],
    )
    offs, seqs = [r["start_off"] for r in rows], [r["seq_id"] for r in rows]
    # cumulative offsets of 10,20,30,40,50,60-token docs
    assert offs == [0, 10, 30, 60, 100, 150]
    assert seqs == [0, 0, 0, 1, 2, 3]
    assert all(r["shard"] == 0 for r in rows)


def test_pack_sequences_streams_are_contiguous_per_shard(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (1 + i % 7))) for i in range(300)],
        "doc_id long, text string",
    )
    rows = pack_sequences(docs, seq_len=32, n_shards=4).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in rs:
            assert r["start_off"] == off, f"gap in shard {shard}"
            assert r["seq_id"] == off // 32
            off += r["n_tokens"]


def test_new_curation_ops_no_python_in_plan(spark):
    docs = spark.createDataFrame(
        [(1, "a b c", "s")], "doc_id long, text string, source string"
    )
    for df in (
        repetition_stats(docs),
        mixture_sample(docs, {"s": 1.0}),
        pack_sequences(docs, 16, 2),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_substring_stats_keys_are_bigint(spark):
    """Scale guard: the shuffled window keys are 60-bit bigints, never the
    window strings themselves (string keys were the round-2 GC-outlier
    cause in the similarity suite)."""
    docs = spark.createDataFrame([(1, "a b c d e f g h i")], "doc_id long, text string")
    wh = window_hashes(docs, k=8)
    assert dict(wh.dtypes)["whash"] == "bigint"


# ---------------------------------------------------------------------------
# CCNet-style bigram perplexity (textstats.bigram_perplexity)
# ---------------------------------------------------------------------------


def _ppl_reference(texts, alpha=0.5):
    """Pure-python add-alpha bigram LM, mirroring the intended spec."""
    import math
    from collections import Counter

    pairs = {}
    for did, t in texts:
        ws = t.lower().split(" ")
        pairs[did] = [("<s>" if i == 0 else ws[i - 1], w) for i, w in enumerate(ws)]
    c12 = Counter(p for ps in pairs.values() for p in ps)
    c1 = Counter(p[0] for ps in pairs.values() for p in ps)
    vocab = len({p[1] for ps in pairs.values() for p in ps})
    out = {}
    for did, ps in pairs.items():
        lp = sum(math.log((c12[p] + alpha) / (c1[p[0]] + alpha * vocab)) for p in ps)
        out[did] = round(math.exp(-lp / len(ps)), 4)
    return out


def test_bigram_perplexity_matches_python_reference(spark):
    from knowledgegraphbuilder_spark.operators.textstats import bigram_perplexity

    texts = [
        ("d1", "the cat sat on the mat"),
        ("d2", "the cat sat on the cat"),
        ("d3", "zx qq vv zx qq"),          # off-distribution -> high ppl
        ("d4", "the cat sat on the mat"),  # exact repeat -> lowest ppl
    ]
    df = spark.createDataFrame(texts, "doc_id string, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["ppl"])
           for r in bigram_perplexity(df).collect()}
    want = _ppl_reference(texts)
    assert {k: v[1] for k, v in got.items()} == want
    assert got["d1"][0] == 6
    # repeated in-distribution text scores lower ppl than the noise doc
    assert got["d4"][1] < got["d3"][1]


def test_bigram_perplexity_is_repartition_stable(spark):
    from knowledgegraphbuilder_spark.operators.textstats import bigram_perplexity

    df = spark.createDataFrame(
        [("a", "x y x y"), ("b", "")], "doc_id string, text string"
    )
    out1 = sorted(bigram_perplexity(df).collect())
    out2 = sorted(bigram_perplexity(df.repartition(7)).collect())
    assert out1 == out2  # shuffle order must not leak into the float fold


def test_temperature_sample_rebalances_rare_strata(spark):
    from knowledgegraphbuilder_spark.operators.curation import temperature_sample

    # 90/10 skew: alpha=0.3 must give the rare stratum a higher keep-rate
    rows = [(i, "en" if i < 90 else "fr", "x") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    rates = {
        r["lang"]: r["rate"]
        for r in temperature_sample(docs, alpha=0.3, target_frac=0.5)
        .select("lang", "rate").distinct().collect()
    }
    assert rates["fr"] > rates["en"]
    # expected closed form: rate_s = 0.5 * N * n_s^0.3 / (sum_w * n_s)
    sw = 90 ** 0.3 + 10 ** 0.3
    assert rates["en"] == round(min(1.0, 0.5 * 100 * 90 ** 0.3 / (sw * 90)), 6)
    assert rates["fr"] == round(min(1.0, 0.5 * 100 * 10 ** 0.3 / (sw * 10)), 6)
    # alpha=1 is a no-op rebalance: every stratum keeps target_frac
    flat = {
        r["rate"]
        for r in temperature_sample(docs, alpha=1.0, target_frac=0.5)
        .select("rate").distinct().collect()
    }
    assert flat == {0.5}


def test_temperature_sample_repartition_stable(spark):
    from knowledgegraphbuilder_spark.operators.curation import temperature_sample

    rows = [(i, "en" if i % 4 else "de", f"doc {i}") for i in range(80)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    a = sorted(r["doc_id"] for r in temperature_sample(docs).collect())
    b = sorted(
        r["doc_id"] for r in temperature_sample(docs.repartition(11)).collect()
    )
    assert a == b and len(a) > 0


def test_substring_rewrite_hand_checked(spark):
    from knowledgegraphbuilder_spark.operators.curation import substring_dedup_rewrite

    # doc 1 and doc 2 share the 4-token window "a b c d"; doc 1 is the
    # canonical (first) occurrence, so doc 2 loses exactly those 4 tokens
    docs = spark.createDataFrame(
        [(1, "a b c d x y"), (2, "p a b c d q"), (3, "u v w z")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in substring_dedup_rewrite(docs, k=4).collect()}
    assert out[1]["clean_text"] == "a b c d x y" and out[1]["n_removed"] == 0
    assert out[2]["clean_text"] == "p q" and out[2]["n_removed"] == 4
    assert out[3]["clean_text"] == "u v w z" and out[3]["n_removed"] == 0
    assert out[2]["n_tokens"] == 6


def test_substring_rewrite_self_repetition_and_overlap(spark):
    from knowledgegraphbuilder_spark.operators.curation import substring_dedup_rewrite

    # "a b a b a b": windows(k=2 tokens x2... use k=2): "a b","b a","a b",
    # "b a","a b" -> later occurrences removed; overlapping spans union
    docs = spark.createDataFrame([(1, "a b a b a b")], "doc_id long, text string")
    row = substring_dedup_rewrite(docs, k=2).collect()[0]
    # canonical "a b"@1 and "b a"@2 survive; every position >= 3 is covered
    assert row["clean_text"] == "a b" and row["n_removed"] == 4


def test_substring_rewrite_short_docs_untouched(spark):
    from knowledgegraphbuilder_spark.operators.curation import substring_dedup_rewrite

    docs = spark.createDataFrame(
        [(1, "only three tokens"), (2, "only three tokens")],
        "doc_id long, text string",
    )
    # k=8 > doc length: no windows, both docs pass through even though they
    # are exact duplicates (that's exact_duplicates' job, not this one's)
    rows = substring_dedup_rewrite(docs, k=8).collect()
    assert all(r["clean_text"] == "only three tokens" and r["n_removed"] == 0 for r in rows)


def test_substring_rewrite_repartition_stable(spark):
    from knowledgegraphbuilder_spark.operators.curation import substring_dedup_rewrite

    rows = [(i, f"tok{i % 5} alpha beta gamma delta tok{i % 3} epsilon zeta")
            for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, substring_dedup_rewrite(docs, k=3).collect()))
    b = sorted(map(tuple, substring_dedup_rewrite(docs.repartition(9), k=3).collect()))
    assert a == b


def test_per_group_quantile_filter_hand_checked(spark):
    from knowledgegraphbuilder_spark.operators.curation import (
        per_group_quantile_filter,
    )

    # en lengths 8..15 share one HDR bucket-range; de lengths 100..1500
    rows = (
        [(i, "en", 8 + i) for i in range(8)]
        + [(100 + i, "de", 100 * (i + 1)) for i in range(15)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    out = per_group_quantile_filter(docs, q=0.5)
    got = {r["lang"]: r["threshold"] for r in out.select("lang", "threshold").distinct().collect()}
    # thresholds are per-group HDR lower bounds: en's median-ish cutoff is
    # far below de's — a global cutoff would keep zero en docs
    assert got["en"] < got["de"]
    kept = out.groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in kept}
    assert counts["en"] > 0 and counts["de"] > 0
    # every kept row respects its own group's threshold
    assert out.filter(F.col("v") < F.col("threshold")).count() == 0


def test_per_group_quantile_filter_exact_on_powers_of_two(spark):
    from knowledgegraphbuilder_spark.operators.curation import (
        per_group_quantile_filter,
    )

    # powers of two are exact HDR bucket lower bounds: with values 1..8
    # (n=8, ceil(.5*8)=4) the threshold is exactly 4 and keeps {4..8}
    docs = spark.createDataFrame(
        [(i, "x", 2 ** (i % 8)) for i in range(8)],
        "doc_id long, lang string, n_chars long",
    )
    out = per_group_quantile_filter(docs, q=0.5).collect()
    assert len(out) > 0
    thr = out[0]["threshold"]
    assert all(r["v"] >= thr for r in out)


def test_per_group_quantile_filter_null_and_zero_dropped(spark):
    from knowledgegraphbuilder_spark.operators.curation import (
        per_group_quantile_filter,
    )

    docs = spark.createDataFrame(
        [(1, "en", None), (2, "en", 0), (3, "en", 10), (4, "en", 20)],
        "doc_id long, lang string, n_chars long",
    )
    out = per_group_quantile_filter(docs, q=0.5).collect()
    assert {r["doc_id"] for r in out} <= {3, 4} and len(out) >= 1
