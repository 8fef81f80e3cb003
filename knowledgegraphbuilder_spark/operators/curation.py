"""Corpus-curation operators for training-data pipelines: exact-substring
duplication stats, benchmark decontamination, and PII detection/redaction.

These extend the dedup suite (operators/dedup.py) with the three curation
passes a pre-training corpus goes through before a model sees it:

- ``substring_dup_stats``: per-document fraction of k-token windows that also
  occur in some OTHER document — the windowed form of exact-substring dedup
  (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
  Better"; suffix arrays don't distribute, rolling k-token window hashes do).
- ``decontaminate``: n-gram-overlap test-set decontamination — flag every
  training doc sharing any k-token window with a (small, broadcastable) eval
  set, the standard "13-gram overlap" methodology of GPT-3/PaLM appendix
  dedup sections.
- ``pii_stats``: regex PII detection + redaction (emails, IPv4, 16-digit
  card-like numbers) as native ``regexp_count``/``regexp_replace`` columns.

Scale notes (100 TB): window hashes are 60-bit sha256 prefixes (bigint keys,
never strings) so the groupBy/join shuffles move 8-byte keys; the per-window
doc-count aggregate is map-side combinable; ``decontaminate`` broadcasts the
eval-set hash table (eval sets are ~1e4-1e6 windows — megabytes) so the
training corpus is scanned exactly once with no shuffle at all; PII regexes
are whole-stage-codegen'd JVM expressions, zero Python. The window explode
multiplies rows by ~n_tokens, but each exploded row is (bigint, bigint) —
16 bytes — and collapses in the partial aggregate before any shuffle.

All hashes are sha256-derived so the DuckDB oracle replays them exactly
(see __spark_entry__.oracle_sql: substring/contamination/PII entries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 60-bit portable hash (15 hex chars of sha256): bit-identical in DuckDB as
# ('0x' || substr(sha256(s), 1, 15))::BIGINT, and small enough to never hit
# BIGINT sign issues (63-bit cap — see dedup.py simhash notes).
_H60 = "cast(conv(substring(sha2({s}, 256), 1, 15), 16, 10) as bigint)"


def window_hashes(
    docs: DataFrame, k: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, whash): the DISTINCT 60-bit hashes of every k-token window
    (whitespace tokens, space-joined) per document. Docs shorter than k
    tokens contribute no windows."""
    wins = (
        f"case when size(split({text_col}, ' ')) >= {k} then "
        f"transform(sequence(1, size(split({text_col}, ' ')) - {k} + 1), "
        f"i -> concat_ws(' ', slice(split({text_col}, ' '), i, {k}))) "
        f"else array() end"
    )
    return (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.explode(F.expr(wins)).alias("w"),
        )
        .select("doc_id", F.expr(_H60.format(s="w")).alias("whash"))
        .distinct()
    )


def substring_dup_stats(
    docs: DataFrame, k: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document exact-substring duplication stats: of this doc's distinct
    k-token windows, how many also occur in at least one OTHER document.

    Output: (doc_id, n_windows, n_dup_windows, dup_frac[4dp]) — docs with
    zero windows (shorter than k tokens) report 0/0/0.0.

    Two shuffles total, both on bigint keys: the per-window distinct-doc
    count (map-side combinable) and the join back to per-doc windows. The
    window->doc-count table is NOT broadcast: at corpus scale it is the same
    order as the corpus itself."""
    wh = window_hashes(docs, k, text_col, id_col)
    counts = wh.groupBy("whash").agg(F.count("*").alias("n_docs"))
    per_doc = (
        wh.join(counts, "whash")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0)).alias("n_dup_windows"),
        )
    )
    base = docs.select(F.col(id_col).cast("long").alias("doc_id"))
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias("n_dup_windows"),
            F.round(
                F.coalesce(F.col("n_dup_windows") / F.col("n_windows"), F.lit(0.0)), 4
            ).alias("dup_frac"),
        )
    )


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: per training doc, the number of distinct
    k-token windows it shares with ANY eval document, and a contaminated
    flag (n_shared > 0).

    Output: (doc_id, n_shared, contaminated).

    The eval windows are deduped then BROADCAST — the training corpus is
    scanned once; no shuffle of training data at all (the per-doc aggregate
    re-uses the scan partitioning via partial aggregation). Eval sets are
    small by construction; a >8 GiB eval side should go through
    ``substring_dup_stats``-style shuffle join instead."""
    ev = window_hashes(eval_docs, k, text_col, id_col).select("whash").distinct()
    tw = window_hashes(train, k, text_col, id_col)
    shared = (
        tw.join(F.broadcast(ev), "whash")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    base = train.select(F.col(id_col).cast("long").alias("doc_id"))
    return base.join(shared, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
        (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
    )


def repetition_stats(
    docs: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    Table A1): per document, the fraction of word occurrences that are
    repeats of an earlier word, and the fraction of characters covered by
    the single most frequent word n-gram. Both are standard quality-filter
    inputs for web corpora (C4/Gopher/RefinedWeb reject docs above
    thresholds like top-2gram-frac > 0.2).

    Output: (doc_id, n_tokens, dup_word_frac[4dp], top_ngram, top_ngram_frac[4dp]).
    ``top_ngram_frac`` = count(top n-gram) * len(top n-gram) / len(text);
    ties broken by lexicographically-largest n-gram so the result is
    deterministic and replayable in SQL. Docs with fewer than n tokens get
    top_ngram='' and frac 0.0.

    Scale: the n-gram explode collapses in a map-side-combinable
    (doc_id, gram) count; the per-doc argmax is one shuffle keyed by doc_id
    (row_number window over the counted grams — already tiny per doc)."""
    from pyspark.sql import Window

    toks = f"split({text_col}, ' ')"
    grams = (
        f"case when size({toks}) >= {n} then "
        f"transform(sequence(1, size({toks}) - {n} + 1), "
        f"i -> concat_ws(' ', slice({toks}, i, {n}))) "
        f"else array() end"
    )
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.expr(f"size({toks})").cast("long").alias("n_tokens"),
        F.expr(f"size(array_distinct({toks}))").cast("long").alias("n_distinct"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.expr(grams).alias("grams"),
    )
    gcnt = (
        base.select("doc_id", F.explode("grams").alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.desc("gram"))
    top = (
        gcnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("gram").alias("top_ngram"), "cnt")
    )
    return (
        base.drop("grams")
        .join(top, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.round(1.0 - F.col("n_distinct") / F.col("n_tokens"), 4).alias(
                "dup_word_frac"
            ),
            F.coalesce("top_ngram", F.lit("")).alias("top_ngram"),
            F.round(
                F.coalesce(
                    F.col("cnt") * F.length("top_ngram") / F.col("n_chars"), F.lit(0.0)
                ),
                4,
            ).alias("top_ngram_frac"),
        )
    )


def quality_filter(
    docs: DataFrame,
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    max_dup_word_frac: float = 0.6,
    max_top_ngram_frac: float = 0.1,
    min_alpha_frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4/Gopher-style composite quality gate: every document is scored
    against the standard reject rules (too short / too long / too many
    repeated words / one n-gram dominating / too few alphabetic chars) and
    labeled with WHICH rules it failed — the keep/drop decision plus the
    reject reasons a corpus report aggregates per source.

    Output: (doc_id, n_tokens, kept, reasons) where ``reasons`` is the
    comma-joined, fixed-order list of failed rule names ('' when kept).
    Reuses ``repetition_stats`` for the repetition signals, so the cost is
    that one gram aggregate; the threshold checks are pure codegen
    expressions on top."""
    alpha_frac = (
        F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", ""))
        / F.greatest(F.length(text_col), F.lit(1))
    ).alias("alpha_frac")
    rep = repetition_stats(docs, n=2, text_col=text_col, id_col=id_col)
    base = docs.select(F.col(id_col).cast("long").alias("doc_id"), alpha_frac)
    joined = rep.join(base, "doc_id")
    flags = [
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short")),
        F.when(F.col("n_tokens") > max_tokens, F.lit("too_long")),
        F.when(F.col("dup_word_frac") > max_dup_word_frac, F.lit("dup_words")),
        F.when(F.col("top_ngram_frac") > max_top_ngram_frac, F.lit("top_ngram")),
        F.when(F.col("alpha_frac") < min_alpha_frac, F.lit("low_alpha")),
    ]
    reasons = F.array_join(F.filter(F.array(*flags), lambda x: x.isNotNull()), ",")
    return joined.select(
        "doc_id",
        "n_tokens",
        (F.length(reasons) == 0).alias("kept"),
        reasons.alias("reasons"),
    )


def mixture_sample(
    docs: DataFrame,
    rates: dict,
    salt: str = "mix1",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted mixture sampling: keep each document with its
    source's target rate, decided by a salted content hash — the standard
    way a pre-training mixture (e.g. 100% wiki, 30% web, 5% crawl-dregs) is
    drawn reproducibly across pipeline re-runs and cluster sizes. Sources
    absent from ``rates`` default to rate 0.0 (dropped).

    Output: the kept rows' (doc_id, source) plus the sampling key
    ``mix_u`` in [0,1) — a pure per-row filter: one scan, zero shuffle,
    no RNG state (sha256(salt || doc_id) is stable under repartitioning,
    unlike ``df.sample`` whose draw depends on partition layout)."""
    u = (
        F.expr(_H60.format(s=f"concat('{salt}', cast(doc_id as string))"))
        % F.lit(1_000_000)
    ) / F.lit(1_000_000.0)
    rate = F.lit(0.0)
    for src, r in sorted(rates.items()):
        rate = F.when(F.col(source_col) == src, F.lit(float(r))).otherwise(rate)
    return (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(source_col).alias("source"),
            F.round(u, 6).alias("mix_u"),
            rate.alias("_rate"),
        )
        .filter(F.col("mix_u") < F.col("_rate"))
        .drop("_rate")
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 512,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    cost_expr: str | None = None,
) -> DataFrame:
    """Sequence packing for training: concatenate documents in a
    deterministic order and slice the token stream into fixed ``seq_len``
    windows — each doc is assigned the offset where it lands in the stream
    and the training-sequence id containing its first token. This is the
    "concat then chunk" packing every pre-training data loader performs,
    lifted into the engine so shard files can be written pre-packed.

    Packing is per-shard (shard = sha256(doc_id) % n_shards): a global
    concatenation order would serialize the whole corpus through one
    window partition, while per-shard streams pack independently and in
    parallel — on a cluster n_shards is set to O(total_tokens / shard
    budget) and each shard becomes one output file. Within a shard the
    order is doc_id (deterministic, replayable).

    ``cost_expr`` overrides the whitespace token count with any integer SQL
    cost — e.g. an interleaved document's tokens + image patches + audio
    frames (see q_mm_pack) — packing logic unchanged.

    Output: (shard, doc_id, n_tokens, start_off, seq_id) where
    start_off = running token offset within the shard stream and
    seq_id = floor(start_off / seq_len). One shuffle (by shard) feeding a
    running-sum window; no Python."""
    from pyspark.sql import Window

    base = docs.select(
        F.expr(_H60.format(s=f"cast({id_col} as string)")).alias("_h"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.expr(cost_expr or f"size(split({text_col}, ' '))")
        .cast("long").alias("n_tokens"),
    ).select((F.col("_h") % n_shards).cast("int").alias("shard"), "doc_id", "n_tokens")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return base.select(
        "shard",
        "doc_id",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_off"),
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / seq_len)
        .cast("long")
        .alias("seq_id"),
    )


# PII patterns: deliberately restricted to syntax that Java regex (Spark) and
# RE2 (DuckDB) compile identically — no backrefs, no lookaround.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_CARD = r"\b\d{16}\b"


def pii_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII detection + redaction: counts per category and the redacted text
    (emails -> <EMAIL>, IPv4 -> <IP>, 16-digit numbers -> <CARD>; email
    first so an address's digits can't be half-eaten by the card pattern).

    Output: (doc_id, n_emails, n_ipv4, n_cards, redacted).
    Pure JVM regexp expressions — codegen'd, no Python, no shuffle."""
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), PII_EMAIL, "<EMAIL>"),
            PII_IPV4,
            "<IP>",
        ),
        PII_CARD,
        "<CARD>",
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.regexp_count(F.col(text_col), F.lit(PII_EMAIL)).cast("int").alias("n_emails"),
        F.regexp_count(F.col(text_col), F.lit(PII_IPV4)).cast("int").alias("n_ipv4"),
        F.regexp_count(F.col(text_col), F.lit(PII_CARD)).cast("int").alias("n_cards"),
        red.alias("redacted"),
    )


def stratified_split(
    docs: DataFrame,
    ratios: tuple[int, int, int] = (80, 10, 10),
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = sha256(salt, id)
    % 100, carved by cumulative ``ratios``. Content-addressed, so the split
    is stable under re-partitioning, re-ingestion order, and corpus growth
    (a doc's assignment never changes when other docs arrive) — the property
    random splits lose at 100 TB where "shuffle then slice" is both
    non-reproducible and a full sort. Pure projection: no shuffle at all
    until a downstream consumer aggregates.

    Output: (id_col, strata_col, split). The per-stratum proportions follow
    the hash uniformity (law of large numbers per stratum, no balancing
    pass); exact per-stratum balance would need a count + windowed slice,
    documented here as the trade-off.
    """
    t0, t1, _ = ratios
    assert sum(ratios) == 100, "ratios must sum to 100"
    b = F.expr(_H60.format(s=f"concat('{salt}', ',', cast({id_col} as string))")) % 100
    return docs.select(
        F.col(id_col).cast("string").alias(id_col),
        F.col(strata_col),
        F.when(b < t0, "train").when(b < t0 + t1, "val").otherwise("test").alias("split"),
    )


def dsir_weights(
    docs: DataFrame,
    target_lang: str = "en",
    n_buckets: int = 64,
    alpha: float = 0.5,
    sample_k: int = 50,
    salt: str = "dsir",
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling"): score every raw document by how much
    more likely its hashed n-gram features are under a target-domain
    bag-of-features LM than under the raw-corpus LM, then resample by weight
    with the Gumbel top-k trick. The target distribution here is the corpus
    slice ``lang == target_lang`` (the in-domain pool); the raw distribution
    is the whole corpus — exactly the paper's setup with the sandbox corpus
    standing in for (Wikipedia+books, Pile-CC).

    Features are the paper's hashed unigrams + bigrams of whitespace tokens,
    bucketed by a 60-bit sha256 prefix mod ``n_buckets`` — portable, so the
    DuckDB oracle replays bucket assignment (and therefore every weight and
    the exact resampled set) value-exactly. Importance log-weight of a doc =
    sum over its feature occurrences of ln(p_b/q_b) with add-``alpha``
    smoothing; the Gumbel key = logw - ln(-ln(u)) with u a salted sha256 draw
    per doc (sampling without replacement ∝ weight, deterministic across
    re-runs and cluster sizes — no RNG state, like mixture_sample).

    Scale shape (100 TB): feature explode collapses into TWO map-side
    combinable count aggregates over ``n_buckets`` keys (the bucket LMs are
    KB-sized however big the corpus is) that broadcast back onto the per-doc
    (doc, bucket) partial counts — one shuffle on doc_id, no all-corpus sort;
    the top-k selection is NOT a global window (a single-partition
    row_number would serialize the corpus): orderBy().limit(k) is Spark's
    TakeOrdered (per-partition top-k, merge k·P rows), whose boundary row
    broadcasts back as a pure filter predicate. Per-doc fold runs
    over a bucket-sorted array so float summation order is deterministic
    (same trick as textstats.bigram_perplexity). Single-token and empty docs
    contribute unigram features only (the sequence(1, size-1) bigram trap is
    CASE-guarded, see ADVICE r3 on pmi_collocations).

    Output: (doc_id, n_feats, log_weight, gumbel_key, sampled) for EVERY
    non-null-text doc — sampled marks the Gumbel top-``sample_k``; keys are
    rounded 4dp before ranking so both engines rank identical values, ties
    broken on doc_id.
    """
    B, a = int(n_buckets), float(alpha)
    w = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        (F.col(lang_col) == target_lang).alias("is_t"),
        F.split(F.lower(F.col(text_col)), " ").alias("ws"),
    ).filter(F.col(text_col).isNotNull())
    feats = w.select(
        "doc_id",
        "is_t",
        F.explode(
            F.expr(
                "concat(ws, case when size(ws) < 2 then array() else "
                "transform(sequence(1, size(ws) - 1), "
                "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1))) end)"
            )
        ).alias("feat"),
    ).select(
        "doc_id",
        "is_t",
        (F.expr(_H60.format(s="feat")) % B).cast("int").alias("bucket"),
    )
    ct = feats.filter("is_t").groupBy("bucket").agg(F.count("*").alias("ctc"))
    cr = feats.groupBy("bucket").agg(F.count("*").alias("crc"))
    probs = (
        cr.join(ct, "bucket", "left")
        .select("bucket", F.coalesce("ctc", F.lit(0)).alias("ctc"), "crc")
    )
    tot = probs.agg(
        F.sum("ctc").cast("double").alias("t_tot"),
        F.sum("crc").cast("double").alias("r_tot"),
    )
    perdoc = feats.groupBy("doc_id", "bucket").agg(F.count("*").alias("n_occ"))
    terms = (
        perdoc.join(F.broadcast(probs), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("n_occ").cast("long").alias("n_feats"),
            F.array_sort(
                F.collect_list(F.struct("bucket", "n_occ", "ctc", "crc"))
            ).alias("ts"),
        )
    )
    fold = (
        f"aggregate(ts, 0.0d, (acc, t) -> acc + t.n_occ * ("
        f"ln((t.ctc + {a}d) / (t_tot + {a}d * {B})) - "
        f"ln((t.crc + {a}d) / (r_tot + {a}d * {B}))))"
    )
    u = (
        (F.expr(_H60.format(s=f"concat('{salt}', cast(doc_id as string))"))
         % F.lit(1_000_000)).cast("double") + F.lit(0.5)
    ) / F.lit(1_000_000.0)
    scored = terms.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "n_feats",
        F.round(F.expr(fold), 4).alias("log_weight"),
        F.round(F.expr(fold) - F.log(-F.log(u)), 4).alias("gumbel_key"),
    )
    # Gumbel top-k boundary: the k-th row under (key desc, doc_id asc) is
    # the (smallest key, largest doc_id at that key) of the TakeOrdered set.
    boundary = (
        scored.orderBy(F.desc("gumbel_key"), F.col("doc_id"))
        .limit(sample_k)
        .agg(
            F.min_by(
                F.struct(
                    F.col("gumbel_key").alias("bk"), F.col("doc_id").alias("bdoc")
                ),
                F.struct(F.col("gumbel_key"), (-F.col("doc_id")).alias("nd")),
            ).alias("b")
        )
        .select(F.col("b.bk").alias("bk"), F.col("b.bdoc").alias("bdoc"))
    )
    return scored.crossJoin(F.broadcast(boundary)).select(
        "doc_id",
        "n_feats",
        "log_weight",
        "gumbel_key",
        (
            (F.col("gumbel_key") > F.col("bk"))
            | ((F.col("gumbel_key") == F.col("bk")) & (F.col("doc_id") <= F.col("bdoc")))
        ).alias("sampled"),
    )


def temperature_sample(
    docs: DataFrame,
    alpha: float = 0.3,
    target_frac: float = 0.5,
    salt: str = "temp1",
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based mixture rebalancing (the multilingual-pretraining
    standard, XLM-R / mBERT: sample stratum s with probability proportional
    to n_s^alpha, alpha<1 upweighting rare strata): per-stratum keep-rate
    r_s = min(1, target_frac * N * n_s^alpha / (sum_t n_t^alpha * n_s)),
    so the kept corpus totals ~target_frac * N docs distributed by the
    temperature-flattened stratum shares. alpha=1 degenerates to uniform
    r_s = target_frac (no rebalancing); alpha=0 equalizes stratum sizes.

    Scale shape: ONE map-side-combinable count per stratum (a KB-sized
    table however big the corpus), rates derived on it and broadcast back —
    then a pure per-row filter with the same salted-sha256 draw as
    mixture_sample: zero shuffle on the corpus, no RNG state, stable under
    repartitioning and corpus re-order. Rates and draws are rounded 6dp on
    BOTH sides of the comparison so the DuckDB oracle replays the kept set
    exactly (pow() ULP differences cannot flip an unrounded boundary).

    Output: kept rows' (doc_id, strata_col, mix_u, rate).
    """
    a = float(alpha)
    counts = docs.groupBy(strata_col).agg(F.count("*").alias("n_s"))
    tot = counts.agg(
        F.sum("n_s").cast("double").alias("n_total"),
        F.sum(F.pow(F.col("n_s").cast("double"), a)).alias("sum_w"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        strata_col,
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(float(target_frac)) * F.col("n_total")
                * F.pow(F.col("n_s").cast("double"), a)
                / (F.col("sum_w") * F.col("n_s")),
            ),
            6,
        ).alias("rate"),
    )
    u = (
        F.expr(_H60.format(s=f"concat('{salt}', cast({id_col} as string))"))
        % F.lit(1_000_000)
    ) / F.lit(1_000_000.0)
    return (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(strata_col),
            F.round(u, 6).alias("mix_u"),
        )
        .join(F.broadcast(rates), strata_col)
        .filter(F.col("mix_u") < F.col("rate"))
        .select("doc_id", strata_col, "mix_u", "rate")
    )


def substring_dedup_rewrite(
    docs: DataFrame, k: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-substring deduplication that actually REWRITES the corpus (the
    removal step of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better" — substring_dup_stats above is its measurement
    side): every k-token window that occurs more than once corpus-wide keeps
    only its globally FIRST occurrence (min (doc_id, pos)); all tokens
    covered by any later occurrence are cut, and each document is
    re-assembled from its surviving tokens in position order.

    Deterministic spec: windows are ALL positions (not per-doc distinct),
    1-indexed over single-space tokens; within-doc repeats count as
    duplicates (self-repetition is removed too); overlapping removal spans
    union; a document shorter than k tokens is untouched.

    Scale shape: two shuffles on the 60-bit window hash (count + canonical
    min(struct), both map-side combinable; no window function) and one on
    doc_id for the covered-position anti-join + reassembly. Reassembly
    memory is bounded by single-document length (collect_list per doc).

    Output: (doc_id, clean_text, n_tokens, n_removed).
    """
    ws = f"split(coalesce({text_col}, ''), ' ')"
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.expr(f"size({ws})").alias("n_tokens"),
        F.expr(
            f"case when size({ws}) >= {k} then "
            f"transform(sequence(1, size({ws}) - {k} + 1), "
            f"i -> struct(i as pos, "
            + _H60.format(s=f"concat_ws(' ', slice({ws}, i, {k}))")
            + " as whash)) else array() end"
        ).alias("wins"),
        F.expr(ws).alias("toks"),
    ).localCheckpoint(eager=True)
    occ = base.select("doc_id", F.explode("wins").alias("w")).select(
        "doc_id", F.col("w.pos").alias("pos"), F.col("w.whash").alias("whash")
    )
    canon = occ.groupBy("whash").agg(
        F.count("*").alias("n_occ"),
        F.min(F.struct("doc_id", "pos")).alias("first"),
    )
    removed = (
        occ.join(canon, "whash")
        .filter(
            (F.col("n_occ") >= 2)
            & ~(
                (F.col("doc_id") == F.col("first.doc_id"))
                & (F.col("pos") == F.col("first.pos"))
            )
        )
        .select("doc_id", F.explode(F.sequence("pos", F.col("pos") + (k - 1))).alias("p"))
        .distinct()
    )
    toks = base.select(
        "doc_id", F.posexplode("toks").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
    kept = toks.join(removed, ["doc_id", "p"], "left_anti")
    clean = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.expr("transform(array_sort(collect_list(struct(p, tok))), x -> x.tok)"),
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    return base.join(clean, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        "n_tokens",
        (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0))).cast("long").alias("n_removed"),
    )


def per_group_quantile_filter(
    docs: DataFrame,
    group_col: str = "lang",
    value_expr: str = "n_chars",
    q: float = 0.5,
    id_col: str = "doc_id",
    sub_bits: int = 4,
) -> DataFrame:
    """Per-stratum ADAPTIVE quantile thresholding: keep each group's rows at
    or above that group's q-quantile of ``value_expr`` — "the longest half
    per language", the curation move a single global cutoff gets wrong for
    every language at once (a p50 threshold fit on English discards most of
    a terser language). The quantile is the HDR-histogram estimate
    (sketches.py:hdr_histogram discipline: integer bit_length buckets —
    exact in both engines, no transcendental on a bucket boundary), so the
    whole operator replays in SQL.

    Scale shape: the per-group sketch is ONE map-side-combinable groupBy
    (corpus never shuffled on values); the cumulative walk runs over sketch
    rows (<= ~64 * 2^sub_bits per group), thresholds broadcast back onto a
    pure filter. Rows with NULL or non-positive values are dropped (the
    sketch is defined on positive integers).

    Output: (doc_id, group_col, v, threshold) for kept rows.
    """
    from pyspark.sql import Window

    b = "length(bin(v))"
    shift = f"greatest({b} - {1 + sub_bits}, 0)"
    src = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(group_col).alias("g"),
        F.expr(f"cast({value_expr} as bigint)").alias("v"),
    ).filter(F.col("v").isNotNull() & (F.col("v") > 0))
    sk = (
        src.select(
            "g",
            F.expr(f"cast({b} as int)").alias("b"),
            F.expr(f"shiftright(v, cast({shift} as int))").alias("hi"),
        )
        .groupBy("g", "b", "hi")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    cum = sk.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.partitionBy("g").orderBy("b", "hi")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    n = sk.groupBy("g").agg(F.sum("cnt").alias("n"))
    lo = f"shiftleft(hi, cast(greatest(b - {1 + sub_bits}, 0) as int))"
    thr = (
        cum.join(n, "g")
        .filter(F.col("cum") >= F.ceil(F.lit(float(q)) * F.col("n")))
        .groupBy("g")
        .agg(F.min_by(F.expr(lo), F.struct("b", "hi")).alias("t"))
        .select("g", F.col("t").cast("long").alias("threshold"))
    )
    return (
        src.join(F.broadcast(thr), "g")
        .filter(F.col("v") >= F.col("threshold"))
        .select("doc_id", F.col("g").alias(group_col), "v", "threshold")
    )


def weighted_reservoir_sample(
    docs: DataFrame,
    k: int = 5,
    weight_sql: str = "greatest(1, least(32, floor(n_chars / 100)))",
    group_col: str = "lang",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic weighted reservoir sampling without replacement, k per
    group: each row gets ``w`` integer tickets (``weight_sql``, capped by the
    caller), every ticket an independent sha256 draw, and the row's sort key
    is its MINIMUM ticket hash — P(row i outranks row j) = w_i/(w_i+w_j),
    the ticket-replication equivalent of Efraimidis-Spirakis A-ES weighted
    sampling, with ZERO floating point (no -ln(u)/w key, so no pow/log ULP
    divergence between engines; the same derandomization trick node2vec's
    biased walks use, graphstats.py:biased_walks).

    Scale shape: the min-over-tickets is a pure codegen array expression
    (transform over sequence(1, w), w capped) — per-row O(w) JVM work, no
    explode, no shuffle. The per-group top-k is TWO-PHASE to defuse hot
    groups: a local top-k inside each of ``n_buckets`` deterministic
    id-derived buckets (window over (group, bucket) — uniform partitions),
    then the global top-k over the surviving <= n_buckets * k rows per
    group. The global top-k set is provably a subset of the union of
    bucket-local top-k sets, so the two-phase result is exact; a one-window
    version would sort each group's entire corpus on one reducer.

    Output: (group, doc_id, w, tkey, rk) for the k winners per group,
    rk = 1-based rank by (tkey, doc_id).
    """
    w = F.expr(weight_sql).cast("long")
    key = (
        "array_min(transform(sequence(1, cast(w as int)), "
        f"t -> sha2(concat(cast({id_col} as string), ':', "
        "cast(t as string)), 256)))"
    )
    base = (
        docs.select(
            F.col(group_col),
            F.col(id_col).cast("long").alias("doc_id"),
            w.alias("w"),
        )
        .withColumn("tkey", F.expr(key))
    )
    from pyspark.sql import Window

    wloc = Window.partitionBy(group_col, "bkt").orderBy("tkey", "doc_id")
    wglob = Window.partitionBy(group_col).orderBy("tkey", "doc_id")
    local = (
        base.withColumn("bkt", F.col("doc_id") % n_buckets)
        .withColumn("lrk", F.row_number().over(wloc))
        .filter(F.col("lrk") <= k)
    )
    return (
        local.withColumn("rk", F.row_number().over(wglob).cast("long"))
        .filter(F.col("rk") <= k)
        .select(group_col, "doc_id", "w", "tkey", "rk")
    )


def inference_batches(
    docs: DataFrame,
    max_tokens: int = 2048,
    bucket_width: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    cost_expr: str | None = None,
) -> DataFrame:
    """Length-bucketed batch assembly for model inference — the batching
    stage in front of any Arrow-batched NER / relation-extraction /
    embedding UDF (the north-star pipeline's hot path). Padding a batch
    to its longest member costs (batch_size * max_len − sum_len) wasted
    tokens; grouping near-equal-length documents into the same batch is
    the standard fix (every serving stack's "length bucketing").

    Docs land in buckets of ``bucket_width`` tokens; within a bucket the
    next-fit rule packs by running token sum: batch = floor(cum_before /
    max_tokens) — deterministic (ordered by token count then doc id),
    replayable in plain SQL, and each batch's token payload is bounded by
    max_tokens + one document.

    Plan: the running sum is a per-bucket window — ONE shuffle keyed by
    bucket; buckets are the parallelism unit, so thousands of buckets
    spread a 10^12-doc corpus evenly (the skewed-bucket worst case is the
    modal length, bounded by bucket granularity). The per-batch rollup is
    a map-side-combinable aggregate on (bucket, batch).

    Output per batch: (bucket, batch, n_docs, tokens, padded_tokens,
    waste_pct) where padded_tokens = n_docs * max token count in batch
    (every member pads to the longest) and waste_pct is rounded to 4dp.
    """
    from pyspark.sql import Window

    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.expr(cost_expr or f"size(split({text_col}, ' '))")
        .cast("long").alias("n_tokens"),
    ).withColumn(
        "bucket", F.floor(F.col("n_tokens") / bucket_width).cast("int")
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("n_tokens", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    assigned = base.select(
        "bucket",
        "doc_id",
        "n_tokens",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / max_tokens
        ).cast("long").alias("batch"),
    )
    return (
        assigned.groupBy("bucket", "batch")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("tokens"),
            (F.count("*") * F.max("n_tokens")).cast("long")
            .alias("padded_tokens"),
        )
        .withColumn(
            "waste_pct",
            F.round(
                (F.col("padded_tokens") - F.col("tokens"))
                * F.lit(10000.0)
                / F.expr("nullif(cast(padded_tokens as double), 0.0d)")
                / 100.0,
                4,
            ),
        )
        .orderBy("bucket", "batch")
    )


def pack_efficiency(packed: DataFrame, seq_len: int) -> DataFrame:
    """Packing-efficiency report over a ``pack_sequences`` output: per
    shard, how many fixed-length training sequences the token stream
    fills, how many pad tokens the final partial sequence wastes, and the
    fill ratio — the number a data-loader design reads before choosing
    seq_len and shard count (a shard whose fill ratio sags is wasting
    accelerator steps on padding).

    Exactness: total tokens and the ceil-divide sequence count are exact
    integers; fill ratio is one divide. Scale shape: one
    map-side-combinable aggregate over the packed table, output is
    shard-cardinality-sized.
    """
    return (
        packed.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .selectExpr(
            "shard",
            "n_docs",
            "total_tokens",
            f"cast((total_tokens + {seq_len} - 1) div {seq_len} as bigint)"
            " as n_seqs",
            f"cast((total_tokens + {seq_len} - 1) div {seq_len}"
            f" * {seq_len} - total_tokens as bigint) as pad_tokens",
            f"round(cast(total_tokens as double) / ((total_tokens"
            f" + {seq_len} - 1) div {seq_len} * {seq_len}), 6) as fill_ratio",
        )
    )


def k_anonymity_audit(
    df: DataFrame,
    qi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple (Sweeney 2002) —
    the re-identification-risk check a training-data pipeline runs
    BEFORE release, complementing pii_redact (which removes direct
    identifiers; this measures whether the remaining attribute
    combinations still single people out). A row's anonymity class is
    the set of rows sharing its full QI tuple; classes smaller than
    ``k`` are re-identifiable.

    Output: one row per observed class size —
    ``(class_size, n_classes, n_rows, at_risk)`` with ``at_risk =
    class_size < k``; the released-data risk share is
    sum(n_rows where at_risk) / sum(n_rows), recoverable from the
    histogram without a second pass.

    Scale shape: two map-side-combinable aggregates (rows -> classes,
    classes -> histogram) — both shuffle only on shrinking keys (QI
    tuple, then a scalar size); no windows, no joins. Exact integers
    throughout.
    """
    classes = df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("class_size")
    )
    return (
        classes.groupBy("class_size")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum("class_size").cast("long").alias("n_rows"),
        )
        .withColumn("at_risk", F.col("class_size") < F.lit(int(k)))
    )
