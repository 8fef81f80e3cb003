"""s6: entity linking — similarity-edge generation between surface forms.

North-rule design: broadcast alias-dictionary candidate generation, then
MinHash-LSH blocking over character shingles, then cosine/Jaccard scoring;
the resulting edge list feeds large-star/small-star connected components
(operators/canonicalize.py) for coreference canonicalization.

The reference canonicalizes by exact text only (back/kgg/generator.py:264-276)
— this stage generalizes it: 'Google' / 'google inc' / 'GOOGLE' end up in one
canonical node. Pipeline default keeps exact semantics (reference parity);
linking is opt-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knowledgegraphbuilder_spark.config import KGConfig


def normalize_surface(col: str = "text") -> F.Column:
    """Shared normalization (reference label normalize F7 analog:
    lower + trim + collapse separators)."""
    return F.lower(F.trim(F.regexp_replace(F.col(col), r"[\s_\-]+", " ")))


def alias_candidates(texts: DataFrame, alias_df: DataFrame) -> DataFrame:
    """Broadcast alias-dictionary candidates: alias_df(alias, canonical) is a
    small curated dimension — broadcast hash join, no shuffle of the big side.
    Output: (src, dst) similarity edges."""
    return (
        texts.select(F.col("text").alias("src"), normalize_surface("text").alias("norm"))
        .join(F.broadcast(alias_df.select(normalize_surface("alias").alias("norm"),
                                          F.col("canonical").alias("dst"))), "norm")
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _char_shingles(col: str, k: int) -> str:
    return (
        f"array_distinct(transform(sequence(1, greatest(length({col}) - {k - 1}, 1)), "
        f"i -> substring({col}, i, {k})))"
    )


def _h60(expr: str) -> str:
    """60-bit sha256-derived hash of a string expression.

    Chosen over xxhash64 deliberately: sha256 is bit-identical in DuckDB
    (15 hex chars = 60 bits, below the 63-bit signed cap), so the minhash
    signatures, band keys, and therefore the full approximate candidate set
    replay value-exactly in the SQL oracle. The input here is the DISTINCT
    surface-form table (gazetteer-scale, not corpus-scale), so the extra
    hash cost over xxhash64 is irrelevant; the corpus-scale dedup minhash
    (operators/dedup.py) keeps xxhash64."""
    return f"cast(conv(substring(sha2({expr}, 256), 1, 15), 16, 10) as bigint)"


def lsh_similarity_edges(
    texts: DataFrame, config: KGConfig | None = None, threshold: float | None = None,
    verify_threshold: float | None = None,
) -> DataFrame:
    """MinHash-LSH blocking over char-k shingles of normalized surface forms +
    exact Jaccard verification at ``synonym_threshold`` (reference config.py:17
    uses 0.8 for synonym similarity). Input: distinct (text); output:
    (src, dst, jaccard) edges between *original* surface forms.

    ``threshold`` shapes the banding (recall target); ``verify_threshold``
    (default: same) is the final Jaccard filter — pass 0.0 to get the RAW
    blocked candidate set for a downstream rescorer (cosine_link_edges)."""
    cfg = config or KGConfig()
    thr = threshold if threshold is not None else cfg.synonym_threshold
    vthr = verify_threshold if verify_threshold is not None else thr
    n_perm, k = cfg.minhash_perm, cfg.shingle_size
    # derive the band shape from the threshold: a (bands, rows) split has
    # implicit candidate threshold tau = (1/bands)^(1/rows); pick the split
    # with the largest tau still <= thr so recall at thr stays high while
    # bucket sizes stay bounded. A fixed split (the old bands=8/rows=4,
    # tau=0.59) silently under-recalls any lower threshold.
    splits = [(b, n_perm // b) for b in (32, 16, 8, 4, 2, 1) if n_perm % b == 0]
    bands, rows = max(
        (s for s in splits if (1.0 / s[0]) ** (1.0 / s[1]) <= thr),
        key=lambda s: (1.0 / s[0]) ** (1.0 / s[1]),
        default=(n_perm, 1),
    )

    base = texts.select(F.col("text")).distinct().withColumn("norm", normalize_surface("text"))
    sh = base.withColumn("shingles", F.expr(_char_shingles("norm", k)))
    # hash each shingle string once, then per-permutation bigint rehash in a
    # single outer aggregate (same anti-patterns avoided as operators/dedup.py
    # minhash_signatures: 32x string re-hash + projection-collapse re-inline)
    long_max = (1 << 63) - 1
    perm_hash = _h60("concat(cast(h as string), ',', cast(i as string))")
    sigs = sh.withColumn(
        "hs", F.expr(f"transform(shingles, s -> {_h60('s')})")
    ).withColumn(
        "sig",
        F.expr(
            f"""
            aggregate(
              hs,
              array_repeat(cast({long_max} as bigint), {n_perm}),
              (acc, h) -> zip_with(acc, sequence(0, {n_perm - 1}),
                                   (m, i) -> least(m, {perm_hash})))
            """
        ),
    ).drop("hs")
    band_key = _h60(
        f"concat_ws(',', transform(slice(sig, b * {rows} + 1, {rows}), x -> cast(x as string)))"
    )
    buckets = sigs.select(
        "text", "shingles",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> named_struct('band', b, 'key', {band_key}))"
            )
        ).alias("bk"),
    ).select("text", "shingles", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    cand = (
        buckets.alias("x")
        .join(
            buckets.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.text") < F.col("y.text")),
        )
        .select(
            F.col("x.text").alias("src"), F.col("y.text").alias("dst"),
            F.col("x.shingles").alias("sa"), F.col("y.shingles").alias("sb"),
        )
        .dropDuplicates(["src", "dst"])
    )
    return (
        cand.withColumn(
            "jaccard",
            F.round(F.size(F.array_intersect("sa", "sb")) / F.size(F.array_union("sa", "sb")), 6),
        )
        .filter(F.col("jaccard") >= vthr)
        .select("src", "dst", "jaccard")
    )


def cosine_link_edges(
    mentions: DataFrame,
    config: KGConfig | None = None,
    cos_threshold: float = 0.5,
    dim: int = 64,
) -> DataFrame:
    """The north-star entity-linking scorer end-to-end: MinHash-LSH
    blocking over the distinct mention surface forms (candidate
    generation — never an all-pairs join) followed by COSINE-similarity
    scoring over an embedding column (the trigram feature-hash encoder
    retrieval.py uses, float32 stored-index convention), keeping pairs
    at ``cos_threshold``. This is the "MinHash-LSH blocking +
    cosine-similarity scoring over embedding columns" stage of
    BASELINE.json's north star as one callable — the linker that feeds
    canonicalization when surface Jaccard is too coarse (abbreviations,
    transliterations) but embeddings agree.

    Scale shape: blocking cost = surfaces x bands (equi-join on band
    key); the embedding join touches only candidate endpoints
    (mention-vocabulary-sized, broadcastable); per-pair cosine is one
    zip_with fold over dense dim-length arrays. Output:
    (src, dst, cosine) with cosine rounded 4dp.
    """
    from knowledgegraphbuilder_spark.operators.retrieval import embed_column

    texts = mentions.select("text").distinct()
    cand = lsh_similarity_edges(
        texts, config, verify_threshold=0.0
    ).select("src", "dst")
    embs = embed_column(texts, "text", "embedding", dim)
    a = embs.selectExpr(
        "text as src", "transform(embedding, x -> cast(x as double)) as ea"
    )
    b = embs.selectExpr(
        "text as dst", "transform(embedding, x -> cast(x as double)) as eb"
    )
    dot = "aggregate(zip_with(ea, eb, (x, y) -> x * y), 0.0d, (a, x) -> a + x)"
    na = "sqrt(aggregate(ea, 0.0d, (a, x) -> a + x * x))"
    nb = "sqrt(aggregate(eb, 0.0d, (a, x) -> a + x * x))"
    return (
        cand.join(a, "src")
        .join(b, "dst")
        .selectExpr(
            "src", "dst",
            f"round({dot} / ({na} * {nb}), 4) as cosine",
        )
        .filter(F.col("cosine") >= cos_threshold)
        .select("src", "dst", "cosine")
    )


def similarity_edges(
    mentions: DataFrame,
    config: KGConfig | None = None,
    alias_df: DataFrame | None = None,
) -> DataFrame:
    """Union of alias-dictionary edges and LSH-blocked similarity edges over
    the distinct mention surface forms. Output: (src, dst)."""
    texts = mentions.select("text").distinct()
    lsh = lsh_similarity_edges(texts, config).select("src", "dst")
    if alias_df is not None:
        return lsh.union(alias_candidates(texts, alias_df)).distinct()
    return lsh
