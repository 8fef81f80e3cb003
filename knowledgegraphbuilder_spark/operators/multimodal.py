"""Multimodal column plumbing: media as opaque binary + typed metadata.

The interleaved spans table carries media by reference (``media_ref``). This
module provides the Spark-side machinery a 100 TB multimodal pipeline needs:

- ``fetch_media``: materialize a (media_ref, content binary, media_type,
  n_bytes) table. In the sandbox, content is a deterministic fake payload
  derived from the ref (sha256-seeded bytes) — the real implementation would
  read object storage per partition.
- ``extract_features``: decode + feature-extract via ``mapInPandas`` with
  Arrow binary batches. The actual decode (PIL/ffmpeg) is STUBBED: image and
  audio libraries are not available in this container, so the deterministic
  fake computes byte-level stats with the same schema, partitioning and batch
  shape the real kernel would use; pass ``decoder=`` to plug a real one.
- ``frame_sample``: 1 media row -> N frame rows (UDTF shape), stubbed
  deterministically.

Everything respects the span-sequence invariant: media refs are never
reordered or dropped, features join back by media_ref.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "media_ref string, media_type string, n_bytes long, "
    "byte_mean double, byte_entropy double, feature array<float>"
)


def media_refs(spans_df: DataFrame) -> DataFrame:
    """All media references with their kind, from the spans table."""
    return (
        spans_df.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") != "text")
        .select(F.col("s.media_ref").alias("media_ref"), F.col("s.kind").alias("media_type"))
        .distinct()
    )


def _fake_payload(ref: str) -> bytes:
    seed = hashlib.sha256(ref.encode()).digest()
    size = 256 + seed[0]
    return (seed * ((size // len(seed)) + 1))[:size]


def fetch_media(refs: DataFrame) -> DataFrame:
    """(media_ref, media_type) -> + (content binary, n_bytes). Deterministic
    fake fetch; a real deployment replaces the inner map with object-store
    reads (per-partition connection reuse)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["content"] = pdf["media_ref"].map(_fake_payload)
            pdf["n_bytes"] = pdf["content"].map(len).astype("int64")
            yield pdf[["media_ref", "media_type", "content", "n_bytes"]]

    return refs.mapInPandas(
        run, "media_ref string, media_type string, content binary, n_bytes long"
    )


def extract_features(media: DataFrame, dim: int = 8, decoder=None) -> DataFrame:
    """Decode + featurize media content (Arrow-batched).

    ``decoder(content: bytes, media_type: str) -> list[float]`` plugs a real
    model; the default deterministic stub raises NotImplementedError for
    real decoding and instead emits byte-level stats + a hashed feature
    vector with the production schema/batch shape."""

    def default_features(content: bytes, media_type: str) -> list[float]:
        import numpy as np

        arr = np.frombuffer(content, dtype=np.uint8)
        out = np.zeros(dim, dtype=np.float64)
        for i, b in enumerate(arr):
            out[i % dim] += float(b)
        n = float(np.sqrt((out * out).sum())) or 1.0
        return [float(x / n) for x in out]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        fn = decoder or default_features
        for pdf in batches:
            feats, means, ents = [], [], []
            for content, mt in zip(pdf["content"], pdf["media_type"]):
                arr = np.frombuffer(content, dtype=np.uint8)
                means.append(float(arr.mean()) if len(arr) else 0.0)
                counts = np.bincount(arr, minlength=256) / max(len(arr), 1)
                ent = -float(sum(p * math.log2(p) for p in counts if p > 0))
                ents.append(round(ent, 6))
                feats.append(fn(content, mt))
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "byte_mean": [round(m, 6) for m in means],
                    "byte_entropy": ents,
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def align_media_to_text(spans_df: DataFrame) -> DataFrame:
    """Caption alignment over the interleaved spans table: pair every media
    span with its nearest TEXT span in document order — the preceding text
    span when one exists (the usual caption-above-figure convention), else
    the nearest following one.

    This is the span-sequence-aware join an interleaved-document pipeline
    needs before any image-text training-pair export (LAION-style caption
    harvesting): the pairing depends on span ORDER, which is exactly the
    invariant the source preserves (sources/interleaved.py docstring).

    Scale design: one posexplode + two running windows partitioned by
    ``doc_id`` — per-doc state only, shuffles once on the doc key, no
    self-join of the span table. Output: (doc_id, pos, media_ref,
    media_type, caption, caption_offset) — ``pos`` is the 0-based span
    index, ``caption`` the aligned text span's full text.
    """
    from pyspark.sql import Window

    s = spans_df.select("doc_id", F.posexplode("spans").alias("pos", "s"))
    txt = F.when(
        F.col("s.kind") == "text",
        F.struct(F.col("s.offset").alias("o"), F.col("s.text").alias("t")),
    )
    w_prev = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    return (
        s.withColumn("prev", F.last(txt, ignorenulls=True).over(w_prev))
        .withColumn("nxt", F.first(txt, ignorenulls=True).over(w_next))
        .filter(F.col("s.kind") != "text")
        .select(
            "doc_id",
            F.col("pos").cast("int").alias("pos"),
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.kind").alias("media_type"),
            F.coalesce("prev.t", "nxt.t").alias("caption"),
            F.coalesce("prev.o", "nxt.o").cast("int").alias("caption_offset"),
        )
    )


def real_decode_stub(content: bytes, media_type: str):  # pragma: no cover
    """Placeholder for the real decode kernel (PIL / torchaudio / ffmpeg).
    Not available in this container."""
    raise NotImplementedError(
        "real media decoding requires image/audio libraries not present in "
        "this environment; plug a decoder into extract_features(decoder=...)"
    )


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """1 media row -> n_frames frame rows (video frame-sampling shape),
    deterministic stub: frame content = sliced payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, idxs, frames = [], [], []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                step = max(len(content) // n_frames, 1)
                for i in range(n_frames):
                    refs.append(ref)
                    idxs.append(i)
                    frames.append(bytes(content[i * step : (i + 1) * step]))
            yield pd.DataFrame({"media_ref": refs, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(run, "media_ref string, frame_idx int, frame binary")


def modality_transitions(spans: DataFrame) -> DataFrame:
    """Interleaving-structure profile of a multimodal corpus: counts of
    consecutive span-kind transitions (text->image, image->text, ...) across
    all documents. The signal a curriculum/mixture designer reads before
    packing interleaved sequences — e.g. image-caption-first vs caption-last
    corpora train differently.

    Shape: posexplode + one lag window keyed by doc_id (uniform key, same
    shuffle as every per-doc window here) + a map-side-combinable count.
    Output: (from_kind, to_kind, cnt)."""
    from pyspark.sql.window import Window

    ex = spans.select(
        "doc_id", F.posexplode("spans").alias("pos", "s")
    ).select("doc_id", "pos", F.col("s.kind").alias("kind"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    t = ex.withColumn("prev", F.lag("kind").over(w)).filter(
        F.col("prev").isNotNull()
    )
    return (
        t.groupBy(
            F.col("prev").alias("from_kind"), F.col("kind").alias("to_kind")
        )
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def caption_stats(spans_df: DataFrame) -> DataFrame:
    """Caption-coverage profile of an interleaved corpus, per media kind:
    how many media spans are captioned by a PRECEDING text span (the
    caption-above convention ``align_media_to_text`` prefers), how many
    only by a FOLLOWING one, how many have no text span at all in their
    document, plus the mean caption length. A mixture designer reads this
    before harvesting image-text pairs — a corpus whose captions mostly
    FOLLOW the image needs the opposite pairing convention.

    Scale shape: identical to ``align_media_to_text`` — one posexplode +
    two running windows partitioned by ``doc_id`` (per-doc state only,
    single shuffle on the doc key), then one map-side-combinable aggregate
    over media kind. Output is kind-cardinality-sized.
    """
    from pyspark.sql import Window

    s = spans_df.select("doc_id", F.posexplode("spans").alias("pos", "s"))
    txt = F.when(F.col("s.kind") == "text", F.col("s.text"))
    w_prev = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    m = (
        s.withColumn("prev_t", F.last(txt, ignorenulls=True).over(w_prev))
        .withColumn("next_t", F.first(txt, ignorenulls=True).over(w_next))
        .filter(F.col("s.kind") != "text")
    )
    return (
        m.groupBy(F.col("s.kind").alias("media_type"))
        .agg(
            F.count("*").cast("long").alias("n_media"),
            F.sum(F.when(F.col("prev_t").isNotNull(), 1).otherwise(0))
            .cast("long").alias("n_prev_caption"),
            F.sum(
                F.when(
                    F.col("prev_t").isNull() & F.col("next_t").isNotNull(), 1
                ).otherwise(0)
            ).cast("long").alias("n_next_only"),
            F.sum(
                F.when(
                    F.col("prev_t").isNull() & F.col("next_t").isNull(), 1
                ).otherwise(0)
            ).cast("long").alias("n_uncaptioned"),
            F.round(
                F.avg(F.length(F.coalesce("prev_t", "next_t"))), 6
            ).alias("mean_caption_len"),
        )
    )


def media_budget(spans_df: DataFrame) -> DataFrame:
    """Per-kind media byte budget through the REAL fetch path: explode the
    spans table to media refs, run ``fetch_media`` (mapInPandas, Arrow
    binary batches), and aggregate fetched sizes — the accounting a 100 TB
    pipeline does before deciding what it can afford to decode. Output per
    media kind: ref count, total/mean fetched bytes, and bytes per
    kilochar of corpus text (the media:text storage ratio).

    Scale shape: refs are distinct-projected before the fetch (never fetch
    a ref twice), the fetch is embarrassingly parallel per partition, and
    both aggregates are map-side combinable; the corpus text size is a
    scalar broadcast into the final projection.
    """
    sizes = fetch_media(media_refs(spans_df)).select(
        "media_ref", "media_type", "n_bytes"
    )
    text_chars = (
        spans_df.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "text")
        .agg(F.sum(F.length("s.text")).cast("long"))
        .collect()[0][0]
        or 1
    )
    return sizes.groupBy("media_type").agg(
        F.count("*").cast("long").alias("n_refs"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.round(F.avg("n_bytes"), 6).alias("mean_bytes"),
        F.round(
            F.sum("n_bytes") * 1000.0 / F.lit(float(text_chars)), 6
        ).alias("bytes_per_kilochar"),
    )


def phash_buckets(spans_df: DataFrame, bits: int = 8) -> DataFrame:
    """Perceptual-hash-bucket accounting for media near-dup: bucket every
    distinct media ref by the top ``bits`` bits of a 64-bit content hash
    (the stand-in for a real pHash — same key shape, same join plan) and
    report the bucket-size histogram with the candidate-pair count each
    size class would feed into a verify join (n_buckets * C(size, 2)).
    This is the step-0 cost estimate of LSH media dedup: the histogram
    says whether the bucketing is balanced BEFORE paying for the
    quadratic-within-bucket verify.

    Scale shape: two map-side-combinable aggregates (ref -> bucket ->
    size, then size -> histogram); no joins, output is O(distinct bucket
    sizes). The real pipeline swaps sha256 for a pHash UDF — the plan is
    unchanged.
    """
    b = media_refs(spans_df).select(
        (
            F.conv(F.substring(F.sha2(F.col("media_ref"), 256), 1, 2), 16, 10)
            .cast("long") % (1 << bits)
        ).alias("bucket")
    )
    per = b.groupBy("bucket").agg(F.count("*").cast("long").alias("sz"))
    return (
        per.groupBy("sz")
        .agg(F.count("*").cast("long").alias("n_buckets"))
        .selectExpr(
            "cast(sz as bigint) as bucket_size",
            "n_buckets",
            "cast(n_buckets * (sz * (sz - 1) div 2) as bigint) as n_candidate_pairs",
        )
    )


def context_profile(spans_df: DataFrame) -> DataFrame:
    """Interleaving-granularity profile: for every media span, how many
    TEXT characters accumulated since the previous media span (or the
    document start) — the context-window-before-each-image distribution
    that decides whether an interleaved corpus supports long-context
    image-text training or degenerates into caption pairs. Output per
    media kind: span count and the min/mean/max context size.

    Exactness: context sizes are exact integer char sums (one running
    window over the span sequence, one lag over the media subsequence);
    the mean divides two exact integers. Scale shape: posexplode + two
    per-doc windows (single shuffle on doc_id) + a kind-sized aggregate.
    """
    from pyspark.sql import Window

    s = spans_df.select("doc_id", F.posexplode("spans").alias("pos", "s"))
    w_run = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = s.withColumn(
        "chars_before",
        F.coalesce(
            F.sum(
                F.when(F.col("s.kind") == "text", F.length("s.text"))
                .otherwise(F.lit(0))
            ).over(w_run),
            F.lit(0),
        ),
    ).filter(F.col("s.kind") != "text")
    w_media = Window.partitionBy("doc_id").orderBy("pos")
    ctx = cum.withColumn(
        "context_chars",
        F.col("chars_before")
        - F.coalesce(F.lag("chars_before").over(w_media), F.lit(0)),
    )
    return ctx.groupBy(F.col("s.kind").alias("media_type")).agg(
        F.count("*").cast("long").alias("n_media"),
        F.min("context_chars").cast("long").alias("min_context"),
        F.max("context_chars").cast("long").alias("max_context"),
        F.round(
            F.sum("context_chars") / F.count("*").cast("double"), 6
        ).alias("mean_context"),
    )


def phash_dedup_resolve(
    spans_df: DataFrame,
    bits: int = 16,
    max_hamming: int = 1,
) -> DataFrame:
    """Media near-dup RESOLUTION — the verify-and-cluster step
    phash_buckets only estimates the cost of: every distinct media ref
    gets a ``bits``-bit perceptual-hash code (content-hash stand-in,
    same key shape as phash_buckets), candidate pairs are generated by
    the SIMHASH banding pigeonhole (codes within Hamming distance
    ``max_hamming`` must agree on at least one of max_hamming+1 code
    bands — an equi-join on (band, band-value), never refs^2), verified
    by exact popcount, and closed into clusters with the large/small-star
    CC; output is the full assignment (media_ref, canon_ref, code) with
    canon_ref the lexicographic-min member (singletons map to
    themselves) — the table a dedup pass joins against to drop
    redundant media fetches/decodes.

    A real deployment swaps the code expression for a pHash UDF
    (dedup.py simhash discipline); every join stays the same. All
    arithmetic is integer (codes, xor, popcount) so the oracle replays
    the clustering exactly.
    """
    from .canonicalize import connected_components

    n_bands = max_hamming + 1
    band_w = max(bits // n_bands, 1)
    hex_chars = (bits + 3) // 4
    refs = media_refs(spans_df).select(
        "media_ref",
        (
            F.conv(
                F.substring(F.sha2(F.col("media_ref"), 256), 1, hex_chars),
                16, 10,
            ).cast("long") % (1 << bits)
        ).alias("code"),
    )
    bands = refs.select(
        "media_ref", "code",
        F.explode(
            F.expr(
                f"transform(sequence(0, {n_bands - 1}), b -> "
                f"named_struct('band', b, 'val', "
                f"(code div cast(pow(2, b * {band_w}) as bigint)) % {1 << band_w}))"
            )
        ).alias("bv"),
    ).select("media_ref", "code", F.col("bv.band").alias("band"),
             F.col("bv.val").alias("val"))
    pairs = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "val"])
        .filter(F.col("a.media_ref") < F.col("b.media_ref"))
        .select(
            F.col("a.media_ref").alias("src"),
            F.col("b.media_ref").alias("dst"),
            F.col("a.code").alias("ca"),
            F.col("b.code").alias("cb"),
        )
        .distinct()
        .filter(F.expr(f"bit_count(ca ^ cb) <= {max_hamming}"))
        .select("src", "dst")
    )
    assign = connected_components(pairs).select(
        F.col("vertex").alias("media_ref"),
        F.col("component").alias("canon_ref"),
    )
    return (
        refs.join(assign, "media_ref", "left")
        .select(
            "media_ref",
            F.coalesce("canon_ref", "media_ref").alias("canon_ref"),
            F.col("code").cast("long").alias("code"),
        )
    )
