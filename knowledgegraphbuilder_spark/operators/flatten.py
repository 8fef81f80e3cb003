"""s1_flatten: interleaved spans -> per-document concatenated text.

The Spark-native equivalent of the reference's ``Document.text``
(back/kgg/models.py:24-30): text spans concatenated in array order. Media
spans pass through untouched in the ``spans`` column so downstream stages keep
the full span sequence as provenance (span-sequence invariant).

Pure native expressions (filter/transform/concat_ws inside whole-stage
codegen): a narrow map, no shuffle, scales with input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flatten_documents(spans_df: DataFrame, keep_spans: bool = True) -> DataFrame:
    out = spans_df.withColumn(
        "text",
        F.expr("concat_ws('', transform(filter(spans, s -> s.kind = 'text'), s -> s.text))"),
    ).withColumn(
        "media_refs",
        F.expr("transform(filter(spans, s -> s.kind <> 'text'), s -> s.media_ref)"),
    )
    cols = ["doc_id", "text", "media_refs"] + (["spans"] if keep_spans else [])
    return out.select(*cols)


def span_signature(spans_df: DataFrame) -> DataFrame:
    """Per-doc digest of (kind, text, media_ref, order) — the span-sequence
    invariant checked before/after every stage (sha256 so it is portable to
    the DuckDB oracle)."""
    return spans_df.select(
        "doc_id",
        F.sha2(
            F.concat_ws(
                "\x1e",
                F.expr(
                    "transform(spans, s -> concat_ws('\x1f', s.kind, "
                    "coalesce(s.text, ''), coalesce(s.media_ref, '')))"
                ),
            ),
            256,
        ).alias("span_sig"),
    )
