"""U2 + A2 + P6 + F2 + F10: mention detection (NER) over chunks.

Reference behavior (back/kgg/nodes/entity_extraction.py):
- GLiNER ``predict_entities(chunk, labels, threshold=0.5, multi_label=True)``
  per chunk (:52-57), model lazily loaded once (:23-32);
- chunk-local offsets shifted by chunk offset (:58-60)                  [F2]
- first-seen dedup on (start, end, label) per document (:89-99)         [A2]
- uuid4 ids (:70) -> replaced by deterministic sha256 ids               [F10]

Spark design: ``mapInPandas`` over the chunk table — the model (or the
deterministic gazetteer) is loaded once per executor Python worker as a
module-level singleton and runs batched per Arrow record batch, never per row.
Dedup is a window ``row_number() = 1`` ordered by ``chunk_idx`` (first-seen in
document order — Spark's ``dropDuplicates`` keeps an arbitrary row, which
would break parity under parallelism). The only shuffle is the dedup window,
keyed by doc_id — uniformly distributed, no skew.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from knowledgegraphbuilder_spark.config import KGConfig
from knowledgegraphbuilder_spark.functions import ids

RAW_MENTION_SCHEMA = (
    "doc_id string, chunk_idx int, start int, end int, "
    "label string, text string, score double, word_idx int"
)

MENTION_COLS = ["mention_id", "doc_id", "start", "end", "label", "text", "score", "word_idx"]


class GazetteerExtractor:
    """Deterministic NER backend for tests/bench: exact word-level gazetteer
    match (plays GLiNER's role; same output contract: chunk-local char spans
    with labels and scores)."""

    def __init__(self, gazetteer: tuple[tuple[str, str], ...]):
        self.term2label = dict(gazetteer)

    def extract_batch(
        self, chunk_texts: "pd.Series", labels: list[str] | None = None
    ) -> list[list[dict]]:
        allowed = set(labels) if labels is not None else None
        out = []
        for text in chunk_texts:
            ents = []
            pos = 0
            for widx, w in enumerate(text.split(" ")):
                label = self.term2label.get(w)
                if label is not None and (allowed is None or label in allowed):
                    ents.append(
                        {
                            "start": pos,
                            "end": pos + len(w),
                            "label": label,
                            "text": w,
                            "score": 1.0,
                            "word_idx": widx,
                        }
                    )
                pos += len(w) + 1
            out.append(ents)
        return out


class GLiNERExtractor:
    """Real-model adapter (urchade/gliner_large-v2.1 in the reference,
    back/kgg/config.py:8). Loaded lazily once per executor worker; raises in
    environments without the model installed."""

    _model = None

    def __init__(self, model_name: str = "urchade/gliner_large-v2.1", threshold: float = 0.5):
        self.model_name = model_name
        self.threshold = threshold

    def _load(self):
        if GLiNERExtractor._model is None:
            try:
                from gliner import GLiNER  # type: ignore
            except ImportError as e:  # pragma: no cover - not in sandbox
                raise NotImplementedError(
                    "GLiNER is not installed in this environment; use "
                    "GazetteerExtractor for deterministic runs"
                ) from e
            GLiNERExtractor._model = GLiNER.from_pretrained(self.model_name)
        return GLiNERExtractor._model

    def extract_batch(self, chunk_texts, labels):  # pragma: no cover - needs model
        model = self._load()
        out = []
        word_re = re.compile(r"\S+")
        for text in chunk_texts:
            starts = {m.start(): i for i, m in enumerate(word_re.finditer(text))}
            ents = model.predict_entities(text, labels, threshold=self.threshold, multi_label=True)
            out.append(
                [
                    {
                        "start": e["start"],
                        "end": e["end"],
                        "label": e["label"],
                        "text": e["text"],
                        "score": float(e.get("score", 1.0)),
                        "word_idx": starts.get(e["start"], -1),
                    }
                    for e in ents
                ]
            )
        return out


def extract_mentions(
    chunks: DataFrame,
    config: KGConfig,
    labels: list[str] | None = None,
    backend: object | None = None,
) -> DataFrame:
    """Chunk table -> deduplicated mention table with deterministic ids."""
    cfg = config

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # backend constructed once per python worker (singleton pattern; the
        # reference loads GLiNER once per stage, entity_extraction.py:23-32)
        be = backend if backend is not None else GazetteerExtractor(cfg.gazetteer)
        for pdf in batches:
            per_chunk = be.extract_batch(pdf["chunk_text"], labels)
            rows: dict[str, list] = {k: [] for k in (
                "doc_id", "chunk_idx", "start", "end", "label", "text", "score", "word_idx")}
            for (doc_id, cidx, coff, cwoff), ents in zip(
                zip(pdf["doc_id"], pdf["chunk_idx"], pdf["chunk_offset"], pdf["chunk_word_offset"]),
                per_chunk,
            ):
                for e in ents:
                    rows["doc_id"].append(doc_id)
                    rows["chunk_idx"].append(int(cidx))
                    # F2: shift chunk-local offsets to document offsets
                    rows["start"].append(int(e["start"]) + int(coff))
                    rows["end"].append(int(e["end"]) + int(coff))
                    rows["label"].append(e["label"])
                    rows["text"].append(e["text"])
                    rows["score"].append(float(e["score"]))
                    rows["word_idx"].append(int(e["word_idx"]) + int(cwoff))
            pdf_out = pd.DataFrame(rows)
            for c, t in (("chunk_idx", "int32"), ("start", "int32"), ("end", "int32"),
                         ("word_idx", "int32")):
                pdf_out[c] = pd.array(pdf_out[c], dtype=t)
            yield pdf_out

    raw = chunks.mapInPandas(run, RAW_MENTION_SCHEMA)
    # P6: threshold predicate (reference entity_extraction.py:52-57 pushes it
    # into predict_entities; expressed as a filter so Catalyst can push it)
    raw = raw.filter(F.col("score") >= F.lit(cfg.ner_threshold))
    # A2: first-seen dedup per (doc, start, end, label) — deterministic winner
    w = Window.partitionBy("doc_id", "start", "end", "label").orderBy("chunk_idx")
    dedup = (
        raw.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "chunk_idx")
    )
    return dedup.withColumn("mention_id", ids.mention_id()).select(*MENTION_COLS)


def extract_mentions_stream(chunks: DataFrame, config: KGConfig,
                            labels: list[str] | None = None,
                            backend: object | None = None) -> DataFrame:
    """Streaming-safe variant of :func:`extract_mentions`: the window-based
    first-seen dedup is replaced by stateful ``dropDuplicates``.

    Determinism caveat: arbitrary-winner dedup is only deterministic when
    duplicate rows are identical in every column — true for the gazetteer
    backend (score is constant per surface form). A model backend (GLiNER)
    scores the same span differently per chunk context, which would make the
    surviving row's score depend on microbatch arrival order; with a model
    backend the score column is therefore collapsed to 1.0 after thresholding
    and before dedup, trading per-chunk confidence for reproducible streams."""
    cfg = config
    model_backend = backend is not None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        be = backend if backend is not None else GazetteerExtractor(cfg.gazetteer)
        for pdf in batches:
            per_chunk = be.extract_batch(pdf["chunk_text"], labels)
            rows: dict[str, list] = {k: [] for k in (
                "doc_id", "start", "end", "label", "text", "score", "word_idx")}
            for (doc_id, coff, cwoff), ents in zip(
                zip(pdf["doc_id"], pdf["chunk_offset"], pdf["chunk_word_offset"]), per_chunk
            ):
                for e in ents:
                    rows["doc_id"].append(doc_id)
                    rows["start"].append(int(e["start"]) + int(coff))
                    rows["end"].append(int(e["end"]) + int(coff))
                    rows["label"].append(e["label"])
                    rows["text"].append(e["text"])
                    rows["score"].append(float(e["score"]))
                    rows["word_idx"].append(int(e["word_idx"]) + int(cwoff))
            pdf_out = pd.DataFrame(rows)
            for c in ("start", "end", "word_idx"):
                pdf_out[c] = pd.array(pdf_out[c], dtype="int32")
            yield pdf_out

    raw = chunks.mapInPandas(
        run,
        "doc_id string, start int, end int, label string, text string, score double, word_idx int",
    )
    raw = raw.filter(F.col("score") >= F.lit(cfg.ner_threshold))
    if model_backend:
        raw = raw.withColumn("score", F.lit(1.0))
    dedup = raw.dropDuplicates(["doc_id", "start", "end", "label"])
    return dedup.withColumn("mention_id", ids.mention_id()).select(*MENTION_COLS)
