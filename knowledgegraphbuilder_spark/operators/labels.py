"""U3: NER label generation (schema induction) + T1 deterministic sampling +
A4 union/sort + F4/F6/F7 parsing & normalization.

Reference: sample 15 docs (random.sample, back/kgg/generator.py:240-246),
chunk at 300/30, one LLM call per chunk producing a python-list string,
bracket-regex extract + repair-json parse, set-union, lowercase/underscore
normalize, sorted output (back/kgg/nodes/ner_labels_generator.py:28-91).

Spark design: sampling is hash-ordered (``ORDER BY sha256(doc_id) LIMIT k``) —
``df.sample`` is not stable across partitionings, sha256 ordering is, and it
reproduces bit-exactly in the DuckDB oracle. The 'LLM' is the deterministic
backend emitting noisy-cased, bracketed label lists (exercising the parse
path); parsing reproduces the reference's repair chain (functions/jsonfix.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knowledgegraphbuilder_spark.config import KGConfig
from knowledgegraphbuilder_spark.operators.chunk import chunk_documents


def deterministic_sample(docs: DataFrame, k: int, id_col: str = "doc_id") -> DataFrame:
    """T1: reproducible k-sample by sha256(doc_id) order (portable)."""
    return docs.orderBy(F.sha2(F.col(id_col).cast("string"), 256)).limit(k)


class TemplateLabelBackend:
    """Deterministic stand-in for the label-generation LLM: emits the
    gazetteer labels present in the chunk as a noisy python-list string
    (mixed case + spaces, as a real LLM would)."""

    def __init__(self, gazetteer: tuple[tuple[str, str], ...]):
        self.term2label = dict(gazetteer)

    def generate_batch(self, chunk_texts: pd.Series) -> list[str]:
        out = []
        for text in chunk_texts:
            labels = sorted({self.term2label[w] for w in text.split(" ") if w in self.term2label})
            noisy = [lbl.replace("_", " ").title() for lbl in labels]
            inner = ", ".join(f'"{x}"' for x in noisy)
            out.append(f"Sure! Here are the entity labels:\n[{inner}]\nLet me know if you need more.")
        return out


def generate_labels(
    docs: DataFrame, config: KGConfig | None = None, backend: object | None = None
) -> DataFrame:
    """Sampled docs -> sorted distinct normalized label table (label STRING)."""
    cfg = config or KGConfig()
    sampled = deterministic_sample(docs, cfg.sample_size_ner_labels)
    chunks = chunk_documents(sampled, cfg.re_chunk_size, cfg.re_chunk_overlap)

    # F4 + F6 + F7 run inside the same Arrow batch as the backend call: the
    # reference's full parse chain (bracket extract -> repair_json ->
    # json.loads -> quote-aware token fallback -> lower/underscore normalize,
    # ner_labels_generator.py:63-91) is reproduced by functions/jsonfix.py.
    # Python-side parsing is the right altitude here: label generation runs
    # over a FIXED-SIZE sample (15 docs, reference generator.py:240-246)
    # regardless of corpus scale, so codegen parsing would buy nothing and
    # repair fidelity on malformed LLM output matters more.
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from knowledgegraphbuilder_spark.functions.jsonfix import parse_label_list

        be = backend if backend is not None else TemplateLabelBackend(cfg.gazetteer)
        for pdf in batches:
            responses = be.generate_batch(pdf["chunk_text"])
            yield pd.DataFrame(
                {"label": [lb for r in responses for lb in parse_label_list(r)]}
            )

    parsed = chunks.mapInPandas(run, "label string")
    # A4: distinct union across chunks; T4: sorted
    return parsed.distinct().orderBy("label")
