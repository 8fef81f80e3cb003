"""U1: text chunker — 1 document -> N overlapping chunks (UDTF shape).

Reference: RecursiveCharacterTextSplitter with a tokenizer length function and
``document.text.find(chunk, last_offset)`` re-anchoring
(back/kgg/nodes/entity_extraction.py:28-32,42-50;
 back/kgg/nodes/relation_extraction.py:40-46). Constants (100/15 NER, 300/30
RE) are preserved; the deterministic backend tokenizes on whitespace, so a
chunk is a sliding word window of ``size`` words with ``size - overlap``
stride. Char offsets are exact by construction (no ``find`` needed — and
unlike the reference's monotone ``find``, correct even for repeated chunk
text).

Implemented as ``mapInPandas`` (Arrow-batched flat map — Spark's UDTF
pattern): one Python worker pass per input partition, output fan-out N
chunks/doc. At 100 TB this is a narrow per-partition transform; no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

CHUNK_SCHEMA = (
    "doc_id string, chunk_idx int, chunk_text string, "
    "chunk_offset int, chunk_word_offset int, chunk_n_words int"
)


def chunk_words(text: str, size: int, stride: int) -> list[tuple[int, str, int, int, int]]:
    """Pure-python core (shared with the serial parity oracle in tests).

    Returns [(chunk_idx, chunk_text, char_offset, word_offset, n_words)].
    """
    words = text.split(" ")
    n = len(words)
    # char offset of each word under single-space joining
    offs: list[int] = []
    pos = 0
    for w in words:
        offs.append(pos)
        pos += len(w) + 1
    out = []
    i = 0
    ci = 0
    while True:
        ws = words[i : i + size]
        out.append((ci, " ".join(ws), offs[i], i, len(ws)))
        if i + size >= n:
            break
        i += stride
        ci += 1
    return out


def chunk_words_tokenized(
    text: str, size: int, overlap: int, token_len,
) -> list[tuple[int, str, int, int, int]]:
    """Token-budgeted chunker core (F11): chunks are word-boundary windows
    whose summed per-word token count (``token_len(word)``) fits ``size``
    tokens, consecutive chunks sharing >= ``overlap`` tokens.

    This reproduces the reference's *sizing rule* — chunk length measured in
    deberta-v3-large tokens, not words (entity_extraction.py:28-32,101-102) —
    with two documented divergences: (a) token counts are summed per word
    (cross-word merge effects of the real tokenizer are ignored), (b) splits
    are word-greedy rather than RecursiveCharacterTextSplitter's
    paragraph/sentence-first recursion. Char offsets stay exact by
    construction. Output shape == chunk_words."""
    words = text.split(" ")
    n = len(words)
    offs: list[int] = []
    pos = 0
    for w in words:
        offs.append(pos)
        pos += len(w) + 1
    tlens = [max(int(token_len(w)), 1) for w in words]
    out = []
    i = 0
    ci = 0
    while True:
        # greedy fill: at least one word, then while budget holds
        j = i + 1
        budget = size - tlens[i]
        while j < n and tlens[j] <= budget:
            budget -= tlens[j]
            j += 1
        out.append((ci, " ".join(words[i:j]), offs[i], i, j - i))
        if j >= n:
            break
        # back up so the next chunk starts >= overlap tokens before j
        k = j
        acc = 0
        while k > i + 1 and acc < overlap:
            k -= 1
            acc += tlens[k]
        i = k
        ci += 1
    return out


def chunk_documents(docs: DataFrame, size: int, overlap: int) -> DataFrame:
    """(doc_id, text, ...) -> chunk table. ``overlap`` words shared between
    consecutive chunks (stride = size - overlap)."""
    stride = size - overlap
    if stride <= 0:
        raise ValueError("chunk overlap must be smaller than chunk size")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids: list[str] = []
            idxs: list[int] = []
            texts: list[str] = []
            offs: list[int] = []
            woffs: list[int] = []
            nws: list[int] = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for ci, ct, off, woff, nw in chunk_words(text, size, stride):
                    doc_ids.append(doc_id)
                    idxs.append(ci)
                    texts.append(ct)
                    offs.append(off)
                    woffs.append(woff)
                    nws.append(nw)
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "chunk_idx": pd.array(idxs, dtype="int32"),
                    "chunk_text": texts,
                    "chunk_offset": pd.array(offs, dtype="int32"),
                    "chunk_word_offset": pd.array(woffs, dtype="int32"),
                    "chunk_n_words": pd.array(nws, dtype="int32"),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(gen, CHUNK_SCHEMA)


def chunk_documents_tokenized(
    docs: DataFrame, size: int, overlap: int, length_fn_factory,
) -> DataFrame:
    """Token-budgeted chunk table (F11). ``length_fn_factory`` must be a
    picklable callable-returning object constructed lazily per python worker
    (e.g. functions/llm.py:HFTokenizerLength, which loads deberta-v3-large on
    first call) — the tokenizer itself never crosses the driver/executor
    boundary."""
    if overlap >= size:
        raise ValueError("chunk overlap must be smaller than chunk size")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        token_len = length_fn_factory
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in (
                "doc_id", "chunk_idx", "chunk_text", "chunk_offset",
                "chunk_word_offset", "chunk_n_words")}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for ci, ct, off, woff, nw in chunk_words_tokenized(
                    text, size, overlap, token_len
                ):
                    rows["doc_id"].append(doc_id)
                    rows["chunk_idx"].append(ci)
                    rows["chunk_text"].append(ct)
                    rows["chunk_offset"].append(off)
                    rows["chunk_word_offset"].append(woff)
                    rows["chunk_n_words"].append(nw)
            pdf_out = pd.DataFrame(rows)
            for c in ("chunk_idx", "chunk_offset", "chunk_word_offset", "chunk_n_words"):
                pdf_out[c] = pd.array(pdf_out[c], dtype="int32")
            yield pdf_out

    return docs.select("doc_id", "text").mapInPandas(gen, CHUNK_SCHEMA)
