"""U6 + F9: answer generation over retrieved documents.

Reference (back/kgg/graph_answering.py:13-66): format the top-k retrieved
documents as "[Text i] ..." context, one LLM call (deepseek-r1:14b,
num_ctx=16000), strip the ``<think>...</think>`` reasoning block from the
answer. This is a driver-side step after ``limit(k).collect()`` — NOT a
distributed op (k is 5) — so the Spark work ends at the ranked-docs
DataFrame; only context formatting + the single model call happen here.

``strip_think`` is also exposed as a column expression (F9) for pipelines
that post-process batches of model answers distributively.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

THINK_RE = r"(?s)<think>.*?</think>"


def strip_think_col(col) -> Column:
    """F9 as a native column expression (graph_answering.py:55-66)."""
    return F.trim(F.regexp_replace(col, THINK_RE, ""))


def strip_think(text: str) -> str:
    return re.sub(THINK_RE, "", text).strip()


def format_context(doc_texts: list[str]) -> str:
    """"[Text i] ..." block (graph_answering.py:36-40)."""
    return "\n\n".join(f"[Text {i + 1}] {t}" for i, t in enumerate(doc_texts))


class TemplateAnswerBackend:
    """Deterministic stand-in for the answering LLM: echoes the question and
    the supporting doc ids, wrapped in a reasoning block the way r1-style
    models answer — exercising the strip path."""

    def generate(self, question: str, context: str) -> str:
        n_docs = context.count("[Text ")
        return (
            f"<think>considering {n_docs} retrieved passages for: {question}</think>"
            f"Based on {n_docs} retrieved passages, the answer to '{question}' "
            f"is grounded in the top-ranked document."
        )


def answer_question(
    ranked_docs, documents, question: str, backend=None, k: int = 5
) -> str:
    """ranked_docs(doc_id, weight) + documents(doc_id, text) -> answer string.

    Driver-side by design (mirrors the reference single LLM call); the only
    distributed work is the broadcast-join fetching the k doc texts."""
    be = backend or TemplateAnswerBackend()
    top = ranked_docs.orderBy(F.desc("weight"), F.col("doc_id")).limit(k)
    texts = (
        top.join(documents.select("doc_id", "text"), "doc_id")
        .orderBy(F.desc("weight"), F.col("doc_id"))
        .select("text")
        .collect()
    )
    context = format_context([r["text"] for r in texts])
    return strip_think(be.generate(question, context))
