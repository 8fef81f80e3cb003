"""Real-model backends (import-gated) for U3/U4/U6 + the HF tokenizer length
function (F11).

The CI/test path uses the deterministic template backends throughout; these
adapters carry the reference's actual inference surface so a deployment with
an Ollama server and the HF hub reproduces its real behavior:

- LLM transport: ChatOllama, temperature 0.0, num_ctx 15000
  (back/kgg/utils.py:4-11); answering uses deepseek-r1:14b with num_ctx 16000
  (back/kgg/nodes/graph_answering.py:15-21).
- Prompt structure: system instruction + few-shot turns + templated user turn
  (back/kgg/prompts.py:354-389 NER_PROMPT / GLINER_LLM_PROMPT, :511-524
  GRAPH_ANSWERING_PROMPT). The system instructions and the user-turn
  templates below are behavioral constants restated from the reference
  (cited); the reference additionally ships 2-3 long few-shot example turns
  per prompt (prompts.py:31-352) which are NOT reproduced here — a
  deployment tuning for exact reference outputs should extend
  ``few_shot_turns`` with its own examples.
- Token length: deberta-v3-large, ``len(encode(text,
  add_special_tokens=False))`` (back/kgg/nodes/entity_extraction.py:27,101-102).

Every adapter constructs lazily and raises a clear ImportError-derived
RuntimeError when its optional dependency is missing, so merely importing
this module (or pickling a configured-but-unused backend into executors)
never fails in minimal environments.
"""

from __future__ import annotations

import pandas as pd

# ---------------------------------------------------------------------------
# prompt surfaces (behavioral constants; back/kgg/prompts.py)
# ---------------------------------------------------------------------------

# prompts.py:4-13 (NER_instruction) — label generation (U3)
NER_INSTRUCTION = """
You are an expert annotator. Your task is to extract **entity labels** from unstructured text.
- Identify meaningful entity types (e.g., person, organization, event, location).
- Include implicit entities (e.g., roles, quantities) based on context.
- Return the labels as a **Python list** with single quotes around each label, enclosed in square brackets, and separated by commas.
- Example output: `['person', 'organization', 'event']`.
- Ensure no duplicates and no additional text outside the list.
- Return labels in language that is equal to the input text language.
"""

# prompts.py:74-99 (GLINER_LLM_INSTRUCTION) — relation extraction (U4)
RELATION_INSTRUCTION = """
You are an expert relation extractor. Your task is to identify relationships between entities that were already detected in the text.

Given:
1. The original text
2. A list of already extracted entities with their labels
3. The position of these entities in the text

Your task is to:
1. Analyze the relationships between the provided entities
2. Generate a structured output of relations
3. Only use the entities that were actually detected - do not invent new ones
4. Ensure relations are directional (head -> tail)
5. For each relation generate short and brief description, including both entities and the relationship type, and any additional context, but only if relevant

Output format:
[
    {
        "head": {"text": "entity_text", "label": "entity_label"},
        "tail": {"text": "entity_text", "label": "entity_label"},
        "relation": "relation_type",
        "description": "Short description of the relationship"
    }
]
"""

# prompts.py:392-428 (GRAPH_ANSWERING_INSTRUCTION), abridged to its 8 rules'
# operative sentences — answering (U6)
ANSWERING_INSTRUCTION = """
You are an assistant performing question-answering tasks based on provided source texts. You must follow these rules:
1. Read the question and source texts carefully; do not rely on your own knowledge.
2. Locate relevant information in the texts; your answer must be directly supported by them.
3. Answer only if information exists in the texts.
4. No assumptions or external knowledge.
5. Reference the specific text snippet(s) that support your answer.
6. Provide a concise, direct answer, then list the parts of the text you used.
7. No additional commentary.
8. If the answer is not in the texts, say: "I cannot answer this question based on the provided information."
"""

# user-turn templates (prompts.py:373 "{user_input}", :386-388
# "Text: {text}\n\nDetected entities:\n{entities}", :522-524
# "Question: {question}\n\nTexts:\n{texts}")
LABEL_USER_TEMPLATE = "{user_input}"
RELATION_USER_TEMPLATE = "Text: {text}\n\nDetected entities:\n{entities}"
ANSWER_USER_TEMPLATE = "Question: {question}\n\nTexts:\n{texts}"

DEFAULT_LLM_MODEL = "phi4:14b-q4_K_M"  # back/kgg/config.py:11
ANSWER_LLM_MODEL = "deepseek-r1:14b"  # back/kgg/nodes/graph_answering.py:17
TOKENIZER_NAME = "microsoft/deberta-v3-large"  # entity_extraction.py:27


def build_messages(
    instruction: str,
    user_template: str,
    few_shot_turns: list[tuple[str, str]] | None = None,
    **slots: str,
) -> list[tuple[str, str]]:
    """Assemble the reference's chat shape as (role, content) tuples —
    system + alternating few-shot human/ai turns + templated user turn.
    LangChain's ChatOllama accepts this tuple form directly."""
    msgs: list[tuple[str, str]] = [("system", instruction)]
    for human, ai in few_shot_turns or []:
        msgs.append(("human", human))
        msgs.append(("ai", ai))
    msgs.append(("human", user_template.format(**slots)))
    return msgs


class _OllamaClient:
    """Lazy ChatOllama holder (one model instance per python worker — the
    singleton pattern the reference uses for GLiNER, entity_extraction.py:23)."""

    def __init__(self, model: str, num_ctx: int):
        self.model = model
        self.num_ctx = num_ctx
        self._llm = None

    def invoke(self, messages: list[tuple[str, str]]) -> str:
        if self._llm is None:
            try:
                from langchain_ollama import ChatOllama
            except ImportError as e:  # pragma: no cover - dep absent in CI
                raise RuntimeError(
                    "OllamaBackend needs the optional 'langchain_ollama' "
                    "package and a running Ollama server; use the "
                    "deterministic Template*Backends otherwise"
                ) from e
            self._llm = ChatOllama(
                model=self.model, temperature=0.0, num_ctx=self.num_ctx
            )
        return self._llm.invoke(messages).content


class OllamaLabelBackend:
    """U3 real-model backend — drop-in for labels.TemplateLabelBackend
    (same ``generate_batch(chunk_texts) -> list[str]`` protocol; the
    bracket-list + repair parsing downstream is shared)."""

    def __init__(self, model: str = DEFAULT_LLM_MODEL, num_ctx: int = 15000,
                 few_shot_turns: list[tuple[str, str]] | None = None):
        self.client = _OllamaClient(model, num_ctx)
        self.few_shot_turns = few_shot_turns or []

    def messages_for(self, chunk_text: str) -> list[tuple[str, str]]:
        return build_messages(
            NER_INSTRUCTION, LABEL_USER_TEMPLATE, self.few_shot_turns,
            user_input=chunk_text,
        )

    def generate_batch(self, chunk_texts: pd.Series) -> list[str]:
        return [self.client.invoke(self.messages_for(t)) for t in chunk_texts]


class OllamaRelationBackend:
    """U4 real-model backend — drop-in for relations.TemplateRelationBackend
    (same ``generate_batch(chunk_texts, entity_blocks, ents)`` protocol).
    ``entity_blocks`` is the pre-formatted "- text (label)" list the
    pipeline builds (A8), matching the reference's _format_entities
    (relation_extraction.py:108-114)."""

    def __init__(self, model: str = DEFAULT_LLM_MODEL, num_ctx: int = 15000,
                 few_shot_turns: list[tuple[str, str]] | None = None):
        self.client = _OllamaClient(model, num_ctx)
        self.few_shot_turns = few_shot_turns or []

    def messages_for(self, chunk_text: str, entity_block: str) -> list[tuple[str, str]]:
        return build_messages(
            RELATION_INSTRUCTION, RELATION_USER_TEMPLATE, self.few_shot_turns,
            text=chunk_text, entities=entity_block,
        )

    def generate_batch(self, chunk_texts: pd.Series, entity_blocks: pd.Series,
                       ents: pd.Series) -> list[str]:
        return [
            self.client.invoke(self.messages_for(t, e))
            for t, e in zip(chunk_texts, entity_blocks)
        ]


class OllamaAnswerBackend:
    """U6 real-model backend — drop-in for answer.TemplateAnswerBackend
    (same ``generate(question, context) -> str`` protocol); the <think>
    strip (F9) happens downstream in answer_question."""

    def __init__(self, model: str = ANSWER_LLM_MODEL, num_ctx: int = 16000):
        self.client = _OllamaClient(model, num_ctx)

    def messages_for(self, question: str, context: str) -> list[tuple[str, str]]:
        return build_messages(
            ANSWERING_INSTRUCTION, ANSWER_USER_TEMPLATE,
            question=question, texts=context,
        )

    def generate(self, question: str, context: str) -> str:
        return self.client.invoke(self.messages_for(question, context))


class HFTokenizerLength:
    """F11: token-count length function — deberta-v3-large
    ``len(encode(text, add_special_tokens=False))``
    (entity_extraction.py:101-102). Lazy + import-gated; plugs into
    chunk.chunk_documents_tokenized as ``length_fn_factory=HFTokenizerLength()``."""

    def __init__(self, name: str = TOKENIZER_NAME):
        self.name = name
        self._tok = None

    def __call__(self, text: str) -> int:
        if self._tok is None:
            try:
                from transformers import AutoTokenizer
            except ImportError as e:  # pragma: no cover - dep absent in CI
                raise RuntimeError(
                    "HFTokenizerLength needs the optional 'transformers' "
                    "package; the whitespace chunker is the default path"
                ) from e
            self._tok = AutoTokenizer.from_pretrained(self.name)
        return len(self._tok.encode(text, add_special_tokens=False))
