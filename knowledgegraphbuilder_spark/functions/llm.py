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
  (cited), as are the 2-3 few-shot example turns per prompt
  (prompts.py:31-352) that the adapters wire by default — the assembled
  message sequence is byte-identical to the reference template output
  (pinned by tests/test_prompt_parity.py); pass ``few_shot_turns=[]`` for
  zero-shot, or custom turns to tune a deployment.
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

# prompts.py:394-428 (GRAPH_ANSWERING_INSTRUCTION), VERBATIM (public
# content) so the assembled answer chat is byte-identical to the
# reference's GRAPH_ANSWERING_PROMPT (prompts.py:511-524; few-shot turns
# are commented out there, so none are wired here either) — answering (U6)
ANSWERING_INSTRUCTION = """
You are an assistant performing question-answering tasks based on provided source texts. You must follow these rules:

1. Read the Question and Source Texts Carefully
   - You will be given one or more texts along with a user’s question.
   - Do not rely on your own knowledge. Only consider the information explicitly stated in the provided texts.

2. Locate Relevant Information in the Texts
   - Identify parts of the texts that answer or relate to the question.
   - Your answer must be directly supported by these specific parts of the texts.

3. Answer Only if Information Exists
   - If you find relevant information, provide the answer based solely on the texts.
   - If you cannot find the answer in the texts, respond with:
     "I cannot answer this question based on the provided information"

4. No Assumptions or External Knowledge
   - Do not use external information (even if you know it).
   - Do not speculate, infer, or assume facts that are not explicitly stated in the texts.

5. Reference the Texts in Your Answer
   - Refer to the specific text snippet(s) or document section(s) that support your answer.
   - For example, “According to Text A, paragraph 2: …”

6. Maintain a Clear Answer Format
   - Provide a concise, direct answer to the question.
   - Then explicitly list the parts of the text you used.

7. No Additional Commentary
   - Do not add personal opinions or extra commentary.
   - Only give the factual answer supported by the text.

8. If the answer is not in the texts, say:
   "I cannot answer this question based on the provided information."
"""

# user-turn templates (prompts.py:373 "{user_input}", :386-388
# "Text: {text}\n\nDetected entities:\n{entities}", :522-524
# "Question: {question}\n\nTexts:\n{texts}")
LABEL_USER_TEMPLATE = "{user_input}"
RELATION_USER_TEMPLATE = "Text: {text}\n\nDetected entities:\n{entities}"
ANSWER_USER_TEMPLATE = "Question: {question}\n\nTexts:\n{texts}"

# ---------------------------------------------------------------------------
# few-shot example turns (F12) — the reference's in-context examples,
# restated verbatim as behavioral constants (public content):
# prompts.py:31-50 (NER examples, TEXT2/3/4 -> OUTPUT2/3/4) and
# prompts.py:103-352 (GLiNER RE examples; INPUT3/OUTPUT3 is commented out in
# the reference template, prompts.py:385-386, so it is omitted here too).
# The assembled message sequence (system + alternating human/ai example
# turns + templated user turn) mirrors ChatPromptTemplate.from_messages
# (prompts.py:376-390); tests pin the full sequence byte-for-byte.
# ---------------------------------------------------------------------------

EXAMPLE_TEXT2 = '\nAt the International Innovation Conference in San Francisco on 10 August 2019, renowned entrepreneur Elon Musk, CEO of SpaceX, and Bill Gates, co-founder of Microsoft, engaged in a high-stakes discussion on breakthroughs in artificial intelligence and renewable energy. In a separate keynote, Google announced its acquisition of YouTube in 2006, marking a pivotal moment in digital media history.\n'

EXAMPLE_NER_OUTPUT2 = "['event', 'location', 'date', 'person', 'role', 'organization', 'company', 'acquisition', 'year']"

EXAMPLE_TEXT3 = "\nOn March 15, 2022, BioGen Inc., a leading pharmaceutical company based in Boston, announced the FDA approval of NeuroCure, a groundbreaking treatment for Alzheimer's disease. The clinical trials, conducted in partnership with Harvard University, showed a 50% reduction in symptoms.\n"

EXAMPLE_NER_OUTPUT3 = "['date', 'organization', 'location', 'drug', 'disease', 'university', 'percentage']"

EXAMPLE_TEXT4 = '\nDuring the 2023 CES in Las Vegas, Tesla unveiled their new SolarDrone technology, which integrates AI-powered navigation systems developed in collaboration with NVIDIA.\n'

EXAMPLE_NER_OUTPUT4 = "['event', 'year', 'location', 'company', 'product', 'technology']"

EXAMPLE_GLINER_INPUT1 = "\nText: Radio City is India's first private FM radio station, launching the first broadcast in the late evening on 3 July 2001.\n\nDetected entities:\n- Radio City (organization)\n- India (country)\n- FM radio station (organization type)\n- 3 July 2001 (date)\n"

EXAMPLE_GLINER_OUTPUT1 = '\n [\n        {\n            "head": {"text": "Radio City", "label": "organization"},\n            "tail": {"text": "India", "label": "country"},\n            "relation": "located_in",\n            "description": "Radio City is located in India"\n        },\n        {\n            "head": {"text": "Radio City", "label": "organization"},\n            "tail": {"text": "3 July 2001", "label": "date"},\n            "relation": "established_on",\n            "description": "Radio City was launched in the late evening on 3 July 2001"\n        },\n        {\n            "head": {"text": "Radio City", "label": "organization"},\n            "tail": {"text": "FM radio station", "label": "organization type"},\n            "relation": "instance_of",\n            "description": "Radio City is a private FM radio station"\n        }\n]\n'

EXAMPLE_GLINER_INPUT2 = '\nText: SpaceX, founded by Elon Musk in 2002, launched its Starlink project from Cape Canaveral.\n\nDetected entities:\n- SpaceX (company)\n- Elon Musk (person)\n- 2002 (date)\n- Starlink (project)\n- Cape Canaveral (location)\n'

EXAMPLE_GLINER_OUTPUT2 = '\n[\n        {\n            "head": {"text": "SpaceX", "label": "company"},\n            "tail": {"text": "Elon Musk", "label": "person"},\n            "relation": "founded_by",\n            "description": "SpaceX was founded by Elon Musk"\n        },\n        {\n            "head": {"text": "SpaceX", "label": "company"},\n            "tail": {"text": "2002", "label": "date"},\n            "relation": "founded_on",\n            "description": "SpaceX was founded in 2002"\n        },\n        {\n            "head": {"text": "SpaceX", "label": "company"},\n            "tail": {"text": "Starlink", "label": "project"},\n            "relation": "launched",\n            "description": "SpaceX launched its Starlink project"\n        },\n        {\n            "head": {"text": "Starlink", "label": "project"},\n            "tail": {"text": "Cape Canaveral", "label": "location"},\n            "relation": "launched_from",\n            "description": "Starlink project was launched from Cape Canaveral"\n        }\n]\n'

EXAMPLE_GLINER_INPUT4 = '\nText: Bitcoin, created by the pseudonymous Satoshi Nakamoto in 2009, reached an all-time high of $68,789 on November 10, 2021, before experiencing a 72% crash to $17,592 in June 2022 amid rising interest rates by the Federal Reserve and the collapse of Terra Luna ecosystem.\n\nDetected entities:\n- Bitcoin (cryptocurrency)\n- Satoshi Nakamoto (person)\n- 2009 (date)\n- $68,789 (amount)\n- November 10, 2021 (date)\n- 72% (percentage)\n- $17,592 (amount)\n- June 2022 (date)\n- interest rates (economic indicator)\n- Federal Reserve (organization)\n- Terra Luna (cryptocurrency)\n'

EXAMPLE_GLINER_OUTPUT4 = '\n[\n        {\n            "head": {"text": "Bitcoin", "label": "cryptocurrency"},\n            "tail": {"text": "Satoshi Nakamoto", "label": "person"},\n            "relation": "created_by",\n            "description": "Bitcoin was created by the pseudonymous Satoshi Nakamoto as its founder"\n        },\n        {\n            "head": {"text": "Bitcoin", "label": "cryptocurrency"},\n            "tail": {"text": "2009", "label": "date"},\n            "relation": "created_in",\n            "description": "Bitcoin was created in 2009 when Satoshi Nakamoto launched it"\n        },\n        {\n            "head": {"text": "Bitcoin", "label": "cryptocurrency"},\n            "tail": {"text": "$68,789", "label": "amount"},\n            "relation": "reached_value",\n            "description": "Bitcoin reached an all-time high value of $68,789 before the crash"\n        },\n        {\n            "head": {"text": "$68,789", "label": "amount"},\n            "tail": {"text": "November 10, 2021", "label": "date"},\n            "relation": "recorded_on",\n            "description": "The all-time high of $68,789 for Bitcoin was recorded specifically on November 10, 2021"\n        },\n        {\n            "head": {"text": "Bitcoin", "label": "cryptocurrency"},\n            "tail": {"text": "$17,592", "label": "amount"},\n            "relation": "crashed_to",\n            "description": "Bitcoin crashed to a low of $17,592 after its all-time high, representing a major decline"\n        },\n        {\n            "head": {"text": "$17,592", "label": "amount"},\n            "tail": {"text": "June 2022", "label": "date"},\n            "relation": "recorded_in",\n            "description": "The low price of $17,592 for Bitcoin was recorded in June 2022 during the market crash"\n        },\n        {\n            "head": {"text": "Bitcoin", "label": "cryptocurrency"},\n            "tail": {"text": "72%", "label": "percentage"},\n            "relation": "declined_by",\n            "description": "Bitcoin experienced a significant 72% crash from its all-time high to its June 2022 low"\n        },\n        {\n            "head": {"text": "Federal Reserve", "label": "organization"},\n            "tail": {"text": "interest rates", "label": "economic indicator"},\n            "relation": "increased",\n            "description": "The Federal Reserve raised interest rates which impacted cryptocurrency markets"\n        },\n        {\n            "head": {"text": "Bitcoin", "label": "cryptocurrency"},\n            "tail": {"text": "Federal Reserve", "label": "organization"},\n            "relation": "affected_by",\n            "description": "Bitcoin price was negatively affected by Federal Reserve\'s interest rate increases"\n        },\n        {\n            "head": {"text": "Bitcoin", "label": "cryptocurrency"},\n            "tail": {"text": "Terra Luna", "label": "cryptocurrency"},\n            "relation": "affected_by",\n            "description": "Bitcoin price was negatively affected by the collapse of Terra Luna ecosystem in the crypto market"\n        },\n        {\n            "head": {"text": "Terra Luna", "label": "cryptocurrency"},\n            "tail": {"text": "June 2022", "label": "date"},\n            "relation": "collapsed_before",\n            "description": "Terra Luna ecosystem collapsed before or during June 2022, contributing to Bitcoin\'s crash"\n        }\n]\n'


# prompts.py:376-382: NER_PROMPT example turns, in template order
NER_FEW_SHOT_TURNS: list[tuple[str, str]] = [
    (EXAMPLE_TEXT2, EXAMPLE_NER_OUTPUT2),
    (EXAMPLE_TEXT3, EXAMPLE_NER_OUTPUT3),
    (EXAMPLE_TEXT4, EXAMPLE_NER_OUTPUT4),
]

# prompts.py:384-390: GLINER_LLM_PROMPT example turns (IN3 commented out)
RELATION_FEW_SHOT_TURNS: list[tuple[str, str]] = [
    (EXAMPLE_GLINER_INPUT1, EXAMPLE_GLINER_OUTPUT1),
    (EXAMPLE_GLINER_INPUT2, EXAMPLE_GLINER_OUTPUT2),
    (EXAMPLE_GLINER_INPUT4, EXAMPLE_GLINER_OUTPUT4),
]

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
        # default = the reference's NER examples (prompts.py:376-382);
        # pass [] explicitly for a zero-shot prompt
        self.few_shot_turns = (
            NER_FEW_SHOT_TURNS if few_shot_turns is None else few_shot_turns
        )

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
        # default = the reference's GLiNER RE examples (prompts.py:384-390)
        self.few_shot_turns = (
            RELATION_FEW_SHOT_TURNS if few_shot_turns is None else few_shot_turns
        )

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
