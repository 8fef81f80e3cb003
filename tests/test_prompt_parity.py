"""F12: the assembled Ollama-adapter prompts must be byte-identical to the
reference's ChatPromptTemplate output.

The reference builds each chat as system instruction + alternating few-shot
human/ai example turns + a templated user turn
(back/kgg/prompts.py:376-390). The expected sha256 prefixes below were
computed from the reference source constants (NER_instruction,
EXAMPLE_TEXT2/3/4 + outputs, GLINER_LLM_INSTRUCTION,
EXAMPLE_GLINER_INPUT1/2/4 + outputs) and the exact user-turn template
strings — so a drifted constant, reordered turn, or template change fails
here without needing langchain installed.
"""

import hashlib

from knowledgegraphbuilder_spark.functions import llm


def _h(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()[:16]


NER_EXPECTED = [
    ("system", "df25262593e8f460"),
    ("human", "6989bd78fd0835db"),
    ("ai", "e8a08793219c95cc"),
    ("human", "7a05b19e9720fc7a"),
    ("ai", "5246e8265e4ca56b"),
    ("human", "5480ceda09d089a1"),
    ("ai", "ec264e98b372e4d4"),
    ("human", "1f761a1f32fc531f"),
]

RE_EXPECTED = [
    ("system", "f1f835d6a0106ba3"),
    ("human", "46986276184b4d54"),
    ("ai", "d938f43075498ee2"),
    ("human", "b5910d72db2658ff"),
    ("ai", "15c43c465058f31a"),
    ("human", "226af2fb953e3671"),
    ("ai", "ca6ad0666e07552e"),
    ("human", "0168dbd14d915dc9"),
]


def test_ner_label_prompt_matches_reference():
    be = llm.OllamaLabelBackend.__new__(llm.OllamaLabelBackend)
    be.few_shot_turns = llm.NER_FEW_SHOT_TURNS
    msgs = be.messages_for("Some fixture text about Acme Corp.")
    assert [(r, _h(c)) for r, c in msgs] == NER_EXPECTED


def test_relation_prompt_matches_reference():
    be = llm.OllamaRelationBackend.__new__(llm.OllamaRelationBackend)
    be.few_shot_turns = llm.RELATION_FEW_SHOT_TURNS
    ent_block = "- Acme Corp (organization)\n- Berlin (location)"
    msgs = be.messages_for("chunk text here", ent_block)
    assert [(r, _h(c)) for r, c in msgs] == RE_EXPECTED


# GRAPH_ANSWERING_PROMPT (back/kgg/prompts.py:511-524): system instruction
# (prompts.py:394-428, all few-shot turns commented out in the reference)
# + "Question: {question}\n\nTexts:\n{texts}" user turn, where texts is
# "\n\n".join("[Text i] <doc text>") (graph_answering.py:32-36)
ANSWER_EXPECTED = [
    ("system", "47ed99f69f56dfcb"),
    ("human", "1420ed5ebbda1868"),
]


def test_answer_prompt_matches_reference():
    be = llm.OllamaAnswerBackend.__new__(llm.OllamaAnswerBackend)
    context = "[Text 1] Spark is a distributed engine."
    msgs = be.messages_for("What is Spark?", context)
    assert [(r, _h(c)) for r, c in msgs] == ANSWER_EXPECTED


def test_defaults_are_the_reference_examples():
    """Constructing the backends without arguments must wire the reference
    example turns (3 each); [] opts into zero-shot."""
    lb = llm.OllamaLabelBackend()
    rb = llm.OllamaRelationBackend()
    assert lb.few_shot_turns == llm.NER_FEW_SHOT_TURNS
    assert rb.few_shot_turns == llm.RELATION_FEW_SHOT_TURNS
    assert len(llm.NER_FEW_SHOT_TURNS) == 3
    assert len(llm.RELATION_FEW_SHOT_TURNS) == 3
    assert llm.OllamaLabelBackend(few_shot_turns=[]).few_shot_turns == []
