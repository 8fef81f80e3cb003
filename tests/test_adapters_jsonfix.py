"""Real-model adapter surface (U3/U4/U6 + F11) and F6 repair parsing.

The adapters are import-gated (no Ollama / transformers in CI); these tests
pin the prompt *structure* — slot filling, message roles, reference model
constants — and the repair chain on adversarial malformed LLM output.
"""

import pytest

from knowledgegraphbuilder_spark.functions import llm
from knowledgegraphbuilder_spark.functions.jsonfix import (
    parse_label_list,
    repair_json_array,
)
from knowledgegraphbuilder_spark.operators.chunk import (
    chunk_words,
    chunk_words_tokenized,
)


# ---------------------------------------------------------------------------
# prompt structure
# ---------------------------------------------------------------------------

def test_label_backend_messages():
    be = llm.OllamaLabelBackend()
    msgs = be.messages_for("Acme hired Jo.")
    assert msgs[0] == ("system", llm.NER_INSTRUCTION)
    assert msgs[-1] == ("human", "Acme hired Jo.")
    assert be.client.model == "phi4:14b-q4_K_M"  # back/kgg/config.py:11
    assert be.client.num_ctx == 15000  # back/kgg/utils.py:4-11


def test_relation_backend_messages():
    be = llm.OllamaRelationBackend()
    msgs = be.messages_for("Acme hired Jo.", "- Acme (org)\n- Jo (person)")
    assert msgs[0] == ("system", llm.RELATION_INSTRUCTION)
    # GLINER_LLM_PROMPT user template (prompts.py:386-388)
    assert msgs[-1][1] == "Text: Acme hired Jo.\n\nDetected entities:\n- Acme (org)\n- Jo (person)"
    # output contract the downstream fence/JSON parser depends on
    assert '"head"' in llm.RELATION_INSTRUCTION
    assert '"relation"' in llm.RELATION_INSTRUCTION


def test_answer_backend_messages():
    be = llm.OllamaAnswerBackend()
    msgs = be.messages_for("what is X?", "[Text 1] X is Y.")
    assert msgs[0][0] == "system"
    assert msgs[-1][1] == "Question: what is X?\n\nTexts:\n[Text 1] X is Y."
    assert be.client.model == "deepseek-r1:14b"  # graph_answering.py:17
    assert be.client.num_ctx == 16000


def test_few_shot_turns_interleave():
    be = llm.OllamaLabelBackend(few_shot_turns=[("ex in", "ex out")])
    msgs = be.messages_for("x")
    assert [m[0] for m in msgs] == ["system", "human", "ai", "human"]


def test_ollama_client_gated():
    be = llm.OllamaLabelBackend()
    with pytest.raises(RuntimeError, match="langchain_ollama"):
        be.generate_batch(["text"])


def test_hf_tokenizer_gated():
    fn = llm.HFTokenizerLength()
    assert fn.name == "microsoft/deberta-v3-large"  # entity_extraction.py:27
    with pytest.raises(RuntimeError, match="transformers"):
        fn("hello world")


# ---------------------------------------------------------------------------
# F6 repair chain — adversarial malformed model output
# ---------------------------------------------------------------------------

def test_parse_well_formed():
    assert parse_label_list('noise ["Person", "Organization"] trailing') == [
        "organization", "person"]


def test_parse_single_quotes():
    assert parse_label_list("['person', 'organization']") == ["organization", "person"]


def test_parse_trailing_comma():
    assert parse_label_list('["person", "event",]') == ["event", "person"]


def test_parse_bare_tokens():
    assert parse_label_list("[person, organization, event]") == [
        "event", "organization", "person"]


def test_parse_single_quote_inside_label():
    # the reference's repair path: apostrophes inside double-quoted labels
    assert parse_label_list('["person\'s role", "event"]') == ["event", "person's_role"]


def test_parse_mixed_quotes_and_numbers():
    assert parse_label_list("['a', \"b\", 3, true]") == ["3", "a", "b", "true"]


def test_parse_space_normalization():
    assert parse_label_list('[" Legal  Entity "]') == ["legal__entity"]


def test_parse_newlines_inside():
    assert parse_label_list('[\n  "person",\n  "org"\n]') == ["org", "person"]


def test_parse_no_list():
    assert parse_label_list("I could not find any labels.") == []
    assert parse_label_list("") == []


def test_repair_is_valid_json():
    import json

    for s in ("['a','b']", "[a, b,]", "['x\"y', z]"):
        json.loads(repair_json_array(s))


# ---------------------------------------------------------------------------
# F11 token-budgeted chunker
# ---------------------------------------------------------------------------

def fake_token_len(word: str) -> int:
    """Deterministic stand-in tokenizer: ~1 token per 4 chars (BPE-ish)."""
    return max((len(word) + 3) // 4, 1)


def test_tokenized_chunker_budget_and_coverage():
    text = " ".join(f"word{i:03d}" for i in range(500))
    chunks = chunk_words_tokenized(text, size=100, overlap=15, token_len=fake_token_len)
    words = text.split(" ")
    covered = set()
    for ci, ctext, off, woff, nw in chunks:
        # exact offsets: chunk text is the literal substring at its offset
        assert text[off : off + len(ctext)] == ctext
        toks = sum(fake_token_len(w) for w in ctext.split(" "))
        assert toks <= 100
        covered.update(range(woff, woff + nw))
    assert covered == set(range(len(words)))  # no word lost


def test_tokenized_chunker_overlap_tokens():
    text = " ".join(f"w{i}" for i in range(200))
    chunks = chunk_words_tokenized(text, size=50, overlap=10, token_len=fake_token_len)
    for (_, _, _, woff_a, nw_a), (_, _, _, woff_b, _) in zip(chunks, chunks[1:]):
        shared = range(woff_b, woff_a + nw_a)
        shared_tokens = sum(fake_token_len(f"w{i}") for i in shared)
        assert shared_tokens >= 10


def test_tokenized_chunker_unit_tokens_matches_word_chunker():
    # with a constant-1 token length, the token chunker degenerates to the
    # word chunker (same windows, same offsets)
    text = " ".join(f"t{i}" for i in range(350))
    want = chunk_words(text, 100, 85)
    got = chunk_words_tokenized(text, size=100, overlap=15, token_len=lambda w: 1)
    assert got == want


def test_chunker_repeated_substrings_exact_offsets():
    """Adversarial fixture: the document is one chunk-sized phrase repeated —
    the reference's monotone ``str.find`` re-anchoring could mis-anchor a
    later chunk onto an earlier identical occurrence; exact-offset chunking
    must keep every offset strictly increasing and every substring exact."""
    phrase = " ".join(["alpha beta gamma delta"] * 25)  # 100 words
    text = " ".join([phrase] * 4)  # 400 words, period 100
    for chunker in (
        lambda: chunk_words(text, 100, 85),
        lambda: chunk_words_tokenized(text, 100, 15, lambda w: 1),
    ):
        chunks = chunker()
        offs = [off for _, _, off, _, _ in chunks]
        assert offs == sorted(set(offs))  # strictly increasing, no re-anchor
        for _, ctext, off, _, _ in chunks:
            assert text[off : off + len(ctext)] == ctext


# hypothesis fuzz: the repair chain must never raise and always normalize
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.text(max_size=300))
    @settings(max_examples=300, deadline=None)
    def test_parse_label_list_never_raises(s):
        out = parse_label_list(s)
        assert isinstance(out, list)
        for lb in out:
            assert isinstance(lb, str) and lb == lb.lower().strip()
            assert " " not in lb

    @given(st.lists(st.text(alphabet=st.characters(
        blacklist_characters="\x00"), max_size=20), max_size=8))
    @settings(max_examples=200, deadline=None)
    def test_parse_roundtrip_json_lists(items):
        """A well-formed JSON list must parse to exactly its normalized,
        non-empty distinct items."""
        import json as _json

        text = "prefix " + _json.dumps(items) + " suffix"
        want = sorted({i.lower().strip().replace(" ", "_") for i in items
                       if i.lower().strip().replace(" ", "_")})
        # bracket-regex extracts the FIRST balanced-ish [...] — items
        # containing brackets can truncate the match, as in the reference
        if not any(("[" in i) or ("]" in i) for i in items):
            assert parse_label_list(text) == want
except ImportError:  # pragma: no cover
    pass
