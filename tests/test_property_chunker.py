"""Property-based tests (hypothesis) on the pure-python cores shared with the
Spark UDFs — fast (no Spark session needed)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from knowledgegraphbuilder_spark.operators.chunk import chunk_words
from knowledgegraphbuilder_spark.operators.ner import GazetteerExtractor
from knowledgegraphbuilder_spark.operators.answer import strip_think

words = st.lists(
    st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=12),
    min_size=1, max_size=800,
)


@settings(max_examples=200, deadline=None)
@given(words, st.integers(2, 50), st.integers(1, 20))
def test_chunk_offsets_and_coverage(ws, size, overlap):
    overlap = min(overlap, size - 1)
    text = " ".join(ws)
    chunks = chunk_words(text, size, size - overlap)
    # exact substring at stated offset
    for ci, ctext, off, woff, nw in chunks:
        assert text[off : off + len(ctext)] == ctext
        assert ctext.split(" ") == ws[woff : woff + nw]
    # chunk indices contiguous from 0, strides exact
    assert [c[0] for c in chunks] == list(range(len(chunks)))
    # every word covered by at least one chunk
    covered = set()
    for _, _, _, woff, nw in chunks:
        covered.update(range(woff, woff + nw))
    assert covered == set(range(len(ws)))
    # consecutive chunks overlap by exactly `overlap` words (except tail)
    for (_, _, _, w1, n1), (_, _, _, w2, _) in zip(chunks, chunks[1:]):
        assert w2 == w1 + size - overlap


@settings(max_examples=100, deadline=None)
@given(words)
def test_gazetteer_offsets_exact(ws):
    text = " ".join(ws)
    gaz = GazetteerExtractor((("spark", "technology"), ("a", "letter")))
    [ents] = gaz.extract_batch([text])
    for e in ents:
        assert text[e["start"] : e["end"]] == e["text"]
        assert text.split(" ")[e["word_idx"]] == e["text"]


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200), st.text(max_size=200))
def test_strip_think(pre, post):
    pre = pre.replace("<think>", "").replace("</think>", "")
    post = post.replace("<think>", "").replace("</think>", "")
    s = f"{pre}<think>some\nreasoning</think>{post}"
    assert strip_think(s) == (pre + post).strip()


# ---------------------------------------------------------------------------
# chunk-boundary adversarial fixtures: repeated chunk-sized substrings
# ---------------------------------------------------------------------------

def _reference_find_anchor(text, chunks):
    """The reference's monotone re-anchoring: chunk_offset =
    text.find(chunk_text, chunk_offset), where chunk_offset starts at the
    PREVIOUS chunk's start (back/kgg/nodes/entity_extraction.py:48-50)."""
    offs = []
    chunk_offset = 0
    for ctext in chunks:
        chunk_offset = text.find(ctext, chunk_offset)
        offs.append(chunk_offset)
    return offs


def test_repeated_chunk_text_exact_offsets():
    """A document made of one repeated word: every chunk's TEXT is identical,
    so find-based re-anchoring collapses consecutive chunks onto the first
    occurrence — our construction-time offsets stay exact and strictly
    increasing."""
    ws = ["ab"] * 40
    text = " ".join(ws)
    chunks = chunk_words(text, size=10, stride=5)
    ours = [c[2] for c in chunks]
    # exact substring at the stated offset + strictly increasing
    for ci, ctext, off, woff, nw in chunks:
        assert text[off : off + len(ctext)] == ctext
    assert ours == sorted(set(ours))
    assert ours[1] == 5 * 3  # word stride 5, "ab " = 3 chars
    # the reference's monotone find anchors every full-size chunk at the
    # PREVIOUS chunk's start (the duplicate text matches there first)
    ref = _reference_find_anchor(text, [c[1] for c in chunks])
    assert ref != ours
    assert ref[1] == ref[0] == 0  # collided — the documented failure mode


def test_periodic_text_with_decoy_duplicate():
    """Periodic words with a decoy: a later chunk's exact text also occurs
    earlier in the document (inside a previous chunk's span). Exact offsets
    must point at the true window, not the decoy occurrence."""
    # period-3 word pattern; chunk size 6 / stride 3 makes every chunk text
    # equal to the one two strides earlier
    ws = (["u", "v", "w"] * 10)
    text = " ".join(ws)
    chunks = chunk_words(text, size=6, stride=3)
    for ci, ctext, off, woff, nw in chunks:
        assert text[off : off + len(ctext)] == ctext
        assert off == sum(len(w) + 1 for w in ws[:woff])
    # every non-tail chunk text is a duplicate of chunk 0's text
    texts = [c[1] for c in chunks]
    assert texts[1] == texts[0] or texts[2] == texts[0]


@settings(max_examples=150, deadline=None)
@given(words, st.integers(4, 60), st.integers(0, 20))
def test_tokenized_chunker_overlap_edge(ws, size, overlap):
    """Token-budgeted chunker (F11) at the overlap edge: exact offsets,
    full coverage, forward progress, and >= `overlap` shared tokens between
    consecutive chunks unless bounded by the previous chunk's start."""
    from knowledgegraphbuilder_spark.operators.chunk import chunk_words_tokenized

    overlap = min(overlap, size - 1)
    token_len = len  # 1 token per char: adversarially uneven budgets
    text = " ".join(ws)
    chunks = chunk_words_tokenized(text, size, overlap, token_len)
    tlens = [max(len(w), 1) for w in ws]
    for ci, ctext, off, woff, nw in chunks:
        assert text[off : off + len(ctext)] == ctext
        assert nw >= 1
    # coverage + contiguity of word windows
    covered = set()
    for _, _, _, woff, nw in chunks:
        covered.update(range(woff, woff + nw))
    assert covered == set(range(len(ws)))
    # forward progress + overlap contract
    for (_, _, _, w1, n1), (_, _, _, w2, _) in zip(chunks, chunks[1:]):
        assert w1 < w2 <= w1 + n1  # starts advance; windows touch or overlap
        shared = sum(tlens[w2 : w1 + n1])
        # >= overlap shared tokens OR the backup hit the previous start + 1
        assert shared >= min(overlap, sum(tlens[w1 + 1 : w1 + n1]))
