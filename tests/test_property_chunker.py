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
