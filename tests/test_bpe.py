"""BPE induction vs a straightforward Python reference (greedy left-to-right
merges, (cnt desc, a, b) tie-break), including same-symbol runs."""

from collections import Counter

from knowledgegraphbuilder_spark.operators.bpe import bpe_merges


def _py_bpe(texts, rounds):
    words = Counter(w for t in texts for w in t.split(" ") if w)
    syms = {w: [c for c in w] for w in words}
    merges = []
    for r in range(1, rounds + 1):
        cnt = Counter()
        for w, f in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += f
        if not cnt:
            break
        (a, b), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, a, b, c))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def test_bpe_matches_python_reference(spark):
    texts = [
        "banana bandana cabana banana",
        "aaaaaa aaa aa banana",        # same-symbol runs (greedy parity)
        "abab ababab abababab",        # chained overlapping-ish merges
        "x y z zz xyxy",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    for rounds in (1, 3, 6):
        got = [tuple(r) for r in bpe_merges(spark, df, rounds=rounds).collect()]
        assert got == _py_bpe(texts, rounds)


def test_bpe_single_char_words_and_exhaustion(spark):
    df = spark.createDataFrame([(0, "a b c a b")], "doc_id long, text string")
    # no adjacent pairs inside any word -> zero merges, not an error
    assert bpe_merges(spark, df, rounds=3).collect() == []
