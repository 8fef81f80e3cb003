"""Distributed BPE vocabulary induction (Sennrich et al. 2016) — unrolled
merge rounds over the word-frequency table.

Training-data pipelines induce tokenizer vocabularies from the corpus they
curate; at 100 TB the classic trick is that BPE never touches the corpus
after one pass: pair statistics live on the DEDUPLICATED (word, freq) table
(vocabulary-scaled, ~10^7 rows for web text, not 10^12), so each merge round
is one map-side-combinable weighted pair count plus an argmax, and the
chosen merge broadcasts back into a per-word array rewrite. R rounds = R
tiny jobs over the vocab table.

Exact GREEDY merge semantics, partition-invariant: occurrences of a pair
(a, b) in one word can only overlap when a == b (runs like "aaa"); greedy
left-to-right keeps the run's even offsets, which is pure position
arithmetic — ``kept[i] = matched[i] AND (i - run_start(i)) % 2 == 0`` —
no sequential fold, no UDF, and byte-for-byte replayable in the DuckDB
oracle with the same comprehensions (words are short, so the O(L^2)
run-start scan inside the array expression is bounded by max word length).

The per-round argmax is a ``limit(1).collect()`` — one row per round, the
same tiny-driver-probe pattern as ann_ivf's nprobe pick: the merge RULE is
driver-side by nature (it is the model being trained), the merge WORK stays
distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "\\'")


def bpe_merges(
    spark: SparkSession,
    docs: DataFrame,
    rounds: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Induce the first ``rounds`` BPE merges from a document corpus.
    Output: (rank, left_sym, right_sym, cnt) — merge #rank joined those
    symbols, whose weighted adjacent-pair count was cnt at that round.
    Ties break on (cnt desc, left_sym, right_sym)."""
    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
        .withColumn(
            "s",
            F.expr("transform(sequence(1, length(word)), "
                   "i -> substring(word, i, 1))"),
        )
        .localCheckpoint(eager=True)
    )
    merges = []
    for r in range(1, rounds + 1):
        pairs = (
            words.select(
                "freq",
                F.explode(F.expr(
                    # single-char words have no pairs; Spark's
                    # sequence(0, -1) DESCENDS, so guard explicitly
                    "CASE WHEN size(s) < 2 THEN "
                    "array() ELSE transform(sequence(0, size(s) - 2), i -> "
                    "named_struct('a', s[i], 'b', s[i + 1])) END"
                )).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").cast("long").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), "a", "b").limit(1).collect()
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], best[0]["cnt"]
        merges.append((r, a, b, int(cnt)))
        ea, eb = _esc(a), _esc(b)
        words = (
            words.withColumn(
                "m",
                F.expr(f"CASE WHEN size(s) < 2 THEN array() ELSE "
                       f"transform(sequence(0, size(s) - 2), "
                       f"i -> s[i] = '{ea}' AND s[i + 1] = '{eb}') END"),
            )
            .withColumn(
                "kept",
                F.expr(
                    "transform(m, (x, i) -> x AND ((i - (if(i = 0, -1, "
                    "aggregate(sequence(0, i - 1), -1, "
                    "(acc, j) -> if(NOT m[j], j, acc))) + 1)) % 2 = 0))"
                ),
            )
            .withColumn(
                "s",
                # get() (0-based, null out of range) keeps every index
                # ANSI-safe; null conditions fall through to ELSE x
                F.expr(
                    "filter(transform(s, (x, i) -> CASE "
                    "WHEN coalesce(get(kept, i), false) "
                    "THEN concat(x, get(s, i + 1)) "
                    "WHEN coalesce(get(kept, i - 1), false) THEN NULL "
                    "ELSE x END), x -> x IS NOT NULL)"
                ),
            )
            .drop("m", "kept")
            .localCheckpoint(eager=True)
        )
    return spark.createDataFrame(
        merges, "rank int, left_sym string, right_sym string, cnt long"
    )
