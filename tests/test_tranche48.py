"""Unit tests for the tranche-48 operators: interleave context profile,
packing efficiency, power-law MLE."""

import math

from knowledgegraphbuilder_spark.operators.curation import (
    pack_efficiency,
    pack_sequences,
)
from knowledgegraphbuilder_spark.operators.mlstats import powerlaw_alpha
from knowledgegraphbuilder_spark.operators.multimodal import context_profile

SPAN_SCHEMA = (
    "doc_id string, spans array<struct<"
    "kind:string,text:string,media_ref:string,offset:int>>"
)


class TestContextProfile:
    def test_context_resets_at_each_media(self, spark):
        rows = [
            ("d1", [("text", "12345", None, 0),
                    ("image", None, "m1", 5),
                    ("text", "123", None, 5),
                    ("image", None, "m2", 8)]),
            ("d2", [("image", None, "m3", 0),     # doc starts with media
                    ("text", "xx", None, 0)]),
        ]
        df = spark.createDataFrame(rows, SPAN_SCHEMA)
        out = {r["media_type"]: r for r in context_profile(df).collect()}
        img = out["image"]
        # contexts: m1 -> 5, m2 -> 3, m3 -> 0
        assert img["n_media"] == 3
        assert img["min_context"] == 0
        assert img["max_context"] == 5
        assert img["mean_context"] == round(8 / 3, 6)


class TestPackEfficiency:
    def test_fill_accounting(self, spark):
        # one shard, two docs of 3 + 4 tokens at seq_len 5:
        # 7 tokens -> 2 seqs, 3 pad tokens, fill 0.7
        rows = [(0, "a b c"), (8, "a b c d")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        packed = pack_sequences(df, seq_len=5, n_shards=1)
        r = pack_efficiency(packed, seq_len=5).collect()[0]
        assert r["n_docs"] == 2
        assert r["total_tokens"] == 7
        assert r["n_seqs"] == 2
        assert r["pad_tokens"] == 3
        assert r["fill_ratio"] == 0.7

    def test_exact_multiple_has_zero_pad(self, spark):
        rows = [(0, "a b c d e")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        r = pack_efficiency(
            pack_sequences(df, seq_len=5, n_shards=1), seq_len=5
        ).collect()[0]
        assert r["pad_tokens"] == 0
        assert r["fill_ratio"] == 1.0


class TestPowerlaw:
    def test_hand_computed_alpha(self, spark):
        # values: 1 x3, 2 x2, 4 x1  (n=6)
        rows = [(v,) for v in [1, 1, 1, 2, 2, 4]]
        df = spark.createDataFrame(rows, "x long")
        r = powerlaw_alpha(df, "x").collect()[0]
        denom = 3 * math.log(1 / 0.5) + 2 * math.log(2 / 0.5) + math.log(4 / 0.5)
        assert r["n"] == 6
        assert r["alpha"] == round(1 + 6 / denom, 6)

    def test_xmin_filters_tail(self, spark):
        rows = [(v,) for v in [1, 1, 5, 9]]
        df = spark.createDataFrame(rows, "x long")
        r = powerlaw_alpha(df, "x", x_min=2).collect()[0]
        assert r["n"] == 2
        denom = math.log(5 / 1.5) + math.log(9 / 1.5)
        assert r["alpha"] == round(1 + 2 / denom, 6)
