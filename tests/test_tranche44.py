"""Unit tests for the tranche-44 multimodal accounting operators:
caption_stats, media_budget, phash_buckets."""

import hashlib

from knowledgegraphbuilder_spark.operators.multimodal import (
    caption_stats,
    media_budget,
    phash_buckets,
)

SPAN_SCHEMA = (
    "doc_id string, spans array<struct<"
    "kind:string,text:string,media_ref:string,offset:int>>"
)


def _txt(t, off=0):
    return ("text", t, None, off)


def _img(ref, off=0):
    return ("image", None, ref, off)


class TestCaptionStats:
    def test_prev_next_uncaptioned_buckets(self, spark):
        rows = [
            # image after text -> preceding caption
            ("d1", [_txt("a cat"), _img("media://img/d1/0", 5)]),
            # image before the only text -> following-only caption
            ("d2", [_img("media://img/d2/0"), _txt("dog!", 0)]),
            # no text at all -> uncaptioned
            ("d3", [_img("media://img/d3/0")]),
        ]
        df = spark.createDataFrame(rows, SPAN_SCHEMA)
        out = {r["media_type"]: r for r in caption_stats(df).collect()}
        img = out["image"]
        assert img["n_media"] == 3
        assert img["n_prev_caption"] == 1
        assert img["n_next_only"] == 1
        assert img["n_uncaptioned"] == 1
        # captions seen: "a cat" (5) and "dog!" (4); uncaptioned excluded
        assert img["mean_caption_len"] == round((5 + 4) / 2, 6)

    def test_nearest_preceding_text_wins(self, spark):
        rows = [("d1", [_txt("first"), _txt("second"), _img("m", 11)])]
        df = spark.createDataFrame(rows, SPAN_SCHEMA)
        r = caption_stats(df).collect()[0]
        # caption is "second" (len 6), not "first"
        assert r["mean_caption_len"] == 6.0


class TestMediaBudget:
    def test_deterministic_fetch_sizes(self, spark):
        ref = "media://img/d1/0"
        size = 256 + hashlib.sha256(ref.encode()).digest()[0]
        rows = [("d1", [_txt("x" * 100), _img(ref, 100)])]
        df = spark.createDataFrame(rows, SPAN_SCHEMA)
        r = media_budget(df).collect()
        assert len(r) == 1
        b = r[0]
        assert b["media_type"] == "image"
        assert b["n_refs"] == 1
        assert b["total_bytes"] == size
        assert b["mean_bytes"] == float(size)
        assert b["bytes_per_kilochar"] == round(size * 1000.0 / 100, 6)

    def test_refs_deduplicated_before_fetch(self, spark):
        ref = "media://img/shared/0"
        rows = [
            ("d1", [_txt("aa"), _img(ref, 2)]),
            ("d2", [_txt("bb"), _img(ref, 2)]),
        ]
        df = spark.createDataFrame(rows, SPAN_SCHEMA)
        assert media_budget(df).collect()[0]["n_refs"] == 1


class TestPhashBuckets:
    def test_histogram_matches_python_hash(self, spark):
        refs = [f"media://img/d{i}/0" for i in range(40)]
        rows = [(f"d{i}", [_img(refs[i])]) for i in range(40)]
        df = spark.createDataFrame(rows, SPAN_SCHEMA)

        def bucket(r):
            return hashlib.sha256(r.encode()).digest()[0] % 256

        sizes = {}
        for r in refs:
            sizes[bucket(r)] = sizes.get(bucket(r), 0) + 1
        want_hist = {}
        for sz in sizes.values():
            want_hist[sz] = want_hist.get(sz, 0) + 1
        out = {r["bucket_size"]: r for r in phash_buckets(df).collect()}
        assert {k: v["n_buckets"] for k, v in out.items()} == want_hist
        for sz, r in out.items():
            assert r["n_candidate_pairs"] == want_hist[sz] * (sz * (sz - 1) // 2)

    def test_pair_count_formula(self, spark):
        # force a collision-sized bucket with bits=0 (single bucket)
        rows = [(f"d{i}", [_img(f"m{i}")]) for i in range(5)]
        df = spark.createDataFrame(rows, SPAN_SCHEMA)
        r = phash_buckets(df, bits=0).collect()
        assert len(r) == 1
        assert r[0]["bucket_size"] == 5
        assert r[0]["n_candidate_pairs"] == 10
