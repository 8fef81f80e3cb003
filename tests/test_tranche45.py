"""Unit tests for the tranche-45 streaming x interleaved operators:
incremental caption alignment and the modality-transition fold."""

import shutil

import pyspark.sql.functions as F
import pytest

from knowledgegraphbuilder_spark.operators.multimodal import (
    align_media_to_text,
    modality_transitions,
)
from knowledgegraphbuilder_spark.streaming.ingest import (
    read_transitions,
    run_align_available_now,
    run_transitions_available_now,
)

SPAN_SCHEMA = (
    "doc_id string, spans array<struct<"
    "kind:string,text:string,media_ref:string,offset:int>>"
)


def _spans_df(spark):
    rows = [
        ("d1", [("text", "alpha beta", None, 0),
                ("image", None, "media://img/d1/0", 10),
                ("text", "gamma", None, 10)]),
        ("d2", [("image", None, "media://img/d2/0", 0),
                ("text", "delta", None, 0)]),
        ("d3", [("text", "solo text", None, 0)]),
        ("d4", [("text", "x y", None, 0),
                ("audio", None, "media://aud/d4/0", 3)]),
    ]
    return spark.createDataFrame(rows, SPAN_SCHEMA)


@pytest.fixture
def stream_dirs(spark, tmp_path):
    base = str(tmp_path / "t45")
    shutil.rmtree(base, ignore_errors=True)
    df = _spans_df(spark)
    # two files -> two micro-batches
    df.filter(F.col("doc_id").isin("d1", "d2")).coalesce(1).write.parquet(
        f"{base}/in/b0"
    )
    df.filter(F.col("doc_id").isin("d3", "d4")).coalesce(1).write.parquet(
        f"{base}/in/b1"
    )
    return base


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


class TestStreamAlign:
    COLS = ["doc_id", "pos", "media_ref", "media_type", "caption",
            "caption_offset"]

    def test_stream_equals_batch(self, spark, stream_dirs):
        base = stream_dirs
        run_align_available_now(spark, f"{base}/in/*", f"{base}/out",
                                f"{base}/ck")
        got = _sorted_rows(spark.read.parquet(f"{base}/out"), self.COLS)
        want = _sorted_rows(align_media_to_text(_spans_df(spark)), self.COLS)
        assert got == want
        assert len(got) == 3  # d1 image, d2 image, d4 audio

    def test_replay_is_idempotent(self, spark, stream_dirs):
        base = stream_dirs
        run_align_available_now(spark, f"{base}/in/*", f"{base}/out",
                                f"{base}/ck")
        before = _sorted_rows(spark.read.parquet(f"{base}/out"), self.COLS)
        # fresh checkpoint replays EVERY batch into the same table
        run_align_available_now(spark, f"{base}/in/*", f"{base}/out",
                                f"{base}/ck2")
        after = _sorted_rows(spark.read.parquet(f"{base}/out"), self.COLS)
        assert before == after


class TestStreamTransitions:
    COLS = ["from_kind", "to_kind", "cnt"]

    def test_fold_equals_batch(self, spark, stream_dirs):
        base = stream_dirs
        run_transitions_available_now(spark, f"{base}/in/*", f"{base}/out",
                                      f"{base}/ck")
        got = _sorted_rows(read_transitions(spark, f"{base}/out"), self.COLS)
        want = _sorted_rows(modality_transitions(_spans_df(spark)), self.COLS)
        assert got == want

    def test_replay_never_double_counts(self, spark, stream_dirs):
        base = stream_dirs
        run_transitions_available_now(spark, f"{base}/in/*", f"{base}/out",
                                      f"{base}/ck")
        run_transitions_available_now(spark, f"{base}/in/*", f"{base}/out",
                                      f"{base}/ck2")
        got = _sorted_rows(read_transitions(spark, f"{base}/out"), self.COLS)
        want = _sorted_rows(modality_transitions(_spans_df(spark)), self.COLS)
        assert got == want
