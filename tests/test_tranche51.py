"""Unit tests for the tranche-51 operators: snapshot growth CDC and the
streaming media-budget fold."""

import shutil

import pyspark.sql.functions as F

from knowledgegraphbuilder_spark.operators.multimodal import (
    fetch_media,
    media_refs,
)
from knowledgegraphbuilder_spark.sources.sinks import (
    snapshot_growth,
    write_graph_snapshot,
)
from knowledgegraphbuilder_spark.streaming.ingest import (
    read_media_budget,
    run_media_budget_available_now,
)

SPAN_SCHEMA = (
    "doc_id string, spans array<struct<"
    "kind:string,text:string,media_ref:string,offset:int>>"
)


class TestSnapshotGrowth:
    def test_add_and_remove_are_multiset_exact(self, spark, tmp_path):
        base = str(tmp_path / "snap")
        shutil.rmtree(base, ignore_errors=True)
        t1 = spark.createDataFrame(
            [("a",), ("b",), ("b",)], "subj string"  # dup row on purpose
        )
        t2 = spark.createDataFrame(
            [("a",), ("b",), ("c",), ("c",)], "subj string"
        )
        write_graph_snapshot(base, {"triples": t1})
        write_graph_snapshot(base, {"triples": t2})
        out = {r["version"]: r
               for r in snapshot_growth(spark, base, "triples").collect()}
        assert out[1]["n_rows"] == 3
        assert out[1]["n_added"] == 3 and out[1]["n_removed"] == 0
        assert out[2]["n_rows"] == 4
        # multiset: one 'b' removed, two 'c' added
        assert out[2]["n_added"] == 2
        assert out[2]["n_removed"] == 1


class TestStreamMediaBudget:
    def test_fold_equals_batch_and_replay_idempotent(self, spark, tmp_path):
        base = str(tmp_path / "mb")
        rows = [
            ("d1", [("text", "aa", None, 0),
                    ("image", None, "media://img/d1/0", 2)]),
            ("d2", [("audio", None, "media://aud/d2/0", 0)]),
        ]
        df = spark.createDataFrame(rows, SPAN_SCHEMA)
        df.filter(F.col("doc_id") == "d1").coalesce(1).write.parquet(
            f"{base}/in/b0")
        df.filter(F.col("doc_id") == "d2").coalesce(1).write.parquet(
            f"{base}/in/b1")
        run_media_budget_available_now(
            spark, f"{base}/in/*", f"{base}/out", f"{base}/ck")
        run_media_budget_available_now(
            spark, f"{base}/in/*", f"{base}/out", f"{base}/ck2")
        got = {r["media_type"]: r
               for r in read_media_budget(spark, f"{base}/out").collect()}
        want = {
            r["media_type"]: r
            for r in fetch_media(media_refs(df))
            .groupBy("media_type")
            .agg(F.count("*").alias("n_refs"),
                 F.sum("n_bytes").alias("total_bytes"))
            .collect()
        }
        assert set(got) == set(want) == {"image", "audio"}
        for k in want:
            assert got[k]["n_refs"] == want[k]["n_refs"]
            assert got[k]["total_bytes"] == want[k]["total_bytes"]
