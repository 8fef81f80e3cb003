"""Watermarked windowed aggregation: streamed results must equal the batch
aggregation for every window the watermark closed; open windows are withheld
(that is what the watermark is for)."""

from pyspark.sql import functions as F

from knowledgegraphbuilder_spark.streaming.windowed import (
    run_windowed_counts_available_now,
    windowed_event_counts,
)


def test_windowed_counts_match_batch(spark, sf_dir, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("wstream"))
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.repartition(4).write.mode("overwrite").parquet(f"{base}/in")

    run_windowed_counts_available_now(spark, f"{base}/in", f"{base}/out", f"{base}/ck")
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.read.parquet(f"{base}/out").collect()
    }

    batch = (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"),
                "event_type", "n_events", "total_value")
    )
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    closed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
        if (max_ts - r["window_end"]).total_seconds() >= 30 * 60
    }
    # every closed window emitted exactly once with batch-identical values
    for k, v in closed.items():
        assert streamed.get(k) == v, k
    # nothing emitted that batch doesn't have
    all_batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    for k, v in streamed.items():
        assert all_batch[k] == v
    assert len(streamed) >= len(closed) > 0
