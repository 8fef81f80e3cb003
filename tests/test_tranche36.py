"""Unit tests for the tranche-36 operators: Cramer's V with analytic
zero-cell handling and the streaming CUSUM fold."""

import pyspark.sql.functions as F
from pyspark.sql import Window as W


def _cramers_v(spark, rows):
    """Replicates q_ml_cramersv's plan on explicit (x, y) rows."""
    df = spark.createDataFrame(rows, "source string, lang string")
    ct = df.groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("c")
    )
    cells = ct.select(
        "c",
        F.sum("c").over(W.partitionBy("source")).cast("long").alias("cx"),
        F.sum("c").over(W.partitionBy("lang")).cast("long").alias("cy"),
        F.sum("c").over(W.partitionBy()).cast("long").alias("n"),
        "source", "lang",
    )
    st = cells.groupBy().agg(
        F.max("n").alias("n"),
        F.countDistinct("source").alias("r"),
        F.countDistinct("lang").alias("cc"),
        F.sum(F.expr(
            "(cast(c as double) * n - cast(cx as double) * cy)"
            " * (cast(c as double) * n - cast(cx as double) * cy)"
            " / (cast(n as double) * cx * cy)"
            " - cast(cx as double) * cy / n"
        )).alias("adj"),
    ).selectExpr(
        "n + adj as chi2",
        "sqrt((n + adj) / (cast(n as double) * (least(r, cc) - 1)))"
        " as v",
    ).collect()[0]
    return st["chi2"], st["v"]


def _brute_chi2(rows):
    from collections import Counter

    cxy = Counter(rows)
    cx = Counter(x for x, _ in rows)
    cy = Counter(y for _, y in rows)
    n = len(rows)
    chi2 = 0.0
    for x in cx:
        for y in cy:
            e = cx[x] * cy[y] / n
            o = cxy.get((x, y), 0)
            chi2 += (o - e) ** 2 / e
    return chi2


class TestCramersV:
    def test_perfect_association_v_is_one(self, spark):
        rows = [("A", "x")] * 10 + [("B", "y")] * 10
        chi2, v = _cramers_v(spark, rows)
        assert abs(v - 1.0) < 1e-12
        assert abs(chi2 - 20.0) < 1e-9

    def test_independent_v_is_zero(self, spark):
        rows = [(s, l) for s in "AB" for l in "xy" for _ in range(5)]
        chi2, v = _cramers_v(spark, rows)
        assert abs(chi2) < 1e-9 and abs(v) < 1e-6

    def test_zero_cells_match_full_table_brute_force(self, spark):
        # (C, z) never occurs: the analytic fold must equal the brute
        # force that iterates ALL r*c cells including the empty ones
        rows = ([("A", "x")] * 6 + [("A", "y")] * 2 + [("B", "x")] * 3
                + [("B", "z")] * 4 + [("C", "y")] * 5)
        chi2, _ = _cramers_v(spark, rows)
        assert abs(chi2 - _brute_chi2(rows)) < 1e-9


class TestStreamCusum:
    def test_streamed_state_equals_batch_cusum(self, spark, tmp_path):
        import datetime

        from knowledgegraphbuilder_spark.operators.timeseries import (
            cusum_changepoint,
        )
        from knowledgegraphbuilder_spark.streaming.ingest import (
            read_cusum, run_resample_available_now,
        )

        spark.conf.set("spark.sql.session.timeZone", "UTC")
        rows = []
        eid = 0
        for d in range(1, 13):
            k = 1 if d <= 6 else 5
            for _ in range(k):
                eid += 1
                rows.append(
                    (eid, datetime.datetime(2024, 1, d, 9, 0, 0),
                     eid % 3, "a", 1.0, "{}")
                )
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double, props string"
        )
        base = str(tmp_path / "sc")
        for i, (lo, hi) in enumerate([(0, 10), (10, 25), (25, 100)]):
            (df.filter((F.col("event_id") > lo) & (F.col("event_id") <= hi))
             .coalesce(1).write.parquet(f"{base}/in/b{i}"))
        run_resample_available_now(
            spark, f"{base}/in/*", f"{base}/st", f"{base}/ck",
            bucket_us=86_400_000_000)
        # replay against a fresh checkpoint: MERGE must be idempotent
        run_resample_available_now(
            spark, f"{base}/in/*", f"{base}/st", f"{base}/ck2",
            bucket_us=86_400_000_000)
        got = [tuple(r) for r in read_cusum(spark, f"{base}/st").collect()]
        want = [tuple(r) for r in cusum_changepoint(df).collect()]
        assert got == want
        assert want[0][1] == "2024-01-06"  # the level shift day
