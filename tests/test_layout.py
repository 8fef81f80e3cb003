"""Z-order layout: Morton-key correctness vs a Python reference, locality
property (z-sorted buckets bound both dims tighter than a 1-D sort bounds
the second dim), and plan shape (single range exchange, no Python)."""

from pyspark.sql import functions as F

from knowledgegraphbuilder_spark.operators.layout import (
    zorder_bucket_stats, zorder_key, zorder_layout,
)


def _morton(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_python_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 255, 65535) for y in (0, 3, 128, 65535)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", zorder_key("x", "y", 16).alias("z")).collect()
    for r in got:
        assert r.z == _morton(r.x, r.y, 16), (r.x, r.y)


def test_zorder_buckets_bound_both_dims(spark):
    # uniform 256x256 grid: with an 8-bit prefix each z-bucket is a 32x32
    # tile -> BOTH dims span <= 32 per bucket; an x-sorted layout with the
    # same bucket count leaves y spanning the full 256
    df = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("long").alias("y")
    )
    stats = zorder_bucket_stats(df, "x", "y", bits=8, prefix_bits=8).collect()
    assert len(stats) == 256
    for r in stats:
        assert r.x_max - r.x_min <= 31 and r.y_max - r.y_min <= 31
        assert r.cnt == 256


def test_zorder_layout_is_range_sorted(spark):
    df = spark.range(4_000).select(
        (F.col("id") * 131 % 1024).alias("x"),
        (F.col("id") * 37 % 1024).alias("y"),
    )
    out = zorder_layout(df, "x", "y", bits=10, n_files=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert "BatchEvalPython" not in plan
    # zkeys are globally non-decreasing across the range partitions
    parts = out.select("zkey").rdd.glom().collect()
    flat = [v[0] for p in parts for v in p]
    assert flat == sorted(flat)
