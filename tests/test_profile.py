"""profile_table: per-column stats in one scan (null/distinct/min/max/
avg_len/mode with a deterministic tie-break)."""

from pyspark.sql import functions as F

from knowledgegraphbuilder_spark.operators.profile import profile_table


def test_profile_hand_checked(spark):
    df = spark.createDataFrame(
        [(1, "aa", None), (2, "bb", "x"), (3, "bb", "x"), (4, None, "y")],
        "id long, s string, t string",
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["id"]["n_rows"] == 4 and prof["id"]["n_null"] == 0
    assert prof["id"]["n_distinct"] == 4
    assert prof["id"]["min_value"] == "1" and prof["id"]["max_value"] == "4"
    assert prof["s"]["n_null"] == 1 and prof["s"]["n_distinct"] == 2
    assert prof["s"]["top_value"] == "bb" and prof["s"]["top_count"] == 2
    assert prof["s"]["avg_len"] == 2.0  # nulls excluded from the average
    assert prof["t"]["top_value"] == "x" and prof["t"]["top_count"] == 2


def test_profile_mode_tie_breaks_to_larger_value(spark):
    df = spark.createDataFrame([("a",), ("b",)], "v string")
    row = profile_table(df, ["v"]).collect()[0]
    assert row["top_value"] == "b" and row["top_count"] == 1


def test_profile_all_null_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "id long, s string")
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["s"]["n_null"] == 2 and prof["s"]["n_distinct"] == 0
    assert prof["s"]["top_value"] is None and prof["s"]["top_count"] == 0
    assert prof["s"]["avg_len"] is None


def test_profile_repartition_stable(spark):
    rows = [(i, f"v{i % 7}") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, s string")
    a = sorted(map(tuple, profile_table(df).collect()))
    b = sorted(map(tuple, profile_table(df.repartition(13)).collect()))
    assert a == b
