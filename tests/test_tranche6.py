"""Round-4 extension tranche 6: winnowing fingerprints, MAD outliers,
streaming HDR quantile fold, TPC-H Q4/Q19 adaptations, CUBE.

The driver-gate oracles pin sf0.01 value-exactness; these tests pin the
operator-level CONTRACTS the oracles can't see — winnowing's positional
shared-passage guarantee and density bound, MAD's robustness to the
outliers it flags, and the streamed-fold == batch-sketch equality under
an adversarial batching the gate query doesn't use."""

import pytest
from pyspark.sql import functions as F

from knowledgegraphbuilder_spark.operators.dedup import winnow_pairs
from knowledgegraphbuilder_spark.operators.sketches import (
    hdr_histogram,
    hdr_quantiles,
)
from knowledgegraphbuilder_spark.operators.textstats import mad_outliers


class TestWinnowing:
    def test_shared_passage_guarantee(self, spark):
        # docs share a 10-token passage (>= k+w-1 = 8 tokens), rest disjoint:
        # the SIGMOD'03 guarantee says at least one shared fingerprint
        shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
        docs = spark.createDataFrame(
            [
                (1, "aa bb cc dd ee " + shared + " ff gg hh"),
                (2, "one two three four five " + shared + " six seven"),
                (3, "completely unrelated words nothing common here at all"),
            ],
            "doc_id long, text string",
        )
        pairs = {(r["id_a"], r["id_b"]) for r in winnow_pairs(docs).collect()}
        assert ("1", "2") in pairs
        assert all("3" not in p for p in pairs)

    def test_density_bound(self, spark):
        # selected fingerprints per doc <= number of windows (one min per
        # window), and >= ceil(n_windows / w) (a window's min survives at
        # most w windows) — the 2/(w+1) expected-density bracket. Tokens are
        # all-distinct so every gram is unique (a repeating token pattern
        # would collapse distinct fingerprints below the positional bound).
        text = " ".join(f"tok{i}" for i in range(200))
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        k, w = 4, 5
        n_grams = 200 - k + 1
        n_windows = n_grams - w + 1
        fps = (
            winnow_pairs(docs.union(docs.select(F.lit(2), "text")), k=k, window=w)
            .collect()
        )
        assert len(fps) == 1
        n_shared = fps[0]["n_shared"]
        assert n_windows / w <= n_shared <= n_windows

    def test_short_and_degenerate_docs(self, spark):
        docs = spark.createDataFrame(
            [(1, "one two"), (2, ""), (3, None), (4, "one two")],
            "doc_id long, text string",
        )
        # sub-k docs produce no fingerprints -> no pairs, no crash
        assert winnow_pairs(docs).count() == 0

    def test_short_doc_single_window(self, spark):
        # k <= len < k+w-1: one window over all grams (boundary convention)
        docs = spark.createDataFrame(
            [(1, "a b c d e"), (2, "a b c d e")],
            "doc_id long, text string",
        )
        rows = winnow_pairs(docs).collect()
        assert len(rows) == 1 and rows[0]["n_shared"] == 1


class TestMadOutliers:
    def test_flags_planted_outlier_robustly(self, spark):
        # 20 inliers at 100 +- 3 and one 10x outlier per group; the mean/std
        # z-score would be dragged (std ~ 196), MAD is not
        rows = []
        for g in ("a", "b"):
            rows += [(f"{g}{i}", g, 100 + (i % 7) - 3) for i in range(20)]
            rows += [(f"{g}x", g, 1000)]
        d = spark.createDataFrame(rows, "doc_id string, source string, n_chars long")
        out = mad_outliers(d).collect()
        flagged = {r["doc_id"] for r in out if r["is_outlier"] == 1}
        assert flagged == {"ax", "bx"}

    def test_interpolated_median_even_group(self, spark):
        d = spark.createDataFrame(
            [("1", "g", 10), ("2", "g", 20), ("3", "g", 30), ("4", "g", 40)],
            "doc_id string, source string, n_chars long",
        )
        r = mad_outliers(d).collect()[0]
        assert r["med"] == 25.0  # (20+30)/2 — exact binary fraction
        assert r["mad"] == 10.0  # |x-25| = {15,5,5,15} -> median 10

    def test_zero_mad_group(self, spark):
        # constant group: mad = 0 -> nothing beats the strict > threshold
        d = spark.createDataFrame(
            [(str(i), "g", 7) for i in range(5)],
            "doc_id string, source string, n_chars long",
        )
        assert all(r["is_outlier"] == 0 for r in mad_outliers(d).collect())


class TestStreamingHdrFold:
    def test_streamed_equals_batch_any_batching(self, spark, tmp_path):
        from knowledgegraphbuilder_spark.streaming.ingest import (
            quantiles_from_hdr_state,
            run_hdr_available_now,
        )

        vals = spark.range(1, 2001).select(
            F.col("id"), (F.col("id") * 37 % 1999 + 1).cast("long").alias("v")
        )
        # adversarial batching: wildly unequal splits (1999 rows / 1 row)
        vals.filter("id < 2000").coalesce(1).write.parquet(str(tmp_path / "in/b0"))
        vals.filter("id >= 2000").coalesce(1).write.parquet(str(tmp_path / "in/b1"))
        run_hdr_available_now(
            spark, str(tmp_path / "in/*"), str(tmp_path / "st"), str(tmp_path / "ck")
        )
        # replay against a fresh checkpoint: state must be unchanged
        run_hdr_available_now(
            spark, str(tmp_path / "in/*"), str(tmp_path / "st"), str(tmp_path / "ck2")
        )
        streamed = {
            (r["q"], r["est"])
            for r in quantiles_from_hdr_state(spark, str(tmp_path / "st")).collect()
        }
        batch = {
            (r["q"], r["est"]) for r in hdr_quantiles(vals, "v").collect()
        }
        assert streamed == batch

    def test_state_rows_bounded(self, spark, tmp_path):
        from knowledgegraphbuilder_spark.streaming.ingest import (
            run_hdr_available_now,
        )

        vals = spark.range(1, 5001).select(
            F.col("id"), (F.col("id") % 977 + 1).cast("long").alias("v")
        )
        vals.coalesce(1).write.parquet(str(tmp_path / "in/b0"))
        run_hdr_available_now(
            spark, str(tmp_path / "in/*"), str(tmp_path / "st"), str(tmp_path / "ck")
        )
        state = spark.read.parquet(str(tmp_path / "st"))
        # one batch: rows <= distinct (b, hi) buckets of the sketch, which
        # is capped by construction (~64 * 2^4), independent of 5000 inputs
        assert state.count() == hdr_histogram(vals, "v").count()
        assert state.count() <= 64 * 16


class TestCubeAndTpchAdaptations:
    def test_cube_grouping_sets_counts(self, spark):
        e = spark.createDataFrame(
            [("click", 1, 10), ("click", 2, 20), ("view", 1, 30)],
            "event_type string, m int, c long",
        )
        out = {
            (r["event_type"], r["m"]): (r["n"], r["cents"])
            for r in e.cube("event_type", "m")
            .agg(F.count("*").alias("n"), F.sum("c").alias("cents"))
            .collect()
        }
        assert out[(None, None)] == (3, 60)
        assert out[("click", None)] == (2, 30)
        assert out[(None, 1)] == (2, 40)
        assert out[("click", 2)] == (1, 20)

    def test_q4_semi_join_never_multiplies(self, spark, sf_dir):
        import __spark_entry__ as entry

        out = entry.q_sql_tpch_q4(spark, sf_dir)
        # semi join: per-priority counts can never exceed the plain
        # filtered orders counts (a plain inner join would multiply)
        plain = (
            entry._t(spark, sf_dir, "orders")
            .filter(
                (F.col("o_orderdate") >= F.lit("1997-07-01"))
                & (F.col("o_orderdate") < F.lit("1997-10-01"))
            )
            .groupBy("o_orderpriority")
            .count()
        )
        got = {r["o_orderpriority"]: r["order_count"] for r in out.collect()}
        cap = {r["o_orderpriority"]: r["count"] for r in plain.collect()}
        assert got and all(got[k] <= cap[k] for k in got)

    def test_q4_plan_is_semi_join(self, spark, sf_dir):
        import __spark_entry__ as entry

        plan = entry.q_sql_tpch_q4(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "LeftSemi" in plan

    def test_q19_disjunct_factored_to_part_scan(self, spark, sf_dir):
        import __spark_entry__ as entry

        plan = (
            entry.q_sql_tpch_q19(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # Catalyst must factor the side-local disjunctions out of the mixed
        # OR predicate and push them into BOTH scans: the brand/size OR
        # reaches the part scan, the quantity OR reaches the lineitem scan
        assert "PushedFilters: [IsNotNull(p_partkey), Or(Or(And(EqualTo(p_brand" in plan
        assert "Or(Or(And(GreaterThanOrEqual(l_quantity" in plan
