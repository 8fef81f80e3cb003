"""Round-4 extension tranche 7: funnel / retention / moving-window
analytics and the TPC-H Q7/Q8/Q10/Q15/Q18 adaptations.

The driver-gate oracles pin sf0.01 value-exactness against DuckDB; these
tests pin the SEMANTIC contracts on crafted inputs the gate corpus can't
isolate: funnel stage ordering (a click BEFORE the first view must not
convert), retention's cohort-week arithmetic, the RANGE frame's exact
1-hour boundary (row at t-3600s inclusive, t-3600.000001s exclusive),
and Q15's argmax-tie behavior."""

import datetime as dt
import importlib.util
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_spec = importlib.util.spec_from_file_location(
    "spark_entry", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__spark_entry__.py")
)
_entry = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_entry)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


TS0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _t(sec):
    return TS0 + dt.timedelta(seconds=sec)


class TestFunnel:
    def test_stage_order_enforced(self, spark, tmp_path):
        rows = [
            # user 1: full ordered funnel view -> click -> purchase
            (1, _t(0), 1, "view", 1.0, ""),
            (2, _t(10), 1, "click", 1.0, ""),
            (3, _t(20), 1, "purchase", 1.0, ""),
            # user 2: click BEFORE first view -> stops at stage 1
            (4, _t(0), 2, "click", 1.0, ""),
            (5, _t(10), 2, "view", 1.0, ""),
            # user 3: view+click, purchase before click -> stops at stage 2
            (6, _t(0), 3, "view", 1.0, ""),
            (7, _t(5), 3, "purchase", 1.0, ""),
            (8, _t(10), 3, "click", 1.0, ""),
            # user 4: never views -> not even stage 1
            (9, _t(0), 4, "purchase", 1.0, ""),
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = {r["stage"]: r["users"] for r in
               _entry.q_sql_funnel(spark, sf).collect()}
        assert got == {"view": 3, "view>click": 2, "view>click>purchase": 1}

    def test_strict_inequality_between_stages(self, spark, tmp_path):
        # click at EXACTLY the first-view timestamp does not count
        rows = [
            (1, _t(0), 1, "view", 1.0, ""),
            (2, _t(0), 1, "click", 1.0, ""),
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = {r["stage"]: r["users"] for r in
               _entry.q_sql_funnel(spark, sf).collect()}
        assert got["view>click"] == 0


class TestRetention:
    def test_cohort_offsets(self, spark, tmp_path):
        # 2024-01-01 is a Monday: cohort week starts that day
        rows = [
            (1, _t(0), 1, "view", 1.0, ""),                      # week 0
            (2, _t(7 * 86400 + 5), 1, "view", 1.0, ""),          # week 1
            (3, _t(21 * 86400), 1, "view", 1.0, ""),             # week 3
            (4, _t(7 * 86400), 2, "view", 1.0, ""),              # joins week 1
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = {(r["cohort"], r["woffset"]): r["users"] for r in
               _entry.q_sql_retention(spark, sf).collect()}
        assert got == {
            ("2024-01-01", 0): 1,
            ("2024-01-01", 1): 1,
            ("2024-01-01", 3): 1,
            ("2024-01-08", 0): 1,
        }


class TestMovingWindow:
    def test_exact_hour_boundary(self, spark, tmp_path):
        rows = [
            (1, _t(0), 1, "view", 10.0, ""),
            # 3600s later: row 1 still inside the RANGE frame (inclusive)
            (2, _t(3600), 1, "view", 20.0, ""),
            # 3600.000001s after row 2: row 2 falls out (microsecond edge)
            (3, _t(3600) + dt.timedelta(seconds=3600, microseconds=1),
             1, "view", 30.0, ""),
            # other user: frames never mix across partition keys
            (4, _t(3600), 2, "view", 99.0, ""),
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = {r["event_id"]: (r["n_1h"], r["avg_1h"]) for r in
               _entry.q_ts_moving(spark, sf).collect()}
        assert got[1] == (1, 10.0)
        assert got[2] == (2, 15.0)
        assert got[3] == (1, 30.0)
        assert got[4] == (1, 99.0)


@pytest.mark.parametrize("name", [
    "sql_tpch_q7", "sql_tpch_q8", "sql_tpch_q10", "sql_tpch_q15",
    "sql_tpch_q18",
])
def test_tpch_smoke_schema(spark, sf_dir, name):
    """Each adapted TPC-H query runs on the driver corpus and keeps its
    aliased output schema (the gate hashes columns by name)."""
    df = _entry.queries()[name](spark, sf_dir)
    rows = df.collect()
    expected_cols = {
        "sql_tpch_q7": ["supp_nation", "cust_nation", "l_year",
                        "revenue_cents"],
        "sql_tpch_q8": ["o_year", "mkt_share"],
        "sql_tpch_q10": ["c_custkey", "c_name", "revenue_cents", "acctbal",
                         "n_name"],
        "sql_tpch_q15": ["s_suppkey", "s_name", "total_cents"],
        "sql_tpch_q18": ["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                         "o_totalprice", "total_qty"],
    }[name]
    assert df.columns == expected_cols
    assert len(rows) >= 0


def test_q15_argmax_ties_all_returned(spark, sf_dir):
    """Q15 returns EVERY supplier at the max, not an arbitrary first."""
    df = _entry.q_sql_tpch_q15(spark, sf_dir)
    rows = df.collect()
    assert len(rows) >= 1
    assert len({r["total_cents"] for r in rows}) == 1


from knowledgegraphbuilder_spark.operators.mlstats import (  # noqa: E402
    corr_matrix,
    grouped_ols,
)
from knowledgegraphbuilder_spark.operators.textstats import (  # noqa: E402
    shannon_entropy,
    winsorize,
)


class TestEntropy:
    def test_uniform_and_degenerate(self, spark):
        rows = [("a", "en")] * 4 + [("a", "de")] * 4 + [("b", "en")] * 5
        df = spark.createDataFrame(rows, "source string, lang string")
        got = {r["grp"]: r for r in shannon_entropy(df).collect()}
        # uniform 2-class: H = ln(2), normalized 1.0
        assert got["a"]["norm_entropy"] == 1.0
        assert abs(got["a"]["entropy"] - 0.693147) < 1e-6
        # single class: zero entropy, normalized 0 by convention
        assert got["b"]["entropy"] == 0.0
        assert got["b"]["norm_entropy"] == 0.0


class TestWinsorize:
    def test_clamps_at_exact_percentiles(self, spark):
        # group of 11 values 0..1000: p05 = 0.5, p95 = 950 under the
        # (n-1)p interpolation both engines share
        rows = [(i, "g", float(v)) for i, v in enumerate(
            [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_chars double")
        out = {r["doc_id"]: r for r in winsorize(
            df, value_expr="n_chars").collect()}
        assert out["0"]["x_wins"] == 0.5 and out["0"]["clipped"] == 1
        assert out["10"]["x_wins"] == pytest.approx(9 + 0.5 * 991)
        assert out["10"]["clipped"] == 1
        assert out["5"]["x_wins"] == 5.0 and out["5"]["clipped"] == 0


class TestOlsCorr:
    def test_exact_line(self, spark):
        rows = [("g", x, 3 * x + 2) for x in range(1, 20)]
        df = spark.createDataFrame(rows, "grp string, x long, y long")
        r = grouped_ols(df, "x", "y").collect()[0]
        assert (r["slope"], r["intercept"], r["r2"]) == (3.0, 2.0, 1.0)

    def test_corr_signs(self, spark):
        rows = [(x, 2 * x, -3 * x, 7) for x in range(1, 30)]
        df = spark.createDataFrame(rows, "a long, b long, c long, d long")
        got = {(r["col_a"], r["col_b"]): r["corr"] for r in corr_matrix(
            df, {"a": "a", "b": "b", "c": "c", "d": "d"}).collect()}
        assert got[("a", "b")] == 1.0
        assert got[("a", "c")] == -1.0
        assert got[("a", "d")] == 0.0   # zero-variance column -> 0 by convention
        assert len(got) == 6


from knowledgegraphbuilder_spark.operators.dedup import bloom_anti_join  # noqa: E402
from knowledgegraphbuilder_spark.operators.graphstats import adamic_adar  # noqa: E402
from knowledgegraphbuilder_spark.operators.sketches import (  # noqa: E402
    minhash_group_signatures,
)


class TestAdamicAdar:
    def test_path_graph_score(self, spark):
        # a-b-c path: the one candidate is (a,c) via center b, deg(b)=2,
        # aa_units = 1e12 // round(ln(2)*1e6) = 1e12 // 693147
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c")], "src string, dst string")
        rows = adamic_adar(edges).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["src"], r["dst"], r["cn"]) == ("a", "c", 1)
        assert r["aa_units"] == 10 ** 12 // 693147

    def test_existing_edges_excluded_and_hub_capped(self, spark):
        # star hub h with 5 leaves: every leaf pair is a candidate via h;
        # capping max_hub_degree=4 drops h as a center -> no candidates
        edges = spark.createDataFrame(
            [("h", f"l{i}") for i in range(5)], "src string, dst string")
        assert adamic_adar(edges, max_hub_degree=4).count() == 0
        out = adamic_adar(edges, max_hub_degree=5)
        pairs = {(r["src"], r["dst"]) for r in out.collect()}
        assert len(pairs) == 10 and all(s < d for s, d in pairs)


class TestBloomAntiJoin:
    def test_exact_result_any_routing(self, spark):
        docs = spark.createDataFrame(
            [(i, f"unique text number {i} with words") for i in range(40)]
            + [(100, "unique text number 3 with words")],  # dup of doc 3
            "doc_id long, text string",
        )
        seen = docs.filter(F.col("doc_id") % 4 == 0)  # 0,4,...,36,100
        out = bloom_anti_join(docs, seen).collect()
        got = {r["doc_id"] for r in out}
        # new = not multiple-of-4 and not textually equal to a seen doc;
        # doc 3's text was seen via doc 100
        expect = {str(i) for i in range(40) if i % 4 != 0 and i != 3}
        assert got == expect
        assert all(r["path"] in ("bloom", "verify") for r in out)


class TestMinhashGroupSignatures:
    def test_union_equals_elementwise_min(self, spark):
        docs = spark.createDataFrame(
            [("s", f"alpha beta gamma delta token{i} epsilon zeta") 
             for i in range(10)],
            "source string, text string",
        )
        a, b = docs.filter("text like '%token1%'"), docs.filter(
            "text not like '%token1%'")
        whole = {(r["g"], r["perm"]): r["minv"] for r in
                 minhash_group_signatures(docs).collect()}
        pa = {(r["g"], r["perm"]): r["minv"] for r in
              minhash_group_signatures(a).collect()}
        pb = {(r["g"], r["perm"]): r["minv"] for r in
              minhash_group_signatures(b).collect()}
        merged = {k: min(pa.get(k, 1 << 62), pb.get(k, 1 << 62))
                  for k in set(pa) | set(pb)}
        assert whole == merged


from knowledgegraphbuilder_spark.operators.graphstats import edge_support  # noqa: E402


class TestEdgeSupport:
    def test_triangle_plus_tail(self, spark):
        # triangle a-b-c plus tail c-d: triangle edges have support 1,
        # the tail edge 0
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")],
            "src string, dst string",
        )
        got = {(r["src"], r["dst"]): r["support"] for r in
               edge_support(edges).collect()}
        assert got == {("a", "b"): 1, ("b", "c"): 1, ("a", "c"): 1,
                       ("c", "d"): 0}

    def test_k4_support(self, spark):
        # K4: every edge closes with both remaining vertices -> support 2
        vs = ["a", "b", "c", "d"]
        edges = spark.createDataFrame(
            [(x, y) for i, x in enumerate(vs) for y in vs[i + 1:]],
            "src string, dst string",
        )
        sups = [r["support"] for r in edge_support(edges).collect()]
        assert sups == [2] * 6


def test_q13_zero_order_bucket(spark, sf_dir):
    """The LEFT join keeps customers with no qualifying orders: the
    c_count=0 bucket must exist and the custdist sum must equal the
    customer count."""
    df = _entry.q_sql_tpch_q13(spark, sf_dir)
    rows = {r["c_count"]: r["custdist"] for r in df.collect()}
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert sum(rows.values()) == n_cust


class TestDegenerateInputs7:
    """Degenerate-input hardening for the tranche-7 operators — the same
    discipline as test_degenerate_inputs.py: empty frames, single rows,
    nulls, and constant columns must not crash or emit wrong shapes
    (ANSI mode turns silent index/overflow bugs into errors)."""

    def test_entropy_null_class_and_empty(self, spark):
        df = spark.createDataFrame(
            [("a", None), ("a", "en"), ("a", None)],
            "source string, lang string",
        )
        got = {r["grp"]: r for r in shannon_entropy(df).collect()}
        # NULL is its own class: 2 classes, n=3
        assert got["a"]["n_classes"] == 2 and got["a"]["n"] == 3
        empty = spark.createDataFrame([], "source string, lang string")
        assert shannon_entropy(empty).count() == 0

    def test_winsorize_single_row_group(self, spark):
        df = spark.createDataFrame(
            [(1, "g", 42.0)], "doc_id long, source string, n_chars double")
        r = winsorize(df, value_expr="n_chars").collect()[0]
        # p05 == p95 == the value: clamp is the identity, nothing clipped
        assert r["x_wins"] == 42.0 and r["clipped"] == 0

    def test_ols_degenerate_variance(self, spark):
        # constant x: denominator 0 -> slope/intercept NULL-safe, r2 0
        df = spark.createDataFrame(
            [("g", 5, y) for y in (1, 2, 3)], "grp string, x long, y long")
        r = grouped_ols(df, "x", "y").collect()[0]
        assert r["r2"] == 0.0 and r["slope"] is None

    def test_single_node_graph_ops(self, spark):
        one = spark.createDataFrame([("a", "b")], "src string, dst string")
        assert adamic_adar(one).count() == 0
        sup = edge_support(one).collect()
        assert [(r["src"], r["dst"], r["support"]) for r in sup] == [
            ("a", "b", 0)]
        empty = spark.createDataFrame([], "src string, dst string")
        assert adamic_adar(empty).count() == 0
        assert edge_support(empty).count() == 0

    def test_bloom_anti_join_empty_seen(self, spark):
        docs = spark.createDataFrame(
            [(1, "x y z"), (2, "p q r")], "doc_id long, text string")
        empty_seen = docs.filter("doc_id < 0")
        out = bloom_anti_join(docs, empty_seen).collect()
        # empty filter: zero words broadcast, every probe misses -> all new
        assert {r["doc_id"] for r in out} == {"1", "2"}
        assert all(r["path"] == "bloom" for r in out)

    def test_minhash_group_signatures_empty_and_short(self, spark):
        df = spark.createDataFrame(
            [("s", "one"), ("s", "")], "source string, text string")
        rows = minhash_group_signatures(df).collect()
        # short texts still shingle (whole-text gram); 16 perms, one group
        assert len(rows) == 16


def test_minhash_source_resemblance_identical_and_disjoint(spark):
    from knowledgegraphbuilder_spark.operators.sketches import (
        minhash_source_resemblance,
    )

    rows = [
        # sources A and B identical text -> jaccard 1.0; C disjoint
        (1, "alpha beta gamma delta epsilon", "en", "A", 30),
        (2, "alpha beta gamma delta epsilon", "en", "B", 30),
        (3, "zeta eta theta iota kappa lambda", "en", "C", 32),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    out = {(r.src_a, r.src_b): r
           for r in minhash_source_resemblance(df).collect()}
    assert out[("A", "B")].jaccard_micro == 1000000
    assert out[("A", "C")].n_agree == 0 and out[("B", "C")].n_agree == 0
    assert all(r.n_perm == 16 for r in out.values())
