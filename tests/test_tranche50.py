"""Unit tests for the tranche-50 KG operators: referential-integrity audit
and 2-hop reachability."""

from knowledgegraphbuilder_spark.operators.graph_build import integrity_audit
from knowledgegraphbuilder_spark.operators.graphstats import two_hop_reach


def _tables(spark, break_edge_node=False):
    mentions = spark.createDataFrame(
        [("m1",), ("m2",)], "mention_id string"
    )
    relations = spark.createDataFrame(
        [("r1", "m1", "m2")],
        "relation_id string, head_mention_id string, tail_mention_id string",
    )
    edges = spark.createDataFrame(
        [("r1", "nA", "nB" if not break_edge_node else "nMISSING")],
        "relation_id string, head_node_id string, tail_node_id string",
    )
    membership = spark.createDataFrame(
        [("nA", "m1"), ("nB", "m2")], "node_id string, mention_id string"
    )
    provenance = spark.createDataFrame([("r1",)], "triple_id string")
    return mentions, relations, edges, membership, provenance


class TestIntegrityAudit:
    def test_clean_graph_has_zero_orphans(self, spark):
        out = integrity_audit(*_tables(spark)).collect()
        assert len(out) == 7
        assert all(r["n_orphans"] == 0 for r in out)
        by = {r["check"]: r for r in out}
        assert by["rel_head_mention"]["n_rows"] == 1
        assert by["membership_mention"]["n_rows"] == 2

    def test_dangling_node_fk_is_caught(self, spark):
        out = {
            r["check"]: r
            for r in integrity_audit(
                *_tables(spark, break_edge_node=True)
            ).collect()
        }
        assert out["edge_tail_node"]["n_orphans"] == 1
        assert out["edge_head_node"]["n_orphans"] == 0


class TestTwoHop:
    def test_path_graph(self, spark):
        # a -> b -> c -> d: a reaches {b,c}, b reaches {c,d}, c reaches {d}
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d")],
            "head_node_id string, tail_node_id string",
        )
        out = {r["node_id"]: r["n_reach_2hop"]
               for r in two_hop_reach(edges).collect()}
        assert out == {"a": 2, "b": 2, "c": 1}

    def test_cycle_excludes_self(self, spark):
        # a -> b -> a: each reaches only the other (self excluded)
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "a")],
            "head_node_id string, tail_node_id string",
        )
        out = {r["node_id"]: r["n_reach_2hop"]
               for r in two_hop_reach(edges).collect()}
        assert out == {"a": 1, "b": 1}

    def test_duplicate_edges_counted_once(self, spark):
        edges = spark.createDataFrame(
            [("a", "b")] * 3, "head_node_id string, tail_node_id string"
        )
        out = two_hop_reach(edges).collect()
        assert len(out) == 1 and out[0]["n_reach_2hop"] == 1
