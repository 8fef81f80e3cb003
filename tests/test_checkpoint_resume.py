"""Resume-idempotency: checkpointed stages skip recompute; invalidating a
mid-pipeline stage recomputes downstream to byte-identical triples
(BASELINE.json north rule)."""

from knowledgegraphbuilder_spark.config import KGConfig
from knowledgegraphbuilder_spark.plans.checkpoint import CheckpointedPipeline


def _triples(res):
    return sorted(
        (r["subj"], r["pred"], r["obj"], r["doc_id"], r["edge_id"])
        for r in res.triples.collect()
    )


def test_checkpoint_resume_idempotent(spark, corpus_df, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("ckpt"))
    p1 = CheckpointedPipeline(spark, wd, KGConfig())
    r1 = p1.run(corpus_df)
    t1 = _triples(r1)
    assert all(not s["resumed"] for s in p1.stage_log)

    # full resume: every stage skipped, identical output
    p2 = CheckpointedPipeline(spark, wd, KGConfig())
    r2 = p2.run(corpus_df)
    assert all(s["resumed"] for s in p2.stage_log)
    assert _triples(r2) == t1

    # invalidate a mid-pipeline stage: recompute downstream, same bytes
    p3 = CheckpointedPipeline(spark, wd, KGConfig())
    p3.invalidate("s5_relations", "s8_edges", "s9_triples", "s9_provenance")
    r3 = p3.run(corpus_df)
    flags = {s["stage"]: s["resumed"] for s in p3.stage_log}
    assert flags["s4_mentions"] and not flags["s5_relations"] and not flags["s9_triples"]
    assert _triples(r3) == t1


def test_lineage_rows(spark, corpus_df, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("ckpt2"))
    p = CheckpointedPipeline(spark, wd, KGConfig())
    res = p.run(corpus_df)
    lin = p.lineage().collect()
    stages = {r["stage"] for r in lin}
    assert {"s1_documents", "s4_mentions", "s5_relations", "s9_triples"} <= stages
    by_stage = {}
    for r in lin:
        by_stage[r["stage"]] = by_stage.get(r["stage"], 0) + r["n_rows"]
    assert by_stage["s9_triples"] == res.triples.count()
    assert all(r["wall_s"] >= 0 for r in lin)
