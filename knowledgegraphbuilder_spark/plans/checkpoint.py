"""Checkpointed, resumable pipeline runner with per-partition lineage.

The Spark-native generalization of the reference's whole-graph JSON cache
(back/kgg/generator.py:42-53,76-122): instead of one opaque cache file, every
stage writes a parquet checkpoint table (stands in for an Iceberg table in
the sandbox — same createOrReplace semantics, minus snapshot isolation) plus
per-partition lineage rows. A stage whose checkpoint exists is skipped on
resume; because every id is content-hashed (functions/ids.py), a resumed run
produces byte-identical triples — uuid4 (reference) could not.

Lineage rows: (run_id, stage, partition_id, n_rows, wall_s, ts) — wall_s is
stage wall clock (per-partition timing would need accumulators; row counts
are per physical partition).
"""

from __future__ import annotations

import json
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knowledgegraphbuilder_spark.config import KGConfig
from knowledgegraphbuilder_spark.operators.canonicalize import (
    cluster_mentions_exact,
    node_membership,
)
from knowledgegraphbuilder_spark.operators.chunk import chunk_documents
from knowledgegraphbuilder_spark.operators.flatten import flatten_documents
from knowledgegraphbuilder_spark.operators.graph_build import (
    build_edges,
    build_provenance,
    build_triples,
)
from knowledgegraphbuilder_spark.operators.ner import extract_mentions
from knowledgegraphbuilder_spark.operators.relations import extract_relations
from knowledgegraphbuilder_spark.plans.pipeline import KGResult


class CheckpointedPipeline:
    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        config: KGConfig | None = None,
        ner_backend: object | None = None,
        re_backend: object | None = None,
    ):
        self.spark = spark
        self.work_dir = work_dir.rstrip("/")
        self.cfg = config or KGConfig()
        self.ner_backend = ner_backend
        self.re_backend = re_backend
        self.run_id = uuid.uuid4().hex[:12]
        self.stage_log: list[dict] = []

    # -- checkpoint mechanics ------------------------------------------------

    def _path(self, stage: str) -> str:
        return f"{self.work_dir}/{stage}"

    def _hadoop_path(self, path: str):
        """Resolve through the Hadoop FileSystem API so checkpoint probing and
        invalidation work on any scheme the cluster writes to (file://, hdfs://,
        s3a://) — a local os.path probe would silently re-run every stage when
        work_dir is an object store."""
        jpath = self.spark._jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return fs, jpath

    def _done(self, stage: str) -> bool:
        fs, jpath = self._hadoop_path(self._path(stage) + "/_SUCCESS")
        return fs.exists(jpath)

    def _stage(self, name: str, make, force: bool = False) -> DataFrame:
        t0 = time.time()
        path = self._path(name)
        resumed = self._done(name) and not force
        if not resumed:
            make().write.mode("overwrite").parquet(path)
        df = self.spark.read.parquet(path)
        wall = time.time() - t0
        lineage = (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("n_rows"))
            .select(
                F.lit(self.run_id).alias("run_id"),
                F.lit(name).alias("stage"),
                "partition_id",
                "n_rows",
                F.lit(round(wall, 3)).alias("wall_s"),
                F.lit(resumed).alias("resumed"),
                F.current_timestamp().alias("ts"),
            )
        )
        lineage.write.mode("append").parquet(f"{self.work_dir}/_lineage")
        self.stage_log.append(
            {"stage": name, "resumed": resumed, "wall_s": round(wall, 3)}
        )
        return df

    def invalidate(self, *stages: str) -> None:
        for s in stages:
            fs, jpath = self._hadoop_path(self._path(s))
            if fs.exists(jpath):
                fs.delete(jpath, True)

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.work_dir}/_lineage")

    # -- the pipeline --------------------------------------------------------

    def run(self, spans_df: DataFrame, force: bool = False) -> KGResult:
        cfg = self.cfg
        docs = self._stage("s1_documents", lambda: flatten_documents(spans_df), force)
        ner_chunks = self._stage(
            "s2_ner_chunks",
            lambda: chunk_documents(docs, cfg.ner_chunk_size, cfg.ner_chunk_overlap),
            force,
        )
        mentions = self._stage(
            "s4_mentions",
            lambda: extract_mentions(ner_chunks, cfg, backend=self.ner_backend),
            force,
        )
        re_chunks = self._stage(
            "s2_re_chunks",
            lambda: chunk_documents(docs, cfg.re_chunk_size, cfg.re_chunk_overlap),
            force,
        )
        relations = self._stage(
            "s5_relations",
            lambda: extract_relations(re_chunks, mentions, cfg, backend=self.re_backend),
            force,
        )
        nodes = self._stage(
            "s7_nodes",
            lambda: cluster_mentions_exact(mentions, cfg, with_member_arrays=False),
            force,
        )
        membership = self._stage("s7_membership", lambda: node_membership(mentions), force)
        edges = self._stage(
            "s8_edges", lambda: build_edges(relations, nodes, cfg.default_edge_weight), force
        )
        triples = self._stage("s9_triples", lambda: build_triples(edges, nodes), force)
        provenance = self._stage("s9_provenance", lambda: build_provenance(relations), force)
        with open(f"{self.work_dir}/_run_{self.run_id}.json", "w") as f:
            json.dump(self.stage_log, f)
        return KGResult(
            documents=docs,
            mentions=mentions,
            relations=relations,
            nodes=nodes,
            membership=membership,
            edges=edges,
            triples=triples,
            provenance=provenance,
        )
