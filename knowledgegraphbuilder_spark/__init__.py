"""PySpark-native knowledge-graph construction engine.

A from-scratch, Spark-first rebuild of the capabilities of
Zhenyettta/KnowledgeGraphBuilder (triple extraction, entity linking,
canonicalization, graph materialization, graph-weighted retrieval) plus the
training-data-pipeline operators a 100 TB corpus needs (dedup, ANN,
text-quality, multimodal plumbing).

Everything is a pure DataFrame -> DataFrame stage function; model inference is
Arrow-batched (mapInPandas / pandas_udf), never per-row Python. See SURVEY.md
for the operator inventory and reference citations.
"""

from knowledgegraphbuilder_spark.config import KGConfig

__all__ = ["KGConfig"]
__version__ = "0.1.0"
