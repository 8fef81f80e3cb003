"""Pipeline configuration.

Mirrors the reference ``KGGConfig`` (back/kgg/config.py:6-20) but as an
immutable dataclass that is cheap to pickle into executors. Chunking constants
are parity-critical invariants from the reference:

- NER chunking 100 tokens / 15 overlap  (back/kgg/nodes/entity_extraction.py:18-19)
- RE + label-gen chunking 300 / 30      (back/kgg/nodes/relation_extraction.py:22-23,
                                         back/kgg/nodes/ner_labels_generator.py:23-24)
- ner_threshold 0.5, synonym_threshold 0.8, label sample size 15
                                        (back/kgg/config.py:15-19)
- default edge weight 0.2               (back/kgg/io/graph.py:77)
- PageRank damping 0.85 / 100 iters     (back/kgg/io/graph.py:152-161)

The deterministic test backend tokenizes on whitespace (the reference uses the
deberta-v3-large tokenizer as a length function; a real-model adapter would
plug the same tokenizer into the chunker UDF).
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Deterministic gazetteer used by the test/bench extractor backend: surface
# form -> NER label. Plays the role of GLiNER in the reference
# (back/kgg/nodes/entity_extraction.py:52-57); chosen from the synthetic
# corpus vocabulary so mention density resembles real NER output.
DEFAULT_GAZETTEER: tuple[tuple[str, str], ...] = (
    ("spark", "technology"),
    ("vector", "technology"),
    ("customer", "organization"),
    ("stream", "system"),
    ("table", "resource"),
)


@dataclass(frozen=True)
class KGConfig:
    # chunking (parity-critical)
    ner_chunk_size: int = 100
    ner_chunk_overlap: int = 15
    re_chunk_size: int = 300
    re_chunk_overlap: int = 30

    # thresholds (reference config.py:15-19)
    ner_threshold: float = 0.5
    synonym_threshold: float = 0.8
    sample_size_ner_labels: int = 15

    # graph / retrieval (reference io/graph.py:77,152-161; retriever.py:62)
    default_edge_weight: float = 0.2
    pagerank_damping: float = 0.85
    pagerank_max_iter: int = 100
    pagerank_tol: float = 1.0e-6
    retrieval_k: int = 5

    # embedding backend (reference: BGE-M3 1024-d normalized,
    # retriever.py:20-33; deterministic hash-embedding stand-in is 64-d to
    # match the driver fixture)
    embedding_dim: int = 64

    # scale knobs (ours): salting for head-entity skew, LSH blocking
    salt_buckets: int = 16
    minhash_perm: int = 32
    lsh_bands: int = 8
    shingle_size: int = 3

    # ANN-LSH retrieval path (random-hyperplane probe over the edge index;
    # brute force remains the test oracle — see operators/retrieval.py)
    ann_bits: int = 4
    ann_tables: int = 8

    # deterministic extractor backend
    gazetteer: tuple[tuple[str, str], ...] = field(default=DEFAULT_GAZETTEER)

    @property
    def ner_stride(self) -> int:
        return self.ner_chunk_size - self.ner_chunk_overlap

    @property
    def re_stride(self) -> int:
        return self.re_chunk_size - self.re_chunk_overlap

    @property
    def lsh_rows_per_band(self) -> int:
        return self.minhash_perm // self.lsh_bands
