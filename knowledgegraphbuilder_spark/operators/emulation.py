"""Inference-cost emulation backends for scaling benchmarks.

The deterministic gazetteer/template backends cost microseconds per document —
three orders of magnitude below real model inference (GLiNER-large runs
~0.5-2 s per 100-token chunk on CPU, i.e. >=5000 us/token; a GPU-batched
pipeline still spends >=100 us/token). At sandbox corpus sizes that gap makes
any scaling measurement observe Spark's fixed overheads instead of the
compute the north rule cares about.

These wrappers produce byte-identical output to the deterministic backends
while burning a configurable ``cost_us_per_token`` of real CPU per token
inside the Arrow batch — emulating the model's FLOPs in the exact place a
real model would spend them (inside the batched UDF, per executor worker).
The default 60 us/token is 10-100x BELOW real model cost, so scaling numbers
measured with it are conservative.
"""

from __future__ import annotations

import time

import pandas as pd

from knowledgegraphbuilder_spark.operators.ner import GazetteerExtractor
from knowledgegraphbuilder_spark.operators.relations import TemplateRelationBackend


def _burn(us: float) -> None:
    """Burn ``us`` microseconds of CPU TIME (not wall time) in this thread.

    A wall-clock spin would complete in nominal time even when the scheduler
    gives the worker a fraction of a core — overstating scaling efficiency
    exactly when the cores are oversubscribed. CPU-time spin emulates a fixed
    FLOP budget: contention honestly stretches the wall clock."""
    clock = getattr(time, "thread_time", time.process_time)
    end = clock() + us / 1_000_000.0
    x = 0
    while clock() < end:
        x += 1


class WeightedGazetteerExtractor(GazetteerExtractor):
    def __init__(self, gazetteer, cost_us_per_token: float = 60.0):
        super().__init__(gazetteer)
        self.cost = cost_us_per_token

    def extract_batch(self, chunk_texts: pd.Series, labels=None):
        n_tokens = int(chunk_texts.str.count(" ").sum()) + len(chunk_texts)
        _burn(self.cost * n_tokens)
        return super().extract_batch(chunk_texts, labels)


class WeightedRelationBackend(TemplateRelationBackend):
    def __init__(self, cost_us_per_token: float = 60.0):
        self.cost = cost_us_per_token

    def generate_batch(self, chunk_texts: pd.Series, entity_blocks: pd.Series, ents: pd.Series):
        n_tokens = int(chunk_texts.str.count(" ").sum()) + len(chunk_texts)
        _burn(self.cost * n_tokens)
        return super().generate_batch(chunk_texts, entity_blocks, ents)
