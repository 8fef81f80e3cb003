import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from knowledgegraphbuilder_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("KG_TEST_SF_DIR", "/root/testdata/sf0.001")

VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark line "
    "sort window customer query big small data column join order group stream "
    "vector filter the a"
).split()


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        "kg-tests",
        parallelism=int(os.environ.get("KG_TEST_CPUS", "4")),
        shuffle_partitions=8,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def make_corpus(n_docs: int = 40, min_words: int = 20, max_words: int = 700, seed: int = 7):
    """Deterministic synthetic corpus incl. multi-chunk-length docs (the
    driver corpus maxes out at ~99 words; long docs exercise chunk-boundary
    semantics)."""
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        n = rng.randint(min_words, max_words)
        docs.append((f"t_{i}", " ".join(rng.choice(VOCAB) for _ in range(n))))
    return docs


@pytest.fixture(scope="session")
def corpus():
    return make_corpus()


@pytest.fixture(scope="session")
def corpus_df(spark, corpus):
    from knowledgegraphbuilder_spark.sources.interleaved import flat_to_spans

    flat = spark.createDataFrame(corpus, "doc_id string, text string")
    return flat_to_spans(flat)

@pytest.fixture(scope="session")
def corpus_df_flat(spark, corpus):
    return spark.createDataFrame(corpus, "doc_id string, text string")
