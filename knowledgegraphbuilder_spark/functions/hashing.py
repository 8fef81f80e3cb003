"""Portable deterministic hashing primitives.

Everything here is chosen to be reproducible in both Spark SQL and DuckDB SQL
(for the driver's oracle checks) and across runs/partitionings:

- ``sha256`` of a string is identical in both engines (functions/ids.py);
- MinHash/SimHash internals use Spark's ``xxhash64`` (seed-stable across runs
  and partitionings, vectorized JVM-side) — they never need to reproduce in
  DuckDB because the oracle checks approximate operators against their exact
  counterparts (e.g. LSH pairs vs exact-Jaccard pairs), not signatures;
- anything the oracle must reproduce bit-for-bit (fingerprints, ids) is
  sha256 or plain integer arithmetic.
"""

from __future__ import annotations

MERSENNE_P = (1 << 61) - 1


def minhash_params(n_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for universal hashing (python-side; the
    constants are baked into the generated Spark/SQL expressions)."""
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, MERSENNE_P), rng.randrange(0, MERSENNE_P)) for _ in range(n_perm)]


def spark_word_shingles(text_col: str, k: int) -> str:
    """Spark SQL expression: distinct k-word shingles of a single-space text
    column, as strings."""
    return (
        f"array_distinct(transform(sequence(0, greatest(size(split({text_col}, ' ')) - {k}, 0)), "
        f"i -> concat_ws(' ', slice(split({text_col}, ' '), i + 1, {k}))))"
    )


def duckdb_word_shingles(text_col: str, k: int) -> str:
    """DuckDB SQL expression producing the same shingle list."""
    return (
        f"list_distinct([array_to_string(string_split({text_col}, ' ')"
        f"[i + 1 : i + {k}], ' ') "
        f"FOR i IN range(0, greatest(len(string_split({text_col}, ' ')) - {k}, 0) + 1)])"
    )
