"""Deterministic content-hashed identifiers.

The reference mints ``uuid4`` ids for entities, relations and nodes
(back/kgg/nodes/entity_extraction.py:70, back/kgg/nodes/relation_extraction.py:92,
back/kgg/generator.py:271). uuid4 breaks resume-idempotency and cross-run
triple matching, so this engine derives every id from content with SHA-256.

SHA-256 of the same string is identical in Spark (``sha2(x, 256)``) and DuckDB
(``sha256(x)``), which lets the driver's DuckDB oracle reproduce our ids
exactly. Fields are joined with the unit separator (0x1f) so no field
concatenation is ambiguous.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SEP = "\x1f"


def _sha_concat(*cols: Column | str) -> Column:
    cast = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols]
    return F.sha2(F.concat_ws(SEP, *cast), 256)


def mention_id(doc_id="doc_id", start="start", end="end", label="label") -> Column:
    """Entity id (reference key: per-doc (start, end, label) dedup,
    back/kgg/nodes/entity_extraction.py:89-99)."""
    return _sha_concat(F.lit("mention"), doc_id, start, end, label)


def relation_id(doc_id="doc_id", head_mention_id="head_mention_id",
                rel_type="rel_type", tail_mention_id="tail_mention_id") -> Column:
    """Relation id (reference dedup key (head.id, relation, tail.id),
    back/kgg/nodes/relation_extraction.py:138-144)."""
    return _sha_concat(F.lit("relation"), doc_id, head_mention_id, rel_type, tail_mention_id)


def node_id(text="text") -> Column:
    """Canonical-node id: one node per distinct surface text
    (back/kgg/generator.py:264-276)."""
    return _sha_concat(F.lit("node"), text)


def oracle_sql_id(kind: str, *exprs: str) -> str:
    """The DuckDB-SQL expression producing the same id as the helpers above."""
    joined = ", ".join([f"'{kind}'"] + [f"CAST({e} AS VARCHAR)" for e in exprs])
    return f"sha256(concat_ws(chr(31), {joined}))"
