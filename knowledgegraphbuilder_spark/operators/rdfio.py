"""RDF N-Triples import: parse serialized lines back into surface triples.

Completes the interchange loop started by ``operators/export.py``: a KG
exported as N-Triples (W3C line format, the dialect ``to_ntriples``
emits) can be re-ingested without the original parquet tables — the
scenario where a downstream team hands back a filtered/augmented dump
from an RDF toolchain and the pipeline must continue from it. The
reference has no interchange surface at all (its graph lives only in
Neo4j property shapes, back/kgg/io/graph.py:58-95), so both directions
are engine additions.

Parse ∘ serialize must be the identity on the distinct triple set —
that invariant IS the correctness contract (the driver oracle for
``kg_import_nt`` is simply the distinct original triples).

Scale design: the two line shapes are split by one ``rlike`` filter and
destructured with ``regexp_extract`` — pure JVM codegen, no Python, one
map pass over the input lines. Node surface texts come back by joining
the statement lines to the ``rdfs:label`` lines on the content-hash IRI
(64-hex keys: uniformly distributed, skew-free shuffle; at bulk-load
scale the label side is |V| rows vs |E| statements, so AQE broadcasts
it whenever |V| fits). Literal unescaping reverses the 5 N-Triples
ECHAR escapes with a sentinel for the escaped backslash so ``\\n``
(backslash + n in the text) is not confused with ``\n`` (newline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# to_ntriples line shapes (export.py): statements use sanitized predicate
# local names, node IRIs embed 64-hex sha256 content hashes.
_REL_RE = (
    r"^<urn:kg:node:([0-9a-f]{64})> <urn:kg:rel:([A-Za-z0-9_]+)> "
    r"<urn:kg:node:([0-9a-f]{64})> \.$"
)
_LABEL_RE = (
    r"^<urn:kg:node:([0-9a-f]{64})> "
    r"<http://www\.w3\.org/2000/01/rdf-schema#label> \"(.*)\" \.$"
)


def unescape_literal(col: Column) -> Column:
    """Reverse the STRING_LITERAL_QUOTE ECHAR escapes. The escaped
    backslash goes to a \\x00 sentinel FIRST so the remaining ``\\<c>``
    pairs are guaranteed to be true escapes (a literal cannot contain a
    raw backslash after N-Triples escaping, so the sentinel is safe)."""
    col = F.replace(col, F.lit("\\\\"), F.lit("\x00"))
    for esc, raw in (("\\n", "\n"), ("\\r", "\r"), ("\\t", "\t"), ('\\"', '"')):
        col = F.replace(col, F.lit(esc), F.lit(raw))
    return F.replace(col, F.lit("\x00"), F.lit("\\"))


def from_ntriples(lines: DataFrame, col: str = "nt") -> DataFrame:
    """Parse N-Triples lines (the ``to_ntriples`` dialect) back into
    distinct ``(subj, pred, obj)`` surface-text triples.

    Statement lines carry only content-hash IRIs; the surface text of
    each node is recovered by joining the subject and object hashes to
    the parsed ``rdfs:label`` lines. Lines matching neither shape are
    ignored (comments / other vocab), which is the lenient behavior a
    bulk loader needs on a mixed dump.
    """
    nt = F.col(col)
    rel = (
        lines.filter(nt.rlike(_REL_RE))
        .select(
            F.regexp_extract(nt, _REL_RE, 1).alias("s_hash"),
            F.regexp_extract(nt, _REL_RE, 2).alias("pred"),
            F.regexp_extract(nt, _REL_RE, 3).alias("o_hash"),
        )
        .distinct()
    )
    labels = (
        lines.filter(nt.rlike(_LABEL_RE))
        .select(
            F.regexp_extract(nt, _LABEL_RE, 1).alias("n_hash"),
            unescape_literal(F.regexp_extract(nt, _LABEL_RE, 2)).alias("text"),
        )
        .distinct()
    )
    return (
        rel.join(labels.withColumnRenamed("n_hash", "s_hash")
                 .withColumnRenamed("text", "subj"), "s_hash")
        .join(labels.withColumnRenamed("n_hash", "o_hash")
              .withColumnRenamed("text", "obj"), "o_hash")
        .select("subj", "pred", "obj")
        .distinct()
    )
