"""Graph export: RDF N-Triples / N-Quads serialization of the KG.

The reference materializes its graph only into Neo4j property shapes
(back/kgg/io/graph.py:58-95) — there is no interchange export, so a user
cannot hand the built KG to any downstream RDF tool (SPARQL stores,
rdflib, Jena). This module closes that gap with the two line-oriented
W3C formats that bulk loaders actually ingest at scale:

- N-Triples (https://www.w3.org/TR/n-triples/): one ``<s> <p> <o> .``
  line per edge plus one ``rdfs:label`` literal line per node.
- N-Quads (https://www.w3.org/TR/n-quads/): the same triple with the
  source document as the named graph — the provenance column becomes a
  first-class RDF citizen instead of a side table.

Scale design: every line is assembled with JVM codegen string
expressions (``concat`` / ``replace`` / ``regexp_replace`` /
``sha2``) — zero Python in the hot path, zero joins (node IRIs derive
from the deterministic content ids of functions/ids.py, so no
text->node_id lookup join is needed), and the only shuffle is the
``distinct()`` on the emitted lines. A 10^12-edge graph exports as one
map-side pass plus one dedup exchange, and the output is
line-partitionable for parallel bulk load.

IRI safety: node and doc IRIs embed SHA-256 content hashes (hex — no
characters that need percent-encoding); predicate IRIs sanitize the
rel_type to ``[A-Za-z0-9_]``. Only the human-readable label literal
needs escaping, done with the five N-Triples ECHAR escapes in
spec order (backslash first).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"

# N-Triples ECHAR escapes for STRING_LITERAL_QUOTE, backslash FIRST so
# later escapes don't double-escape their own backslashes.
_ECHARS = [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
           ("\r", "\\r"), ("\t", "\\t")]


def escape_literal(col: Column) -> Column:
    for raw, esc in _ECHARS:
        col = F.replace(col, F.lit(raw), F.lit(esc))
    return col


def node_iri(text: Column, base: str) -> Column:
    """``<{base}node:{sha256('node' US text)}>`` — same content hash as
    functions/ids.node_id, so the export needs no node-table join."""
    return F.concat(
        F.lit(f"<{base}node:"),
        F.sha2(F.concat_ws("\x1f", F.lit("node"), text.cast("string")), 256),
        F.lit(">"),
    )


def pred_iri(rel_type: Column, base: str) -> Column:
    return F.concat(
        F.lit(f"<{base}rel:"),
        F.regexp_replace(rel_type, "[^A-Za-z0-9_]", "_"),
        F.lit(">"),
    )


def to_ntriples(triples: DataFrame, base: str = "urn:kg:") -> DataFrame:
    """Serialize (subj, pred, obj) triples to N-Triples lines.

    Returns (kind, nt): kind='rel' for edge statements, kind='label' for
    the rdfs:label literal of each distinct node surface text.
    """
    rel = (
        triples.select(
            F.lit("rel").alias("kind"),
            F.concat_ws(
                " ",
                node_iri(F.col("subj"), base),
                pred_iri(F.col("pred"), base),
                node_iri(F.col("obj"), base),
                F.lit("."),
            ).alias("nt"),
        )
        .distinct()
    )
    texts = (
        triples.select(F.col("subj").alias("text"))
        .unionAll(triples.select(F.col("obj").alias("text")))
        .distinct()
    )
    labels = texts.select(
        F.lit("label").alias("kind"),
        F.concat(
            node_iri(F.col("text"), base),
            F.lit(f' <{RDFS_LABEL}> "'),
            escape_literal(F.col("text")),
            F.lit('" .'),
        ).alias("nt"),
    )
    return rel.unionAll(labels)


def to_nquads(triples: DataFrame, base: str = "urn:kg:") -> DataFrame:
    """Serialize (subj, pred, obj, doc_id) to N-Quads with the source
    document as the named graph — per-statement provenance that survives
    any RDF toolchain. Returns (nq)."""
    return (
        triples.select(
            F.concat_ws(
                " ",
                node_iri(F.col("subj"), base),
                pred_iri(F.col("pred"), base),
                node_iri(F.col("obj"), base),
                F.concat(
                    F.lit(f"<{base}doc:"),
                    F.sha2(F.concat_ws("\x1f", F.lit("doc"),
                                       F.col("doc_id").cast("string")), 256),
                    F.lit(">"),
                ),
                F.lit("."),
            ).alias("nq"),
        )
        .distinct()
    )


def to_rdfstar(fused: DataFrame, base: str = "urn:kg:") -> DataFrame:
    """RDF-star export of FUSED statements (W3C RDF-star CG report):
    one quoted-triple line per statement carrying its noisy-OR posterior
    (fusion.fuse_extractions' p_fused_micro) as statement-level
    metadata —

        << <s> <p> <o> >> <{base}meta:confidence_micro>
          "<micro>"^^xsd:integer .

    — the statement-annotation surface plain reification needs 4 triples
    for. Same IRI algebra as to_ntriples (content-hash node IRIs, no
    joins); one projection + distinct, no shuffle beyond it.
    """
    xsd_int = "http://www.w3.org/2001/XMLSchema#integer"
    return (
        fused.select(
            F.lit("conf").alias("kind"),
            F.concat(
                F.lit("<< "),
                node_iri(F.col("subj"), base),
                F.lit(" "),
                pred_iri(F.col("pred"), base),
                F.lit(" "),
                node_iri(F.col("obj"), base),
                F.lit(f" >> <{base}meta:confidence_micro> \""),
                F.col("p_fused_micro").cast("string"),
                F.lit(f'"^^<{xsd_int}> .'),
            ).alias("nt"),
        )
        .distinct()
    )
