"""RDF export: N-Triples/N-Quads serialization (operators/export.py).

The driver gate exercises the export on the clean synthetic corpus; these
tests pin the parts the corpus can't reach — ECHAR literal escaping on
adversarial text, IRI sanitization, and spec-shaped line grammar.
"""

import re

import pytest
from pyspark.sql import functions as F

from knowledgegraphbuilder_spark.operators.export import (
    to_nquads, to_ntriples,
)

NT_LINE = re.compile(r'^<[^<>"\s]+> <[^<>"\s]+> (<[^<>"\s]+>|"(\\.|[^"\\])*") \.$')
NQ_LINE = re.compile(r'^<[^<>"\s]+> <[^<>"\s]+> <[^<>"\s]+> <[^<>"\s]+> \.$')


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        ('alpha "quoted"', "rel type-x", "beta\\slash", "d1"),
        ("line\nbreak", "near", "tab\there", "d1"),
        ("alpha \"quoted\"", "rel type-x", "beta\\slash", "d2"),  # dup s,p,o
        ("plain", "near", "cr\rhere", "d3"),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string, doc_id string")


def test_nt_line_grammar_and_dedup(triples):
    out = to_ntriples(triples).collect()
    for r in out:
        assert NT_LINE.match(r["nt"]), r["nt"]
    rel = [r["nt"] for r in out if r["kind"] == "rel"]
    # 4 input rows but one (s,p,o) dup across docs -> 3 distinct statements
    assert len(rel) == len(set(rel)) == 3
    # 6 distinct node texts -> 6 label lines
    labels = [r["nt"] for r in out if r["kind"] == "label"]
    assert len(labels) == 6


def test_echar_escaping(triples):
    labels = {r["nt"] for r in to_ntriples(triples).collect()
              if r["kind"] == "label"}
    bodies = {m.group(1) for m in
              (re.search(r'"((?:\\.|[^"\\])*)" \.$', l) for l in labels) if m}
    assert any('alpha \\"quoted\\"' == b for b in bodies)
    assert any("beta\\\\slash" == b for b in bodies)
    assert any("line\\nbreak" == b for b in bodies)
    assert any("tab\\there" == b for b in bodies)
    assert any("cr\\rhere" == b for b in bodies)
    # no raw control chars survive anywhere
    for l in labels:
        assert "\n" not in l and "\r" not in l and "\t" not in l


def test_pred_iri_sanitized(triples):
    rel = [r["nt"] for r in to_ntriples(triples).collect() if r["kind"] == "rel"]
    preds = {l.split(" ")[1] for l in rel}
    assert "<urn:kg:rel:rel_type_x>" in preds
    assert "<urn:kg:rel:near>" in preds


def test_nquads_provenance_distinct(triples):
    out = [r["nq"] for r in to_nquads(triples).collect()]
    for l in out:
        assert NQ_LINE.match(l), l
    # same (s,p,o) under two docs stays two statements; exact dup collapses
    assert len(out) == len(set(out)) == 4


def test_iri_stable_under_repartition(triples):
    a = sorted(r["nt"] for r in to_ntriples(triples).collect())
    b = sorted(r["nt"] for r in to_ntriples(triples.repartition(7)).collect())
    assert a == b
