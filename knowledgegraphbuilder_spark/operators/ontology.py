"""RDFS-style ontology entailment over the extracted KG.

The reference's graph has flat NER labels and nothing above them
(back/kgg/nodes/entity_extraction.py emits label strings; no
hierarchy, no inheritance). Real KG consumers query at whatever
granularity they need — "all artifacts", not "all technologies plus
all systems plus..." — which requires the rdfs:subClassOf /
rdfs9-entailment step this module provides.

Scale split (why the closure is driver-side and the entailment is a
broadcast join): an ontology is human-authored and dim-sized (10^2 to
10^4 classes — even schema.org is ~800 types), so its transitive
closure is a trivial driver computation; the typing table it entails
over is entity-sized (10^9+ rows at the target scale). The right plan
is therefore: close the hierarchy in plain Python, broadcast the
closed (child, ancestor) table, and run ONE equi-join against the
typing table — no iteration ever touches the big side, no shuffle
bigger than the typing table's own, and Catalyst keeps the join
broadcast because the closure is provably small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def close_hierarchy(subclass_of: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Reflexive-transitive closure of a (child, parent) class list —
    plain-Python Warshall over the dim-sized ontology (see module doc
    for why this is deliberately NOT distributed). Cycles (a ⊑ b ⊑ a)
    are legal RDFS (mutual subclasses) and close to the full pair set
    without looping."""
    classes: set[str] = set()
    for c, p in subclass_of:
        classes.add(c)
        classes.add(p)
    reach: dict[str, set[str]] = {c: {c} for c in classes}
    for c, p in subclass_of:
        reach[c].add(p)
    changed = True
    while changed:
        changed = False
        for c in classes:
            new = set()
            for mid in reach[c]:
                new |= reach.get(mid, {mid})
            if not new <= reach[c]:
                reach[c] |= new
                changed = True
    return sorted((c, a) for c, aa in reach.items() for a in aa)


def rdfs_types(
    types: DataFrame, subclass_of: list[tuple[str, str]]
) -> DataFrame:
    """rdfs9 entailment: every (entity, type) assertion plus every
    (entity, ancestor-type) it entails under the closed subclass
    hierarchy. ``types`` is the (entity, label) typing table; labels
    not mentioned in the hierarchy still entail themselves (reflexive
    closure is padded for them). Returns distinct (entity, type).

    One broadcast equi-join + distinct; the typing table is scanned
    once regardless of hierarchy depth."""
    spark = types.sparkSession
    closed = close_hierarchy(subclass_of)
    cl = spark.createDataFrame(closed, "child string, ancestor string")
    t = types.select("entity", F.col("label")).distinct()
    inherited = (
        t.join(F.broadcast(cl), t.label == cl.child)
        .select("entity", F.col("ancestor").alias("type"))
    )
    own = t.select("entity", F.col("label").alias("type"))
    return own.unionByName(inherited).distinct()


def disjointness_violations(
    types: DataFrame,
    subclass_of: list[tuple[str, str]],
    disjoint_pairs: list[tuple[str, str]],
) -> DataFrame:
    """owl:disjointWith consistency audit: entities typed (after rdfs9
    entailment) with BOTH classes of a declared-disjoint pair — the
    ontology-level curation queue that catches extraction noise the
    per-predicate audits (graph_build.functional_violations) can't see,
    e.g. one surface form extracted as both an agent and an artifact.

    Disjointness in OWL is inherited by subclasses, so the check runs
    over the ENTAILED typing (rdfs_types), not the raw labels: declaring
    artifact disjointWith agent flags an entity typed technology+
    organization even though neither raw label appears in the pair list.

    Plan: the entailed typing table joined to itself through the
    broadcast (dim-sized) pair list — both probe joins are broadcast, so
    the cost is two scans of the typing table and a final distinct;
    nothing quadratic in entities. Pairs are normalized (least, greatest)
    so a violation reports once. Output: distinct
    (entity, class_a, class_b) with class_a < class_b.
    """
    spark = types.sparkSession
    entailed = rdfs_types(types, subclass_of)
    norm = sorted({(min(a, b), max(a, b)) for a, b in disjoint_pairs})
    dp = spark.createDataFrame(norm, "class_a string, class_b string")
    ta = entailed.select("entity", F.col("type").alias("class_a"))
    tb = entailed.select("entity", F.col("type").alias("class_b"))
    return (
        ta.join(F.broadcast(dp), "class_a")
        .join(tb, ["entity", "class_b"])
        .select("entity", "class_a", "class_b")
        .distinct()
    )
