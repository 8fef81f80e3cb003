"""SHACL-style shape validation over the extracted KG.

A KG assembled by open extraction (the reference's pipeline:
back/kgg/nodes/relation_extraction.py emits whatever the model says)
has no schema enforcement at all — nothing checks that every
technology node links to at least one organization, or that an entity
doesn't sprout an implausible fan of a single predicate. This module
adds the W3C-SHACL-shaped subset that matters for extraction QA:
cardinality constraints (``sh:minCount`` / ``sh:maxCount`` on a
predicate path, outgoing or incoming) targeted by entity type
(``sh:targetClass`` ≈ NER label here), evaluated set-wise over the
distinct statement view.

Scale shape (the reason this is three aggregates and two joins, not a
per-shape loop):

- Path counts are computed ONCE for all shapes: one groupBy over the
  distinct (entity, pred) pairs per direction — map-side combinable,
  hub cost linear in degree.
- The shape table is dim-sized by construction (humans write shapes)
  and broadcast; targeting is an equi-join of the (entity, label)
  typing table against it.
- The count attach is a LEFT join so an entity with zero edges on the
  constrained path still evaluates (observed = 0 — the case minCount
  exists to catch). No windows, no per-shape scans: total cost is one
  pass over the statement table + one pass over the typing table,
  regardless of how many shapes are declared.

Output: one row per (focus entity, shape) evaluation — a full
validation report, not just the violations, so the conforms share is
auditable and the gate hashes a non-trivial surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHAPE_SCHEMA = (
    "focus_label string, path string, direction string, "
    "min_count long, max_count long"
)


def shacl_validate(
    triples: DataFrame,
    types: DataFrame,
    shapes: list[tuple[str, str, str, int | None, int | None]],
) -> DataFrame:
    """Evaluate cardinality shapes against the KG.

    ``triples``: (subj, pred, obj) statement table (extra columns
    ignored; statements are distinct-ed — set semantics).
    ``types``: (entity, label) typing table — here the NER labels an
    entity's mentions carried; an entity may have several.
    ``shapes``: rows of (focus_label, path, direction, min_count,
    max_count); direction is ``"out"`` (entity as subject) or ``"in"``
    (entity as object); either bound may be None.

    Returns (entity, focus_label, path, direction, observed, bound,
    conforms) — observed is the number of distinct statements on the
    path in that direction (SHACL counts value nodes; on a distinct
    statement view the two coincide); ``bound`` renders the declared
    bounds as a non-null string (``"min=1"``, ``"max=1"``,
    ``"min=1,max=3"``) so the report schema carries no nullable
    integer column (NULL-in-BIGINT degrades to float64 across Arrow /
    pandas boundaries and breaks exact-value comparison downstream).
    """
    spark = triples.sparkSession
    sh = spark.createDataFrame(
        [
            (fl, p, d,
             None if mn is None else int(mn),
             None if mx is None else int(mx))
            for fl, p, d, mn, mx in shapes
        ],
        SHAPE_SCHEMA,
    )
    t = triples.select("subj", "pred", "obj").distinct()
    out_cnt = t.groupBy(
        F.col("subj").alias("entity"), F.col("pred").alias("path")
    ).agg(F.count(F.lit(1)).cast("long").alias("observed")).withColumn(
        "direction", F.lit("out")
    )
    in_cnt = t.groupBy(
        F.col("obj").alias("entity"), F.col("pred").alias("path")
    ).agg(F.count(F.lit(1)).cast("long").alias("observed")).withColumn(
        "direction", F.lit("in")
    )
    cnts = out_cnt.unionByName(in_cnt)
    focus = (
        types.select(F.col("entity"), F.col("label"))
        .distinct()
        .join(F.broadcast(sh), F.col("label") == F.col("focus_label"))
        .select("entity", "focus_label", "path", "direction",
                "min_count", "max_count")
    )
    j = focus.join(
        cnts, on=["entity", "path", "direction"], how="left"
    ).withColumn("observed", F.coalesce(F.col("observed"), F.lit(0)).cast("long"))
    bound = F.concat_ws(
        ",",
        F.when(
            F.col("min_count").isNotNull(),
            F.concat(F.lit("min="), F.col("min_count").cast("string")),
        ),
        F.when(
            F.col("max_count").isNotNull(),
            F.concat(F.lit("max="), F.col("max_count").cast("string")),
        ),
    )
    return j.select(
        "entity", "focus_label", "path", "direction", "observed",
        bound.alias("bound"),
        (
            (F.col("min_count").isNull() | (F.col("observed") >= F.col("min_count")))
            & (F.col("max_count").isNull() | (F.col("observed") <= F.col("max_count")))
        ).alias("conforms"),
    )
