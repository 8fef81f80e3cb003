"""Knowledge fusion & completion over the extracted KG.

The reference stops at extraction: every relation the LLM emits lands in
the graph once (first-seen dedup, back/kgg/nodes/relation_extraction.py),
with no notion of how MANY independent extractions support a statement,
no conflict resolution for functional predicates, and no identity fusion
beyond exact surface-form matching (back/kgg/kg_generator.py builds nodes
by exact text). At 100 TB those gaps are the difference between a triple
store and a knowledge base — the Knowledge Vault line of work (Dong et
al., KDD 2014) is the public blueprint this module follows:

- :func:`fuse_extractions` — per-statement noisy-OR fusion of extraction
  events across extractor classes (Knowledge Vault §3: combine extractor
  confidences into a statement posterior).
- :func:`resolve_functional` — truth discovery for functional predicates
  by deterministic majority vote (the resolution step behind
  graph_build.functional_violations' audit).
- :func:`construct_graph` — SPARQL CONSTRUCT: materialize a new graph
  from BGP matches through multi-triple head templates with
  content-hash blank nodes (W3C SPARQL 1.1 §16.2).
- :func:`pra_path_features` — Path Ranking Algorithm features (Lao &
  Cohen, ECML 2010): per-pair counts of 2-hop typed paths for a target
  relation — the feature table a KG-completion ranker trains on.
- :func:`sameas_rewrite` — owl:sameAs fusion: close an equivalence edge
  set with the large/small-star connected-components operator and
  rewrite the graph onto canonical representatives.

Every fold here is exact-integer (counts, saturating micro-unit
probabilities) so the DuckDB oracles replay bit-for-bit; no float
accumulates across rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bgp import Pattern, bgp_match, _is_var


def fuse_extractions(
    triples: DataFrame,
    class_expr: str,
    residual_tenths: dict[str, int],
) -> DataFrame:
    """Noisy-OR fusion of extraction events into a per-statement
    confidence (Knowledge Vault, Dong et al. KDD 2014 §3.1).

    Each distinct (subj, pred, obj, doc_id) row is one extraction event;
    ``class_expr`` (a SQL expression over the input columns) assigns the
    event to an extractor class, and ``residual_tenths[c]`` is the class's
    per-event FAILURE probability in tenths (3 -> the extractor misses a
    true statement with p = 0.3). The fused confidence is

        P = 1 - prod_c (residual_c) ** k_c

    held in saturating integer micro-units: with residuals n_c/10 the
    product is prod(n_c**k_c) / 10**(sum k_c), so

        p_micro = 10**6 - prod(n_c**k_c) * 10**(6 - sum k_c)

    which is exact BIGINT arithmetic while sum(k_c) <= 6 and saturates at
    10**6 (certainty at micro resolution) beyond — a fixed-point
    saturation, not a float: the fold never multiplies doubles, so the
    oracle replays it exactly at any row order or partitioning.

    At scale: one distinct + two map-side-combinable aggregates over the
    statement key — no join, no window, shuffle = |distinct statements|.
    """
    classes = sorted(residual_tenths)
    ev = (
        triples.selectExpr(
            "subj", "pred", "obj", "doc_id", f"({class_expr}) AS ex_class"
        )
        .distinct()
    )
    counts = [
        F.sum(F.when(F.col("ex_class") == c, F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias(f"k_{c}")
        for c in classes
    ]
    g = ev.groupBy("subj", "pred", "obj").agg(*counts)
    return fuse_from_counts(g, residual_tenths)


def _ipow_decimal38(base: int, k_expr: str) -> str:
    """Exact ``base ** k`` as a Spark DECIMAL(38,0) expression: 6-bit
    exponentiation-by-squaring unroll with Python-computed exact square
    constants (base <= 7 -> base**32 ~ 1.1e27, every partial product
    <= 7**38 ~ 1.1e32 < 10**38, so scale-0 decimal multiplication never
    rounds). power() would go through binary64 and lose exactness past
    2**53 — the round-4 advice defect this replaces. Valid for k <= 63;
    every branch that evaluates it is guarded by total <= 38."""
    if base == 0:
        return f"CAST(CASE WHEN {k_expr} = 0 THEN 1 ELSE 0 END AS DECIMAL(38,0))"
    if base == 1:
        return "CAST(1 AS DECIMAL(38,0))"
    factors = [
        f"(CASE WHEN (shiftright({k_expr}, {b}) & 1) = 1 "
        f"THEN CAST('{base ** (1 << b)}' AS DECIMAL(38,0)) "
        f"ELSE CAST(1 AS DECIMAL(38,0)) END)"
        for b in range(6)
    ]
    return "(" + " * ".join(factors) + ")"


def noisy_or_micro_sql(
    residual_tenths: dict[str, int], dialect: str = "spark"
) -> str:
    """The EXACT noisy-OR posterior in integer micro-units as a SQL
    expression over per-class count columns ``k_<class>`` — shared by the
    Spark operator and the DuckDB oracles so both replay bit-for-bit.

        p_micro = 10**6 - ceil( prod_c r_c**k_c / 10**(total-6) )

    (= floor(10**6 * P) for P = 1 - prod (r_c/10)**k_c), evaluated in
    three exact regimes:

    - total <= 6: plain BIGINT (numerator <= 7**6, denominator divides).
    - 6 < total <= 38: ceil-division in DECIMAL(38,0) (Spark) / HUGEINT
      (DuckDB) — numerator <= 7**38 ~ 1.1e32, exact; this is the
      widened fixed point from the round-4 advice (the old code clamped
      to 10**6 for ANY total > 6, reporting certainty when the true
      posterior could be ~0.92 at residual 7).
    - total > 38: with residuals capped at 7/10, the residual mass is
      <= 0.7**39 * 10**6 < 1, so the exact floor is 999999 whenever the
      numerator is positive and 10**6 when a zero-residual class has an
      event (numerator exactly 0). Residuals 8 and 9 are rejected by
      :func:`fuse_from_counts` — they would need a wider fixed point
      than 38 digits to stay exact past 38 events.
    """
    classes = sorted(residual_tenths)
    for c in classes:
        r = int(residual_tenths[c])
        if not 0 <= r <= 7:
            raise ValueError(
                f"residual_tenths[{c!r}] = {r}: must be in 0..7 — residuals"
                " 8-9/10 exceed the exact DECIMAL(38,0)/HUGEINT fixed point"
                " past 38 events (see noisy_or_micro_sql)"
            )
    duck = dialect == "duckdb"

    def ipow(base: int, k_expr: str) -> str:
        if not duck:
            return _ipow_decimal38(base, k_expr)
        if base == 0:
            return f"CAST(CASE WHEN {k_expr} = 0 THEN 1 ELSE 0 END AS HUGEINT)"
        if base == 1:
            return "CAST(1 AS HUGEINT)"
        factors = [
            f"(CASE WHEN (({k_expr} >> {b}) & 1) = 1 "
            f"THEN CAST('{base ** (1 << b)}' AS HUGEINT) "
            f"ELSE CAST(1 AS HUGEINT) END)"
            for b in range(6)
        ]
        return "(" + " * ".join(factors) + ")"

    total = "(" + " + ".join(f"k_{c}" for c in classes) + ")"
    num = " * ".join(ipow(int(residual_tenths[c]), f"k_{c}") for c in classes)
    den = ipow(10, f"({total} - 6)")
    zero_classes = [c for c in classes if int(residual_tenths[c]) == 0]
    zero_hit = (
        "(" + " OR ".join(f"k_{c} > 0" for c in zero_classes) + ")"
        if zero_classes
        else "FALSE"
    )
    small_prod = " * ".join(
        f"CAST(power({int(residual_tenths[c])}, k_{c}) AS BIGINT)"
        for c in classes
    )
    ceil_div = (
        f"(({num}) + ({den}) - 1) // ({den})"
        if duck
        else f"(({num}) + ({den}) - 1) div ({den})"
    )
    # power() on integer base/exponent is exact in binary64 in the <= 6
    # branch (residual**6 <= 7**6 = 117649 << 2**53)
    return (
        f"CAST(CASE WHEN {total} <= 6 THEN "
        f"1000000 - ({small_prod}) * CAST(power(10, 6 - {total}) AS BIGINT) "
        f"WHEN {total} <= 38 THEN 1000000 - ({ceil_div}) "
        f"WHEN {zero_hit} THEN 1000000 "
        f"ELSE 999999 END AS BIGINT)"
    )


def fuse_from_counts(
    counts: DataFrame, residual_tenths: dict[str, int]
) -> DataFrame:
    """The noisy-OR posterior over PRE-AGGREGATED per-statement event
    counts (columns k_<class> — possibly several partial rows per
    statement, e.g. one per micro-batch from the streaming fold): sum
    the partials and apply the exact micro-unit formula
    (:func:`noisy_or_micro_sql` — DECIMAL(38,0) ceil-division past 6
    events, not a clamp). Counts are plain integers, so partial rows
    from any batching/sharding sum to exactly the full-corpus counts —
    this is the read side of streaming fusion maintenance
    (streaming/ingest.py:run_fusion_available_now)."""
    classes = sorted(residual_tenths)
    g = counts.groupBy("subj", "pred", "obj").agg(
        *[F.sum(f"k_{c}").cast("long").alias(f"k_{c}") for c in classes]
    )
    total = "(" + " + ".join(f"k_{c}" for c in classes) + ")"
    p_micro = noisy_or_micro_sql(residual_tenths, dialect="spark")
    return g.selectExpr(
        "subj", "pred", "obj",
        *[f"k_{c}" for c in classes],
        f"CAST({total} AS BIGINT) AS n_events",
        f"{p_micro} AS p_fused_micro",
    )


def resolve_functional(
    triples: DataFrame, functional_preds: list[str]
) -> DataFrame:
    """Truth discovery for functional predicates by majority vote: per
    (subj, pred in ``functional_preds``), keep the object with the most
    supporting extraction events (distinct docs), tie-broken by smallest
    object string — the resolution step that turns
    graph_build.functional_violations' audit queue into a clean graph
    (simplest instance of the vote-based truth-discovery family, see
    Li et al., VLDB 2012 survey).

    Deterministic argmax as an AGGREGATE — min(struct(-votes, obj)) —
    never a sorted window over the corpus, so hub subjects cost their
    degree, not degree**2. Two map-side-combinable groupBys; shuffle =
    |votes| then |subjects|.
    """
    votes = (
        triples.filter(F.col("pred").isin(functional_preds))
        .groupBy("subj", "pred", "obj")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_votes"))
    )
    best = (
        votes.groupBy("subj", "pred")
        .agg(
            F.min(
                F.struct((-F.col("n_votes")).alias("neg"), F.col("obj"))
            ).alias("w"),
            F.countDistinct("obj").cast("long").alias("n_candidates"),
            F.sum("n_votes").cast("long").alias("n_total_votes"),
        )
    )
    return best.select(
        "subj",
        "pred",
        F.col("w.obj").alias("obj_resolved"),
        (-F.col("w.neg")).cast("long").alias("n_votes"),
        "n_candidates",
        "n_total_votes",
    )


def construct_graph(
    triples: DataFrame,
    body: list[Pattern],
    heads: list[Pattern],
) -> DataFrame:
    """SPARQL CONSTRUCT (W3C SPARQL 1.1 §16.2): match ``body`` as a BGP
    and instantiate EVERY head template per binding, returning the
    constructed graph as distinct (subj, pred, obj).

    Head terms may be variables ('?x'), literals, or blank nodes
    ('_:name'): a blank node becomes a deterministic content-hash IRI
    ('b:' + sha256 over the full binding + its name), so the same
    binding always mints the same node — the skolemization that keeps
    CONSTRUCT idempotent under replay (same contract as
    functions/ids.py deterministic ids).

    The BGP join is planned by bgp.plan_order (selectivity-first);
    each head is a projection of the SAME binding set, so the pattern
    match runs once however many triples the template emits.
    """
    bindings = bgp_match(triples, body)
    vars_in_order = bindings.columns

    def term_col(term: str):
        if _is_var(term):
            return F.col(term[1:])
        if term.startswith("_:"):
            return F.concat(
                F.lit("b:"),
                F.sha2(
                    F.concat_ws(
                        "\x1f", F.lit(term[2:]), *[F.col(v) for v in vars_in_order]
                    ),
                    256,
                ),
            )
        return F.lit(term)

    out: DataFrame | None = None
    for h in heads:
        proj = bindings.select(
            term_col(h[0]).alias("subj"),
            term_col(h[1]).alias("pred"),
            term_col(h[2]).alias("obj"),
        )
        out = proj if out is None else out.unionAll(proj)
    assert out is not None
    return out.distinct()


def pra_path_features(
    triples: DataFrame,
    head_rel: str,
    max_fan: int = 1000,
) -> DataFrame:
    """Path Ranking Algorithm feature extraction (Lao & Cohen, ECML
    2010; the feature family Knowledge Vault's path-prior uses): for
    every entity pair (x, z) the graph asserts ``head_rel`` about, count
    the 2-hop typed paths x -p-> m -q-> z per metapath (p, q) — the
    per-pair feature table a KG-completion ranker consumes.

    Same scale shape as graph_build.mine_composition_rules: the only
    quadratic risk is the mid-entity self-join, capped by ``max_fan``
    (hubs above the cap carry no discriminative signal and are the
    fan**2 blowup — see STRESS_WL_RULES_r4.json for the artifact); the
    head join is an equi-join on (x, z). Path counts are multiset
    (n_paths counts paths, not witnesses) so the feature is the actual
    random-walk numerator, exact BIGINT.
    """
    ed = triples.select("subj", "pred", "obj").distinct()
    pos = (
        ed.filter(F.col("pred") == head_rel)
        .select(F.col("subj").alias("x"), F.col("obj").alias("z"))
        .distinct()
    )
    deg = (
        ed.select(F.col("obj").alias("mid"))
        .unionAll(ed.select(F.col("subj").alias("mid")))
        .groupBy("mid")
        .agg(F.count("*").alias("fan"))
        .filter(F.col("fan") <= max_fan)
        .select("mid")
    )
    left = ed.select(
        F.col("subj").alias("x"), F.col("pred").alias("body_p"),
        F.col("obj").alias("mid"),
    ).join(deg, "mid")
    right = ed.select(
        F.col("subj").alias("mid"), F.col("pred").alias("body_q"),
        F.col("obj").alias("z"),
    )
    paths = left.join(right, "mid").filter(
        # PRA walks exclude the trivial self-pair
        F.col("x") != F.col("z")
    )
    return (
        paths.join(pos, ["x", "z"])
        .groupBy("x", "z", "body_p", "body_q")
        .agg(F.count("*").cast("long").alias("n_paths"))
    )


def sameas_rewrite(
    triples: DataFrame,
    sameas: DataFrame,
) -> DataFrame:
    """owl:sameAs fusion: close the equivalence edge set ``sameas``
    (src, dst) with the large/small-star connected-components operator
    (canonicalize.connected_components — the same O(log n)-round CC that
    backs dedup resolution), then rewrite every triple's subject and
    object onto the component representative and take the distinct
    canonical graph.

    This is the identity-fusion step the reference lacks entirely (its
    nodes are exact surface strings, back/kgg/kg_generator.py): sameAs
    evidence is TRANSITIVE — a—b and b—c merge {a,b,c} even when a—c was
    never observed — so the closure must be a real CC, not a groupBy on
    a blocking key. The rewrite is two broadcast-size equi-joins (the
    assignment table is |entities|, dim-sized relative to |triples|),
    and the final distinct is the only full shuffle.
    """
    from .canonicalize import connected_components

    assign = connected_components(sameas)
    sub_map = assign.select(
        F.col("vertex").alias("subj"), F.col("component").alias("subj_c")
    )
    obj_map = assign.select(
        F.col("vertex").alias("obj"), F.col("component").alias("obj_c")
    )
    return (
        triples.select("subj", "pred", "obj")
        .join(F.broadcast(sub_map), "subj", "left")
        .join(F.broadcast(obj_map), "obj", "left")
        .select(
            F.coalesce(F.col("subj_c"), F.col("subj")).alias("subj"),
            F.col("pred"),
            F.coalesce(F.col("obj_c"), F.col("obj")).alias("obj"),
        )
        .distinct()
    )


def transe_rank_eval(
    triples: DataFrame,
    dim: int = 4,
    mod: int = 1000,
    max_candidates: int = 10000,
) -> DataFrame:
    """KG-completion ranking evaluation with TransE-style scoring
    (Bordes et al., NeurIPS 2013): score(s, r, o) = ||E(s) + R(r) -
    E(o)||_1 with deterministic sha256-derived integer embeddings
    (entity/relation vectors of ``dim`` components in [0, mod)), true
    objects ranked against the TYPE-CONSTRAINED candidate set (objects
    observed with the same relation — the standard filtered-candidate
    protocol) by strict-inferiority count.

    Everything is exact integer arithmetic — L1 distances of integer
    vectors, ranks as counts, MRR in floor-divided micro-units — so the
    DuckDB oracle replays the evaluation bit-for-bit; no trained floats
    anywhere (the point is the EVALUATION operator: plug a real KGE
    model's scores into the same plan at deployment).

    Scale shape: the only pairwise work is sum_r |T_r| * |C_r| — the
    candidate join is an equi-join on the relation, never |T| x |E| —
    and relations whose candidate set exceeds ``max_candidates`` are
    excluded (documented cap; hubs drown ranking signal anyway). Vector
    tables are dim-sized and broadcast.

    Output per relation: (pred, n_triples, n_candidates, sum_rank,
    hits_at1, hits_at3, mrr_micro_floor = sum(10^6 div rank)).
    """
    ed = triples.select("subj", "pred", "obj").distinct()

    def vec_expr(tag: str, col: str) -> str:
        return (
            f"transform(sequence(0, {dim - 1}), d -> "
            f"cast(conv(substring(sha2(concat_ws(chr(31), '{tag}', {col}, "
            f"cast(d as string)), 256), 1, 15), 16, 10) as bigint) % {mod})"
        )

    ents = (
        ed.select(F.col("subj").alias("e"))
        .unionAll(ed.select(F.col("obj").alias("e")))
        .distinct()
        .selectExpr("e", f"{vec_expr('ent', 'e')} AS ev")
    )
    rels = ed.select("pred").distinct().selectExpr(
        "pred", f"{vec_expr('rel', 'pred')} AS rv"
    )
    cand = (
        ed.select("pred", F.col("obj").alias("cand")).distinct()
        .join(F.broadcast(ents.selectExpr("e AS cand", "ev AS cv")), "cand")
    )
    csize = cand.groupBy("pred").agg(
        F.count("*").cast("long").alias("n_candidates")
    ).filter(F.col("n_candidates") <= max_candidates)
    score = (
        "aggregate(zip_with(zip_with(sv, rv, (a, b) -> a + b), xv, "
        "(x, y) -> abs(x - y)), cast(0 as bigint), (acc, v) -> acc + v)"
    )
    pos = (
        ed.join(F.broadcast(ents.selectExpr("e AS subj", "ev AS sv")), "subj")
        .join(F.broadcast(rels), "pred")
        .join(F.broadcast(ents.selectExpr("e AS obj", "ev AS xv")), "obj")
        .selectExpr("subj", "pred", "obj", "sv", "rv",
                    f"{score} AS true_score")
        .join(csize.select("pred"), "pred")
    )
    scored = (
        pos.join(cand, "pred")
        .selectExpr(
            "subj", "pred", "obj", "true_score",
            f"CASE WHEN {score.replace('xv', 'cv')} < true_score "
            f"THEN 1 ELSE 0 END AS beats",
        )
    )
    ranks = scored.groupBy("subj", "pred", "obj").agg(
        (F.sum("beats") + F.lit(1)).cast("long").alias("rnk")
    )
    return (
        ranks.groupBy("pred")
        .agg(
            F.count("*").cast("long").alias("n_triples"),
            F.sum("rnk").cast("long").alias("sum_rank"),
            F.sum(F.expr("CASE WHEN rnk <= 1 THEN 1 ELSE 0 END"))
            .cast("long").alias("hits_at1"),
            F.sum(F.expr("CASE WHEN rnk <= 3 THEN 1 ELSE 0 END"))
            .cast("long").alias("hits_at3"),
            F.sum(F.expr("1000000 div rnk")).cast("long")
            .alias("mrr_micro_floor"),
        )
        .join(F.broadcast(csize), "pred")
        .select("pred", "n_triples", "n_candidates", "sum_rank",
                "hits_at1", "hits_at3", "mrr_micro_floor")
    )
