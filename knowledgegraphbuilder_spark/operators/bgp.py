"""SPARQL-style basic graph pattern (BGP) matching over the triple table.

The reference exposes its graph only through hand-written traversals
(back/kgg/nodes/graph_answering.py retrieves by node weight; there is no
declarative query surface). A KG a user can't ASK is a warehouse table,
not a knowledge graph — this module adds the missing piece: a compiler
from SPARQL-style triple patterns (terms are either literals or
``?var`` variables) to a Catalyst join plan.

Semantics: set semantics (SELECT DISTINCT bindings), the W3C BGP match
over the distinct (subj, pred, obj) view. Each pattern row becomes a
filtered projection of the triple table; shared variables become inner
equi-joins; a variable repeated inside one pattern becomes a
self-equality filter.

Scale design (the part a naive per-pattern loop gets wrong):

- **Selectivity ordering.** Patterns are joined most-literal-first,
  restricted to patterns sharing a variable with the already-joined
  prefix — so the intermediate binding table starts smallest and every
  step is an equi-join, never an accidental cross join. Disconnected
  pattern groups (no shared variable anywhere) are an explicit
  ``crossJoin`` — the correct SPARQL product semantics, kept visible
  instead of hidden behind a join on nothing.
- **Partition pruning.** A literal predicate filter (`pred = '...'`)
  reaches the parquet scan; against the sinked edges table (partitioned
  by rel_type, sources/sinks.py) that is hive partition pruning — a
  typed pattern reads only its type's files at 10^12-edge scale.
- **Per-pattern dedup before the join.** Each projected pattern frame
  is distinct()-ed first, so join inputs carry binding sets, not raw
  edge multiplicity; AQE broadcasts the small pattern frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Pattern = tuple[str, str, str]


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _pattern_vars(p: Pattern) -> set[str]:
    return {t[1:] for t in p if _is_var(t)}


def _n_literals(p: Pattern) -> int:
    return sum(0 if _is_var(t) else 1 for t in p)


def plan_order(patterns: list[Pattern]) -> list[Pattern]:
    """Greedy selectivity order: seed with the most-literal pattern, then
    repeatedly take the most-literal pattern sharing a variable with the
    bound prefix; fall back to any remaining pattern (disconnected group
    -> product) only when nothing connects."""
    remaining = list(patterns)
    ordered: list[Pattern] = []
    bound: set[str] = set()
    while remaining:
        connected = [p for p in remaining if not ordered or (_pattern_vars(p) & bound)]
        pool = connected or remaining
        # stable tie-break: original position
        pick = max(pool, key=lambda p: (_n_literals(p), -remaining.index(p)))
        remaining.remove(pick)
        ordered.append(pick)
        bound |= _pattern_vars(pick)
    return ordered


def bgp_match(triples: DataFrame, patterns: list[Pattern]) -> DataFrame:
    """Match a basic graph pattern; returns one column per distinct
    variable (first-appearance order over the INPUT pattern order — the
    join planning below never changes the output shape), set semantics."""
    if not patterns:
        raise ValueError("bgp_match needs at least one pattern")
    input_order: list[str] = []
    for pat in patterns:
        for term in pat:
            if _is_var(term) and term[1:] not in input_order:
                input_order.append(term[1:])
    t = triples.select("subj", "pred", "obj")
    out: DataFrame | None = None
    seen: list[str] = []
    for s, p, o in plan_order(patterns):
        df = t
        src: dict[str, str] = {}
        for term, col in ((s, "subj"), (p, "pred"), (o, "obj")):
            if _is_var(term):
                v = term[1:]
                if v in src:  # same var twice in one pattern: ?x p ?x
                    df = df.filter(F.col(col) == F.col(src[v]))
                else:
                    src[v] = col
            else:
                df = df.filter(F.col(col) == F.lit(term))
        if not src:
            # fully-literal pattern: an existence guard (ASK semantics) —
            # keep rows only if the pattern matches at least one triple
            df = df.limit(1).select(F.lit(1).alias("__ask__"))
            proj = df
            shared: list[str] = []
        else:
            proj = df.select(*[F.col(c).alias(v) for v, c in src.items()]).distinct()
            shared = [v for v in src if v in seen]
        if out is None:
            out = proj
        else:
            out = out.join(proj, on=shared) if shared else out.crossJoin(proj)
        seen += [v for v in src if v not in seen]
    assert out is not None
    if not input_order:
        return out.select(F.lit(True).alias("matched"))
    return out.select(*input_order).distinct()


def optional_match(
    triples: DataFrame,
    patterns: list[Pattern],
    optional: list[Pattern],
) -> DataFrame:
    """SPARQL ``OPTIONAL`` over one optional group: match the mandatory
    BGP, then LEFT-join the optional group's bindings on their shared
    variables — mandatory bindings survive with NULL optional columns
    when the optional group has no match (W3C left-join semantics for a
    single, non-nested OPTIONAL block; set semantics throughout).

    Scale shape: both groups compile through :func:`bgp_match` (literal
    predicate filters reach the scan / prune rel_type partitions), so
    the only added cost over the mandatory match is one outer equi-join
    on the shared variables; AQE broadcasts whichever binding table is
    small. Column order: mandatory variables first (input order), then
    the optional group's new variables.
    """
    if not optional:
        return bgp_match(triples, patterns)
    req = bgp_match(triples, patterns)
    opt = bgp_match(triples, optional)
    shared = [c for c in req.columns if c in set(opt.columns)]
    if not shared:
        raise ValueError(
            "optional group shares no variable with the mandatory BGP "
            "(would be a cross product of every binding with every "
            "optional match — name the join variable explicitly)"
        )
    new_cols = [c for c in opt.columns if c not in shared]
    return req.join(opt, on=shared, how="left").select(
        *req.columns, *new_cols
    )


def path_closure(triples: DataFrame, pred: str, max_hops: int = 4) -> DataFrame:
    """SPARQL property-path ``pred+``: all (src, dst, hops) pairs reachable
    through 1..max_hops edges of one predicate, hops = the BFS-minimal
    count.

    Semi-naive evaluation: each round extends only the NEWLY discovered
    frontier by one typed hop (equi-join on the join node), anti-joined
    against everything already reached — so per-round work tracks the
    frontier, never the accumulated closure, and cycles terminate because
    a pair is extended at most once. localCheckpoint truncates lineage
    per round (the iterative-operator discipline of canonicalize.py's CC
    loop). The typed edge scan prunes to one rel_type partition against
    the sinked edges table.
    """
    edges = (
        triples.filter(F.col("pred") == pred)
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    reached = edges.withColumn("hops", F.lit(1).cast("long"))
    frontier = reached
    for hop in range(2, max_hops + 1):
        if frontier.isEmpty():
            break
        step = (
            frontier.select(F.col("src"), F.col("dst").alias("mid"))
            .join(edges.select(F.col("src").alias("mid"), "dst"), "mid")
            .select("src", "dst")
            .distinct()
            .join(reached.select("src", "dst"), ["src", "dst"], "left_anti")
            .withColumn("hops", F.lit(hop).cast("long"))
            .localCheckpoint(eager=True)
        )
        reached = reached.unionAll(step).localCheckpoint(eager=True)
        frontier = step
    return reached


def apply_rule(
    triples: DataFrame,
    body: list[Pattern],
    head: Pattern,
    only_new: bool = True,
) -> DataFrame:
    """One forward-chaining step of a datalog-style rule: match ``body``
    as a BGP, project each binding through ``head`` into a (subj, pred,
    obj) triple, and (with ``only_new``) anti-join away statements the
    graph already holds — the CONSTRUCT / materialized-inference surface.
    Chaining to fixpoint is a caller loop over this operator.
    """
    bindings = bgp_match(triples, body)

    def term_col(term: str):
        return F.col(term[1:]) if _is_var(term) else F.lit(term)

    derived = bindings.select(
        term_col(head[0]).alias("subj"),
        term_col(head[1]).alias("pred"),
        term_col(head[2]).alias("obj"),
    ).distinct()
    if only_new:
        derived = derived.join(
            triples.select("subj", "pred", "obj"),
            ["subj", "pred", "obj"],
            "left_anti",
        )
    return derived


def union_match(
    triples: DataFrame, groups: list[list[Pattern]]
) -> DataFrame:
    """SPARQL ``UNION`` of pattern groups: match each group as its own
    BGP and take the set union of the binding tables. Groups may bind
    different variable sets — the output carries the union of all
    variables (first-appearance order across groups) and a group that
    doesn't bind a variable contributes NULL there, exactly the W3C
    multiset-union-then-DISTINCT semantics under set semantics.

    Scale shape: each branch compiles independently (its literal
    predicate filters still prune rel_type partitions); the union is a
    narrow concatenation with one final distinct exchange.
    """
    if not groups:
        raise ValueError("union_match needs at least one group")
    branches = [bgp_match(triples, g) for g in groups]
    all_vars: list[str] = []
    for b in branches:
        for c in b.columns:
            if c not in all_vars:
                all_vars.append(c)
    out = None
    for b in branches:
        padded = b.select(
            *[
                F.col(v) if v in b.columns
                else F.lit(None).cast("string").alias(v)
                for v in all_vars
            ]
        )
        out = padded if out is None else out.unionByName(padded)
    return out.distinct()


def filter_match(
    triples: DataFrame, patterns: list[Pattern], condition: str
) -> DataFrame:
    """SPARQL ``FILTER``: restrict BGP bindings by a boolean expression
    over the bound variables (SQL syntax; variables are plain column
    names). The filter is applied to the compiled binding table, so
    Catalyst pushes sargable conjuncts below the final distinct and —
    when they touch a single pattern's variables — below the joins into
    that pattern's scan, exactly where a hand-written plan would put
    them. Non-sargable expressions (regexp, arithmetic) still run
    JVM-side in whole-stage codegen; nothing here leaves the optimizer's
    reach."""
    return bgp_match(triples, patterns).filter(F.expr(condition))


def minus_match(
    triples: DataFrame, patterns: list[Pattern], minus: list[Pattern]
) -> DataFrame:
    """SPARQL ``MINUS``: drop every binding of the mandatory BGP that is
    compatible with (agrees on the shared variables of) some binding of
    the minus group. W3C semantics with the standard caveat: if the two
    groups share no variable, no binding is ever compatible and MINUS
    removes nothing — kept explicit here rather than silently anti-joining
    on nothing (which would delete everything whenever the minus group is
    non-empty).

    Scale shape: one ``left_anti`` equi-join on the shared variables —
    Spark's dedicated no-payload anti-join, broadcast when the minus
    binding table is small. The minus group compiles through
    :func:`bgp_match`, so its literal predicates prune rel_type
    partitions before the anti-join ever shuffles."""
    req = bgp_match(triples, patterns)
    if not minus:
        return req
    neg = bgp_match(triples, minus)
    shared = [c for c in req.columns if c in set(neg.columns)]
    if not shared:
        return req
    # equi-join output moves the key columns first: restore input order
    return req.join(
        neg.select(*shared).distinct(), on=shared, how="left_anti"
    ).select(*req.columns)


def agg_match(
    triples: DataFrame,
    patterns: list[Pattern],
    group_vars: list[str],
    aggs: list[tuple[str, str, str]],
) -> DataFrame:
    """SPARQL ``GROUP BY`` + aggregates over BGP bindings: group the
    binding table by ``group_vars`` and compute each ``(fn, var, alias)``
    aggregate, where ``fn`` is one of ``count`` (count(*) when var is
    ``"*"``), ``count_distinct``, ``min``, ``max``. Counts are BIGINT.

    The binding table is already distinct (set semantics), so ``count``
    here is the W3C count over the solution multiset after DISTINCT —
    the common analytic ask ("how many distinct orgs per technology").
    Scale shape: one hash aggregate over the binding table, partial
    (map-side) combine for every supported fn; no window, no sort."""
    b = bgp_match(triples, patterns)
    exprs = []
    for fn, var, alias in aggs:
        if fn == "count":
            c = F.count(F.lit(1)) if var == "*" else F.count(F.col(var))
        elif fn == "count_distinct":
            c = F.countDistinct(F.col(var))
        elif fn == "min":
            c = F.min(F.col(var))
        elif fn == "max":
            c = F.max(F.col(var))
        else:
            raise ValueError(f"unsupported aggregate: {fn}")
        exprs.append(c.alias(alias))
    return b.groupBy(*group_vars).agg(*exprs)


def ask_match(triples: DataFrame, patterns: list[Pattern]) -> DataFrame:
    """SPARQL ``ASK``: does the BGP have at least one solution? Returns a
    single-row (matched: boolean) frame. The compiled plan is the same
    selectivity-ordered join as :func:`bgp_match` but under a global
    LIMIT 1, so Catalyst plans every exchange with CollectLimit semantics
    — on a hit, scans short-circuit after the first produced row instead
    of materializing the full binding table."""
    hit = bgp_match(triples, patterns).limit(1).count() > 0
    return triples.sparkSession.createDataFrame(
        [(bool(hit),)], "matched boolean"
    )


def describe_entity(triples: DataFrame, entity: str) -> DataFrame:
    """SPARQL ``DESCRIBE``: every statement where the entity appears as
    subject or object, with its role — the concise-bounded-description
    surface (one-hop star) a KG browser renders. One predicate-pushed
    scan per role over the distinct statement view; the union is narrow
    and shuffle-free. Completes the four W3C query forms next to SELECT
    (:func:`bgp_match`), CONSTRUCT (:func:`apply_rule`) and ASK
    (:func:`ask_match`)."""
    t = triples.select("subj", "pred", "obj").distinct()
    as_subj = t.filter(F.col("subj") == entity).select(
        F.lit("subject").alias("role"), "subj", "pred", "obj"
    )
    as_obj = t.filter(F.col("obj") == entity).select(
        F.lit("object").alias("role"), "subj", "pred", "obj"
    )
    return as_subj.unionByName(as_obj)


def path_alt(
    triples: DataFrame,
    preds: list[str] | None = None,
    inverse_preds: list[str] | None = None,
) -> DataFrame:
    """SPARQL property-path alternation with inverses: the distinct
    (src, dst) pairs connected by any predicate in ``preds`` (forward,
    ``p1|p2``) or any in ``inverse_preds`` (reversed, ``^p``). Together
    with :func:`path_closure` (``p+``) and BGP chaining (``p1/p2``)
    this completes the property-path algebra a KG query layer needs.

    Scale shape: an ``isin`` over a literal predicate list is a scan
    predicate — against the rel_type-partitioned edges sink it prunes
    to exactly the named partitions; the inverse branch is a column
    swap on its own pruned scan; one narrow union + distinct."""
    if not preds and not inverse_preds:
        raise ValueError("path_alt needs at least one predicate")
    t = triples.select("subj", "pred", "obj")
    parts = []
    if preds:
        parts.append(
            t.filter(F.col("pred").isin(list(preds)))
            .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        )
    if inverse_preds:
        parts.append(
            t.filter(F.col("pred").isin(list(inverse_preds)))
            .select(F.col("obj").alias("src"), F.col("subj").alias("dst"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def path_quantified(
    triples: DataFrame,
    pred: str,
    min_hops: int,
    max_hops: int,
    semantics: str = "exists",
) -> DataFrame:
    """SPARQL quantified property path ``pred{min_hops, max_hops}``
    (SPARQL 1.1 property-path quantifier, the bounded form every engine
    actually evaluates). Two semantics, chosen by ``semantics``:

    - ``"exists"`` (default — the W3C reading): a pair matches when
      SOME path of length L in [min_hops, max_hops] exists, even if a
      shorter path also connects it; ``hops`` reports the smallest
      matching L. Evaluated as per-hop-length reachability: R_L =
      distinct(R_{L-1} join edges) — exact-length composition with NO
      minimality anti-join — unioned over L in range. (Round-4 advice:
      the SPARQL-named API previously implemented only the stricter
      reading below, inviting misuse by callers expecting spec
      behavior.)
    - ``"minimal"``: pairs whose BFS-MINIMAL typed distance lies in
      range — the graph-analytic contract (a pair connected in 1 hop is
      NOT in p{2,3}). Reuses path_closure's semi-naive frontier; the
      lower bound is a filter on the minimal hop count.

    Both shapes are per-level typed equi-joins with level-bounded
    distincts and localCheckpoint lineage truncation; the typed edge
    scan prunes to one rel_type partition against the sinked edges
    table.
    """
    if not (1 <= min_hops <= max_hops):
        raise ValueError("need 1 <= min_hops <= max_hops")
    if semantics == "minimal":
        closure = path_closure(triples, pred, max_hops=max_hops)
        return closure.filter(F.col("hops") >= min_hops)
    if semantics != "exists":
        raise ValueError("semantics must be 'exists' or 'minimal'")
    edges = (
        triples.filter(F.col("pred") == pred)
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    cur = edges  # exact-length-1 pairs
    matched: DataFrame | None = None
    for level in range(1, max_hops + 1):
        if level > 1:
            if cur.isEmpty():
                break
            cur = (
                cur.select("src", F.col("dst").alias("mid"))
                .join(edges.select(F.col("src").alias("mid"), "dst"), "mid")
                .select("src", "dst")
                .distinct()
                .localCheckpoint(eager=True)
            )
        if level >= min_hops:
            lv = cur.withColumn("hops", F.lit(level).cast("long"))
            matched = lv if matched is None else matched.unionAll(lv)
    if matched is None:
        return edges.select(
            "src", "dst", F.lit(0).cast("long").alias("hops")
        ).limit(0)
    return matched.groupBy("src", "dst").agg(F.min("hops").alias("hops"))


def negated_property_set(
    triples: DataFrame, excluded: list[str]
) -> DataFrame:
    """SPARQL negated property set ``?s !(p1|...|pn) ?o`` (SPARQL 1.1
    §9.1): distinct subject-object pairs connected by at least one
    predicate OUTSIDE the excluded set. One NOT-IN filter pushed into
    the statement scan + distinct — Catalyst folds the negated set into
    the scan predicate, so this prunes partitions when the edge table
    is partitioned by rel_type (sinks.py layout).
    """
    return (
        triples.filter(~F.col("pred").isin(excluded))
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .distinct()
    )


def explain_rule(
    triples: DataFrame,
    body: list[Pattern],
    head: Pattern,
) -> DataFrame:
    """Explanation / provenance for rule derivations: for every head
    binding apply_rule would emit, report HOW it is supported — the
    number of distinct witness bindings of the body's non-head
    variables, a deterministic example witness, and the number of
    distinct source documents asserting any body atom instance that
    participates in a derivation of this head.

    The why-provenance surface (Green et al., PODS 2007 lineage
    semantics, restricted to counts + exemplar): a curation UI shows
    "a -> c because of 3 intermediate entities across 7 documents"
    without materializing the full derivation forest.

    Plan shape: the body BGP join runs ONCE (same planned join as
    apply_rule); witness stats are one grouped aggregate over the
    binding set; document support is one equi-join per body atom from
    the bindings back to the doc-stamped statement table, unioned and
    distinct-counted — each join is on the atom's full (s, p, o)
    instantiation, so it probes narrow.
    """
    bindings = bgp_match(triples, body)
    head_vars = [t[1:] for t in head if _is_var(t)]
    witness_vars = [c for c in bindings.columns if c not in head_vars]
    if not witness_vars:
        wit = bindings.groupBy(*head_vars).agg(
            F.count("*").cast("long").alias("n_witnesses"),
            F.lit(None).cast("string").alias("example_witness"),
        )
    else:
        wit = bindings.groupBy(*head_vars).agg(
            F.countDistinct(*witness_vars).cast("long").alias("n_witnesses"),
            F.min(witness_vars[0]).alias("example_witness"),
        )
    tr = triples.select("subj", "pred", "obj", "doc_id")
    support = None
    for s, p, o in body:
        df = tr
        cond = []
        for term, col in ((s, "subj"), (p, "pred"), (o, "obj")):
            if _is_var(term):
                cond.append((term[1:], col))
            else:
                df = df.filter(F.col(col) == F.lit(term))
        atom = bindings.join(
            df.select(
                *[F.col(col).alias(v) for v, col in cond], "doc_id"
            ),
            [v for v, _ in cond],
        ).select(*head_vars, "doc_id")
        support = atom if support is None else support.unionAll(atom)
    assert support is not None
    docs = support.groupBy(*head_vars).agg(
        F.countDistinct("doc_id").cast("long").alias("n_support_docs")
    )
    return wit.join(docs, head_vars)
