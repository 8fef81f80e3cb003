"""Distributed k-means over embedding columns, exact-replayable.

Beyond reference parity (the reference's only clustering is FAISS's internal
IVF training, back/kgg/retriever.py): corpus clustering is the backbone of
several training-data operations — SemDeDup's coarse partition
(dedup.py:semantic_dedup uses assignment-only), topic-balanced mixture
sampling, and IVF index building all start from k-means.

The classic obstacle to verifying distributed k-means is that the centroid
UPDATE is a float mean, and float sums depend on reduction order — the same
job on a different partitioning yields different (all "correct") centroids.
This implementation runs Lloyd's algorithm entirely in FIXED-POINT INTEGERS:

- vectors quantize once to bigint (floor(x * 2**SCALE_BITS));
- assignment distances are exact integer sums of squared diffs
  (|x| < 2**21 -> per-dim square < 2**42, 64 dims -> < 2**48: no overflow);
- the centroid update is an exact per-dimension BIGINT sum (order-independent)
  followed by ONE deterministic rounding (floor of the double quotient).

Result: byte-identical output under any partitioning, and a DuckDB oracle
that replays every Lloyd iteration exactly — a property float k-means cannot
have. The quantization error (2**-20 per coordinate) is orders of magnitude
below embedding noise.

Scale shape per iteration: one broadcast of k centroids into the assignment
argmin (corpus scanned once), one posexplode + map-side-combinable
(cluster, dim) sum for the update — k*dim rows of state, never a collect of
members. Empty clusters simply drop (deterministic on both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE_BITS = 20
_SCALE = float(1 << SCALE_BITS)


def _quantize(embs: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return embs.select(
        F.col(id_col).cast("string").alias("id"),
        F.expr(
            f"transform({vec_col}, x -> cast(floor(cast(x as double) * {_SCALE!r}) as bigint))"
        ).alias("v"),
    )


_D2 = (
    "aggregate(zip_with(v, cv, (x, y) -> (x - y) * (x - y)), "
    "cast(0 as bigint), (a, x) -> a + x)"
)


def _assign(vq: DataFrame, cents: DataFrame) -> DataFrame:
    """(id, v, cid, d2): nearest centroid, ties to the smallest cid."""
    return (
        vq.crossJoin(F.broadcast(cents))
        .withColumn("d2", F.expr(_D2))
        .groupBy("id")
        .agg(
            F.first("v").alias("v"),
            F.min_by(F.struct("cid", "d2"), F.struct("d2", "cid")).alias("best"),
        )
        .select("id", "v", F.col("best.cid").alias("cid"), F.col("best.d2").alias("d2"))
    )


def kmeans_quantized(
    embs: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fixed-point Lloyd k-means: ``iters`` update rounds from the k
    sha256-smallest seed vectors, then a final assignment.

    Output: (id, cluster, d2) — d2 is the exact integer squared distance in
    quantized units (no floats anywhere in the output)."""
    vq = _quantize(embs, id_col, vec_col)
    cents = _fit_centroids(vq, k, iters)
    return _assign(vq, cents).select(
        "id", F.col("cid").alias("cluster"), "d2"
    )


def _fit_centroids(vq: DataFrame, k: int, iters: int) -> DataFrame:
    """The Lloyd loop of :func:`kmeans_quantized`, factored out so
    centroid consumers (silhouette below) share the exact fit."""
    cents = (
        vq.orderBy(F.sha2(F.col("id"), 256))
        .limit(k)
        .select(F.col("id").alias("cid"), F.col("v").alias("cv"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        assigned = _assign(vq, cents)
        dims = assigned.select(
            "cid", F.posexplode("v").alias("pos", "x")
        )
        sums = dims.groupBy("cid", "pos").agg(
            F.sum("x").alias("s"), F.count("*").alias("n")
        )
        cents = (
            sums.select(
                "cid",
                "pos",
                F.expr("cast(floor(cast(s as double) / n) as bigint)").alias("c"),
            )
            .groupBy("cid")
            .agg(
                F.expr("transform(array_sort(collect_list(struct(pos, c))), p -> p.c)").alias("cv")
            )
            .localCheckpoint(eager=True)
        )
    return cents


def kmeans_oracle_sql(
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB replay: identical quantization, seed pick, and unrolled Lloyd
    rounds (exact integer distances and sums; the single floor-of-quotient
    rounding is computed on identical doubles)."""
    d2 = (
        f"list_sum([(a.v[i] - c.cv[i]) * (a.v[i] - c.cv[i]) "
        f"FOR i IN generate_series(1, {dim})])"
    )
    ctes = [
        f"""vq AS (
          SELECT CAST({id_col} AS VARCHAR) AS id,
                 [CAST(floor(CAST(x AS DOUBLE) * {_SCALE!r}) AS BIGINT)
                  FOR x IN {vec_col}] AS v
          FROM {table}
        )""",
        f"""c0 AS MATERIALIZED (
          SELECT id AS cid, v AS cv FROM vq ORDER BY sha256(id) LIMIT {k}
        )""",
    ]
    for r in range(1, iters + 1):
        p = r - 1
        ctes.append(f"""a{r} AS MATERIALIZED (
          SELECT id, v, cid FROM (
            SELECT a.id, a.v, c.cid,
                   row_number() OVER (
                     PARTITION BY a.id ORDER BY {d2} ASC, c.cid ASC
                   ) AS rn
            FROM vq a CROSS JOIN c{p} c
          ) WHERE rn = 1
        )""")
        ctes.append(f"""c{r} AS MATERIALIZED (
          SELECT cid, list(c ORDER BY pos) AS cv FROM (
            SELECT cid, pos,
                   CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS c
            FROM (
              SELECT cid, i AS pos, v[i] AS x
              FROM a{r} CROSS JOIN generate_series(1, {dim}) t(i)
            ) GROUP BY cid, pos
          ) GROUP BY cid
        )""")
    return f"""
        WITH {', '.join(ctes)}
        SELECT id, cid AS cluster, d2 FROM (
          SELECT a.id, c.cid, CAST({d2} AS BIGINT) AS d2,
                 row_number() OVER (
                   PARTITION BY a.id ORDER BY {d2} ASC, c.cid ASC
                 ) AS rn
          FROM vq a CROSS JOIN c{iters} c
        ) WHERE rn = 1
    """


# silhouette ratio resolution: (b2 - a2) * _SIL_UNITS div max(a2, b2).
# d2 < 2**48 (module-header bound), so the product stays < 2**62 — no
# BIGINT overflow — and the 1e-4 ratio resolution is far below any
# clustering-quality signal. Integer div keeps the per-cluster fold an
# exact BIGINT sum (order-independent), the module's no-float-folds rule.
_SIL_UNITS = 10_000


def silhouette_profile(
    embs: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Clustering-quality evaluation: simplified (centroid) silhouette of
    the :func:`kmeans_quantized` fit, per cluster —

    ``(cluster, n, mean_sil)`` with ``sil = (b2 - a2) / max(a2, b2)``

    where a2 is the exact integer squared distance to the OWN centroid
    and b2 the min over OTHER centroids (the squared-distance variant of
    the classic score — same sign and ordering, no sqrt, so it stays in
    exact integers until one final division). Near +1: well-separated;
    near 0: on a boundary; negative: probably mis-assigned — the number
    that says whether k was right BEFORE a 100 TB re-cluster.

    Scale shape: one broadcast of the k centroids into a per-point
    argmin/second-min (corpus scanned once, k small), then a k-row
    aggregate of integer micro-unit ratios — order-exact, replayed
    bit-identically by :func:`silhouette_oracle_sql`.
    """
    vq = _quantize(embs, id_col, vec_col)
    cents = _fit_centroids(vq, k, iters)
    d = vq.crossJoin(F.broadcast(cents)).select(
        "id", "cid", F.expr(f"CAST({_D2} AS BIGINT)").alias("d2")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("d2", "cid")
    asg = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", F.col("cid").alias("cluster"), F.col("d2").alias("a2"))
    )
    alt = (
        d.join(asg, "id")
        .filter(F.col("cid") != F.col("cluster"))
        .groupBy("id")
        .agg(F.min("d2").alias("b2"))
    )
    su = asg.join(alt, "id").select(
        "cluster",
        F.expr(
            f"CASE WHEN greatest(a2, b2) = 0 THEN CAST(0 AS BIGINT) "
            f"ELSE (b2 - a2) * {_SIL_UNITS} div greatest(a2, b2) END"
        ).alias("s"),
    )
    return su.groupBy("cluster").agg(
        F.count("*").cast("long").alias("n"),
        F.round(
            F.sum("s").cast("long") / F.lit(float(_SIL_UNITS)) / F.count("*"), 6
        ).alias("mean_sil"),
    )


def silhouette_oracle_sql(
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB replay of :func:`silhouette_profile`: same quantization,
    seed pick and Lloyd rounds as :func:`kmeans_oracle_sql`, then the
    same integer micro-unit silhouette fold."""
    d2 = (
        f"list_sum([(a.v[i] - c.cv[i]) * (a.v[i] - c.cv[i]) "
        f"FOR i IN generate_series(1, {dim})])"
    )
    ctes = [
        f"""vq AS (
          SELECT CAST({id_col} AS VARCHAR) AS id,
                 [CAST(floor(CAST(x AS DOUBLE) * {_SCALE!r}) AS BIGINT)
                  FOR x IN {vec_col}] AS v
          FROM {table}
        )""",
        f"""c0 AS MATERIALIZED (
          SELECT id AS cid, v AS cv FROM vq ORDER BY sha256(id) LIMIT {k}
        )""",
    ]
    for r in range(1, iters + 1):
        p = r - 1
        ctes.append(f"""a{r} AS MATERIALIZED (
          SELECT id, v, cid FROM (
            SELECT a.id, a.v, c.cid,
                   row_number() OVER (
                     PARTITION BY a.id ORDER BY {d2} ASC, c.cid ASC
                   ) AS rn
            FROM vq a CROSS JOIN c{p} c
          ) WHERE rn = 1
        )""")
        ctes.append(f"""c{r} AS MATERIALIZED (
          SELECT cid, list(c ORDER BY pos) AS cv FROM (
            SELECT cid, pos,
                   CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS c
            FROM (
              SELECT cid, i AS pos, v[i] AS x
              FROM a{r} CROSS JOIN generate_series(1, {dim}) t(i)
            ) GROUP BY cid, pos
          ) GROUP BY cid
        )""")
    return f"""
        WITH {', '.join(ctes)},
        d AS (
          SELECT a.id, c.cid, CAST({d2} AS BIGINT) AS d2
          FROM vq a CROSS JOIN c{iters} c
        ),
        asg AS (
          SELECT id, cid AS cluster, d2 AS a2 FROM (
            SELECT id, cid, d2,
                   row_number() OVER (
                     PARTITION BY id ORDER BY d2 ASC, cid ASC
                   ) AS rn
            FROM d
          ) WHERE rn = 1
        ),
        alt AS (
          SELECT d.id, min(d.d2) AS b2
          FROM d JOIN asg ON d.id = asg.id AND d.cid <> asg.cluster
          GROUP BY d.id
        ),
        su AS (
          SELECT asg.cluster,
                 CASE WHEN greatest(a2, b2) = 0 THEN CAST(0 AS BIGINT)
                      ELSE CAST((b2 - a2) * {_SIL_UNITS} AS BIGINT)
                           // greatest(a2, b2) END AS s
          FROM asg JOIN alt ON asg.id = alt.id
        )
        SELECT cluster, CAST(count(*) AS BIGINT) AS n,
               round(CAST(sum(s) AS BIGINT) / {float(_SIL_UNITS)!r}
                     / count(*), 6) AS mean_sil
        FROM su GROUP BY cluster
    """


def grid_dbscan(
    embs: DataFrame,
    eps_milli: int = 25,
    min_pts: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Grid-accelerated DBSCAN (Ester et al., KDD 1996) over the first
    two embedding dimensions, held entirely in exact integers: points
    quantize to milli-unit coordinates (floor(v * 1000) — one IEEE
    multiply+floor per value, bit-identical in any engine), the
    eps-neighborhood test is an integer d^2 <= eps^2 compare, and the
    only pairwise work is an equi-join on eps-sized grid cells (each
    point probes its 3x3 cell neighborhood — the classic grid index, so
    cost tracks local density, never corpus^2).

    Cell ids use a pmod-based floor division that is correct for ANY
    sign: ``(v - pmod(v, eps)) div eps`` — pmod is the non-negative
    modulo, so the numerator is exactly divisible and truncation equals
    floor everywhere on the number line. (The previous +4096 shift only
    made truncation agree with floor while shifted coordinates stayed
    non-negative; a component <= -4.096 silently truncated cell ids
    toward zero and could miss eps-neighbors across cell boundaries —
    round-4 advice defect. Cell-boundary placement does not affect
    results — the 3x3 probe plus the exact integer distance test make
    the neighbor set boundary-invariant — but correctness of the grid
    must not depend on the data's coordinate range.)

    Full DBSCAN role semantics, deterministically: core = |eps-ball|
    (self included) >= min_pts; clusters = connected components of the
    core-core eps-graph (the large/small-star CC — density-reachability
    IS transitive closure over cores); border = non-core with >= 1 core
    eps-neighbor, assigned the LEXICOGRAPHIC-MIN neighboring cluster
    (the reference algorithm is arrival-order-dependent here; min is
    the deterministic pin, stated and oracle-replayed); noise = rest.

    Output: (vec_id, role in {'core','border','noise'}, cluster —
    min member vec_id string, NULL for noise).
    """
    from .canonicalize import connected_components

    eps2 = eps_milli * eps_milli
    # explicit f32 -> f64 cast BEFORE the multiply: f32*int and
    # f64*int round differently at floor boundaries across engines
    pts = embs.selectExpr(
        f"cast({id_col} as string) AS id",
        f"cast(floor(cast({vec_col}[0] as double) * 1000) as bigint) AS x",
        f"cast(floor(cast({vec_col}[1] as double) * 1000) as bigint) AS y",
    )
    cells = pts.selectExpr(
        "id", "x", "y",
        f"(x - pmod(x, {eps_milli})) div {eps_milli} AS cx",
        f"(y - pmod(y, {eps_milli})) div {eps_milli} AS cy",
    )
    probes = cells.selectExpr(
        "id", "x", "y",
        "explode(transform(sequence(-1, 1), dx -> cx + dx)) AS px",
        "cy",
    ).selectExpr(
        "id", "x", "y", "px",
        "explode(transform(sequence(-1, 1), dy -> cy + dy)) AS py",
    )
    # candidate pairs: probe cells vs home cells; keep true eps-neighbors
    nbrs = (
        probes.alias("a")
        .join(
            cells.selectExpr("id AS nid", "x AS nx", "y AS ny",
                             "cx AS px", "cy AS py").alias("b"),
            ["px", "py"],
        )
        .filter(
            F.expr(f"(x - nx) * (x - nx) + (y - ny) * (y - ny) <= {eps2}")
        )
        .select("id", "nid")
    )
    deg = nbrs.groupBy("id").agg(F.count("*").cast("long").alias("n_ball"))
    cores = deg.filter(F.col("n_ball") >= min_pts).select("id")
    core_edges = (
        nbrs.filter(F.col("id") < F.col("nid"))
        .join(cores, "id", "left_semi")
        .join(cores.selectExpr("id AS nid"), "nid", "left_semi")
        .selectExpr("id AS src", "nid AS dst")
    )
    cc = connected_components(core_edges).selectExpr(
        "vertex AS id", "component"
    )
    # isolated cores (min_pts-dense but no core neighbor) are their own
    # single-member cluster
    core_assign = (
        cores.join(cc, "id", "left")
        .selectExpr("id", "coalesce(component, id) AS cluster")
    )
    border = (
        nbrs.join(cores.selectExpr("id AS nid"), "nid", "left_semi")
        .join(cores, "id", "left_anti")
        .filter(F.col("id") != F.col("nid"))
        .join(core_assign.selectExpr("id AS nid", "cluster"), "nid")
        .groupBy("id")
        .agg(F.min("cluster").alias("cluster"))
    )
    return (
        pts.select("id")
        .join(core_assign.withColumn("role", F.lit("core")), "id", "left")
        .join(
            border.selectExpr("id", "cluster AS bcluster"), "id", "left"
        )
        .selectExpr(
            "id AS vec_id",
            "CASE WHEN role = 'core' THEN 'core' "
            "WHEN bcluster IS NOT NULL THEN 'border' "
            "ELSE 'noise' END AS role",
            "coalesce(cluster, bcluster) AS cluster",
        )
    )
