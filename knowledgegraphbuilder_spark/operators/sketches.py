"""Distributed sketches: deterministic HyperLogLog, Count-Min, and Bloom.

Beyond reference parity (the reference never counts anything approximately —
it works on thousands of docs; see back/kgg/generator.py's eager in-memory
passes): a 100 TB corpus profile needs per-group distinct counts, heavy
hitters, and membership probes without shuffling the raw values. The
standard sketches answer these — and Spark ships versions of each
(approx_count_distinct, count_min_sketch, bloom_filter_agg) — but their
hashing is engine-private, so their output cannot be replayed by an
independent oracle. These implementations derive every register/cell/bit
from sha256, making the whole sketch bit-identical in DuckDB SQL: the
correctness gate verifies the sketch itself, not just "some estimate came
out". All three keep fixed-size, MERGEABLE state (max / + / bit_or), which
is also what makes them streaming-safe (see stream_hll).

Scale design:
- No pre-distinct: register update is max(), which is idempotent — duplicate
  values cost nothing, so the plan is one explode + a map-side-combinable
  two-level groupBy ((group, register) max, then (group) sum). State per
  group is fixed at m=2**p registers regardless of input size.
- All register math stays in exact BIGINT (sum of 2**(RHO_MAX - rho) rather
  than a float sum of 2**-rho): integer addition is order-independent, so
  the result is invariant to partitioning/shuffle order — the float
  harmonic-mean form would make the estimate depend on reduction order.
  Max sum is m * 2**49 = 2**61 for p=12: no overflow under ANSI mode.
- The float division + bias corrections happen once per GROUP on exact
  integer inputs, identically in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 60-bit sha256-derived hash (15 hex chars): bit-identical in DuckDB as
# ('0x' || substr(sha256(x), 1, 15))::BIGINT
_H60 = "cast(conv(substring(sha2({x}, 256), 1, 15), 16, 10) as bigint)"

P = 12                       # register-index bits
M = 1 << P                   # 4096 registers
W_BITS = 60 - P              # 48 bits feed the rank
RHO_MAX = W_BITS + 1         # rho when the 48-bit window is all zeros
ALPHA = 0.7213 / (1.0 + 1.079 / M)


def hll_registers(df: DataFrame, group_col: str, value_expr: str) -> DataFrame:
    """(g, idx, maxr): the materialized register state per group — the
    MERGEABLE form of the sketch (union two register tables and re-max to
    combine sketches over disjoint or overlapping inputs; max is idempotent
    and commutative, which is what makes the streaming MERGE below exact)."""
    h = df.select(
        F.col(group_col).alias("g"),
        F.expr(_H60.format(x=value_expr)).alias("hv"),
    )
    mask = (1 << W_BITS) - 1
    reg = h.select(
        "g",
        F.expr(f"hv >> {W_BITS}").alias("idx"),
        # rho = 1 + leading zeros of the 48-bit window; bin() drops leading
        # zeros, so its length IS the bit length (exact, no float log)
        F.expr(
            f"case when (hv & {mask}) = 0 then {RHO_MAX} "
            f"else {RHO_MAX} - length(bin(hv & {mask})) end"
        ).alias("rho"),
    )
    return reg.groupBy("g", "idx").agg(F.max("rho").alias("maxr"))


def hll_distinct(
    df: DataFrame,
    group_col: str,
    value_expr: str,
    out_col: str = "est_distinct",
) -> DataFrame:
    """Deterministic HyperLogLog distinct estimate of ``value_expr`` (a SQL
    string expression) per ``group_col``.

    Output: (group_col, est_distinct: double rounded 4dp). Includes the
    standard small-range linear-counting correction (E <= 2.5m with empty
    registers); the 32-bit large-range correction does not apply to a 60-bit
    hash space.
    """
    return hll_estimate(hll_registers(df, group_col, value_expr), group_col, out_col)


def hll_estimate(
    mx: DataFrame,
    group_col: str,
    out_col: str = "est_distinct",
) -> DataFrame:
    """Finish a register table (g, idx, maxr) into the per-group estimate."""
    agg = mx.groupBy("g").agg(
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {RHO_MAX} - maxr)")).alias("s_present"),
        F.count("*").alias("n_present"),
    )
    # empty registers contribute 2**-0 = 1 each -> 2**RHO_MAX in integer form
    est = agg.select(
        F.col("g").alias(group_col),
        F.expr(
            f"cast(s_present + ({M} - n_present) * shiftleft(cast(1 as bigint), {RHO_MAX}) "
            f"as double)"
        ).alias("s_int"),
        F.expr(f"cast({M} - n_present as double)").alias("v"),
    ).select(
        group_col,
        F.expr(
            f"{ALPHA!r} * {M}.0 * {M}.0 * cast(shiftleft(cast(1 as bigint), {RHO_MAX}) as double)"
            f" / s_int"
        ).alias("e_raw"),
        "v",
    )
    return est.select(
        group_col,
        F.round(
            F.when(
                (F.col("e_raw") <= 2.5 * M) & (F.col("v") > 0),
                F.expr(f"{M}.0 * ln({M}.0 / v)"),
            ).otherwise(F.col("e_raw")),
            4,
        ).alias(out_col),
    )


def hll_oracle_sql(
    source_cte: str,
    group_col: str,
    value_expr: str,
    out_col: str = "est_distinct",
) -> str:
    """The DuckDB replay of hll_distinct: same sha256 registers, same exact
    integer accumulation, same correction branch. ``source_cte`` is a SELECT
    producing rows with ``group_col`` plus whatever columns ``value_expr``
    references."""
    mask = (1 << W_BITS) - 1
    return f"""
        WITH src AS ({source_cte}),
        h AS (
          SELECT {group_col} AS g,
                 ('0x' || substr(sha256({value_expr}), 1, 15))::BIGINT AS hv
          FROM src
        ),
        reg AS (
          SELECT g, hv >> {W_BITS} AS idx,
                 CASE WHEN (hv & {mask}) = 0 THEN {RHO_MAX}
                      ELSE {RHO_MAX} - length(bin(hv & {mask})) END AS rho
          FROM h
        ),
        mx AS (SELECT g, idx, max(rho) AS maxr FROM reg GROUP BY g, idx),
        agg AS (
          SELECT g,
                 CAST(sum(1::BIGINT << ({RHO_MAX} - maxr)) AS HUGEINT) AS s_present,
                 count(*) AS n_present
          FROM mx GROUP BY g
        ),
        est AS (
          -- HUGEINT keeps the accumulation exact (DuckDB would otherwise
          -- pick DECIMAL(18) and overflow at m * 2**49); the final DOUBLE
          -- cast rounds the identical integer the Spark side rounds
          SELECT g,
                 CAST(s_present + CAST({M} - n_present AS HUGEINT)
                      * {1 << RHO_MAX}::HUGEINT AS DOUBLE) AS s_int,
                 CAST({M} - n_present AS DOUBLE) AS v
          FROM agg
        )
        SELECT g AS {group_col},
               round(CASE WHEN ({ALPHA!r}::DOUBLE * {M}.0 * {M}.0 *
                                {float(1 << RHO_MAX)!r} / s_int) <= {2.5 * M!r}
                           AND v > 0
                          THEN {M}.0 * ln({M}.0 / v)
                          ELSE {ALPHA!r}::DOUBLE * {M}.0 * {M}.0 *
                               CAST(1::BIGINT << {RHO_MAX} AS DOUBLE) / s_int END,
                     4) AS {out_col}
        FROM est
    """


CMS_D = 4                    # hash rows
CMS_W = 1024                 # counters per row


def cms_sketch(df: DataFrame, value_expr: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan, 2005) of ``value_expr``
    frequencies: CMS_D independent sha256-derived hash rows of CMS_W
    counters. Output: (row, col, cnt) — at most CMS_D * CMS_W rows no matter
    the input size, built by ONE map-side-combinable groupBy (each input row
    explodes into CMS_D (row, col) cells).

    Like hll_distinct, every hash is sha256-derived so the sketch — not just
    its answers — replays bit-identically in the DuckDB oracle.
    """
    h = _H60.format(x=f"concat(cast(i as string), ',', {value_expr})")
    cells = df.select(
        F.explode(
            F.expr(
                f"transform(sequence(0, {CMS_D - 1}), i -> named_struct("
                f"'row', i, 'col', {h} % {CMS_W}))"
            )
        ).alias("c")
    ).select("c.row", "c.col")
    return cells.groupBy("row", "col").agg(F.count("*").cast("long").alias("cnt"))


def cms_topk(
    df: DataFrame,
    value_expr: str,
    k: int = 20,
    out_key: str = "key",
) -> DataFrame:
    """Heavy hitters via Count-Min: estimate every distinct key's frequency
    as min over the sketch's CMS_D cells, return the top-k by
    (est desc, key asc) plus the exact count for calibration.

    The probe side joins DISTINCT keys (vocab-sized) against the fixed-size
    sketch on (row, col) — at 100 TB the sketch is still CMS_D * CMS_W
    counters and broadcasts; the min-over-rows is a k-row aggregate per key.
    CMS error is one-sided: est >= exact always (collisions only add).
    """
    sketch = cms_sketch(df, value_expr)
    keys = df.select(F.expr(value_expr).alias("key")).groupBy("key").agg(
        F.count("*").cast("long").alias("exact_cnt")
    )
    return cms_probe_topk(sketch, keys, k=k, out_key=out_key)


def cms_probe_topk(
    sketch: DataFrame,
    keys: DataFrame,
    k: int = 20,
    out_key: str = "key",
) -> DataFrame:
    """Probe a prebuilt (row, col, cnt) Count-Min sketch with a
    (key, exact_cnt) table — the half of cms_topk that also serves merged
    sketches (e.g. the summed per-batch state a streaming fold leaves
    behind). est = min over the key's CMS_D cells; top-k by
    (est desc, key asc)."""
    hk = _H60.format(x="concat(cast(i as string), ',', key)")
    probes = keys.select(
        "key",
        "exact_cnt",
        F.explode(
            F.expr(
                f"transform(sequence(0, {CMS_D - 1}), i -> named_struct("
                f"'row', i, 'col', {hk} % {CMS_W}))"
            )
        ).alias("c"),
    ).select("key", "exact_cnt", "c.row", "c.col")
    est = (
        probes.join(F.broadcast(sketch), ["row", "col"])
        .groupBy("key", "exact_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
    )
    return (
        est.select(F.col("key").alias(out_key), "est_cnt", "exact_cnt")
        .orderBy(F.col("est_cnt").desc(), F.col(out_key).asc())
        .limit(k)
    )


def cms_oracle_sql(source_select: str, value_expr: str, k: int = 20, out_key: str = "key") -> str:
    """DuckDB replay of cms_topk: identical sha256 cells, identical min-probe."""
    h = f"(('0x' || substr(sha256(i::VARCHAR || ',' || {value_expr}), 1, 15))::BIGINT % {CMS_W})"
    hk = f"(('0x' || substr(sha256(i::VARCHAR || ',' || key), 1, 15))::BIGINT % {CMS_W})"
    return f"""
        WITH src AS ({source_select}),
        cells AS (
          SELECT i AS row, {h} AS col
          FROM src CROSS JOIN generate_series(0, {CMS_D - 1}) t(i)
        ),
        sketch AS (
          SELECT row, col, CAST(count(*) AS BIGINT) AS cnt
          FROM cells GROUP BY row, col
        ),
        keys AS (
          SELECT {value_expr} AS key, CAST(count(*) AS BIGINT) AS exact_cnt
          FROM src GROUP BY 1
        ),
        probes AS (
          SELECT key, exact_cnt, i AS row, {hk} AS col
          FROM keys CROSS JOIN generate_series(0, {CMS_D - 1}) t(i)
        ),
        est AS (
          SELECT key, exact_cnt, min(cnt) AS est_cnt
          FROM probes JOIN sketch USING (row, col)
          GROUP BY key, exact_cnt
        )
        SELECT key AS {out_key}, est_cnt, exact_cnt
        FROM est ORDER BY est_cnt DESC, {out_key} ASC LIMIT {k}
    """


BLOOM_BITS = 1 << 15         # m: filter size in bits (63-bit words: m/63 —
                             # bit 63 stays unused; 1<<63 overflows signed
                             # BIGINT and DuckDB raises on it)
BLOOM_K = 4                  # hash functions


def _bloom_positions(value_expr: str, engine: str) -> list[str]:
    """The BLOOM_K bit positions of a value, sha256-derived per hash index —
    identical expressions for Spark ('spark') and DuckDB ('duck')."""
    out = []
    for i in range(BLOOM_K):
        if engine == "spark":
            h = f"cast(conv(substring(sha2(concat('{i}', ',', {value_expr}), 256), 1, 15), 16, 10) as bigint)"
        else:
            h = f"(('0x' || substr(sha256('{i}' || ',' || {value_expr}), 1, 15))::BIGINT)"
        out.append(f"({h} % {BLOOM_BITS})")
    return out


def bloom_build(df: DataFrame, value_expr: str) -> DataFrame:
    """Build a Bloom filter over ``value_expr``: output (word, bits) — the
    set 64-bit words of an m-bit filter, built by one explode + a
    map-side-combinable bit_or aggregate. At most m/64 rows regardless of
    input size: the broadcastable form of a membership set (the primitive
    behind join pruning / semi-join pushdown at 100 TB, where the exact key
    set of the small side is still too big to broadcast raw)."""
    pos_arr = ", ".join(_bloom_positions(value_expr, "spark"))
    cells = df.select(
        F.explode(F.expr(f"array({pos_arr})")).alias("pos")
    ).select(
        F.expr("pos div 63").alias("word"),
        F.expr("shiftleft(cast(1 as bigint), cast(pos % 63 as int))").alias("bit"),
    )
    return cells.groupBy("word").agg(F.expr("bit_or(bit)").alias("bits"))


def bloom_probe(df: DataFrame, bloom: DataFrame, value_expr: str,
                id_col: str = "doc_id") -> DataFrame:
    """(id, hits): how many of the BLOOM_K probe bits are set (hits =
    BLOOM_K means 'possibly member'; anything less means definitely not).
    The filter broadcasts; the probe is a map-side join — the corpus never
    shuffles. One-sided like all Bloom answers: no false negatives."""
    pos_arr = ", ".join(_bloom_positions(value_expr, "spark"))
    probes = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.explode(F.expr(f"array({pos_arr})")).alias("pos"),
    ).select(
        "id",
        F.expr("pos div 63").alias("word"),
        F.expr("shiftleft(cast(1 as bigint), cast(pos % 63 as int))").alias("bit"),
    )
    return (
        probes.join(F.broadcast(bloom), "word", "left")
        .select(
            "id",
            F.when(
                (F.col("bits").isNotNull())
                & (F.expr("bits & bit") == F.col("bit")),
                1,
            ).otherwise(0).alias("hit"),
        )
        .groupBy("id")
        .agg(F.sum("hit").cast("int").alias("hits"))
    )


HDR_SUB_BITS = 4             # sub-bucket resolution: relative error <= 2^-4


def hdr_histogram(df: DataFrame, value_expr: str) -> DataFrame:
    """HdrHistogram-style log2 quantile sketch of a POSITIVE INTEGER value:
    bucket = (bit_length(v), top (1+HDR_SUB_BITS) bits of v). At most
    ~64 * 2^HDR_SUB_BITS rows regardless of input size, built by one
    map-side-combinable groupBy; counts are additive, so sketches merge by
    summing (the same mergeability contract as hll_registers/cms_sketch).

    Integer bucketing on purpose: DDSketch's floor(ln(x)/ln(gamma)) puts a
    transcendental on the bucket boundary, where Spark's and DuckDB's libm
    may disagree by one ulp and flip a bucket; bit_length + shiftright is
    exact in both engines (length(bin(x)) == bit length, per the sk_bloom
    conventions), so the sketch — not just its answers — replays in SQL.
    Output: (b, hi, cnt) with b = bit_length(v), hi = v >> max(b-1-
    HDR_SUB_BITS, 0)."""
    b = f"length(bin({value_expr}))"
    shift = f"greatest({b} - {1 + HDR_SUB_BITS}, 0)"
    return (
        df.select(
            F.expr(f"cast({b} as int)").alias("b"),
            F.expr(
                f"shiftright(cast({value_expr} as bigint), "
                f"cast({shift} as int))"
            ).alias("hi"),
        )
        .groupBy("b", "hi")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def hdr_quantiles(
    df: DataFrame, value_expr: str, qs: list[float] | None = None
) -> DataFrame:
    """Approximate quantiles from the HDR sketch: for each q, the LOWER
    BOUND of the first bucket whose cumulative count reaches ceil(q * n) —
    within a factor 2^-HDR_SUB_BITS of the exact rank value, by bucket
    construction. Output: (q, est) with est in the input's integer units.

    The cumulative walk is a window over the SKETCH (<= ~1k rows, one
    partition by design — same fixed-state argument as the CMS probe), not
    over the data: the corpus contributes only the groupBy."""
    qs = qs or [0.25, 0.5, 0.75, 0.9, 0.99]
    return hdr_quantiles_from_sketch(hdr_histogram(df, value_expr), qs)


def hdr_quantiles_from_sketch(sk: DataFrame, qs: list[float]) -> DataFrame:
    """The quantile walk of hdr_quantiles, starting from an already-built
    (b, hi, cnt) sketch — counts are additive, so any union of partial
    sketches re-aggregated by (b, hi) (e.g. the streaming per-batch fold in
    streaming/ingest.py:run_hdr_available_now) yields byte-identical answers
    to the batch path."""
    cum = sk.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.orderBy("b", "hi")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).crossJoin(F.broadcast(sk.groupBy().agg(F.sum("cnt").alias("n"))))
    qdf = None
    for q in qs:
        row = F.lit(float(q)).alias("q")
        qdf = (cum.sparkSession.range(1).select(row) if qdf is None
               else qdf.unionByName(cum.sparkSession.range(1).select(row)))
    lo = (f"shiftleft(hi, cast(greatest(b - {1 + HDR_SUB_BITS}, 0) "
          f"as int))")
    return (
        qdf.crossJoin(cum)
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("q")
        .agg(F.min_by(F.expr(lo), F.struct("b", "hi")).alias("est"))
        .select("q", F.col("est").cast("long").alias("est"))
    )


def mg_partition_summaries(keys: DataFrame, k: int) -> DataFrame:
    """Capacity-k Misra-Gries summary of each partition of a single-column
    ``key`` DataFrame: (key, cnt) rows, at most k+1 per partition, where
    ``cnt`` is the MG counter — a LOWER bound on the partition's true count,
    short by at most n_p/(k+1) (each decrement of 1 retires >= k+1 stream
    items). Runs as ONE Arrow-batched mapInPandas with a dict carried across
    the partition's record batches — no shuffle, no per-row Python.

    The summaries are mergeable (Agarwal et al., "Mergeable Summaries",
    PODS'12): summing counters across partitions/batches keeps the
    lower-bound property, and a key missing from EVERY summary has true
    count <= sum(n_p)/(k+1) — the superset guarantee both the batch
    heavy-hitter operator and the streaming fold build on."""
    import pandas as pd

    def mg(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for key, cnt in pdf["key"].value_counts().items():
                counters[key] = counters.get(key, 0) + int(cnt)
                if len(counters) > k:
                    dec = min(counters.values())
                    counters = {
                        x: c - dec for x, c in counters.items() if c > dec
                    }
        yield pd.DataFrame(
            {"key": list(counters.keys()),
             "cnt": [counters[x] for x in counters]}
        )

    return keys.mapInPandas(mg, "key string, cnt long")


def misra_gries_heavy_hitters(
    df: DataFrame, value_expr: str, k: int = 20
) -> DataFrame:
    """EXACT heavy hitters via a two-pass Misra-Gries filter (Misra & Gries
    1982; the distributed-merge guarantee is Agarwal et al., "Mergeable
    Summaries", PODS'12): every key with global frequency strictly above
    n/(k+1) is returned with its EXACT count, and nothing else.

    Pass A runs a capacity-k Misra-Gries summary per partition inside ONE
    Arrow-batched mapInPandas (a dict carried across the partition's record
    batches — no per-row Python UDF, no shuffle at all): if a key's global
    count exceeds n/(k+1), then by pigeonhole its count exceeds n_p/(k+1)
    in at least one partition p, so it survives that partition's summary —
    the union of per-partition candidates is a SUPERSET of the true heavy
    hitters for every possible partitioning. Pass B broadcast-semi-joins the
    corpus against that candidate set (<= k rows per partition) and recounts
    exactly, so the FINAL output is partitioning-independent even though the
    candidate set is not.

    Why not just groupBy(key): at 10^12 tokens the full-vocabulary groupBy
    shuffles every distinct key; here the only shuffle is the recount of
    candidate rows that survive a broadcast hash semi-join — the long tail
    never leaves the scan stage. (cms_topk keeps the whole vocab for its
    probe; this is the complementary design point: tiny state, exact
    answers, heavy-hitter-only output.)

    Output: (key, cnt, n_total) for keys with cnt * (k+1) > n_total
    (integer comparison — no float threshold).
    """
    keys = df.select(F.expr(value_expr).cast("string").alias("key")).filter(
        F.col("key").isNotNull() & (F.col("key") != "")
    )
    cand = mg_partition_summaries(keys, k).select("key").distinct()
    n_total = keys.groupBy().agg(F.count("*").cast("long").alias("n_total"))
    return (
        keys.join(F.broadcast(cand), "key", "left_semi")
        .groupBy("key")
        .agg(F.count("*").cast("long").alias("cnt"))
        .crossJoin(F.broadcast(n_total))
        .filter(F.col("cnt") * (k + 1) > F.col("n_total"))
        .select("key", "cnt", "n_total")
    )


MINHASH_GROUP_PERMS = 16     # permutations per group signature
# Mersenne prime for the a*x+b family. 2^61-1, NOT 2^31-1: the universe
# must dominate the per-source shingle-set size or hash collisions bias
# the resemblance estimate upward (r4 advice — at billions of docs per
# source, |shingles| approaching 2^31 made collisions non-negligible).
# The 60-bit sha prefix passes through mod-p unreduced (p > 2^60), so
# the effective universe is the full 2^60 of the portable hash; a*x+b
# needs ~122-bit intermediates, done exactly in DECIMAL(38,0) (Spark) /
# HUGEINT (DuckDB) — see minhash_group_signatures.
MINHASH_GROUP_PRIME = (1 << 61) - 1


def minhash_ab(n_perm: int = MINHASH_GROUP_PERMS) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) constants for the Carter-Wegman MinHash
    permutation family, sha256-derived so any replayer (the DuckDB
    oracles) can re-generate them: a_i in [1, p-1], b_i in [0, p-1]."""
    import hashlib

    p = MINHASH_GROUP_PRIME

    def h60(tag: str) -> int:
        return int(hashlib.sha256(tag.encode()).hexdigest()[:15], 16)

    return [
        (h60(f"mh-a-{i}") % (p - 1) + 1, h60(f"mh-b-{i}") % p)
        for i in range(n_perm)
    ]


def minhash_group_signatures(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    n_perm: int = MINHASH_GROUP_PERMS,
    k: int = 3,
) -> DataFrame:
    """Per-GROUP MinHash signature of the union of the group's documents'
    k-word shingle sets — the mergeable set-resemblance sketch (Broder
    1997): sig(A ∪ B) = elementwise-min(sig(A), sig(B)), so signatures
    fold across partitions, micro-batches, and corpus shards with a plain
    MIN aggregate, and the resemblance of two SOURCES is estimated from
    2 * n_perm longs however many billions of docs each side holds.

    Hash family: each shingle is sha256-hashed ONCE to a 60-bit integer
    (< p, so mod-p is the identity and the full 60-bit universe is kept
    — the collision margin a billion-shingle source needs), and the
    n_perm permutations are the classic universal family h_i(x) =
    (a_i*x + b_i) mod p over the Mersenne prime p = 2^61 - 1
    (Carter-Wegman; the standard MinHash construction) with (a_i, b_i)
    sha256-derived constants (:func:`minhash_ab`). One crypto hash per
    shingle instead of one per (shingle, permutation): the previous
    sha256-per-pair scheme spent ~n_perm * |shingles| microseconds of
    SHA per doc and dominated the streaming fold's wall clock. a_i*x+b_i
    reaches ~2^121, past BIGINT — the mod-mul is exact MERSENNE FOLDING
    in plain 64-bit integers (2^61 === 1 mod p): split a = a1*2^31 + a0
    and x = x1*2^30 + x0, reduce each cross term's power-of-two factor
    by the identity, and the folded sum stays < 2^60 + 3*2^61 < 2^63 —
    never overflows a signed long, ~10 integer ops per (shingle, perm)
    where the DECIMAL(38,0) alternative measured 2.6x slower end-to-end
    (BENCH r5). The oracle replays the same residues via HUGEINT
    arithmetic; values are identical because both compute a*x+b mod p.

    Scale shape: one pass — per-doc signature via a single running-minimum
    aggregate expression over the pre-hashed shingle array (no
    per-permutation rescan), then posexplode to (g, perm, minv) rows
    (n_perm per doc) and a map-side-combinable grouped MIN. State: n_perm
    rows per group. Output: (g, perm, minv).
    """
    from knowledgegraphbuilder_spark.functions.hashing import spark_word_shingles

    long_max = (1 << 63) - 1
    p = MINHASH_GROUP_PRIME
    # a split ONCE python-side: a = a1*2^31 + a0 (a1 < 2^30, a0 < 2^31)
    ab = ", ".join(
        f"named_struct('a1', cast({a >> 31} as bigint),"
        f" 'a0', cast({a & ((1 << 31) - 1)} as bigint),"
        f" 'b', cast({b} as bigint))"
        for a, b in minhash_ab(n_perm)
    )
    # exact (a*x + b) mod p via Mersenne folding, all in signed 64-bit:
    # with x = x1*2^30 + x0,
    #   a*x = a1*x1*2^61 + (a1*x0)*2^31 + (a0*x1)*2^30 + a0*x0
    # and 2^61 === 1 (mod p) folds every term under 2^62; the sum is
    # < 2^60 + 3*2^61 + 2^31 < 2^63. u = a1*x0 < 2^60 splits at 2^30;
    # v = a0*x1 < 2^61 splits at 2^31.
    fold = (
        "pmod(pmod("
        "ab.a1 * s.x1"
        " + (ab.a1 * s.x0) div 1073741824"                     # u1 = u >> 30
        " + pmod(ab.a1 * s.x0, 1073741824) * 2147483648"       # u0 << 31
        " + (ab.a0 * s.x1) div 2147483648"                     # v1 = v >> 31
        " + pmod(ab.a0 * s.x1, 2147483648) * 1073741824"       # v0 << 30
        " + ab.a0 * s.x0"
        f", {p}) + ab.b, {p})"
    )
    sig = (
        df.select(
            F.col(group_col).alias("g"),
            F.expr(spark_word_shingles(text_col, k)).alias("shingles"),
        )
        .filter(F.size("shingles") > 0)
        .select(
            "g",
            # x < 2^60 < p, so mod-p is the identity; split each hash once
            # into (x1, x0) at bit 30 for the per-perm Mersenne folding
            F.expr(
                f"transform(shingles, v -> named_struct("
                f"'x1', cast(conv(substring(sha2(v, 256), 1, 15), 16, 10)"
                f" as bigint) div 1073741824,"
                f"'x0', pmod(cast(conv(substring(sha2(v, 256), 1, 15), 16, 10)"
                f" as bigint), 1073741824)))"
            ).alias("hs"),
        )
        .select(
            "g",
            F.expr(
                f"""
                aggregate(
                  hs,
                  array_repeat(cast({long_max} as bigint), {n_perm}),
                  (acc, s) -> zip_with(acc, array({ab}),
                                       (m, ab) -> least(m, {fold})))
                """
            ).alias("sig"),
        )
    )
    return (
        sig.select("g", F.posexplode("sig").alias("perm", "minv"))
        .groupBy("g", "perm")
        .agg(F.min("minv").alias("minv"))
    )


def kmv_estimate(
    df: DataFrame,
    value_expr: str,
    k: int = 256,
    salt: str = "kmv-v1",
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch: keep the k smallest
    60-bit hashes of the distinct values; the estimator is
    (k - 1) * 2^60 / h_k with h_k the k-th smallest hash — the
    order-statistics cousin of HLL (HLL folds by register max, KMV by
    set-union + re-top-k; both mergeable, different accuracy/space
    trade: KMV's relative error ~ 1/sqrt(k-2) with exact small-set
    behavior below k).

    Exactness: hashes are the usual sha-derived 60-bit integers; the
    k-th order statistic is a deterministic integer on both engines;
    the estimate is one double divide, 6 dp. When the distinct count
    n <= k the sketch degrades to EXACT counting (reported via the
    n <= k branch).

    Scale shape: one distinct (map-side combinable), then a global
    top-k — Catalyst plans orderBy(h).limit(k) as
    TakeOrderedAndProject (per-partition heaps + driver merge of k
    rows), never a full sort shuffle. Output: one row
    (k_used, kth_hash, n_est, n_exact, rel_err) — n_exact is carried
    for the gate; a production caller drops it.
    """
    kk = int(k)
    hashed = (
        df.selectExpr(f"{value_expr} as v")
        .distinct()
        .select(
            F.expr(_H60.format(x=f"concat('{salt}', ',', cast(v as string))"))
            .alias("h")
        )
        .distinct()
    )
    topk = hashed.orderBy("h").limit(kk)
    st = topk.agg(
        F.count("*").cast("long").alias("m"),
        F.max("h").cast("long").alias("kth"),
    )
    n_exact = hashed.count()
    two60 = 1 << 60
    return st.selectExpr(
        "m as k_used",
        "kth as kth_hash",
        f"round(case when m < {kk} then cast(m as double)"
        f" else ({kk} - 1.0d) * {two60}d / kth end, 6) as n_est",
        f"cast({int(n_exact)} as bigint) as n_exact",
        f"round(abs(case when m < {kk} then cast(m as double)"
        f" else ({kk} - 1.0d) * {two60}d / kth end"
        f" - {int(n_exact)}) / {int(n_exact)}, 6) as rel_err",
    )


def minhash_source_resemblance(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    n_perm: int = MINHASH_GROUP_PERMS,
) -> DataFrame:
    """Pairwise SOURCE resemblance from the per-group MinHash signatures
    (minhash_group_signatures): est. Jaccard(A, B) = |{i : sig_A[i] ==
    sig_B[i]}| / n_perm (Broder 1997's collision estimator), reported as
    exact integers (n_agree, n_perm) plus the micro-unit ratio — THE
    question the group signatures exist to answer (which corpora overlap
    enough to cross-deduplicate?) from 2 * n_perm longs per pair,
    however many billions of documents each side holds.

    Plan: signatures (n_groups * n_perm rows) self-join on the
    permutation index — the pair table is |groups|^2 * n_perm, groups
    being dim-sized by construction — then one grouped agreement count.
    Output: (src_a, src_b, n_agree, n_perm, jaccard_micro) for a < b.
    """
    sig = minhash_group_signatures(df, group_col, text_col, n_perm=n_perm)
    a = sig.selectExpr("g AS src_a", "perm", "minv AS va")
    b = sig.selectExpr("g AS src_b", "perm", "minv AS vb")
    return (
        a.join(b, "perm")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.sum(F.expr("CASE WHEN va = vb THEN 1 ELSE 0 END"))
            .cast("long").alias("n_agree"),
            F.count("*").cast("long").alias("n_perm"),
        )
        .selectExpr(
            "src_a", "src_b", "n_agree", "n_perm",
            "CAST(n_agree * 1000000 div n_perm AS BIGINT) AS jaccard_micro",
        )
    )
