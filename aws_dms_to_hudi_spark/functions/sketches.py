"""Mergeable-sketch operators (beyond-reference, SURVEY.md §7 M6).

The approx family's driver gates follow one contract (set by q12/q87):
an estimator may be probabilistic internally, but the GATED output must
be deterministic and hash-verifiable. For heavy hitters the classic way
to get there is the two-pass Misra-Gries pattern:

1. **Sketch pass** — every partition runs a Misra-Gries summary with
   ``k`` counters over its local token stream (``mapInPandas``, Arrow
   batches; state is a k-entry dict). MG guarantees every item with
   local frequency > n_p/k survives the partition's summary, and
   Σ n_p/k = n/k, so the UNION of per-partition candidate sets is a
   superset of every global item with frequency > n/k — regardless of
   how rows are partitioned.
2. **Verify pass** — exact counts for the (≤ k · partitions, tiny)
   candidate set via one filtered aggregate, keep frequency · k > n.

The emitted set is therefore EXACTLY the true heavy hitters — same
answer on any cluster layout — while the corpus is never globally
aggregated: the only full-data work is the linear sketch pass and one
semi-join-pruned count. At 100 TB the candidate set stays O(k · P) and
broadcasts; the verify aggregate shuffles only candidate-matching rows.

Oracle: the plain relational heavy-hitter query (GROUP BY + HAVING with
the same strict cross-multiplied threshold).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HH_K = 50  # counters per partition / strict threshold divisor


def _mg_partition(
    pdfs: Iterator[pd.DataFrame], k: int, col: str = "token"
) -> Iterator[pd.DataFrame]:
    """Misra-Gries summary of one partition's ``col`` stream (string
    tokens or their int64 hash proxies — the algorithm only compares
    keys for equality, so any injective-enough proxy works; see
    :func:`heavy_hitters` for why hashing cannot lose a heavy hitter)."""
    counters: dict = {}
    for pdf in pdfs:
        for tok, cnt in pdf[col].value_counts().items():
            if tok in counters:
                counters[tok] += int(cnt)
            elif len(counters) < k - 1:
                counters[tok] = int(cnt)
            else:
                # decrement-all by the min of (incoming, current floor):
                # batch form of the classic one-at-a-time decrement
                dec = min(int(cnt), min(counters.values()))
                counters = {
                    t: c - dec for t, c in counters.items() if c > dec
                }
                rem = int(cnt) - dec
                if rem > 0 and len(counters) < k - 1:
                    counters[tok] = rem
    yield pd.DataFrame({col: pd.Series(list(counters), dtype="int64")
                        if col == "hh" else list(counters)})


def heavy_hitters(
    tokens: DataFrame, k: int = HH_K, total: DataFrame | None = None
) -> DataFrame:
    """Exact heavy hitters (frequency · k > total) via the two-pass
    MG pattern. ``tokens`` must have a ``token`` string column.

    Returns (token, freq, n_total) for every true heavy hitter,
    deterministically, without a full global aggregate.

    r8 (guide §4.1/§2.3): the sketch pass streams ``xxhash64(token)``
    int64s through Arrow instead of the token strings — the JVM hashes
    natively, the Python boundary carries 8 bytes/row, and the MG dict
    keys are ints. Hashing cannot drop a true heavy hitter: freq(h(t))
    ≥ freq(t), so every string whose frequency clears the n/k bar has
    a hash that clears it too and survives the partition summaries
    (collisions only WIDEN the candidate superset). The verify pass
    joins on the same JVM-computed hash and counts exact token STRINGS,
    so false candidates (collisions included) are filtered exactly —
    the gated output is unchanged on any layout.

    ``total``: optional 1-row (n_total BIGINT) relation. The stream
    cardinality is layout-independent, so callers that already maintain
    the tokenize-once token-hash artifact pass COUNT(*) of it instead
    of paying a third tokenize pass here (q129: same tokenizer as the
    artifact, an equality every artifact-consumer gate hash-verifies).

    NULL tokens are dropped up front: xxhash64(NULL) is a CONSTANT
    (the seed), so a NULL-bearing stream would sketch that constant
    and the verify groupBy could emit a NULL-token row — whereas the
    pre-r8 string-key join silently dropped NULLs. Unreachable from
    the tokenizer-derived callers, but this is a general operator
    (r9 ADVICE)."""
    tokens = tokens.where(F.col("token").isNotNull())
    hashed = tokens.select(F.xxhash64("token").alias("hh"))
    cand = (
        hashed
        .mapInPandas(lambda it: _mg_partition(it, k, "hh"), "hh long")
        .distinct()
    )
    verified = (
        tokens.withColumn("hh", F.xxhash64("token"))
        .join(F.broadcast(cand), "hh")
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    if total is None:
        total = tokens.select(F.count("*").alias("n_total"))
    else:
        total = total.select(F.col(total.columns[0]).alias("n_total"))
    return (
        verified.crossJoin(F.broadcast(total))
        .filter(F.col("freq") * k > F.col("n_total"))
        .orderBy(F.col("freq").desc(), "token")
    )


def heavy_hitters_oracle_sql(
    table: str = "documents", k: int = HH_K, dialect: str = "duckdb"
) -> str:
    from . import portable as P

    toks = P.tokens("text", dialect)
    if dialect == "spark":
        tok_rows = (
            f"SELECT t AS token FROM (SELECT {toks} AS toks FROM {table}) "
            "LATERAL VIEW explode(toks) _x AS t"
        )
    else:
        tok_rows = f"SELECT unnest({toks}) AS token FROM {table}"
    return f"""
WITH tok AS ({tok_rows}),
tot AS (SELECT COUNT(*) AS n_total FROM tok)
SELECT token, CAST(COUNT(*) AS BIGINT) AS freq,
       CAST(MAX(tot.n_total) AS BIGINT) AS n_total
FROM tok CROSS JOIN tot
GROUP BY token
HAVING COUNT(*) * {k} > MAX(tot.n_total)
ORDER BY freq DESC, token
"""


def _mg_partition_grouped(
    pdfs: Iterator[pd.DataFrame], k: int
) -> Iterator[pd.DataFrame]:
    """Misra-Gries summaries of one partition's stream, one summary PER
    GROUP — k-1 counters per group inside a single task, so a hot group
    never forces per-group partitioning (the groupBy.applyInPandas
    formulation would funnel each group through one task)."""
    counters: dict[str, dict[int, int]] = {}
    for pdf in pdfs:
        for (g, tok), cnt in pdf.groupby(["grp", "hh"]).size().items():
            c = counters.setdefault(g, {})
            if tok in c:
                c[tok] += int(cnt)
            elif len(c) < k - 1:
                c[tok] = int(cnt)
            else:
                dec = min(int(cnt), min(c.values()))
                c2 = {t: n - dec for t, n in c.items() if n > dec}
                rem = int(cnt) - dec
                if rem > 0 and len(c2) < k - 1:
                    c2[tok] = rem
                counters[g] = c2
    yield pd.DataFrame(
        {"grp": [g for g, c in counters.items() for _ in c],
         "hh": pd.Series(
             [t for c in counters.values() for t in c], dtype="int64")}
    )


def heavy_hitters_by_group(
    tokens: DataFrame, group_col: str, k: int = HH_K,
    totals: DataFrame | None = None,
) -> DataFrame:
    """Exact PER-GROUP heavy hitters (freq · k > group total) via the
    same two-pass MG pattern as :func:`heavy_hitters`: per-partition
    group-keyed sketches (mergeable — any token with partition-group
    frequency above total/k survives that partition's summary, so the
    union covers every global per-group heavy hitter), then one exact
    verify pass restricted to candidates. ``tokens`` needs
    (group_col, token) columns.

    Sketch pass streams (grp, xxhash64(token)) — see
    :func:`heavy_hitters` for the hash-proxy superset argument; the
    verify join keys on (grp, hash) and counts exact strings.
    ``totals``: optional (group_col, n_group) relation from a caller
    that already maintains the tokenize-once artifact — saves the
    third tokenize pass; per-group stream counts are layout-free.

    NULL tokens dropped up front — same hash-of-NULL hazard as
    :func:`heavy_hitters` (r9 ADVICE)."""
    src = (tokens.where(F.col("token").isNotNull())
           .select(F.col(group_col).alias("grp"), "token"))
    cand = (
        src.select("grp", F.xxhash64("token").alias("hh"))
        .mapInPandas(
            lambda it: _mg_partition_grouped(it, k),
            "grp string, hh long",
        ).distinct()
    )
    verified = (
        src.withColumn("hh", F.xxhash64("token"))
        .join(F.broadcast(cand), ["grp", "hh"])
        .groupBy("grp", "token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if totals is None:
        totals = src.groupBy("grp").agg(F.count(F.lit(1)).alias("n_group"))
    else:
        totals = totals.select(
            F.col(totals.columns[0]).alias("grp"),
            F.col(totals.columns[1]).alias("n_group"))
    return (
        verified.join(F.broadcast(totals), "grp")
        .filter(F.col("freq") * k > F.col("n_group"))
        .select(F.col("grp").alias(group_col), "token",
                F.col("freq").cast("long").alias("freq"),
                F.col("n_group").cast("long").alias("n_group"))
        .orderBy(group_col, F.col("freq").desc(), "token")
    )


def heavy_hitters_by_group_oracle_sql(
    table: str = "documents", k: int = HH_K, dialect: str = "duckdb"
) -> str:
    from . import portable as P

    toks = P.tokens("text", dialect)
    if dialect == "spark":
        tok_rows = (
            f"SELECT lang, t AS token FROM (SELECT lang, {toks} AS toks "
            f"FROM {table}) LATERAL VIEW explode(toks) _x AS t"
        )
    else:
        tok_rows = f"SELECT lang, unnest({toks}) AS token FROM {table}"
    return f"""
WITH tok AS ({tok_rows}),
tot AS (SELECT lang, COUNT(*) AS n_group FROM tok GROUP BY lang)
SELECT t.lang, t.token, CAST(COUNT(*) AS BIGINT) AS freq,
       CAST(MAX(tot.n_group) AS BIGINT) AS n_group
FROM tok t JOIN tot ON t.lang = tot.lang
GROUP BY t.lang, t.token
HAVING COUNT(*) * {k} > MAX(tot.n_group)
ORDER BY t.lang, freq DESC, t.token
"""


# ---------------------------------------------------------------------------
# count-min sketch (bounded-memory frequency estimation service)
# ---------------------------------------------------------------------------

CMS_W = 16         # buckets per row (gate-sized: vocab 31 → real collisions)
CMS_D = 4          # hash rows
LEHMER = 48271     # MINSTD multiplier — full-period permutation mod 2^31-1


def _mix(h: str) -> str:
    """Uniformize a raw rolling hash: two Lehmer LCG steps
    (x → x·48271 mod 2³¹−1, a bijection of [1, P−1] with good spectral
    spread). The raw polynomial hash of a SHORT string is numerically
    small (a 5-char key stays ≪ P), which would wreck any
    order-statistic estimator (KMV's τ); the mix restores uniformity
    over [0, P) while staying all-integer and engine-portable
    ((h+1)·48271 < 2⁴⁷ — no overflow)."""
    from . import portable as P

    step1 = f"((({h}) + 1) * {LEHMER}) % {P.HASH_P}"
    return f"((({step1}) * {LEHMER}) % {P.HASH_P})"


def count_min_sql(dialect: str, table: str = "documents") -> str:
    """Count-min sketch over the document token stream, audited against
    exact counts (Cormode-Muthukrishnan CM sketch; the streaming-
    frequency analog of q129's Misra-Gries).

    Build: one pass over the token stream emits (row i, bucket_i) for
    each of ``CMS_D`` universal hashes derived from the single portable
    base hash (h·(2i+1) + i·salt mod P mod W — the token is hashed
    ONCE, rows differ by integer mixing only), then a GROUP BY
    (i, bucket) count. The sketch is exactly ``CMS_D × CMS_W`` cells
    regardless of corpus size — map-side partial aggregation collapses
    each partition to ≤ D·W rows before the only shuffle, and the
    finished sketch broadcasts to serve point queries.

    Query: for each probe token, estimate = MIN over rows of the
    addressed cell; CM guarantees estimate ≥ exact always, and
    ≤ exact + 2n/W with probability 1 − 2^−D. The gate probes the
    full gate-scale vocabulary (31 tokens; W=16 so collisions — and
    therefore genuine over-estimates — actually occur) and emits
    (token, exact, est, over_err); the test asserts the one-sided
    bound. The exact side is the gate-scale audit (a full token
    aggregate the sketch exists to avoid; at 100 TB only the D·W-cell
    sketch and a bounded probe list survive — W scales to 2/ε cells,
    independent of corpus size).

    Determinism: all-integer arithmetic on the shared rolling hash —
    bit-identical across engines on any partition layout (GROUP BY
    sums are order-independent).
    """
    from . import portable as P

    toks = P.tokens("text", dialect)
    if dialect == "spark":
        tok_rows = (
            f"SELECT t AS token FROM (SELECT {toks} AS toks FROM {table}) "
            "LATERAL VIEW explode(toks) _x AS t"
        )
    else:
        tok_rows = f"SELECT unnest({toks}) AS token FROM {table}"
    hv = P.rolling_hash("token", dialect)
    depth = ", ".join(f"({i})" for i in range(CMS_D))
    bucket = (
        f"((hv * (2 * d.i + 1) + d.i * 12582917) % {P.HASH_P}) % {CMS_W}"
    )
    return f"""
WITH tok AS ({tok_rows}),
h AS (SELECT token, {hv} AS hv FROM tok),
depth AS (SELECT * FROM (VALUES {depth}) AS t(i)),
cms AS (
  SELECT d.i AS i, {bucket} AS bucket, COUNT(*) AS cnt
  FROM h CROSS JOIN depth d
  GROUP BY 1, 2
),
probe AS (
  SELECT token, hv, COUNT(*) AS exact
  FROM h GROUP BY token, hv
)
SELECT p.token AS token,
       CAST(p.exact AS BIGINT) AS exact,
       CAST(MIN(c.cnt) AS BIGINT) AS est,
       CAST(MIN(c.cnt) - p.exact AS BIGINT) AS over_err
FROM probe p
CROSS JOIN depth d
JOIN cms c
  ON c.i = d.i
 AND c.bucket = ((p.hv * (2 * d.i + 1) + d.i * 12582917) % {P.HASH_P}) % {CMS_W}
GROUP BY p.token, p.exact
ORDER BY token
"""


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-cardinality / intersection sketch
# ---------------------------------------------------------------------------

KMV_K = 256


def kmv_sql(
    dialect: str, orders: str = "orders", customer: str = "customer"
) -> str:
    """KMV (k-minimum-values / bottom-k theta) sketch estimating the
    distinct cardinality of two key sets AND their intersection from
    O(k) state — the set-expression sketch (Beyer et al., "On synopses
    for distinct-value estimation"; the DataSketches theta-sketch
    family): A = distinct ``o_custkey`` of every third order (a proper
    subset of the customer base, so the intersection estimate is
    non-degenerate), B = distinct ``c_custkey`` of customer.

    Method: hash every key with the shared portable hash uniformized
    by :func:`_mix` (raw polynomial hashes of short keys are
    numerically small, which would bias τ); keep the ``KMV_K`` smallest
    distinct hash values of A ∪ B. With τ = the k-th smallest,
    distinct(A∪B) ≈ (k−1)·P/τ, and the intersection scales that by the
    fraction of the k-sample present in both sets. All-integer
    estimator: est_inter = matched·(k−1)·P div (k·τ) — deterministic
    across engines (matched·(k−1)·P < 2^48, no overflow).

    Gate output is one row: sample stats (k_a, k_b, matched, tau),
    integer estimates (est_union, est_inter), and the exact audit
    values — the test asserts the estimates land within a fixed
    relative band of exact (k=256 → σ ≈ 1/√254 ≈ 6%).

    Shape at 100 TB: the bottom-k of a set is a per-partition bounded
    heap merged associatively — Spark's ORDER BY + LIMIT k physical
    plan (TakeOrderedAndProject) already computes per-partition top-k
    and merges k·P_parts rows at the driver; the preceding DISTINCT is
    a map-side partial aggregate. No full key set ever crosses the
    network un-reduced, and the finished sketch is k rows — the shape
    that lets a 1000-executor cluster estimate join cardinalities
    before planning the join itself.
    """
    from . import portable as P

    s = "STRING" if dialect == "spark" else "VARCHAR"
    ha = _mix(P.rolling_hash(f"CAST(o_custkey AS {s})", dialect))
    hb = _mix(P.rolling_hash(f"CAST(c_custkey AS {s})", dialect))
    est_u = P.int_div(
        f"({KMV_K} - 1) * CAST({P.HASH_P} AS BIGINT)", "tau", dialect
    )
    est_i = P.int_div(
        f"matched * ({KMV_K} - 1) * CAST({P.HASH_P} AS BIGINT)",
        f"({KMV_K} * tau)",
        dialect,
    )
    return f"""
WITH a AS (
  SELECT DISTINCT {ha} AS hv FROM {orders} WHERE o_orderkey % 3 = 0
),
b AS (SELECT DISTINCT {hb} AS hv FROM {customer}),
u AS (
  SELECT hv, MAX(in_a) AS in_a, MAX(in_b) AS in_b
  FROM (
    SELECT hv, 1 AS in_a, 0 AS in_b FROM a
    UNION ALL
    SELECT hv, 0 AS in_a, 1 AS in_b FROM b
  ) both_sets
  GROUP BY hv
),
kmin AS (SELECT * FROM u ORDER BY hv LIMIT {KMV_K}),
stats AS (
  SELECT CAST(SUM(in_a) AS BIGINT) AS k_a,
         CAST(SUM(in_b) AS BIGINT) AS k_b,
         CAST(SUM(in_a * in_b) AS BIGINT) AS matched,
         CAST(MAX(hv) AS BIGINT) AS tau
  FROM kmin
),
exact AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS exact_union,
         CAST(SUM(in_a * in_b) AS BIGINT) AS exact_inter
  FROM u
)
SELECT s.k_a, s.k_b, s.matched, s.tau,
       CAST({est_u} AS BIGINT) AS est_union,
       CAST({est_i} AS BIGINT) AS est_inter,
       e.exact_union, e.exact_inter
FROM stats s CROSS JOIN exact e
"""


# ---------------------------------------------------------------------------
# HyperLogLog (mergeable register sketch for distinct counting)
# ---------------------------------------------------------------------------

HLL_M = 64       # registers (p=6); sigma = 1.04/sqrt(64) = 13%
HLL_WBITS = 25   # hash bits left after bucketing: (2^31-1) div 64 < 2^25
HLL_ALPHA_NUM = 709   # alpha_64 = 0.709 (Flajolet et al. 2007, fig. 3)
HLL_ALPHA_DEN = 1000


def _shl(one_shifted_by: str, dialect: str) -> str:
    """Portable ``1 << n`` as BIGINT (Spark spells it shiftleft)."""
    if dialect == "spark":
        return f"shiftleft(CAST(1 AS BIGINT), {one_shifted_by})"
    return f"(CAST(1 AS BIGINT) << ({one_shifted_by}))"


def hll_const_ctes() -> str:
    """Shared constant relations for the HLL estimator: the dense
    64-bucket grid axis and the linear-counting table of
    round(m·ln(m/V)) integers frozen at SQL-build time in Python —
    both engines read the same constants, so the small-range branch is
    exact cross-engine."""
    import math

    lc_rows = ", ".join(
        f"({v}, {round(HLL_M * math.log(HLL_M / v))})"
        for v in range(1, HLL_M + 1)
    )
    bucket_rows = ", ".join(f"({j})" for j in range(HLL_M))
    return (
        f"hll_buckets AS (SELECT * FROM (VALUES {bucket_rows})"
        f" AS b(bucket)),\n"
        f"hll_lc AS (SELECT * FROM (VALUES {lc_rows}) AS l(v, est))"
    )


def hll_rho_expr() -> str:
    """rho over the post-bucket hash bits column ``w`` — position of
    the leftmost 1-bit in the {HLL_WBITS}-bit field (w = 0 => field
    width + 1) via length(bin(w)), identical in both engines."""
    return (
        f"CASE WHEN w = 0 THEN {HLL_WBITS + 1}"
        f" ELSE {HLL_WBITS + 1} - length(bin(CAST(w AS BIGINT))) END"
    )


def hll_est_ctes(dialect: str, regs: str, prefix: str) -> str:
    """The HLL estimator as a reusable CTE chain over ANY register
    relation ``regs`` with columns (grp, bucket, m): densify over the
    64-bucket grid, fold S = SUM(2^(W+1−M_j)), apply the all-integer
    raw estimate (alpha·m²·2^(W+1)) div (den·S) with the frozen
    linear-counting branch, and emit
    ``{prefix}est(grp, filled, reg_sum, reg_check, est_distinct)``.
    Requires :func:`hll_const_ctes` earlier in the same WITH. Used by
    hll_sql (per-year + merged sketches) and hyperanf
    (per-node ball-size registers, components.py)."""
    from . import portable as P

    pow_term = _shl(f"{HLL_WBITS + 1} - m", dialect)
    raw_est = P.int_div(
        f"CAST({HLL_ALPHA_NUM * HLL_M * HLL_M} AS BIGINT)"
        f" * {1 << (HLL_WBITS + 1)}",
        f"({HLL_ALPHA_DEN} * s)",
        dialect,
    )
    # Spark: registers are <= |groups| x 64 rows and the grid exactly
    # |groups| x 64 — tiny, but derived through aggregates the planner
    # cannot size, so it falls back to SortMergeJoin. Broadcast the
    # register (right/build) side — the only legal build side of a
    # LeftOuter BHJ. DuckDB has no hint syntax and needs none. Hints
    # never change results.
    br = "/*+ BROADCAST(r) */ " if dialect == "spark" else ""
    return f"""{prefix}grid AS (
  SELECT g.grp, b.bucket FROM (SELECT DISTINCT grp FROM {regs}) g
  CROSS JOIN hll_buckets b
),
{prefix}dense AS (
  SELECT {br}gr.grp, gr.bucket, COALESCE(r.m, 0) AS m
  FROM {prefix}grid gr LEFT JOIN {regs} r
    ON r.grp = gr.grp AND r.bucket = gr.bucket
),
{prefix}stats AS (
  SELECT grp,
         CAST(SUM(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS BIGINT) AS filled,
         CAST(SUM(m) AS BIGINT) AS reg_sum,
         CAST(SUM(m * (bucket + 1)) AS BIGINT) AS reg_check,
         CAST(SUM({pow_term}) AS BIGINT) AS s
  FROM {prefix}dense GROUP BY grp
),
{prefix}est AS (
  SELECT st.grp, st.filled, st.reg_sum, st.reg_check,
         CAST(CASE WHEN st.filled < {HLL_M}
                    AND {raw_est} <= {5 * HLL_M // 2}
                   THEN l.est ELSE {raw_est}
              END AS BIGINT) AS est_distinct
  FROM {prefix}stats st LEFT JOIN hll_lc l ON l.v = {HLL_M} - st.filled
)"""


def hll_sql(dialect: str, orders: str = "orders") -> str:
    """HyperLogLog distinct-count registers per order-YEAR, merged by
    register-max into the full-period sketch — the mergeability
    property that makes HLL *the* production distinct counter (daily
    sketches roll up to monthly actives without re-reading a row;
    Flajolet, Fusy, Gandouet, Meunier 2007).

    Build: every o_custkey is hashed once with the shared portable hash
    uniformized by :func:`_mix` (same reason as KMV: raw polynomial
    hashes of short keys are numerically small and would starve the
    high-rho registers). bucket = h mod 64; the remaining 25 hash bits
    give rho = 26 − (floor(log2(w)) + 1) (w = 0 ⇒ 26), i.e. the
    position of the leftmost 1-bit. Registers are MAX(rho) per
    (year, bucket) — a map-side-combinable aggregate whose state is
    exactly 64 BIGINTs per group no matter the corpus size. The merged
    'ALL' sketch is MAX over the per-year registers per bucket —
    identical to having sketched the union, which is the whole point.

    Estimate, all-integer and engine-portable: with S =
    Σ_j 2^(26−M_j) over a DENSE 64-bucket grid (empty buckets count
    2^26), raw = α·m²·2^26 / S computed as
    (709·4096·2^26) div (1000·S) — numerator ≈ 1.95e14, no overflow.
    Small-range correction (linear counting, E = m·ln(m/V) for V > 0
    empty buckets when raw ≤ 5m/2) uses a 64-row VALUES table of
    round(64·ln(64/V)) frozen at SQL-build time in Python — both
    engines read the same integer constants, so the branch is exact
    cross-engine (same trick as the q200 per-type ln freeze, moved to
    build time because the domain is the fixed [1,64]).

    Gate output: one row per year + the merged row — register facts
    (filled, Σ registers, a position-weighted register checksum), the
    integer estimate, and the exact audit count. The pytest asserts
    the estimate lands within the 3σ band of exact; the driver hashes
    everything including the registers, so the sketch itself (not just
    the estimate) is verified bit-identical across engines.

    Shape at 100 TB: registers are O(m) per group through every
    partial aggregate; the exact audit side is gate-scale only (it is
    what the sketch replaces). No joins bigger than 64·groups rows.
    """
    from . import portable as P

    s = "STRING" if dialect == "spark" else "VARCHAR"
    hv = _mix(P.rolling_hash(f"CAST(o_custkey AS {s})", dialect))
    w_of_h = P.int_div("hv", str(HLL_M), dialect)
    return f"""
WITH src AS (
  SELECT substr(CAST(o_orderdate AS {s}), 1, 4) AS grp, o_custkey
  FROM {orders}
),
h AS (SELECT grp, {hv} AS hv FROM src),
hb AS (
  SELECT grp, hv % {HLL_M} AS bucket, {w_of_h} AS w FROM h
),
rho AS (
  SELECT grp, bucket, {hll_rho_expr()} AS r
  FROM hb
),
reg AS (SELECT grp, bucket, MAX(r) AS m FROM rho GROUP BY grp, bucket),
regall AS (
  SELECT 'ALL' AS grp, bucket, MAX(m) AS m FROM reg GROUP BY bucket
),
regs AS (SELECT * FROM reg UNION ALL SELECT * FROM regall),
{hll_const_ctes()},
{hll_est_ctes(dialect, "regs", "h_")},
exact AS (
  SELECT grp, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
  FROM src GROUP BY grp
  UNION ALL
  SELECT 'ALL', CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM src
)
SELECT e.grp, e.filled, e.reg_sum, e.reg_check, e.est_distinct,
       x.exact_distinct
FROM h_est e JOIN exact x ON x.grp = e.grp
ORDER BY e.grp
"""


def theta_anotb_sql(
    dialect: str, orders: str = "orders", customer: str = "customer"
) -> str:
    """Theta-sketch A-not-B: set-DIFFERENCE cardinalities estimated
    from the same bottom-k sample as :func:`kmv_sql` (the DataSketches
    ``AnotB`` operation — the third member of the set-expression
    algebra next to union and intersection, and the one that answers
    "how many keys are in the change stream but not the dimension"
    without materializing either set).

    A = distinct ``o_custkey`` of every third order, B = the full
    customer key set (so A∖B is near-empty and B∖A is the interesting
    side — both estimates are gated against exact). Method: keep the
    ``KMV_K`` smallest distinct hashes of A ∪ B with per-set membership
    flags; the k-sample is a uniform sample of the union, so
    |A∖B| ≈ (#a_only in sample)·(k−1)·P div (k·τ) — the same
    all-integer estimator as the intersection, applied to the
    exclusive-membership counts. One statement, same bounded top-k
    physical shape as q174; O(k) state end to end."""
    from . import portable as P

    s = "STRING" if dialect == "spark" else "VARCHAR"
    ha = _mix(P.rolling_hash(f"CAST(o_custkey AS {s})", dialect))
    hb = _mix(P.rolling_hash(f"CAST(c_custkey AS {s})", dialect))

    def est(cnt: str) -> str:
        return P.int_div(
            f"{cnt} * ({KMV_K} - 1) * CAST({P.HASH_P} AS BIGINT)",
            f"({KMV_K} * tau)",
            dialect,
        )

    return f"""
WITH a AS (
  SELECT DISTINCT {ha} AS hv FROM {orders} WHERE o_orderkey % 3 = 0
),
b AS (SELECT DISTINCT {hb} AS hv FROM {customer}),
u AS (
  SELECT hv, MAX(in_a) AS in_a, MAX(in_b) AS in_b
  FROM (
    SELECT hv, 1 AS in_a, 0 AS in_b FROM a
    UNION ALL
    SELECT hv, 0 AS in_a, 1 AS in_b FROM b
  ) both_sets
  GROUP BY hv
),
kmin AS (SELECT * FROM u ORDER BY hv LIMIT {KMV_K}),
stats AS (
  SELECT CAST(SUM(in_a * (1 - in_b)) AS BIGINT) AS a_only,
         CAST(SUM(in_b * (1 - in_a)) AS BIGINT) AS b_only,
         CAST(MAX(hv) AS BIGINT) AS tau
  FROM kmin
),
exact AS (
  SELECT CAST(SUM(in_a * (1 - in_b)) AS BIGINT) AS exact_a_not_b,
         CAST(SUM(in_b * (1 - in_a)) AS BIGINT) AS exact_b_not_a
  FROM u
)
SELECT s.a_only, s.b_only, s.tau,
       CAST({est('s.a_only')} AS BIGINT) AS est_a_not_b,
       CAST({est('s.b_only')} AS BIGINT) AS est_b_not_a,
       e.exact_a_not_b, e.exact_b_not_a
FROM stats s CROSS JOIN exact e
"""
