"""Feature-engineering operators — the tabular-ML prep stages of a
training-data pipeline (WOE/IV scoring, leakage-free target encoding,
chi-square feature selection), each expressed as pure relational algebra
with the repo's cross-engine determinism rules:

- every ln() is evaluated once per GROUP (bin / category / token) and
  frozen into DECIMAL before any summation;
- sums of float-valued terms go through DECIMAL casts so accumulation
  order cannot change the result;
- counts stay BIGINT; wide products go through DECIMAL(38,x) so both
  engines overflow loudly (or not at all) rather than wrap.

All three are one-or-two-scan plans with map-side-combinable aggregates
and bounded-size model relations — the shapes survive 100 TB because
the per-row work is a projection and every join key is a group key.
"""

from __future__ import annotations


def woe_iv_sql(dialect: str, orders: str = "orders") -> str:
    """Weight-of-Evidence + Information Value per categorical bin — the
    classic credit-scoring feature-screening statistic (Siddiqi,
    "Credit Risk Scorecards"): for event = order fulfilled
    (o_orderstatus = 'F') and feature = o_orderpriority,
    WOE_bin = ln((good_bin/good_tot)/(bad_bin/bad_tot)) and
    IV = Σ_bins (good% − bad%)·WOE.

    Smoothing: +0.5 per cell (Haldane–Anscombe) so empty cells cannot
    produce ±inf. Determinism: one ln per BIN frozen to DECIMAL(18,12);
    the IV terms multiply two exact decimals (percent diff in
    DECIMAL(18,12) via integer-scaled division) and sum as decimals —
    bin order cannot change IV. Plan: one scan → one (bin) aggregate →
    scalar totals broadcast back. Output one row per bin with its WOE
    and the feature-level IV repeated (window-free: IV joins back from
    a 1-row aggregate)."""
    return f"""
WITH cells AS (
  SELECT o_orderpriority AS bin,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_good,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END)
              AS BIGINT) AS n_bad
  FROM {orders} GROUP BY o_orderpriority
),
tot AS (
  SELECT CAST(SUM(n_good) AS BIGINT) AS gt,
         CAST(SUM(n_bad) AS BIGINT) AS bt,
         CAST(COUNT(*) AS BIGINT) AS nbins
  FROM cells
),
woe AS (
  -- smoothed shares; the single ln per bin frozen into DECIMAL
  SELECT c.bin, c.n_good, c.n_bad,
         CAST((CAST(c.n_good AS DOUBLE) + 0.5)
              / (CAST(t.gt AS DOUBLE) + 0.5 * t.nbins)
              AS DECIMAL(18,12)) AS gshare,
         CAST((CAST(c.n_bad AS DOUBLE) + 0.5)
              / (CAST(t.bt AS DOUBLE) + 0.5 * t.nbins)
              AS DECIMAL(18,12)) AS bshare,
         CAST(ln(((CAST(c.n_good AS DOUBLE) + 0.5)
                  / (CAST(t.gt AS DOUBLE) + 0.5 * t.nbins))
                 / ((CAST(c.n_bad AS DOUBLE) + 0.5)
                    / (CAST(t.bt AS DOUBLE) + 0.5 * t.nbins)))
              AS DECIMAL(18,12)) AS woe
  FROM cells c CROSS JOIN tot t
),
iv AS (
  -- (gshare − bshare)·woe: DECIMAL(19,12) × DECIMAL(18,12) would
  -- overflow precision 38, so both factors round to DECIMAL(15,9)
  -- first (exact representable grid, same on both engines), making
  -- the product DECIMAL(31,18) — exact, then an exact decimal SUM
  SELECT CAST(SUM(CAST(gshare - bshare AS DECIMAL(15,9))
                  * CAST(woe AS DECIMAL(15,9))) AS DECIMAL(38,18)) AS iv
  FROM woe
)
SELECT w.bin, w.n_good, w.n_bad,
       CAST(w.woe AS DOUBLE) AS woe,
       CAST(i.iv AS DOUBLE) AS feature_iv
FROM woe w CROSS JOIN iv i
ORDER BY w.bin"""


def target_encoding_sql(dialect: str, orders: str = "orders") -> str:
    """Leakage-free leave-one-out target encoding: each row's category
    is encoded by the mean target of ALL OTHER rows in the category —
    enc = (Σ_cat target − target_row) / (n_cat − 1) — the encoding that
    never leaks a row's own label into its own feature (Micci-Barreca,
    SIGKDD Expl. 2001). Singleton categories fall back to the global
    leave-one-out mean.

    Determinism: target sums are exact DECIMAL(18,4) (the repo's float
    sum rule); the one division per row happens in DOUBLE on exact
    decimal operands; rounded to 6dp for the gate. Plan: one (category)
    aggregate + one broadcast join back — the encoding table is
    |categories| rows, and the join-back carries an explicit BROADCAST
    hint (comment to DuckDB): the category key has single-digit
    cardinality, so a CBO shuffle join would be a 5-key skew shuffle
    of the full fact side (probed 4.0x at 10x data before the hint)."""
    return f"""
WITH base AS (
  SELECT o_orderkey, o_orderpriority AS cat,
         CAST(o_totalprice AS DECIMAL(18,4)) AS t
  FROM {orders}
),
cat_stats AS (
  SELECT cat, CAST(SUM(t) AS DECIMAL(38,4)) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM base GROUP BY cat
),
gstats AS (
  SELECT CAST(SUM(s) AS DECIMAL(38,4)) AS gs,
         CAST(SUM(n) AS BIGINT) AS gn
  FROM cat_stats
)
SELECT /*+ BROADCAST(c) */
       b.o_orderkey, b.cat,
       round(CASE WHEN c.n > 1
             THEN CAST(c.s - b.t AS DOUBLE) / CAST(c.n - 1 AS DOUBLE)
             ELSE CAST(g.gs - b.t AS DOUBLE) / CAST(g.gn - 1 AS DOUBLE)
             END, 6) AS loo_enc
FROM base b
JOIN cat_stats c ON b.cat = c.cat
CROSS JOIN gstats g
ORDER BY b.o_orderkey"""


def chi2_tokens_sql(
    dialect: str,
    table: str = "documents",
    th_table: str | None = None,
    top: int = 20,
) -> str:
    """Chi-square feature selection per (token, language) — rank each
    language's most-discriminative tokens (the feature-selection stage
    ahead of a classifier like q209's NB; Yang & Pedersen ICML'97 found
    χ² among the strongest selectors). For token t and lang L with the
    2×2 doc-presence table a,b,c,d:
    χ² ∝ N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)).

    Determinism contract: counts are BIGINT; (ad − bc)² and the margin
    product run in DECIMAL(38,0) — exact, loud on overflow in both
    engines, never a float. The final ratio is the ONE place a double
    appears, and it is pinned explicitly: floor(double(num)/double(den))
    — both engines perform the identical round-to-nearest decimal→
    double casts and one IEEE division, so the floored ppm statistic is
    bit-identical (engine-native decimal integer division is NOT used:
    Spark's ``div`` truncates the exact quotient while DuckDB's ``//``
    floors a double quotient — off by one on ~half the rows).
    Top-``top`` per language by (χ², token hash) — fully deterministic.

    Plan: doc-presence pairs (DISTINCT (doc, h)) ⋈ doc langs → one
    (lang, h) aggregate; margins are per-lang and per-token aggregates
    joined back on their group keys; the per-lang top-k is a bounded
    window (vocab per lang), rank pushed down by WindowGroupLimit.

    Exact-arithmetic envelope, stated honestly: N·(ad−bc)²·10⁶ must fit
    DECIMAL(38,0), which bounds the corpus at N ≈ 2.5·10⁶ docs for the
    worst-case token. Both engines run ANSI decimal arithmetic here, so
    exceeding the envelope ERRORS identically (never silently wraps);
    past it, shard the statistic per language/source (each shard has
    its own N) or drop the ppm grid for a banded DOUBLE gate.

    Dialect split (r8, guide §2.4): Spark INLINES deterministic CTEs,
    so referencing ``pres`` twice (``a_tab`` + ``tcnt``) re-ran the
    DISTINCT-presence aggregate over the whole token stream. Languages
    PARTITION docs, so nt(h) = Σ_lang a(lang, h) exactly — the Spark
    text derives nt with one integer window over the (lang×vocab)-sized
    ``a_tab`` instead of a second token-stream pass + join. DuckDB
    keeps the two-aggregate form (it materializes CTEs, so ``pres`` is
    computed once there either way)."""
    div = ("floor(CAST(CAST(n AS DECIMAL(38,0)) * delta2 * 1000000 "
           "AS DOUBLE) / CAST(margins AS DOUBLE))")
    if dialect == "spark":
        chi_src = f"""
a_tab AS (
  SELECT d.lang, p.h, CAST(COUNT(*) AS BIGINT) AS a
  FROM pres p JOIN docs d ON p.doc_id = d.doc_id
  GROUP BY d.lang, p.h
),
awin AS (
  SELECT lang, h, a,
         CAST(SUM(a) OVER (PARTITION BY h) AS BIGINT) AS nt
  FROM a_tab
),
chi AS (
  SELECT t.lang, t.h,
         {_chi2_delta2(dialect, nt="t.nt")} AS delta2,
         CAST(t.nt AS DECIMAL(38,0))
           * CAST(lc.nl AS DECIMAL(38,0))
           * CAST(nn.n - t.nt AS DECIMAL(38,0))
           * CAST(nn.n - lc.nl AS DECIMAL(38,0)) AS margins,
         nn.n
  FROM awin t
  JOIN lcnt lc ON t.lang = lc.lang
  CROSS JOIN nn
  WHERE t.nt < nn.n AND lc.nl < nn.n
),"""
    else:
        chi_src = f"""
tcnt AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS nt FROM pres GROUP BY h),
a_tab AS (
  SELECT d.lang, p.h, CAST(COUNT(*) AS BIGINT) AS a
  FROM pres p JOIN docs d ON p.doc_id = d.doc_id
  GROUP BY d.lang, p.h
),
chi AS (
  SELECT t.lang, t.h,
         {_chi2_delta2(dialect)} AS delta2,
         CAST(tc.nt AS DECIMAL(38,0))
           * CAST(lc.nl AS DECIMAL(38,0))
           * CAST(nn.n - tc.nt AS DECIMAL(38,0))
           * CAST(nn.n - lc.nl AS DECIMAL(38,0)) AS margins,
         nn.n
  FROM a_tab t
  JOIN lcnt lc ON t.lang = lc.lang
  JOIN tcnt tc ON t.h = tc.h
  CROSS JOIN nn
  WHERE tc.nt < nn.n AND lc.nl < nn.n
),"""
    return f"""
WITH {_th(dialect, table, th_table)},
docs AS (SELECT doc_id, lang FROM {table}),
pres AS (SELECT DISTINCT doc_id, h FROM th),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM docs),
lcnt AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nl FROM docs
         GROUP BY lang),{chi_src}
scored AS (
  SELECT lang, h, CAST({div} AS DECIMAL(38,0)) AS chi2_ppm
  FROM chi WHERE margins > 0
),
ranked AS (
  SELECT lang, h, chi2_ppm, row_number() OVER (
    PARTITION BY lang ORDER BY chi2_ppm DESC, h) AS rn
  FROM scored
)
SELECT lang, CAST(h AS BIGINT) AS token_hash,
       CAST(chi2_ppm AS BIGINT) AS chi2_ppm, CAST(rn AS BIGINT) AS rank
FROM ranked WHERE rn <= {top}
ORDER BY lang, rank"""


def _th(dialect: str, table: str, th_table: str | None) -> str:
    from .dedup import th_cte

    return th_cte(dialect, table, th_table)


def _chi2_delta2(dialect: str, nt: str = "tc.nt") -> str:
    """(ad − bc)² in exact DECIMAL(38,0); a,b,c,d derived from the
    presence count and the margins: b = nt−a, c = nl−a,
    d = n−nt−nl+a, so ad − bc = n·a − nt·nl. ``nt`` names the
    token-presence margin column (join column on DuckDB, window column
    on Spark — same integer either way)."""
    diff = ("CAST(nn.n AS DECIMAL(38,0)) * CAST(t.a AS DECIMAL(38,0)) "
            f"- CAST({nt} AS DECIMAL(38,0)) * CAST(lc.nl AS DECIMAL(38,0))")
    return f"(({diff}) * ({diff}))"


def feature_snapshot_sql(dialect: str, orders: str = "orders") -> str:
    """Multi-horizon trailing feature snapshot — the feature-store
    materialization pattern: per customer, order counts and exact spend
    over the trailing 30/90/365 days as of the corpus watermark
    (max order date), ALL horizons from ONE scan via conditional
    aggregates (never one window per horizon; a feature store with 50
    horizons still costs one pass). The watermark is a 1-row scalar
    cross join; sums are exact DECIMAL (the repo's float-sum rule);
    INTERVAL arithmetic is shared text on both engines."""
    horizons = (30, 90, 365)
    cols = []
    for h in horizons:
        win = f"o_orderdate >= mx.asof - INTERVAL '{h}' DAY"
        cols.append(
            f"CAST(SUM(CASE WHEN {win} THEN 1 ELSE 0 END) AS BIGINT) "
            f"AS n_orders_{h}d"
        )
        cols.append(
            f"CAST(SUM(CASE WHEN {win} "
            f"THEN CAST(o_totalprice AS DECIMAL(18,4)) "
            f"ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS spend_{h}d"
        )
    sel = ",\n       ".join(cols)
    return f"""
WITH mx AS (SELECT MAX(o_orderdate) AS asof FROM {orders})
SELECT o_custkey,
       {sel}
FROM {orders} CROSS JOIN mx
GROUP BY o_custkey
ORDER BY o_custkey"""


def ks_drift(df, value_col: str, flag_col: str):
    """Exact two-sample Kolmogorov–Smirnov statistic between the rows
    where ``flag_col`` is true (sample A) and false (sample B) — the
    distribution-drift test that, unlike PSI (q205), needs no binning
    choice and, unlike chi² (q213), works on continuous values:
    D = max_x |F_A(x) − F_B(x)|.

    Exact integer arithmetic end to end: per distinct value, (ca, cb)
    counts from one hash aggregate; running counts via the two-pass
    range-bucketed prefix sum (operators/rank.global_running_sum — a
    single-partition ORDER BY window never forms); the sup statistic as
    the cross-multiplied max |ra·nB − rb·nA| so no division touches the
    compare, with d_ppm = floor(d_num·10^6 / (nA·nB)) derived last.
    Products are BIGINT here (|values| ≤ ~10^9 per side before they'd
    need the DECIMAL(38) upgrade the module docstring prescribes — at
    100 TB per-side counts approach that, so promote then).

    Plan shape at scale: one map-side-combinable aggregate over the
    values, then the two-pass prefix sum (percentile sketch + O(buckets)
    collected offsets + per-bucket window), then a global max — every
    shuffle is on the value hash or range, never a global sort.

    Returns one row: (n_a, n_b, d_num, d_ppm).
    """
    from pyspark.sql import functions as F

    from ..operators.rank import global_running_sums

    per = df.groupBy(value_col).agg(
        F.sum(F.when(F.col(flag_col), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col(flag_col), 0).otherwise(1)).alias("cb"),
    )
    # both ECDFs from ONE two-pass traversal (shared sketch, shared
    # per-bucket aggregate, shared window)
    r = global_running_sums(per, value_col, ["ca", "cb"], ["ra", "rb"])
    return _ks_finalize(r)


def _ks_finalize(r):
    from pyspark.sql import functions as F

    tot = r.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    )
    # 1-row scalar cross join (the repo's totals pattern)
    j = r.crossJoin(F.broadcast(tot))
    return (
        j.agg(
            F.max(
                F.abs(F.col("ra") * F.col("n_b") - F.col("rb") * F.col("n_a"))
            ).cast("long").alias("d_num"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
        .select(
            "n_a",
            "n_b",
            "d_num",
            F.floor(
                F.col("d_num") * F.lit(1_000_000)
                / (F.col("n_a") * F.col("n_b"))
            ).cast("long").alias("d_ppm"),
        )
    )


def ks_drift_oracle_sql(
    src: str, value_col: str, flag_expr: str
) -> str:
    """DuckDB oracle for :func:`ks_drift`: identical integer arithmetic,
    running counts as one window (fine at oracle scale)."""
    return f"""
WITH s AS (SELECT {value_col} AS v, ({flag_expr}) AS fa FROM {src}),
per AS (
  SELECT v,
         SUM(CASE WHEN fa THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN fa THEN 0 ELSE 1 END) AS cb
  FROM s GROUP BY v
),
r AS (
  SELECT v, ca, cb,
         SUM(ca) OVER (ORDER BY v) AS ra,
         SUM(cb) OVER (ORDER BY v) AS rb
  FROM per
),
t AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
             CAST(SUM(cb) AS BIGINT) AS n_b FROM per)
SELECT t.n_a, t.n_b,
       CAST(MAX(ABS(r.ra * t.n_b - r.rb * t.n_a)) AS BIGINT) AS d_num,
       CAST(floor(CAST(MAX(ABS(r.ra * t.n_b - r.rb * t.n_a)) AS BIGINT)
            * 1000000 / (t.n_a * t.n_b)) AS BIGINT) AS d_ppm
FROM r CROSS JOIN t
GROUP BY t.n_a, t.n_b"""


def benford_audit_sql(dialect: str, orders: str = "orders") -> str:
    """Benford first-digit audit (q245, Newcomb–Benford law): the
    data-forensics screen for fabricated or unit-mangled numeric
    columns — natural multi-magnitude amounts follow
    P(d) = log10(1 + 1/d); a flat or spiked digit histogram flags
    synthetic injection, currency-unit mixups, or truncation bugs
    upstream. Run per snapshot next to the PSI/KS drift gates.

    Exactness: the first significant digit comes from the CENT-integer
    rendered as a string (never floor(log10(x)) per row — a libm call
    whose boundary ULPs could flip a digit); expected shares are ONE
    ln per digit (9 total), frozen to DECIMAL(18,12) before the ppm
    floor. One map-side-combinable aggregate; the digit histogram is
    9 rows on any corpus."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
WITH cents AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
  FROM {orders} WHERE o_totalprice > 0
),
digits AS (
  SELECT CAST(substr(CAST(c AS {s}), 1, 1) AS BIGINT) AS d FROM cents
),
hist AS (SELECT d, COUNT(*) AS n FROM digits GROUP BY d),
tot AS (SELECT SUM(n) AS nt FROM hist)
SELECT h.d AS digit,
       CAST(h.n AS BIGINT) AS n_obs,
       CAST(floor(h.n * 1000000 / t.nt) AS BIGINT) AS obs_ppm,
       CAST(floor(CAST(ln(1.0 + 1.0 / h.d) / ln(10.0)
                       AS DECIMAL(18,12)) * 1000000) AS BIGINT)
         AS benford_ppm
FROM hist h CROSS JOIN tot t
ORDER BY digit"""


def snapshot_drift_sql(dialect: str, orders: str = "orders") -> str:
    """Data-contract drift audit between two snapshots (q247): the
    schema-governance gate a lakehouse runs before PUBLISHING a new
    snapshot — per-column profile deltas (row count, null rate,
    distinct cardinality, mean value) between the previous snapshot and
    the candidate, each with a drift magnitude in ppm of the baseline.
    Complements the distribution-shape gates (PSI q213-family, KS q232,
    Benford q245): those detect value-distribution shift inside a
    column, this one detects CONTRACT shift — a column going sparse, a
    categorical domain collapsing, a volume cliff — the failure classes
    write-audit-publish (q239) wants vetoed before the metadata flip.

    Snapshots here are the natural time split of the fixture (orders
    before/after 1996-01-01); in the engine the two sides would be
    ``read(version=prev)`` vs ``read_staged(...)`` over the same
    manifest overlay WAP audits.

    Exactness: every profile stat is an integer (counts, cent-sums,
    exact COUNT(DISTINCT)); drift_ppm is the pinned
    floor(1e6·|late−early| / early) pattern, NULL when the baseline is
    zero (no drift direction to report). One scan per side, six
    map-side-combinable aggregates, six output rows on any corpus —
    the 100 TB cost is the two scans WAP already pays."""
    return f"""
WITH e AS (
  SELECT COUNT(*) AS n_rows,
         SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS null_tp,
         COUNT(DISTINCT o_custkey) AS d_cust,
         COUNT(DISTINCT o_orderstatus) AS d_status,
         COUNT(DISTINCT o_orderpriority) AS d_prio,
         SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
  FROM {orders} WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
),
l AS (
  SELECT COUNT(*) AS n_rows,
         SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS null_tp,
         COUNT(DISTINCT o_custkey) AS d_cust,
         COUNT(DISTINCT o_orderstatus) AS d_status,
         COUNT(DISTINCT o_orderpriority) AS d_prio,
         SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
  FROM {orders} WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
),
m AS (
  SELECT 'n_rows' AS metric, e.n_rows AS early_v, l.n_rows AS late_v
  FROM e CROSS JOIN l
  UNION ALL
  SELECT 'null_ppm_totalprice',
         CAST(floor(e.null_tp * 1000000 / e.n_rows) AS BIGINT),
         CAST(floor(l.null_tp * 1000000 / l.n_rows) AS BIGINT)
  FROM e CROSS JOIN l
  UNION ALL
  SELECT 'distinct_custkey', e.d_cust, l.d_cust FROM e CROSS JOIN l
  UNION ALL
  SELECT 'distinct_orderstatus', e.d_status, l.d_status
  FROM e CROSS JOIN l
  UNION ALL
  SELECT 'distinct_orderpriority', e.d_prio, l.d_prio
  FROM e CROSS JOIN l
  UNION ALL
  SELECT 'mean_cents',
         CAST(floor(e.cents / e.n_rows) AS BIGINT),
         CAST(floor(l.cents / l.n_rows) AS BIGINT)
  FROM e CROSS JOIN l
)
SELECT metric,
       CAST(early_v AS BIGINT) AS early_v,
       CAST(late_v AS BIGINT) AS late_v,
       CASE WHEN early_v > 0 THEN CAST(floor(
              abs(late_v - early_v) * 1000000 / early_v) AS BIGINT)
            ELSE CAST(NULL AS BIGINT) END AS drift_ppm
FROM m
ORDER BY metric"""


BOOT_B = 32
# Poisson(1) inverse-CDF thresholds over [0, HASH_P): floor(CDF(k)·P)
# for k = 0..5; a draw past the last threshold clips to 6 (P ≈ 1e-4 —
# the clip biases the weight mean by < 1e-4, far inside the band).
_POIS_T = (790015083, 1580030167, 1975037709,
           2106706890, 2139624185, 2146207644)


def bootstrap_ci_sql(dialect: str, orders: str = "orders",
                     b: int = BOOT_B) -> str:
    """Poisson-bootstrap confidence band for a grouped metric (mean
    order value in cents per order status) — the eval primitive behind
    "is model/cohort A actually better than B" calls (Efron 1979;
    Poisson-ized per Chamandy et al., "Estimating Uncertainty for
    Massive Data Streams", the form used at terabyte scale precisely
    because it needs NO resampled rows).

    Each replicate r gives every row a Poisson(1) weight drawn
    deterministically from the portable row hash under a per-replicate
    affine rehash (distinct multipliers — an additive-only shift
    leaves the draws correlated and collapses the band), via the
    inverse-CDF ladder over the integer thresholds above. Replicates
    materialize as a LATERAL row explosion (B rows per input row, ONE
    weight ladder) rather than 2·B wide conditional aggregates: the
    wide-aggregate single-pass form is beautiful on paper but its
    ~130-expression HashAggregate falls out of whole-stage codegen
    into interpreted eval (measured 13 s vs ~1 s at sf0.1); the
    exploded form costs a B× row pass that stays fully code-generated
    and map-side-combines to |groups|·B rows. The band is rank-based:
    [2nd smallest, 2nd largest] of B = 32 replicate means — the
    central 15/16 replicate band, reported as such rather than dressed
    up as an asymptotic CI. All arithmetic is integer (floor-div
    means): bit-identical across engines.

    The h relation is referenced twice (draws + totals); its per-row
    work is two affine maps, so re-derivation under Spark's CTE
    inlining is immaterial (DuckDB pins it anyway)."""
    from . import portable as P

    # Two-round multiplicative-congruential row hash on the integer
    # key: each round is a bijective affine map mod P, so the draws are
    # equidistributed (quasi-Monte-Carlo flavor — if anything, lower
    # variance than iid) while staying pure int64 codegen arithmetic.
    # The per-character string fold used elsewhere for TEXT keys cost
    # ~3 s here (interpreted higher-order fold) for no statistical
    # gain on a numeric key. (key%P)·A < 2^62: overflow-safe.
    h0 = (f"((((o_orderkey % {P.HASH_P}) * 1103515245 + 12345) "
          f"% {P.HASH_P}) * 784588716 % {P.HASH_P})")
    cents = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
    m = "MATERIALIZED " if dialect == "duckdb" else ""
    h_cte = f"""h AS {m}(
  SELECT o_orderstatus AS grp, {cents} AS cents, {h0} AS h0
  FROM {orders}
)"""
    # replicate constants as a 32-row broadcast relation: inlining them
    # as array literals indexed per row compiled into a huge generated
    # method (first-call Janino compile alone ~10 s); the tiny VALUES
    # relation keeps the per-row expression small and codegen-fast.
    # The h x consts join is a deliberate 32-row fan-out: broadcast
    # nested-loop, never a CartesianProduct.
    vals = ", ".join(
        f"({r}, {pow(1000003, r + 1, P.HASH_P)}, "
        f"{(999983 * r + 12345) % P.HASH_P})"
        for r in range(b))
    consts = (f"consts AS (SELECT * FROM (VALUES {vals}) "
              "AS t(r, ar, br))")
    bcast = "/*+ BROADCAST(c) */ " if dialect == "spark" else ""
    hb = f"((h0 * c.ar + c.br) % {P.HASH_P})"
    ladder = " ".join(
        f"WHEN hb < {t} THEN {k}" for k, t in enumerate(_POIS_T))
    mr = "MATERIALIZED " if dialect == "duckdb" else ""
    mean_r = P.int_div("SUM(w * cents)", "GREATEST(SUM(w), 1)", dialect)
    mean_all = P.int_div("t.sum_all", "t.n_all", dialect)
    return f"""
WITH {h_cte},
{consts},
drawn AS {mr}(
  SELECT grp, cents, r,
         (CASE {ladder} ELSE 6 END) AS w
  FROM (SELECT {bcast}grp, cents, c.r AS r, {hb} AS hb
        FROM h CROSS JOIN consts c) x
),
means AS {mr}(
  SELECT grp, r, {mean_r} AS m
  FROM drawn GROUP BY grp, r
),
ranked AS (
  SELECT grp, m,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY m, r) AS rk
  FROM means
),
tot AS (SELECT grp, SUM(cents) AS sum_all, COUNT(*) AS n_all
        FROM h GROUP BY grp)
SELECT t.grp AS o_orderstatus,
       CAST(t.n_all AS BIGINT) AS n_orders,
       CAST({mean_all} AS BIGINT) AS mean_cents,
       CAST(MAX(CASE WHEN rk.rk = 2 THEN rk.m END) AS BIGINT)
         AS boot_lo_cents,
       CAST(MAX(CASE WHEN rk.rk = {b - 1} THEN rk.m END) AS BIGINT)
         AS boot_hi_cents
FROM tot t JOIN ranked rk ON rk.grp = t.grp
GROUP BY t.grp, t.n_all, t.sum_all
ORDER BY o_orderstatus"""
