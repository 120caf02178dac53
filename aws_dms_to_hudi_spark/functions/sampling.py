"""Deterministic dataset splitting / sampling for training pipelines.

A training-data pipeline needs stable train/val/test assignment: the
same document must land in the same split on every run, on any cluster
layout, without a stored assignment table. The standard trick is
hash-mod bucketing on the stable document key — pure per-row compute,
no shuffle, no state, reproducible across engines.

``split_expr`` emits the assignment as a portable SQL expression (same
bytes-in/bytes-out on Spark and DuckDB via the shared polynomial hash
in :mod:`.portable`), so the DuckDB oracle can verify the exact split.

At 100 TB this is the right shape: assignment is embarrassingly
parallel, fuses into the scan (whole-stage codegen), and downstream
filters like ``split = 'train'`` are ordinary pushed-down predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import portable as P

BUCKETS = 100
DEFAULT_FRACTIONS = (("train", 80), ("val", 10), ("test", 10))


def bucket_expr(key: str, dialect: str) -> str:
    """Stable bucket in [0, BUCKETS) from any key column (cast to string
    then polynomial-rolling-hashed — already non-negative)."""
    h = P.rolling_hash(f"CAST({key} AS STRING)" if dialect == "spark"
                       else f"CAST({key} AS VARCHAR)", dialect)
    return f"(({h}) % {BUCKETS})"


def split_expr(key: str, dialect: str,
               fractions=DEFAULT_FRACTIONS) -> str:
    """CASE expression assigning a split label by hash bucket."""
    total = sum(n for _, n in fractions)
    if total != BUCKETS:
        raise ValueError(f"fractions must sum to {BUCKETS}, got {total}")
    b = bucket_expr(key, dialect)
    parts, lo = [], 0
    for label, n in fractions[:-1]:
        lo += n
        parts.append(f"WHEN {b} < {lo} THEN '{label}'")
    return f"CASE {' '.join(parts)} ELSE '{fractions[-1][0]}' END"


def assign_split(df: DataFrame, key: str, fractions=DEFAULT_FRACTIONS) -> DataFrame:
    """Attach a deterministic ``split`` column keyed on ``key``."""
    return df.withColumn("split", F.expr(split_expr(key, "spark", fractions)))


def stratified_keep_expr(key: str, pct: int, dialect: str) -> str:
    """Deterministic per-row keep predicate for an approximately ``pct``%
    sample: hash-bucket membership, not RNG — the same rows are kept on
    every run, any cluster layout, both engines (``df.sample``/Bernoulli
    RNG can't promise that)."""
    if not 0 <= pct <= BUCKETS:
        raise ValueError(f"pct must be in [0, {BUCKETS}], got {pct}")
    return f"({bucket_expr(key, dialect)} < {pct})"


def stratified_sample(df: DataFrame, key: str, pct: int) -> DataFrame:
    """Keep ~pct% of rows, deterministically by key hash. Applied after a
    groupBy stratum upstream (or to the whole table), the per-stratum
    rate is identical because bucket membership is independent of the
    stratum column — the `sampleBy` analog without RNG."""
    return df.filter(F.expr(stratified_keep_expr(key, pct, "spark")))


def weighted_sample_sql(
    dialect: str, table: str = "documents", k: int = 20
) -> str:
    """Deterministic weight-biased top-``k`` per language: each doc gets
    priority ``hash(doc_id) · n_chars`` (uniform int × weight — a pure
    int64 priority, weight-monotone like Efraimidis-Spirakis u^(1/w)
    sampling but with no libm in the ordering, so the ranking is
    bit-identical across engines by construction). Same rows selected
    on every run, any cluster layout — the reproducibility contract of
    :func:`stratified_keep_expr`, with weights.

    At scale: one window per language partition; k is tiny, so this is
    a per-partition top-k heap (rank + filter), not a global sort."""
    key = ("CAST(doc_id AS STRING)" if dialect == "spark"
           else "CAST(doc_id AS VARCHAR)")
    h = P.rolling_hash(key, dialect)
    return f"""
WITH pri AS (
  SELECT lang, doc_id, n_chars, ({h}) * n_chars AS priority FROM {table}
),
ranked AS (
  SELECT lang, doc_id, priority,
         row_number() OVER (PARTITION BY lang
                            ORDER BY priority DESC, doc_id) AS rnk
  FROM pri
)
SELECT lang, CAST(rnk AS BIGINT) AS rnk, doc_id, priority
FROM ranked WHERE rnk <= {k}
ORDER BY lang, rnk
"""


# target mixture weights per language (relative parts, integers)
MIXTURE_WEIGHTS = (("de", 2), ("en", 4), ("es", 2), ("fr", 1), ("zh", 1))


def mixture_balance_sql(
    dialect: str,
    table: str = "documents",
    weights=MIXTURE_WEIGHTS,
) -> str:
    """Data-mixture balancing: draw the largest corpus that realizes the
    target language proportions exactly. The scarcest language relative
    to its weight sets the scale — ``scale = MIN(available_l / w_l)``
    (integer division, so the realized mixture is exact) — then each
    language keeps its top ``w_l · scale`` docs by the same
    hash-priority order as :func:`weighted_sample_sql` (deterministic on
    any cluster layout, no RNG).

    Shape at 100 TB: per-language counts are one tiny aggregate; the
    keep-set is one window per language partition with an early rank
    cutoff (per-partition top-k heap). The scale scalar broadcasts.
    Languages absent from the weight table are dropped (weight 0).
    A *weighted* language with zero corpus rows forces scale = 0 (its
    per_weight is 0 via the weight-list left join below), so the output
    can never silently violate the exact-proportions contract — the
    gap surfaces as an all-zero keep-set with the starved language's
    n_avail = 0 row present."""
    cases = " ".join(
        f"WHEN lang = '{lang}' THEN {w}" for lang, w in weights
    )
    w_expr = f"CASE {cases} ELSE 0 END"
    wlist = ", ".join(f"('{lang}', {w})" for lang, w in weights)
    key = ("CAST(doc_id AS STRING)" if dialect == "spark"
           else "CAST(doc_id AS VARCHAR)")
    h = P.rolling_hash(key, dialect)
    div = P.int_div("COALESCE(c.n_avail, 0)", "wl.w", dialect)
    return f"""
WITH wtab AS (SELECT lang, doc_id, {w_expr} AS w, {h} AS hv FROM {table}),
wlist AS (SELECT * FROM (VALUES {wlist}) AS t(lang, w)),
cnt AS (
  SELECT lang, COUNT(*) AS n_avail FROM wtab WHERE w > 0 GROUP BY lang
),
avail AS (
  SELECT wl.lang, COALESCE(c.n_avail, 0) AS n_avail, {div} AS per_weight
  FROM wlist wl LEFT JOIN cnt c ON wl.lang = c.lang
),
scale AS (SELECT MIN(per_weight) AS s FROM avail),
ranked AS (
  SELECT lang, w, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY hv DESC, doc_id)
           AS rnk
  FROM wtab WHERE w > 0
),
kept AS (
  SELECT r.lang, r.doc_id
  FROM ranked r CROSS JOIN scale
  WHERE r.rnk <= r.w * scale.s
)
SELECT a.lang, CAST(a.n_avail AS BIGINT) AS n_avail,
       CAST(COUNT(k.doc_id) AS BIGINT) AS n_kept,
       CAST(MIN(k.doc_id) AS BIGINT) AS first_doc,
       CAST(SUM(k.doc_id) AS BIGINT) AS kept_id_sum
FROM avail a LEFT JOIN kept k ON a.lang = k.lang
GROUP BY a.lang, a.n_avail
ORDER BY a.lang
"""


# ---------------------------------------------------------------------------
# per-domain quota (web-corpus domain caps)
# ---------------------------------------------------------------------------

DOMAIN_CAP = 10
DOMAIN_SALT = 64


def domain_cap_sql(dialect: str, table: str = "documents",
                   domain: str = "source", key: str = "doc_id",
                   cap: int = DOMAIN_CAP) -> str:
    """Oracle form of the per-domain quota: keep at most ``cap`` docs
    per domain, chosen by the deterministic hash-priority order (same
    reproducibility contract as :func:`weighted_sample_sql` — no RNG,
    layout-independent). One window over the whole table — correct, but
    a hot domain serializes into a single partition, which is why the
    engine side uses the salted two-phase form below."""
    kcast = (f"CAST({key} AS STRING)" if dialect == "spark"
             else f"CAST({key} AS VARCHAR)")
    h = P.rolling_hash(kcast, dialect)
    return f"""
SELECT {domain} AS domain, doc_id
FROM (
  SELECT {domain}, {key} AS doc_id,
         row_number() OVER (PARTITION BY {domain}
                            ORDER BY ({h}), {key}) AS rn
  FROM {table}
) t WHERE rn <= {cap}
ORDER BY domain, doc_id
"""


def domain_cap(df: DataFrame, domain: str = "source", key: str = "doc_id",
               cap: int = DOMAIN_CAP, salt: int = DOMAIN_SALT) -> DataFrame:
    """Per-domain quota, salted two-phase — the CommonCrawl-style cap
    ("at most N pages per registrable domain") that keeps one hot
    domain from dominating a training mix.

    A single ``row_number() OVER (PARTITION BY domain)`` puts every row
    of a domain in one task: at 100 TB a 100M-page domain is a straggler.
    Instead: phase 1 ranks within ``(domain, hash(key) % salt)`` — each
    salted slice holds ~1/salt of the domain, spread across the cluster
    — and keeps ``cap`` per slice (a superset of the true winners,
    because the global top-``cap`` rows land in ≤ cap distinct slices…
    each contributing them to its local top-``cap``). Phase 2 re-ranks
    only the ≤ ``salt·cap`` survivors per domain. Result is *identical*
    to the single-window form (the oracle), never shuffles more than
    survivors into one task, and stays deterministic on any layout.
    """
    h = F.expr(P.rolling_hash(f"CAST({key} AS STRING)", "spark"))
    df = df.select(F.col(domain).alias("domain"),
                   F.col(key).alias("doc_id"), h.alias("_h"))
    w1 = Window.partitionBy("domain", F.pmod(F.col("_h"), F.lit(salt))) \
               .orderBy("_h", "doc_id")
    cand = (df.withColumn("_rn1", F.row_number().over(w1))
              .filter(F.col("_rn1") <= cap))
    w2 = Window.partitionBy("domain").orderBy("_h", "doc_id")
    return (cand.withColumn("_rn2", F.row_number().over(w2))
                .filter(F.col("_rn2") <= cap)
                .select("domain", "doc_id")
                .orderBy("domain", "doc_id"))


def split_leakage_sql(
    dialect: str, table: str = "documents", pairs: str | None = None
) -> str:
    """Cross-split contamination audit: near-duplicate pairs that span
    train/val/test assignments — the leakage a hash-split alone cannot
    prevent (near-dups hash independently), and the reason serious
    pipelines dedup BEFORE splitting or split by dup-group. Output:
    per split-pair counts; any row with split_lo <> split_hi is
    leakage a held-out metric would silently inherit.

    ``pairs`` is the verified near-dup pair relation (doc_a, doc_b,
    jaccard) — the Spark side passes the session-cached MinHash pairs
    artifact (the same relation q20/q77 consume), so the audit costs
    one projection + a tiny aggregate on top of work already done;
    the oracle inlines the full LSH chain. Split labels recompute from
    the same portable hash — no split table needs to be joined."""
    from .dedup import minhash_lsh_sql

    if pairs is None:
        pairs = "(" + minhash_lsh_sql(dialect, table=table) + ")"
    sa = split_expr("p.doc_a", dialect)
    sb = split_expr("p.doc_b", dialect)
    return f"""
WITH cls AS (
  SELECT {sa} AS split_a, {sb} AS split_b FROM {pairs} p
)
SELECT LEAST(split_a, split_b) AS split_lo,
       GREATEST(split_a, split_b) AS split_hi,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN split_a <> split_b THEN 1 ELSE 0 END) AS BIGINT)
         AS n_leaked
FROM cls
GROUP BY LEAST(split_a, split_b), GREATEST(split_a, split_b)
ORDER BY split_lo, split_hi"""


def triplet_mining_sql(
    dialect: str, table: str = "documents", pairs: str | None = None
) -> str:
    """Contrastive training-triplet construction: (anchor, positive,
    negative) rows where positives are verified near-dup pairs and the
    negative is a deterministic same-language pick — the in-batch
    "random" negative of contrastive/embedding training, made
    reproducible: negative = the doc at rank (anchor_rank + n/2) mod n
    in the anchor's language (maximally far in rank order, so never
    adjacent-by-id), dropped if it collides with either pair member.
    No RNG anywhere — the mined set is identical on any layout/engine.

    Plan shape: one rank window PER LANGUAGE (the q82 token-budget
    pattern — partition count = language count) + two broadcast-scale
    joins of the pair list against the rank relation. Negatives are
    rank lookups, not similarity searches — the standard cheap-negative
    scheme; hard-negative mining would swap the lookup for an ANN query
    (q23/q34) without changing this shape."""
    from .dedup import minhash_lsh_sql

    if pairs is None:
        pairs = "(" + minhash_lsh_sql(dialect, table=table) + ")"
    return f"""
WITH r AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM {table}
),
p AS (SELECT doc_a, doc_b FROM {pairs} pp),
neg AS (
  SELECT p.doc_a AS anchor, p.doc_b AS positive, ra.lang,
         1 + (ra.rk - 1 + {P.int_div('ra.n', '2', dialect)}) % ra.n AS neg_rk
  FROM p JOIN r ra ON p.doc_a = ra.doc_id
)
SELECT n.anchor, n.positive, rn.doc_id AS negative, n.lang
FROM neg n JOIN r rn ON rn.lang = n.lang AND rn.rk = n.neg_rk
WHERE rn.doc_id <> n.anchor AND rn.doc_id <> n.positive
ORDER BY n.anchor, n.positive"""


def psi_drift_sql(dialect: str, table: str = "documents") -> str:
    """Population-stability-index drift audit between the train and val
    hash-splits: per language, PSI = Σ_buckets (p−q)·ln(p/q) over
    100-char length buckets with Laplace add-one smoothing (so a
    bucket present in only one split contributes a finite term). The
    production data-drift monitor, run here split-vs-split — the same
    SQL compares two corpus snapshots.

    Determinism: each bucket's (p−q)·ln(p/q) term is computed once and
    frozen into DECIMAL(18,12); the per-language sum is then exact.
    One scan + one (lang, bucket) hash aggregate + one per-lang
    rollup; bucket domain derives from the data, identically on both
    engines."""
    sp = split_expr("d.doc_id", dialect)
    bk = P.int_div("d.n_chars", "100", dialect)
    return f"""
WITH base AS (
  SELECT d.lang, {sp} AS split, {bk} AS b FROM {table} d
),
counts AS (
  SELECT lang, b,
         SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS ct,
         SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS cv
  FROM base WHERE split IN ('train', 'val')
  GROUP BY lang, b
),
tot AS (
  SELECT lang, SUM(ct) AS nt, SUM(cv) AS nv, COUNT(*) AS nb
  FROM counts GROUP BY lang
),
terms AS (
  -- every operand forced to DOUBLE: a bare 1.0 literal is DECIMAL in
  -- both dialects and drags the division into engine-specific decimal
  -- scales, desynchronizing the ln inputs
  SELECT c.lang,
         CAST((CAST(c.ct + 1 AS DOUBLE) / CAST(t.nt + t.nb AS DOUBLE)
               - CAST(c.cv + 1 AS DOUBLE) / CAST(t.nv + t.nb AS DOUBLE))
              * ln((CAST(c.ct + 1 AS DOUBLE) / CAST(t.nt + t.nb AS DOUBLE))
                   / (CAST(c.cv + 1 AS DOUBLE) / CAST(t.nv + t.nb AS DOUBLE)))
              AS DECIMAL(18,12)) AS term
  FROM counts c JOIN tot t ON c.lang = t.lang
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_buckets,
       round(CAST(SUM(term) AS DOUBLE), 6) AS psi
FROM terms
GROUP BY lang
ORDER BY lang"""


def temperature_mixture_sql(
    dialect: str, table: str = "documents", alpha: float = 0.3
) -> str:
    """Temperature-based multilingual mixture (the XLM-R / T5 rule,
    Conneau et al. arXiv:1911.02116): language sampling mass ∝ n^α
    with α < 1, up-weighting low-resource languages; the budget is
    half the corpus, allocated by exact integer division over
    milli-scaled weights. The one libm call (pow) is rounded to 1e-6
    relative units BEFORE entering integer arithmetic, so a last-ulp
    pow divergence between engines cannot flip any allocation.

    Selection is the q82/q122 deterministic-priority pattern: per-
    language ROW_NUMBER over the portable doc-id hash — identical
    kept-set on any layout or engine. Output: per-language allocation
    audit (availability, target, kept count, kept-id checksum)."""
    h = bucket_expr("d.doc_id", dialect)
    return f"""
WITH sizes AS (
  SELECT lang, COUNT(*) AS n FROM {table} GROUP BY lang
),
w AS (
  SELECT lang, n,
         CAST(round(pow(CAST(n AS DOUBLE), {alpha}) * 1000000, 0) AS BIGINT)
           AS wm
  FROM sizes
),
tot AS (SELECT SUM(n) AS ntot, SUM(wm) AS wtot FROM w),
alloc AS (
  SELECT w.lang, w.n,
         {P.int_div(f"w.wm * {P.int_div('t.ntot', '2', dialect)}", 't.wtot', dialect)}
           AS target
  FROM w CROSS JOIN tot t
),
ranked AS (
  SELECT d.doc_id, d.lang,
         ROW_NUMBER() OVER (
           PARTITION BY d.lang ORDER BY {h}, d.doc_id) AS pr
  FROM {table} d
),
kept AS (
  SELECT r.lang, r.doc_id
  FROM ranked r JOIN alloc a ON r.lang = a.lang
  WHERE r.pr <= a.target
)
SELECT a.lang, CAST(a.n AS BIGINT) AS n_avail,
       CAST(a.target AS BIGINT) AS target,
       CAST(COUNT(k.doc_id) AS BIGINT) AS n_kept,
       CAST(COALESCE(SUM(k.doc_id), 0) AS BIGINT) AS kept_id_sum
FROM alloc a LEFT JOIN kept k ON a.lang = k.lang
GROUP BY a.lang, a.n, a.target
ORDER BY a.lang"""


def ensemble_selection_sql(
    dialect: str, table: str = "documents", keep_per_lang: int = 40
) -> str:
    """Ensemble quality selection: three per-document signals (the
    heuristic quality score, length, stopword share) rank-normalized
    PER LANGUAGE to a 0-1000 integer scale, averaged, and the top
    ``keep_per_lang`` docs per language kept — the multi-signal data
    selection blend (DataComp/Dolma-style filtering ensembles) with
    no libm anywhere: ranks and blends are pure integers, so the
    selection is bit-identical on any engine or layout.

    Plan: one scan computes all three signals (generated portable
    expressions), then four ROW_NUMBER windows all partitioned by
    language (the q82 pattern — per-partition state is a language's
    doc count). Ties break on doc_id at every rank."""
    from .text import quality_expr, stop_ratio_expr, token_count_expr

    q = quality_expr("text", dialect)
    s = stop_ratio_expr("text", dialect)
    t = token_count_expr("text", dialect)
    return f"""
WITH sig AS (
  SELECT doc_id, lang, {q} AS q, {s} AS sr, {t} AS nt
  FROM {table}
),
ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY q, doc_id) AS rq,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY nt, doc_id) AS rt,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY sr DESC, doc_id) AS rs,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM sig
),
blended AS (
  SELECT doc_id, lang,
         {P.int_div("((rq - 1) * 1000 + (rt - 1) * 1000 + (rs - 1) * 1000)",
                    "(3 * (n - 1))", dialect)} AS blend
  FROM ranked WHERE n > 1
),
sel AS (
  SELECT doc_id, lang, blend,
         ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY blend DESC, doc_id) AS pick
  FROM blended
)
SELECT doc_id, lang, CAST(blend AS BIGINT) AS blend_score
FROM sel WHERE pick <= {keep_per_lang}
ORDER BY lang, blend_score DESC, doc_id"""


def leakage_safe_split_sql(
    dialect: str,
    table: str = "documents",
    pairs: str | None = None,
    labels: str | None = None,
) -> str:
    """Leakage-SAFE train/val/test splitting — the FIX for what the
    q198 audit measures: split by dup-GROUP representative instead of
    per-doc, so verified near-duplicates can never straddle splits (a
    doc's hash and its near-dup's hash are independent; its GROUP's
    hash is shared). Docs outside any dup group key on their own id —
    identical assignment to the plain hash split for the clean
    majority.

    Output: per split, the doc count, how many docs ride a group key,
    and the recomputed cross-split near-dup pair count — ZERO by
    construction, and the gate hash-checks that zero rather than
    trusting it.

    Spark side passes the session-cached pair artifact (``pairs``) and
    the components relation (``labels``, from the O(log n) star
    closure); the oracle inlines the LSH chain + a recursive-CTE
    closure. Cost on top of the cached artifacts: one left join to
    attach group keys + the same split projection as q32."""
    if labels is None:
        from .dedup import minhash_lsh_sql

        pairs_sql = minhash_lsh_sql(dialect, table=table)
        head = f"""
WITH RECURSIVE
pairs AS MATERIALIZED ({pairs_sql}),
und AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(node, r) AS (
  SELECT DISTINCT a, a FROM und
  UNION
  SELECT u.b, reach.r FROM reach JOIN und u ON u.a = reach.node
),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),"""
    else:
        head = f"""
WITH pairs AS (SELECT doc_a, doc_b FROM {pairs}),
comp AS (SELECT node, component FROM {labels}),"""
    sp = split_expr("skey", dialect)
    return f"""{head}
keyed AS (
  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS skey,
         CASE WHEN c.component IS NULL THEN 0 ELSE 1 END AS grouped
  FROM {table} d LEFT JOIN comp c ON d.doc_id = c.node
),
sp AS (SELECT doc_id, grouped, {sp} AS split FROM keyed),
ps AS (
  SELECT a.split AS sa, b.split AS sb
  FROM pairs p
  JOIN sp a ON p.doc_a = a.doc_id
  JOIN sp b ON p.doc_b = b.doc_id
),
leak AS (
  SELECT split, CAST(SUM(l) AS BIGINT) AS n_leaked FROM (
    SELECT sa AS split, CASE WHEN sa <> sb THEN 1 ELSE 0 END AS l FROM ps
    UNION ALL
    SELECT sb AS split, CASE WHEN sa <> sb THEN 1 ELSE 0 END AS l FROM ps
  ) AS both_sides GROUP BY split
)
SELECT s.split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(s.grouped) AS BIGINT) AS n_grouped_docs,
       CAST(COALESCE(MAX(l.n_leaked), 0) AS BIGINT) AS n_leaked_pairs
FROM sp s LEFT JOIN leak l ON s.split = l.split
GROUP BY s.split
ORDER BY s.split"""


def exact_quota_sample_sql(
    dialect: str, table: str = "documents", num: int = 2, den: int = 10
) -> str:
    """Exact-count stratified sampling via largest-remainder (Hamilton)
    apportionment (q244): per-stratum allocations a_i with
    Σa_i EXACTLY equal to the corpus target floor(N·num/den) — the
    survey-sampling contract that q36's hash-threshold sampler cannot
    give (its stratum sizes are binomial around the target; eval sets
    and paid-labeling budgets need exact counts).

    All-integer apportionment: base_i = (n_i·num) DIV den and the
    remainder ranking uses (n_i·num) MOD den — the fractional parts
    never materialize as floats, so no engine can disagree. Row
    selection inside each stratum is the deterministic portable-hash
    rank (same randomness family as the q32 splits), so the SAMPLE
    ITSELF is reproducible, not just its size; per-stratum windows are
    language-partitioned (bounded), and the allocation relation is
    strata-sized driver math done relationally."""
    from . import portable as P

    h = P.rolling_hash(
        f"CAST(doc_id AS {'STRING' if dialect == 'spark' else 'VARCHAR'})",
        dialect,
    )
    b = P.int_div("(n * {num})".format(num=num), str(den), dialect)
    t = P.int_div("(nt * {num})".format(num=num), str(den), dialect)
    return f"""
WITH counts AS (SELECT lang, COUNT(*) AS n FROM {table} GROUP BY lang),
tot AS (SELECT SUM(n) AS nt FROM counts),
base AS (
  SELECT lang, n, {b} AS b, (n * {num}) % {den} AS frac FROM counts
),
sb AS (SELECT SUM(b) AS sb FROM base),
tgt AS (SELECT {t} AS t FROM tot),
ranked AS (
  SELECT lang, n, b,
         row_number() OVER (ORDER BY frac DESC, lang) AS rr
  FROM base
),
alloc AS (
  SELECT r.lang, r.n,
         r.b + CASE WHEN r.rr <= g.t - s.sb THEN 1 ELSE 0 END AS a
  FROM ranked r CROSS JOIN sb s CROSS JOIN tgt g
),
sel AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
                            ORDER BY {h}, doc_id) AS hr
  FROM {table}
)
SELECT a.lang,
       CAST(a.n AS BIGINT) AS n_total,
       CAST(a.a AS BIGINT) AS allocation,
       CAST(COUNT(s.doc_id) AS BIGINT) AS n_sampled,
       CAST(COALESCE(SUM(s.doc_id), 0) AS BIGINT) AS id_checksum
FROM alloc a
LEFT JOIN sel s ON s.lang = a.lang AND s.hr <= a.a
GROUP BY a.lang, a.n, a.a
ORDER BY a.lang"""
