"""Training-data curation operators over the ``documents`` table.

Beyond-reference extensions (SURVEY.md §7 M6) covering the selection /
mixture side of a pretraining pipeline, next to the dedup family in
:mod:`.dedup`:

- **benchmark decontamination** — which training docs share any n-gram
  shingle with a held-out benchmark set (the train/test contamination
  sweep every pretraining corpus needs);
- **canonical selection** — per exact-duplicate group, keep the best
  document (longest, then lowest id) and count what was dropped;
- **token-budget mixture sampling** — deterministic per-language corpus
  cap: order docs by key hash, keep while the running token total fits
  the language's budget (how data mixtures are actually drawn);
- **document packing** — assign docs to fixed-size context windows by
  running token count (the batch-packing approximation);
- **TF-IDF keyword search** — score docs against a term list with
  ln((N+1)/(df+1)) idf, exact top-k.

All are dialect-parametric SQL (Spark ``spark.sql`` / DuckDB oracle)
built on :mod:`.portable` — the per-row arithmetic is identical by
construction, and float work is decimal-accumulated so partial-agg
order can't change results.

Scale notes (100 TB):

- decontamination joins the corpus' shingle index against a benchmark
  set that is tiny by construction — Spark broadcasts it; the corpus
  side streams through one shuffle on the shingle hash;
- budget/packing are one window per language partition — embarrassingly
  parallel across languages; within a language the running sum is
  linear per partition (and a language too big for one task would use
  the two-stage percentile-cut pattern of q74);
- canonical selection is one row_number window over the fingerprint
  hash — the standard dedup-keep-best slice;
- TF-IDF restricts the explode to the query terms BEFORE any shuffle:
  the grouped state is O(matched terms), not O(vocabulary).
"""

from __future__ import annotations

from . import portable as P
from .dedup import _explode
from .text import token_count_expr

DECON_NGRAM = 4
CONTEXT_TOKENS = 1024
LANG_TOKEN_BUDGET = 5000
SEARCH_TERMS = ("spark", "join", "vector", "window")


def decontamination_sql(
    dialect: str,
    table: str = "documents",
    n: int = DECON_NGRAM,
    modulus: int = 23,
    top: int = 50,
    th_table: str | None = None,
) -> str:
    """Training docs sharing any ``n``-gram shingle with the benchmark
    subset (``doc_id % modulus = 0`` — a deterministic stand-in for a
    held-out eval set). Returns the ``top`` most-contaminated docs with
    shared-shingle and benchmark-doc counts.

    Built on :func:`~.dedup.shingle_cte`, so the Spark side reuses the
    cached token-hash relation (``th_table``) shared with the whole
    dedup family — the corpus is tokenized/hashed ONCE per process, and
    this query adds only a per-doc window + the contamination join. The
    benchmark side is a ~1/modulus slice pruned before the join (Spark
    broadcasts it at these sizes; at 100 TB it is the small side by
    construction)."""
    from .dedup import shingle_cte

    return f"""
WITH {shingle_cte(dialect, table, n, th_table)},
tr AS (SELECT doc_id, g FROM sh WHERE doc_id % {modulus} <> 0),
bm AS (SELECT doc_id, g FROM sh WHERE doc_id % {modulus} = 0)
SELECT tr.doc_id, COUNT(DISTINCT tr.g) AS n_shared_shingles,
       COUNT(DISTINCT bm.doc_id) AS n_benchmark_docs
FROM tr JOIN bm ON tr.g = bm.g
GROUP BY tr.doc_id
ORDER BY n_shared_shingles DESC, tr.doc_id
LIMIT {top}
"""


def repetition_sql(
    dialect: str,
    table: str = "documents",
    n: int = 3,
    threshold: float = 0.2,
    th_table: str | None = None,
) -> str:
    """Within-document repetition filter (the Gopher/MassiveText
    duplicate-n-gram heuristic): per doc, the fraction of ``n``-token
    shingle OCCURRENCES whose shingle value is repeated inside the same
    doc — boilerplate, chant-spam, and template pages score high, normal
    prose low. Emits every doc's occurrence count, duplicate fraction,
    and the keep/drop verdict at ``threshold``.

    dup_frac = 1 - distinct_shingles / total_shingle_occurrences, so a
    doc repeating one 3-gram 100 times scores ~0.99 and a no-repeat doc
    scores 0. Built on the shared shingle chain (Spark side reuses the
    cached token-hash relation): one window + one per-doc aggregate —
    linear, shuffle-on-doc_id only, no joins.
    """
    from .dedup import shingle_cte

    # shingle_cte ends in `sh` (DISTINCT) but also defines `shrows`
    # (every occurrence) — repetition needs both counts.
    return f"""
WITH {shingle_cte(dialect, table, n, th_table)},
occ AS (
  SELECT doc_id, COUNT(*) AS n_occ, COUNT(DISTINCT g) AS n_distinct
  FROM shrows WHERE g IS NOT NULL GROUP BY doc_id
)
SELECT doc_id, n_occ,
       round(1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_occ AS DOUBLE), 6)
         AS dup_frac,
       CAST(1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_occ AS DOUBLE)
            > {threshold} AS BOOLEAN) AS drop_doc
FROM occ
ORDER BY doc_id
"""


def canonical_selection_sql(
    dialect: str, table: str = "documents", shard_mod: int = 5
) -> str:
    """Exact-dup groups (normalized-text fingerprint) → keep the best
    member (max n_chars, then min doc_id); emit only real groups
    (size > 1) with the kept doc and the drop count.

    The corpus is the base table UNION a deterministic re-ingested
    shard (every ``shard_mod``-th doc under shifted ids) — the standard
    situation this operator exists for: the same page arriving from two
    crawls/sources. Selection keeps the original (equal quality → min
    doc_id wins)."""
    from .text import fingerprint_expr

    fp = fingerprint_expr("text", dialect)
    return f"""
WITH corpus AS (
  SELECT doc_id, n_chars, text FROM {table}
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, n_chars, text FROM {table}
  WHERE doc_id % {shard_mod} = 0
),
fps AS (SELECT doc_id, n_chars, {fp} AS fp FROM corpus),
ranked AS (
  SELECT doc_id, fp,
         ROW_NUMBER() OVER (PARTITION BY fp
                            ORDER BY n_chars DESC, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY fp) AS grp_n
  FROM fps
)
-- size-1 groups excluded: output is the dedup work list, not the corpus
SELECT fp, doc_id AS kept_doc, CAST(grp_n - 1 AS BIGINT) AS n_dropped
FROM ranked WHERE rn = 1 AND grp_n > 1
ORDER BY fp
"""


def token_budget_sql(
    dialect: str,
    table: str = "documents",
    budget: int = LANG_TOKEN_BUDGET,
) -> str:
    """Per-language token-budget sample: deterministic hash order, keep
    docs while the running token total stays within budget. Reports per
    language how much of the corpus the budget admitted."""
    tok = token_count_expr("text", dialect)
    key = "CAST(doc_id AS STRING)" if dialect == "spark" else "CAST(doc_id AS VARCHAR)"
    hv = P.rolling_hash(key, dialect)
    return f"""
WITH t AS (SELECT doc_id, lang, {tok} AS tok, {hv} AS hv FROM {table}),
c AS (
  SELECT lang, tok,
         SUM(tok) OVER (PARTITION BY lang ORDER BY hv, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS n_tokens,
       CAST(MAX(cum) AS BIGINT) AS budget_used
FROM c WHERE cum <= {budget}
GROUP BY lang ORDER BY lang
"""


def packing_sql(
    dialect: str,
    table: str = "documents",
    ctx: int = CONTEXT_TOKENS,
) -> str:
    """Greedy sequence packing: within each language (docs in doc_id
    order), pack_id = floor(tokens-before-this-doc / ctx) — the
    running-sum approximation of first-fit batch packing. Reports pack
    shape per language."""
    tok = token_count_expr("text", dialect)
    pack = P.int_div("(cum - tok)", str(ctx), dialect)
    return f"""
WITH t AS (SELECT doc_id, lang, {tok} AS tok FROM {table}),
c AS (
  SELECT lang, tok,
         SUM(tok) OVER (PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
),
packs AS (
  SELECT lang, {pack} AS pack_id, COUNT(*) AS n_docs,
         CAST(SUM(tok) AS BIGINT) AS pack_tokens
  FROM c GROUP BY lang, {pack}
)
SELECT lang, COUNT(*) AS n_packs,
       CAST(MIN(n_docs) AS BIGINT) AS min_docs_per_pack,
       CAST(MAX(n_docs) AS BIGINT) AS max_docs_per_pack,
       ROUND(CAST(SUM(pack_tokens) AS DOUBLE) / (COUNT(*) * {ctx}), 6)
         AS avg_fill
FROM packs GROUP BY lang ORDER BY lang
"""


def tfidf_search_sql(
    dialect: str,
    table: str = "documents",
    terms: tuple[str, ...] = SEARCH_TERMS,
    k: int = 20,
    th_table: str | None = None,
) -> str:
    """TF-IDF relevance top-k for a fixed term list.

    idf = ln((N+1)/(df+1)); score = Σ tf·idf over matched terms,
    accumulated as DECIMAL so partial-aggregation order is irrelevant,
    rounded to 6dp (ln is correctly-rounded libm on both engines — same
    contract as the math-function family q76).

    ``th_table`` (Spark side): key term membership / tf / df on the
    cached token-hash index instead of tokenizing — the output is
    (doc_id, score), token strings never leave, and CTE inlining's
    double tokenize (hits feeds tf AND idf) collapses to two scans of
    the in-memory relation (the q177 BM25 treatment)."""
    toks = P.tokens("text", dialect)
    tok_rows = _explode(dialect, "doc_id", "toked", "toks", "t")
    if th_table is not None:
        from .dedup import _pytokhash

        prefix = f"tok AS (SELECT doc_id, h AS t FROM {th_table})"
        term_list = ", ".join(str(_pytokhash(t)[0]) for t in terms)
    else:
        prefix = f"""toked AS (SELECT doc_id, {toks} AS toks FROM {table}),
tok AS ({tok_rows})"""
        term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {prefix},
hits AS (SELECT doc_id, t FROM tok WHERE t IN ({term_list})),
tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM hits GROUP BY doc_id, t),
idf AS (
  SELECT t, ln((n.n + 1.0) / (COUNT(DISTINCT doc_id) + 1.0)) AS idf
  FROM hits CROSS JOIN (SELECT COUNT(*) AS n FROM {table}) n
  GROUP BY t, n.n
)
SELECT tf.doc_id,
       ROUND(CAST(SUM(CAST(tf.tf * idf.idf AS DECIMAL(18,9)))
             AS DOUBLE), 6) AS score
FROM tf JOIN idf ON tf.t = idf.t
GROUP BY tf.doc_id
ORDER BY score DESC, tf.doc_id
LIMIT {k}
"""


GOPHER_MIN_TOK = 20
GOPHER_MAX_TOK = 5000
# mean token length bounds ×10 (kept integer so the rule is exact:
# 10·chars ⋛ bound·tokens — no float division at the boundary)
GOPHER_MIN_MEANLEN_X10 = 40
GOPHER_MAX_MEANLEN_X10 = 80
GOPHER_MIN_STOP_HITS = 2
# most-frequent token may cover at most 1/GOPHER_TOP_DIV of the doc
GOPHER_TOP_DIV = 8


def gopher_quality_sql(dialect: str, table: str = "documents") -> str:
    """Gopher/MassiveText-style document quality ruleset (Rae et al.
    2021 §A1.1, re-expressed over this corpus' signal surface): per doc,
    token count bounds, mean-token-length band, minimum stopword
    evidence, and a most-frequent-token dominance cap (the unigram form
    of the top-n-gram-fraction rule; the n-gram repetition rule itself
    is q114). Emits the measured stats, each rule verdict, and the
    composite keep flag.

    Every rule boundary is exact integer arithmetic (cross-multiplied
    instead of divided), so keep/drop can never float-flip between
    engines. Shape: one explode + two hash aggregates keyed by doc_id —
    linear, embarrassingly parallel, no joins; at 100 TB this is a
    single map-side-combined shuffle on doc_id."""
    from .text import STOPWORDS, _sql_list

    toks = P.tokens("text", dialect)
    tok_rows = _explode(dialect, "doc_id", "toked", "toks", "t")
    return f"""
WITH toked AS (SELECT doc_id, {toks} AS toks FROM {table}),
tok AS ({tok_rows}),
freq AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY doc_id, t),
stats AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_tok,
         CAST(MAX(c) AS BIGINT) AS top_c,
         CAST(SUM(length(t) * c) AS BIGINT) AS n_tok_chars,
         CAST(SUM(CASE WHEN t IN ({_sql_list(STOPWORDS)})
                       THEN c ELSE 0 END) AS BIGINT) AS stop_hits
  FROM freq GROUP BY doc_id
)
SELECT doc_id, n_tok, top_c, stop_hits,
       round(CAST(n_tok_chars AS DOUBLE) / CAST(n_tok AS DOUBLE), 6)
         AS mean_tok_len,
       CAST(n_tok BETWEEN {GOPHER_MIN_TOK} AND {GOPHER_MAX_TOK}
            AS BOOLEAN) AS r_len,
       CAST(n_tok_chars * 10 >= n_tok * {GOPHER_MIN_MEANLEN_X10}
            AND n_tok_chars * 10 <= n_tok * {GOPHER_MAX_MEANLEN_X10}
            AS BOOLEAN) AS r_mean_len,
       CAST(stop_hits >= {GOPHER_MIN_STOP_HITS} AS BOOLEAN) AS r_stop,
       CAST(top_c * {GOPHER_TOP_DIV} <= n_tok AS BOOLEAN) AS r_top,
       CAST(n_tok BETWEEN {GOPHER_MIN_TOK} AND {GOPHER_MAX_TOK}
            AND n_tok_chars * 10 >= n_tok * {GOPHER_MIN_MEANLEN_X10}
            AND n_tok_chars * 10 <= n_tok * {GOPHER_MAX_MEANLEN_X10}
            AND stop_hits >= {GOPHER_MIN_STOP_HITS}
            AND top_c * {GOPHER_TOP_DIV} <= n_tok
            AS BOOLEAN) AS keep_doc
FROM stats ORDER BY doc_id
"""


def rare_bigram_sql(
    dialect: str,
    table: str = "documents",
    th_table: str | None = None,
    bg_table: str | None = None,
) -> str:
    """Statistical language-model filter without the float hazard of a
    perplexity score: train a corpus bigram table (counts over adjacent
    token-hash pairs — the 2-gram MLE numerators), then score each doc
    by the fraction of its bigram occurrences that are corpus-RARE,
    where rare = count strictly below the corpus mean bigram count
    (cnt · n_distinct < n_occurrences, exact cross-multiplication in
    DECIMAL so neither engine can overflow or float-flip). A doc full
    of corpus-rare bigrams is exactly a doc a bigram LM assigns low
    probability — the CCNet/perplexity-filter decision as a pure
    integer rank statistic. Drop verdict: more than half the doc's
    bigrams rare.

    Built on the shared shingle chain at n=2 (Spark reuses the cached
    token-hash relation). Shape: the corpus bigram table is one hash
    aggregate on g; scoring joins occurrences back on g — at 100 TB the
    count table is vocabulary²-bounded (in practice Zipf-small) and the
    join is the standard shuffle-on-hash-key; no window, no sort.

    ``bg_table`` (Spark side, r8 guide §2.4): ``shrows`` is referenced
    twice (train + score) and Spark inlines CTEs, so the lead()-window
    shingle chain over the token index ran twice. At n=2 the shingle
    hash is a pure projection of the cached bigram-occurrence artifact
    (g = (a·SH_A + b) mod P, by the Horner definition; the artifact
    already carries exactly the b-IS-NOT-NULL rows), so both references
    become cheap scans of the in-memory relation — zero windows.
    Oracle keeps the self-contained chain."""
    from .dedup import SH_A, shingle_cte
    from .portable import HASH_P

    if bg_table is not None and dialect == "spark":
        shingle_src = (
            f"WITH shrows AS (SELECT doc_id, (a * {SH_A} + b) % {HASH_P} "
            f"AS g FROM {bg_table})")
    else:
        shingle_src = f"WITH {shingle_cte(dialect, table, 2, th_table)}"
    return f"""
{shingle_src},
bg AS (SELECT g, COUNT(*) AS cnt FROM shrows WHERE g IS NOT NULL GROUP BY g),
bstats AS (
  SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n_distinct,
         CAST(SUM(cnt) AS DECIMAL(38,0)) AS n_occ
  FROM bg
),
scored AS (
  SELECT s.doc_id,
         COUNT(*) AS n_bigrams,
         CAST(SUM(CASE WHEN CAST(bg.cnt AS DECIMAL(38,0)) * bstats.n_distinct
                            < bstats.n_occ
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
  FROM shrows s JOIN bg ON s.g = bg.g CROSS JOIN bstats
  WHERE s.g IS NOT NULL
  GROUP BY s.doc_id
)
SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams, n_rare,
       round(CAST(n_rare AS DOUBLE) / CAST(n_bigrams AS DOUBLE), 6)
         AS rare_frac,
       CAST(n_rare * 2 > n_bigrams AS BOOLEAN) AS drop_doc
FROM scored ORDER BY doc_id
"""


# character classes only — no backslash escapes, so the literal regex text
# is identical under Spark (Java regex) and DuckDB (RE2) string parsing
PII_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.]+[.][a-z]+"
PII_ACCT_RE = "acct-[0-9]+"


def pii_redaction_sql(dialect: str, table: str = "customer") -> str:
    """PII redaction sweep: synthesize a deterministic contact-note per
    customer (name-derived e-mail + account number — the PII shapes a
    real CRM export leaks), then detect-and-mask both patterns with
    pure-regex rewrites and report per-row redaction counts plus a
    corpus rollup of the masked text. The regexes use only character
    classes (no backslash escapes), so the same literal compiles
    identically under Java regex and RE2.

    Shape: pure per-row projection — no shuffle until the final tiny
    aggregate; at 100 TB this is a map-only pass that pushes the two
    source columns down to the scan."""
    if dialect == "spark":
        def rep(src: str, pat: str, to: str) -> str:
            return f"regexp_replace({src}, '{pat}', '{to}')"
    else:
        def rep(src: str, pat: str, to: str) -> str:
            return f"regexp_replace({src}, '{pat}', '{to}', 'g')"
    cnt = (
        "size(regexp_extract_all({src}, '{pat}', 0))"
        if dialect == "spark"
        else "len(regexp_extract_all({src}, '{pat}'))"
    )
    note = (
        "'contact ' || lower(replace(c_name, '#', '.')) || '@example.com'"
        " || ' or acct-' || CAST(c_custkey * 7919 + 13 AS VARCHAR)"
        " || ' (segment ' || c_mktsegment || ')'"
    )
    if dialect == "spark":
        note = note.replace("AS VARCHAR", "AS STRING")
    masked = rep(rep("note", PII_EMAIL_RE, "[EMAIL]"), PII_ACCT_RE, "[ACCT]")
    n_email = cnt.format(src="note", pat=PII_EMAIL_RE)
    n_acct = cnt.format(src="note", pat=PII_ACCT_RE)
    return f"""
WITH notes AS (SELECT c_custkey, {note} AS note FROM {table}),
redacted AS (
  SELECT c_custkey,
         {masked} AS masked,
         CAST({n_email} AS BIGINT) AS n_email,
         CAST({n_acct} AS BIGINT) AS n_acct
  FROM notes
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(n_email) AS BIGINT) AS total_emails,
       CAST(SUM(n_acct) AS BIGINT) AS total_accts,
       CAST(SUM(CASE WHEN masked LIKE '%[EMAIL]%'
                     AND masked LIKE '%[ACCT]%'
                THEN 1 ELSE 0 END) AS BIGINT) AS fully_masked,
       CAST(SUM(CASE WHEN masked LIKE '%@%' THEN 1 ELSE 0 END) AS BIGINT)
         AS residual_at,
       CAST(SUM(length(masked)) AS BIGINT) AS masked_chars
FROM redacted
"""


VOCAB_SIZE = 1000


def vocab_encode_sql(
    dialect: str,
    table: str = "documents",
    vocab_size: int = VOCAB_SIZE,
    th_table: str | None = None,
) -> str:
    """Build a corpus vocabulary (top-``vocab_size`` token hashes by
    document frequency, ties by hash) and dictionary-encode every doc
    against it — the id-mapping step in front of tokenized training
    shards. Emits per-doc (n_tokens, n_oov, enc_checksum) where the
    checksum is a position-weighted fold of the assigned ids, so the
    oracle pins the exact id sequence without comparing array columns.

    Spark side reuses the cached token-hash relation (``th_table``).
    The vocab is ``vocab_size`` rows — the encode join broadcasts it;
    the df-ranking window runs over the (already aggregated) distinct
    token set, and at 100 TB the top-V cut would come from the q74
    two-stage percentile pattern rather than one global sort."""
    from .dedup import th_cte

    return f"""
WITH {th_cte(dialect, table, th_table)},
dfreq AS (SELECT h, COUNT(DISTINCT doc_id) AS df FROM th GROUP BY h),
topv AS (SELECT h, df FROM dfreq ORDER BY df DESC, h LIMIT {vocab_size}),
vocab AS (
  -- rank-via-count: tok_id = how many vocab entries sort at-or-before
  -- this one under (df DESC, h). A deliberate V^2 triangular join over
  -- the LIMITed vocab_size-row relation (broadcast-size) — equivalent
  -- to row_number() but keeps the unpartitioned-window stage (and its
  -- WindowExec warning) out of the plan entirely; h is unique, so the
  -- order is total and the ranks dense on both engines.
  SELECT a.h, COUNT(*) AS tok_id
  FROM topv a JOIN topv b
    ON b.df > a.df OR (b.df = a.df AND b.h <= a.h)
  GROUP BY a.h
),
enc AS (
  SELECT t.doc_id, t.pos, v.tok_id
  FROM th t LEFT JOIN vocab v ON t.h = v.h
)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN tok_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       CAST(SUM(COALESCE(tok_id, 0) * (pos + 1)) % {P.HASH_P} AS BIGINT)
         AS enc_checksum
FROM enc GROUP BY doc_id ORDER BY doc_id
"""


def bm25_search_sql(
    dialect: str,
    table: str = "documents",
    terms: tuple[str, ...] = SEARCH_TERMS,
    k: int = 20,
    th_table: str | None = None,
) -> str:
    """Okapi BM25 relevance top-k for a fixed term list (Robertson &
    Walker; the ranking function behind Lucene/Elasticsearch defaults)
    — the length-normalized upgrade of q85's raw TF-IDF.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf(t) = ln((N − df + ½)/(df + ½) + 1)  (the non-negative variant),
    k1 = 1.2, b = 0.75.

    Engine determinism: every input (tf, df, dl, N, Σdl) is an exact
    integer aggregate; avgdl and the per-term score evaluate through
    ONE fixed IEEE-double expression tree (identical on both engines —
    the q76/q85 contract, ln being correctly-rounded libm), per-doc
    accumulation is DECIMAL so partial-agg order can't reorder float
    adds, and the 6dp round happens once at the end.

    Scale: two passes over the token stream (doc lengths + term hits);
    `tok` is referenced by both — at 100 TB materialize it (the
    dedup.materialize pattern) so Spark's CTE inlining can't double
    tokenize. Joins after `tf` touch only matched (doc, term) rows and
    the |terms|-row idf relation (broadcast-sized)."""
    toks = P.tokens("text", dialect)
    tok_rows = _explode(dialect, "doc_id", "toked", "toks", "t")
    if th_table is not None:
        # Spark side: run the whole statement off the cached token-HASH
        # index (dedup.tokhash_view) — scores never need the token
        # strings (the output is (doc_id, score)), so term membership,
        # tf, df and dl all key on the hash, and the five tokenize
        # re-derivations CTE inlining planned (dl twice via stats,
        # hits twice) collapse to cheap scans of the one in-memory
        # relation. Term hashes are computed driver-side with the same
        # rolling hash (dedup._pytokhash); the oracle keeps the string
        # text, so the hash path is proven by the hash gate.
        from .dedup import _pytokhash

        prefix = f"tok AS (SELECT doc_id, h AS t FROM {th_table})"
        term_list = ", ".join(str(_pytokhash(t)[0]) for t in terms)
    else:
        prefix = f"""toked AS (SELECT doc_id, {toks} AS toks FROM {table}),
tok AS ({tok_rows})"""
        term_list = ", ".join(f"'{t}'" for t in terms)
    half = "(CAST(5 AS DOUBLE) / 10)"
    k1 = "(CAST(12 AS DOUBLE) / 10)"
    k1p1 = "(CAST(22 AS DOUBLE) / 10)"
    b = "(CAST(75 AS DOUBLE) / 100)"
    one = "CAST(1 AS DOUBLE)"
    tfd = "CAST(tf.tf AS DOUBLE)"
    dl_ratio = "(CAST(dl.dl AS DOUBLE) / s.avgdl)"
    denom = f"({tfd} + {k1} * (({one} - {b}) + {b} * {dl_ratio}))"
    term_score = f"idf.idf * ({tfd} * {k1p1}) / {denom}"
    return f"""
WITH {prefix},
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
stats AS (
  SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl, COUNT(*) AS n
  FROM dl
),
hits AS (SELECT doc_id, t FROM tok WHERE t IN ({term_list})),
tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM hits GROUP BY doc_id, t),
idf AS (
  SELECT t,
         ln((s.n - COUNT(DISTINCT doc_id) + {half})
            / (COUNT(DISTINCT doc_id) + {half}) + {one}) AS idf
  FROM hits CROSS JOIN stats s
  GROUP BY t, s.n
)
SELECT tf.doc_id,
       ROUND(CAST(SUM(CAST({term_score} AS DECIMAL(18,9))) AS DOUBLE), 6)
         AS score
FROM tf
JOIN idf ON tf.t = idf.t
JOIN dl ON tf.doc_id = dl.doc_id
CROSS JOIN stats s
GROUP BY tf.doc_id
ORDER BY score DESC, tf.doc_id
LIMIT {k}
"""


PMI_WINDOW = 2    # co-occurrence window: tokens ≤ 2 positions apart
PMI_MIN_PAIRS = 5  # noise floor for reported pairs
PMI_TOP_K = 30


def ppmi_pairs_sql(
    dialect: str, table: str = "documents", tok_table: str | None = None
) -> str:
    """Positive PMI token co-occurrence (the word2vec/GloVe-era PPMI
    matrix; Church & Hanks association scores): pairs of tokens within
    ``PMI_WINDOW`` positions in a document, scored by
    max(0, ln(p(a,b) / (p(a)·p(b)))) with unigram marginals, top
    ``PMI_TOP_K`` by score — the association-mining step of an
    embedding/phrase-detection pipeline.

    Counts (pair, unigram, totals) are exact integer aggregates; the
    single ln evaluates one fixed IEEE expression tree from those
    integers (the q76/q85 libm contract), rounded to 6dp. The pair is
    canonicalized (lexicographic min/max), so (a,b) and (b,a) merge.

    Scale: positions self-join fans out ≤ PMI_WINDOW rows per token
    (join on doc_id + bounded position offset — never token × token),
    unigram counts are one hash-agg, and the final join attaches two
    broadcast-sized marginal relations. At 100 TB the position join
    shuffles on doc_id, i.e. stays co-partitioned with the explode.

    ``tok_table`` (Spark side, r8 guide §2.4): ``tok`` is referenced
    three times (unigram counts + BOTH sides of the position
    self-join) and Spark inlines CTEs, so the tokenize+posexplode ran
    three times. Callers materialize the (doc_id, pos, t) relation once
    and pass the view; every reference becomes an in-memory scan.
    Oracle keeps the self-contained chain (DuckDB materializes CTEs)."""
    from .dedup import _posexplode

    toks = P.tokens("text", dialect)
    if tok_table is not None and dialect == "spark":
        rows = f"SELECT doc_id, pos, t FROM {tok_table}"
    else:
        rows = _posexplode(
            dialect, "doc_id",
            f"(SELECT doc_id, {toks} AS toks FROM {table}) s",
            "toks", "pos", "t"
        )
    arg = (
        "(CAST(pc.n AS DOUBLE) * CAST(nt.n AS DOUBLE) * CAST(nt.n AS DOUBLE))"
        " / (CAST(pt.n AS DOUBLE) * CAST(ua.n AS DOUBLE)"
        " * CAST(ub.n AS DOUBLE))"
    )
    if dialect == "spark":
        # Spark inlines WITH-CTEs: with nt/pt as direct COUNTs, the
        # tokenize CTE was derived four times and the position
        # SELF-JOIN twice (once for pc, AGAIN just to count pt). The
        # scalar totals are exact integer sums of the aggregates
        # already computed: nt = Σ uni.n, pt = Σ pc.n (pc has no
        # HAVING) — algebraic identities, so the self-join and the
        # tokenize run once/twice respectively. DuckDB (the oracle
        # reference text) materializes CTEs natively and keeps the
        # direct-count form.
        nt = "nt AS (SELECT SUM(n) AS n FROM uni)"
        pt = "pt AS (SELECT SUM(n) AS n FROM pc)"
    else:
        nt = "nt AS (SELECT COUNT(*) AS n FROM tok)"
        pt = "pt AS (SELECT COUNT(*) AS n FROM pairs)"
    return f"""
WITH tok AS ({rows}),
uni AS (SELECT t, COUNT(*) AS n FROM tok GROUP BY t),
{nt},
pairs AS (
  SELECT CASE WHEN a.t < b.t THEN a.t ELSE b.t END AS tok_a,
         CASE WHEN a.t < b.t THEN b.t ELSE a.t END AS tok_b
  FROM tok a JOIN tok b
    ON a.doc_id = b.doc_id
   AND b.pos > a.pos AND b.pos <= a.pos + {PMI_WINDOW}
   AND a.t <> b.t
),
pc AS (SELECT tok_a, tok_b, COUNT(*) AS n FROM pairs GROUP BY tok_a, tok_b),
{pt}
SELECT pc.tok_a, pc.tok_b, CAST(pc.n AS BIGINT) AS n_pairs,
       ROUND(GREATEST(CAST(0 AS DOUBLE), ln({arg})), 6) AS ppmi
FROM pc
JOIN uni ua ON pc.tok_a = ua.t
JOIN uni ub ON pc.tok_b = ub.t
CROSS JOIN nt CROSS JOIN pt
WHERE pc.n >= {PMI_MIN_PAIRS}
ORDER BY ppmi DESC, tok_a, tok_b
LIMIT {PMI_TOP_K}
"""


def canonical_url_sql(dialect: str, table: str = "documents") -> str:
    """Canonical-URL deduplication (the web-crawl precursor to text
    dedup: CommonCrawl-style pipelines drop refetches of the same
    resource before ever reading bodies). Each document's URL — the
    fixture synthesizes one deterministically from doc fields with
    messy casing, a www. prefix, an explicit default port, tracking
    parameters, unsorted query params, and a fragment — is REALLY
    parsed and normalized:

      scheme/host lowercased, 'www.' stripped, default :443 port
      stripped, fragment dropped, utm_* tracking params removed,
      remaining query parameters sorted.

    Output: one row per canonical URL with its refetch count and the
    kept representative (min doc_id); the fixture's moduli guarantee
    genuine collisions (doc d and d+420 canonicalize identically), so
    the dedup path is exercised, not vacuous. Pure string expressions
    (regexp component extraction + split/filter/sort/join on params) —
    JVM codegen on Spark, no UDFs; exact string equality across
    engines.

    Scale: per-row map work then one hash-agg on the canonical string;
    at 100 TB this groupBy shuffles the (short) canonical key, and the
    agg is map-side-combinable. The canonical key ALSO becomes the
    natural partition/bucket column for downstream near-dup passes."""
    cast_s = "STRING" if dialect == "spark" else "VARCHAR"
    # Spark string literals process backslash escapes; DuckDB's do not
    # (the norm_text trap) -- bs renders ONE regex backslash per dialect.
    bs = "\\\\" if dialect == "spark" else "\\"

    def canon_params(q: str) -> str:
        kept = P.filter_(q, "x", "x NOT LIKE 'utm_%'", dialect)
        if dialect == "spark":
            return f"array_join(array_sort({kept}), '&')"
        return f"array_to_string(list_sort({kept}), '&')"

    split = "split" if dialect == "spark" else "string_split"
    url = (
        "concat(CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTPS://' END,"
        " CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END,"
        " 'Src-', source, '.Example.com',"
        " CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END,"
        f" '/articles/', CAST(doc_id % 5 AS {cast_s}),"
        f" '?utm_source=feed', '&b=', CAST(doc_id % 3 AS {cast_s}),"
        f" '&a=', CAST(doc_id % 7 AS {cast_s}), '&utm_campaign=news',"
        " CASE WHEN doc_id % 4 = 0 THEN '#section' ELSE '' END)"
    )
    scheme = "lower(regexp_extract(url, '^([A-Za-z]+)://', 1))"
    hostport = "lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1))"
    host = (
        f"regexp_replace(regexp_replace({hostport}, '^www{bs}.', ''),"
        " ':443$', '')"
    )
    path = "regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1)"
    query = f"regexp_extract(url, '{bs}?([^#]*)', 1)"
    params = canon_params(f"{split}({query}, '&')")
    canon = (
        f"concat({scheme}, '://', {host}, {path},"
        f" CASE WHEN {params} = '' THEN '' "
        f"ELSE concat('?', {params}) END)"
    )
    return f"""
WITH urls AS (SELECT doc_id, {url} AS url FROM {table}),
canon AS (SELECT doc_id, {canon} AS canonical_url FROM urls)
SELECT canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM canon
GROUP BY canonical_url
ORDER BY canonical_url
"""


def dq_audit_sql(
    dialect: str,
    orders: str = "orders",
    customer: str = "customer",
    lineitem: str = "lineitem",
    nation: str = "nation",
    part: str = "part",
) -> str:
    """Declarative data-quality audit (the dbt-test / Deequ
    constraint-suite analog): referential integrity, key, domain, and
    temporal-ordering rules evaluated in ONE fused pass per fact table
    — every rule on a table rides the same scan/join as conditional
    aggregates instead of one query per rule, which is the difference
    between 3 passes and 3 × |rules| passes over 100 TB.

    Output: (rule, violations, n_checked) — zero-violation rows prove
    the constraint HELD over n_checked rows (absence as evidence, the
    audit contract); the ships-within-90-days rule is genuinely violated
    in TPC-H-shaped data (shipdate spreads to orderdate+121d), proving the counting path is live.

    Scale: referential checks are left joins with the dimension on the
    build side (customer/nation broadcast-sized relative to facts;
    orders⋈lineitem shuffles on the join key); the duplicate-key rule
    is one hash-agg. All-integer output, engine-identical.

    Dialect split (r8, guide §2.4): Spark INLINES deterministic CTEs,
    so the original UNION-ALL tail (3 references each to ``li``/``ord``)
    re-ran the lineitem⋈orders audit join three times — 35 relation
    scans / 52 Exchanges in the captured plan. The Spark text instead
    derives each fused aggregate ONCE (each CTE single-referenced, so
    inlining is harmless), cross-joins the four 1-row relations, and
    unpivots with ``stack`` — row-identical output, 1 scan per fact
    table. DuckDB keeps the UNION-ALL form (it materializes CTEs
    natively, so the multi-reference is free there)."""
    ctes = f"""
WITH li AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS orphan,
         SUM(CASE WHEN l.l_quantity <= 0 THEN 1 ELSE 0 END) AS negqty,
         SUM(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM {lineitem} l LEFT JOIN {orders} o ON l.l_orderkey = o.o_orderkey
),
ord AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS orphan,
         SUM(CASE WHEN o.o_totalprice <= 0 THEN 1 ELSE 0 END) AS nonpos,
         SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS nullkey
  FROM {orders} o LEFT JOIN {customer} c ON o.o_custkey = c.c_custkey
),
cust AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN nt.n_nationkey IS NULL THEN 1 ELSE 0 END) AS orphan
  FROM {customer} c LEFT JOIN {nation} nt ON c.c_nationkey = nt.n_nationkey
),
pdup AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS dups
  FROM (SELECT p_partkey, COUNT(*) AS cnt FROM {part} GROUP BY p_partkey) g
)"""
    if dialect == "spark":
        return f"""
WITH {ctes.strip().removeprefix("WITH ").rstrip()}
SELECT rule, violations, n_checked
FROM (
  SELECT stack(8,
    'customer_orphan_nationkey', CAST(cust.orphan AS BIGINT),
        CAST(cust.n AS BIGINT),
    'lineitem_ships_within_90d', CAST(li.late AS BIGINT),
        CAST(li.n AS BIGINT),
    'lineitem_nonpositive_qty', CAST(li.negqty AS BIGINT),
        CAST(li.n AS BIGINT),
    'lineitem_orphan_orderkey', CAST(li.orphan AS BIGINT),
        CAST(li.n AS BIGINT),
    'orders_nonpositive_totalprice', CAST(ord.nonpos AS BIGINT),
        CAST(ord.n AS BIGINT),
    'orders_null_key', CAST(ord.nullkey AS BIGINT),
        CAST(ord.n AS BIGINT),
    'orders_orphan_custkey', CAST(ord.orphan AS BIGINT),
        CAST(ord.n AS BIGINT),
    'part_duplicate_pkey', CAST(pdup.dups AS BIGINT),
        CAST(pdup.n AS BIGINT)
  ) AS (rule, violations, n_checked)
  FROM li CROSS JOIN ord CROSS JOIN cust CROSS JOIN pdup
)
ORDER BY rule
"""
    return f"""
{ctes.strip()}
SELECT 'customer_orphan_nationkey' AS rule,
       CAST(cust.orphan AS BIGINT) AS violations,
       CAST(cust.n AS BIGINT) AS n_checked FROM cust
UNION ALL
SELECT 'lineitem_ships_within_90d', CAST(li.late AS BIGINT),
       CAST(li.n AS BIGINT) FROM li
UNION ALL
SELECT 'lineitem_nonpositive_qty', CAST(li.negqty AS BIGINT),
       CAST(li.n AS BIGINT) FROM li
UNION ALL
SELECT 'lineitem_orphan_orderkey', CAST(li.orphan AS BIGINT),
       CAST(li.n AS BIGINT) FROM li
UNION ALL
SELECT 'orders_nonpositive_totalprice', CAST(ord.nonpos AS BIGINT),
       CAST(ord.n AS BIGINT) FROM ord
UNION ALL
SELECT 'orders_null_key', CAST(ord.nullkey AS BIGINT),
       CAST(ord.n AS BIGINT) FROM ord
UNION ALL
SELECT 'orders_orphan_custkey', CAST(ord.orphan AS BIGINT),
       CAST(ord.n AS BIGINT) FROM ord
UNION ALL
SELECT 'part_duplicate_pkey', CAST(pdup.dups AS BIGINT),
       CAST(pdup.n AS BIGINT) FROM pdup
ORDER BY rule
"""


CHUNK_SIZE = 32    # tokens per chunk
CHUNK_STRIDE = 16  # tokens between chunk starts (SIZE-STRIDE overlap)


def chunk_documents_sql(dialect: str, table: str = "documents") -> str:
    """Sliding-window document chunking (the LLM context-prep step:
    RAG indexing and long-document training both shard documents into
    overlapping token windows). Chunk c of a document covers token
    positions [c·STRIDE, c·STRIDE + SIZE); each token therefore lands
    in at most SIZE/STRIDE chunks — a CONSTANT fan-out (2× at the
    defaults), expressed as a per-token chunk-id range explode, never a
    token × chunk join. Trailing partial chunks are kept (they are the
    document tail). Output: one row per chunk with its token count,
    position bounds, and an order-sensitive content signature
    Σ (offset+1)·tokenhash mod p — token hashes are computed ONCE per
    token, before the chunk fan-out.

    Scale: the chunk-id grouping key is (doc_id, chunk), co-partitioned
    with the tokenize explode, so the hash-agg is map-side combinable
    and the only shuffle is the final doc_id-keyed agg — the same
    per-document contract as the shingle family. All-integer output."""
    from .dedup import _posexplode

    toks = P.tokens("text", dialect)
    rows = _posexplode(
        dialect, "doc_id", f"(SELECT doc_id, {toks} AS toks FROM {table}) s",
        "toks", "pos", "t"
    )
    h = P.rolling_hash("t", dialect)
    # ceil((pos-SIZE+1)/STRIDE) for the smallest covering chunk; all
    # operands nonnegative under the CASE, so trunc-div == floor-div in
    # both engines (the Python-vs-DuckDB // trap does not bite).
    lo = (
        f"CASE WHEN pos + 1 <= {CHUNK_SIZE} THEN 0 ELSE "
        + P.int_div(
            f"(pos - {CHUNK_SIZE} + {CHUNK_STRIDE})", str(CHUNK_STRIDE), dialect
        )
        + " END"
    )
    hi = P.int_div("pos", str(CHUNK_STRIDE), dialect)
    if dialect == "spark":
        fan = f"explode(sequence({lo}, {hi}))"
        chunk_rows = (
            f"SELECT doc_id, pos, h, chunk FROM th "
            f"LATERAL VIEW {fan} _c AS chunk"
        )
    else:
        chunk_rows = (
            f"SELECT doc_id, pos, h, unnest(generate_series({lo}, {hi})) "
            f"AS chunk FROM th"
        )
    return f"""
WITH tok AS ({rows}),
th AS (SELECT doc_id, pos, {h} AS h FROM tok),
ch AS ({chunk_rows})
SELECT doc_id, CAST(chunk AS BIGINT) AS chunk_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(MIN(pos) AS BIGINT) AS first_pos,
       CAST(MAX(pos) AS BIGINT) AS last_pos,
       CAST(SUM((pos - chunk * {CHUNK_STRIDE} + 1) * h) % {P.HASH_P}
            AS BIGINT) AS sig
FROM ch
GROUP BY doc_id, chunk
ORDER BY doc_id, chunk_id
"""


def datasheet_sql(dialect: str, table: str = "documents") -> str:
    """Corpus datasheet rollup ("Datasheets for Datasets", Gebru et al.
    arXiv:1803.09010 — the quantitative half): per (lang, source)
    slice, the document/token volumes, exact-dup rate (distinct
    fingerprints vs docs), median length, and mean quality score that a
    dataset card reports per shard.

    One scan: every per-doc statistic (token count, fingerprint,
    quality) is a generated portable expression fused into the scan,
    then a single (lang, source) hash aggregate — map-side combinable
    except the exact median and distinct-fingerprint count, both
    per-GROUP (never global) sorts/sets. Mean quality runs through a
    per-row DECIMAL cast so the sum is order-independent; the median
    lands on the exact 0.5 grid and is doubled into a BIGINT."""
    from .text import fingerprint_expr, quality_expr, token_count_expr

    tok = token_count_expr("text", dialect)
    fp = fingerprint_expr("text", dialect)
    q = quality_expr("text", dialect)
    return f"""
WITH base AS (
  SELECT lang, source, n_chars,
         {tok} AS n_tokens, {fp} AS fp, {q} AS quality
  FROM {table}
)
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_distinct_fp,
       CAST(2 * median(n_chars) AS BIGINT) AS median_chars_x2,
       round(CAST(SUM(CAST(quality AS DECIMAL(18,9))) AS DOUBLE)
             / COUNT(*), 6) AS avg_quality
FROM base
GROUP BY lang, source
ORDER BY lang, source"""


def lm_perplexity_sql(
    dialect: str, table: str = "documents", th_table: str | None = None,
    bg_table: str | None = None,
) -> str:
    """Per-document bigram-LM negative log-likelihood — the CCNet /
    Gopher "perplexity filter" scored for real (Wenzek et al.
    arXiv:1911.00359 rank corpora by LM perplexity; q120 expresses the
    same decision as a rank statistic, this operator produces the
    actual score): add-one-smoothed bigram model trained on the corpus
    itself, each doc scored by its mean −ln P(b|a).

    Determinism across engines: ln() is evaluated ONCE per distinct
    bigram TYPE (the q181 PPMI rule), then frozen into DECIMAL(18,12)
    so the per-document summation over occurrences is exact integer
    arithmetic — order-independent on any partition layout; the one
    double division happens after the exact sum. Plan shape: two hash
    aggregates over the token index (bigram/unigram counts), one
    (a, b) hash join back to occurrences, one per-doc aggregate — all
    map-side combinable, linear in corpus tokens."""
    from .dedup import th_cte

    if bg_table is not None:
        # Spark side: bgv is the cached bigram-occurrence artifact
        # (dedup.bigram_rows_view). CTE inlining re-ran the tokenize+
        # window derivation per reference (bgv is read three times:
        # cab, ca, and the per-doc scoring join); th stays for vv.
        bgv = f"bgv AS (SELECT doc_id, a, b FROM {bg_table})"
    else:
        bgv = """bg AS (
  SELECT doc_id, h AS a, lead(h) OVER (PARTITION BY doc_id ORDER BY pos) AS b
  FROM th
),
bgv AS (SELECT doc_id, a, b FROM bg WHERE b IS NOT NULL)"""
    return f"""
WITH {th_cte(dialect, table, th_table)},
{bgv},
cab AS (SELECT a, b, COUNT(*) AS cab FROM bgv GROUP BY a, b),
ca AS (SELECT a, COUNT(*) AS ca FROM bgv GROUP BY a),
vv AS (SELECT COUNT(DISTINCT h) AS v FROM th),
lp AS (
  -- operands forced to DOUBLE: a bare 1.0 literal is DECIMAL in both
  -- dialects and would drag the smoothing division into engine-
  -- specific decimal scales before ln sees it
  SELECT c.a, c.b,
         CAST(ln(CAST(c.cab + 1 AS DOUBLE) / CAST(ca.ca + vv.v AS DOUBLE))
              AS DECIMAL(18,12)) AS lnp
  FROM cab c JOIN ca ON c.a = ca.a CROSS JOIN vv
)
SELECT o.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       round(CAST(-SUM(l.lnp) AS DOUBLE) / COUNT(*), 6) AS avg_nll
FROM bgv o JOIN lp l ON o.a = l.a AND o.b = l.b
GROUP BY o.doc_id
ORDER BY o.doc_id"""


def k_anonymity_sql(
    dialect: str, customer: str = "customer", k: int = 5
) -> str:
    """k-anonymity / l-diversity re-identification audit (Sweeney 2002;
    Machanavajjhala 2007) — the privacy-governance counterpart to the
    q121 PII detector: group records by their quasi-identifier tuple
    (nation, account-balance decile band), measure each equivalence
    class's size (k) and its count of distinct sensitive values
    (l, sensitive = market segment), and report the per-(k-band,
    l-band) histogram plus how many ROWS a k-threshold suppression
    would drop. A release is k-anonymous iff min class size >= k and
    l-diverse iff every class carries >= l distinct sensitive values.

    All-integer: deciles come from integer floor-division of the
    integer-cast balance (never a percentile sketch, so both engines
    band identically); outputs are counts. One (quasi-id) aggregate +
    one tiny histogram aggregate — two map-side-combinable shuffles,
    no windows, no joins bigger than the class relation."""
    from . import portable as P

    # floor() BEFORE the integer cast: bare CAST(double AS BIGINT)
    # truncates in Spark but ROUNDS in DuckDB — a balance of 199.99
    # would band differently at the 1200-boundary
    band = P.int_div(
        "(CAST(floor(c_acctbal) AS BIGINT) + 1000)", "1200", dialect
    )
    return f"""
WITH classes AS (
  SELECT c_nationkey AS nation, {band} AS bal_band,
         CAST(COUNT(*) AS BIGINT) AS k_size,
         CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l_div
  FROM {customer}
  GROUP BY c_nationkey, {band}
)
SELECT
  CASE WHEN k_size >= {k} THEN 'k_ok' ELSE 'k_violation' END AS k_band,
  CASE WHEN l_div >= 2 THEN 'l_ok' ELSE 'l_violation' END AS l_band,
  CAST(COUNT(*) AS BIGINT) AS n_classes,
  CAST(SUM(k_size) AS BIGINT) AS n_rows,
  CAST(MIN(k_size) AS BIGINT) AS min_k,
  CAST(MIN(l_div) AS BIGINT) AS min_l
FROM classes
GROUP BY 1, 2
ORDER BY k_band, l_band"""


def pseudonymize_sql(
    dialect: str, customer: str = "customer", orders: str = "orders"
) -> str:
    """Keyed pseudonymization with referential-integrity audit (q234) —
    the GDPR-pipeline step q121's REDACTION cannot express: replace the
    natural key with a deterministic keyed surrogate consistently
    across EVERY table that carries it, so downstream joins still work
    while the raw identifier disappears from the data plane.

    Surrogate = two independently-peppered portable polynomial hashes
    concatenated (62 bits of space, so accidental collisions are
    negligible — and AUDITED, not assumed: ``collisions`` must read 0).
    The gate emits per-segment order counts joined BOTH ways — through
    the surrogate and through the raw key — as separate columns whose
    equality IS the referential-integrity proof (a surrogate collision
    or instability would split or merge join groups and break it).

    Production note: the pepper lives in the expression here because
    the oracle must replay it; a deployment injects it as a secret
    config. Shape at 100 TB: the surrogate is per-row codegen (no UDF,
    no shuffle); the audit joins are the same broadcast-dim joins the
    raw key would take.
    """
    str_t = "STRING" if dialect == "spark" else "VARCHAR"

    def pseud(key: str) -> str:
        h1 = P.rolling_hash(f"concat('s1:', CAST({key} AS {str_t}))", dialect)
        h2 = P.rolling_hash(f"concat('s2:', CAST({key} AS {str_t}))", dialect)
        return (
            f"concat(CAST({h1} AS {str_t}), '-', CAST({h2} AS {str_t}))"
        )

    return f"""
WITH cmap AS (
  SELECT c_custkey, {pseud('c_custkey')} AS pseud, c_mktsegment
  FROM {customer}
),
audit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(COUNT(DISTINCT pseud) AS BIGINT) AS n_pseud
  FROM cmap
),
o AS (
  SELECT o_custkey, {pseud('o_custkey')} AS pseud FROM {orders}
),
via_pseud AS (
  SELECT m.c_mktsegment, COUNT(*) AS n_orders_pseud
  FROM o JOIN cmap m ON o.pseud = m.pseud
  GROUP BY m.c_mktsegment
),
via_raw AS (
  SELECT m.c_mktsegment, COUNT(*) AS n_orders_raw
  FROM {orders} r JOIN cmap m ON r.o_custkey = m.c_custkey
  GROUP BY m.c_mktsegment
)
SELECT m.c_mktsegment,
       CAST(COUNT(DISTINCT m.pseud) AS BIGINT) AS n_customers,
       CAST(MAX(p.n_orders_pseud) AS BIGINT) AS n_orders_pseud,
       CAST(MAX(r.n_orders_raw) AS BIGINT) AS n_orders_raw,
       CAST(MAX(a.n_keys - a.n_pseud) AS BIGINT) AS collisions
FROM cmap m
JOIN via_pseud p ON m.c_mktsegment = p.c_mktsegment
JOIN via_raw r ON m.c_mktsegment = r.c_mktsegment
CROSS JOIN audit a
GROUP BY m.c_mktsegment
ORDER BY m.c_mktsegment"""


def augment_dropout_sql(
    dialect: str,
    table: str = "documents",
    th_table: str | None = None,
    variants: int = 2,
    drop_mod: int = 10,
) -> str:
    """Deterministic data augmentation by token dropout (q243, the EDA
    random-deletion op of Wei & Zou 1901.11196 made reproducible):
    ``variants`` augmented copies per document, variant v dropping
    exactly the tokens where ``(h + pos + v) % drop_mod = 0`` — a
    pure expression over the shared token-hash stream, so the SAME
    augmented dataset materializes on any cluster layout, any retry,
    any engine (RNG-based augmentation can't be audited or resumed;
    this can). Emits per-(doc, variant) the kept-token count and an
    order-sensitive checksum (Σ h·rank over surviving positions — a
    token swap or drop anywhere changes it), so the gate pins content
    AND order, not just counts.

    Shape at 100 TB: the dropout predicate and variant fan-out are
    per-row expressions off the cached tokhash artifact (constant
    ``variants``x row growth, no joins); the rank is a per-(doc,
    variant) window — partitions bounded by document length, the same
    class as every tokenizer stage."""
    from .dedup import th_cte

    vs = " UNION ALL ".join(f"SELECT {v} AS v" for v in range(variants))
    return f"""
WITH {th_cte(dialect, table, th_table)},
aug AS (
  SELECT t.doc_id, t.pos, t.h, vs.v
  FROM th t CROSS JOIN ({vs}) vs
  WHERE (t.h + t.pos + vs.v) % {drop_mod} <> 0
),
ranked AS (
  SELECT doc_id, v, h,
         row_number() OVER (PARTITION BY doc_id, v ORDER BY pos) AS r
  FROM aug
)
SELECT doc_id,
       CAST(v AS BIGINT) AS variant,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(h * r) AS BIGINT) AS order_checksum
FROM ranked
GROUP BY doc_id, v
ORDER BY doc_id, variant"""


PII_PATTERNS = (
    # (type, portable regex — RE2-safe AND java.util.regex-safe: no
    # backreferences, no lookaround; literal dots as [.] classes so the
    # pattern survives BOTH engines' string-literal escape rules with
    # zero backslashes in the SQL text)
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"),
    ("phone", "[0-9]{3}-[0-9]{3}-[0-9]{4}"),
    ("ipv4", "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"),
    ("ssn", "[0-9]{3}-[0-9]{2}-[0-9]{4}"),
)


def pii_scan_sql(dialect: str, table: str = "documents") -> str:
    """PII detection scan (q267): per (source, pii_type), how many
    documents contain at least one match and how many total matches —
    the inventory that drives scrub-before-train decisions (the
    detection side of q234's pseudonymization; cf. the PII filtering
    stages in CCNet/RefinedWeb/Dolma pipelines, which regex-scan for
    emails/phones/IPs before release).

    The synthetic corpus carries no organic PII, so the scan runs over
    a deterministically AUGMENTED text: docs at fixed doc_id residues
    get an email / phone / IPv4 / SSN-shaped token appended — built
    with the same integer-derived digits in both dialects, making the
    expected counts non-trivial and hash-checkable (a scan gate that
    only ever reports zero proves nothing). The augmentation is the
    fixture; the OPERATOR is the (type x source) regex-count aggregate.

    Portability: patterns avoid every RE2/java.util.regex divergence
    (no lookaround, no backreferences, no \\b — DuckDB's RE2 treats \\b
    as backspace in some quoting layers); counting is
    ``regexp_count`` on Spark and ``len(regexp_extract_all(...))`` on
    DuckDB — both count non-overlapping leftmost matches. SSN-shaped
    and phone-shaped strings intersect, and both engines agree because
    the patterns are anchored only by their own shape.

    Scale: one projection + one (source, type) x corpus aggregate per
    pattern, unioned — 4 map-side-combinable passes over the text (or
    one pass of 8 counters after Catalyst's common-subexpression
    collapse), no joins, no shuffle beyond the |sources x types|-row
    aggregate. 100 TB shape = word count."""
    digits = "CAST(10000 + (doc_id % 8999) AS " + (
        "VARCHAR" if dialect == "duckdb" else "STRING") + ")"
    octet = "CAST(1 + (doc_id % 254) AS " + (
        "VARCHAR" if dialect == "duckdb" else "STRING") + ")"
    aug = f"""
  SELECT source, doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' mail u' || CAST(doc_id AS {"VARCHAR" if dialect == "duckdb" else "STRING"}) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' call 555-201-' || substr({digits}, 2, 4)
                 ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN ' host 10.0.' || {octet} || '.' || {octet}
                 ELSE '' END
         || CASE WHEN doc_id % 17 = 0
                 THEN ' id 078-05-' || substr({digits}, 2, 4)
                 ELSE '' END AS text
  FROM {table}"""
    if dialect == "duckdb":
        def cnt(pat):
            return f"len(regexp_extract_all(text, '{pat}'))"
    else:
        def cnt(pat):
            return f"regexp_count(text, '{pat}')"
    arms = " UNION ALL ".join(
        f"SELECT source, '{name}' AS pii_type, {cnt(pat)} AS c FROM aug"
        for name, pat in PII_PATTERNS
    )
    return f"""
WITH aug AS ({aug}),
hits AS ({arms})
SELECT source, pii_type,
       CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
       CAST(SUM(c) AS BIGINT) AS n_hits
FROM hits
GROUP BY source, pii_type
ORDER BY source, pii_type"""


# ---------------------------------------------------------------------------
# stratified sampling with exact largest-remainder allocation
# ---------------------------------------------------------------------------


def stratified_sample_sql(
    dialect: str, table: str = "documents", denom: int = 10
) -> str:
    """Deterministic stratified sample of the corpus: a 1/``denom``
    budget allocated across language strata by the largest-remainder
    method (exact integer apportionment — Σ quotas == budget, never
    off-by-one from float rounding), then WITHIN each stratum the
    quota is filled by ascending uniformized key hash — a sample that
    any re-run, any engine, and any partitioning reproduces
    bit-identically. This is the data-mixture primitive that sits
    under q82/q122's mixture weights: those decide how much of each
    stratum, this decides (reproducibly) WHICH rows.

    Allocation: base_h = floor(N·c_h / C); the N − Σ base_h leftover
    units go to the strata with the largest remainders
    ((N·c_h) mod C, lang tie-break) — Hamilton's method, all BIGINT.

    Selection: rank docs per stratum by (:func:`~.sketches._mix`-ed
    doc_id hash, doc_id) and keep rank ≤ quota — i.e. a per-stratum
    bottom-k by hash. At gate scale a per-stratum window expresses it;
    at 100 TB the identical semantics run as the bounded two-pass
    grouped top-k of ``operators/rank.grouped_row_number`` (k = quota
    per stratum — per-partition heap + merge, no global sort), so the
    operator's scale path is already in the repo.

    Output: the sampled rows (doc_id, lang, in-stratum rank, quota) —
    hash-gated end-to-end, so allocation AND membership are verified.
    """
    from .sketches import _mix

    s = "STRING" if dialect == "spark" else "VARCHAR"
    hv = _mix(P.rolling_hash(f"CAST(doc_id AS {s})", dialect))
    base = P.int_div("(t.n * c.c)", "t.c_all", dialect)
    return f"""
WITH c AS (SELECT lang, COUNT(*) AS c FROM {table} GROUP BY lang),
t AS (
  SELECT CAST(SUM(c) AS BIGINT) AS c_all,
         CAST({P.int_div('SUM(c)', str(denom), dialect)} AS BIGINT) AS n
  FROM c
),
alloc AS (
  SELECT c.lang, c.c, {base} AS b, (t.n * c.c) % t.c_all AS rem
  FROM c CROSS JOIN t
),
quota AS (
  SELECT lang, b + CASE WHEN row_number() OVER
             (ORDER BY rem DESC, lang) <= t.n - SUM(b) OVER ()
           THEN 1 ELSE 0 END AS q
  FROM alloc CROSS JOIN t
),
rk AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY {hv}, doc_id)
           AS rk
  FROM {table}
)
SELECT r.doc_id, r.lang, CAST(r.rk AS BIGINT) AS rk,
       CAST(q.q AS BIGINT) AS quota
FROM rk r JOIN quota q ON q.lang = r.lang
WHERE r.rk <= q.q
ORDER BY r.lang, r.rk
"""


# ---------------------------------------------------------------------------
# DSIR — data selection by importance resampling (hashed n-gram features)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 256
DSIR_TOPK = 50


def dsir_sql(
    dialect: str,
    table: str = "documents",
    th_table: str | None = None,
    buckets: int = DSIR_BUCKETS,
    topk: int = DSIR_TOPK,
) -> str:
    """DSIR importance scoring (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023
    arXiv:2302.03169): score every raw document by how much more
    likely its hashed token features are under the TARGET distribution
    (here: the English slice, standing in for any curated target set)
    than under the raw corpus, and keep the top-k. The standard
    select-like-the-target pass that runs before pretraining mixes.

    Features: the shared token-hash artifact (th) bucketed to
    ``buckets`` hashed-unigram features — the same hash-and-bucket
    trick as the paper's hashed n-grams, reusing the tokenize-once
    relation every other text operator shares. Feature log-ratios
    w(b) = ln p_tgt(b) − ln p_raw(b) (add-one smoothed) are computed
    ONCE per bucket and frozen into DECIMAL(18,12) — the q200 rule —
    so each document's score Σ_occurrences w(bucket) is exact decimal
    arithmetic, order-independent on any partition layout; the single
    double rounding happens at output.

    Shape at 100 TB: two bucket-count aggregates (≤ ``buckets`` rows
    each, map-side combinable), one broadcast-sized join of
    occurrences against the 256-row weight relation, one per-doc
    aggregate, and a bounded top-k (TakeOrderedAndProject). Nothing
    wider than the token stream itself ever shuffles.

    Probe bound (r8, 10× ratio ~3× measured twice): the cost is the
    token-linear scan-and-sum leaving the fixed per-query floor —
    10× tokens ran 3× the wall, i.e. SUBLINEAR in data, with no
    growing join or shuffle term (the weight relation is a constant
    256 rows at any corpus size). Nothing compounds at 100×."""
    from .dedup import th_cte

    d = "DOUBLE"
    return f"""
WITH {th_cte(dialect, table, th_table)},
feat AS (SELECT doc_id, h % {buckets} AS b FROM th),
raw AS (SELECT b, COUNT(*) AS cr FROM feat GROUP BY b),
tgt AS (
  SELECT f.b, COUNT(*) AS ct
  FROM feat f JOIN {table} dd ON dd.doc_id = f.doc_id
  WHERE dd.lang = 'en'
  GROUP BY f.b
),
tots AS (
  SELECT (SELECT CAST(SUM(cr) AS BIGINT) FROM raw) AS r_all,
         (SELECT CAST(SUM(ct) AS BIGINT) FROM tgt) AS t_all
),
w AS (
  SELECT r.b,
         CAST(ln(CAST(COALESCE(t.ct, 0) + 1 AS {d})
                 / CAST(tt.t_all + {buckets} AS {d}))
              - ln(CAST(r.cr + 1 AS {d})
                   / CAST(tt.r_all + {buckets} AS {d}))
              AS DECIMAL(18,12)) AS w
  FROM raw r LEFT JOIN tgt t ON t.b = r.b CROSS JOIN tots tt
),
score AS (
  SELECT f.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats, SUM(w.w) AS s
  FROM feat f JOIN w ON w.b = f.b
  GROUP BY f.doc_id
)
SELECT doc_id, n_feats, round(CAST(s AS {d}), 6) AS dsir_score
FROM score
ORDER BY s DESC, doc_id
LIMIT {topk}
"""
