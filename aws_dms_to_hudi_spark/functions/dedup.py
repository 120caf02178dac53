"""Near-duplicate detection over the ``documents`` table.

Beyond-reference training-data extensions (SURVEY.md §7 M6):

- exact dedup            — :func:`text.exact_dedup_groups` (hash-groupBy)
- n-gram Jaccard pairs   — inverted-index self-join (no cross join)
- MinHash + LSH pairs    — signature → band → bucket-join → exact verify
- SimHash pairs          — bitwise fingerprint → chunk-join → hamming

Each operator is ONE dialect-parametric SQL text (built from
:mod:`.portable` shims) executed by ``spark.sql`` on the engine side and
by DuckDB on the oracle side — parity is by construction, and Catalyst
still plans/optimizes the Spark run (these are declarative relational
programs, not UDFs).

Scale design (100 TB corpus):

- **no O(n²) stage anywhere** — candidate generation is always an
  equi-join on a hash key (shingle hash / band key / simhash chunk), so
  it shuffles on that key and only co-bucketed docs ever meet;
- **skew**: a stop-shingle appearing in millions of docs would explode
  the inverted-index join; ``max_df`` drops shingles above a document-
  frequency cap before the join (the standard stop-shingle cut, applied
  identically in engine and oracle);
- **verify stage is cheap**: exact Jaccard runs only on candidate pairs
  (band collisions), each carrying its two pre-hashed shingle sets;
- map-side partial aggregation applies to every GROUP BY here.
"""

from __future__ import annotations

import random

from . import portable as P

# MinHash permutation constants: h_j(x) = (a_j * x + b_j) mod P.
# Fixed seed ⇒ stable across runs/engines; baked once at import.
# a_j, b_j < 2^31 and shingle hash < 2^31 ⇒ products < 2^62: exact in
# int64 for both engines (DuckDB would raise on overflow; none occurs).
_rng = random.Random(42)
NUM_HASHES = 16
MINHASH_AB: list[tuple[int, int]] = [
    (_rng.randrange(1, P.HASH_P), _rng.randrange(0, P.HASH_P))
    for _ in range(NUM_HASHES)
]
NUM_BANDS = 4          # 4 bands × 4 rows: P(candidate) = 1-(1-j^4)^4
ROWS_PER_BAND = NUM_HASHES // NUM_BANDS

SIMHASH_BITS = 30      # fits int64 with headroom; 3 chunks × 10 bits
SIMHASH_CHUNKS = 3     # hamming ≤ 2 ⇒ pigeonhole: ≥1 chunk equal
CHUNK_BITS = SIMHASH_BITS // SIMHASH_CHUNKS


def _explode(dialect: str, select: str, src: str, arr: str, alias: str) -> str:
    """Dialect shim for exploding a list column into rows."""
    if dialect == "spark":
        return (
            f"SELECT {select}, {alias} FROM {src} "
            f"LATERAL VIEW explode({arr}) _x AS {alias}"
        )
    return f"SELECT {select}, unnest({arr}) AS {alias} FROM {src}"


def _xor(a: str, b: str, dialect: str) -> str:
    return f"({a} ^ {b})" if dialect == "spark" else f"xor({a}, {b})"


def _sets_cte(dialect: str, table: str, ngram: int, max_df: int | None) -> str:
    """CTE chain producing ``sets(doc_id, sh)``: the distinct n-gram
    shingle-hash set per doc, optionally stop-shingle-capped."""
    sh = P.shingle_hashes("text", ngram, dialect)
    base = (
        f"raw_sets AS (SELECT doc_id, {sh} AS sh FROM {table}), "
        f"nonempty AS (SELECT * FROM raw_sets WHERE {P.size('sh', dialect)} > 0)"
    )
    if max_df is None:
        return base + ", sets AS (SELECT * FROM nonempty)"
    # document frequency per shingle -> keep shingles with df <= max_df;
    # rebuilding the per-doc set via the inverted index keeps both
    # dialects on the identical relational path.
    inv = _explode(dialect, "doc_id", "nonempty", "sh", "g")
    collect = (
        "array_sort(collect_list(g))" if dialect == "spark" else "list_sort(list(g))"
    )
    return (
        base
        + f", inv AS ({inv})"
        + f", df AS (SELECT g, COUNT(*) AS df FROM inv GROUP BY g)"
        + f", kept AS (SELECT i.doc_id, i.g FROM inv i JOIN df ON i.g = df.g"
        + f"           WHERE df.df <= {max_df})"
        + f", sets AS (SELECT doc_id, {collect} AS sh FROM kept GROUP BY doc_id)"
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------


def ngram_jaccard_sql(
    dialect: str,
    table: str = "documents",
    ngram: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> str:
    """Pairs (doc_a < doc_b) with n-gram-shingle Jaccard ≥ threshold.

    Inverted-index formulation: explode shingle hashes, equi-join on the
    hash (only docs sharing a shingle meet), count co-occurrences, then
    |A∩B| / (|A| + |B| - |A∩B|). Integer counts divide in DOUBLE, so the
    value is bit-identical across engines.
    """
    inv = _explode(dialect, "doc_id", "sets", "sh", "g")
    return f"""
WITH {_sets_cte(dialect, table, ngram, max_df)},
sizes AS (SELECT doc_id, {P.size('sh', dialect)} AS n FROM sets),
inv AS ({inv}),
co AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT co.doc_a, co.doc_b,
       round(CAST(co.inter AS DOUBLE)
             / CAST(sa.n + sb.n - co.inter AS DOUBLE), 6) AS jaccard
FROM co
JOIN sizes sa ON co.doc_a = sa.doc_id
JOIN sizes sb ON co.doc_b = sb.doc_id
WHERE CAST(co.inter AS DOUBLE) / CAST(sa.n + sb.n - co.inter AS DOUBLE)
      >= {threshold}
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _minhash_col(j: int, dialect: str) -> str:
    a, b = MINHASH_AB[j]
    perm = P.transform("sh", "h", f"(({a} * h + {b}) % {P.HASH_P})", dialect)
    fn = "array_min" if dialect == "spark" else "list_min"
    return f"{fn}({perm})"


def minhash_lsh_sql(
    dialect: str,
    table: str = "documents",
    ngram: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> str:
    """MinHash-LSH near-dup pairs with exact-Jaccard verification.

    shingle set → 16 minhashes → 4 bands of 4 → docs sharing any band
    key become candidates (equi-join on the band key: the only shuffle
    that touches every doc) → exact Jaccard on the candidate pairs only
    → filter ≥ threshold. Emits the same columns as the exact operator,
    so recall is directly measurable against :func:`ngram_jaccard_sql`.
    """
    sig_cols = ", ".join(
        f"{_minhash_col(j, dialect)} AS m{j}" for j in range(NUM_HASHES)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, concat_ws(',', "
        + ", ".join(f"m{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
        + ") AS bkey FROM sig"
        for b in range(NUM_BANDS)
    )
    inter = (
        "size(array_intersect(sa.sh, sb.sh))"
        if dialect == "spark"
        else "len(list_intersect(sa.sh, sb.sh))"
    )
    return f"""
WITH {_sets_cte(dialect, table, ngram, max_df)},
sig AS (SELECT doc_id, sh, {sig_cols} FROM sets),
bands AS ({band_selects}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
verified AS (
  SELECT c.doc_a, c.doc_b, {inter} AS inter,
         {P.size('sa.sh', dialect)} AS na, {P.size('sb.sh', dialect)} AS nb
  FROM cand c
  JOIN sets sa ON c.doc_a = sa.doc_id
  JOIN sets sb ON c.doc_b = sb.doc_id
)
SELECT doc_a, doc_b,
       round(CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE), 6)
         AS jaccard
FROM verified
WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= {threshold}
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_sql(
    dialect: str,
    table: str = "documents",
    max_hamming: int = 2,
) -> str:
    """SimHash near-dup pairs: 30-bit frequency-weighted simhash, chunk
    LSH (3 × 10 bits; hamming ≤ 2 ⇒ at least one chunk equal by
    pigeonhole), exact hamming verify via bit_count(xor).

    Relational formulation (explode → count → 30 conditional sums) keeps
    every stage a hash aggregate / equi-join — the same shape at 100 TB.
    """
    toks = P.tokens("text", dialect)
    tok_rows = _explode(dialect, "doc_id", "toked", "toks", "t")
    bit_sums = ", ".join(
        "SUM(cnt * (CASE WHEN "
        + P.int_div("h", str(1 << b), dialect)
        + f" % 2 = 1 THEN 1 ELSE -1 END)) AS s{b}"
        for b in range(SIMHASH_BITS)
    )
    combine = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    chunk_selects = " UNION ALL ".join(
        "SELECT doc_id, simhash, "
        f"{c} AS chunk, "
        + P.int_div("simhash", str(1 << (c * CHUNK_BITS)), dialect)
        + f" % {1 << CHUNK_BITS} AS ckey FROM sh"
        for c in range(SIMHASH_CHUNKS)
    )
    ham = f"bit_count({_xor('a.simhash', 'b.simhash', dialect)})"
    return f"""
WITH toked AS (SELECT doc_id, {toks} AS toks FROM {table}),
tok AS ({tok_rows}),
tf AS (SELECT doc_id, t, COUNT(*) AS cnt FROM tok GROUP BY doc_id, t),
th AS (SELECT doc_id, cnt, {P.rolling_hash('t', dialect)} AS h FROM tf),
bits AS (SELECT doc_id, {bit_sums} FROM th GROUP BY doc_id),
sh AS (SELECT doc_id, CAST({combine} AS BIGINT) AS simhash FROM bits),
chunks AS ({chunk_selects}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM chunks a JOIN chunks b
    ON a.chunk = b.chunk AND a.ckey = b.ckey AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST({ham.replace('a.simhash', 'sh_a').replace('b.simhash', 'sh_b')} AS BIGINT) AS hamming
FROM cand
WHERE {ham.replace('a.simhash', 'sh_a').replace('b.simhash', 'sh_b')} <= {max_hamming}
ORDER BY doc_a, doc_b
"""
