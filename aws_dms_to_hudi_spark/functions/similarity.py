"""Similarity search over the ``embeddings`` table (``array<float>``).

Beyond-reference training-data extensions (SURVEY.md §7 M6):

- brute-force cosine top-k  — the exact baseline: broadcast the (small)
  query set against the corpus, per-row JVM dot product, per-query top-k;
- LSH-bucketed ANN          — random-hyperplane signatures; candidates
  share a bucket in ≥1 of L tables; exact cosine re-rank of candidates;
- embedding near-duplicates — the same LSH machinery, corpus × corpus,
  cosine ≥ threshold (the "embedding-cosine near-dup" dedup signal).

All math is generated once per dialect (:mod:`.portable`): left-to-right
DOUBLE folds make Spark and DuckDB produce bit-identical cosines, so all
three operators are value-hash oracle-checkable.

Scale design (100 TB / billions of vectors):

- brute force: queries broadcast (hint on the Spark side), corpus
  streams — one scan, no shuffle until the tiny per-query top-k window
  (shuffle key = query id, k rows survive per partition);
- ANN: bucket assignment is a projection; the candidate join shuffles on
  (table, bucket) only — vectors in different buckets never meet. L and
  the plane count trade recall vs candidate volume; at 100 TB you'd also
  partition the stored corpus BY bucket so the join is co-located;
- hyperplanes are literal constants baked into the plan (no side input).
"""

from __future__ import annotations

import random

from . import portable as P

DIM = 64
# 4 planes × 4 tables: 16 buckets/table, OR-amplified across tables.
# Plane count sets bucket selectivity (≈ corpus/2^planes vectors per
# bucket): scale it UP as the corpus grows to keep candidate sets
# bounded — at 10^9 vectors you'd run 16-20 planes; at the 500-vector
# fixture, 4 keeps per-bucket occupancy high enough for useful recall.
NUM_TABLES = 4      # L independent LSH tables (OR-amplification)
PLANES_PER_TABLE = 4

# Fixed-seed hyperplanes, rounded to 4dp so both engines parse the exact
# same literal; values in [-0.5, 0.5].
_rng = random.Random(7)
HYPERPLANES: list[list[list[float]]] = [
    [
        [round(_rng.random() - 0.5, 4) for _ in range(DIM)]
        for _ in range(PLANES_PER_TABLE)
    ]
    for _ in range(NUM_TABLES)
]


def _plane_dot(vec: str, coeffs: list[float], dialect: str) -> str:
    """Literal-coefficient dot product; `+` chains are left-associative
    in both engines, so the DOUBLE accumulation order is identical."""
    return " + ".join(
        f"CAST({P.element(vec, str(i + 1), dialect)} AS DOUBLE) * ({c})"
        for i, c in enumerate(coeffs)
    )


def bucket_expr(vec: str, table_idx: int, dialect: str) -> str:
    """Pack the sign bits of the plane dot products into one int bucket."""
    bits = " + ".join(
        f"(CASE WHEN {_plane_dot(vec, HYPERPLANES[table_idx][j], dialect)}"
        f" > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(PLANES_PER_TABLE)
    )
    return f"CAST({bits} AS BIGINT)"


def _cos(a: str, b: str, dialect: str) -> str:
    return P.cosine(a, b, DIM, dialect)


# ---------------------------------------------------------------------------
# brute-force cosine top-k
# ---------------------------------------------------------------------------


def cosine_topk_sql(
    dialect: str,
    table: str = "embeddings",
    num_queries: int = 5,
    k: int = 3,
) -> str:
    """Exact top-k neighbors (cosine) for each of the first ``num_queries``
    vectors. The BROADCAST hint pins the replicate-the-tiny-side plan in
    Spark; DuckDB reads it as a plain comment."""
    return f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM {table}
           WHERE vec_id < {num_queries}),
scored AS (
  SELECT /*+ BROADCAST(q) */ q.q_id, e.vec_id AS neighbor_id,
         {_cos('q.q_emb', 'e.embedding', dialect)} AS cos_sim
  FROM q JOIN {table} e ON e.vec_id <> q.q_id
),
ranked AS (
  SELECT q_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM scored
)
SELECT q_id, neighbor_id, round(cos_sim, 6) AS cos_sim
FROM ranked WHERE rn <= {k}
ORDER BY q_id, neighbor_id
"""


# ---------------------------------------------------------------------------
# LSH-bucketed ANN
# ---------------------------------------------------------------------------


def _buckets_cte(dialect: str, src: str) -> str:
    """``buckets(vec_id, embedding, tbl, bucket)`` — one row per vector
    per LSH table."""
    selects = " UNION ALL ".join(
        f"SELECT vec_id, embedding, {t} AS tbl, "
        f"{bucket_expr('embedding', t, dialect)} AS bucket FROM {src}"
        for t in range(NUM_TABLES)
    )
    return f"buckets AS ({selects})"


def ann_lsh_sql(
    dialect: str,
    table: str = "embeddings",
    num_queries: int = 5,
    k: int = 3,
    multiprobe: bool = True,
) -> str:
    """Approximate top-k: candidates = corpus vectors sharing an LSH
    bucket with the query in any table; exact cosine re-rank among
    candidates only. Same output shape as :func:`cosine_topk_sql`, so
    recall is directly measurable.

    ``multiprobe`` also probes every hamming-1 neighbor bucket of the
    query's bucket (flip one plane bit): near-misses on a single
    hyperplane are the dominant LSH failure mode, and probing them
    multiplies only the QUERY side (tiny) by planes+1 — the corpus-side
    index is untouched. Standard multiprobe-LSH recall/cost trade.
    """
    def _x(a: str, b: str) -> str:
        return f"({a} ^ {b})" if dialect == "spark" else f"xor({a}, {b})"

    probe_rows = ["SELECT vec_id, tbl, bucket FROM qb0"]
    if multiprobe:
        probe_rows += [
            f"SELECT vec_id, tbl, {_x('bucket', str(1 << j))} AS bucket FROM qb0"
            for j in range(PLANES_PER_TABLE)
        ]
    probes = " UNION ALL ".join(probe_rows)
    return f"""
WITH {_buckets_cte(dialect, table)},
qb0 AS (SELECT vec_id, tbl, bucket FROM buckets WHERE vec_id < {num_queries}),
qb AS (SELECT vec_id AS q_id, tbl, bucket FROM ({probes}) AS p),
cand AS (
  -- DISTINCT over int ids only (hashing embedding arrays in a DISTINCT
  -- key is the slow path); embeddings re-join by id for scoring.
  SELECT DISTINCT qb.q_id, e.vec_id AS neighbor_id
  FROM qb JOIN buckets e
    ON qb.tbl = e.tbl AND qb.bucket = e.bucket AND e.vec_id <> qb.q_id
),
scored AS (
  SELECT c.q_id, c.neighbor_id,
         {_cos('eq.embedding', 'en.embedding', dialect)} AS cos_sim
  FROM cand c
  JOIN {table} eq ON eq.vec_id = c.q_id
  JOIN {table} en ON en.vec_id = c.neighbor_id
),
ranked AS (
  SELECT q_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM scored
)
SELECT q_id, neighbor_id, round(cos_sim, 6) AS cos_sim
FROM ranked WHERE rn <= {k}
ORDER BY q_id, neighbor_id
"""


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicates
# ---------------------------------------------------------------------------


def embedding_neardup_sql(
    dialect: str,
    table: str = "embeddings",
    threshold: float = 0.4,
) -> str:
    """Near-duplicate vector pairs: LSH candidates (any shared bucket,
    vec_a < vec_b) with exact cosine ≥ threshold. Corpus never
    self-joins outside bucket equality — the 100 TB-safe shape."""
    return f"""
WITH {_buckets_cte(dialect, table)},
cand AS (
  -- int-id-only DISTINCT; embeddings re-join by id for the exact score
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM buckets a JOIN buckets b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
scored AS (
  SELECT c.vec_a, c.vec_b,
         {_cos('ea.embedding', 'eb.embedding', dialect)} AS cos_sim
  FROM cand c
  JOIN {table} ea ON ea.vec_id = c.vec_a
  JOIN {table} eb ON eb.vec_id = c.vec_b
)
SELECT vec_a, vec_b, round(cos_sim, 6) AS cos_sim
FROM scored WHERE cos_sim >= {threshold}
ORDER BY vec_a, vec_b
"""
