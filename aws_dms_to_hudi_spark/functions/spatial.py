"""Grid-bucketed spatial neighbor join — the classic scale pattern for
"find everything within radius R of each point" without a cross product:
hash every point into a square grid cell of side >= R, probe each point
against its 3x3 cell neighborhood, and run the exact distance predicate
only on those candidates. Candidate volume is density-bounded (9 cells
per probe), so the join survives 100 TB where a theta-join on the
distance predicate would be a cartesian.

Densification remedy (the ``cell_cap`` parameter): under constant-AREA
scale-up (more entities over more territory) candidates and answer are
linear and the plain grid join is enough. Under DENSIFICATION (more
points over the same span — exactly what the 10x probe does) the true
in-radius pair count is quadratic by construction and no plan can beat
the size of the answer; the only scale-safe contract is to bound the
answer. ``cell_cap=K`` keeps the K lowest-id points of each cell as
*participants* on BOTH sides of the candidate join, so candidate pairs
are bounded by 9 * occupied_cells * K^2 — **constant in N** — and the
remaining linear costs are the scan and the per-cell rank. Every point
still surfaces in the output (LEFT JOIN back to the full point set)
with a ``profiled`` flag: TRUE means the point participated and its
neighbor profile is exact *within the participant sample*; FALSE means
the point was thinned from a saturated cell. The cap is a deterministic
sample rule (lowest id), so the capped result is itself exact,
engine-independent semantics — the cross-engine hash gate stays
bit-exact. ``cell_cap=None`` is the exact uncapped join (``profiled``
is constantly TRUE).

The per-cell rank that implements the cap partitions by (cx, cy) —
high-cardinality, density-bounded partitions over the NARROW point
relation (id, x, y, cell: ~40 bytes/row), so even a 10^8-point hot
cell ranks in one task at a few GB; for corpora beyond that, pre-thin
with a deterministic id-hash filter sized from the per-cell counts
(one map-side-combinable COUNT agg) before ranking.

Coordinates are synthesized deterministically from the record key with
Lehmer-style integer multipliers (pure modular arithmetic, identical on
any engine — the fixture rule used throughout the repo), and distances
stay in exact int64 squared-distance space: no trigonometry, no floats,
so the cross-engine hash gate is bit-exact. A production geodesic
variant swaps the coordinate derivation for projected coordinates and
the predicate for haversine; the bucketing algebra is unchanged.
"""

from __future__ import annotations

# Grid cell side == radius: any point within RADIUS of a probe lies in
# the probe's 3x3 cell neighborhood (|dx|,|dy| <= R <= G per axis).
SPAN = 100_000  # coordinate space [0, SPAN)^2
GRID = 2_000
RADIUS = 2_000
_AX, _AY = 48_271, 69_621  # Lehmer multipliers (Park-Miller family)

# Default participant cap used by the q211 gate: ~6 points/cell at
# sf0.1, so the cap barely binds at test scale but clamps the probe's
# 10x densification to a constant candidate volume.
CELL_CAP = 8


def grid_parts_sql(
    dialect: str, customer: str = "customer", cell_cap: int | None = CELL_CAP
) -> str:
    """The participant relation of :func:`grid_neighbors_sql` alone:
    (id, x, y, cx, cy) after the per-cell cap rank. Spark consumers
    materialize this ONCE and pass it back as ``parts_table`` — the
    neighbor-join text references ``parts`` three times (probe side,
    build side, profiled-flag join) and Spark inlines CTEs, so the
    rank window otherwise runs three times (r8, guide §2.4)."""
    from . import portable as P

    div = lambda a, b: P.int_div(a, b, dialect)  # noqa: E731
    if cell_cap is None:
        rank = "SELECT id, x, y, cx, cy FROM cells"
    else:
        rank = f"""SELECT id, x, y, cx, cy FROM (
    SELECT id, x, y, cx, cy,
           row_number() OVER (PARTITION BY cx, cy ORDER BY id) AS rn
    FROM cells
  ) rc WHERE rn <= {int(cell_cap)}"""
    return f"""
WITH pts AS (
  SELECT CAST(c_custkey AS BIGINT) AS id,
         CAST((c_custkey * {_AX}) % {SPAN} AS BIGINT) AS x,
         CAST((c_custkey * {_AY}) % {SPAN} AS BIGINT) AS y
  FROM {customer}
),
cells AS (
  SELECT id, x, y, {div("x", GRID)} AS cx, {div("y", GRID)} AS cy FROM pts
)
{rank}"""


def grid_neighbors_sql(
    dialect: str, customer: str = "customer", cell_cap: int | None = CELL_CAP,
    parts_table: str | None = None,
) -> str:
    """Per-point neighbor count + deterministic nearest neighbor within
    ``RADIUS``, via the 3x3 grid-bucket candidate join.

    Plan shape: one projection to (id, x, y, cell); a per-cell rank
    keeps the ``cell_cap`` lowest-id participants per cell (skipped
    when ``cell_cap`` is None); the probe side explodes to its 9
    neighbor cells (constant fan-out); ONE equi-join on the cell key;
    the exact d² filter runs on candidates only. The per-point argmin
    window partitions by point id with cap-bounded partitions — never a
    global window. Points with no neighbor in range surface with
    n_neighbors = 0 and NULL nearest (LEFT JOIN back to the full point
    set), so the empty-neighborhood path is part of the contract;
    thinned points additionally carry profiled = FALSE.

    ``parts_table``: a pre-materialized :func:`grid_parts_sql` relation
    (Spark side) — the text references ``parts`` three times, so
    passing it avoids re-running the cap-rank window per reference;
    rows are identical by construction."""
    from . import portable as P

    div = lambda a, b: P.int_div(a, b, dialect)  # noqa: E731
    if dialect == "spark":
        offsets = (
            "LATERAL VIEW explode(array(-1, 0, 1)) ox AS dx "
            "LATERAL VIEW explode(array(-1, 0, 1)) oy AS dy"
        )
    else:
        offsets = (
            "CROSS JOIN (VALUES (-1), (0), (1)) AS ox(dx) "
            "CROSS JOIN (VALUES (-1), (0), (1)) AS oy(dy)"
        )
    if parts_table is not None:
        parts_cte = f"parts AS (SELECT id, x, y, cx, cy FROM {parts_table})"
    elif cell_cap is None:
        parts_cte = "parts AS (SELECT id, x, y, cx, cy FROM cells)"
    else:
        parts_cte = f"""parts AS (
  SELECT id, x, y, cx, cy FROM (
    SELECT id, x, y, cx, cy,
           row_number() OVER (PARTITION BY cx, cy ORDER BY id) AS rn
    FROM cells
  ) rc WHERE rn <= {int(cell_cap)}
)"""
    return f"""
WITH pts AS (
  SELECT CAST(c_custkey AS BIGINT) AS id,
         CAST((c_custkey * {_AX}) % {SPAN} AS BIGINT) AS x,
         CAST((c_custkey * {_AY}) % {SPAN} AS BIGINT) AS y
  FROM {customer}
),
cells AS (
  SELECT id, x, y, {div("x", GRID)} AS cx, {div("y", GRID)} AS cy FROM pts
),
{parts_cte},
probe AS (
  SELECT id, x, y, cx + dx AS cx, cy + dy AS cy
  FROM parts {offsets}
),
hits AS (
  SELECT p.id AS a, q.id AS b,
         (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y) AS d2
  FROM probe p JOIN parts q ON p.cx = q.cx AND p.cy = q.cy
  WHERE p.id <> q.id
    AND (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y)
        <= {RADIUS * RADIUS}
),
nearest AS (
  SELECT a, b AS nearest_id, d2 AS nearest_d2,
         CAST(cnt AS BIGINT) AS n_neighbors
  FROM (
    SELECT a, b, d2,
           row_number() OVER (PARTITION BY a ORDER BY d2, b) AS rn,
           COUNT(*) OVER (PARTITION BY a) AS cnt
    FROM hits
  ) AS ranked WHERE rn = 1
)
SELECT p.id, p.x, p.y,
       COALESCE(n.n_neighbors, 0) AS n_neighbors,
       n.nearest_id, n.nearest_d2,
       (pr.id IS NOT NULL) AS profiled
FROM pts p
LEFT JOIN parts pr ON p.id = pr.id
LEFT JOIN nearest n ON p.id = n.a
ORDER BY p.id"""


def grid_candidates_sql(
    dialect: str, customer: str = "customer", cell_cap: int | None = CELL_CAP
) -> str:
    """Candidate-pair COUNT of the capped grid join (before the distance
    filter) — the quantity the ``cell_cap`` bound controls. Used by the
    densification unit test to assert candidates <= 9 * occupied_cells *
    cap^2."""
    inner = grid_neighbors_sql(dialect, customer, cell_cap)
    # reuse the CTE chain up to `probe`/`parts`, count the raw equi-join
    head, _, _ = inner.rpartition("hits AS (")
    return (
        head
        + """cand AS (
  SELECT COUNT(*) AS n_candidates
  FROM probe p JOIN parts q ON p.cx = q.cx AND p.cy = q.cy
  WHERE p.id <> q.id
)
SELECT n_candidates FROM cand"""
    )
