"""Connected components over near-duplicate pair graphs.

The dedup operators (:mod:`.dedup`) emit verified near-dup PAIRS; a
curation pipeline needs dup GROUPS (keep one representative per group),
which is exactly connected components on the pair graph.

Algorithm: iterative min-label propagation — every node starts labeled
with itself; each round every node takes the minimum label among itself
and its neighbors; converged when no label changes. Rounds needed =
graph diameter, and near-dup components are dense and tiny (pairs →
triangles → small cliques), so 2-4 rounds is typical. Each round is one
equi-join + one groupBy — all shuffle-partitioned by node, no driver
data structure, no assumption the component fits anywhere.

Scale notes (100 TB corpus, billions of pairs):

- materializing every round (reliable checkpoint when a checkpoint
  dir is set, else localCheckpoint) truncates the iterative lineage —
  without it the Catalyst tree doubles per round and analysis time
  explodes long before data does (the classic iterative-DataFrame trap);
- the convergence check is a cheap aggregate on the labels diff; a
  fixed ``max_iter`` bounds worst-case (chain-shaped) graphs, for which
  :func:`connected_components_star` (the alternating large-star/
  small-star formulation of Kiveris et al., "Connected Components in
  MapReduce and Beyond") converges in O(log n) rounds regardless of
  diameter — that variant is the default for production pair graphs;
- output is (node, component) with component = min node id reachable:
  deterministic, so representative selection ("keep the min doc_id")
  is reproducible across runs and cluster layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import materialize


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Labels every node of the undirected pair graph with the minimum
    node id of its component. Returns columns ``(node, component)``.
    Raises if not converged within ``max_iter`` rounds (diameter bound
    exceeded — see module notes for the log-rounds alternative).
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    und = materialize(und)
    labels = materialize(
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iter):
        neighbor_labels = (
            und.join(labels, und.b == labels.node)
            .select(F.col("a").alias("node"), "component")
        )
        new_labels = materialize(  # truncate iterative lineage
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "the pair graph has a longer diameter than near-dup groups "
        "should — use the large-star/small-star variant "
        "(connected_components_star), which is O(log n) rounds"
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components in O(log n) rounds via alternating
    large-star / small-star (Kiveris et al., "Connected Components in
    MapReduce and Beyond") — the variant :func:`connected_components`'s
    own convergence error points at for graphs whose diameter exceeds
    its round budget (chained near-dups at 100x corpus scale).

    Returns the same ``(node, component)`` contract, component = min
    node id of the component.

    Each round is two star operations, each one groupBy-min plus one
    equi-join, all shuffle-partitioned by node — no driver state, no
    per-component memory. Invariant maintained between rounds: every
    edge is oriented larger-endpoint-first, so large-star's ``v > u``
    and small-star's ``min of smaller neighbors`` read directly off the
    orientation. Fixed point = the edge set is a union of stars rooted
    at each component's minimum, detected by an (edge count, order-
    independent hash checksum) pair going stable; rounds run in FUSED
    PAIRS — two star rounds chain lazily into one materialize (reliable
    checkpoint when a checkpoint dir is set) + one signature action, so
    the per-round job floor is paid half as often; post-fixed-point
    rounds are exact no-ops, so pair-grain detection is safe."""
    e = materialize(
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )

    def _signature(df: DataFrame) -> tuple:
        # bit_xor: order-independent, overflow-free (ANSI-safe); edges
        # are distinct so XOR self-cancellation cannot occur.
        row = df.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    def _round(e: DataFrame) -> DataFrame:
        # large-star: every node connects its larger neighbors to the
        # minimum of its closed neighborhood. Output (v, m) has v > m.
        und = e.select("u", "v").union(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        lmins = und.groupBy("u").agg(F.min("v").alias("mv")).select(
            "u", F.least(F.col("u"), F.col("mv")).alias("m")
        )
        e = (
            und.join(lmins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: every node connects its smaller neighbors (and
        # itself) to the minimum among them. Orientation is preserved.
        smins = e.groupBy("u").agg(F.min("v").alias("m"))
        joined = e.join(smins, "u")
        return (
            joined.filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smins.select("u", F.col("m").alias("v")))
            .distinct()
        )

    sig = _signature(e)
    for _ in range(max_iter):
        # TWO rounds per materialize/signature (round fusion): the star
        # operations chain lazily, so pairing halves the action count —
        # one checkpoint + one signature agg per pair instead of per
        # round. Extra rounds past the fixed point are exact no-ops
        # (a union-of-stars maps to itself under both stars), so
        # detecting convergence one round late never changes the
        # result, only costs one cheap no-op pass over the final
        # star set.
        e = materialize(_round(_round(e)))
        new_sig = _signature(e)
        if new_sig == sig:
            # stars: every non-root has exactly one edge to its root.
            non_roots = e.select(
                F.col("u").alias("node"), F.col("v").alias("component")
            )
            roots = (
                e.select(F.col("v").alias("node")).distinct()
                .withColumn("component", F.col("node"))
            )
            return non_roots.unionByName(roots)
        sig = new_sig
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iter} "
        "round pairs — far beyond the O(log n) bound; graph input is "
        "suspect"
    )


def components_oracle_sql(pairs_sql: str) -> str:
    """DuckDB oracle: min-label reachability as a recursive CTE over
    the same pair SQL (UNION recursion deduplicates states, so this
    terminates on the transitive closure). ``pairs``/``und`` are pinned
    MATERIALIZED: DuckDB re-evaluates CTEs inlined into a recursive
    step on every iteration, which re-ran the whole upstream pair
    chain per round (measured 26x on the q221 oracle)."""
    return f"""
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
)
SELECT node, MIN(r) AS component FROM reach GROUP BY node
"""


PR_SCALE = 1_000_000_000_000  # 1e12: score fixed-point; see overflow note
PR_ITERS = 3


def pagerank_sql(dialect: str, pairs_sql: str, top: int = 100,
                 und_table: str | None = None,
                 deg_table: str | None = None) -> str:
    """Integer-exact PageRank over the undirected near-dup pair graph —
    the canonical "importance in the duplicate cluster" signal (pick the
    most-linked member as canonical, audit hub documents).

    All arithmetic is fixed-point int64 with explicit floor division:
    v_{t+1} = (15·SCALE)/100 + (85 · Σ_{u~x} (v_t(u) ÷ deg(u))) ÷ 100.
    Floor-div + integer sums are bit-identical across engines (no float
    accumulates anywhere), so ``PR_ITERS`` unrolled iterations land on
    exactly the same scores.

    Overflow safety without 128-bit cost: every score is range-checked
    after each iteration against an A-PRIORI bound B = (2^63-1) ÷
    (85·deg_max), with deg_max taken from the graph itself (a 1-row
    scalar cross join). While every input score is ≤ B, the iteration's
    SUM of per-neighbor contributions is ≤ deg_max·B and 85·SUM ≤
    2^63-1 — the whole recurrence provably stays in int64, so the hot
    aggregation remains a plain BIGINT SUM (a DECIMAL(38,0) sum was
    measured 2x slower end-to-end). A score exceeding B RAISES on both
    engines (``assert_true`` / ``error``) instead of Spark's silent
    wrap — conservative (it refuses some still-representable states on
    extreme-degree graphs; lower PR_SCALE there) but never silently
    wrong, and an out-of-range hub fails loudly and identically rather
    than surfacing as a hash mismatch.

    Scale: one equi-join + hash aggregate per iteration, shuffled on the
    node key — the operator form would checkpoint per round like
    :func:`connected_components`; 3 unrolled rounds are fine for
    Catalyst. Every node of a pair graph has degree ≥ 1, so there are
    no dangling-mass corrections."""
    idiv = (lambda a, b: f"({a} div {b})") if dialect == "spark" else (
        lambda a, b: f"({a} // {b})")
    base = idiv(f"15 * {PR_SCALE}", "100")
    lim = idiv("9223372036854775807", "(85 * bb.m)")
    if dialect == "spark":
        guard = (lambda v: f"(CASE WHEN {v} <= {lim} THEN CAST({v} AS BIGINT)"
                 f" ELSE CAST(assert_true({v} <= {lim},"
                 f" 'pagerank int64 overflow bound') AS BIGINT) END)")
    else:
        guard = (lambda v: f"(CASE WHEN {v} <= {lim} THEN CAST({v} AS BIGINT)"
                 f" ELSE CAST(error('pagerank int64 overflow bound')"
                 f" AS BIGINT) END)")
    cur = "v0"
    # Spark: vp (|V| rows of (node, v)) and dg (|V| rows) are tiny next
    # to the edge list — broadcast them so each round streams und with
    # no Exchange on the probe side; the only per-round shuffle left is
    # the GROUP BY u.b aggregation. (DuckDB needs no hints and has no
    # hint syntax.)
    h = "/*+ BROADCAST(vp, dg) */ " if dialect == "spark" else ""
    its = []
    for k in range(1, PR_ITERS + 1):
        contrib = idiv("vp.v", "dg.d")
        its.append(f"""v{k} AS (
  SELECT {h}u.b AS node,
         {guard(f"{base} + {idiv(f'85 * SUM({contrib})', '100')}")} AS v
  FROM und u
  JOIN v{k-1} vp ON vp.node = u.a
  JOIN deg dg ON dg.a = u.a
  CROSS JOIN bound bb
  GROUP BY u.b, bb.m
)""")
        cur = f"v{k}"
    its_sql = ",\n".join(its)
    v0 = guard(f"CAST({PR_SCALE} AS BIGINT)")
    if und_table is not None and deg_table is not None:
        # Spark path: und/deg pre-materialized by the caller (session-
        # cached checkpoints, the q256 sym/deg pattern). und is
        # referenced once per unrolled round and deg per round + bound,
        # and Spark INLINES deterministic CTEs — the single-text form
        # re-derived the UNION-dedup exchange 4x and the degree
        # aggregate 4x (60-Exchange plan). DuckDB materializes CTEs
        # natively, so the oracle keeps the single-text form — same
        # relation either way.
        prefix = (f"und AS (SELECT a, b FROM {und_table}),\n"
                  f"deg AS (SELECT a, d FROM {deg_table}),")
    else:
        prefix = f"""pairs AS ({pairs_sql}),
und AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
deg AS (SELECT a, COUNT(*) AS d FROM und GROUP BY a),"""
    return f"""
WITH {prefix}
bound AS (SELECT MAX(d) AS m FROM deg),
v0 AS (SELECT a AS node, {v0} AS v FROM deg CROSS JOIN bound bb),
{its_sql}
SELECT node, CAST(v AS BIGINT) AS score
FROM {cur}
ORDER BY score DESC, node
LIMIT {top}
"""


def triangle_count_sql(dialect: str, lineitem: str = "lineitem") -> str:
    """Degree-ordered triangle counting + global clustering coefficient
    over the co-purchase graph (parts that share an order — the
    market-basket projection of lineitem).

    Algorithm (Schank–Wagner / Cohen's MapReduce orientation): orient
    every undirected edge from its lower-(degree, id) endpoint to the
    higher one, enumerate wedges only from each node's OUT-edges with
    the two out-neighbors in rank order, and close each wedge against
    the oriented edge set. Each triangle is counted exactly once (from
    its minimum-rank vertex), and the wedge fan-out per node is
    bounded by its OUT-degree ≤ O(√m) — the orientation is what makes
    all-pairs-of-neighbors survive power-law degree skew at 100 TB,
    where a hub with degree 10⁶ would otherwise emit 10¹² wedges.

    Edge build: per-order pair expansion is C(items_per_order, 2),
    bounded (≤ 7 lineitems/order in TPC-H-shaped data); a production
    run on unbounded baskets would cap or sample basket size first.
    Everything else is equi-joins + hash aggregates on integer keys;
    all-integer output (gcc in ppm via truncating div), so the result
    is bit-identical across engines and partition layouts.

    Output: one row — nodes, edges, wedges, triangles, and the global
    clustering coefficient 3·Δ/wedges in ppm.

    Scale shape (probe-measured, tools/scale_probe_results.json q178
    2.0x wall at 10x data once the Spark driver's adjacency broadcast
    range covers both scales): exact triangle counting is Θ(m^{3/2})
    in the worst case — with the degree orientation the oriented-wedge
    count is Σ outdeg² ≤ m·√m, and the orientation removes the
    hub-skew cliff (max per-node fan-out outdeg ≤ O(√m) regardless of
    raw degree). No exact algorithm beats the wedge bound; sub-m√m
    needs approximation (wedge sampling / degree-thresholded
    counting), which trades the bit-exact cross-engine gate away."""
    from . import portable as P

    lower = "(du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)"
    wedges = P.int_div("d * (d - 1)", "2", dialect)
    gcc = P.int_div("3000000 * t.n_tri", "w.w", dialect)
    return f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM {lineitem}
),
edges AS (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
),
deg AS (
  SELECT node, COUNT(*) AS d
  FROM (SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges) n
  GROUP BY node
),
oriented AS (
  SELECT CASE WHEN {lower} THEN e.u ELSE e.v END AS s,
         CASE WHEN {lower} THEN e.v ELSE e.u END AS t,
         CASE WHEN {lower} THEN dv.d ELSE du.d END AS td
  FROM edges e
  JOIN deg du ON e.u = du.node
  JOIN deg dv ON e.v = dv.node
),
tri AS (
  SELECT COUNT(*) AS n_tri
  FROM oriented o1
  JOIN oriented o2
    ON o1.s = o2.s
   AND (o1.td < o2.td OR (o1.td = o2.td AND o1.t < o2.t))
  JOIN oriented o3 ON o3.s = o1.t AND o3.t = o2.t
),
w AS (SELECT SUM({wedges}) AS w FROM deg)
SELECT CAST(nn.n AS BIGINT) AS n_nodes,
       CAST(ne.n AS BIGINT) AS n_edges,
       CAST(w.w AS BIGINT) AS n_wedges,
       CAST(t.n_tri AS BIGINT) AS n_triangles,
       CAST({gcc} AS BIGINT) AS gcc_ppm
FROM tri t
CROSS JOIN (SELECT COUNT(*) AS n FROM deg) nn
CROSS JOIN (SELECT COUNT(*) AS n FROM edges) ne
CROSS JOIN w
"""


_EDGE_CACHE: dict = {}
_EDGE_LOCK = __import__("threading").Lock()


def copurchase_edges(spark, lineitem: str, cache_key: str | None = None):
    """Materialized undirected co-purchase edge list ``(u, v)`` with
    u < v — parts that share an order (the market-basket projection of
    lineitem). Per-order pair expansion is C(items_per_order, 2),
    bounded by basket size; shared by triangle counting and k-core.
    With ``cache_key`` (the corpus path) the edge list is built once
    per (session, corpus) — the materialize-the-graph-relation pattern
    the dedup family uses for its token index."""
    from pyspark.sql import functions as F

    from .dedup import materialize

    key = (id(spark), cache_key)
    with _EDGE_LOCK:
        if cache_key is not None and key in _EDGE_CACHE:
            return _EDGE_CACHE[key]
        art = "copurchase_edges" if cache_key is not None else None
        items = materialize(
            spark.table(lineitem)
            .select(F.col("l_orderkey").alias("ok"),
                    F.col("l_partkey").alias("pk"))
            .distinct(), artifact=art)
        edges = materialize(
            items.alias("a")
            .join(items.alias("b"),
                  [F.col("a.ok") == F.col("b.ok"),
                   F.col("a.pk") < F.col("b.pk")])
            .select(F.col("a.pk").alias("u"), F.col("b.pk").alias("v"))
            .distinct(), artifact=art)
        if cache_key is not None:
            _EDGE_CACHE[key] = edges
        return edges


# k=80 sits just past this graph's peel threshold: rounds actually
# cascade (sf0.01 survivors 1903 -> 1865 -> 1857 over 5 peels; k=90
# collapses the whole quasi-random graph, k<=70 peels almost nothing).
KCORE_K = 80
KCORE_ROUNDS = 5


def kcore(spark, lineitem: str, k: int = KCORE_K,
          rounds: int = KCORE_ROUNDS, cache_key: str | None = None):
    """k-core peeling on the co-purchase graph: ``rounds`` rounds of
    "drop every node with degree < k, keep only edges between
    survivors". The contract is the state after exactly ``rounds``
    peels (deterministic on both engines whether or not the peel has
    reached its fixed point — the oracle unrolls the same rounds);
    reaching the fixed point early is an equivalent no-op, so the loop
    may break when a round removes nothing.

    Physical strategy — delta peeling, NOT the oracle's re-filter:
    recomputing full degrees and re-filtering the edge list every
    round pays a 2·|E| shuffle per round for removals that shrink
    geometrically. Instead degrees are computed ONCE; each later round
    joins the (tiny, broadcast) removed set against the static edge
    list to count per-neighbor losses and decrements survivor degrees
    — per-round cost O(edges incident to removed), the way dedicated
    k-core engines batch-peel. Identities used: an original edge
    (x, y) with y removed in round r and x still alive IS an edge of
    the round-r graph (both endpoints survived every earlier round),
    so the static edge list serves every round; a node the peel
    isolated (degree 0, but never below k before its neighbors went)
    is not part of the residual edge set and is filtered at the end.

    Output: surviving nodes with their within-core degree.

    r9 (guide §2.4): the initial degree relation and the symmetrized
    edge list are the session-cached ``copurchase_sym_deg`` artifacts
    (shared with q254/q255/q256/q263/q264) instead of a per-call
    2·|E| shuffle + checkpoint, and each round's decrement joins the
    removed set against ``sym`` once instead of against ``e`` twice.
    Isolated per-call steady state 2.74 → 2.06 s at sf0.1. The
    remaining floor is per-round job overhead, not data: an
    adjacency-array decrement (20 k array rows scanned per round
    instead of 2.4 M edge rows) measured the SAME 2.05 s, and fusing
    rounds pairwise (3 checkpoints instead of 5) only 1.93 s —
    measured and rejected; at scale the per-round work is
    O(edges incident to removed) either way."""
    from pyspark.sql import functions as F

    from .dedup import materialize

    sym, deg = copurchase_sym_deg(spark, lineitem, cache_key)
    for _ in range(rounds):
        # removed stays lazy: it derives from the checkpointed deg by a
        # cheap filter, so re-evaluation is an in-memory scan — only
        # deg (the loop-carried state) is materialized.
        removed = deg.filter(F.col("d") < k).select("node")
        # the count both terminates the loop and plans the round: a lazy
        # filter carries no stats, so without the measured count Spark
        # sort-merges sym against a relation of a few hundred rows. The
        # data-driven broadcast (same pattern as the q110 skew profiler)
        # only fires when this round's removal set provably fits; a
        # massive first peel at 100 TB keeps the plain shuffle join.
        n_removed = removed.count()
        if n_removed == 0:
            break
        rm = removed.withColumnRenamed("node", "dst")
        if n_removed < 2_000_000:
            rm = F.broadcast(rm)
        # an original edge (src, dst) with dst removed this round and
        # src alive is an edge of the current residual graph (both
        # endpoints survived every earlier round), so the static sym
        # list serves every round; src-side decrements come for free
        # because sym carries each edge in both directions.
        dec = (
            sym.join(rm, "dst")
            .select("src")
            .groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).alias("c")))
        deg = materialize(
            deg.filter(F.col("d") >= k)
            .join(dec, "node", "left")
            .select(
                "node",
                (F.col("d") - F.coalesce(F.col("c"), F.lit(0))).alias("d")))
    return (deg.filter(F.col("d") >= 1)
            .select("node", F.col("d").cast("long").alias("core_deg"))
            .orderBy("node"))


def kcore_oracle_sql(lineitem: str = "lineitem", k: int = KCORE_K,
                     rounds: int = KCORE_ROUNDS) -> str:
    """DuckDB oracle for :func:`kcore`: the same peeling rounds
    unrolled as MATERIALIZED CTEs (each edge set referenced by the
    next round's degree count and filter)."""
    parts = [f"""e0 AS MATERIALIZED (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        FROM {lineitem}) a
  JOIN (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        FROM {lineitem}) b ON a.ok = b.ok AND a.pk < b.pk)"""]
    for r in range(rounds):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT node, COUNT(*) AS d FROM "
            f"(SELECT u AS node FROM e{r} UNION ALL "
            f"SELECT v AS node FROM e{r}) n GROUP BY node)")
        parts.append(
            f"k{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE d >= {k})")
        parts.append(
            f"e{r + 1} AS MATERIALIZED (SELECT e.u, e.v FROM e{r} e "
            f"JOIN k{r} ku ON e.u = ku.node "
            f"JOIN k{r} kv ON e.v = kv.node)")
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT node, CAST(COUNT(*) AS BIGINT) AS core_deg
FROM (SELECT u AS node FROM e{rounds}
      UNION ALL SELECT v AS node FROM e{rounds}) n
GROUP BY node
ORDER BY node""")


def triangle_count(spark, lineitem: str, cache_key: str | None = None):
    """Spark driver for degree-ordered triangle counting — same output
    contract as :func:`triangle_count_sql` (which DuckDB runs as the
    oracle: its optimizer shares CTEs, so the one-statement wedge-join
    form is fine there), but a different physical strategy.

    The wedge-join form is wrong for Spark at scale: o1⋈o2 on s
    materializes every oriented wedge through a shuffle (sf0.1's
    co-purchase graph: 20k nodes / 1.2M edges / 148M wedges — Spark
    8.2s, DuckDB 15-19s on the same data). Instead: build each node's
    sorted OUT-neighbor list once, then for each oriented edge (u→v)
    count |N⁺(u) ∩ N⁺(v)| via ``array_intersect`` — each triangle
    {a<b<c} closes exactly once, from edge (a→b) finding c. The
    intersection runs inside whole-stage codegen per edge row; no
    wedge row ever exists. Measured 8.2s → ~2s at sf0.1.

    Scale shape: adjacency lists are degeneracy-bounded (out-degree ≤
    O(√m) under the (degree, id) orientation), so the per-row work is
    O(d⁺(u)+d⁺(v)) and the widest shuffled relation is the edge list
    itself. Shared relations (edges/deg/oriented — each read 2-3×)
    are materialized once (Spark inlines CTE/DataFrame reuse)."""
    from pyspark.sql import functions as F

    edges = copurchase_edges(spark, lineitem, cache_key)
    deg, oriented, adj = oriented_adj(spark, lineitem, cache_key)
    # The per-edge (nb_s, t) pairs come from exploding adj — narrow, no
    # join, already co-located with nb_s — so the only heavy relation
    # is the exploded side (Σ d⁺ copies of N⁺, i.e. Θ(Σ d⁺²) array
    # elements). Plan the closing join from the measured edge count:
    # the adjacency side is m array elements total, so it BROADCASTS
    # far past AQE's default guess — up to ~16M edges (~128MB of
    # longs) the explicit broadcast keeps the exploded side entirely
    # unshuffled and the plan class CONTINUOUS across the 10x probe
    # (the old 4M cutoff flipped 10x runs onto a shuffle of the
    # exploded arrays that sf0.1 never paid — probed 14x for what is
    # linear work). Past the broadcast range, SHUFFLE_HASH skips
    # sort-merge's sort of the exploded side (measured 67s -> 24s at
    # the 10x probe when this path was the default).
    adj_t = adj.select(F.col("s").alias("t"), F.col("nb").alias("nb_t"))
    if edges.count() <= 16_000_000:
        adj_t = F.broadcast(adj_t)
    else:
        adj_t = adj_t.hint("shuffle_hash")
    tri = (adj.select(F.col("nb").alias("nb_s"), F.explode("nb").alias("t"))
           .join(adj_t, "t")
           .agg(F.coalesce(
               F.sum(F.size(F.array_intersect("nb_s", "nb_t"))),
               F.lit(0)).cast("bigint").alias("n_tri")))
    n_nodes = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    n_edges = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    # d*(d-1) is always even, so truncating DIV == exact halving; gcc
    # matches the oracle's truncating division (all terms positive).
    n_wedges = deg.agg(
        F.expr("CAST(SUM(d * (d - 1L) DIV 2) AS BIGINT)").alias("n_wedges"))
    return (tri.crossJoin(n_nodes).crossJoin(n_edges).crossJoin(n_wedges)
            .select("n_nodes", "n_edges", "n_wedges",
                    F.col("n_tri").alias("n_triangles"),
                    F.expr("CAST(3000000 * n_tri DIV n_wedges AS BIGINT)")
                    .alias("gcc_ppm")))


LPA_ROUNDS = 2


def label_propagation_sql(
    dialect: str,
    lineitem: str = "lineitem",
    rounds: int = LPA_ROUNDS,
    edges_table: str | None = None,
) -> str:
    """Synchronous label propagation (Raghavan et al. arXiv:0709.2938)
    over the co-purchase graph — community detection, the third member
    of the graph family next to connected components (reachability) and
    PageRank (centrality). Communities group near-duplicate/topically
    linked records for canonical selection and leakage audits where CC
    is too coarse (one bridge edge fuses two clusters; LPA keeps them
    apart unless the bridge carries plurality weight).

    Every node starts labeled with itself; each round every node adopts
    the PLURALITY label among its neighbors, ties broken by MIN label —
    the deterministic tie-break that makes the classic randomized LPA
    reproducible on any engine or partition layout. The contract is the
    state after exactly ``rounds`` synchronous rounds (the oracle
    unrolls the same rounds; a fixed round count sidesteps LPA's
    known oscillation on bipartite structures).

    Plan shape per round: one hash join (symmetrized edges ⋈ labels, on
    the node key) + one (node, label) count aggregate + one per-node
    argmax window — all shuffles on the node key, fan-out bounded by
    degree. At 100 TB the operator form would checkpoint each round's
    label relation like :func:`connected_components`; ``rounds`` is
    fixed and small, so unrolling keeps Catalyst's plan bounded.

    Output: per-community member counts (community = converged label).
    """
    body, fin = _lpa_chain(dialect, lineitem, rounds, edges_table)
    return f"""
WITH {body}
SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS n_members
FROM {fin}
GROUP BY lbl
ORDER BY community"""


def lpa_labels_sql(
    dialect: str,
    lineitem: str = "lineitem",
    rounds: int = LPA_ROUNDS,
    edges_table: str | None = None,
) -> str:
    """The raw (node, lbl) label relation after exactly ``rounds`` LPA
    rounds — the shared artifact the modularity audit consumes (the
    Spark entry materializes it once; the single-statement form would
    be re-derived per reference since Spark inlines CTEs)."""
    body, fin = _lpa_chain(dialect, lineitem, rounds, edges_table)
    return f"""
WITH {body}
SELECT node, lbl FROM {fin}"""


def _lpa_chain(
    dialect: str,
    lineitem: str,
    rounds: int,
    edges_table: str | None,
) -> tuple[str, str]:
    """The LPA CTE chain (edges → sym → l0 → … → l{rounds}); returns
    (WITH-body, final label relation name). Every CTE is referenced
    exactly once by its successor, so the chain is safe to inline on
    Spark."""
    # DuckDB inlines CTEs referenced more than once, recomputing the
    # edge build per round; MATERIALIZED pins each round's relation.
    # Spark has no such keyword (Catalyst reuses exchange subtrees).
    m = "MATERIALIZED " if dialect == "duckdb" else ""
    if edges_table is not None:
        edges = f"edges AS {m}(SELECT u, v FROM {edges_table})"
    else:
        edges = f"""items AS {m}(
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM {lineitem}
),
edges AS {m}(
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
)"""
    sym_body = """SELECT u AS src, v AS dst FROM edges
  UNION ALL
  SELECT v AS src, u AS dst FROM edges"""
    if dialect == "spark":
        # One up-front hash distribution by dst; every round's aggregates
        # then reuse it (see the shuffle-shape note below).
        sym = (f"sym AS (SELECT src, dst FROM (\n  {sym_body}\n) "
               "u DISTRIBUTE BY dst)")
    else:
        sym = f"sym AS {m}(\n  {sym_body}\n)"
    parts = [
        edges,
        sym
        + f""",
l0 AS {m}(SELECT DISTINCT src AS node, src AS lbl FROM sym)""",
    ]
    # Plurality-then-min-label argmax WITHOUT a per-node window: encode
    # (count, label) into one BIGINT key c*M + (M-1-lbl) and take MAX —
    # max count wins, ties resolve to the smaller label. Exact while
    # lbl < M and c < 2^63/M (labels are record ids; M = 10^9 covers
    # any 32-bit id space and counts to 9.2e9 — both checked loudly by
    # the decode going negative, never silently). Two map-side-
    # combinable hash aggregates per round, zero windows.
    #
    # Spark shuffle shape: sym is DISTRIBUTE'd BY dst ONCE, and each
    # round's label relation (O(nodes), tiny next to O(edges)) is
    # broadcast into the join — a broadcast join preserves the probe
    # side's partitioning, and HashPartitioning(dst) satisfies the
    # clustering of BOTH per-round aggregates (GROUP BY dst,lbl and
    # GROUP BY node=dst), so after the single up-front shuffle every
    # round is shuffle-free: rounds cost map-side work only. At 100 TB
    # the label relation outgrows broadcast; drop the hint and the plan
    # degrades gracefully to one node-keyed shuffle join per round
    # (the classic Pregel layout), never anything superlinear.
    M = 10**9
    bcast = "/*+ BROADCAST(l) */ " if dialect == "spark" else ""
    for r in range(1, rounds + 1):
        parts.append(f"""cnt{r} AS {m}(
  SELECT {bcast}e.dst AS node, l.lbl, COUNT(*) AS c
  FROM sym e JOIN l{r - 1} l ON e.src = l.node
  GROUP BY e.dst, l.lbl
),
l{r} AS {m}(
  SELECT node,
         CAST({M - 1} - (MAX(c * {M} + ({M - 1} - lbl)) % {M}) AS BIGINT)
           AS lbl
  FROM cnt{r}
  GROUP BY node
)""")
    return ",\n".join(parts), f"l{rounds}"


LCC_TOP = 100


def _edges_prefix(dialect: str, lineitem: str,
                  edges_table: str | None) -> str:
    """Shared CTE prefix: the co-purchase edge list (u < v) plus the
    degree relation. ``edges_table`` substitutes a pre-materialized
    edge view (the Spark entries pass the session-cached
    :func:`copurchase_edges` view so the basket expansion is built once
    per corpus, exactly like q210's LPA wiring)."""
    m = "MATERIALIZED " if dialect == "duckdb" else ""
    if edges_table is not None:
        edges = f"edges AS {m}(SELECT u, v FROM {edges_table})"
    else:
        edges = f"""items AS {m}(
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM {lineitem}
),
edges AS {m}(
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
)"""
    return f"""{edges},
deg AS {m}(
  SELECT node, COUNT(*) AS d
  FROM (SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges) n
  GROUP BY node
)"""


def local_clustering_sql(dialect: str, lineitem: str = "lineitem",
                         top: int = LCC_TOP) -> str:
    """Per-node local clustering coefficient over the co-purchase graph
    (Watts–Strogatz): lcc(u) = triangles through u / C(deg(u), 2) — the
    per-node refinement of q178's single global coefficient, used in
    graph-shaped data curation to flag clique-embedded records (link
    farms, template families, boilerplate clusters) that degree alone
    cannot separate from genuine hubs.

    Same degree-ordered orientation as :func:`triangle_count_sql`
    (each triangle enumerated exactly once, wedge fan-out bounded by
    out-degree ≤ O(√m)); each closed triangle {a,b,c} then credits all
    THREE vertices, so the per-node counts are exact. Integer-exact
    output: lcc in ppm via truncating div (d·(d−1) is always even).

    Output: top ``top`` nodes by (lcc_ppm DESC, node ASC) — a total
    order, so the LIMIT is deterministic on any engine.

    This is the wedge-join form the oracle runs; the Spark entry uses
    :func:`local_clustering` (sorted-adjacency ``array_intersect``,
    no wedge row ever materialized), same output contract."""
    from . import portable as P

    lower = "(du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)"
    pairs = P.int_div("d.d * (d.d - 1)", "2", dialect)
    lcc = P.int_div("1000000 * p.tri", pairs, dialect)
    prefix = _edges_prefix(dialect, lineitem, None)
    m = "MATERIALIZED " if dialect == "duckdb" else ""
    return f"""
WITH {prefix},
oriented AS {m}(
  SELECT CASE WHEN {lower} THEN e.u ELSE e.v END AS s,
         CASE WHEN {lower} THEN e.v ELSE e.u END AS t,
         CASE WHEN {lower} THEN dv.d ELSE du.d END AS td
  FROM edges e
  JOIN deg du ON e.u = du.node
  JOIN deg dv ON e.v = dv.node
),
tris AS {m}(
  SELECT o1.s AS a, o1.t AS b, o2.t AS c
  FROM oriented o1
  JOIN oriented o2
    ON o1.s = o2.s
   AND (o1.td < o2.td OR (o1.td = o2.td AND o1.t < o2.t))
  JOIN oriented o3 ON o3.s = o1.t AND o3.t = o2.t
),
pernode AS {m}(
  SELECT node, COUNT(*) AS tri
  FROM (SELECT a AS node FROM tris
        UNION ALL SELECT b FROM tris
        UNION ALL SELECT c FROM tris) r
  GROUP BY node
)
SELECT CAST(d.node AS BIGINT) AS node,
       CAST(d.d AS BIGINT) AS degree,
       CAST(COALESCE(p.tri, 0) AS BIGINT) AS n_tri,
       CAST(COALESCE({lcc}, 0) AS BIGINT) AS lcc_ppm
FROM deg d LEFT JOIN pernode p ON p.node = d.node
WHERE d.d >= 2
ORDER BY lcc_ppm DESC, node ASC
LIMIT {top}"""


def local_clustering(spark, lineitem: str, cache_key: str | None = None,
                     top: int = LCC_TOP):
    """Spark driver for per-node local clustering coefficients — same
    output contract as :func:`local_clustering_sql`, but the
    sorted-adjacency strategy of :func:`triangle_count`: for each
    oriented edge (s→t), ``array_intersect(N⁺(s), N⁺(t))`` yields the
    closing vertices directly, so each triangle surfaces exactly once
    as (s, t, commons) and credits s, t, and every c ∈ commons — no
    wedge row is ever materialized (148M wedges at sf0.1 vs 1.2M edge
    rows carrying bounded arrays).

    Scale shape: identical to triangle counting — Θ(Σ d⁺²) intersect
    element-ops, out-degree degeneracy-bounded by the orientation; the
    only array-carrying shuffle is the adj⋈adj_t join keyed by t, and
    the per-node credit aggregation is a map-side-combinable hash agg
    over ≤ 3·Δ + 2·m rows. The final top-N is a TakeOrdered (no full
    sort).

    Probe bound (why the 10× ratio reads ~2.9×, and why that is
    inherent, not a plan defect): the work term Σ d⁺² is a property of
    the GRAPH, not the plan. The 10× fixture replicates lineitem with
    shifted order keys but UNSHIFTED part keys, so the co-purchase
    projection densifies — the same parts co-occur in 10× more orders,
    mean degree grows ~3×, and Σ d⁺² grows ~m^1.5-ish (the standard
    triangle-count bound: Σ d⁺² ≤ O(m·α) with arboricity α, and α
    itself grows as the graph densifies). Any exact triangle algorithm
    pays this term; on a 100 TB REAL corpus the co-occurrence graph is
    sparse (bounded basket sizes), degree stays bounded, and the shape
    is m-linear. The mitigation for adversarially dense inputs is a
    degree cap on the oriented adjacency (drop hub out-lists above a
    threshold, making the answer approximate-on-hubs) — rejected here
    because the gate's contract is the exact coefficient."""
    from pyspark.sql import functions as F

    edges = copurchase_edges(spark, lineitem, cache_key)
    deg, _oriented, adj = oriented_adj(spark, lineitem, cache_key)
    # Same plan rule as triangle_count: the adjacency side is m array
    # elements total — broadcast it up to ~16M edges so the exploded
    # Θ(Σ d⁺²) side never shuffles; past that, SHUFFLE_HASH avoids
    # sorting the exploded arrays.
    adj_t = adj.select(F.col("s").alias("t"), F.col("nb").alias("nb_t"))
    if edges.count() <= 16_000_000:
        adj_t = F.broadcast(adj_t)
    else:
        adj_t = adj_t.hint("shuffle_hash")
    # Materialize-then-three-projections, MEASURED against the
    # one-pass struct-array emission (explode(concat(array(structs),
    # transform(cm, ...)))): the higher-order transform is interpreted
    # per element outside whole-stage codegen and re-building the
    # credit structs cost more than the checkpoint it saved (probe
    # 2.6x -> 3.0x, sf0.1 1.9s -> 2.4s) — rejected; the persisted
    # closed relation reads back three times as cheap columnar scans.
    closed = materialize(
        adj.select(F.col("s"), F.col("nb").alias("nb_s"),
                   F.explode("nb").alias("t"))
        .join(adj_t, "t")
        .select("s", "t",
                F.array_intersect("nb_s", "nb_t").alias("cm")))
    contrib = (
        closed.select(F.col("s").alias("node"),
                      F.size("cm").cast("long").alias("k"))
        .unionAll(closed.select(F.col("t").alias("node"),
                                F.size("cm").cast("long").alias("k")))
        .unionAll(closed.select(F.explode("cm").alias("node"))
                  .withColumn("k", F.lit(1).cast("long"))))
    pernode = contrib.groupBy("node").agg(F.sum("k").alias("tri"))
    return (
        deg.join(pernode, "node", "left")
        .where(F.col("d") >= 2)
        .select(F.col("node").cast("long").alias("node"),
                F.col("d").cast("long").alias("degree"),
                F.coalesce(F.col("tri"), F.lit(0))
                .cast("long").alias("n_tri"),
                F.coalesce(
                    F.expr("1000000 * tri DIV (d * (d - 1L) DIV 2)"),
                    F.lit(0)).cast("long").alias("lcc_ppm"))
        .orderBy(F.col("lcc_ppm").desc(), F.col("node").asc())
        .limit(top))


KHOP_SEEDS = 8
KHOP_HOPS = 3

_SEED_META_CACHE: dict = {}


def top_deg_meta(spark, lineitem: str, cache_key=None,
                 n: int = KHOP_SEEDS) -> tuple[list[int], int]:
    """``(top-n seed node ids, max degree)`` of the co-purchase degree
    relation — the seed set shared by the seeded graph trio (k-hop
    q255, PPR q264) plus the overflow bound PPR folds into a literal.
    Bounded driver values (n rows ordered by (d DESC, node ASC) — the
    oracle's seed rule — and one int); computed once per (session,
    corpus) off the session-cached deg artifact, because deriving them
    inside the statements re-ran the deg TopK sort per CTE reference
    (Spark inlines CTEs) or paid a per-call 8-row checkpoint job."""
    key = (id(spark), cache_key, n)
    with _EDGE_LOCK:
        if cache_key is not None and key in _SEED_META_CACHE:
            return _SEED_META_CACHE[key]
    from pyspark.sql import functions as F

    _sym, deg = copurchase_sym_deg(spark, lineitem, cache_key)
    rows = (deg.orderBy(F.col("d").desc(), F.col("node").asc())
            .limit(n).select("node", "d").collect())
    meta = ([int(r["node"]) for r in rows], int(rows[0]["d"]))
    with _EDGE_LOCK:
        if cache_key is not None:
            _SEED_META_CACHE[key] = meta
    return meta


def khop_reachability_sql(dialect: str, lineitem: str = "lineitem",
                          seeds: int = KHOP_SEEDS, hops: int = KHOP_HOPS,
                          edges_table: str | None = None) -> str:
    """Bounded-depth BFS reachability from the ``seeds`` highest-degree
    nodes: |{nodes within ≤ h hops}| for h = 1..``hops`` — the blast-
    radius / influence-horizon primitive (how far does a poisoned or
    viral record propagate through the co-purchase graph in h steps).

    Unrolled synchronous frontier expansion, the Pregel/BSP layout:
    each hop is ONE equi-join (reach ⋈ symmetrized edges on the node
    key) + a UNION dedup — no recursive CTE, so the plan is bounded and
    identical on both engines, and at 100 TB each hop's reach relation
    would be checkpointed exactly like :func:`connected_components`
    rounds. Reach rows are bounded by seeds × nodes; the per-hop join
    fan-out is bounded by degree. Seed pick (d DESC, node ASC) is a
    total order — deterministic on any engine/layout.

    Output: one row per seed with its degree and the cumulative reach
    count at each hop (seed itself counts at every hop: distance 0).

    Plan shape: each node carries the MIN hop at which it first entered
    the reach set, so ALL per-hop counts come from ONE conditional
    aggregate over the final relation — every CTE in the chain is
    referenced exactly once, which matters on Spark (CTEs inline: a
    per-hop counts CTE would recompute the whole prefix chain per hop,
    tripling the hop-1 join) and is harmless on DuckDB (MATERIALIZED
    pins the chain anyway)."""
    m = "MATERIALIZED " if dialect == "duckdb" else ""
    prefix = _edges_prefix(dialect, lineitem, edges_table)
    # Spark: the per-hop frontier is seeds×reach-bounded (tiny next to
    # the edge list) but reaches the join through the unrolled chain,
    # which the planner cannot size — broadcast it so the symmetrized
    # edge relation is never shuffled (q131/q264 treatment). DuckDB
    # reads hints as comments.
    bc = "/*+ BROADCAST(r) */ " if dialect == "spark" else ""
    parts = [f"""{prefix},
sym AS {m}(
  SELECT u AS src, v AS dst FROM edges
  UNION ALL
  SELECT v AS src, u AS dst FROM edges
),
seeds AS {m}(
  SELECT node AS seed, d FROM deg ORDER BY d DESC, node ASC LIMIT {seeds}
),
r0 AS {m}(SELECT seed, seed AS node, 0 AS hop FROM seeds)"""]
    for h in range(1, hops + 1):
        # Delta-frontier BFS: only nodes FIRST seen at hop h-1 expand —
        # every older node's neighborhood is already in r{h-1} by
        # construction (it entered via an edge from the set), so the
        # restriction is exact and the per-hop join input shrinks to
        # the new frontier instead of the whole cumulative reach.
        parts.append(f"""r{h} AS {m}(
  SELECT seed, node, MIN(hop) AS hop FROM (
    SELECT {bc}r.seed, e.dst AS node, {h} AS hop
    FROM r{h - 1} r JOIN sym e ON e.src = r.node
    WHERE r.hop = {h - 1}
    UNION ALL
    SELECT seed, node, hop FROM r{h - 1}
  ) u
  GROUP BY seed, node
)""")
    sel = ",\n       ".join(
        f"CAST(SUM(CASE WHEN r.hop <= {h} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS reach_{h}"
        for h in range(1, hops + 1))
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT CAST(r.seed AS BIGINT) AS seed,
       CAST(MAX(d.d) AS BIGINT) AS degree,
       {sel}
FROM r{hops} r JOIN deg d ON d.node = r.seed
GROUP BY r.seed
ORDER BY seed"""


RA_SEEDS = 100
RA_TOP = 10


def _novel_body(dialect: str) -> str:
    """Known-link removal for :func:`ra_link_prediction_sql` — one
    semantic shape (anti semi-join of scored candidates against the
    seed adjacency), two spellings: hinted LEFT ANTI JOIN for Spark,
    NOT EXISTS for DuckDB (which has no hint syntax and plans the
    subquery as a hash anti-join on its own)."""
    if dialect == "duckdb":
        return """SELECT s.seed, s.cand, s.n_common, s.ra_score_ppm
  FROM scored s
  WHERE NOT EXISTS (SELECT 1 FROM nbr e
                    WHERE e.seed = s.seed AND e.nb = s.cand)"""
    return """SELECT /*+ BROADCAST(e) */
         s.seed, s.cand, s.n_common, s.ra_score_ppm
  FROM scored s LEFT ANTI JOIN nbr e
    ON e.seed = s.seed AND e.nb = s.cand"""


def ra_link_prediction_sql(dialect: str, lineitem: str = "lineitem",
                           seeds: int = RA_SEEDS, top: int = RA_TOP,
                           edges_table: str | None = None,
                           sym_table: str | None = None,
                           deg_table: str | None = None) -> str:
    """Resource-Allocation link prediction (Zhou, Lü & Zhang, EPJ B 71,
    2009 — the integer-exact member of the Adamic–Adar family): for a
    seed set of query nodes, score every non-adjacent candidate v by
    Σ_{c ∈ N(u)∩N(v)} 1/deg(c) and emit each seed's top-``top``
    predicted links. The recommendation / missing-edge primitive over
    the co-purchase graph; RA is chosen over Adamic–Adar's 1/ln(deg)
    precisely because 10⁶ DIV deg is integer-exact cross-engine while
    float logs are not.

    Candidate generation is seeded two-hop traversal — neighbors'
    neighbors — NOT all-pairs: wedge rows are bounded by
    Σ_{c ∈ N(seed)} deg(c) per seed, so cost is seeds × d̄² and scales
    linearly in the seed count at any corpus size. Known links are
    removed with NOT EXISTS against the symmetrized edge set (a null-
    safe anti-join on both engines). The per-seed top-k window runs
    over per-seed candidate sets bounded by the two-hop ball — never
    a global window. Ties break by candidate id: total order."""
    from . import portable as P

    ra = P.int_div("1000000", "n.dnb", dialect)
    m = "MATERIALIZED " if dialect == "duckdb" else ""
    if sym_table is not None and deg_table is not None:
        # Spark path: sym and deg are MATERIALIZED session-cached views
        # (components.copurchase_sym_deg) — sym is referenced three
        # times below and deg twice, and Spark inlines CTEs, so reading
        # the pinned relations avoids re-deriving the edge build per
        # reference (DuckDB pins via MATERIALIZED instead).
        prefix = (f"sym AS (SELECT src, dst FROM {sym_table}),\n"
                  f"deg AS (SELECT node, d FROM {deg_table})")
    else:
        prefix = f"""{_edges_prefix(dialect, lineitem, edges_table)},
sym AS {m}(
  SELECT u AS src, v AS dst FROM edges
  UNION ALL
  SELECT v AS src, u AS dst FROM edges
)"""
    # Spark join hints (comments to DuckDB's parser, but gated anyway):
    # deg (|V| rows) and nbr (seeds × d̄ rows) are both orders of
    # magnitude under the broadcast bar while sym (2|E| rows, a
    # localCheckpoint with UnknownPartitioning) defeats size
    # estimation — unhinted, the r8 baseline plan ran THREE full
    # sym Exchange+Sort+SortMergeJoins (plans/r08/q256_*_before.txt).
    # Broadcasting the small side of each join streams sym in place:
    # the only exchange left is the scored aggregation.
    h_nbr = "/*+ BROADCAST(dc) */ " if dialect != "duckdb" else ""
    h_sc = "/*+ BROADCAST(n) */ " if dialect != "duckdb" else ""
    return f"""
WITH {prefix},
seeds AS {m}(
  SELECT node AS seed FROM deg ORDER BY d DESC, node ASC LIMIT {seeds}
),
nbr AS {m}(
  SELECT {h_nbr}s.seed, e.dst AS nb, dc.d AS dnb
  FROM seeds s
  JOIN sym e ON e.src = s.seed
  JOIN deg dc ON dc.node = e.dst
),
scored AS {m}(
  SELECT {h_sc}n.seed, e.dst AS cand,
         COUNT(*) AS n_common,
         SUM({ra}) AS ra_score_ppm
  FROM nbr n JOIN sym e ON e.src = n.nb
  WHERE e.dst <> n.seed
  GROUP BY n.seed, e.dst
),
novel AS {m}(
  -- Known-link removal probes nbr, not sym: the anti-join condition
  -- pins the probe's src to s.seed, and sym restricted to seed sources
  -- IS nbr's (seed, nb) pairs (nbr = seeds ⋈ sym on src; dnb tags
  -- along but existence is unaffected) — same predicate, seeds×d̄-sized
  -- probe side instead of a third full sym scan/shuffle. Spark gets an
  -- explicit LEFT ANTI JOIN + broadcast hint (a NOT EXISTS subquery
  -- cannot be hinted, and nbr's size estimate — behind two broadcast
  -- joins over a stat-less checkpoint — is unknown to the planner, so
  -- unhinted it planned Exchange+SortMergeJoin on both sides).
  {_novel_body(dialect)}
),
ranked AS (
  SELECT seed, cand, n_common, ra_score_ppm,
         ROW_NUMBER() OVER (PARTITION BY seed
                            ORDER BY ra_score_ppm DESC, cand ASC) AS rk
  FROM novel
)
SELECT CAST(seed AS BIGINT) AS seed,
       CAST(cand AS BIGINT) AS cand,
       CAST(n_common AS BIGINT) AS n_common,
       CAST(ra_score_ppm AS BIGINT) AS ra_score_ppm,
       CAST(rk AS BIGINT) AS rk
FROM ranked
WHERE rk <= {top}
ORDER BY seed, rk"""


_CC_CACHE: dict = {}


def cc_labels(spark, pairs_df, cache_key: str | None = None,
              tag: str = "minhash"):
    """Session-keyed materialized connected-components labels over a
    pair relation — the star rounds run ONCE per (session, corpus, tag)
    and every consumer (dup groups q77, leakage-safe split keys q221)
    reuses the label relation, the same shared-artifact pattern as
    ``dedup.minhash_pairs_view`` / :func:`copurchase_edges`. Without a
    ``cache_key`` it degrades to a plain (uncached) run.

    CONTRACT: ``tag`` must uniquely name the PAIR SOURCE under the
    given cache_key — callers computing labels over a different pair
    relation must pass a different tag (q77/q221 share the minhash
    pairs under the default tag; q190 passes tag='snm'). A plan
    fingerprint cannot enforce this mechanically: both semanticHash
    and the canonicalized plan string were measured UNSTABLE across
    rebuilds of the byte-identical query (expression-id leakage), so
    fingerprint-keying silently rebuilt the labels every call — the
    star rounds re-ran per consumer (q190 bench 0.5s -> 5.2s). The
    cache verifies the pair schema on every hit as a cheap misuse
    tripwire."""
    schema_fp = tuple((f.name, f.dataType.simpleString())
                      for f in pairs_df.schema.fields)
    key = (id(spark), cache_key, tag)
    with _EDGE_LOCK:
        if cache_key is not None and key in _CC_CACHE:
            labels, cached_fp = _CC_CACHE[key]
            if cached_fp != schema_fp:
                raise ValueError(
                    f"cc_labels tag {tag!r} reused for a pair relation "
                    f"with a different schema ({cached_fp} vs "
                    f"{schema_fp}) — pass a distinct tag per pair source"
                )
            return labels
        labels = materialize(
            connected_components_star(pairs_df),
            artifact="cc_labels" if cache_key is not None else None)
        if cache_key is not None:
            _CC_CACHE[key] = (labels, schema_fp)
        return labels


_SYMDEG_CACHE: dict = {}


def copurchase_sym_deg(spark, lineitem: str, cache_key: str | None = None):
    """Materialized symmetrized edge list ``(src, dst)`` and degree
    relation ``(node, d)`` for the co-purchase graph — shared by the
    seeded traversal operators (k-hop reachability, RA link
    prediction), built once per (session, corpus) on top of
    :func:`copurchase_edges`."""
    from pyspark.sql import functions as F

    key = (id(spark), cache_key)
    with _EDGE_LOCK:
        if cache_key is not None and key in _SYMDEG_CACHE:
            return _SYMDEG_CACHE[key]
    edges = copurchase_edges(spark, lineitem, cache_key)
    art = "copurchase_sym_deg" if cache_key is not None else None
    sym = materialize(
        edges.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionAll(edges.select(F.col("v").alias("src"),
                               F.col("u").alias("dst"))), artifact=art)
    deg = materialize(
        sym.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("d")), artifact=art)
    with _EDGE_LOCK:
        if cache_key is not None:
            _SYMDEG_CACHE[key] = (sym, deg)
    return sym, deg


def khop_reachability(spark, lineitem: str, cache_key: str | None = None,
                      seeds: int = KHOP_SEEDS, hops: int = KHOP_HOPS):
    """Spark driver for bounded-depth BFS — same output contract as
    :func:`khop_reachability_sql` (which DuckDB runs as the oracle:
    MATERIALIZED pins each hop there), but each hop's reach relation is
    explicitly materialized. The one-statement form is wrong for Spark:
    every hop CTE is referenced twice (the frontier join AND the
    cumulative union), and Spark inlines CTEs, so hop h re-computes
    hop h-1 twice — a 2^hops plan blowup the materialization removes
    (8.5s -> ~1.5s at sf0.1). Per hop: one broadcast join from the
    delta frontier + one MIN-hop aggregate, exactly the checkpointed
    Pregel layout the CC rounds use. r9: hop 0 is built from the
    session-cached seed ids (:func:`top_deg_meta`) as a local
    relation — the per-call TopK sort + 8-row checkpoint job it
    replaces bought nothing (guide §2.4)."""
    from pyspark.sql import functions as F

    sym, deg = copurchase_sym_deg(spark, lineitem, cache_key)
    seed_nodes, _ = top_deg_meta(spark, lineitem, cache_key, seeds)
    # VALUES, not createDataFrame: the latter parallelizes through an
    # RDD (a defaultParallelism-partition LogicalRDD for 8 rows, one
    # 32-task stage per downstream reference); VALUES is a true
    # single-partition LocalRelation.
    vals = ", ".join(
        f"(CAST({s} AS BIGINT), CAST({s} AS BIGINT), 0)"
        for s in seed_nodes)
    r = spark.sql(f"SELECT seed, node, hop FROM "
                  f"(VALUES {vals}) AS t(seed, node, hop)")
    for h in range(1, hops + 1):
        frontier = r.filter(F.col("hop") == h - 1)
        nxt = (F.broadcast(frontier)
               .join(sym, frontier["node"] == sym["src"])
               .select("seed", F.col("dst").alias("node"),
                       F.lit(h).alias("hop")))
        r = materialize(
            r.unionByName(nxt).groupBy("seed", "node")
            .agg(F.min("hop").alias("hop")))
    counts = [
        F.sum(F.when(F.col("hop") <= h, 1).otherwise(0))
        .cast("long").alias(f"reach_{h}")
        for h in range(1, hops + 1)
    ]
    return (r.groupBy("seed")
            .agg(*counts)
            .join(deg.select(F.col("node").alias("seed"),
                             F.col("d").cast("long").alias("degree")),
                  "seed")
            .select(F.col("seed").cast("long").alias("seed"), "degree",
                    *[f"reach_{h}" for h in range(1, hops + 1)])
            .orderBy("seed"))


_ADJ_CACHE: dict = {}


def oriented_adj(spark, lineitem: str, cache_key: str | None = None):
    """Materialized (deg, oriented, adj) for the degree-ordered
    co-purchase graph — the shared build behind the triangle family
    (global count q178, per-node clustering q254): deg is the degree
    relation, oriented the (degree,id)-oriented edge list, adj each
    node's SORTED out-neighbor array. Built once per (session, corpus)
    on top of :func:`copurchase_edges`."""
    from pyspark.sql import functions as F

    key = (id(spark), cache_key)
    with _EDGE_LOCK:
        if cache_key is not None and key in _ADJ_CACHE:
            return _ADJ_CACHE[key]
    art = "oriented_adj" if cache_key is not None else None
    edges = copurchase_edges(spark, lineitem, cache_key)
    deg = materialize(
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("d")), artifact=art)
    lower = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    oriented = (
        edges
        .join(deg.select(F.col("node").alias("u"),
                         F.col("d").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"),
                         F.col("d").alias("dv")), "v")
        .select(F.when(lower, F.col("u")).otherwise(F.col("v")).alias("s"),
                F.when(lower, F.col("v")).otherwise(F.col("u")).alias("t")))
    adj = materialize(
        oriented.groupBy("s").agg(
            F.sort_array(F.collect_list("t")).alias("nb")), artifact=art)
    out = (deg, oriented, adj)
    with _EDGE_LOCK:
        if cache_key is not None:
            _ADJ_CACHE[key] = out
    return out


def modularity_sql(
    dialect: str,
    lineitem: str = "lineitem",
    rounds: int = LPA_ROUNDS,
    edges_table: str | None = None,
    labels_table: str | None = None,
) -> str:
    """Newman modularity audit of the LPA communities (Newman & Girvan
    2004): per community c, its internal edge count e_c, degree mass
    deg_c, and contribution Q_c = e_c/m − (deg_c/2m)² in ppm — the
    quality score that says whether the community structure q210 feeds
    to canonical-selection/leakage audits is real or noise (Q near 0 =
    partition no better than random).

    Integer-exact in ppm via two-stage floor division; the probability
    term is computed as ``((10⁶·deg_c) DIV 2m · deg_c) DIV 2m`` so the
    largest intermediate is 10⁶·deg_c ≤ 10⁶·2m — int64-safe to
    m ≈ 4.6·10¹² edges (documented bound, far past a 100 TB basket
    graph). Same two floors on both engines: bit-identical.

    ``labels_table`` (Spark path): the label relation is consumed three
    times below (both endpoint joins + the degree mass), and Spark
    inlines CTEs — the entry materializes :func:`lpa_labels_sql` once
    and passes the pinned view; DuckDB instead pins the inline chain
    with MATERIALIZED."""
    from . import portable as P

    m = "MATERIALIZED " if dialect == "duckdb" else ""
    if labels_table is not None and edges_table is not None:
        body = f"""edges AS (SELECT u, v FROM {edges_table}),
lab AS (SELECT node, lbl FROM {labels_table})"""
    else:
        chain, fin = _lpa_chain(dialect, lineitem, rounds, edges_table)
        body = f"""{chain},
lab AS {m}(SELECT node, lbl FROM {fin})"""
    # Spark: lab (|V| rows, pinned cached view) and deg (|V| rows,
    # derived through an aggregate the planner cannot size) reach the
    # edges join as SortMergeJoins that shuffle the edge list — the
    # same shape the q131/q264 rounds had. Broadcasting the node-sized
    # sides keeps the edge relation exchange-free. DuckDB reads hints
    # as comments.
    bc_lab = "/*+ BROADCAST(la, lb) */ " if dialect == "spark" else ""
    bc_deg = "/*+ BROADCAST(d) */ " if dialect == "spark" else ""
    bc_ein = "/*+ BROADCAST(ei) */ " if dialect == "spark" else ""
    e_term = P.int_div("1000000 * COALESCE(ei.e_in, 0)", "mm.m", dialect)
    p_half = P.int_div("1000000 * ds.deg_sum", "(2 * mm.m)", dialect)
    p_term = P.int_div(f"({p_half}) * ds.deg_sum", "(2 * mm.m)", dialect)
    return f"""
WITH {body},
deg AS {m}(
  SELECT node, COUNT(*) AS d
  FROM (SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges) n
  GROUP BY node
),
ein AS {m}(
  SELECT {bc_lab}la.lbl AS community, COUNT(*) AS e_in
  FROM edges e
  JOIN lab la ON la.node = e.u
  JOIN lab lb ON lb.node = e.v AND lb.lbl = la.lbl
  GROUP BY la.lbl
),
dsum AS {m}(
  SELECT {bc_deg}la.lbl AS community, SUM(d.d) AS deg_sum,
         COUNT(*) AS n_members
  FROM lab la JOIN deg d ON d.node = la.node
  GROUP BY la.lbl
),
mm AS (SELECT COUNT(*) AS m FROM edges)
SELECT {bc_ein}CAST(ds.community AS BIGINT) AS community,
       CAST(ds.n_members AS BIGINT) AS n_members,
       CAST(COALESCE(ei.e_in, 0) AS BIGINT) AS e_in,
       CAST(ds.deg_sum AS BIGINT) AS deg_sum,
       CAST(({e_term}) - ({p_term}) AS BIGINT) AS q_contrib_ppm
FROM dsum ds
LEFT JOIN ein ei ON ei.community = ds.community
CROSS JOIN mm
ORDER BY community"""


PPR_ITERS = 3
PPR_TOP = 100


def ppr_sql(dialect: str, lineitem: str = "lineitem",
            seeds: int = KHOP_SEEDS, iters: int = PPR_ITERS,
            top: int = PPR_TOP,
            sym_table: str | None = None,
            deg_table: str | None = None,
            seed_values: list[int] | None = None,
            max_d: int | None = None) -> str:
    """Personalized PageRank from the ``seeds`` highest-degree nodes
    (Haveliwala 2002; the random walk restarts AT THE SEED SET instead
    of uniformly) — the seeded-importance member of the seeded trio
    next to k-hop reach (q255) and RA link prediction (q256): "which
    records matter most relative to THESE query nodes", the relevance
    propagation primitive for graph-shaped curation.

    Same fixed-point int64 arithmetic as :func:`pagerank_sql` (floor
    division, a-priori overflow bound checked loudly per round), but
    the support stays SPARSE: v₀ carries mass only at the seeds, each
    round expands it by one hop (inflow aggregate UNION ALL the seed
    restart mass, then one SUM per node) — at 100 TB with a handful of
    seeds the walk never touches most of the graph, which is exactly
    PPR's advantage over global PageRank. Every round CTE is
    referenced once by its successor (Spark-inline-safe); sym/deg come
    from the pinned session-cached views on Spark, MATERIALIZED CTEs
    on DuckDB.

    ``seed_values`` / ``max_d`` (Spark side, r9 guide §2.4): the seed
    set and degree bound ARE bounded driver values (``seeds`` rows /
    one int), but as CTEs Spark re-inlines them per reference — the
    seed relation is a full deg TopK sort ×(iters+1) references and
    the bound a deg MAX aggregate cross-joined into every round. The
    entry computes both once from the session-cached deg artifact and
    passes literals: seeds become a VALUES list, the overflow limit
    folds to a constant, the bound cross-joins disappear. The oracle
    keeps the self-contained text; identity proven by the gate hash."""
    m = "MATERIALIZED " if dialect == "duckdb" else ""
    if sym_table is not None and deg_table is not None:
        prefix = (f"sym AS (SELECT src, dst FROM {sym_table}),\n"
                  f"deg AS (SELECT node, d FROM {deg_table})")
    else:
        prefix = f"""{_edges_prefix(dialect, lineitem, None)},
sym AS {m}(
  SELECT u AS src, v AS dst FROM edges
  UNION ALL
  SELECT v AS src, u AS dst FROM edges
)"""
    idiv = (lambda a, b: f"({a} div {b})") if dialect == "spark" else (
        lambda a, b: f"({a} // {b})")
    restart = idiv(f"15 * {PR_SCALE}", "100")
    literal = seed_values is not None and max_d is not None
    lim = (str(9223372036854775807 // (85 * max_d)) if literal
           else idiv("9223372036854775807", "(85 * bb.mx)"))
    if dialect == "spark":
        guard = (lambda v: f"(CASE WHEN {v} <= {lim} THEN CAST({v} AS "
                 f"BIGINT) ELSE CAST(assert_true({v} <= {lim},"
                 f" 'ppr int64 overflow bound') AS BIGINT) END)")
    else:
        guard = (lambda v: f"(CASE WHEN {v} <= {lim} THEN CAST({v} AS "
                 f"BIGINT) ELSE CAST(error('ppr int64 overflow bound')"
                 f" AS BIGINT) END)")
    if literal:
        vals = ", ".join(f"(CAST({s} AS BIGINT))" for s in seed_values)
        seeds_cte = (f"seeds AS (SELECT seed FROM "
                     f"(VALUES {vals}) AS t(seed))")
    else:
        seeds_cte = (f"seeds AS {m}(\n  SELECT node AS seed FROM deg "
                     f"ORDER BY d DESC, node ASC LIMIT {seeds}\n),\n"
                     "bound AS (SELECT MAX(d) AS mx FROM deg)")
    parts = [f"""{prefix},
{seeds_cte},
v0 AS {m}(SELECT seed AS node, CAST({PR_SCALE} AS BIGINT) AS v
          FROM seeds)"""]
    # Spark: the per-round support v{k-1} and the degree relation are
    # |V|-bounded (the edge list is the only large relation), but both
    # reach the join through aggregates the planner cannot size, so it
    # planned SortMergeJoins that shuffled the edge list EVERY round.
    # Broadcasting them keeps sym exchange-free all rounds (the q131
    # PageRank treatment). DuckDB reads hints as comments.
    bc = "/*+ BROADCAST(vp, dg) */ " if dialect == "spark" else ""
    bound_join = "" if literal else "\n  CROSS JOIN bound bb"
    group_tail = "node" if literal else "node, bb.mx"
    for k in range(1, iters + 1):
        inflow = idiv(f"85 * SUM({idiv('vp.v', 'dg.d')})", "100")
        parts.append(f"""i{k} AS {m}(
  SELECT {bc}e.dst AS node, {inflow} AS v
  FROM sym e
  JOIN v{k - 1} vp ON vp.node = e.src
  JOIN deg dg ON dg.node = e.src
  GROUP BY e.dst
),
v{k} AS {m}(
  SELECT node, {guard("SUM(v)")} AS v
  FROM (SELECT node, v FROM i{k}
        UNION ALL
        SELECT seed AS node, {restart} AS v FROM seeds) u{bound_join}
  GROUP BY {group_tail}
)""")
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT CAST(node AS BIGINT) AS node, CAST(v AS BIGINT) AS score
FROM v{iters}
ORDER BY score DESC, node ASC
LIMIT {top}"""


_LPA_CACHE: dict = {}


def lpa_labels(spark, lineitem: str, cache_key: str | None = None,
               rounds: int = LPA_ROUNDS):
    """Materialized LPA label relation, once per (session, corpus) —
    consumed three times by the modularity audit (both endpoint joins +
    the degree mass), so pinning it matters on Spark (CTEs inline)."""
    key = (id(spark), cache_key, rounds)
    with _EDGE_LOCK:
        if cache_key is not None and key in _LPA_CACHE:
            return _LPA_CACHE[key]
    edges = copurchase_edges(spark, lineitem, cache_key)
    view = f"__lpa_edges_{abs(hash(key)) % 10**8}"
    edges.createOrReplaceTempView(view)
    labels = materialize(
        spark.sql(lpa_labels_sql("spark", rounds=rounds, edges_table=view)),
        artifact="lpa_labels" if cache_key is not None else None)
    with _EDGE_LOCK:
        if cache_key is not None:
            _LPA_CACHE[key] = labels
    return labels


# ---------------------------------------------------------------------------
# HyperANF — neighborhood-function estimation via HLL register merges
# ---------------------------------------------------------------------------

ANF_HUBS = 32
_ANF_CACHE: dict = {}


def _anf_r0_sql(dialect: str, deg: str) -> str:
    """Per-node radius-0 registers: sketch({v}) — one filled bucket per
    node from the Lehmer-mixed portable hash of the node id."""
    from . import portable as P
    from .sketches import HLL_M, _mix, hll_rho_expr

    s = "STRING" if dialect == "spark" else "VARCHAR"
    hv = _mix(P.rolling_hash(f"CAST(node AS {s})", dialect))
    w = P.int_div("hv", str(HLL_M), dialect)
    return f"""SELECT node, hv % {HLL_M} AS bucket, {hll_rho_expr()} AS m
FROM (SELECT node, hv, {w} AS w
      FROM (SELECT node, {hv} AS hv FROM {deg}) h0) h1"""


def _anf_round_sql(prev: str, sym: str) -> str:
    """One HyperANF round: R_{k+1}(v) = register-max of R_k over
    N(v) ∪ {v} — an edge × register join + a (node, bucket) MAX
    aggregate. Register payload per node is capped at HLL_M rows, so
    the join is bounded by |edges| × min(HLL_M, ball size): the
    64-registers-per-node ceiling is exactly what makes ANF run where
    exact neighborhood sets cannot (Boldi, Rosa, Vigna 2011)."""
    return f"""SELECT v AS node, bucket, MAX(m) AS m FROM (
  SELECT node AS v, bucket, m FROM {prev}
  UNION ALL
  SELECT e.src AS v, r.bucket, r.m
  FROM {sym} e JOIN {prev} r ON r.node = e.dst
) u GROUP BY v, bucket"""


def _anf_tail_sql(dialect: str, sym: str, deg: str, r1: str, r2: str,
                  hubs: int) -> str:
    """Estimate + exact-audit tail over materialized round registers:
    per-hub ball-size estimates from the r1/r2 registers through the
    shared HLL estimator (sketches.hll_est_ctes), exact |ball(v,1)| =
    deg+1 from the degree relation, exact |ball(v,2)| by a hub-bounded
    two-hop DISTINCT (|hubs| is fixed, so the audit join is seeds × d̄²
    at any corpus size — the same bound as q256's traversal)."""
    from .sketches import hll_const_ctes, hll_est_ctes

    # Spark: every tail relation downstream of the hub slice is tiny —
    # hubs is LIMIT {hubs} rows, hub registers <= hubs x 64, the
    # estimator outputs and exact audits are one row per hub — but all
    # are derived through joins/aggregates the planner cannot size, so
    # it planned SortMergeJoins and shuffled the 2.4M-row sym edge list
    # for the two-hop audit. Broadcast the hub-bounded sides so sym is
    # only ever streamed (guide: broadcast the side that fits; the
    # q256 seeded-traversal pattern). DuckDB: no hints, none needed.
    sp = dialect == "spark"
    bh = "/*+ BROADCAST(h) */ " if sp else ""
    ba = "/*+ BROADCAST(a) */ " if sp else ""
    bfin = "/*+ BROADCAST(h, e1, e2, x1, x2) */ " if sp else ""
    return f"""hubs AS (
  SELECT node FROM {deg} ORDER BY d DESC, node ASC LIMIT {hubs}
),
hr1 AS (
  SELECT {bh}r.node AS grp, r.bucket, r.m FROM {r1} r
  JOIN hubs h ON h.node = r.node
),
hr2 AS (
  SELECT {bh}r.node AS grp, r.bucket, r.m FROM {r2} r
  JOIN hubs h ON h.node = r.node
),
{hll_const_ctes()},
{hll_est_ctes(dialect, "hr1", "e1_")},
{hll_est_ctes(dialect, "hr2", "e2_")},
x1 AS (
  SELECT {bh}h.node, CAST(1 + d.d AS BIGINT) AS exact_ball1
  FROM hubs h JOIN {deg} d ON d.node = h.node
),
hub_adj AS (
  SELECT {bh}h.node, e1.dst
  FROM hubs h JOIN {sym} e1 ON e1.src = h.node
),
ball2 AS (
  SELECT {ba}a.node, e2.dst AS b
  FROM hub_adj a JOIN {sym} e2 ON e2.src = a.dst
  UNION ALL
  SELECT node, dst FROM hub_adj
  UNION ALL
  SELECT node, node FROM hubs
),
x2 AS (
  SELECT node, CAST(COUNT(DISTINCT b) AS BIGINT) AS exact_ball2
  FROM ball2 GROUP BY node
)
SELECT {bfin}h.node,
       e1.est_distinct AS est_ball1, x1.exact_ball1,
       e2.est_distinct AS est_ball2, x2.exact_ball2,
       e2.reg_check AS reg_check2
FROM hubs h
JOIN e1_est e1 ON e1.grp = h.node
JOIN e2_est e2 ON e2.grp = h.node
JOIN x1 ON x1.node = h.node
JOIN x2 ON x2.node = h.node
ORDER BY h.node"""


def hyperanf_sql(dialect: str, lineitem: str = "lineitem",
                 edges_table: str | None = None,
                 hubs: int = ANF_HUBS) -> str:
    """HyperANF over the co-purchase graph (Boldi, Rosa & Vigna,
    WWW 2011 — the HLL-register formulation of ANF, Palmer et al.
    KDD 2002): per-node HyperLogLog registers of the k-hop ball,
    advanced one radius per round by register-max merges along edges.
    THE scalable neighborhood-function / effective-diameter primitive:
    exact k-hop sets explode combinatorially, while register merges
    keep O(HLL_M) state per node and one edge-linear join per round.

    Composes this module's graph machinery with sketches.py's portable
    HLL: registers, estimator, and the frozen linear-counting branch
    are all integer-exact cross-engine, so the gate hash-verifies the
    REGISTER ALGEBRA after two merge rounds (reg_check2), the integer
    ball-size estimates, and the exact audits side by side. Output:
    the ``hubs`` highest-degree nodes with est/exact |ball(v,1)| and
    |ball(v,2)| (the pytest asserts the HLL accuracy band; exactness
    across engines is what the driver hashes).

    Oracle form: single statement, rounds as MATERIALIZED CTEs (each
    round relation is referenced by the next round AND the hub slice;
    the Spark entry materializes per-round temp views for the same
    reason — components.hyperanf)."""
    m = "MATERIALIZED " if dialect == "duckdb" else ""
    return f"""
WITH {_edges_prefix(dialect, lineitem, edges_table)},
sym AS {m}(
  SELECT u AS src, v AS dst FROM edges
  UNION ALL
  SELECT v AS src, u AS dst FROM edges
),
r0 AS {m}({_anf_r0_sql(dialect, "deg")}),
r1 AS {m}({_anf_round_sql("r0", "sym")}),
r2 AS {m}({_anf_round_sql("r1", "sym")}),
{_anf_tail_sql(dialect, "sym", "deg", "r1", "r2", hubs)}
"""


def _anf_round_bcast_sql(prev: str, sym: str) -> str:
    """:func:`_anf_round_sql` with the register side broadcast-hinted —
    the Spark driver's round text. The round relations are materialized
    (LogicalRDD, no stats), so the planner sort-merge-joins the
    |regs| ≈ 64·|V| register relation against the edge list; at round 2
    that SMJ generated Σ_edges |regs(dst)| ≈ 128 M rows through sorted
    merge at sf0.1 (13.8 s measured). The register relation is
    node-bounded (≤ 64 int64-triple rows per node — the same per-round
    vertex-relation bound as PageRank q131's broadcasts), so broadcast
    it and stream the edges: round 2 13.8 s → 5.9 s, fresh-session
    build total 15.6 s → 7.8 s. (A 64-slot array-packed round measured
    1.3 s steady but pays ~10 s one-time Janino compilation for its
    64-aggregate codegen shape — a net LOSS for a once-per-session
    artifact build; measured and rejected.) A deployment whose vertex
    set outgrows the broadcast cap drops the hint and keeps the SMJ.
    Hints never change results; the oracle keeps the hint-free shared
    text (:func:`_anf_round_sql`)."""
    return f"""SELECT v AS node, bucket, MAX(m) AS m FROM (
  SELECT node AS v, bucket, m FROM {prev}
  UNION ALL
  SELECT /*+ BROADCAST(r) */ e.src AS v, r.bucket, r.m
  FROM {sym} e JOIN {prev} r ON r.node = e.dst
) u GROUP BY v, bucket"""


def hyperanf(spark, lineitem: str, cache_key=None,
             hubs: int = ANF_HUBS) -> DataFrame:
    """Spark driver for :func:`hyperanf_sql`: same round fragments,
    with each round's register relation MATERIALIZED as a temp view —
    r_k is read by both r_{k+1} and the hub slice, and Spark inlines
    multi-referenced CTEs (the kcenter/IVF-PQ artifact pattern).
    Registers are cached per (session, corpus): the sketch IS the
    index a production deployment persists alongside the graph.
    r9: round merges broadcast the node-bounded register side
    (:func:`_anf_round_bcast_sql`) — build 15.6 s → 7.8 s at sf0.1."""
    key = (id(spark), cache_key, hubs)
    with _EDGE_LOCK:
        views = _ANF_CACHE.get(key)
    if views is None:
        sym, deg = copurchase_sym_deg(spark, lineitem,
                                      cache_key=cache_key)
        tag = abs(hash(key)) % 10**8
        sv, dv = f"__anf_sym_{tag}", f"__anf_deg_{tag}"
        sym.createOrReplaceTempView(sv)
        deg.createOrReplaceTempView(dv)

        def mk(name, sql_text):
            v = f"__anf_{name}_{tag}"
            materialize(
                spark.sql(sql_text), artifact="anf_registers"
            ).createOrReplaceTempView(v)
            return v

        r0 = mk("r0", _anf_r0_sql("spark", dv))
        r1 = mk("r1", _anf_round_bcast_sql(r0, sv))
        r2 = mk("r2", _anf_round_bcast_sql(r1, sv))
        views = (sv, dv, r1, r2)
        with _EDGE_LOCK:
            _ANF_CACHE[key] = views
    sv, dv, r1, r2 = views
    return spark.sql(
        "WITH " + _anf_tail_sql("spark", sv, dv, r1, r2, hubs))
