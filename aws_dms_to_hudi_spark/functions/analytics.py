"""Event-analytics operators: staged funnel, retention cohorts, activity
islands.

These are the classic product-analytics shapes a lake engine is asked for
once events land (reference surface: arbitrary ``transformer_sql`` over the
batch, SURVEY.md §2.3 — these pin the multi-CTE window/join compositions).
Spark side is DataFrame API; each has a hand-written DuckDB oracle built
from the same portable primitives.

Portability notes:

- event-time deltas compare **epoch microseconds as int64** on both engines
  (Spark ``unix_micros`` / DuckDB ``epoch_us``) — ``unix_timestamp`` floors
  to seconds and DuckDB ``epoch`` returns a fractional double, either of
  which flips rows right at a gap boundary;
- week arithmetic uses ``date_trunc('week', …)`` (Monday-start in both)
  cast to DATE, with offsets as whole-day diffs integer-divided by 7.

Scale notes (100 TB):

- funnel: three per-user aggregations chained by equi-joins — every shuffle
  is on ``user_id``, stage outputs shrink monotonically, and AQE broadcasts
  the later (smaller) sides;
- retention: cohort assignment is one per-user agg; the activity matrix is
  a distinct + join + agg, all hash-partitioned on ``user_id``; output is
  O(weeks²) — tiny;
- islands: two windows over one ``user_id`` partitioning — Spark plans a
  single Exchange reused by both sorts; per-partition work is linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GAP_US = 3_600 * 1_000_000  # 1 hour island gap, int64 microseconds

FUNNEL_STAGES = ("view", "click", "purchase")


def funnel(events: DataFrame) -> DataFrame:
    """Strictly-ordered conversion funnel view → click → purchase.

    A user counts for stage k+1 only with an event AFTER their first
    stage-k event (first-touch attribution). Returns one row of stage
    counts.
    """
    e = events
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("vt"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("ct"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    return (
        v.agg(F.count("*").alias("n_viewed"))
        .crossJoin(c.agg(F.count("*").alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchased_after_click")))
    )


def funnel_oracle_sql(table: str = "events") -> str:
    return f"""
WITH v AS (SELECT user_id, MIN(ts) AS vt FROM {table}
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, MIN(e.ts) AS ct FROM {table} e
      JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.vt GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(e.ts) AS pt FROM {table} e
      JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.ct GROUP BY e.user_id)
SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
       (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
       (SELECT COUNT(*) FROM p) AS n_purchased_after_click
"""


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Weekly retention matrix: cohort week (user's first-ever event week)
    × week offset → distinct active users."""
    first = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = (
        events.select(
            "user_id", F.date_trunc("week", "ts").cast("date").alias("w")
        )
        .distinct()
    )
    return (
        active.join(first, "user_id")
        .withColumn(
            "week_offset",
            (F.datediff("w", "cohort_week") / 7).cast("int"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        # ISO string output: DATE surfaces as date32 from Spark but
        # datetime64 from DuckDB-via-Arrow — a dtype-only hash trap.
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
        )
        .orderBy("cohort_week", "week_offset")
    )


def retention_oracle_sql(table: str = "events") -> str:
    return f"""
WITH f AS (SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cw
           FROM {table} GROUP BY user_id),
a AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
      FROM {table})
SELECT strftime(f.cw, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', f.cw, a.w) // 7 AS INT) AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_active
FROM a JOIN f ON a.user_id = f.user_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


def activity_islands(events: DataFrame) -> DataFrame:
    """Gaps-and-islands: maximal runs of per-user events with < 1 h between
    consecutive events (lag-break flag + running sum — the other classic
    sessionization encoding next to ``session_window``, q29).

    Returns per user: number of islands and the largest island's event
    count.
    """
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tus = F.unix_micros("ts")
    brk = F.when(
        F.lag(tus).over(order).isNull()
        | ((tus - F.lag(tus).over(order)) > F.lit(GAP_US)),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    islands = (
        events.select("user_id", "ts", "event_id")
        .withColumn("island", F.sum(brk).over(run))
        .groupBy("user_id", "island")
        .agg(F.count("*").alias("island_len"))
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count("*").alias("n_islands"),
            F.max("island_len").alias("max_island_len"),
        )
        .orderBy("user_id")
    )


HOLD_US = 1_800 * 1_000_000  # 30-minute interval per event, int64 µs


def peak_concurrency(events: DataFrame) -> DataFrame:
    """Maximum number of simultaneously-open 30-minute event intervals
    (half-open [ts, ts+30min)) and the earliest instant it occurs —
    the interval-sweep / "max concurrent sessions" operator.

    Classic sweep: +1 at each start, −1 at each end, running sum over
    global time order. The scale problem is the GLOBAL running sum — a
    naive unpartitioned window dies at 100 TB — so (1) deltas are
    pre-aggregated to one net change per distinct instant (ends sort
    before starts is then irrelevant: within one instant the running
    value dips before it rises, so every intermediate peak is visible
    at an instant boundary), and (2) the prefix sum runs through
    operators.rank.global_running_sum — range-bucketed two-pass, no
    single-partition window. Output: one row, exact."""
    from ..operators.rank import global_running_sum

    pts = events.select(
        F.unix_micros("ts").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        events.select(
            (F.unix_micros("ts") + F.lit(HOLD_US)).alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    net = pts.groupBy("t").agg(F.sum("delta").alias("net"))
    sw = global_running_sum(net, "t", "net", out_col="conc")
    # single-pass peak + earliest-instant: max over (conc, -t) structs
    # orders by conc first, then by latest -t = earliest t.
    m = sw.agg(
        F.max(
            F.struct(F.col("conc").alias("c"), (-F.col("t")).alias("nt"))
        ).alias("s")
    )
    return m.select(
        F.col("s.c").cast("long").alias("peak_concurrency"),
        (-F.col("s.nt")).cast("long").alias("peak_epoch_us"),
    )


def peak_concurrency_oracle_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`peak_concurrency` — the plain global
    window form (fine in a single-node engine)."""
    return f"""
WITH pts AS (
  SELECT epoch_us(ts) AS t, 1 AS delta FROM {table}
  UNION ALL
  SELECT epoch_us(ts) + {HOLD_US}, -1 FROM {table}
),
net AS (SELECT t, SUM(delta) AS net FROM pts GROUP BY t),
sw AS (SELECT t, SUM(net) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
         AS conc FROM net),
mx AS (SELECT MAX(conc) AS m FROM sw)
SELECT CAST(mx.m AS BIGINT) AS peak_concurrency,
       CAST(MIN(sw.t) AS BIGINT) AS peak_epoch_us
FROM sw CROSS JOIN mx WHERE sw.conc = mx.m GROUP BY mx.m
"""


ATTR_WINDOW_US = 7 * 86_400 * 1_000_000  # 7-day lookback, int64 µs


def linear_attribution(events: DataFrame) -> DataFrame:
    """Linear multi-touch revenue attribution: each purchase's value
    splits equally across the user's view/click touches in the 7 days
    before it; purchases with no preceding touch credit a 'direct'
    channel in full. Output: per-channel attributed revenue + credit
    counts.

    Plan shape: one user-partitioned range join (purchases × touches,
    bounded by the lookback window) + two hash aggregates — the same
    per-user shuffle family as the funnel; nothing global. Per-row
    value/n is IEEE-identical on both engines; the revenue SUM runs
    through a DECIMAL cast so it is order-independent."""
    t = events.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.unix_micros("ts").alias("tt"),
        F.col("event_type").alias("channel"),
    )
    b = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("pt"),
        "value",
        F.col("event_id").alias("buy_id"),
    )
    j = b.join(
        t,
        [
            b.user_id == t.user_id,
            t.tt < b.pt,
            t.tt >= b.pt - F.lit(ATTR_WINDOW_US),
        ],
        "left",
    ).select("buy_id", "value", "channel")
    cnt = j.groupBy("buy_id").agg(F.count("channel").alias("n"))
    credits = (
        j.join(cnt, "buy_id")
        .select(
            F.coalesce(F.col("channel"), F.lit("direct")).alias("channel"),
            F.when(F.col("n") == 0, F.col("value"))
            .otherwise(F.col("value") / F.col("n"))
            .alias("credit"),
        )
    )
    return (
        credits.groupBy("channel")
        .agg(
            F.round(
                F.sum(F.col("credit").cast("decimal(28,8)")).cast("double"),
                4,
            ).alias("attributed_revenue"),
            F.count(F.lit(1)).cast("long").alias("n_credits"),
        )
        .orderBy("channel")
    )


def attribution_oracle_sql(table: str = "events") -> str:
    """DuckDB oracle for :func:`linear_attribution`."""
    return f"""
WITH t AS (
  SELECT user_id, epoch_us(ts) AS tt, event_type AS channel
  FROM {table} WHERE event_type IN ('view', 'click')
),
b AS (
  SELECT user_id, epoch_us(ts) AS pt, value, event_id AS buy_id
  FROM {table} WHERE event_type = 'purchase'
),
j AS (
  SELECT b.buy_id, b.value, t.channel
  FROM b LEFT JOIN t ON b.user_id = t.user_id
   AND t.tt < b.pt AND t.tt >= b.pt - {ATTR_WINDOW_US}
),
cnt AS (SELECT buy_id, COUNT(channel) AS n FROM j GROUP BY buy_id),
credits AS (
  SELECT COALESCE(j.channel, 'direct') AS channel,
         CASE WHEN c.n = 0 THEN j.value ELSE j.value / c.n END AS credit
  FROM j JOIN cnt c ON j.buy_id = c.buy_id
)
SELECT channel,
       round(CAST(SUM(CAST(credit AS DECIMAL(28,8))) AS DOUBLE), 4)
         AS attributed_revenue,
       CAST(COUNT(*) AS BIGINT) AS n_credits
FROM credits
GROUP BY channel
ORDER BY channel"""


def islands_oracle_sql(table: str = "events") -> str:
    return f"""
WITH o AS (
  SELECT user_id, ts, event_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM {table}
), f AS (
  SELECT user_id, ts, event_id,
         CASE WHEN gap_us IS NULL OR gap_us > {GAP_US} THEN 1 ELSE 0 END
           AS brk
  FROM o
), i AS (
  SELECT user_id,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM f
), per_island AS (
  SELECT user_id, island, COUNT(*) AS island_len
  FROM i GROUP BY user_id, island
)
SELECT user_id, COUNT(*) AS n_islands,
       CAST(MAX(island_len) AS BIGINT) AS max_island_len
FROM per_island GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# key-distribution / skew profiler
# ---------------------------------------------------------------------------

SKEW_COLS = ("l_suppkey", "l_returnflag", "l_linestatus")


def skew_profile_sql(
    dialect: str,
    table: str = "lineitem",
    cols: tuple[str, ...] = SKEW_COLS,
    top: int = 5,
) -> str:
    """Per-column key-distribution profile: the ``top`` heaviest values
    with counts and share, plus distinct-count and a skew factor
    (``max_cnt · n_distinct / total`` — 1.0 is perfectly uniform; the
    factor is how much hotter the hottest key runs than uniform).

    This is the diagnostic you run BEFORE picking join/agg keys at
    100 TB: it tells you which keys need salting (operators/skew.py) or
    AQE skew-join handling. One melt (col, value) union feeding ONE
    hash-aggregate shuffle — with columnar parquet each branch scans
    only its own column, so the union costs one effective pass."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    pairs = " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, CAST({c} AS {s}) AS value FROM {table}"
        for c in cols
    )
    return f"""
WITH pairs AS ({pairs}),
counts AS (
  SELECT col_name, value, COUNT(*) AS cnt FROM pairs
  GROUP BY col_name, value
),
stats AS (
  SELECT col_name, COUNT(*) AS n_distinct,
         CAST(SUM(cnt) AS BIGINT) AS total, MAX(cnt) AS max_cnt
  FROM counts GROUP BY col_name
),
ranked AS (
  SELECT col_name, value, cnt,
         row_number() OVER (PARTITION BY col_name
                            ORDER BY cnt DESC, value NULLS LAST) AS rnk
  FROM counts
)
SELECT r.col_name AS col_name, CAST(r.rnk AS BIGINT) AS rnk, r.value, r.cnt,
       s.n_distinct,
       round(CAST(r.cnt AS DOUBLE) / CAST(s.total AS DOUBLE), 6) AS share,
       round(CAST(s.max_cnt AS DOUBLE) * CAST(s.n_distinct AS DOUBLE)
             / CAST(s.total AS DOUBLE), 3) AS skew_factor
FROM ranked r JOIN stats s ON r.col_name = s.col_name
WHERE r.rnk <= {top}
ORDER BY r.col_name, rnk
"""


def seasonal_resid_sql(
    dialect: str, events: str = "events", period: int = 168
) -> str:
    """The residual grid of :func:`seasonal_anomaly_sql` as a standalone
    statement — (event_type, hb, n, expected, r), one row per dense
    grid hour. Split out so the Spark caller can MATERIALIZE it once:
    the anomaly statement references the residual relation through
    med → dev → mad → final, and Spark's CTE inlining re-derived the
    whole events-scan → grid → self-join chain for every reference
    (measured ~2.0 s at sf0.1; with the tiny materialized grid —
    |types|·|hours| rows — the tail is sub-second). DuckDB materializes
    CTEs natively, so the oracle keeps the single-text form."""
    from . import portable as P

    div = lambda a, b: P.int_div(a, b, dialect)  # noqa: E731
    if dialect == "spark":
        epoch = "CAST(ts AS BIGINT)"
        grid = (
            "SELECT event_type, lo + kk AS hb FROM bounds "
            "LATERAL VIEW explode(sequence(0, CAST(hi - lo AS INT))) s AS kk"
        )
    else:
        epoch = "CAST(floor(epoch(ts)) AS BIGINT)"
        grid = (
            "SELECT event_type, lo + unnest(range(0, hi - lo + 1)) AS hb "
            "FROM bounds"
        )
    return f"""
WITH ev AS (
  SELECT event_type, {div(epoch, 3600)} AS hb FROM {events}
),
cnt AS (
  SELECT event_type, hb, CAST(COUNT(*) AS BIGINT) AS n
  FROM ev GROUP BY event_type, hb
),
bounds AS (
  SELECT event_type, MIN(hb) AS lo, MAX(hb) AS hi
  FROM cnt GROUP BY event_type
),
grid AS ({grid}),
dense AS (
  SELECT g.event_type, g.hb, COALESCE(c.n, 0) AS n
  FROM grid g LEFT JOIN cnt c
    ON g.event_type = c.event_type AND g.hb = c.hb
)
SELECT a.event_type, a.hb, a.n, b.n AS expected, a.n - b.n AS r
FROM dense a JOIN dense b
  ON a.event_type = b.event_type AND b.hb = a.hb - {period}
"""


def seasonal_anomaly_sql(
    dialect: str, events: str = "events", period: int = 168, k: int = 3,
    resid_table: str | None = None,
) -> str:
    """Seasonal-naive anomaly detection over the hourly event stream —
    the monitoring op of an ingestion pipeline: expected(hour) =
    count(hour − one week), residual = actual − expected, and an hour is
    anomalous when its residual deviates from the per-type median
    residual by more than ``k``·MAD (the robust band of q196 — one
    outage hour cannot inflate its own threshold).

    All arithmetic integer-or-0.5-grid: hourly counts are BIGINT (a
    dense hour grid NULL-fills silent hours to 0, so a dead pipeline is
    the loudest anomaly, not a missing row); residuals are integer;
    medians/MADs of integers land on the exact 0.5 grid (doubled into
    BIGINTs for the gate). The week-lag is an EQUI-join on
    (type, hour − {period}) — never a lag window, so a single type's
    series needn't fit one task; the grid explode is constant fan-out
    per type-bounds row. Output: only the anomalous hours.

    ``resid_table`` (Spark side) swaps the residual-grid derivation for
    a pre-materialized relation — see :func:`seasonal_resid_sql`."""
    if resid_table is not None:
        resid = f"resid AS (SELECT * FROM {resid_table})"
    else:
        inner = seasonal_resid_sql(dialect, events, period).strip()
        resid = f"resid AS ({inner})"
    return f"""
WITH {resid},
med AS (SELECT event_type, median(r) AS m FROM resid GROUP BY event_type),
dev AS (
  SELECT v.event_type, v.hb, v.n, v.expected, v.r,
         ABS(v.r - m.m) AS adev
  FROM resid v JOIN med m ON v.event_type = m.event_type
),
mad AS (SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type)
SELECT d.event_type, CAST(d.hb AS BIGINT) AS hour_bucket,
       d.n AS actual, d.expected, CAST(d.r AS BIGINT) AS residual,
       CAST(2 * d.adev AS BIGINT) AS adev_x2,
       CAST(2 * a.mad AS BIGINT) AS mad_x2
FROM dev d JOIN mad a ON d.event_type = a.event_type
WHERE d.adev > {k} * a.mad
ORDER BY d.event_type, d.hb"""


def sequence_examples_sql(
    dialect: str, events: str = "events", ctx: int = 3, max_pos: int = 20
) -> str:
    """Next-event training-example construction: per user, the event
    stream in (ts, event_id) order becomes supervised rows
    (context = last ``ctx`` event types joined '>', label = next event
    type) — the dataset-materialization step ahead of a sequence model.
    Sequences cap at the first ``max_pos`` events per user so one
    hyperactive user cannot dominate the training set (and the window
    state stays bounded by the cap — at 100 TB the cap IS the
    per-partition bound). One shuffle on user_id; context and label
    come from a ROWS frame and lead() over the same window order, so
    ties cannot produce divergent context/label pairs."""
    if dialect == "spark":
        ctx_expr = (
            f"array_join(collect_list(event_type) OVER "
            f"(PARTITION BY user_id ORDER BY ts, event_id "
            f"ROWS BETWEEN {ctx - 1} PRECEDING AND CURRENT ROW), '>')"
        )
    else:
        ctx_expr = (
            f"array_to_string(list(event_type) OVER "
            f"(PARTITION BY user_id ORDER BY ts, event_id "
            f"ROWS BETWEEN {ctx - 1} PRECEDING AND CURRENT ROW), '>')"
        )
    return f"""
WITH seq AS (
  SELECT user_id, event_type,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS pos,
         {ctx_expr} AS context,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS label
  FROM {events}
)
SELECT user_id, CAST(pos AS BIGINT) AS pos, context, label
FROM seq
WHERE label IS NOT NULL AND pos <= {max_pos}
ORDER BY user_id, pos"""


def ab_test_sql(dialect: str, events: str = "events") -> str:
    """A/B experiment readout — the analytics stage of an online
    experiment: users assigned to variants by the deterministic hash
    split (the q32 expression, so assignment is reproducible on any
    engine or layout), conversion = the user crossed the median purchase count (the fixture's every user purchases, so plain did-purchase is degenerate), and the
    two-proportion pooled z-statistic for the difference.

    Determinism: user/conversion counts are exact integers; the
    z computation is ONE fixed double expression tree over those
    integers (shares, pooled variance, sqrt, one division — identical
    IEEE sequence on both engines), rounded to 6dp for the gate.
    Plan: one per-user aggregate (conversion flag), one 2-row variant
    aggregate, one 1-row readout — nothing wider than the user key
    shuffle."""
    from .sampling import bucket_expr

    # 50/50 assignment from the hash bucket's parity — reuses the split
    # hash so an experiment's variants and the dataset's splits draw
    # from the same deterministic randomness
    variant = f"({bucket_expr('user_id', dialect)}) % 2"
    return f"""
WITH per_user AS (
  SELECT user_id, {variant} AS variant,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                        THEN 1 ELSE 0 END) >= 14
              THEN 1 ELSE 0 END AS conv
  FROM {events}
  GROUP BY user_id
),
v AS (
  SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(conv) AS BIGINT) AS c
  FROM per_user GROUP BY variant
),
wide AS (
  SELECT
    CAST(MAX(CASE WHEN variant = 0 THEN n END) AS BIGINT) AS n_a,
    CAST(MAX(CASE WHEN variant = 0 THEN c END) AS BIGINT) AS c_a,
    CAST(MAX(CASE WHEN variant = 1 THEN n END) AS BIGINT) AS n_b,
    CAST(MAX(CASE WHEN variant = 1 THEN c END) AS BIGINT) AS c_b
  FROM v
)
SELECT n_a, c_a, n_b, c_b,
       CAST(floor(1000000.0 * c_a / n_a) AS BIGINT) AS conv_a_ppm,
       CAST(floor(1000000.0 * c_b / n_b) AS BIGINT) AS conv_b_ppm,
       round(
         (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
          - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
         / sqrt(
             (CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
             * (1.0 - CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
             * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))
           ), 6) AS z_pooled
FROM wide"""

