"""Event-time streaming operators over the ``events`` stream.

Beyond-reference extensions (SURVEY.md §2.3 note, §7 M6): the reference's
only streaming mode is trx_seq-ordered CDC ingest (no event time), so
these are additive capabilities for the training-data pipeline:

- :func:`tumbling_counts` — watermarked tumbling-window aggregate;
- :func:`sliding_counts` — overlapping windows (slide < size);
- :func:`session_counts` — gap-based session windows;
- :func:`running_totals` — custom stateful operator via
  ``applyInPandasWithState`` (per-key running aggregate with state
  timeout), the escape hatch for semantics windowed aggs can't express.

All four take ANY DataFrame (batch or streaming): the logical plan is
identical, which is the Structured Streaming unified-model contract —
batch runs double as the oracle for the streaming runs in tests.

Scale notes (streams at cluster scale):

- the watermark bounds state: windows older than max(event_time) - delay
  are finalized and evicted, so state size tracks the delay × key
  cardinality, not stream length;
- windowed aggregation shuffles by (window, key) with map-side partial
  aggregation — the same partial/final split as batch groupBy;
- ``applyInPandasWithState`` state lives in the state store (RocksDB on
  a real cluster: set ``spark.sql.streaming.stateStore.providerClass``);
  keep per-key state small (a few scalars here) and rely on timeouts to
  evict idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _dsum(col: str, alias: str):
    """Order-independent SUM (exact decimal accumulation, double out) —
    same determinism rule as the batch contract queries."""
    return F.sum(F.col(col).cast("decimal(18,4)")).cast("double").alias(alias)


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-(hour, event_type) counts/sums; late rows beyond the watermark
    are dropped once the window finalizes (streaming) — in batch the
    watermark is a no-op and results equal the q26 batch aggregate."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("num_events"), _dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "num_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Overlapping windows: each row lands in window/slide buckets."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("num_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "num_events",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Gap-based sessionization per event_type: a session extends while
    successive events arrive within ``gap``; state is evicted when the
    watermark passes the session end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "event_type")
        .agg(F.count("*").alias("num_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "event_type",
            "num_events",
        )
    )


def user_sessions(
    events: DataFrame,
    gap: str = "6 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user gap-based sessions (the streaming twin of the batch
    q29 shape), with integer-exact value accumulation so the emitted
    rows hash-match a relational islands oracle regardless of
    micro-batch boundaries. Append mode: a session row is emitted
    exactly once, when the watermark passes its close — the property
    the streaming gate (q164) verifies end to end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)")
            ).alias("total_scaled"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_scaled",
        )
    )


RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("num_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("num_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _update_running(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"event_type": [key[0]], "num_events": [n], "total_value": [round(total, 4)]}
    )


def running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-event_type running count/sum across
    micro-batches (``applyInPandasWithState``). Emits the updated running
    totals for every key seen in each micro-batch — semantics a windowed
    agg can't express (unbounded, cross-batch, update-on-arrival).

    Batch parity: on a batch DataFrame the same groupBy/agg collapses to
    one "micro-batch", so a plain aggregate is its oracle (see tests).
    """
    return events.groupBy("event_type").applyInPandasWithState(
        _update_running,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def view_purchase_attribution(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's views in the preceding ``horizon``.

    The canonical streaming join pattern: both sides watermarked, and
    the join condition carries an explicit event-time band — that band
    is what lets the engine evict buffered rows (a view older than
    max(purchase_ts) - horizon - watermark can never match again), so
    state is bounded by rate x (horizon + watermark), not stream length.
    Batch and streaming share the plan; the batch run is the oracle.

    ``how='left_outer'`` keeps UNCONVERTED purchases (the rows the inner
    join drops — exactly the set a conversion funnel needs): a
    NULL-matched row is emitted only once the watermark proves no
    future view can still join it, so outer results trickle out on
    state eviction rather than at row arrival — the gate feeds
    time-ordered slices plus a far-future flush sentinel so every real
    purchase resolves before the stream ends.
    """
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    ).withWatermark("view_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    ).withWatermark("purchase_ts", watermark)
    return p.join(
        v,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")),
        how,
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "view_id",
        "view_ts",
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    time_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with bounded state
    (``dropDuplicatesWithinWatermark``): at-least-once sources (Kinesis,
    Kafka, retried file lands) re-deliver events; this keeps the first
    arrival per key and drops re-deliveries that arrive within the
    watermark delay of each other.

    Why not plain ``dropDuplicates`` on a stream: that must keep EVERY
    key ever seen in state (unbounded growth). Within-watermark dedup
    evicts a key's state once the watermark passes its event time, so
    state is bounded by (delivery-delay window) x (key arrival rate) —
    the contract that makes dedup viable on an unbounded 100 TB/day
    stream. The trade: re-deliveries farther apart than the watermark
    are NOT deduped, which matches real redelivery behavior (retries
    cluster within seconds/minutes).

    On a batch DataFrame (``dropDuplicatesWithinWatermark`` rejects
    batch plans) this degrades to exact ``dropDuplicates`` — the same
    result a within-watermark dedup converges to when no redelivery
    gap exceeds the watermark, and the oracle the streaming test uses.
    """
    if not events.isStreaming:
        return events.dropDuplicates(list(keys))
    return events.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


# -- integer-exact variant for the driver's hash gate -----------------------

EXACT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("num_events", T.LongType()),
        T.StructField("total_scaled", T.LongType()),
    ]
)
_EXACT_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total_scaled", T.LongType()),
    ]
)
VALUE_SCALE = 10_000


def _update_running_exact(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import numpy as np

    n, total = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # floor(x·S + 0.5): per-row half-up rounding to scaled int64 —
        # the sum is then exact integer arithmetic, so the running total
        # is independent of micro-batch boundaries AND matches the same
        # formula evaluated relationally by the oracle.
        total += int(
            np.floor(pdf["value"].to_numpy() * VALUE_SCALE + 0.5)
            .astype("int64")
            .sum()
        )
    state.update((n, total))
    yield pd.DataFrame(
        {"event_type": [key[0]], "num_events": [n], "total_scaled": [total]}
    )


def running_totals_exact(events: DataFrame) -> DataFrame:
    """Hash-gateable form of :func:`running_totals`: the running sum
    accumulates half-up-rounded scaled int64 values, so the final state
    is bit-identical to the relational aggregate no matter how the
    stream was micro-batched. The ``num_events`` column is monotone per
    key — consumers pick each key's max-n row as the final state."""
    return events.groupBy("event_type").applyInPandasWithState(
        _update_running_exact,
        outputStructType=EXACT_SCHEMA,
        stateStructType=_EXACT_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


PATTERN = ("view", "click", "purchase")
_PATTERN_OUT = "user_id long, hit_event_id long"
_PATTERN_STATE = "e1 string, e2 string"


def _detect_pattern(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    user = key[0]
    pdf = pd.concat(list(pdfs))
    pdf = pdf.sort_values(["ts", "event_id"])
    e1, e2 = state.get if state.exists else (None, None)
    hits: list[tuple[int, int]] = []
    for et, eid in zip(pdf["event_type"], pdf["event_id"]):
        if (e1, e2, et) == PATTERN:
            hits.append((user, int(eid)))
        e1, e2 = e2, et
    state.update((e1, e2))
    if hits:
        yield pd.DataFrame(hits, columns=["user_id", "hit_event_id"])


def pattern_hits(events: DataFrame) -> DataFrame:
    """Cross-batch sequence-pattern detection (CEP-lite): emit an event
    whenever a user's last three event types equal view>click>purchase —
    the conversion trigger a windowed aggregate cannot express because
    the match can SPAN micro-batch boundaries; the per-user state is the
    last two event types (two strings — constant, never the history).

    Determinism: rows sort by (ts, event_id) inside each micro-batch,
    and the gate feeds time-quartile-ordered batches, so the global
    per-user order equals the batch order and the streamed hits equal
    the relational lag() oracle row-for-row.

    Spark 4 note, stated honestly: the current-generation API for this
    operator is ``transformWithStateInPandas`` (typed state, timers,
    TTL); its Python side requires protobuf, which this container lacks
    — ``tests/test_streaming_windows.py`` carries a runtime-gated test
    that exercises the same processor there when the dependency exists.
    The semantics and state shape are identical on either API."""
    return events.groupBy("user_id").applyInPandasWithState(
        _detect_pattern,
        outputStructType=_PATTERN_OUT,
        stateStructType=_PATTERN_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
