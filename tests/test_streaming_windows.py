"""Event-time streaming operators (streaming/windows.py).

Strategy: the unified model means the same plan runs batch and
streaming. Each operator is checked two ways:

1. batch-mode result vs a DuckDB oracle (exact semantics);
2. streaming-mode (file source, availableNow, multiple micro-batches)
   vs the batch-mode result — convergence under micro-batching.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aws_dms_to_hudi_spark.streaming import windows as W

from tests.util import assert_same, duck_con


@pytest.fixture(scope="module")
def events_dir(spark, sf_smoke, tmp_path_factory):
    """events re-landed as micros-timestamp parquet split into several
    files so availableNow produces multiple micro-batches."""
    out = tmp_path_factory.mktemp("events_src")
    import __spark_entry__ as entry

    df = entry._events(spark, sf_smoke)
    df.repartition(4).write.mode("overwrite").parquet(str(out / "data"))
    return out


def _stream(spark, events_dir):
    schema = spark.read.parquet(str(events_dir / "data")).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(events_dir / "data"))
    )


def _run_stream(spark, sdf, tmp_path, name, output_mode):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_batch_matches_oracle(spark, sf_smoke, events_dir):
    batch = spark.read.parquet(str(events_dir / "data"))
    got = W.tumbling_counts(batch).orderBy("window_start", "event_type")
    con = duck_con(sf_smoke)
    oracle = con.execute(
        "SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, "
        "event_type, COUNT(*) AS num_events, "
        "CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value "
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).df()
    assert_same(got, oracle)


def test_tumbling_stream_converges_to_batch(spark, events_dir, tmp_path):
    """Update-mode convergence: the fixture files are NOT time-ordered, so
    a short watermark would (correctly) drop cross-file late rows; with a
    watermark longer than the stream's time span nothing is late, and the
    final update per window must equal the batch aggregate exactly."""
    batch = spark.read.parquet(str(events_dir / "data"))
    expected = {
        (r.window_start, r.event_type): (r.num_events, r.sum_value)
        for r in W.tumbling_counts(batch).collect()
    }
    got = _run_stream(
        spark,
        W.tumbling_counts(_stream(spark, events_dir), watermark="60 days"),
        tmp_path,
        "tumbling_sink",
        "update",
    )
    final = {}
    for r in got.collect():  # last emission per window wins (monotone count)
        k = (r.window_start, r.event_type)
        if k not in final or r.num_events > final[k][0]:
            final[k] = (r.num_events, r.sum_value)
    assert final == expected


def test_tumbling_append_drops_late_rows(spark, events_dir, tmp_path):
    """Append mode with a short watermark on unordered files: emitted
    windows are finalized early and later arrivals are dropped, so every
    emitted count is ≤ the batch count for that window — the documented
    late-data contract."""
    batch = spark.read.parquet(str(events_dir / "data"))
    expected = {
        (r.window_start, r.event_type): r.num_events
        for r in W.tumbling_counts(batch).collect()
    }
    got = _run_stream(
        spark, W.tumbling_counts(_stream(spark, events_dir)), tmp_path,
        "tumbling_append_sink", "append",
    )
    rows = got.collect()
    assert rows, "no windows finalized"
    for r in rows:
        assert r.num_events <= expected[(r.window_start, r.event_type)]


def test_sliding_counts_overlap(spark, events_dir):
    batch = spark.read.parquet(str(events_dir / "data"))
    tumb = W.tumbling_counts(batch).agg(F.sum("num_events")).collect()[0][0]
    slid = W.sliding_counts(batch).agg(F.sum("num_events")).collect()[0][0]
    assert slid == 2 * tumb  # 1h window / 30m slide => every row in 2 windows


def test_session_windows_batch(spark, events_dir):
    batch = spark.read.parquet(str(events_dir / "data"))
    sessions = W.session_counts(batch, gap="30 minutes").collect()
    assert sessions
    total = sum(r.num_events for r in sessions)
    assert total == batch.count()
    for r in sessions:
        assert r.session_end > r.session_start


def test_running_totals_stateful_stream(spark, events_dir, tmp_path):
    """applyInPandasWithState across micro-batches: the LAST update per
    key must equal the global batch aggregate."""
    got = _run_stream(
        spark, W.running_totals(_stream(spark, events_dir)), tmp_path,
        "running_sink", "update",
    )
    batch = spark.read.parquet(str(events_dir / "data"))
    expected = {
        r.event_type: (r.n, round(r.s, 4))
        for r in batch.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    # per key, keep the final (max num_events) update
    final = {}
    for r in got.collect():
        cur = final.get(r.event_type)
        if cur is None or r.num_events > cur[0]:
            final[r.event_type] = (r.num_events, r.total_value)
    assert set(final) == set(expected)
    for k, (n, total) in expected.items():
        assert final[k][0] == n
        assert abs(final[k][1] - total) < 1e-3  # float accumulation order differs


def test_stream_stream_interval_join(spark, events_dir, tmp_path):
    """Inner stream-stream join with watermarks + event-time band:
    batch run is the oracle; streaming (multi-micro-batch, availableNow)
    must converge to it."""
    batch = spark.read.parquet(str(events_dir / "data"))
    views_b = batch.filter(F.col("event_type") == "view")
    purch_b = batch.filter(F.col("event_type") == "purchase")
    expected = sorted(
        (r.user_id, r.purchase_id, r.view_id)
        for r in W.view_purchase_attribution(views_b, purch_b).collect()
    )
    assert expected  # fixture has matches inside the horizon

    # files are NOT in event-time order (round-robin repartition), so a
    # production-sized watermark would evict rows between micro-batches;
    # a span-covering watermark isolates what this test checks —
    # convergence of the join itself (eviction is covered by
    # test_tumbling_append_drops_late_rows).
    sdf = _stream(spark, events_dir)
    got_df = _run_stream(
        spark,
        W.view_purchase_attribution(
            sdf.filter(F.col("event_type") == "view"),
            sdf.filter(F.col("event_type") == "purchase"),
            watermark="60 days",
        ),
        tmp_path,
        "ss_join",
        "append",
    )
    got = sorted((r.user_id, r.purchase_id, r.view_id) for r in got_df.collect())
    assert got == expected


@pytest.fixture(scope="module")
def dup_events_dir(spark, events_dir, tmp_path_factory):
    """The events source landed TWICE (at-least-once redelivery): the
    same files appended a second time, so every event_id arrives in two
    different micro-batches."""
    out = tmp_path_factory.mktemp("events_dup_src")
    df = spark.read.parquet(str(events_dir / "data"))
    df.repartition(3).write.mode("overwrite").parquet(str(out / "data"))
    df.repartition(2).write.mode("append").parquet(str(out / "data"))
    return out


def test_dedup_within_watermark_stream(spark, dup_events_dir, tmp_path):
    """Streaming dedup over a doubled source: with a span-covering
    watermark (fixture files are not time-ordered), every event_id's
    redelivery falls inside the dedup window, so the output is exactly
    one row per distinct event_id."""
    from aws_dms_to_hudi_spark.streaming.windows import dedup_within_watermark

    batch = spark.read.parquet(str(dup_events_dir / "data"))
    n_distinct = batch.select("event_id").distinct().count()
    assert batch.count() == 2 * n_distinct  # fixture really is doubled

    sdf = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(dup_events_dir / "data"))
    )
    got = _run_stream(
        spark,
        dedup_within_watermark(sdf, watermark="60 days"),
        tmp_path,
        "dedup_sink",
        "append",
    )
    ids = [r.event_id for r in got.select("event_id").collect()]
    assert len(ids) == n_distinct
    assert len(set(ids)) == n_distinct
    assert set(ids) == {r.event_id for r in batch.select("event_id").distinct().collect()}


def test_dedup_within_watermark_batch_degenerates(spark, dup_events_dir):
    """Unified model: same plan on the batch read = plain exact dedup."""
    from aws_dms_to_hudi_spark.streaming.windows import dedup_within_watermark

    batch = spark.read.parquet(str(dup_events_dir / "data"))
    got = dedup_within_watermark(batch)
    assert got.count() == batch.select("event_id").distinct().count()


def test_session_stream_converges_to_batch(spark, events_dir, tmp_path_factory, tmp_path):
    """Streaming session windows must finalize to exactly the batch
    sessionization — including sessions that SPAN micro-batch
    boundaries, which exercises the engine's session-merge state path.

    Append-mode sessions only emit once the watermark passes their end,
    so the fixture is arranged to make exact convergence well-defined:
    files are written in event-time order (quartile ranges, so nothing
    is ever late for the 10-minute watermark) and a far-future sentinel
    event per type is landed last to push the final watermark past
    every real session's end. The sentinel's own (never-finalized)
    session is the only output difference, and it never emits."""
    out = tmp_path_factory.mktemp("events_ordered_src")
    batch = spark.read.parquet(str(events_dir / "data"))
    expected = sorted(
        (r.session_start, r.session_end, r.event_type, r.num_events)
        for r in W.session_counts(batch, gap="30 minutes").collect()
    )

    # land four time-ordered files, then the sentinel flush file
    q = batch.agg(
        F.expr(
            "percentile(CAST(ts AS LONG), array(0.25, 0.5, 0.75))"
        ).alias("q")
    ).collect()[0]["q"]
    bounds = [None, *q, None]
    secs = F.col("ts").cast("long")  # seconds since epoch
    for i in range(4):
        part = batch
        if bounds[i] is not None:
            part = part.filter(secs > bounds[i])
        if bounds[i + 1] is not None:
            part = part.filter(secs <= bounds[i + 1])
        part.coalesce(1).write.mode("append").parquet(str(out / "data"))
    sentinel_ts = batch.agg(F.max("ts")).collect()[0][0]
    sentinel = (
        batch.select("event_type").distinct()
        .withColumn("ts", F.lit(sentinel_ts) + F.expr("INTERVAL 10 DAYS"))
        .withColumn("event_id", F.lit(-1).cast("long"))
        .withColumn("user_id", F.lit(-1).cast("long"))
        .withColumn("value", F.lit(0.0))
        .withColumn("props", F.lit(None).cast("string"))
        .select(*batch.columns)
    )
    sentinel.coalesce(1).write.mode("append").parquet(str(out / "data"))

    got_df = _run_stream(
        spark,
        W.session_counts(
            _stream(spark, out), gap="30 minutes", watermark="10 minutes"
        ),
        tmp_path,
        "session_sink",
        "append",
    )
    got = sorted(
        (r.session_start, r.session_end, r.event_type, r.num_events)
        for r in got_df.collect()
    )
    assert got == expected


def test_pattern_hits_spans_batch_boundary(spark, tmp_path):
    """A view>click | purchase sequence split across two micro-batches
    must still match — the cross-batch state is the operator's point."""
    import pandas as pd  # noqa: F401

    from aws_dms_to_hudi_spark.streaming.windows import pattern_hits

    rows_b0 = [(1, 10, 100, "view"), (1, 11, 101, "click"),
               (2, 20, 100, "view")]
    rows_b1 = [(1, 12, 102, "purchase"),  # completes across the boundary
               (2, 21, 103, "click"), (2, 22, 104, "error"),
               (1, 13, 105, "view"), (1, 14, 106, "click"),
               (1, 15, 107, "purchase")]  # completes within one batch
    from pyspark.sql import functions as F

    for i, rows in enumerate((rows_b0, rows_b1)):
        (spark.createDataFrame(
            rows, "user_id long, event_id long, sec long, event_type string")
         .withColumn("ts", F.timestamp_seconds("sec")).drop("sec")
         .select("user_id", "event_id", "ts", "event_type")
         .coalesce(1).write.parquet(str(tmp_path / "src" / f"batch-{i}")))
    stream = (spark.readStream
              .schema("user_id long, event_id long, ts timestamp, "
                      "event_type string")
              .option("maxFilesPerTrigger", "1")
              .parquet(str(tmp_path / "src" / "batch-*")))
    out = str(tmp_path / "hits")

    def sink(bdf, bid):
        bdf.write.mode("append").parquet(out)

    q = (pattern_hits(stream).writeStream.foreachBatch(sink)
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(
        (r["user_id"], r["hit_event_id"])
        for r in spark.read.schema("user_id long, hit_event_id long")
        .parquet(out).collect()
    )
    assert got == [(1, 12), (1, 15)]  # user 2's broken sequence: no hit


def test_transform_with_state_pattern_when_available(spark, tmp_path):
    """Spark 4's transformWithStateInPandas runs the SAME pattern
    processor (typed ValueState). Its Python side needs protobuf, which
    this container lacks — runtime-gated so the coverage intent is
    recorded and the test activates the moment the dependency exists."""
    import pytest

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        pytest.skip("transformWithStateInPandas requires protobuf")
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
    )
    from aws_dms_to_hudi_spark.streaming.windows import PATTERN

    class PatternProc(StatefulProcessor):
        def init(self, handle):
            self._ctx = handle.getValueState("ctx", "e1 string, e2 string")

        def handleInputRows(self, key, rows, timerValues):
            pdf = pd.concat(list(rows)).sort_values(["ts", "event_id"])
            st = self._ctx.get() if self._ctx.exists() else None
            e1, e2 = (st[0], st[1]) if st is not None else (None, None)
            hits = []
            for et, eid in zip(pdf["event_type"], pdf["event_id"]):
                if (e1, e2, et) == PATTERN:
                    hits.append((key[0], int(eid)))
                e1, e2 = e2, et
            self._ctx.update((e1, e2))
            if hits:
                yield pd.DataFrame(hits, columns=["user_id", "hit_event_id"])

        def close(self):
            pass

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    rows = [(1, 10, 100, "view"), (1, 11, 101, "click"),
            (1, 12, 102, "purchase")]
    (spark.createDataFrame(
        rows, "user_id long, event_id long, sec long, event_type string")
     .withColumn("ts", F.timestamp_seconds("sec")).drop("sec")
     .coalesce(1).write.parquet(str(tmp_path / "tws" / "batch-0")))
    stream = (spark.readStream
              .schema("user_id long, event_id long, event_type string, "
                      "ts timestamp")
              .parquet(str(tmp_path / "tws" / "batch-*")))
    out = str(tmp_path / "tws_hits")

    def sink(bdf, bid):
        bdf.write.mode("append").parquet(out)

    q = (stream.groupBy("user_id")
         .transformWithStateInPandas(
             PatternProc(), "user_id long, hit_event_id long",
             "append", "none")
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "tws_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.schema("user_id long, hit_event_id long").parquet(out)
    assert [(r["user_id"], r["hit_event_id"]) for r in got.collect()] == [(1, 12)]


def test_stream_outer_join_emits_unmatched_on_eviction(spark, tmp_path):
    """LEFT OUTER stream-stream join: an unconverted purchase must be
    emitted NULL-matched exactly once — and only after the watermark
    passes it (state eviction), which the far-future flush row forces
    here. Converted purchases join normally across the batch boundary."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    # batch 0: u1 view @0; u2 purchase @5 (no view ever -> unmatched)
    # batch 1: u1 purchase @30 (matches the view, spans batches)
    # batch 2: flush sentinel far future (advances both watermarks)
    src = tmp_path / "src"
    b0 = spark.createDataFrame(
        [(1, ts(0), 1, "view"), (2, ts(5), 2, "purchase")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    b1 = spark.createDataFrame(
        [(3, ts(30), 1, "purchase")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    b2 = spark.createDataFrame(
        [(-1, ts(60 * 24), -1, "view"), (-2, ts(60 * 24), -1, "purchase")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    for i, b in enumerate((b0, b1, b2)):
        b.coalesce(1).write.parquet(str(src / f"b-{i}"))
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b-*"))
    )
    joined = W.view_purchase_attribution(
        stream.filter(F.col("event_type") == "view"),
        stream.filter(F.col("event_type") == "purchase"),
        watermark="1 minute",
        how="left_outer",
    )
    out = str(tmp_path / "joined")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["purchase_id"], r["view_id"])
        for r in spark.read.parquet(out)
        .filter(F.col("user_id") >= 0)
        .collect()
    }
    assert rows == {(3, 1), (2, None)}


def test_stream_outer_join_batch_equals_left_join(spark, events_dir):
    """Batch mode: the same plan is a plain left interval join."""
    ev = spark.read.parquet(str(events_dir / "data"))
    got = W.view_purchase_attribution(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
        how="left_outer",
    )
    want = W.view_purchase_attribution(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    n_inner = want.count()
    n_purchases = ev.filter(F.col("event_type") == "purchase").count()
    n_matched_p = want.select("purchase_id").distinct().count()
    assert got.count() == n_inner + (n_purchases - n_matched_p)
    assert got.filter(F.col("view_id").isNull()).count() == (
        n_purchases - n_matched_p
    )
