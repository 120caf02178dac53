"""End-to-end engine runs: CDC fixture -> raw layer -> merge -> state hash
matches the DuckDB replay oracle (the t1/t2 contract, FIXTURES.md §3)."""

import json

import pytest

from aws_dms_to_hudi_spark import cdc
from aws_dms_to_hudi_spark.engine import ConcurrentRunError, Engine

from tests.util import assert_same, duck_con


def config_items(tables):
    items = [
        {
            "config": "pipeline::hudi_delta",
            "identifier": "tpch",
            "emr_config": {"worker": {"count": "1"}, "step_parallelism": 2},
        },
        {
            "config": "pipeline::hudi_bulk_insert",
            "identifier": "tpch",
            "emr_config": {"worker": {"count": "1"}, "step_parallelism": 2},
        },
    ]
    for t, hudi in tables.items():
        items.append(
            {
                "config": f"table::public.{t}",
                "identifier": "tpch",
                "enabled": True,
                "hudi_config": hudi,
            }
        )
    return items


def make_engine(spark, tmp_path, tables):
    return Engine(
        spark,
        identifier="tpch",
        config_items=config_items(tables),
        raw_root=tmp_path / "raw",
        curated_root=tmp_path / "curated",
    )


def land_batches(spark, sf_dir, tmp_path, table, upto):
    for b in range(upto + 1):
        cdc.write_raw_batch(
            spark, sf_dir, cdc.RECIPES[table], b, tmp_path / "raw", "tpch"
        )


def read_state(engine, table):
    df = engine.read_table(f"tpch_public_{table}")
    assert df is not None
    cols = list(cdc.RECIPES[table].columns) + ["trx_seq"]
    return df.select(*cols)


@pytest.mark.parametrize("table", ["orders", "lineitem", "supplier"])
def test_cdc_replay_matches_oracle(spark, sf_smoke, tmp_path, table):
    """orders: simple key; lineitem: composite key + partitioned;
    supplier: MERGE_ON_READ path."""
    recipe = cdc.RECIPES[table]
    hudi = {
        "record_key": ",".join(recipe.key_cols),
        "source_ordering_field": "trx_seq",
        "is_partitioned": table == "lineitem",
    }
    if table == "lineitem":
        hudi["partition_path"] = "l_returnflag"
    if table == "supplier":
        hudi["table_type"] = "MERGE_ON_READ"
    engine = make_engine(spark, tmp_path, {table: hudi})

    # batch 0 via bulk insert, then one incremental run per CDC batch
    land_batches(spark, sf_smoke, tmp_path, table, 0)
    r0 = engine.run("hudi_bulk_insert")
    assert r0.succeeded, r0.steps
    for b in range(1, cdc.N_BATCHES):
        cdc.write_raw_batch(
            spark, sf_smoke, recipe, b, tmp_path / "raw", "tpch"
        )
        r = engine.run("hudi_delta")
        assert r.succeeded, r.steps
        # engine state after batch b == naive replay oracle (FIXTURES.md §3)
        con = duck_con(sf_smoke)
        oracle = con.execute(cdc.replay_sql(recipe, b)).df()
        assert_same(read_state(engine, table), oracle)


def test_single_delta_run_consumes_all_pending_batches(spark, sf_smoke, tmp_path):
    table = "customer"
    recipe = cdc.RECIPES[table]
    engine = make_engine(
        spark,
        tmp_path,
        {table: {"record_key": "c_custkey", "is_partitioned": False}},
    )
    land_batches(spark, sf_smoke, tmp_path, table, cdc.N_BATCHES - 1)
    r = engine.run("hudi_delta")
    assert r.succeeded, r.steps
    con = duck_con(sf_smoke)
    oracle = con.execute(cdc.replay_sql(recipe, cdc.N_BATCHES - 1)).df()
    assert_same(read_state(engine, table), oracle)


def test_no_new_data_is_a_skip_not_a_failure(spark, sf_smoke, tmp_path):
    engine = make_engine(
        spark,
        tmp_path,
        {"orders": {"record_key": "o_orderkey", "is_partitioned": False}},
    )
    land_batches(spark, sf_smoke, tmp_path, "orders", 0)
    assert engine.run("hudi_delta").succeeded
    r2 = engine.run("hudi_delta")  # nothing new landed
    assert r2.steps[0].status == "SKIPPED_NO_DATA"


def test_rerun_after_partial_failure_is_idempotent(spark, sf_smoke, tmp_path):
    """Crash-replay safety (SURVEY.md §7.3): re-running over already-
    committed files converges to the same state."""
    table = "orders"
    recipe = cdc.RECIPES[table]
    engine = make_engine(
        spark,
        tmp_path,
        {table: {"record_key": "o_orderkey", "is_partitioned": False}},
    )
    land_batches(spark, sf_smoke, tmp_path, table, 1)
    assert engine.run("hudi_delta").succeeded

    # simulate a lost checkpoint by rewinding the commit's watermark
    tdir = tmp_path / "curated" / "default" / "tpch_public_orders" / "_commits"
    commits = sorted(tdir.glob("[0-9]*.json"))
    last = json.loads(commits[-1].read_text())
    last["checkpoint"]["watermark"] = ""
    commits[-1].write_text(json.dumps(last))

    assert engine.run("hudi_delta").succeeded  # replays both batches
    con = duck_con(sf_smoke)
    oracle = con.execute(cdc.replay_sql(recipe, 1)).df()
    assert_same(read_state(engine, table), oracle)


def test_transformer_sql_applied_before_merge(spark, sf_smoke, tmp_path):
    """D10: transformer filters/augments the batch pre-merge (Q13 shape)."""
    table = "orders"
    engine = make_engine(
        spark,
        tmp_path,
        {
            table: {
                "record_key": "o_orderkey",
                "is_partitioned": False,
                "transformer_sql": (
                    "SELECT *, o_totalprice * 0.9 AS net "
                    "FROM <SRC> WHERE o_totalprice < 100000"
                ),
            }
        },
    )
    land_batches(spark, sf_smoke, tmp_path, table, 0)
    assert engine.run("hudi_bulk_insert").succeeded
    df = engine.read_table("tpch_public_orders")
    assert "net" in df.columns
    assert df.filter("o_totalprice >= 100000").count() == 0
    assert df.count() > 0


def test_concurrency_guard(spark, sf_smoke, tmp_path):
    engine = make_engine(
        spark,
        tmp_path,
        {"orders": {"record_key": "o_orderkey", "is_partitioned": False}},
    )
    land_batches(spark, sf_smoke, tmp_path, "orders", 0)
    lock = engine._lock_path()
    lock.parent.mkdir(parents=True, exist_ok=True)
    lock.write_text("held")
    with pytest.raises(ConcurrentRunError):
        with engine._run_lock(max_wait_s=0.3):
            pass
    lock.unlink()


def test_empty_plan_raises(spark, tmp_path):
    engine = Engine(
        spark,
        identifier="tpch",
        config_items=config_items({}),
        raw_root=tmp_path / "raw",
        curated_root=tmp_path / "curated",
    )
    with pytest.raises(RuntimeError, match="No steps"):
        engine.plan("hudi_delta")


def test_disabled_table_skipped(spark, tmp_path):
    items = config_items(
        {"orders": {"record_key": "o_orderkey", "is_partitioned": False}}
    )
    items.append(
        {
            "config": "table::public.nope",
            "identifier": "tpch",
            "enabled": False,
            "hudi_config": {"record_key": "x", "is_partitioned": False},
        }
    )
    engine = Engine(
        spark,
        identifier="tpch",
        config_items=items,
        raw_root=tmp_path / "raw",
        curated_root=tmp_path / "curated",
    )
    assert [p.step_name for p in engine.plan("hudi_delta")] == ["public.orders"]


def test_quarantine_bad_rows_through_engine(spark, sf_smoke, tmp_path):
    """quarantine_bad_rows=True (D20): a landed batch containing
    NULL-key rows must not fail the step or merge garbage — the bad
    rows land under <table>/_quarantine with a reason, the clean rows
    merge, and the state equals the oracle over the clean subset."""
    from pyspark.sql import functions as F

    table = "orders"
    recipe = cdc.RECIPES[table]
    engine = make_engine(
        spark,
        tmp_path,
        {table: {"record_key": "o_orderkey", "is_partitioned": False,
                 "quarantine_bad_rows": True}},
    )
    land_batches(spark, sf_smoke, tmp_path, table, 0)
    assert engine.run("hudi_bulk_insert").succeeded

    # land batch 1 with three rows' keys nulled out
    b1 = cdc.generate_batch(spark, sf_smoke, recipe, 1)
    doomed = [r[0] for r in b1.select("o_orderkey").limit(3).collect()]
    corrupted = b1.withColumn(
        "o_orderkey",
        F.when(F.col("o_orderkey").isin(doomed), None)
        .otherwise(F.col("o_orderkey")),
    )
    out = (tmp_path / "raw" / "tpch" / "public" / table / "batch-00001")
    corrupted.write.mode("overwrite").parquet(str(out))

    r = engine.run("hudi_delta")
    assert r.succeeded, r.steps

    # quarantined rows are there, with the reason
    qdir = (tmp_path / "curated" / "default" / f"tpch_public_{table}"
            / "_quarantine")
    dlq = spark.read.parquet(str(qdir))
    # each nulled key may carry several change rows in the batch
    assert dlq.count() >= 3
    assert {x["dlq_reason"] for x in dlq.collect()} == {"null_key"}

    # exact oracle: replay of batch 0 ∪ (batch 1 minus the nulled keys)
    con = duck_con(sf_smoke)
    keys = ", ".join(str(k) for k in doomed)
    oracle = con.execute(
        f"""
        WITH st AS (
          SELECT * FROM ({cdc.batch_sql(recipe, 0)})
          UNION ALL
          SELECT * FROM ({cdc.batch_sql(recipe, 1)})
          WHERE o_orderkey NOT IN ({keys})
        ),
        r AS (
          SELECT *, row_number() OVER (
            PARTITION BY o_orderkey ORDER BY trx_seq DESC) AS rn
          FROM st
        )
        SELECT {", ".join(recipe.columns)}, trx_seq
        FROM r WHERE rn = 1 AND NOT _hoodie_is_deleted
        """
    ).df()
    assert_same(read_state(engine, table), oracle)
