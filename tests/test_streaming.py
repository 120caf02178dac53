"""D11 continuous mode: Structured Streaming ingest converges to the same
state as the batch merge path (reference ``--continuous``,
src/lambdas/launch_hudi/handler.py:166-167).
"""

from __future__ import annotations

import pytest

from aws_dms_to_hudi_spark import cdc
from aws_dms_to_hudi_spark.config import TableConfig
from aws_dms_to_hudi_spark.streaming import ContinuousIngest

from tests.util import assert_same, duck_con


@pytest.fixture(scope="module")
def raw_orders(spark, sf_smoke, tmp_path_factory):
    """All four CDC batches for orders landed in the DMS raw layout."""
    root = tmp_path_factory.mktemp("stream_raw")
    recipe = cdc.RECIPES["orders"]
    for b in range(cdc.N_BATCHES):
        cdc.write_raw_batch(spark, sf_smoke, recipe, b, root, "tpch")
    return root / "tpch" / "public" / "orders"


def test_available_now_converges_to_replay(spark, sf_smoke, raw_orders, tmp_path):
    cfg = TableConfig(name="public.orders", record_key=["o_orderkey"])
    ingest = ContinuousIngest(
        spark,
        cfg,
        source_root=raw_orders,
        target_root=tmp_path / "curated",
        checkpoint_root=tmp_path / "ckpt",
        max_files_per_trigger=4,  # force multiple micro-batches
    )
    ingest.run_available()

    state = ingest.table.read()
    assert state is not None

    recipe = cdc.RECIPES["orders"]
    con = duck_con(sf_smoke)
    oracle = con.execute(cdc.replay_sql(recipe)).df()
    assert_same(state.select(*oracle.columns), oracle)


def test_restart_is_incremental_and_idempotent(spark, sf_smoke, raw_orders, tmp_path):
    """Drain batches 0..2, then land nothing new and restart: the streaming
    checkpoint must prevent re-merging consumed files (exactly-once)."""
    cfg = TableConfig(name="public.orders", record_key=["o_orderkey"])
    ingest = ContinuousIngest(
        spark,
        cfg,
        source_root=raw_orders,
        target_root=tmp_path / "curated",
        checkpoint_root=tmp_path / "ckpt",
    )
    ingest.run_available()
    v1 = ingest.table.latest_commit().version

    # Restart with no new files: no new commit may appear.
    ingest2 = ContinuousIngest(
        spark,
        cfg,
        source_root=raw_orders,
        target_root=tmp_path / "curated",
        checkpoint_root=tmp_path / "ckpt",
    )
    ingest2.run_available()
    assert ingest2.table.latest_commit().version == v1
