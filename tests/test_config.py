"""Control-plane config tests (C2/C5 parity — handler.py:21-42,185-186)."""

import pytest

from aws_dms_to_hudi_spark.config import (
    PipelineConfig,
    TableConfig,
    munge_configs,
)

ITEMS = [
    {
        "config": "pipeline::hudi_delta",
        "identifier": "tpch",
        "emr_config": {
            "master": {"instance_type": "m5.xlarge"},
            "worker": {"count": "4", "instance_type": "r5.2xlarge"},
            "step_parallelism": "4",
        },
    },
    {
        "config": "pipeline::hudi_bulk_insert",
        "identifier": "tpch",
        "emr_config": {"worker": {"count": "8"}, "step_parallelism": 2},
    },
    {
        "config": "table::public.orders",
        "identifier": "tpch",
        "enabled": True,
        "hudi_config": {
            "record_key": "o_orderkey",
            "source_ordering_field": "trx_seq",
            "is_partitioned": False,
        },
    },
    {
        "config": "table::public.lineitem",
        "identifier": "tpch",
        "enabled": True,
        "hudi_config": {
            "record_key": "l_orderkey,l_linenumber",
            "source_ordering_field": "trx_seq",
            "is_partitioned": True,
            "partition_path": "l_returnflag",
        },
    },
    {
        "config": "table::public.disabled_one",
        "identifier": "tpch",
        "enabled": False,
        "hudi_config": {"record_key": "x", "is_partitioned": False},
    },
]


def test_unsupported_pipeline_type_raises():
    # handler.py:28
    with pytest.raises(ValueError, match="not yet supported"):
        munge_configs(ITEMS, "hudi_insert_overwrite")


def test_munge_splits_pipeline_and_tables():
    cfgs = munge_configs(ITEMS, "hudi_delta")
    assert cfgs.pipeline.pipeline_type == "hudi_delta"
    assert cfgs.pipeline.step_parallelism == 4  # int-coerced (handler.py:34)
    assert cfgs.pipeline.worker_count == 4
    assert set(cfgs.tables) == {
        "public.orders",
        "public.lineitem",
        "public.disabled_one",
    }


def test_complex_key_detection():
    cfgs = munge_configs(ITEMS, "hudi_delta")
    assert not cfgs.tables["public.orders"].is_complex_key
    assert cfgs.tables["public.lineitem"].is_complex_key
    assert cfgs.tables["public.lineitem"].record_key == [
        "l_orderkey",
        "l_linenumber",
    ]


def test_partitioned_requires_partition_path():
    with pytest.raises(ValueError, match="partition_path"):
        TableConfig(name="t", record_key=["k"], is_partitioned=True)


def test_empty_record_key_rejected():
    with pytest.raises(ValueError, match="record_key"):
        TableConfig(name="t", record_key=[])


def test_pipeline_defaults():
    pc = PipelineConfig.from_item(
        {"config": "pipeline::hudi_delta", "emr_config": {}}
    )
    assert pc.step_parallelism == 1
    assert pc.maximize_resource_allocation is False
    assert pc.next_pipeline is None


def test_next_pipeline_chain_flag():
    pc = PipelineConfig.from_item(
        {
            "config": "pipeline::hudi_bulk_insert",
            "emr_config": {},
            "next_pipeline": {"enabled": True, "pipeline_type": "hudi_delta"},
        }
    )
    assert pc.next_pipeline == "hudi_delta"
