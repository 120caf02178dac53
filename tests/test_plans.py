"""Physical-plan assertions: the scale properties the engine promises
must be visible in the executed plan, not just hoped for.

- filters/projections reach the parquet scan (PushedFilters/ReadSchema);
- dimension joins broadcast (no sort-merge for tiny dims);
- no cartesian products anywhere in the contract suite except the
  intentional brute-force baseline (q22: 5-row broadcast nested loop).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod


def _plan(spark, sf, name):
    df = entry_mod.queries()[name](spark, sf)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q01_filter_and_projection_pushdown(spark, sf_correct):
    plan = _plan(spark, sf_correct, "q01_scan_projection")
    assert "PushedFilters: [IsNotNull(l_discount), GreaterThan(l_discount,0.05)" in plan
    # column pruning: only the 3 referenced columns reach the scan
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double,l_discount:double>" in plan


def test_q04_dims_broadcast(spark, sf_correct):
    plan = _plan(spark, sf_correct, "q04_multi_join")
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan


def test_q27_dims_broadcast(spark, sf_correct):
    plan = _plan(spark, sf_correct, "q27_part_supplier_revenue")
    assert plan.count("BroadcastHashJoin") == 3


@pytest.mark.parametrize(
    "name",
    [
        n
        for n in entry_mod.queries()
        # q22 is the intentional brute-force baseline: a 5-row query set
        # broadcast against the corpus with a non-equi predicate.
        if n not in ("q22_cosine_topk",)
    ],
)
def test_no_cartesian_anywhere(spark, sf_correct, name):
    plan = _plan(spark, sf_correct, name)
    assert "CartesianProduct" not in plan, name
