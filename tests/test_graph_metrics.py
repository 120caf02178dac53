"""Per-node graph metrics (r6 batch 3): local clustering coefficient,
bounded-depth BFS reachability, resource-allocation link prediction —
hand-computed on a K4-plus-pendant-plus-isolated-pair graph where every
triangle credit, hop frontier, and RA score is checkable by eye.

Graph (via co-purchase baskets): order 100 buys parts {1,2,3,4} (a K4),
order 200 buys {1,5} (pendant 5-1), order 300 buys {6,7} (isolated
pair). Degrees: 1:4, 2/3/4:3, 5/6/7:1. K4 holds 4 triangles; each K4
vertex sits in exactly 3 of them.
"""

import duckdb
import pytest

from aws_dms_to_hudi_spark.functions import components as fn_comp

ROWS = ([(100, p) for p in (1, 2, 3, 4)]
        + [(200, p) for p in (1, 5)]
        + [(300, p) for p in (6, 7)])
SCHEMA = "l_orderkey long, l_partkey long"

# lcc: node 1 has d=4 (6 pairs) and 3 triangles -> 500000 ppm; nodes
# 2/3/4 have d=3 (3 pairs) and 3 triangles -> 1000000 ppm; degree-1
# nodes are filtered (d >= 2). Order: lcc DESC, node ASC.
LCC_EXPECT = [(2, 3, 3, 1_000_000), (3, 3, 3, 1_000_000),
              (4, 3, 3, 1_000_000), (1, 4, 3, 500_000)]

# khop: (seed, degree, reach_1, reach_2, reach_3); reach includes the
# seed itself. The K4+pendant component has 5 nodes; the pair has 2.
KHOP_EXPECT = [(1, 4, 5, 5, 5), (2, 3, 4, 5, 5), (3, 3, 4, 5, 5),
               (4, 3, 4, 5, 5), (5, 1, 2, 5, 5), (6, 1, 2, 2, 2),
               (7, 1, 2, 2, 2)]

# RA: the only non-adjacent two-hop pairs run through center 1 (d=4,
# score 10^6 DIV 4 = 250000): seeds 2/3/4 predict 5, seed 5 predicts
# 2/3/4 (rk by cand ASC). Seeds 1/6/7 have no novel candidates.
RA_EXPECT = [(2, 5, 1, 250_000, 1), (3, 5, 1, 250_000, 1),
             (4, 5, 1, 250_000, 1), (5, 2, 1, 250_000, 1),
             (5, 3, 1, 250_000, 2), (5, 4, 1, 250_000, 3)]


@pytest.fixture()
def graph_view(spark):
    spark.createDataFrame(ROWS, SCHEMA).createOrReplaceTempView(
        "__g_lineitem")
    return "__g_lineitem"


def _duck():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE lineitem (l_orderkey BIGINT, l_partkey BIGINT)")
    con.executemany("INSERT INTO lineitem VALUES (?, ?)", ROWS)
    return con


def test_local_clustering_spark_matches_hand_counts(spark, graph_view):
    got = [tuple(r) for r in
           fn_comp.local_clustering(spark, graph_view).collect()]
    assert got == LCC_EXPECT


def test_local_clustering_oracle_matches_hand_counts():
    got = _duck().execute(fn_comp.local_clustering_sql("duckdb")).fetchall()
    assert got == LCC_EXPECT


def test_khop_reachability_both_engines(spark, graph_view):
    got = [tuple(r) for r in spark.sql(
        fn_comp.khop_reachability_sql("spark", lineitem=graph_view)
    ).collect()]
    assert got == KHOP_EXPECT
    assert _duck().execute(
        fn_comp.khop_reachability_sql("duckdb")).fetchall() == KHOP_EXPECT


def test_ra_link_prediction_both_engines(spark, graph_view):
    got = [tuple(r) for r in spark.sql(
        fn_comp.ra_link_prediction_sql("spark", lineitem=graph_view)
    ).collect()]
    assert got == RA_EXPECT
    assert _duck().execute(
        fn_comp.ra_link_prediction_sql("duckdb")).fetchall() == RA_EXPECT


def test_lcc_zero_triangle_node_included(spark):
    """A path graph a-b-c: the middle node has d=2 (one pair) and zero
    triangles -> lcc 0 ppm, still present (LEFT JOIN + COALESCE, not an
    inner join that would drop triangle-free nodes)."""
    spark.createDataFrame(
        [(1, 10), (1, 11), (2, 11), (2, 12)], SCHEMA
    ).createOrReplaceTempView("__g_path")
    got = [tuple(r) for r in
           fn_comp.local_clustering(spark, "__g_path").collect()]
    assert got == [(11, 2, 0, 0)]


def test_khop_dataframe_path_matches_sql(spark, graph_view):
    """The materialized DataFrame BFS (what the entry runs) must equal
    the one-statement SQL form on the hand-counted fixture."""
    got = [tuple(r) for r in
           fn_comp.khop_reachability(spark, graph_view).collect()]
    assert got == KHOP_EXPECT


TRI2_ROWS = [(100, p) for p in (1, 2, 3)] + [(200, p) for p in (10, 11, 12)]


def test_modularity_two_disjoint_triangles(spark):
    """Two disjoint triangles: LPA converges to one community each
    (labels 1 and 10); each contributes e/m − (deg/2m)² =
    3/6 − (6/12)² = 0.25 → 250000 ppm, total Q = 0.5."""
    expect = [(1, 3, 3, 6, 250_000), (10, 3, 3, 6, 250_000)]
    spark.createDataFrame(TRI2_ROWS, SCHEMA).createOrReplaceTempView(
        "__g_tri2")
    got = [tuple(r) for r in spark.sql(
        fn_comp.modularity_sql("spark", lineitem="__g_tri2")).collect()]
    assert got == expect
    assert _duck2().execute(
        fn_comp.modularity_sql("duckdb")).fetchall() == expect


def _duck2():
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE lineitem (l_orderkey BIGINT, l_partkey BIGINT)")
    con.executemany("INSERT INTO lineitem VALUES (?, ?)", TRI2_ROWS)
    return con


def test_ppr_stays_in_seed_component_and_matches_oracle(spark):
    """Seeded at node 1 (two disjoint triangles): the walk never
    reaches the other component, node 1 keeps the max score (it alone
    collects restart mass every round), and the fixed-point integer
    chain is bit-identical across engines."""
    spark.createDataFrame(TRI2_ROWS, SCHEMA).createOrReplaceTempView(
        "__g_tri2b")
    got = [tuple(r) for r in spark.sql(
        fn_comp.ppr_sql("spark", lineitem="__g_tri2b", seeds=1)).collect()]
    assert {r[0] for r in got} == {1, 2, 3}  # support = seed component
    assert max(got, key=lambda r: r[1])[0] == 1
    oracle = _duck2().execute(fn_comp.ppr_sql("duckdb", seeds=1)).fetchall()
    assert got == [tuple(r) for r in oracle]
