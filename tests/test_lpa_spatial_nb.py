"""Unit fixtures for the r4 additions: label propagation (hand graph),
grid spatial join (vs brute force), Naive Bayes (separable corpus)."""

from pyspark.sql import functions as F

from aws_dms_to_hudi_spark.functions import spatial
from aws_dms_to_hudi_spark.functions.components import (
    label_propagation_sql,
)
from aws_dms_to_hudi_spark.functions.text import naive_bayes_confusion_sql


def test_lpa_two_triangles_with_bridge(spark):
    """Two triangles joined by one bridge edge: CC would fuse them into
    one component; 2-round LPA keeps three communities. Hand-traced:
    round 1 is min-neighbor; round 2 plurality splits {1,2,3} / {5,6}
    with node 4 stranded on its own label."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "u long, v long",
    )
    edges.createOrReplaceTempView("__lpa_fix_edges")
    out = spark.sql(
        label_propagation_sql("spark", edges_table="__lpa_fix_edges")
    )
    got = {r["community"]: r["n_members"] for r in out.collect()}
    assert got == {1: 3, 3: 2, 4: 1}


def test_lpa_label_encoding_ties(spark):
    """The integer-encoded argmax must break count ties toward the
    SMALLER label: star center with two leaves adopts the smaller."""
    edges = spark.createDataFrame([(7, 9), (7, 8)], "u long, v long")
    edges.createOrReplaceTempView("__lpa_tie_edges")
    out = spark.sql(
        label_propagation_sql(
            "spark", edges_table="__lpa_tie_edges", rounds=1
        )
    )
    labels = {r["community"]: r["n_members"] for r in out.collect()}
    # leaves adopt 7; center ties between 8 and 9 -> 8
    assert labels == {7: 2, 8: 1}


def test_grid_join_equals_brute_force(spark):
    """The 3x3 cell-neighborhood candidate set must reproduce the exact
    brute-force in-radius neighbor counts and nearest picks — proving
    cell side >= radius covers every true neighbor."""
    import numpy as np

    # the Lehmer lattice's nearest-pair stride is ~1185 keys, so the
    # fixture needs enough keys for in-radius pairs to exist at all
    n = 1500
    cust = spark.createDataFrame([(k,) for k in range(1, n + 1)],
                                 "c_custkey long")
    cust.createOrReplaceTempView("__sp_fix_customer")
    out = spark.sql(
        spatial.grid_neighbors_sql("spark", customer="__sp_fix_customer")
    )
    got = {r["id"]: (r["n_neighbors"], r["nearest_id"], r["nearest_d2"])
           for r in out.collect()}

    ks = np.arange(1, n + 1, dtype=np.int64)
    x = (ks * spatial._AX) % spatial.SPAN
    y = (ks * spatial._AY) % spatial.SPAN
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    np.fill_diagonal(d2, 2**62)
    r2 = spatial.RADIUS * spatial.RADIUS
    in_r = d2 <= r2
    for i, k in enumerate(ks):
        cnt = int(in_r[i].sum())
        if cnt:
            best = min((int(d2[i, j]), int(ks[j]))
                       for j in np.flatnonzero(in_r[i]))
            want = (cnt, best[1], best[0])
        else:
            want = (0, None, None)
        assert got[int(k)] == want, (k, got[int(k)], want)
    assert any(v[0] > 0 for v in got.values())  # fixture not degenerate
    assert any(v[0] == 0 for v in got.values())  # empty path exercised


def test_naive_bayes_separable_corpus(spark):
    """Fully separable vocabulary -> perfect diagonal confusion."""
    docs = spark.createDataFrame(
        [
            (1, "alpha alpha beta", "aa"),
            (2, "beta alpha", "aa"),
            (3, "gamma delta gamma", "bb"),
            (4, "delta delta", "bb"),
        ],
        "doc_id long, text string, lang string",
    )
    docs.createOrReplaceTempView("__nb_fix_docs")
    out = spark.sql(
        naive_bayes_confusion_sql("spark", table="__nb_fix_docs")
    )
    got = {(r["actual_lang"], r["pred_lang"]): r["n_docs"]
           for r in out.collect()}
    assert got == {("aa", "aa"): 2, ("bb", "bb"): 2}


def test_naive_bayes_confusion_totals(spark, sf_smoke):
    """Every document receives exactly one prediction."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    docs.createOrReplaceTempView("__nb_tot_docs")
    out = spark.sql(naive_bayes_confusion_sql("spark", table="__nb_tot_docs"))
    total = out.agg(F.sum("n_docs")).collect()[0][0]
    assert total == docs.count()


def _plan(spark, df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_lpa_plan_no_cartesian(spark, sf_smoke):
    """Scale guard: every LPA round joins on the node key — never a
    cartesian or nested-loop over the graph."""
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    li.createOrReplaceTempView("__lpa_plan_li")
    df = spark.sql(label_propagation_sql("spark", lineitem="__lpa_plan_li"))
    plan = _plan(spark, df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_spatial_plan_no_cartesian(spark, sf_smoke):
    """Scale guard: the candidate join is an equi-join on the cell key;
    the 3x3 probe is a constant-fan-out generator, not a join."""
    c = spark.read.parquet(f"{sf_smoke}/customer.parquet")
    c.createOrReplaceTempView("__sp_plan_cust")
    df = spark.sql(spatial.grid_neighbors_sql("spark", customer="__sp_plan_cust"))
    plan = _plan(spark, df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_nb_plan_no_cartesian(spark, sf_smoke):
    """Scale guard: NB's scoring joins are hash joins on token/doc/lang
    keys. (The |langs|-row model relations broadcast — bounded fan-out
    by design — so only true cartesians are banned here.)"""
    d = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    d.createOrReplaceTempView("__nb_plan_docs")
    df = spark.sql(naive_bayes_confusion_sql("spark", table="__nb_plan_docs"))
    assert "CartesianProduct" not in _plan(spark, df)
