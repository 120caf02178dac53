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
        spatial.grid_neighbors_sql(
            "spark", customer="__sp_fix_customer", cell_cap=None
        )
    )
    rows = out.collect()
    assert all(r["profiled"] for r in rows)  # uncapped: everyone profiled
    got = {r["id"]: (r["n_neighbors"], r["nearest_id"], r["nearest_d2"])
           for r in rows}

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


def test_cell_cap_bounds_candidates(spark):
    """Densified fixture (~12 points/cell, above CELL_CAP=8): the capped
    candidate-pair count must respect 9 * occupied_cells * cap^2 and be
    strictly below the uncapped count — the constant-volume guarantee
    that makes the join survive densification."""
    n = 30_000  # 2500 cells -> ~12 points/cell on average
    cap = spatial.CELL_CAP
    cust = spark.range(1, n + 1).selectExpr("id AS c_custkey")
    cust.createOrReplaceTempView("__sp_cap_customer")
    capped = spark.sql(spatial.grid_candidates_sql(
        "spark", customer="__sp_cap_customer", cell_cap=cap
    )).collect()[0][0]
    uncapped = spark.sql(spatial.grid_candidates_sql(
        "spark", customer="__sp_cap_customer", cell_cap=None
    )).collect()[0][0]
    n_cells = (spatial.SPAN // spatial.GRID) ** 2
    assert capped <= 9 * n_cells * cap * cap
    assert capped < uncapped  # the cap actually binds on this fixture
    # thinned points exist and are flagged
    out = spark.sql(spatial.grid_neighbors_sql(
        "spark", customer="__sp_cap_customer", cell_cap=cap
    ))
    flags = out.groupBy("profiled").count().collect()
    by_flag = {r["profiled"]: r["count"] for r in flags}
    assert by_flag.get(False, 0) > 0 and by_flag.get(True, 0) > 0
    assert sum(by_flag.values()) == n  # every point still surfaces


def test_capped_join_equals_participant_brute_force(spark):
    """Cap semantics are exact: the capped output must equal brute-force
    neighbors computed over the participant subset (K lowest ids per
    cell), with thinned points surfacing profiled=FALSE, n_neighbors=0,
    NULL nearest."""
    import numpy as np

    n, cap = 6_000, 2  # low cap so thinning is common
    cust = spark.createDataFrame([(k,) for k in range(1, n + 1)],
                                 "c_custkey long")
    cust.createOrReplaceTempView("__sp_sem_customer")
    out = spark.sql(spatial.grid_neighbors_sql(
        "spark", customer="__sp_sem_customer", cell_cap=cap
    ))
    got = {r["id"]: (r["profiled"], r["n_neighbors"],
                     r["nearest_id"], r["nearest_d2"])
           for r in out.collect()}

    ks = np.arange(1, n + 1, dtype=np.int64)
    x = (ks * spatial._AX) % spatial.SPAN
    y = (ks * spatial._AY) % spatial.SPAN
    cells: dict[tuple, list] = {}
    for i, k in enumerate(ks):
        cells.setdefault((x[i] // spatial.GRID, y[i] // spatial.GRID),
                         []).append(int(k))
    participants = {k for mem in cells.values()
                    for k in sorted(mem)[:cap]}
    pk = np.array(sorted(participants), dtype=np.int64)
    px, py = (pk * spatial._AX) % spatial.SPAN, (pk * spatial._AY) % spatial.SPAN
    d2 = (px[:, None] - px[None, :]) ** 2 + (py[:, None] - py[None, :]) ** 2
    np.fill_diagonal(d2, 2**62)
    in_r = d2 <= spatial.RADIUS * spatial.RADIUS
    thinned = binds = 0
    for k in ks:
        k = int(k)
        if k not in participants:
            assert got[k] == (False, 0, None, None), (k, got[k])
            thinned += 1
            continue
        i = int(np.searchsorted(pk, k))
        cnt = int(in_r[i].sum())
        if cnt:
            best = min((int(d2[i, j]), int(pk[j]))
                       for j in np.flatnonzero(in_r[i]))
            want = (True, cnt, best[1], best[0])
            binds += 1
        else:
            want = (True, 0, None, None)
        assert got[k] == want, (k, got[k], want)
    assert thinned > 0 and binds > 0  # fixture exercises both paths


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
