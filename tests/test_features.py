"""Hand fixtures for the feature-engineering family (WOE/IV, LOO target
encoding, chi-square token selection)."""

import math

from aws_dms_to_hudi_spark.functions import features as ff


def _orders_view(spark, rows, name):
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderpriority string, o_orderstatus string, "
        "o_totalprice double",
    )
    df.createOrReplaceTempView(name)
    return name


def test_woe_iv_hand_computed(spark):
    # bin A: 3 good 1 bad; bin B: 1 good 3 bad; totals 4/4, 2 bins
    rows = [(i, "A", "F", 10.0) for i in range(3)]
    rows += [(3, "A", "O", 10.0)]
    rows += [(4, "B", "F", 10.0)]
    rows += [(5 + i, "B", "O", 10.0) for i in range(3)]
    v = _orders_view(spark, rows, "__woe_fix")
    out = {r["bin"]: r for r in
           spark.sql(ff.woe_iv_sql("spark", orders=v)).collect()}
    g_a, b_a = (3 + 0.5) / (4 + 1.0), (1 + 0.5) / (4 + 1.0)
    woe_a = math.log(g_a / b_a)
    assert abs(out["A"]["woe"] - woe_a) < 1e-9
    assert abs(out["A"]["woe"] + out["B"]["woe"]) < 1e-9  # symmetric fixture
    iv = 2 * (g_a - b_a) * woe_a
    assert abs(out["A"]["feature_iv"] - iv) < 1e-6
    assert out["A"]["n_good"] == 3 and out["B"]["n_bad"] == 3


def test_target_encoding_loo_and_singleton(spark):
    rows = [
        (1, "A", "F", 10.0),
        (2, "A", "F", 20.0),
        (3, "A", "F", 30.0),
        (4, "B", "F", 100.0),  # singleton -> global LOO fallback
    ]
    v = _orders_view(spark, rows, "__te_fix")
    out = {r["o_orderkey"]: r["loo_enc"] for r in
           spark.sql(ff.target_encoding_sql("spark", orders=v)).collect()}
    assert out[1] == 25.0  # (20+30)/2
    assert out[2] == 20.0  # (10+30)/2
    assert out[3] == 15.0  # (10+20)/2
    assert out[4] == 20.0  # (10+20+30)/3 — all other rows


def test_chi2_discriminative_token_ranks_first(spark):
    """A token present in every 'aa' doc and no 'bb' doc has the maximal
    chi-square for both languages; shared tokens score zero and are
    filtered by the margin guard."""
    docs = spark.createDataFrame(
        [
            (1, "marker shared", "aa"),
            (2, "marker shared", "aa"),
            (3, "other shared", "bb"),
            (4, "other shared", "bb"),
        ],
        "doc_id long, text string, lang string",
    )
    docs.createOrReplaceTempView("__chi_fix")
    out = spark.sql(
        ff.chi2_tokens_sql("spark", table="__chi_fix", top=5)
    ).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    # 'shared' appears in ALL docs -> nt = n -> excluded by margin guard;
    # the perfect discriminators rank first with chi2 = N * 1e6 (phi = 1)
    for lang in ("aa", "bb"):
        top = by_lang[lang][0]
        assert top["rank"] == 1
        assert top["chi2_ppm"] == 4 * 10**6
    hashes = {r["token_hash"] for r in out}
    assert len(hashes) == 2  # only marker/other survive the guards


def test_seasonal_anomaly_planted_spike(spark):
    """A planted 100-event spike one week into an otherwise 1-per-hour
    stream must be flagged; steady hours must not."""
    from aws_dms_to_hudi_spark.functions.analytics import (
        seasonal_anomaly_sql,
    )

    rows = []
    eid = 0
    for h in range(21 * 24):  # three weeks, one event per hour
        n = 100 if h == 200 else 1
        for _ in range(n):
            rows.append((eid, h * 3600 + 30, 7, "click", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, sec long, user_id long, event_type string, "
        "value double, props string",
    )
    from pyspark.sql import functions as F

    df = df.select(
        "event_id",
        F.timestamp_seconds("sec").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    df.createOrReplaceTempView("__anom_fix")
    out = spark.sql(seasonal_anomaly_sql("spark", events="__anom_fix"))
    flagged = {r["hour_bucket"]: r for r in out.collect()}
    assert 200 in flagged and flagged[200]["residual"] == 99
    # the echo one week later: hour 200+168 drops back DOWN vs the spike
    assert 368 in flagged and flagged[368]["residual"] == -99
    assert all(h in (200, 368) for h in flagged)


def test_leakage_safe_split_keeps_neardups_together(spark):
    """Two verified near-dup docs whose per-doc hashes land in
    different splits must ride ONE group key — zero leaked pairs."""
    from aws_dms_to_hudi_spark.functions.sampling import (
        leakage_safe_split_sql,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    docs.createOrReplaceTempView("__lss_docs")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "doc_a long, doc_b long"
    )
    pairs.createOrReplaceTempView("__lss_pairs")
    from aws_dms_to_hudi_spark.functions.components import (
        connected_components_star,
    )

    labels = connected_components_star(spark.table("__lss_pairs"))
    labels.createOrReplaceTempView("__lss_labels")
    out = spark.sql(leakage_safe_split_sql(
        "spark", table="__lss_docs", pairs="__lss_pairs",
        labels="__lss_labels",
    ))
    rows = out.collect()
    assert sum(r["n_docs"] for r in rows) == 40
    assert sum(r["n_grouped_docs"] for r in rows) == 5
    assert all(r["n_leaked_pairs"] == 0 for r in rows)


def test_feature_snapshot_horizons(spark):
    """Hand fixture: one customer with orders at asof, asof-40d,
    asof-200d — horizon membership must nest correctly."""
    from aws_dms_to_hudi_spark.functions.features import (
        feature_snapshot_sql,
    )

    rows = [
        (1, 7, "F", 10.0, "2024-12-31"),
        (2, 7, "F", 20.0, "2024-11-21"),  # 40d back: in 90/365 only
        (3, 7, "F", 40.0, "2024-06-14"),  # 200d back: in 365 only
        (4, 8, "F", 5.0, "2024-12-31"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, d string",
    )
    from pyspark.sql import functions as F

    df = df.withColumn("o_orderdate", F.col("d").cast("timestamp")).drop("d")
    df.createOrReplaceTempView("__snap_fix")
    out = {r["o_custkey"]: r for r in
           spark.sql(feature_snapshot_sql("spark", orders="__snap_fix"))
           .collect()}
    c = out[7]
    assert (c["n_orders_30d"], c["n_orders_90d"], c["n_orders_365d"]) == (1, 2, 3)
    assert (c["spend_30d"], c["spend_90d"], c["spend_365d"]) == (10.0, 30.0, 70.0)
    assert out[8]["n_orders_30d"] == 1


def test_ab_test_z_matches_hand_formula(spark):
    """The pooled z over a planted conversion imbalance equals the
    textbook two-proportion formula computed in Python."""
    import math

    from aws_dms_to_hudi_spark.functions.analytics import ab_test_sql
    from aws_dms_to_hudi_spark.functions.sampling import bucket_expr

    # 40 users x 20 events; conversion metric = >=14 purchases. Give
    # users whose id ends in 0..3 twenty purchases (converted), others
    # none — conversion then depends only on the id, and the per-variant
    # counts are derivable with the same bucket hash via Spark itself.
    rows = []
    eid = 0
    for u in range(40):
        conv = u % 10 < 4
        for i in range(20):
            et = "purchase" if conv else "view"
            rows.append((eid, 1000 + eid, u, et, 1.0, "{}"))
            eid += 1
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows,
        "event_id long, sec long, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.timestamp_seconds("sec")).drop("sec")
    df.createOrReplaceTempView("__ab_fix")
    row = spark.sql(ab_test_sql("spark", events="__ab_fix")).collect()[0]
    assert row["n_a"] + row["n_b"] == 40
    assert row["c_a"] + row["c_b"] == 16
    p = (row["c_a"] + row["c_b"]) / (row["n_a"] + row["n_b"])
    z = (row["c_a"] / row["n_a"] - row["c_b"] / row["n_b"]) / math.sqrt(
        p * (1 - p) * (1 / row["n_a"] + 1 / row["n_b"])
    )
    assert abs(row["z_pooled"] - round(z, 6)) <= 1e-6


# ---------------------------------------------------------------- ks drift


def _ks(spark, rows):
    df = spark.createDataFrame(rows, "v double, fa boolean")
    from aws_dms_to_hudi_spark.functions.features import ks_drift

    return ks_drift(df, "v", "fa").collect()[0]


def test_ks_identical_samples_zero(spark):
    rows = [(float(i % 5), i % 2 == 0) for i in range(20)]
    r = _ks(spark, rows)
    assert (r["n_a"], r["n_b"], r["d_num"], r["d_ppm"]) == (10, 10, 0, 0)


def test_ks_disjoint_samples_max(spark):
    rows = [(float(i), True) for i in range(5)] + [
        (float(i + 100), False) for i in range(4)
    ]
    r = _ks(spark, rows)
    # fully separated: D = 1 -> d_num = n_a * n_b, d_ppm = 10^6
    assert r["d_num"] == r["n_a"] * r["n_b"] == 20
    assert r["d_ppm"] == 1_000_000


def test_ks_known_small_case(spark):
    # A = {1, 2}, B = {1, 3}: ECDFs diverge by 1/2 at x in [2, 3)
    rows = [(1.0, True), (2.0, True), (1.0, False), (3.0, False)]
    r = _ks(spark, rows)
    assert (r["d_num"], r["d_ppm"]) == (2, 500_000)  # 2/(2*2) = 0.5


def test_ks_cross_sample_ties(spark):
    # heavy ties across samples must aggregate per VALUE before ranking
    rows = [(1.0, True)] * 3 + [(1.0, False)] * 3 + [(2.0, True)] * 2
    r = _ks(spark, rows)
    # F_A(1)=3/5, F_B(1)=1 -> |3*3 - 5*3|=6; at 2: |5*3-3*5|=0
    assert (r["n_a"], r["n_b"], r["d_num"]) == (5, 3, 6)


def test_bootstrap_ci_band_properties(spark):
    """Poisson-bootstrap band: the full-data mean lies inside the
    [2nd-smallest, 2nd-largest]-of-32 replicate band, the band has
    positive width on non-degenerate data, and both engines agree
    bit-for-bit (integer floor-div means)."""
    import duckdb

    rows = [(k, "A" if k % 2 == 0 else "B", 100.0 + (k % 37))
            for k in range(1, 401)]
    schema = "o_orderkey long, o_orderstatus string, o_totalprice double"
    spark.createDataFrame(rows, schema).createOrReplaceTempView(
        "__boot_orders")
    got = [tuple(r) for r in spark.sql(
        ff.bootstrap_ci_sql("spark", orders="__boot_orders")
    ).collect()]
    assert [r[0] for r in got] == ["A", "B"]
    for _, n, mean, lo, hi in got:
        assert n == 200
        assert lo <= mean <= hi
        assert lo < hi
    con = duckdb.connect()
    con.execute("CREATE TABLE orders (o_orderkey BIGINT, "
                "o_orderstatus VARCHAR, o_totalprice DOUBLE)")
    con.executemany("INSERT INTO orders VALUES (?, ?, ?)", rows)
    assert got == [tuple(r) for r in con.execute(
        ff.bootstrap_ci_sql("duckdb")).fetchall()]
