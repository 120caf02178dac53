"""r6 operators: snapshot-drift contract audit, ROUGE-2 adjacent-doc
overlap, exact phi-frequent heavy hitters — hand-computed fixtures for
the edge semantics the corpus-level oracle compare can't isolate
(zero-baseline drift, clipped multiset counts, exact-threshold
exclusion)."""

from pyspark.sql import functions as F  # noqa: F401

from aws_dms_to_hudi_spark.functions import dedup as fn_dedup
from aws_dms_to_hudi_spark.functions import features as fn_feat
from aws_dms_to_hudi_spark.functions import text as fn_text


def test_snapshot_drift_metrics_and_zero_baseline(spark):
    """Known two-snapshot fixture: early has 2 rows / late has 4, a
    null price in late only, and a categorical domain that widens —
    every metric hand-checkable; drift over a zero baseline is NULL."""
    rows = [
        # early (< 1996): 2 rows, statuses {F}, priorities {1-URGENT}
        (1, 10, "F", 10.00, "1995-03-01 00:00:00", "1-URGENT"),
        (2, 11, "F", 20.00, "1995-06-01 00:00:00", "1-URGENT"),
        # late (>= 1996): 4 rows, one NULL price, statuses {F,O}
        (3, 10, "F", 30.00, "1996-02-01 00:00:00", "1-URGENT"),
        (4, 12, "O", 10.00, "1996-03-01 00:00:00", "2-HIGH"),
        (5, 13, "O", None, "1996-04-01 00:00:00", "2-HIGH"),
        (6, 13, "O", 20.00, "1996-05-01 00:00:00", "3-MEDIUM"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    df.createOrReplaceTempView("__r6_drift")
    got = {
        r["metric"]: (r["early_v"], r["late_v"], r["drift_ppm"])
        for r in spark.sql(
            fn_feat.snapshot_drift_sql("spark", orders="__r6_drift")
        ).collect()
    }
    assert got["n_rows"] == (2, 4, 1_000_000)  # doubled = +100%
    # null ppm: early 0/2 -> 0; late 1/4 -> 250000; baseline 0 -> NULL
    assert got["null_ppm_totalprice"] == (0, 250_000, None)
    assert got["distinct_custkey"] == (2, 3, 500_000)
    assert got["distinct_orderstatus"] == (1, 2, 1_000_000)
    assert got["distinct_orderpriority"] == (1, 3, 2_000_000)
    # mean cents: early (1000+2000)/2=1500; late (3000+1000+2000)/4=1500
    assert got["mean_cents"] == (1500, 1500, 0)


def test_rouge2_clipped_multiset_counts(spark):
    """Three docs in one source: doc 2 repeats a bigram doc 1 has once
    (clip must take the MIN, not the product or distinct), doc 3 shares
    nothing. Token bigrams: 'a b' appears in doc1 x1, doc2 x2."""
    rows = [
        (1, "a b c", "s"),       # bigrams: (a,b), (b,c)
        (2, "a b a b", "s"),     # bigrams: (a,b) x2, (b,a)
        (3, "x y z", "s"),       # bigrams: (x,y), (y,z)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    df.createOrReplaceTempView("__r6_rouge")
    got = {
        r["doc_id"]: r.asDict()
        for r in spark.sql(
            fn_dedup.rouge2_overlap_sql("spark", table="__r6_rouge")
        ).collect()
    }
    # pair (2, ref=1): clip = min(2,1) for (a,b) = 1; doc tot=3, ref tot=2
    p2 = got[2]
    assert p2["ref_id"] == 1
    assert p2["clipped_bigrams"] == 1
    assert p2["rouge2_recall_ppm"] == 500_000   # 1/2
    assert p2["rouge2_prec_ppm"] == 333_333     # floor(1/3)
    assert p2["rouge2_f1_ppm"] == 400_000       # 2*1/(3+2)
    # pair (3, ref=2): zero overlap rows survive with 0 ppm
    p3 = got[3]
    assert p3["ref_id"] == 2
    assert p3["clipped_bigrams"] == 0
    assert (p3["rouge2_recall_ppm"], p3["rouge2_prec_ppm"]) == (0, 0)
    # doc 1 has no predecessor: absent
    assert 1 not in got


def test_heavy_hitters_exact_threshold_excluded(spark):
    """cnt*k > N is STRICT: with k=4 and a 20-token stream, a token at
    exactly 5 occurrences (5*4 == 20) is out; 6 occurrences is in."""
    # stream: 'a' x6, 'b' x5, 'c' x9 -> N=20
    text_a = " ".join(["a"] * 6 + ["b"] * 5 + ["c"] * 9)
    df = spark.createDataFrame([(1, text_a)], "doc_id long, text string")
    df.createOrReplaceTempView("__r6_hh")
    got = spark.sql(
        fn_text.heavy_hitters_sql("spark", table="__r6_hh", k=4)
    ).collect()
    toks = [(r["token"], r["occurrences"], r["freq_ppm"], r["hh_rank"])
            for r in got]
    assert toks == [
        ("c", 9, 450_000, 1),
        ("a", 6, 300_000, 2),
    ]


def test_padding_waste_hand_fixture(spark):
    """Two docs of 3 and 6 tokens at L=4: doc2 truncated (1 of 2 docs
    -> 500000 ppm), tokens lost = (3+6) - (3+4) = 2 of 9, padding =
    (4-3)+(4-4) = 1 of 8 slots."""
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d e f")], "doc_id long, text string"
    )
    df.createOrReplaceTempView("__r6_pad")
    rows = {
        r["max_len"]: r.asDict()
        for r in spark.sql(
            fn_text.padding_waste_sql(
                "spark", table="__r6_pad", lengths=(4, 8)
            )
        ).collect()
    }
    l4 = rows[4]
    assert l4["n_docs"] == 2
    assert l4["docs_truncated_ppm"] == 500_000
    assert l4["tokens_lost_ppm"] == 222_222       # floor(2e6/9)
    assert l4["padding_ppm"] == 125_000           # 1/8
    l8 = rows[8]
    assert l8["docs_truncated_ppm"] == 0
    assert l8["tokens_lost_ppm"] == 0
    assert l8["padding_ppm"] == 437_500           # (5+2)/16


def test_dedup_threshold_curve_monotone_and_matches_q19(spark, sf_correct):
    """Curve counts are non-increasing in the threshold, and the 50%
    row equals the q19 pair count on the same corpus."""
    spark.read.parquet(f"{sf_correct}/documents.parquet") \
        .createOrReplaceTempView("__r6_curve_docs")
    curve = spark.sql(
        fn_dedup.dedup_threshold_curve_sql("spark", table="__r6_curve_docs")
    ).collect()
    by_t = {r["threshold_pct"]: r for r in curve}
    ts = sorted(by_t)
    for a, b in zip(ts, ts[1:]):
        assert by_t[a]["n_pairs"] >= by_t[b]["n_pairs"]
        assert by_t[a]["n_docs_removed"] >= by_t[b]["n_docs_removed"]
    q19_pairs = spark.sql(
        fn_dedup.ngram_jaccard_sql("spark", table="__r6_curve_docs",
                                   threshold=0.5)
    ).count()
    assert by_t[50]["n_pairs"] == q19_pairs


def test_embedding_quality_flags_collapsed_dim(spark):
    """Four 3-dim vectors where dim 1 is constant (variance 0) while
    dims 0 and 2 vary: only dim 1 is flagged; means are exact."""
    from aws_dms_to_hudi_spark.functions import similarity as fn_sim

    rows = [
        (0, 0, [1.0, 5.0, -2.0]),
        (1, 0, [2.0, 5.0, 2.0]),
        (2, 1, [3.0, 5.0, -2.0]),
        (3, 1, [4.0, 5.0, 2.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )
    df.createOrReplaceTempView("__r6_emb")
    got = {r["dim"]: r.asDict() for r in spark.sql(
        fn_sim.embedding_quality_sql("spark", table="__r6_emb")
    ).collect()}
    assert [got[d]["collapsed"] for d in (0, 1, 2)] == [0, 1, 0]
    assert got[0]["mean_x"] == 2.5
    assert got[1]["mean_x"] == 5.0 and got[1]["var_x"] == 0.0
    assert got[0]["var_x"] == 1.25   # population variance
    assert got[2]["var_x"] == 4.0
