"""Unit tests for the analytics (funnel / retention / islands) and
curation (decontamination / canonical / budget / packing / tf-idf)
operators on handcrafted micro-fixtures, plus plan-shape checks.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aws_dms_to_hudi_spark.functions import analytics as fn_analytics
from aws_dms_to_hudi_spark.functions import curation as fn_curation


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m),
                user_id=u,
                event_type=t,
            )
            for i, (u, m, t) in enumerate(rows)
        ]
    )


class TestFunnel:
    def test_strict_ordering(self, spark):
        # u1: view→click→purchase (full conversion)
        # u2: click BEFORE first view — click must not count
        # u3: view then purchase with no click — purchase must not count
        e = _ev(
            spark,
            [
                (1, 0, "view"), (1, 5, "click"), (1, 9, "purchase"),
                (2, 3, "click"), (2, 4, "view"),
                (3, 0, "view"), (3, 2, "purchase"),
            ],
        )
        row = fn_analytics.funnel(e).collect()[0]
        assert (
            row.n_viewed,
            row.n_clicked_after_view,
            row.n_purchased_after_click,
        ) == (3, 1, 1)

    def test_same_timestamp_not_after(self, spark):
        # click at exactly the view instant is NOT after it
        e = _ev(spark, [(1, 0, "view"), (1, 0, "click")])
        row = fn_analytics.funnel(e).collect()[0]
        assert (row.n_viewed, row.n_clicked_after_view) == (1, 0)


class TestIslands:
    def test_gap_splits(self, spark):
        # u1: events at 0, 30, 120, 130 min with 1h gap → islands
        # {0,30} and {120,130}; u2: single event → one island of 1
        e = _ev(
            spark,
            [
                (1, 0, "view"), (1, 30, "view"),
                (1, 120, "view"), (1, 130, "view"),
                (2, 0, "view"),
            ],
        )
        rows = {
            r.user_id: r
            for r in fn_analytics.activity_islands(e).collect()
        }
        assert rows[1].n_islands == 2 and rows[1].max_island_len == 2
        assert rows[2].n_islands == 1 and rows[2].max_island_len == 1

    def test_exact_hour_gap_does_not_split(self, spark):
        # the break predicate is gap > 1h, so exactly 60 min stays joined
        e = _ev(spark, [(1, 0, "view"), (1, 60, "view")])
        r = fn_analytics.activity_islands(e).collect()[0]
        assert r.n_islands == 1 and r.max_island_len == 2


def _docs(spark, texts, langs=None):
    return spark.createDataFrame(
        [
            Row(
                doc_id=i,
                text=t,
                lang=(langs[i] if langs else "en"),
                n_chars=len(t),
            )
            for i, t in enumerate(texts)
        ]
    )


def _run(spark, df, sql):
    df.createOrReplaceTempView("__t_cur")
    return spark.sql(sql.replace("documents", "__t_cur"))


class TestCuration:
    def test_token_budget_respected(self, spark):
        # 5 docs × 4 tokens in one lang; budget 10 admits exactly the
        # first 2 docs in hash order (cum 4, 8; third would be 12)
        docs = _docs(spark, ["a b c d"] * 5)
        out = _run(
            spark, docs, fn_curation.token_budget_sql("spark", budget=10)
        ).collect()
        assert len(out) == 1
        assert out[0].n_docs == 2 and out[0].n_tokens == 8
        assert out[0].budget_used == 8

    def test_packing_fill(self, spark):
        # 6 docs × 3 tokens, ctx=6 → packs of exactly 2 docs, fill 1.0
        docs = _docs(spark, ["x y z"] * 6)
        out = _run(
            spark, docs, fn_curation.packing_sql("spark", ctx=6)
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert r.n_packs == 3
        assert r.min_docs_per_pack == 2 and r.max_docs_per_pack == 2
        assert r.avg_fill == 1.0

    def test_canonical_keeps_min_id_on_tie(self, spark):
        # doc 0 and its shard copy are byte-identical → kept = 0
        docs = _docs(spark, ["same text here", "different entirely"])
        out = _run(
            spark,
            docs,
            fn_curation.canonical_selection_sql("spark", shard_mod=1),
        ).collect()
        kept = {r.kept_doc for r in out}
        assert kept == {0, 1}  # every base doc got a shard twin
        assert all(r.n_dropped == 1 for r in out)

    def test_decontamination_flags_overlap(self, spark):
        # doc 0 (benchmark: id % 1 == 0 is all — instead use modulus 2:
        # even ids are benchmark). doc 1 shares a 4-gram with doc 0;
        # doc 3 shares nothing.
        docs = _docs(
            spark,
            [
                "alpha beta gamma delta epsilon",      # 0 benchmark
                "alpha beta gamma delta unrelated",    # 1 shares 4-gram
                "zeta eta theta iota kappa",           # 2 benchmark
                "completely disjoint words only here", # 3 clean
            ],
        )
        out = _run(
            spark,
            docs,
            fn_curation.decontamination_sql("spark", n=4, modulus=2),
        ).collect()
        flagged = {r.doc_id for r in out}
        assert flagged == {1}
        assert out[0].n_shared_shingles == 1
        assert out[0].n_benchmark_docs == 1

    def test_tfidf_prefers_higher_tf(self, spark):
        docs = _docs(
            spark,
            [
                "apple apple apple pear",
                "apple pear plum quince",
                "no fruit words at all",
            ],
        )
        out = _run(
            spark,
            docs,
            fn_curation.tfidf_search_sql("spark", terms=("apple",), k=5),
        ).collect()
        assert [r.doc_id for r in out] == [0, 1]
        assert out[0].score > out[1].score

    def test_decontamination_plan_broadcasts_benchmark(
        self, spark, sf_correct
    ):
        import __spark_entry__ as E

        plan = (
            E.q80_decontamination(spark, sf_correct)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestHllRollup:
    def test_band_holds_and_counts_exact(self, spark, sf_correct):
        import __spark_entry__ as E

        rows = {
            r.event_type: r
            for r in E.q87_hll_sketch_rollup(spark, sf_correct).collect()
        }
        e = spark.read.parquet(f"{sf_correct}/events.parquet")
        exact_total = e.select("user_id").distinct().count()
        assert rows["ALL"].n_exact == exact_total
        # the gate IS the 5% sketch band, per level and for the merged
        # union rollup
        assert all(r.within_5pct for r in rows.values())


class TestSkewProfile:
    def test_counts_share_and_skew_factor(self, spark):
        df = spark.createDataFrame(
            [Row(l_suppkey=k, l_returnflag=f, l_linestatus=s)
             for k, f, s in [(1, "A", "O")] * 8 + [(2, "R", "F")] * 2],
        )
        df.createOrReplaceTempView("__t_skew")
        out = spark.sql(
            fn_analytics.skew_profile_sql("spark", table="__t_skew")
        ).collect()
        by = {(r.col_name, r.rnk): r for r in out}
        top = by[("l_returnflag", 1)]
        assert (top.value, top.cnt, top.n_distinct) == ("A", 8, 2)
        assert top.share == 0.8
        # hottest value holds 8/10 across 2 distinct keys: 0.8*2 = 1.6×
        assert top.skew_factor == 1.6
        assert by[("l_suppkey", 2)].value == "2"

    def test_rank_is_count_desc_then_value(self, spark):
        df = spark.createDataFrame(
            [Row(l_suppkey=k, l_returnflag="A", l_linestatus="O")
             for k in [3, 3, 1, 1, 2]],
        )
        df.createOrReplaceTempView("__t_skew2")
        out = spark.sql(
            fn_analytics.skew_profile_sql("spark", table="__t_skew2")
        ).collect()
        sup = [r.value for r in out if r.col_name == "l_suppkey"]
        assert sup == ["1", "3", "2"]  # ties (1,3) break on value


class TestVocabEncode:
    def test_oov_and_checksum_pin_id_sequence(self, spark):
        # vocab_size=2: 'a' (df=2) then 'b' (df=2, larger hash ties go
        # by h) — deterministic; 'z' is OOV everywhere.
        docs = _docs(spark, ["a b z", "b a"])
        docs.createOrReplaceTempView("__t_voc")
        out = spark.sql(
            fn_curation.vocab_encode_sql(
                "spark", table="__t_voc", vocab_size=2
            )
        ).collect()
        r0, r1 = out
        assert (r0.n_tokens, r0.n_oov) == (3, 1)
        assert (r1.n_tokens, r1.n_oov) == (2, 0)
        # same ids, swapped positions => different checksums
        assert r0.enc_checksum != r1.enc_checksum

    def test_full_vocab_means_no_oov(self, spark):
        docs = _docs(spark, ["x y", "y x"])
        docs.createOrReplaceTempView("__t_voc2")
        out = spark.sql(
            fn_curation.vocab_encode_sql(
                "spark", table="__t_voc2", vocab_size=10
            )
        ).collect()
        assert all(r.n_oov == 0 for r in out)


class TestWeightedSample:
    def test_weight_biases_rank_and_k_caps(self, spark):
        from aws_dms_to_hudi_spark.functions import sampling as fn_s

        rows = [Row(doc_id=i, lang="en", n_chars=(1000 if i == 7 else 1))
                for i in range(30)]
        spark.createDataFrame(rows).createOrReplaceTempView("__t_ws")
        out = spark.sql(
            fn_s.weighted_sample_sql("spark", table="__t_ws", k=5)
        ).collect()
        assert len(out) == 5
        # the 1000× weight dominates any hash draw in [0, 2^31)
        assert out[0].doc_id == 7
        assert [r.rnk for r in out] == [1, 2, 3, 4, 5]

    def test_deterministic_across_runs(self, spark):
        from aws_dms_to_hudi_spark.functions import sampling as fn_s

        rows = [Row(doc_id=i, lang=("en" if i % 2 else "fr"),
                    n_chars=10 + i) for i in range(40)]
        spark.createDataFrame(rows).createOrReplaceTempView("__t_ws2")
        sql = fn_s.weighted_sample_sql("spark", table="__t_ws2", k=3)
        a = [tuple(r) for r in spark.sql(sql).collect()]
        b = [tuple(r) for r in spark.sql(sql).collect()]
        assert a == b and len(a) == 6


def _docs(spark, texts, langs=None):
    langs = langs or ["en"] * len(texts)
    return spark.createDataFrame(
        [
            Row(doc_id=i, text=t, lang=lg, source="s0", n_chars=len(t))
            for i, (t, lg) in enumerate(zip(texts, langs))
        ]
    )


class TestGopherQuality:
    def _run(self, spark, texts):
        _docs(spark, texts).createOrReplaceTempView("__gq_docs")
        return {
            r["doc_id"]: r
            for r in spark.sql(
                fn_curation.gopher_quality_sql("spark", table="__gq_docs")
            ).collect()
        }

    def test_rule_boundaries(self, spark):
        # 24 tokens, 22 distinct non-stop + 2 stopword hits, top token
        # frequency 1/24 (under the 1/8 cap), mean length ≈ 6.6
        good = "the of " + " ".join(f"token{i:02d}" for i in range(22))
        rows = self._run(
            spark,
            [
                good,                            # 0: passes every rule
                "the of " + "x " * 18,           # 1: fails r_top (x dominates)
                "the of short doc here now",     # 2: fails r_len (6 < 20)
                " ".join(["a the of"] * 10),     # 3: fails r_mean_len (<4.0)
            ],
        )
        assert rows[0]["keep_doc"] and all(
            rows[0][r] for r in ("r_len", "r_mean_len", "r_stop", "r_top")
        )
        assert not rows[1]["r_top"] and not rows[1]["keep_doc"]
        assert not rows[2]["r_len"]
        assert not rows[3]["r_mean_len"]

    def test_stopword_rule(self, spark):
        # 20+ tokens, healthy lengths, but only one stopword occurrence
        rows = self._run(
            spark, ["the " + " ".join(f"token{i} extra" for i in range(12))]
        )
        assert rows[0]["stop_hits"] == 1 and not rows[0]["r_stop"]


class TestRareBigram:
    def test_common_vs_rare(self, spark):
        # 6 copies of one sentence = its bigrams are above the corpus
        # mean; one outlier doc contributes below-mean bigrams only.
        common = "alpha beta gamma delta epsilon zeta"
        rows = _docs(spark, [common] * 6 + ["unique words never repeated here"])
        rows.createOrReplaceTempView("__rb_docs")
        out = {
            r["doc_id"]: r
            for r in spark.sql(
                fn_curation.rare_bigram_sql("spark", table="__rb_docs")
            ).collect()
        }
        assert out[0]["rare_frac"] == 0.0 and not out[0]["drop_doc"]
        assert out[6]["rare_frac"] == 1.0 and out[6]["drop_doc"]


class TestPiiRedaction:
    def test_masking_complete(self, spark):
        spark.createDataFrame(
            [
                Row(
                    c_custkey=7,
                    c_name="Customer#000000007",
                    c_nationkey=1,
                    c_acctbal=1.0,
                    c_mktsegment="BUILDING",
                )
            ]
        ).createOrReplaceTempView("__pii_cust")
        row = spark.sql(
            fn_curation.pii_redaction_sql("spark", table="__pii_cust")
        ).collect()[0]
        assert row["total_emails"] == 1 and row["total_accts"] == 1
        assert row["fully_masked"] == 1 and row["residual_at"] == 0


class TestMixtureBalance:
    def test_exact_proportions(self, spark):
        from aws_dms_to_hudi_spark.functions import sampling as fn_sampling

        # en:4 de:2 — de is scarcest relative to weight (5//2 = 2 = scale)
        texts = ["doc text"] * 25
        langs = ["en"] * 20 + ["de"] * 5
        _docs(spark, texts, langs).createOrReplaceTempView("__mix_docs")
        out = {
            r["lang"]: r
            for r in spark.sql(
                fn_sampling.mixture_balance_sql(
                    "spark",
                    table="__mix_docs",
                    weights=(("en", 4), ("de", 2)),
                )
            ).collect()
        }
        scale = min(20 // 4, 5 // 2)  # = 2
        assert out["en"]["n_kept"] == 4 * scale
        assert out["de"]["n_kept"] == 2 * scale
        assert out["en"]["n_avail"] == 20 and out["de"]["n_avail"] == 5

    def test_starved_language_forces_scale_zero(self, spark):
        """A weighted language with zero corpus rows must force the
        whole mixture to scale 0 (surface the gap) rather than silently
        violating the exact-proportions contract."""
        from aws_dms_to_hudi_spark.functions import sampling as fn_sampling

        _docs(spark, ["doc text"] * 5, ["en"] * 5).createOrReplaceTempView(
            "__mix_starved"
        )
        out = {
            r["lang"]: r
            for r in spark.sql(
                fn_sampling.mixture_balance_sql(
                    "spark",
                    table="__mix_starved",
                    weights=(("en", 1), ("xx", 1)),
                )
            ).collect()
        }
        assert out["xx"]["n_avail"] == 0 and out["xx"]["n_kept"] == 0
        assert out["en"]["n_avail"] == 5 and out["en"]["n_kept"] == 0


class TestPageRank:
    def test_star_beats_leaves_exactly(self, spark):
        """Star graph: the hub must outscore leaves, and scores must be
        the exact fixed-point integers the recurrence produces."""
        from pyspark.sql import Row

        from aws_dms_to_hudi_spark.functions import components as fn_comp

        spark.createDataFrame(
            [Row(doc_a=1, doc_b=h) for h in (2, 3, 4, 5)]
        ).createOrReplaceTempView("__pr_pairs")
        rows = spark.sql(
            fn_comp.pagerank_sql(
                "spark", "SELECT doc_a, doc_b FROM __pr_pairs", top=10
            )
        ).collect()
        scores = {r["node"]: r["score"] for r in rows}
        assert scores[1] > scores[2] == scores[3] == scores[4] == scores[5]
        # replay the integer recurrence in python: bit-exact contract
        S = fn_comp.PR_SCALE
        deg = {1: 4, 2: 1, 3: 1, 4: 1, 5: 1}
        v = {n: S for n in deg}
        und = [(1, h) for h in (2, 3, 4, 5)] + [(h, 1) for h in (2, 3, 4, 5)]
        for _ in range(fn_comp.PR_ITERS):
            nxt = {}
            for n in deg:
                inc = sum(v[a] // deg[a] for a, b in und if b == n)
                nxt[n] = 15 * S // 100 + 85 * inc // 100
            v = nxt
        assert scores == v
