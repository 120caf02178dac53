"""Unit tests for the training-data extension operators (functions/).

Cross-engine parity is covered by test_entry_contract (q16-q26); these
tests check operator *semantics*: planted near-dup recovery, LSH recall
vs the exact baseline, the multimodal stub gate, and scale-shape
assertions on the physical plan (no cartesian product in any dedup /
similarity plan).
"""

import pytest

from aws_dms_to_hudi_spark.functions import dedup as fn_dedup
from aws_dms_to_hudi_spark.functions import multimodal as fn_mm
from aws_dms_to_hudi_spark.functions import similarity as fn_sim
from aws_dms_to_hudi_spark.functions import text as fn_text

from tests.util import duck_con


@pytest.fixture(scope="module")
def docs_view(spark, sf_correct):
    spark.read.parquet(f"{sf_correct}/documents.parquet").createOrReplaceTempView(
        "t_documents"
    )
    return "t_documents"


@pytest.fixture(scope="module")
def emb_view(spark, sf_correct):
    spark.read.parquet(f"{sf_correct}/embeddings.parquet").createOrReplaceTempView(
        "t_embeddings"
    )
    return "t_embeddings"


def test_minhash_recall_vs_exact(spark, docs_view):
    """MinHash-LSH must recover ≥90% of the true Jaccard≥0.5 pairs (the
    fixture plants 25 pairs at ~0.99, where 4×4 banding is near-certain)."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in spark.sql(
            fn_dedup.ngram_jaccard_sql("spark", table=docs_view)
        ).collect()
    }
    approx = {
        (r.doc_a, r.doc_b)
        for r in spark.sql(
            fn_dedup.minhash_lsh_sql("spark", table=docs_view)
        ).collect()
    }
    assert exact, "fixture should contain near-dup pairs"
    assert approx <= exact, "verify stage must kill false positives"
    assert len(approx) / len(exact) >= 0.9


def test_dedup_df_cap_bounds_join_and_keeps_true_pairs(spark):
    """DEDUP_MAX_DF semantics: a shingle present in more than the cap's
    document count is dropped from the inverted index BEFORE the
    candidate join (bounding candidates to cap·|inv|), while true
    near-dup pairs — whose shared shingles have df ≈ clone-family size
    — survive with their Jaccard computed on the capped sets.

    Fixture: `cap+2` docs all sharing one ubiquitous sentence (so every
    3-shingle of it has df > cap), two of which additionally share a
    long unique tail (the planted near-dup)."""
    cap = fn_dedup.DEDUP_MAX_DF
    common = "alpha beta gamma delta epsilon zeta eta theta"
    tail = " ".join(f"tok{i} tok{i+1} tok{i+2}" for i in range(0, 60, 3))
    rows = [(i, f"{common} filler{i}") for i in range(cap + 2)]
    rows.append((1000, f"{common} {tail}"))
    rows.append((1001, f"{common} {tail} zz"))
    spark.createDataFrame(rows, "doc_id long, text string") \
        .createOrReplaceTempView("__cap_docs")
    pairs = spark.sql(
        fn_dedup.ngram_jaccard_sql("spark", table="__cap_docs",
                                   threshold=0.5)
    ).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    # the ubiquitous sentence alone must produce NO pair: its shingles
    # are capped away, and the filler token breaks cross-doc shingles
    assert got == {(1000, 1001)}, got
    # uncapped form would pair every doc with every doc through the
    # common sentence — pin that the cap is what prevents it
    unc = spark.sql(
        fn_dedup.ngram_jaccard_sql("spark", table="__cap_docs",
                                   threshold=0.5, max_df=None)
    ).count()
    assert unc > len(got)


def test_simhash_finds_planted_neardups(spark, docs_view):
    """The ~0.99-Jaccard planted pairs must land within hamming ≤ 2."""
    jac = {
        (r.doc_a, r.doc_b)
        for r in spark.sql(
            fn_dedup.ngram_jaccard_sql("spark", table=docs_view, threshold=0.9)
        ).collect()
    }
    sim = {
        (r.doc_a, r.doc_b)
        for r in spark.sql(fn_dedup.simhash_sql("spark", table=docs_view)).collect()
    }
    assert jac and jac <= sim


def test_ann_is_subset_with_recall(spark, emb_view):
    exact = {
        (r.q_id, r.neighbor_id)
        for r in spark.sql(fn_sim.cosine_topk_sql("spark", table=emb_view)).collect()
    }
    approx = {
        (r.q_id, r.neighbor_id)
        for r in spark.sql(fn_sim.ann_lsh_sql("spark", table=emb_view)).collect()
    }
    # ANN neighbors must be real vectors scored exactly; with hamming-1
    # multiprobe the fixture recall is ~0.93 — assert a safe floor far
    # above chance (chance ≈ k/corpus ≈ 0.6%).
    assert len(exact & approx) / len(exact) >= 0.6


def test_exact_dedup_no_collisions(spark, sf_correct):
    """500 distinct fixture texts → 500 distinct fingerprints."""
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    groups = fn_text.exact_dedup_groups(docs)
    assert groups.count() == docs.count()


def test_multimodal_stub_gate():
    # jpeg/wav decode, the mp4 container walk, and MJPEG-in-MP4 codec
    # decode are REAL since r4 (bad bytes -> ValueError from the
    # parser); a valid mp4 WITHOUT an MJPEG video trak still raises
    # NotImplementedError at the codec boundary (needs ffmpeg).
    with pytest.raises(ValueError):
        fn_mm.decode_media(b"\x00\x01", "jpeg")
    with pytest.raises(ValueError):
        fn_mm.decode_media(b"\x00\x01", "wav")
    with pytest.raises(ValueError):
        fn_mm.decode_media(b"\x00\x01", "mp4")
    valid = fn_mm.encode_mp4(b"isom", 1000, 42, 1, b"xx")
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        fn_mm.decode_media(valid, "mp4")


def test_multimodal_feature_determinism():
    f1 = fn_mm.decode_media(b"hello world", "raw")
    f2 = fn_mm.decode_media(b"hello world", "raw")
    assert f1 == f2
    assert f1["n_bytes"] == 11


@pytest.mark.parametrize(
    "sql_fn",
    [
        fn_dedup.ngram_jaccard_sql,
        fn_dedup.minhash_lsh_sql,
        fn_dedup.simhash_sql,
    ],
)
def test_dedup_plans_have_no_cartesian(spark, docs_view, sql_fn):
    """Scale guard: every candidate-generation join must be an equi-join
    (hash key), never a cartesian/broadcast-nested-loop over the corpus."""
    plan = spark.sql(sql_fn("spark", table=docs_view))._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lang_markers_disjoint():
    """Marker sets must not overlap or argmax ties become vocabulary-
    dependent in surprising ways."""
    seen = set()
    for words in fn_text.LANG_MARKERS.values():
        assert not (seen & set(words))
        seen |= set(words)


def test_ivf_recall_and_exhaustive_probe_equivalence(spark, emb_view):
    exact = {
        (r.q_id, r.neighbor_id)
        for r in spark.sql(fn_sim.cosine_topk_sql("spark", table=emb_view)).collect()
    }
    ivf = {
        (r.q_id, r.neighbor_id)
        for r in spark.sql(fn_sim.ivf_topk_sql("spark", table=emb_view)).collect()
    }
    # fixture recall at the default nprobe is 0.93; floor well above
    # chance (k/corpus ≈ 0.6%) but safely under the measured value
    assert len(exact & ivf) / len(exact) >= 0.6
    # probing every centroid makes IVF exhaustive — must equal brute force
    full = {
        (r.q_id, r.neighbor_id)
        for r in spark.sql(
            fn_sim.ivf_topk_sql(
                "spark", table=emb_view, nprobe=fn_sim.NUM_CENTROIDS
            )
        ).collect()
    }
    assert full == exact


def test_resize_media_payload_bytes(spark, sf_smoke):
    """The resized binary itself (not just the projections the oracle
    checks) must equal the stride-decimation of the input bytes."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(5)
    media = fn_mm.attach_binary(docs)
    rows = {r.doc_id: r for r in fn_mm.resize_media(media).collect()}
    for src in docs.collect():
        p = src.text.encode("utf-8")
        step = max(1, len(p) // fn_mm.RESIZE_TARGET)
        expect = p[::step][: fn_mm.RESIZE_TARGET]
        got = rows[src.doc_id]
        assert bytes(got.payload) == expect
        assert got.n_bytes_out == len(expect)


def test_sample_frames_reassemble(spark, sf_smoke):
    """Sampled frames are true contiguous chunks at their claimed
    offsets, and stride-1 docs (short payloads) reassemble exactly."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(8)
    media = fn_mm.attach_binary(docs)
    frames: dict[int, list] = {}
    for r in fn_mm.sample_frames(media).collect():
        frames.setdefault(r.doc_id, []).append(r)
    for src in docs.collect():
        p = src.text.encode("utf-8")
        for r in frames[src.doc_id]:
            lo = r.frame_idx * fn_mm.FRAME_SIZE
            assert bytes(r.frame) == p[lo : lo + fn_mm.FRAME_SIZE]
        total = -(-len(p) // fn_mm.FRAME_SIZE)
        if total <= 4:  # stride 1: every frame sampled -> exact reassembly
            assert b"".join(
                bytes(r.frame)
                for r in sorted(frames[src.doc_id], key=lambda r: r.frame_idx)
            ) == p


def test_connected_components_shapes(spark):
    """Chain (multi-round propagation), triangle, disjoint pair, and a
    cross-shaped star all label to their component minimum."""
    from pyspark.sql import Row

    from aws_dms_to_hudi_spark.functions.components import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [
            Row(doc_a=1, doc_b=2),  # chain 1-2-3-4: diameter 3
            Row(doc_a=2, doc_b=3),
            Row(doc_a=3, doc_b=4),
            Row(doc_a=10, doc_b=11),  # triangle
            Row(doc_a=11, doc_b=12),
            Row(doc_a=10, doc_b=12),
            Row(doc_a=20, doc_b=21),  # disjoint pair
            Row(doc_a=31, doc_b=30),  # star centered on 30
            Row(doc_a=32, doc_b=30),
            Row(doc_a=33, doc_b=30),
        ]
    )
    got = {
        r.node: r.component for r in connected_components(edges).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
        30: 30, 31: 30, 32: 30, 33: 30,
    }


def test_connected_components_diameter_bound(spark):
    """max_iter below the chain diameter raises instead of returning a
    partially-propagated (wrong) labeling."""
    import pytest as _pytest
    from pyspark.sql import Row

    from aws_dms_to_hudi_spark.functions.components import (
        connected_components,
    )

    chain = spark.createDataFrame(
        [Row(doc_a=i, doc_b=i + 1) for i in range(8)]
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2)
    full = {
        r.node: r.component for r in connected_components(chain).collect()
    }
    assert set(full.values()) == {0}


def test_connected_components_star_shapes(spark):
    """The O(log n)-round large-star/small-star variant labels the same
    chain/triangle/pair/star fixture identically to min-label."""
    from pyspark.sql import Row

    from aws_dms_to_hudi_spark.functions.components import (
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [
            Row(doc_a=1, doc_b=2),
            Row(doc_a=2, doc_b=3),
            Row(doc_a=3, doc_b=4),
            Row(doc_a=10, doc_b=11),
            Row(doc_a=11, doc_b=12),
            Row(doc_a=10, doc_b=12),
            Row(doc_a=20, doc_b=21),
            Row(doc_a=31, doc_b=30),
            Row(doc_a=32, doc_b=30),
            Row(doc_a=33, doc_b=30),
        ]
    )
    got = {
        r.node: r.component
        for r in connected_components_star(edges).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
        30: 30, 31: 30, 32: 30, 33: 30,
    }


def test_connected_components_star_long_path(spark):
    """Path graph with diameter 60: the min-label loop refuses at its
    default 25-round budget; the star variant converges in O(log n)
    rounds and matches the recursive-CTE oracle."""
    import duckdb
    import pytest as _pytest
    from pyspark.sql import Row

    from aws_dms_to_hudi_spark.functions.components import (
        components_oracle_sql,
        connected_components,
        connected_components_star,
    )

    n = 60
    rows = [Row(doc_a=i, doc_b=i + 1) for i in range(n)]
    chain = spark.createDataFrame(rows)
    with _pytest.raises(RuntimeError, match="large-star"):
        connected_components(chain)
    got = {
        r.node: r.component
        for r in connected_components_star(chain).collect()
    }
    pairs_sql = " UNION ALL ".join(
        f"SELECT {a} AS doc_a, {b} AS doc_b" for a, b in [(i, i + 1) for i in range(n)]
    )
    oracle = duckdb.connect().execute(
        components_oracle_sql(pairs_sql)
    ).fetchall()
    assert got == {node: comp for node, comp in oracle}
    assert set(got.values()) == {0} and len(got) == n + 1


def test_connected_components_star_random_vs_union_find(spark):
    """Deterministic pseudo-random graph vs a Python union-find."""
    from pyspark.sql import Row

    from aws_dms_to_hudi_spark.functions.components import (
        connected_components_star,
    )

    # deterministic LCG so the fixture is stable across runs
    state, edges = 12345, []
    for _ in range(300):
        state = (state * 1103515245 + 12345) % (2**31)
        a = state % 120
        state = (state * 1103515245 + 12345) % (2**31)
        b = state % 120
        if a != b:
            edges.append((a, b))
    parent = list(range(120))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {a for e in edges for a in e}
    expected = {x: find(x) for x in touched}
    got = {
        r.node: r.component
        for r in connected_components_star(
            spark.createDataFrame([Row(doc_a=a, doc_b=b) for a, b in edges])
        ).collect()
    }
    assert got == expected


def test_batch_tokhash_bit_identical_to_scalar():
    """The Arrow batch path must reproduce the scalar reference hash
    exactly — unicode code points, ASCII-only whitespace splitting,
    empty docs at batch boundaries, long tokens, empty-token runs."""
    import random
    import string

    from aws_dms_to_hudi_spark.functions.dedup import (
        _batch_tokhash,
        _pytokhash,
    )

    cases = [
        "hello world", "  leading and   trailing  ", "", " ", "single",
        "ünïcödé tökens ÆØÅ 中文 字符 🎉 emoji",
        "tab\tand\nnewline\r\nmix",
        "a" * 500 + " " + "b" * 300,
        " nbsp is not ascii ws",  # re.ASCII: \s must not split
        "double  space   runs",
    ]
    random.seed(7)
    alphabet = string.printable + "éü中🎉 "
    fuzz = ["".join(random.choice(alphabet)
                    for _ in range(random.randrange(0, 200)))
            for _ in range(300)]
    for batch in [cases, ["", *cases], [*cases, ""], ["", ""], ["solo"],
                  [], fuzz]:
        got = [list(map(int, a)) for a in _batch_tokhash(batch)]
        assert got == [_pytokhash(t) for t in batch]


def test_centroid_assignment_is_diagonal_dominant(spark, sf_correct):
    """The fixture's labels are generated as clusters, so the k-means
    E-step should assign the (large) majority of vectors back to their
    own label's centroid."""
    from aws_dms_to_hudi_spark.functions import similarity as fn_sim

    spark.read.parquet(f"{sf_correct}/embeddings.parquet") \
        .createOrReplaceTempView("__cent_emb")
    out = spark.sql(
        fn_sim.centroid_assign_sql("spark", table="__cent_emb")
    ).collect()
    total = sum(r.n_vecs for r in out)
    diag = sum(r.n_vecs for r in out if r.true_label == r.assigned_label)
    # fixture clusters are noisy: euclidean E-step recovers ~41% of the
    # 10 labels — far above the 10% random floor, which is the signal
    # this sanity check pins (not classifier accuracy)
    assert total > 0 and diag / total > 0.3, (diag, total)


class TestSemDeDup:
    def test_within_cluster_only_min_id_canonical(self, spark):
        from aws_dms_to_hudi_spark.functions import similarity as fn_sim

        # cluster 0: vecs 0,1 identical (dup), vec 2 orthogonal;
        # cluster 1: vec 3 identical to vec 0 but in ANOTHER cluster —
        # must NOT be dropped (SemDeDup never compares across clusters).
        def vec(axis):  # DIM-wide one-hot (the fold is fixed at DIM)
            v = [0.0] * fn_sim.DIM
            v[axis] = 1.0
            return v

        rows = [
            (0, vec(0), 0),
            (1, vec(0), 0),
            (2, vec(1), 0),
            (3, vec(0), 1),
        ]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).createOrReplaceTempView("__sd_emb")
        out = {
            r["vec_id"]: r
            for r in spark.sql(
                fn_sim.semdedup_sql("spark", table="__sd_emb", tau=0.9)
            ).collect()
        }
        assert out[0]["kept"] and out[0]["canonical_id"] is None
        assert not out[1]["kept"] and out[1]["canonical_id"] == 0
        assert out[2]["kept"]
        assert out[3]["kept"]  # cross-cluster twin survives

        # The Arrow kernel path (r8: per-shard pairwise cosine in
        # applyInPandas, used by the q123 gate) must agree with the SQL
        # form row-for-row on the same fixture.
        import pandas as pd

        sql_df = (
            spark.sql(fn_sim.semdedup_sql("spark", table="__sd_emb",
                                          tau=0.9))
            .toPandas()
        )
        arrow_df = fn_sim.semdedup(spark, "__sd_emb", tau=0.9).toPandas()
        pd.testing.assert_frame_equal(
            sql_df.reset_index(drop=True),
            arrow_df.reset_index(drop=True),
            check_dtype=False,
        )


class TestHeavyHitters:
    def test_exact_on_any_layout(self, spark):
        from aws_dms_to_hudi_spark.functions import sketches as fn_sk

        # 'hot' is 30% of the stream, 'warm' exactly at the strict
        # threshold boundary (freq*k == n -> excluded), rest unique.
        k = 10
        rows = (
            [("hot",)] * 300 + [("warm",)] * 100  # n=1000 -> warm*10 == 1000
            + [(f"u{i}",) for i in range(600)]
        )
        df = spark.createDataFrame(rows, "token string")
        for parts in (1, 7, 32):  # layout must not change the answer
            got = fn_sk.heavy_hitters(df.repartition(parts), k=k).collect()
            assert [(r["token"], r["freq"]) for r in got] == [("hot", 300)]

    def test_multiple_hitters_ordered(self, spark):
        from aws_dms_to_hudi_spark.functions import sketches as fn_sk

        rows = [("a",)] * 50 + [("b",)] * 40 + [(f"u{i}",) for i in range(10)]
        df = spark.createDataFrame(rows, "token string").repartition(5)
        got = fn_sk.heavy_hitters(df, k=4).collect()  # threshold n/4 = 25
        assert [(r["token"], r["freq"]) for r in got] == [("a", 50), ("b", 40)]

    def test_per_group_exact_on_any_layout(self, spark):
        """Per-group MG: each group's threshold is ITS OWN total, so a
        token can be heavy in a small group while globally invisible;
        layout independence at 1/7/32 partitions."""
        from aws_dms_to_hudi_spark.functions import sketches as fn_sk

        rows = (
            # en: n=1000, 'hot' 300 (heavy at k=10), 'warm' 100 (== bound)
            [("en", "hot")] * 300 + [("en", "warm")] * 100
            + [("en", f"u{i}") for i in range(600)]
            # fr: n=20, 'petit' 5 -> 5*10 > 20: heavy despite tiny counts
            + [("fr", "petit")] * 5 + [("fr", f"v{i}") for i in range(15)]
        )
        df = spark.createDataFrame(rows, "lang string, token string")
        for parts in (1, 7, 32):
            got = fn_sk.heavy_hitters_by_group(
                df.repartition(parts), "lang", k=10
            ).collect()
            assert [(r["lang"], r["token"], r["freq"], r["n_group"])
                    for r in got] == [("en", "hot", 300, 1000),
                                      ("fr", "petit", 5, 20)]


class TestFuzzyJoin:
    def test_edit1_families_covered(self, spark):
        """Deletion-neighborhood blocking must catch substitution,
        insertion, AND deletion pairs at distance 1 (FastSS cover)."""
        from aws_dms_to_hudi_spark.functions import dedup as fn_dedup

        rows = [
            (0, "Alpha Bravo", 1, 1.0, "SEG"),     # variant: substitution
            (7, "Charlie Three", 1, 1.0, "SEG"),   # variant: substitution
        ]
        spark.createDataFrame(
            rows,
            "c_custkey long, c_name string, c_nationkey int, "
            "c_acctbal double, c_mktsegment string",
        ).createOrReplaceTempView("__fz_cust")
        got = spark.sql(
            fn_dedup.fuzzy_join_sql("spark", customer="__fz_cust")
        ).collect()
        links = {(r["var_id"], r["base_id"]) for r in got}
        # both corrupted variants must link back to their origins
        assert (10_000_000, 0) in links and (10_000_007, 7) in links
        assert all(r["dist"] <= 1 for r in got)


def test_repeated_ngrams_planted_spans(spark):
    """Two docs sharing a verbatim 6-token span and one unique doc:
    only the sharers report repeated 5-gram shingles, and the unique
    doc reports zero (arXiv:2107.06499 exact-substring signal)."""
    span = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, f"one two three {span} four five six"),
        (2, f"seven eight {span} nine ten eleven twelve"),
        (3, "完全 unique words only nothing shared here at all friend"),
    ]
    spark.createDataFrame(rows, ["doc_id", "text"]).createOrReplaceTempView(
        "__rng_docs"
    )
    out = {
        r["doc_id"]: (r["n_repeated"], r["repeated_frac"])
        for r in spark.sql(
            fn_dedup.repeated_ngram_sql("spark", table="__rng_docs")
        ).collect()
    }
    # a shared 6-token run yields exactly two repeated 5-gram shingles
    assert out[1][0] == 2 and out[2][0] == 2
    assert out[3] == (0, 0.0)
    assert 0 < out[1][1] < 1


def test_power_iteration_finds_dominant_direction(spark):
    """Vectors drawn along a known dominant axis (plus small fixed
    off-axis noise): after two iterations v must align with that axis —
    the dominant coordinate dwarfs every other (sign-insensitive)."""
    import numpy as np

    rng = np.random.RandomState(7)
    d, n = 8, 300
    axis = np.zeros(d)
    axis[3] = 1.0
    rows = []
    for i in range(n):
        vec = (rng.randn() * 0.5) * axis + rng.randn(d) * 0.02
        rows.append((i, [float(x) for x in vec]))
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>"
    ).createOrReplaceTempView("__pi_docs")
    out = fn_sim.power_iteration(spark, "__pi_docs").collect()
    v = np.array([r["v"] for r in sorted(out, key=lambda r: r["dim"])],
                 dtype=np.float64)
    cos = abs(v[3]) / np.sqrt((v ** 2).sum())
    assert cos > 0.95, (cos, v)


def test_power_iteration_layout_independent(spark):
    """Identical output on any input partitioning — integer sums are
    order-immune, so the result is a pure function of the data."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    outs = []
    for parts in (1, 13):
        emb.repartition(parts).createOrReplaceTempView(f"__pi_l{parts}")
        outs.append(tuple(
            (r["dim"], r["v"])
            for r in fn_sim.power_iteration(spark, f"__pi_l{parts}").collect()
        ))
    assert outs[0] == outs[1]


def test_prefix_jaccard_equals_plain_and_prunes(spark, docs_view):
    """Prefix filtering must return exactly the plain all-shingles
    result (the WWW'07 theorem) while generating strictly fewer
    candidate pairs than the full inverted-index self-join."""
    plain = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in spark.sql(
            fn_dedup.ngram_jaccard_sql(
                "spark", table=docs_view,
                threshold=fn_dedup.PREFIX_JACCARD_T)
        ).collect()
    }
    pref = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in spark.sql(
            fn_dedup.prefix_jaccard_sql("spark", table=docs_view)
        ).collect()
    }
    assert pref == plain and plain
    # candidate volume: prefix-index self-join pairs vs full-index pairs
    base = fn_dedup._prefix_base_cte("spark", docs_view, None, None, None)
    n_pref = spark.sql(
        f"WITH {base}\nSELECT COUNT(*) AS n FROM ("
        + fn_dedup.prefix_jaccard_cand_body(fn_dedup.PREFIX_JACCARD_T)
        + ") c"
    ).collect()[0]["n"]
    n_full = spark.sql(
        f"WITH {base}\nSELECT COUNT(*) AS n FROM ("
        "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
        "FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id) c"
    ).collect()[0]["n"]
    assert n_pref < n_full


def test_pq_adc_recall_vs_exact(spark, emb_view, sf_correct):
    """ADC over 32-bit codes is lossy, but must recover a meaningful
    share of the TRUE L2 neighbors — measured 9/15 against exact
    top-10 on the fixture (chance is ~0.9/15); assert a safe floor
    far above chance."""
    import numpy as np

    rows = sorted(
        spark.read.parquet(f"{sf_correct}/embeddings.parquet")
        .select("vec_id", "embedding").collect(),
        key=lambda r: r["vec_id"],
    )
    X = np.array([r["embedding"] for r in rows])
    picks: dict[int, set] = {}
    for r in fn_sim.pq_adc(spark, emb_view).collect():
        picks.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    hits = 0
    for q in range(5):
        d = ((X - X[q]) ** 2).sum(1)
        d[q] = 1e18
        hits += len(picks[q] & set(int(i) for i in np.argsort(d)[:10]))
    assert hits >= 5, hits  # ~5x chance at minimum; measured 9


def test_pq_adc_layout_independent(spark, sf_correct):
    """Integer training + coding + ADC: identical output on any input
    partitioning."""
    emb = spark.read.parquet(f"{sf_correct}/embeddings.parquet")
    outs = []
    for parts in (1, 17):
        emb.repartition(parts).createOrReplaceTempView(f"__pq_l{parts}")
        outs.append(tuple(
            tuple(r) for r in fn_sim.pq_adc(spark, f"__pq_l{parts}").collect()
        ))
    assert outs[0] == outs[1]


class TestCountMinSketch:
    def test_one_sided_bound_and_real_collisions(self):
        """CM guarantee: est >= exact for every probe; with W=16 and a
        31-token vocab, collisions (genuine over-estimates) must occur.
        DuckDB-side (the SQL is dialect-shared; engine parity is pinned
        by the entry contract test)."""
        import duckdb

        from aws_dms_to_hudi_spark.functions import sketches as fn_sk

        import duckdb

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.01/documents.parquet')"
        )
        pdf = con.execute(fn_sk.count_min_sql("duckdb")).fetchdf()
        assert len(pdf) == pdf["token"].nunique() > 0
        assert (pdf["over_err"] >= 0).all()          # one-sided bound
        assert (pdf["est"] - pdf["exact"] == pdf["over_err"]).all()
        assert (pdf["over_err"] > 0).any()           # sketch, not a count


class TestKmvSketch:
    def test_estimates_within_band(self):
        """k=256 -> sigma ~ 1/sqrt(254) ~ 6%; assert a 4-sigma band on
        both the union and intersection estimates, and the subset
        invariants (A proper subset of B => matched <= k, exact_inter
        <= exact_union)."""
        import duckdb

        from aws_dms_to_hudi_spark.functions import sketches as fn_sk

        import duckdb

        con = duckdb.connect()
        for t in ("orders", "customer"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('/root/testdata/sf0.01/{t}.parquet')"
            )
        r = con.execute(fn_sk.kmv_sql("duckdb")).fetchdf().iloc[0]
        assert r["k_a"] <= fn_sk.KMV_K and r["k_b"] <= fn_sk.KMV_K
        assert r["matched"] <= min(r["k_a"], r["k_b"])
        assert r["exact_inter"] <= r["exact_union"]
        for est, exact in (("est_union", "exact_union"),
                           ("est_inter", "exact_inter")):
            rel = abs(r[est] - r[exact]) / r[exact]
            assert rel < 0.25, (est, r[est], r[exact])


class TestIncrementalIngestDedup:
    def test_delta_vs_base_only(self, spark):
        """Verdicts cover the whole delta; matches link delta->base
        only — base x base and delta x delta duplicates must NOT leak
        into the output (in-batch dedup is q19/q20's contract)."""
        from aws_dms_to_hudi_spark.functions import dedup as fn_dedup

        dup = "the quick brown fox jumps over the lazy dog tonight"
        rows = [
            (1, dup),                                        # base
            (2, dup),                                        # base twin
            (3, "completely different base text about spark shuffles"),
            (10, dup),                                       # delta: dup of base
            (20, "a unique incoming document with fresh tokens only"),
            (30, "identical incoming pair alpha beta gamma delta epsilon"),
            (40, "identical incoming pair alpha beta gamma delta epsilon"),
        ]
        spark.createDataFrame(rows, "doc_id long, text string") \
            .createOrReplaceTempView("__inc_docs")
        out = {
            r["doc_id"]: r
            for r in spark.sql(
                fn_dedup.incremental_minhash_sql("spark", table="__inc_docs")
            ).collect()
        }
        assert set(out) == {10, 20, 30, 40}          # whole delta, only delta
        assert out[10]["is_dup"] and out[10]["best_jaccard"] == 1.0
        assert out[10]["best_match"] in (1, 2)
        assert not out[20]["is_dup"] and out[20]["best_match"] is None
        assert not out[30]["is_dup"] and not out[40]["is_dup"]  # delta x delta excluded


class TestBm25:
    def test_length_normalization_beats_tfidf(self, spark):
        """Same tf, different doc length: BM25 must score the SHORT doc
        higher (the k1/b normalization raw TF-IDF lacks)."""
        from aws_dms_to_hudi_spark.functions import curation as fn_c

        filler = " ".join(f"w{i}" for i in range(200))
        rows = [
            (1, "spark join spark"),                  # short, tf=2
            (2, "spark join spark " + filler),        # long, same tf
            (3, filler),                              # no hit
        ]
        spark.createDataFrame(rows, "doc_id long, text string") \
            .createOrReplaceTempView("__bm25_docs")
        out = spark.sql(
            fn_c.bm25_search_sql("spark", table="__bm25_docs")
        ).collect()
        got = {r["doc_id"]: r["score"] for r in out}
        assert set(got) == {1, 2}
        assert got[1] > got[2] > 0


class TestTriangleCount:
    def test_hand_counted_fixture(self, spark):
        """Baskets {1,2,3}, {1,2,3,4}, {4,5}, {5,6}, {6,1}: 9 edges,
        triangles 123/124/134/234 = 4, wedges 20, gcc 0.6."""
        from aws_dms_to_hudi_spark.functions import components as fn_cp

        rows = [(10, 1), (10, 2), (10, 3), (20, 1), (20, 2), (20, 3),
                (20, 4), (30, 4), (30, 5), (40, 5), (40, 6), (50, 6),
                (50, 1)]
        spark.createDataFrame(rows, "l_orderkey long, l_partkey long") \
            .createOrReplaceTempView("__tri_li")
        [r] = spark.sql(
            fn_cp.triangle_count_sql("spark", lineitem="__tri_li")
        ).collect()
        assert (r["n_nodes"], r["n_edges"], r["n_wedges"],
                r["n_triangles"], r["gcc_ppm"]) == (6, 9, 20, 4, 600000)

    def test_adjacency_driver_matches_sql(self, spark):
        """The Spark adjacency-intersect driver (no wedge shuffle) must
        agree with the one-statement wedge-join SQL on the same
        fixture, column for column."""
        from aws_dms_to_hudi_spark.functions import components as fn_cp

        rows = [(10, 1), (10, 2), (10, 3), (20, 1), (20, 2), (20, 3),
                (20, 4), (30, 4), (30, 5), (40, 5), (40, 6), (50, 6),
                (50, 1)]
        spark.createDataFrame(rows, "l_orderkey long, l_partkey long") \
            .createOrReplaceTempView("__tri_li2")
        [r] = fn_cp.triangle_count(spark, "__tri_li2").collect()
        assert (r["n_nodes"], r["n_edges"], r["n_wedges"],
                r["n_triangles"], r["gcc_ppm"]) == (6, 9, 20, 4, 600000)

    def test_adjacency_driver_no_triangles(self, spark):
        """A pure path graph (no baskets of ≥3 distinct parts sharing
        co-membership cycles): zero triangles, gcc 0 — exercises the
        NULL-sum coalesce in the driver."""
        from aws_dms_to_hudi_spark.functions import components as fn_cp

        rows = [(10, 1), (10, 2), (20, 2), (20, 3), (30, 3), (30, 4)]
        spark.createDataFrame(rows, "l_orderkey long, l_partkey long") \
            .createOrReplaceTempView("__tri_li3")
        [r] = fn_cp.triangle_count(spark, "__tri_li3").collect()
        assert (r["n_nodes"], r["n_edges"], r["n_wedges"],
                r["n_triangles"], r["gcc_ppm"]) == (4, 3, 2, 0, 0)


class TestJlProjection:
    def test_distortion_concentrates_and_layout_independent(self, spark):
        from aws_dms_to_hudi_spark.functions import similarity as fn_s

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        emb.createOrReplaceTempView("__jl_emb")
        rows = spark.sql(
            fn_s.jl_projection_sql("spark", table="__jl_emb")
        ).collect()
        assert all(r["norm2"] > 0 and r["normp2"] >= 0 for r in rows)
        mean_ppm = sum(r["distortion_ppm"] for r in rows) / len(rows)
        assert 700_000 < mean_ppm < 1_300_000  # E[ratio]=1, chi^2_16 tails
        emb.repartition(7).createOrReplaceTempView("__jl_emb")
        again = spark.sql(
            fn_s.jl_projection_sql("spark", table="__jl_emb")
        ).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


class TestKcore:
    def test_cascade_fixture(self, spark):
        """k=2 on a graph where a tail triggers cascading peels:
        triangle {1,2,3} + chain 3-4, 4-5. Round 1 drops 5 (deg 1),
        round 2 drops 4 (deg fell to 1) — after 2+ rounds only the
        triangle survives, every node at degree 2. One round alone
        would keep node 4: the cascade is what the rounds are for."""
        from aws_dms_to_hudi_spark.functions import components as fn_cp

        # baskets: each edge = a 2-item order
        rows = [(10, 1), (10, 2), (20, 2), (20, 3), (30, 1), (30, 3),
                (40, 3), (40, 4), (50, 4), (50, 5)]
        spark.createDataFrame(rows, "l_orderkey long, l_partkey long") \
            .createOrReplaceTempView("__kcore_li")
        got = {(r["node"], r["core_deg"])
               for r in fn_cp.kcore(spark, "__kcore_li", k=2, rounds=3).collect()}
        assert got == {(1, 2), (2, 2), (3, 2)}

    def test_oracle_agrees(self, spark):
        from aws_dms_to_hudi_spark.functions import components as fn_cp

        rows = [(10, 1), (10, 2), (20, 2), (20, 3), (30, 1), (30, 3),
                (40, 3), (40, 4), (50, 4), (50, 5)]
        import duckdb

        con = duckdb.connect()
        con.execute("CREATE TABLE lineitem (l_orderkey BIGINT, l_partkey BIGINT)")
        con.executemany("INSERT INTO lineitem VALUES (?, ?)", rows)
        got = sorted(
            tuple(r) for r in
            con.execute(fn_cp.kcore_oracle_sql(k=2, rounds=3)).fetchall()
        )
        assert got == [(1, 2), (2, 2), (3, 2)]


class TestGoldenRecord:
    def test_survivorship_rules(self, spark):
        """Cluster {widgt, widget, widgets}: name = longest ('widgets'),
        brand = mode ('B1' appears twice), size = min, price = max;
        singleton 'gear' passes through unchanged."""
        from aws_dms_to_hudi_spark.functions import dedup as fn_d

        rows = [
            ("widgt", "B1", 5, 10.0),
            ("widget", "B1", 3, 12.0),
            ("widgets", "B2", 7, 11.0),
            ("gear", "B9", 9, 1.0),
        ]
        spark.createDataFrame(
            rows, "p_name string, p_brand string, p_size int, p_retailprice double"
        ).createOrReplaceTempView("__gr_part")
        lbl = [("widgt", "widget"), ("widget", "widget"), ("widgets", "widget")]
        spark.createDataFrame(lbl, "node string, component string") \
            .createOrReplaceTempView("__gr_lbl")
        got = {
            r["cluster"]: (r["golden_name"], r["golden_brand"],
                           r["golden_size"], r["golden_price"],
                           r["n_records"], r["n_names"])
            for r in spark.sql(fn_d.golden_record_sql(
                "spark", part="__gr_part", labels="__gr_lbl")).collect()
        }
        assert got["widget"] == ("widgets", "B1", 3, 12.0, 3, 3)
        assert got["gear"] == ("gear", "B9", 9, 1.0, 1, 1)


class TestNewOpPlanShapes:
    """Scale guards for the r4 final-batch operators: candidate
    generation and PIT lookup must plan as hash equi-joins — never a
    cartesian or broadcast-nested-loop over a corpus-sized side."""

    def _plan(self, df):
        return df._jdf.queryExecution().executedPlan().toString()

    def test_dup_spans_and_paragraph_no_cartesian(self, spark, docs_view):
        for fn in (fn_dedup.dup_span_sql, fn_dedup.paragraph_dedup_sql):
            plan = self._plan(spark.sql(fn("spark", table=docs_view)))
            assert "CartesianProduct" not in plan
            assert "BroadcastNestedLoopJoin" not in plan

    def test_phrase_search_is_key_join(self, spark, docs_view):
        plan = self._plan(
            spark.sql(fn_dedup.phrase_search_sql("spark", table=docs_view))
        )
        assert "CartesianProduct" not in plan

    def test_pit_join_hash_not_bnlj(self, spark, sf_correct):
        """The SCD2 interval predicate must stay a residual filter on a
        custkey hash join — Spark must not degrade to a nested loop."""
        import __spark_entry__ as entry_mod

        df = entry_mod.queries()["q203_pit_join"](spark, sf_correct)
        plan = self._plan(df)
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


def test_pseudonymization_referential_integrity(spark, sf_smoke):
    from aws_dms_to_hudi_spark.functions.curation import pseudonymize_sql

    spark.read.parquet(f"{sf_smoke}/customer.parquet").createOrReplaceTempView(
        "__ps_c"
    )
    spark.read.parquet(f"{sf_smoke}/orders.parquet").createOrReplaceTempView(
        "__ps_o"
    )
    rows = spark.sql(
        pseudonymize_sql("spark", customer="__ps_c", orders="__ps_o")
    ).collect()
    assert rows
    for r in rows:
        # joining through the surrogate must reproduce the raw-key join
        assert r["n_orders_pseud"] == r["n_orders_raw"]
        assert r["collisions"] == 0
    # surrogates never leak the raw key
    leak = spark.sql(
        "SELECT COUNT(*) FROM (SELECT c_custkey, "
        + pseudonymize_sql("spark", customer="__ps_c", orders="__ps_o")
        .split("cmap AS (\n  SELECT c_custkey, ")[1]
        .split(" AS pseud")[0]
        + " AS pseud FROM __ps_c) WHERE CAST(c_custkey AS STRING) = pseud"
    ).first()[0]
    assert leak == 0


def test_wav_frame_features_drops_trailing_remainder(spark):
    """n = 40 + doc_id%25 samples, frame = 16: doc 0 has 40 samples ->
    2 full frames (8 trailing samples dropped), doc 24 has 64 -> 4."""
    from aws_dms_to_hudi_spark.functions.multimodal import (
        WAV_FRAME,
        wav_frame_features,
    )

    docs = spark.createDataFrame([(0,), (24,)], "doc_id long")
    got = {r["doc_id"]: r for r in wav_frame_features(docs).collect()}
    assert got[0]["n_frames"] == 40 // WAV_FRAME == 2
    assert got[24]["n_frames"] == 64 // WAV_FRAME == 4
    # energy of full frames only: strictly less than whole-signal energy
    import numpy as np

    for d in (0, 24):
        n = 40 + d % 25
        i = np.arange(n, dtype=np.int64)
        s = (d * 31 + i * 17) % 2001 - 1000
        nf = n // WAV_FRAME
        full = s[: nf * WAV_FRAME]
        assert got[d]["total_energy"] == int((full * full).sum())
