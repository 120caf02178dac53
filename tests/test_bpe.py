"""BPE tokenizer training (functions/bpe.py): the Spark training loop,
the DuckDB unrolled oracle, and an independent pure-Python greedy BPE
must agree — including the self-pair (a = b) run case where greedy
leftmost merging is non-trivial (matches overlap inside runs)."""

import re
from collections import Counter

import duckdb
import pytest

from aws_dms_to_hudi_spark.functions import bpe


def python_bpe(texts: list[str], rounds: int) -> list[tuple]:
    """Independent greedy-leftmost BPE on normalized words."""
    words = []
    for t in texts:
        t = re.sub(r"\s+", " ", t.strip().lower())
        words.extend(list(w) for w in t.split(" ") if w)
    merges = []
    for r in range(rounds):
        c: Counter = Counter()
        for w in words:
            for i in range(len(w) - 1):
                c[(w[i], w[i + 1])] += 1
        if not c:
            break
        (a, b), n = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((r, a, b, n))
        for w in words:
            i = 0
            while i < len(w) - 1:
                if w[i] == a and w[i + 1] == b:
                    w[i : i + 2] = [a + b]
                i += 1
    return merges


CORPORA = {
    # self-pair runs: best pair is (a, a); "aaaa" must become "aa","aa"
    # (two merges), "aaa" must become "aa","a" (one) — parity, not count
    "runs": ["aaaa aaa aa xy", "aaaa aaa xy xy"],
    # alternating pattern: non-overlapping matches of an a≠b pair
    "alternating": ["ababab abab", "ababab ab cd"],
    # multi-round chaining: early merges feed later pair counts
    "chain": ["the thermal theory", "the theater there other ether"],
}


def _fixture_rows(texts):
    # doc_ids 0..n-1 stay inside the BPE_SAMPLE_MOD sample for n ≤ 2
    assert len(texts) <= bpe.BPE_SAMPLE_KEEP
    return [(i, t) for i, t in enumerate(texts)]


@pytest.mark.parametrize("name", sorted(CORPORA))
def test_oracle_matches_python_reference(name):
    texts = CORPORA[name]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", _fixture_rows(texts)
    )
    got = [tuple(r) for r in con.execute(bpe.bpe_oracle_sql(rounds=4)).fetchall()]
    assert got == python_bpe(texts, 4)


@pytest.mark.parametrize("name", sorted(CORPORA))
def test_spark_train_matches_python_reference(spark, name):
    texts = CORPORA[name]
    spark.createDataFrame(
        _fixture_rows(texts), "doc_id long, text string"
    ).createOrReplaceTempView("__bpe_test_docs")
    got = [
        tuple(r)
        for r in bpe.bpe_train(spark, "__bpe_test_docs", rounds=4).collect()
    ]
    assert got == python_bpe(texts, 4)


def test_merge_literal_escaping():
    assert bpe._lit("a'b") == "'a\\'b'"
    assert bpe._lit("a\\b") == "'a\\\\b'"


def python_bpe_encode(rows: list[tuple], rounds: int) -> list[tuple]:
    """Reference encode: train on the hash sample, apply the merges in
    order to EVERY doc, profile per doc."""
    sample = [t for i, t in rows if i % bpe.BPE_SAMPLE_MOD < bpe.BPE_SAMPLE_KEEP]
    merges = python_bpe(sample, rounds)
    out = []
    for doc_id, t in rows:
        tt = re.sub(r"\s+", " ", t.strip().lower())
        words = [list(w) for w in tt.split(" ") if w]
        for _, a, b, _n in merges:
            for w in words:
                i = 0
                while i < len(w) - 1:
                    if w[i] == a and w[i + 1] == b:
                        w[i : i + 2] = [a + b]
                    i += 1
        toks = [s for w in words for s in w]
        out.append((doc_id, len(toks),
                    sum(1 for s in toks if len(s) > 1),
                    sum(len(s) for s in toks)))
    return sorted(out)


# doc 25 is OUTSIDE the training sample (25 % 10 >= 2) but must still be
# encoded with the sample-trained merges — the train/encode split.
ENCODE_ROWS = [
    (0, "the thermal theory aaaa"),
    (1, "the theater there other ether abab"),
    (25, "thee aaaa ababab unseen theory"),
]


def test_encode_oracle_matches_python_reference():
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", ENCODE_ROWS)
    got = sorted(
        tuple(r)
        for r in con.execute(bpe.bpe_encode_oracle_sql(rounds=4)).fetchall()
    )
    assert got == python_bpe_encode(ENCODE_ROWS, 4)


def test_spark_encode_matches_python_reference(spark):
    spark.createDataFrame(
        ENCODE_ROWS, "doc_id long, text string"
    ).createOrReplaceTempView("__bpe_enc_docs")
    merges = bpe.bpe_train(spark, "__bpe_enc_docs", rounds=4).collect()
    got = sorted(
        tuple(r)
        for r in bpe.bpe_encode(
            spark, "__bpe_enc_docs", merges, rounds=4
        ).collect()
    )
    assert got == python_bpe_encode(ENCODE_ROWS, 4)


def test_plan_merge_batches():
    """Batch planning: disjoint merges share a pass; merges that share
    an input symbol (overlap hazard) or consume an earlier merge's
    output (chaining hazard) start a new pass; rank order is kept."""
    def m(*pairs):
        return [(r, a, b, 1) for r, (a, b) in enumerate(pairs)]

    # fully disjoint -> one pass
    assert bpe.plan_merge_batches(m(("a", "b"), ("c", "d"), ("e", "f")), 9) \
        == [[("a", "b"), ("c", "d"), ("e", "f")]]
    # shared input symbol b -> split (matches could overlap in 'abc')
    assert bpe.plan_merge_batches(m(("a", "b"), ("b", "c")), 9) \
        == [[("a", "b")], [("b", "c")]]
    # output of round 0 consumed by round 1 -> split
    assert bpe.plan_merge_batches(m(("t", "h"), ("th", "e")), 9) \
        == [[("t", "h")], [("th", "e")]]
    # mixed: (a,b)+(c,d) batch, then (ab,c) must wait
    assert bpe.plan_merge_batches(
        m(("a", "b"), ("c", "d"), ("ab", "c")), 9
    ) == [[("a", "b"), ("c", "d")], [("ab", "c")]]
    # rounds cap truncates the merge list
    assert bpe.plan_merge_batches(m(("a", "b"), ("c", "d")), 1) \
        == [[("a", "b")]]


def test_batched_encode_equals_sequential_replay(spark):
    """Adversarial corpus where the trained merges both chain (th->the)
    and self-run (a,a): the batched encode must be byte-identical to a
    forced one-merge-per-pass sequential replay."""
    rows = [
        (0, "ababab the thermal aaaa cd cd cd"),
        (1, "the theater aaaa abab cdcd"),
        (25, "unseen theory aaa ab cd"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string"
    ).createOrReplaceTempView("__bpe_batch_docs")
    merges = bpe.bpe_train(spark, "__bpe_batch_docs", rounds=5).collect()
    batched = sorted(
        tuple(r) for r in
        bpe.bpe_encode(spark, "__bpe_batch_docs", merges, rounds=5).collect()
    )
    # sequential replay: one pass per merge via merge_round_sql
    from aws_dms_to_hudi_spark.functions.dedup import materialize
    sym = materialize(
        spark.sql(bpe.symbols0_sql("spark", "__bpe_batch_docs", sample=False))
    )
    for row in merges[:5]:
        view = f"__bpe_seq_{int(row[0])}"
        sym.createOrReplaceTempView(view)
        sym = materialize(
            spark.sql(bpe.merge_round_sql(view, row[1], row[2]))
        )
    sym.createOrReplaceTempView("__bpe_seq_final")
    seq = sorted(
        tuple(r) for r in spark.sql(
            """SELECT doc_id, CAST(COUNT(*) AS LONG) AS n_tokens,
                      CAST(SUM(CASE WHEN LENGTH(s) > 1 THEN 1 ELSE 0 END)
                           AS LONG) AS n_merged_tokens,
                      CAST(SUM(LENGTH(s)) AS LONG) AS n_chars
               FROM __bpe_seq_final GROUP BY doc_id"""
        ).collect()
    )
    assert batched == seq


def test_encode_conserves_chars(spark):
    """Merging never creates or destroys characters: per-doc n_chars
    must equal the pre-merge character count of the normalized text."""
    spark.createDataFrame(
        ENCODE_ROWS, "doc_id long, text string"
    ).createOrReplaceTempView("__bpe_enc_docs2")
    merges = bpe.bpe_train(spark, "__bpe_enc_docs2", rounds=4).collect()
    got = {
        r["doc_id"]: r["n_chars"]
        for r in bpe.bpe_encode(
            spark, "__bpe_enc_docs2", merges, rounds=4
        ).collect()
    }
    for doc_id, t in ENCODE_ROWS:
        norm = re.sub(r"\s+", " ", t.strip().lower())
        expect = sum(len(w) for w in norm.split(" ") if w)
        assert got[doc_id] == expect


def test_roundtrip_exact_on_adversarial_runs(spark):
    """Decode(encode(x)) must equal the tokenizer normalization of x for
    EVERY doc — including runs of one symbol (greedy self-pair parity),
    multi-space whitespace, and words that merge to single tokens."""
    rows = [
        # docs 0/1 are in the training hash-sample (doc_id % 10 < 2) and
        # carry enough pair mass for all 4 rounds; 2-4 are encode-only
        (0, "the thermal theory there other ether aaaa abab"),
        (1, "aaaa aaa aa a theory the the abab"),
        (2, "  The   quick  brown "),  # whitespace normalization
        (3, "abababab abab"),          # overlapping ab-ab merges
        (4, "zzz"),                    # single word, run merge
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string"
    ).createOrReplaceTempView("__bpe_rt_docs")
    merges = bpe.bpe_train(spark, "__bpe_rt_docs", rounds=4).collect()
    got = sorted(
        tuple(r) for r in bpe.bpe_roundtrip(
            spark, "__bpe_rt_docs", merges, rounds=4
        ).collect()
    )
    assert [r[0] for r in got] == [0, 1, 2, 3, 4]
    assert all(r[2] == 1 for r in got), got  # every doc round-trips
    # and the DuckDB oracle agrees end-to-end on the same fixture
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    oracle = sorted(tuple(r) for r in con.execute(
        bpe.bpe_roundtrip_oracle_sql(rounds=4)).fetchall())
    assert got == oracle
