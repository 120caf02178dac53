"""r8 third-session rewrites: internals-level pins the corpus oracle
compare can't express — the MG hash-proxy superset guarantee, the
token-string artifact's alignment with the token-hash twin, and the
dq-audit stack/union parity."""

import pandas as pd

from aws_dms_to_hudi_spark.functions import curation as fn_curation
from aws_dms_to_hudi_spark.functions import dedup as fn_dedup
from aws_dms_to_hudi_spark.functions import sketches as fn_sk
from aws_dms_to_hudi_spark.functions.sketches import _mg_partition


def test_mg_partition_covers_every_partition_heavy_item():
    """Misra-Gries guarantee on the int64 (hash-proxy) stream: any item
    with partition frequency > n_p/k survives the partition summary,
    whatever the batch boundaries — the property the two-pass design
    rests on after the r8 switch from strings to hashes."""
    k = 5
    stream = [7] * 40 + [11] * 25 + list(range(1000, 1060))  # n=125
    for size in (3, 17, 125):  # adversarial batch splits
        batches = [
            pd.DataFrame({"hh": pd.Series(stream[i:i + size],
                                          dtype="int64")})
            for i in range(0, len(stream), size)
        ]
        out = set(next(_mg_partition(iter(batches), k, "hh"))["hh"])
        n = len(stream)
        for item, freq in ((7, 40), (11, 25)):
            if freq * k > n:
                assert item in out, (size, item, out)


def test_heavy_hitters_hash_path_matches_relational(spark):
    """End-to-end operator equality on a constructed stream: the
    hash-proxy sketch + string verify emits exactly the plain
    GROUP BY / HAVING heavy-hitter set (freq·k > n), same ordering."""
    toks = (["the"] * 300 + ["of"] * 120 + ["rare%d" % i for i in
                                            range(400)])
    df = spark.createDataFrame([(t,) for t in toks], "token string") \
        .repartition(7)
    got = fn_sk.heavy_hitters(df, k=fn_sk.HH_K).collect()
    n = len(toks)
    exact = sorted(
        ((t, c) for t, c in pd.Series(toks).value_counts().items()
         if c * fn_sk.HH_K > n),
        key=lambda tc: (-tc[1], tc[0]),
    )
    assert [(r["token"], r["freq"]) for r in got] == exact
    assert all(r["n_total"] == n for r in got)


def test_token_rows_view_aligns_with_tokhash_twin(spark, sf_correct):
    """The token-STRING artifact and the token-hash artifact describe
    the same stream: equal occurrence counts, a (doc_id, pos) bijection,
    and the rolling hash of every string equals its twin's h (checked
    exhaustively via one join + python rehash of the distinct tokens)."""
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    tr = fn_dedup.token_rows_view(spark, docs, cache_key=sf_correct)
    th = fn_dedup.tokhash_view(spark, docs, cache_key=sf_correct)
    t_rows = spark.table(tr)
    h_rows = spark.table(th)
    n = t_rows.count()
    assert n == h_rows.count()
    joined = t_rows.join(h_rows, ["doc_id", "pos"])
    assert joined.count() == n  # (doc_id, pos) bijection
    pairs = {(r["t"], r["h"])
             for r in joined.select("t", "h").distinct().collect()}
    for t, h in pairs:
        assert fn_dedup._pytokhash(t) == [h], (t, h)


def test_dq_audit_stack_form_matches_union_form(spark, sf_correct):
    """The Spark stack-unpivot text and the oracle's UNION-ALL text are
    row-identical when both run on Spark over the same views."""
    for t in ("orders", "customer", "lineitem", "nation", "part"):
        spark.read.parquet(f"{sf_correct}/{t}.parquet") \
            .createOrReplaceTempView(f"__dqp_{t}")
    kw = dict(orders="__dqp_orders", customer="__dqp_customer",
              lineitem="__dqp_lineitem", nation="__dqp_nation",
              part="__dqp_part")
    a = spark.sql(fn_curation.dq_audit_sql("spark", **kw)).collect()
    b = spark.sql(fn_curation.dq_audit_sql("duckdb", **kw)).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
