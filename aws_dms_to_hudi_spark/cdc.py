"""CDC envelope + deterministic change-stream fixtures (D3).

The reference's CDC envelope is produced by DMS transformation rules
(``templates/aws-dms-to-hudi.yaml:490-522``):

- ``trx_seq`` — ``$AR_H_CHANGE_SEQ``: a fixed-width, zero-padded, strictly
  increasing change-sequence *string*; lexicographic order == change order.
- ``_hoodie_is_deleted`` — true iff the operation is DELETE.

For differential testing the stream must be reproducible bit-for-bit in
BOTH engines (PySpark and the DuckDB oracle), so the generator is pure SQL
text shared verbatim by both sides: batches are SELECTs over the base
table with key-modulo predicates and arithmetic perturbations only —
no RNG, no floating-point order dependence.

Batch recipe (FIXTURES.md §2 contract):

- batch 0: full load — every base row, ``trx_seq = lpad(key_num, 50, '0')``.
- batch 1: updates for ``key_num % 10 = 3`` (perturb one numeric column),
  PLUS a second, later change for ``key_num % 100 = 3`` — ≥2 changes to one
  key within a single batch (precombine test, D4).
- batch 2: deletes for ``key_num % 10 = 7``.
- batch 3: re-inserts for ``key_num % 20 = 7`` — delete followed by
  re-insert in a later batch (D5/D6 ordering test).

``key_num`` is a deterministic integer over the record key (used only for
the modulo batch predicates). ``trx_seq`` itself must be unique per ROW —
the synthetic base tables contain duplicate record keys (e.g. repeated
``(l_orderkey, l_linenumber)`` pairs), and a per-key sequence would tie,
making the precombine winner nondeterministic across engines. So every row
gets a unique, order-monotone ``__rid`` over ``ORDER BY <all columns>
NULLS FIRST`` — a total order both Spark and DuckDB compute identically
(NULLS FIRST is pinned because the engines' default null ordering
differs) — and ``trx_seq = lpad(batch_block + __rid, 50, '0')``.
``__rid`` is computed scale-safely (bucketed window, see ``_src_cte``),
never via a global unpartitioned window. Per-batch sequence blocks
(b·10^12) keep ``trx_seq`` globally increasing across batches while
zero-padding keeps string order == numeric order (SURVEY.md §7.3: never
cast trx_seq to numeric).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

SEQ_WIDTH = 50
_BLOCK = 10**12


@dataclass(frozen=True)
class CdcRecipe:
    """Deterministic CDC stream definition for one base table."""

    table: str
    columns: tuple[str, ...]  # base column order (stable)
    key_cols: tuple[str, ...]  # record key
    key_num_sql: str  # integer-valued SQL expr identifying a key
    perturb_col: str  # numeric column mutated by updates


# Fixture tables per FIXTURES.md §2 (cdc_supplier is the MOR table).
RECIPES: dict[str, CdcRecipe] = {
    "orders": CdcRecipe(
        table="orders",
        columns=(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ),
        key_cols=("o_orderkey",),
        key_num_sql="o_orderkey",
        perturb_col="o_totalprice",
    ),
    "customer": CdcRecipe(
        table="customer",
        columns=("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
        key_cols=("c_custkey",),
        key_num_sql="c_custkey",
        perturb_col="c_acctbal",
    ),
    "lineitem": CdcRecipe(
        table="lineitem",
        columns=(
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        ),
        # composite key (ComplexKeyGenerator branch, handler.py:105-106);
        # l_linenumber is 1..7 so one decimal digit suffices.
        key_cols=("l_orderkey", "l_linenumber"),
        key_num_sql="l_orderkey * 10 + l_linenumber",
        perturb_col="l_quantity",
    ),
    "supplier": CdcRecipe(
        table="supplier",
        columns=("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
        key_cols=("s_suppkey",),
        key_num_sql="s_suppkey",
        perturb_col="s_acctbal",
    ),
}

N_BATCHES = 4  # batch ids 0..3


def _seq(expr_block: int) -> str:
    return f"lpad(cast({expr_block} + __rid as string), {SEQ_WIDTH}, '0')"


def _cols(recipe: CdcRecipe, perturb_delta: float | None) -> str:
    out = []
    for c in recipe.columns:
        if perturb_delta is not None and c == recipe.perturb_col:
            out.append(f"{c} + {perturb_delta:.1f} AS {c}")
        else:
            out.append(c)
    return ", ".join(out)


_N_RID_BUCKETS = 256
_RID_STRIDE = 10**9


def _src_cte(recipe: CdcRecipe, t: str) -> str:
    """Base relation with a deterministic per-row id (see module doc).

    ``__rid`` is the global row_number over ``ORDER BY <all columns> NULLS
    FIRST`` — but computed WITHOUT a global (unpartitioned) window, which
    would single-partition the sort in Spark and make the fixture, not the
    engine, the bottleneck at scale. Instead the classic two-pass
    range-partitioned rank, expressed as one SQL text both engines run
    identically:

    1. bucket each row by the first sort column (the integer record key)
       MODULO ``_N_RID_BUCKETS`` — a pure deterministic expression both
       engines evaluate identically, uniform under ANY integer key
       distribution (dense, banded, clustered), no data statistics
       needed;
    2. ``__rid = bucket * 10^9 + row_number() PARTITION BY bucket`` —
       each window partition is one bucket, so Spark sorts 256 slices in
       parallel and DuckDB computes the same value.

    ``__rid`` is unique and deterministic but NOT globally order-monotone
    — which nothing requires: ``trx_seq`` ordering is only ever compared
    WITHIN a record key (precombine max), and cross-batch order comes
    from the per-batch sequence blocks (b·10^12), not from ``__rid``.
    Capacity: 256 buckets × 10^9 stride = 2.56e11 max, under the batch
    block even after batch 1's second-change offset (+5e11), and q96's
    batch-digit probe (digit 38 == the 10^12 block digit) still isolates
    the batch id. A bucket overflowing 10^9 rows would collide; fixture
    tables are orders of magnitude below that. Assumes the first recipe
    column is integral (true of all fixture recipes); NULL keys pin to
    bucket 0, matching NULLS FIRST.
    """
    c1 = recipe.columns[0]
    order = ", ".join(f"{c} NULLS FIRST" for c in recipe.columns)
    nb = _N_RID_BUCKETS
    bucket = (
        f"CASE WHEN {c1} IS NULL THEN 0 "
        f"ELSE CAST(abs(CAST({c1} AS BIGINT)) % {nb} AS INT) END"
    )
    return (
        f"WITH __bkt AS (SELECT __base.*, {bucket} AS __b "
        f"FROM {t} AS __base), "
        f"src AS (SELECT __bkt.*, CAST(__b AS BIGINT) * {_RID_STRIDE} "
        f"+ row_number() OVER ("
        f"PARTITION BY __b ORDER BY {order}) AS __rid FROM __bkt)"
    )


def batch_sql(
    recipe: CdcRecipe,
    batch_id: int,
    src: str | None = None,
    rid_src: str | None = None,
) -> str:
    """SQL producing CDC batch ``batch_id`` from the base table.

    Identical text runs on Spark (base table as temp view) and DuckDB
    (base table as registered view). ``src`` overrides the FROM relation
    (used when the base table is registered under a scratch view name).

    ``rid_src`` names a relation that ALREADY carries ``__rid`` (the
    ``_src_cte`` output, e.g. a caller-materialized view): the CTE is
    skipped and batches select straight from it. ``__rid`` is a pure
    deterministic function of the base rows, so the produced rows are
    identical either way — the option only removes the re-derivation of
    the row-id window when one text references the source several times
    on an engine that inlines CTEs (Spark); single-batch texts and the
    DuckDB oracle keep the self-contained form.
    """
    k = recipe.key_num_sql
    if rid_src is not None:
        cte, from_rel = "", rid_src
    else:
        cte = _src_cte(recipe, src or recipe.table) + " "
        from_rel = "src"
    if batch_id == 0:
        return (
            f"{cte}SELECT {_cols(recipe, None)}, {_seq(0)} AS trx_seq, "
            f"false AS _hoodie_is_deleted FROM {from_rel}"
        )
    if batch_id == 1:
        first = (
            f"SELECT {_cols(recipe, 1000.0)}, {_seq(1 * _BLOCK)} AS trx_seq, "
            f"false AS _hoodie_is_deleted FROM {from_rel} WHERE ({k}) % 10 = 3"
        )
        second = (
            f"SELECT {_cols(recipe, 2222.0)}, "
            f"{_seq(1 * _BLOCK + _BLOCK // 2)} AS trx_seq, "
            f"false AS _hoodie_is_deleted FROM {from_rel} WHERE ({k}) % 100 = 3"
        )
        return f"{cte}{first} UNION ALL {second}"
    if batch_id == 2:
        return (
            f"{cte}SELECT {_cols(recipe, None)}, {_seq(2 * _BLOCK)} AS trx_seq, "
            f"true AS _hoodie_is_deleted FROM {from_rel} WHERE ({k}) % 10 = 7"
        )
    if batch_id == 3:
        return (
            f"{cte}SELECT {_cols(recipe, 5000.0)}, {_seq(3 * _BLOCK)} AS trx_seq, "
            f"false AS _hoodie_is_deleted FROM {from_rel} WHERE ({k}) % 20 = 7"
        )
    raise ValueError(f"batch_id must be 0..{N_BATCHES - 1}")


def stream_sql(
    recipe: CdcRecipe,
    upto_batch: int = N_BATCHES - 1,
    src: str | None = None,
    from_batch: int = 0,
    rid_src: str | None = None,
) -> str:
    """UNION ALL of batches from_batch..upto_batch — the change log."""
    return " UNION ALL ".join(
        f"({batch_sql(recipe, b, src=src, rid_src=rid_src)})"
        for b in range(from_batch, upto_batch + 1)
    )


def replay_sql(
    recipe: CdcRecipe,
    upto_batch: int = N_BATCHES - 1,
    src: str | None = None,
    from_batch: int = 0,
) -> str:
    """Ground-truth state after replaying batches from_batch..upto_batch.

    Naive replay per FIXTURES.md §3: per record key keep the row with the
    lexicographically max ``trx_seq``, then drop deleted rows. This is the
    oracle for the engine's D4+D5+D6 merge; with ``from_batch > 0`` it is
    also the oracle for the incremental read (changed keys only).
    """
    keys = ", ".join(recipe.key_cols)
    cols = ", ".join(recipe.columns)
    return (
        f"SELECT {cols}, trx_seq FROM ("
        f"  SELECT *, row_number() OVER ("
        f"    PARTITION BY {keys} ORDER BY trx_seq DESC) AS rn"
        f"  FROM ({stream_sql(recipe, upto_batch, src=src, from_batch=from_batch)}) AS cdc_stream"
        f") AS ranked WHERE rn = 1 AND NOT _hoodie_is_deleted"
    )


def generate_batch(
    spark: "SparkSession", sf_dir: str | Path, recipe: CdcRecipe, batch_id: int
) -> "DataFrame":
    """Materialize one CDC batch from the base parquet table."""
    base = spark.read.parquet(str(Path(sf_dir) / f"{recipe.table}.parquet"))
    view = f"__cdc_base_{recipe.table}"
    base.createOrReplaceTempView(view)
    return spark.sql(batch_sql(recipe, batch_id, src=view))


def write_raw_batch(
    spark: "SparkSession",
    sf_dir: str | Path,
    recipe: CdcRecipe,
    batch_id: int,
    raw_root: str | Path,
    identifier: str,
    schema: str = "public",
) -> Path:
    """Land one CDC batch in the DMS raw layout (D3 -> D1 input).

    Layout ``<raw>/<identifier>/<schema>/<table>/<batch-dir>/*.parquet``
    (reference landing tree, ``templates/aws-dms-to-hudi.yaml:266``);
    batch dirs are zero-padded so the source watermark (lexicographic
    path order, see sources.parquet_dfs) equals arrival order.
    """
    df = generate_batch(spark, sf_dir, recipe, batch_id)
    out = Path(raw_root) / identifier / schema / recipe.table / f"batch-{batch_id:05d}"
    df.write.mode("overwrite").parquet(str(out))
    return out
