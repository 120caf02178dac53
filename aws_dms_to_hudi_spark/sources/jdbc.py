"""JDBC/RDBMS source: full load + high-watermark incremental scan.

The reference pipeline STARTS at a live RDBMS — DMS reads
mysql | oracle | postgres | mariadb | aurora | aurora-postgresql |
sqlserver (``README.md:11``) in ``full-load-and-cdc`` mode
(``templates/aws-dms-to-hudi.yaml:295``) and lands a change log. This
source covers that entry point natively: Spark's JDBC relation reads the
source table (or its CDC journal), and the incremental scan is a
high-watermark predicate on a monotonically increasing ordering column —
the same checkpoint contract as the DFS sources, stored in the table's
commit manifest so source position and table state commit atomically.

Scale design:

- **Predicate pushdown into the RDBMS.** The watermark filter is baked
  into the ``query`` sent to the database, so an indexed ordering column
  means each incremental poll reads only the new rows — never a full
  table scan shipped over JDBC.
- **Snapshot-consistent watermark.** Each poll first asks the DB for
  ``MAX(ordering)`` (one-row aggregate, pushed down), then reads rows in
  ``(old_watermark, new_watermark]``. Rows committed after the MAX query
  are left for the next poll — no lost updates from reading and
  watermarking at different instants.
- **Partitioned parallel read.** An optional numeric
  ``partition_column`` splits the read into ``num_partitions`` range
  predicates (Spark's standard JDBC partitioning); bounds are fetched
  with a pushed-down MIN/MAX. Without it the read is a single JDBC
  cursor — correct, but serial: always set it for big tables.
- **Envelope derivation on ingest (D3).** ``ordering_column`` is
  normalized to the engine's ``trx_seq`` (zero-padded to the DMS
  sequence width when numeric, pass-through when already a string), and
  an optional ``op_column`` ('I'/'U'/'D', the DMS op code) becomes
  ``_hoodie_is_deleted`` — after this source, the merge path cannot
  tell JDBC ingest from a DMS parquet landing.

Tested against Apache Derby embedded (the only JDBC driver shipped with
Spark) — the dialect surface used (SELECT/WHERE/MAX/derived tables) is
ANSI and identical on the production databases listed above.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHECKPOINT_KEY = "watermark"
SEQ_WIDTH = 50
OP_COL_DELETED = "_hoodie_is_deleted"


class JdbcSource:
    """Incremental reader over an RDBMS table/journal via JDBC."""

    def __init__(
        self,
        spark: SparkSession,
        url: str,
        table: str,
        ordering_column: str,
        driver: str | None = None,
        op_column: str | None = None,
        partition_column: str | None = None,
        num_partitions: int = 8,
        options: dict[str, str] | None = None,
        quote: str = '"',
    ):
        self.spark = spark
        self.url = url
        self.table = table
        self.ordering_column = ordering_column
        self.driver = driver
        self.op_column = op_column
        self.partition_column = partition_column
        self.num_partitions = num_partitions
        self.options = dict(options or {})
        # identifier quote for generated SQL — ANSI double quote works on
        # Derby/Postgres/Oracle; pass '`' for MySQL/MariaDB. Spark's JDBC
        # writer creates case-sensitive quoted columns, so generated
        # predicates must quote to match.
        self.quote = quote

    def _q(self, ident: str) -> str:
        return f"{self.quote}{ident}{self.quote}"

    # ---------- raw JDBC plumbing ----------

    def _reader(self, query: str):
        r = (
            self.spark.read.format("jdbc")
            .option("url", self.url)
            .option("query", query)
        )
        if self.driver:
            r = r.option("driver", self.driver)
        for k, v in self.options.items():
            r = r.option(k, v)
        return r

    def _scalar(self, query: str):
        """One pushed-down scalar (MIN/MAX) round-trip."""
        row = self._reader(query).load().first()
        return None if row is None else row[0]

    def _read_range(self, predicate: str | None) -> DataFrame:
        where = f" WHERE {predicate}" if predicate else ""
        query = f"SELECT * FROM {self.table}{where}"
        if self.partition_column is None:
            return self._reader(query).load()
        # partitioned read: fetch bounds with a pushed-down aggregate,
        # then hand Spark the stride. dbtable+bounds needs a derived
        # table; Derby & friends all accept `(q) t`.
        pc = self.partition_column
        bounds = (
            self._reader(
                f"SELECT MIN({self._q(pc)}) AS lo, MAX({self._q(pc)}) AS hi "
                f"FROM {self.table}{where}"
            ).load().first()
        )
        # positional access: DBs normalize unquoted alias case differently
        if bounds is None or bounds[0] is None:
            return self._reader(query).load()
        r = (
            self.spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", f"({query}) t")
            .option("partitionColumn", self._q(pc))
            .option("lowerBound", str(bounds[0]))
            .option("upperBound", str(bounds[1]))
            .option("numPartitions", str(self.num_partitions))
        )
        if self.driver:
            r = r.option("driver", self.driver)
        for k, v in self.options.items():
            r = r.option(k, v)
        return r.load()

    # ---------- envelope derivation (D3) ----------

    def _envelope(self, df: DataFrame) -> DataFrame:
        oc = self.ordering_column
        dt = dict(df.dtypes)[oc]
        if dt == "string":
            seq = F.col(oc)
        else:
            seq = F.lpad(F.col(oc).cast("string"), SEQ_WIDTH, "0")
        out = df.withColumn("trx_seq", seq)
        if oc != "trx_seq":
            out = out.drop(oc)
        if self.op_column is not None:
            out = out.withColumn(
                OP_COL_DELETED, F.col(self.op_column) == F.lit("D")
            ).drop(self.op_column)
        else:
            out = out.withColumn(OP_COL_DELETED, F.lit(False))
        return out

    # ---------- source contract (read_new, like the DFS sources) ----------

    def _lit(self, v) -> str:
        return f"'{v}'" if isinstance(v, str) else str(v)

    def read_new(
        self, checkpoint: dict[str, Any] | None
    ) -> tuple[DataFrame | None, dict[str, Any]]:
        """Read rows with ordering > watermark; return (batch, next_ckpt).

        First poll (no checkpoint) is the full load — the DMS
        ``full-load-and-cdc`` analog: everything up to the current
        watermark in one batch, later polls only the delta."""
        oc = self._q(self.ordering_column)
        old = (checkpoint or {}).get(CHECKPOINT_KEY)
        gt = f"{oc} > {self._lit(old)}" if old is not None else None
        hi_q = f"SELECT MAX({oc}) AS hi FROM {self.table}"
        if gt:
            hi_q += f" WHERE {gt}"
        hi = self._scalar(hi_q)
        if hi is None:  # no rows past the watermark
            return None, dict(checkpoint or {})
        rng = f"{oc} <= {self._lit(hi)}"
        if gt:
            rng = f"{gt} AND {rng}"
        df = self._read_range(rng)
        return self._envelope(df), {CHECKPOINT_KEY: hi}
