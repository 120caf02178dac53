"""Curated table storage: multi-versioned keyed parquet tables.

This is the engine's stand-in for a Hudi table (SURVEY.md §1.1 Layer B):
row-keyed, columnar-stored, multi-versioned, with a commit timeline.

Layout under ``<lake_root>/<table_name>/``::

    _commits/00000001.json      commit manifest (written LAST, atomically)
    _commits/_archived.json     trimmed timeline entries (D14)
    v00000001/                  snapshot data (hive-partitioned if configured)
    v00000002/l_returnflag=A/   COW: only touched partitions are rewritten;
                                the manifest maps partition -> newest dir
    v00000003_delta/            MOR: appended delta log (compacted later)

Commit manifest fields::

    {"version": 3, "operation": "upsert", "parent": 2,
     "data": {"l_returnflag=A": "v00000003/l_returnflag=A", ...}
              (unpartitioned: {"": "v00000003"}),
     "deltas": ["v00000004_delta", ...],     # MOR only
     "checkpoint": {...},                     # source position (D2)
     "ts": "..."}

Crash safety (SURVEY.md §7.3): data dirs are written first, the manifest
rename is the commit point, and the manifest carries the source checkpoint —
so table state and checkpoint commit atomically together; a re-run after a
crash re-reads the same source files and the idempotent merge (see
operators.merge) converges to the same state.

Scale design:

- **COW partitioned upsert rewrites only touched partitions.** The batch's
  distinct partition values are collected (a few values, not data), the
  current state is pruned to those partitions before the merge shuffle, and
  unchanged partitions are carried forward by manifest reference — zero
  data movement. This mirrors Hudi's partition-scoped (non-global) index:
  a record key is resolved within its partition path.
- **MOR** (``hoodie.compact.inline`` for MERGE_ON_READ tables,
  ``handler.py:112-113``): writes append a precombined delta dir (cheap,
  no table-size-dependent work) and reads merge base ∪ deltas on the fly;
  inline compaction folds deltas back into base snapshots.
- Version GC (D13, ``cleaner.commits.retained=5`` ``handler.py:90-91``) and
  timeline archival (D14, keep 10..15 ``handler.py:92-93``) bound storage
  and metadata growth.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_dms_to_hudi_spark.config import MERGE_ON_READ, TableConfig
from aws_dms_to_hudi_spark.operators.merge import precombine, upsert_merge
from aws_dms_to_hudi_spark.operators.schema_evolution import reconcile

COMMITS_DIR = "_commits"
ARCHIVE_FILE = "_archived.json"


@dataclass
class Commit:
    version: int
    operation: str
    data: dict[str, str]  # partition rel-path ("" for unpartitioned) -> data dir
    deltas: list[str] = field(default_factory=list)
    checkpoint: dict[str, Any] = field(default_factory=dict)
    parent: int | None = None
    # Dirs holding the rows this commit logically changed (the precombined
    # batch incl. tombstones) — the Hudi CDC/incremental-query analog.
    # Empty for table services (compaction/clustering), which change no rows.
    changelog: list[str] = field(default_factory=list)
    # Key-range file groups only: the frozen range cut points of the first
    # record-key column (len = groups-1) — the manifest's column-stats
    # analog that key-range pruning reads. Carried forward verbatim by
    # every later commit (assignment must stay stable across upserts).
    key_bounds: list[Any] | None = None

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "operation": self.operation,
                "data": self.data,
                "deltas": self.deltas,
                "checkpoint": self.checkpoint,
                "parent": self.parent,
                "changelog": self.changelog,
                "key_bounds": self.key_bounds,
            },
            indent=1,
        )

    @classmethod
    def from_json(cls, text: str) -> "Commit":
        d = json.loads(text)
        return cls(
            version=d["version"],
            operation=d["operation"],
            data=d["data"],
            deltas=d.get("deltas", []),
            checkpoint=d.get("checkpoint", {}),
            parent=d.get("parent"),
            changelog=d.get("changelog", []),
            key_bounds=d.get("key_bounds"),
        )


BUCKET_COL = "__bucket"
RANGE_COL = "__krange"


class CuratedTable:
    """One keyed, versioned table in the curated lake."""

    def __init__(self, spark: SparkSession, root: str | Path, config: TableConfig):
        self.spark = spark
        self.root = Path(root)
        self.config = config
        (self.root / COMMITS_DIR).mkdir(parents=True, exist_ok=True)

    # ---------- physical layout ----------

    @property
    def _pcol(self) -> str | None:
        """Effective partition column for the on-disk layout: the user's
        partition column, or the synthetic bucket column when the table
        uses a bucket index (Hudi bucket-index analog: hash the record
        key into N stable buckets so upserts rewrite only the buckets a
        batch touches, not the whole table)."""
        cfg = self.config
        if cfg.is_partitioned:
            return cfg.partition_path
        if cfg.num_buckets:
            return BUCKET_COL
        if cfg.key_range_groups:
            return RANGE_COL
        return None

    def _bucketize(self, df: DataFrame) -> DataFrame:
        """Attach the deterministic bucket id: pmod(xxhash64(keys), N).
        A key's bucket never changes, so existing rows (bucket read back
        from the dir name) and incoming rows (computed here) agree."""
        cfg = self.config
        if cfg.key_range_groups:
            if RANGE_COL in df.columns:
                return df
            return df.withColumn(
                RANGE_COL, self._range_group_expr(self._key_bounds(df))
            )
        if not cfg.num_buckets or BUCKET_COL in df.columns:
            return df
        return df.withColumn(
            BUCKET_COL,
            F.pmod(F.xxhash64(*cfg.record_key), F.lit(cfg.num_buckets)).cast(
                "int"
            ),
        )

    def _key_bounds(self, df: DataFrame) -> list:
        """Range-group cut points: from the manifest once frozen, else
        (first bulk insert) an equi-depth percentile sketch of the first
        record-key column over the incoming batch."""
        prev = self.latest_commit()
        if prev is not None and prev.key_bounds is not None:
            return prev.key_bounds
        g = int(self.config.key_range_groups)
        kcol = self.config.record_key[0]
        qs = [i / g for i in range(1, g)]
        row = df.select(
            F.percentile_approx(F.col(kcol), qs, 1_000).alias("c")
        ).first()
        cuts = sorted({c for c in (row["c"] or []) if c is not None})
        self._computed_bounds = cuts
        return cuts

    def _range_group_expr(self, cuts: list):
        """#{cut : key > cut} — monotone; equal keys share a group, so a
        batch key always lands in the group holding its existing row."""
        kcol = F.col(self.config.record_key[0])
        if not cuts:
            return F.lit(0)
        arr = F.array(*[F.lit(c) for c in cuts])
        n_below = F.aggregate(
            arr,
            F.lit(0),
            lambda acc, c: acc + F.when(kcol > c, F.lit(1)).otherwise(F.lit(0)),
        )
        return F.when(kcol.isNull(), F.lit(0)).otherwise(n_below)

    def _commit_key_bounds(self) -> list | None:
        """key_bounds for a NEW commit: frozen manifest value, else the
        cuts computed by this very write (bulk insert)."""
        if not self.config.key_range_groups:
            return None
        prev = self.latest_commit()
        if prev is not None and prev.key_bounds is not None:
            return prev.key_bounds
        return getattr(self, "_computed_bounds", None)

    # ---------- timeline ----------

    def commits(self) -> list[Commit]:
        cdir = self.root / COMMITS_DIR
        out = []
        for p in sorted(cdir.glob("[0-9]*.json")):
            out.append(Commit.from_json(p.read_text()))
        return out

    def timeline_stats(self) -> DataFrame:
        """Commit-timeline introspection (the Hudi timeline / commits-
        metadata-table analog): one row per DATA commit in version
        order — (commit_seq, operation, n_changed) with n_changed =
        rows of the commit's precombined changelog (tombstones
        included). Table services (compaction / clustering / clean)
        change no rows and carry no changelog, so they are excluded —
        the audit invariant is that every data commit's change count
        equals its source batch's precombined size regardless of any
        layout rewrites in between. The loop is bounded by the
        retained timeline length (a handful of manifests), same class
        as the other bounded driver-side reads."""
        rows = []
        seq = 0
        for c in sorted(self.commits(), key=lambda c: c.version):
            if not c.changelog:
                continue
            df = self._read_dirs(c.changelog)
            n = 0 if df is None else df.count()
            rows.append((seq, c.operation, int(n)))
            seq += 1
        return self.spark.createDataFrame(
            rows, "commit_seq long, operation string, n_changed long"
        )

    def latest_commit(self) -> Commit | None:
        commits = self.commits()
        return commits[-1] if commits else None

    def checkpoint(self) -> dict[str, Any]:
        c = self.latest_commit()
        return c.checkpoint if c else {}

    def _write_commit(self, commit: Commit) -> None:
        """Atomic commit point: temp file + rename within _commits/."""
        cdir = self.root / COMMITS_DIR
        fd, tmp = tempfile.mkstemp(dir=cdir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            f.write(commit.to_json())
        os.replace(tmp, cdir / f"{commit.version:08d}.json")

    # ---------- read path ----------

    def read(
        self, version: int | None = None, read_optimized: bool = False
    ) -> DataFrame | None:
        """Current (or historical) state as a DataFrame.

        COW: union of the manifest's partition dirs. MOR: base ∪ deltas with
        merge-on-read precombine so readers always see merged state
        (Hudi's SNAPSHOT query type). ``read_optimized=True`` is Hudi's
        READ-OPTIMIZED query type: base files only, skipping the delta
        merge — stale by up to the un-compacted delta window, but a pure
        columnar scan with no merge cost (what latency-sensitive BI
        readers point at between compactions). On COW tables the two
        modes are identical, as in Hudi.
        """
        commit = self._commit_at(version)
        if commit is None:
            return None
        base = self._read_dirs(list(commit.data.values()))
        if commit.deltas and not read_optimized:
            deltas = self._read_dirs(commit.deltas)
            base = upsert_merge(
                base,
                deltas,
                self.config.record_key,
                self.config.source_ordering_field,
            )
        if base is not None and (
            self.config.num_buckets or self.config.key_range_groups
        ):
            base = base.drop(BUCKET_COL, RANGE_COL)  # internal layout detail
        return base

    def read_incremental(
        self,
        begin_version: int | None = None,
        end_version: int | None = None,
        drop_deleted: bool = True,
    ) -> DataFrame | None:
        """Hudi incremental-query analog: the latest version of every key
        changed by commits in ``(begin_version, end_version]``.

        Steady-state consumers poll with ``begin_version = last seen`` and
        get only the changed keys — reading changelog dirs sized to the
        batches, never the table. ``drop_deleted=False`` exposes tombstones
        (``_hoodie_is_deleted``) so downstream sinks can propagate deletes
        (CDC-read mode). Bounded by the retained timeline: positions older
        than ``cleaner.commits.retained`` require a full refresh, exactly
        as in Hudi.
        """
        dirs: list[str] = []
        for c in self.commits():
            if begin_version is not None and c.version <= begin_version:
                continue
            if end_version is not None and c.version > end_version:
                continue
            dirs.extend(c.changelog)
        df = self._read_dirs(dirs)
        if df is None:
            return None
        df = precombine(
            df, self.config.record_key, self.config.source_ordering_field
        )
        if drop_deleted:
            from aws_dms_to_hudi_spark.operators.merge import apply_deletes

            df = apply_deletes(df)
        if BUCKET_COL in df.columns or RANGE_COL in df.columns:
            df = df.drop(BUCKET_COL, RANGE_COL)
        return df

    def _commit_at(self, version: int | None) -> Commit | None:
        commits = self.commits()
        if not commits:
            return None
        if version is None:
            return commits[-1]
        for c in commits:
            if c.version == version:
                return c
        raise ValueError(f"version {version} not on timeline (cleaned?)")

    def _read_dirs(self, rel_dirs: list[str]) -> DataFrame | None:
        if not rel_dirs:
            return None
        paths = [str(self.root / d) for d in rel_dirs]
        reader = self.spark.read
        if self._pcol is not None:
            # basePath keeps hive-style partition columns when reading
            # individual partition dirs.
            reader = reader.option("basePath", str(self.root / _version_of(rel_dirs[0])))
            # Partition dirs from different versions need per-version reads.
            by_version: dict[str, list[str]] = {}
            for d in rel_dirs:
                by_version.setdefault(_version_of(d), []).append(str(self.root / d))
            dfs = []
            for ver, ps in by_version.items():
                dfs.append(
                    self.spark.read.option("basePath", str(self.root / ver)).parquet(*ps)
                )
            # Carried-forward partition dirs may predate a schema
            # evolution — widen/NULL-fill them onto the common schema
            # (identity when nothing evolved).
            dfs = reconcile(dfs)
            df = dfs[0]
            for other in dfs[1:]:
                df = df.unionByName(other, allowMissingColumns=True)
            return df
        if len(paths) > 1:
            # MOR delta dirs / changelog dirs span commits, so they can
            # span a schema evolution; a single multi-path scan would
            # silently impose the first footer's schema. Keep the
            # one-scan plan when schemas agree, else per-dir scans
            # reconciled onto the evolved schema (dir count is bounded
            # by the compaction interval).
            dfs = [self.spark.read.parquet(p) for p in paths]
            if any(d.schema != dfs[0].schema for d in dfs[1:]):
                dfs = reconcile(dfs)
                df = dfs[0]
                for other in dfs[1:]:
                    df = df.unionByName(other)
                return df
        return reader.parquet(*paths)

    # ---------- write path ----------


    def _partition_sorted(self, df: DataFrame, pcol: str,
                          sort_cols: list[str]) -> DataFrame:
        """PARTITION_SORT layout with write parallelism decoupled from
        the partition-value count. ``repartition(pcol)`` alone caps the
        write at one task per distinct partition value — a 3-partition
        table writes 100 TB with 3 tasks. Range-repartitioning on
        (pcol, sort keys) keeps every output file inside one partition
        AND internally sorted (each task holds a contiguous slice of
        the global (pcol, key) order) while using full cluster width;
        as a bonus the per-file key ranges are disjoint, which is
        exactly what column-stats / key-range pruning wants."""
        n = max(self.spark.sparkContext.defaultParallelism, 1)
        cols = [F.col(pcol)] + [F.col(c) for c in sort_cols]
        return df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)

    def bulk_insert(
        self, df: DataFrame, checkpoint: dict[str, Any] | None = None
    ) -> Commit:
        """Initial load (D7): partition-sorted bulk write.

        ``PARTITION_SORT`` (``handler.py:87``): rows are clustered by
        partition then sorted by record key within each output file —
        repartition on the partition column + sortWithinPartitions(keys)
        gives exactly that layout with one shuffle.
        """
        version = self._next_version()
        vdir = f"v{version:08d}"
        cfg = self.config
        df = precombine(df, cfg.record_key, cfg.source_ordering_field)
        from aws_dms_to_hudi_spark.operators.merge import apply_deletes

        df = apply_deletes(df)
        pcol = self._pcol
        if pcol is not None:
            out = self._partition_sorted(
                self._bucketize(df), pcol, list(cfg.record_key)
            )
            out.write.mode("overwrite").partitionBy(pcol).parquet(
                str(self.root / vdir)
            )
            data = self._scan_partition_dirs(vdir)
        else:
            out = df.sortWithinPartitions(*cfg.record_key)
            out.write.mode("overwrite").parquet(str(self.root / vdir))
            data = {"": vdir}
        commit = Commit(
            version=version,
            operation="bulk_insert",
            data=data,
            checkpoint=checkpoint or {},
            parent=None,
            # the initial load IS its own change set; reference the data
            # dirs rather than writing the batch twice
            changelog=list(data.values()),
            key_bounds=self._commit_key_bounds(),
        )
        self._write_commit(commit)
        return commit

    def upsert(
        self, batch: DataFrame, checkpoint: dict[str, Any] | None = None
    ) -> Commit:
        """Merge one CDC batch (D4+D5+D6) into a new table version.

        COW: partition-pruned rewrite (only partitions present in the batch
        shuffle/rewrite; the rest carry forward by reference).
        MOR: append a precombined delta dir; merge happens at read/compact.
        """
        cfg = self.config
        prev = self.latest_commit()
        if prev is None:
            return self.bulk_insert(batch, checkpoint)
        version = self._next_version()

        if cfg.table_type == MERGE_ON_READ:
            return self._append_delta(batch, version, prev, checkpoint)

        vdir = f"v{version:08d}"
        # Materialize the precombined change set first (Hudi CDC analog):
        # it feeds incremental reads, and reading it back for the merge
        # truncates the batch's lineage so the merge plan stays small.
        cldir = f"{vdir}_changelog"
        precombine(batch, cfg.record_key, cfg.source_ordering_field).write.mode(
            "overwrite"
        ).parquet(str(self.root / cldir))
        batch = self.spark.read.parquet(str(self.root / cldir))
        pcol = self._pcol
        if pcol is not None:
            # Prune both sides to the touched partitions/buckets: collect
            # the batch's distinct partition values (small driver-side list
            # of VALUES, not rows) and rewrite only those dirs — the rest
            # carry forward by reference in the new commit manifest.
            batch = self._bucketize(batch)
            touched = [
                r[0]
                for r in batch.select(pcol).distinct().collect()
            ]
            prev_dirs = dict(prev.data)
            touched_rels = [
                prev_dirs[k]
                for k in (_pdir(pcol, v) for v in touched)
                if k in prev_dirs
            ]
            existing = self._read_dirs(touched_rels) if touched_rels else None
            merged = upsert_merge(
                existing, batch, cfg.record_key, cfg.source_ordering_field
            )
            (
                self._partition_sorted(merged, pcol, list(cfg.record_key))
                .write.mode("overwrite")
                .partitionBy(pcol)
                .parquet(str(self.root / vdir))
            )
            new_data = dict(prev_dirs)
            # Drop carried-forward entries for touched partitions (a
            # partition whose every key was deleted must disappear).
            for v in touched:
                new_data.pop(_pdir(pcol, v), None)
            new_data.update(self._scan_partition_dirs(vdir))
        else:
            existing = self._read_dirs(list(prev.data.values()))
            merged = upsert_merge(
                existing, batch, cfg.record_key, cfg.source_ordering_field
            )
            merged.sortWithinPartitions(*cfg.record_key).write.mode(
                "overwrite"
            ).parquet(str(self.root / vdir))
            new_data = {"": vdir}

        commit = Commit(
            version=version,
            operation="upsert",
            data=new_data,
            checkpoint=checkpoint or {},
            parent=prev.version,
            changelog=[cldir],
            key_bounds=self._commit_key_bounds(),
        )
        self._write_commit(commit)
        return commit

    def delete_where(
        self, predicate: str, checkpoint: dict[str, Any] | None = None
    ) -> Commit:
        """Predicate delete (Hudi ``DELETE FROM`` / GDPR-retention
        analog): synthesize a tombstone batch from the current
        snapshot's rows matching ``predicate`` and run it through the
        regular upsert path — versioning, per-commit changelog
        (downstream IVM sees real retractions), partition/bucket
        pruning, and MOR deltas all apply exactly as for any CDC batch.

        No ordering bump is needed: :func:`~.operators.merge.
        upsert_merge` breaks ordering ties in favor of the INCOMING
        row, so a tombstone carrying the row's existing ordering value
        wins deterministically.

        Scale: the doomed set comes from one predicate-pruned snapshot
        scan (filters push down to parquet); the rewrite then touches
        only the partitions/buckets containing matches — retention
        sweeps over a date-partitioned table rewrite the expiring
        partitions, nothing else."""
        from aws_dms_to_hudi_spark.operators.merge import DELETED_COL

        cur = self.read()
        if cur is None:
            raise ValueError(f"{self.config.name}: nothing to delete from")
        doomed = cur.filter(predicate)
        return self.upsert(
            doomed.withColumn(DELETED_COL, F.lit(True)), checkpoint
        )

    def insert_overwrite(
        self, batch: DataFrame, checkpoint: dict[str, Any] | None = None
    ) -> Commit:
        """Hudi ``insert_overwrite`` (replacecommit analog): REPLACE the
        partitions present in ``batch`` with exactly the batch's rows —
        stored rows in touched partitions disappear even if the batch
        doesn't carry their keys (the backfill/restatement operation;
        ``upsert`` can only add or win). Untouched partitions carry
        forward by reference. On a non-partitioned/bucketed table this
        degrades to ``insert_overwrite_table`` (full replacement), as
        in Hudi.

        The engine pipeline whitelist deliberately does NOT expose this
        (the reference's config compiler raises "not yet supported" for
        any op beyond bulk_insert/delta — ``handler.py`` parity, pinned
        by ``test_engine_e2e``); it is a storage-level capability, like
        Hudi's own write operations beyond what a given deltastreamer
        deployment uses.

        MOR: table-wide delta dirs cannot be partially invalidated, so
        the table compacts first (folding deltas into the base) and the
        overwrite lands on the compacted snapshot — same visible state,
        cost = one compaction brought forward."""
        prev = self.latest_commit()
        if prev is None:
            return self.bulk_insert(batch, checkpoint)
        if prev.deltas:
            prev = self.compact() or prev
        version = self._next_version()
        vdir = f"v{version:08d}"
        cfg = self.config
        batch = precombine(batch, cfg.record_key, cfg.source_ordering_field)
        from aws_dms_to_hudi_spark.operators.merge import apply_deletes

        pcol = self._pcol
        if pcol is not None:
            batch = self._bucketize(batch)
            # touched = partitions the batch DECLARES — computed BEFORE
            # delete application, so a partition arriving as pure
            # tombstones still replaces (to empty) instead of silently
            # carrying the old rows forward (mirrors the upsert rule)
            touched = [
                r[0] for r in batch.select(pcol).distinct().collect()
            ]
            batch = apply_deletes(batch)
            out = self._partition_sorted(batch, pcol, list(cfg.record_key))
            out.write.mode("overwrite").partitionBy(pcol).parquet(
                str(self.root / vdir)
            )
            fresh = self._scan_partition_dirs(vdir)
            # an all-tombstone batch survives as zero rows: the scan's
            # empty-dir sentinel must not enter the manifest
            fresh = {k: v for k, v in fresh.items() if k}
            new_data = dict(prev.data)
            for v in touched:
                new_data.pop(_pdir(pcol, v), None)
            # replaced partitions take the new dirs; carried ones stay
            new_data.update(fresh)
        else:
            batch = apply_deletes(batch)
            batch.sortWithinPartitions(*cfg.record_key).write.mode(
                "overwrite"
            ).parquet(str(self.root / vdir))
            fresh = {"": vdir}
            new_data = fresh
        commit = Commit(
            version=version,
            operation="insert_overwrite",
            data=new_data,
            checkpoint=checkpoint or {},
            parent=prev.version,
            changelog=list(fresh.values()),
            key_bounds=self._commit_key_bounds(),
        )
        self._write_commit(commit)
        return commit

    def patch_upsert(
        self, batch: DataFrame, checkpoint: dict[str, Any] | None = None
    ) -> Commit:
        """Partial-update upsert (Hudi's partial-payload analog, e.g.
        ``OverwriteNonDefaultsWithLatestAvroPayload``): ``batch`` rows
        carry the record key, the envelope, and ONLY the columns they
        set (everything else NULL). Unset columns keep their stored
        value; stacked same-key patches within a batch apply in
        ordering-field order per column; a patch to an absent key
        inserts its payload as-is.

        Shape: resolve patches to full rows via ONE equi-join of the
        (batch-sized) patch set against the current state, then
        delegate to the ordinary :meth:`upsert` — versioning,
        changelogs, partition/bucket pruning, schema evolution and MOR
        deltas all apply unchanged. The resolve join reads the full
        snapshot here; key-range/bucket configs prune it at plan time
        via the parquet scan's key filters, and a 100 TB deployment
        would pre-filter the stored side to the batch's key ranges the
        same way upsert does."""
        from aws_dms_to_hudi_spark.operators.merge import apply_patches

        full = apply_patches(
            self.read(),
            batch,
            list(self.config.record_key),
            self.config.source_ordering_field,
        )
        return self.upsert(full, checkpoint)

    def _append_delta(
        self,
        batch: DataFrame,
        version: int,
        prev: Commit,
        checkpoint: dict[str, Any] | None,
    ) -> Commit:
        """MOR write path (D12 counterpart): cheap append of a delta log."""
        cfg = self.config
        ddir = f"v{version:08d}_delta"
        deduped = precombine(batch, cfg.record_key, cfg.source_ordering_field)
        deduped.write.mode("overwrite").parquet(str(self.root / ddir))
        commit = Commit(
            version=version,
            operation="delta_commit",
            data=dict(prev.data),
            deltas=[*prev.deltas, ddir],
            checkpoint=checkpoint or {},
            parent=prev.version,
            # the delta log is already the precombined change set; reuse it
            changelog=[ddir],
            key_bounds=self._commit_key_bounds(),
        )
        self._write_commit(commit)
        return commit

    # ---------- table services ----------

    def compact(self) -> Commit | None:
        """MOR inline compaction (D12): fold deltas into a new base snapshot."""
        prev = self.latest_commit()
        if prev is None or not prev.deltas:
            return None
        merged = self.read()  # drops any bucket col; recomputed on write
        version = self._next_version()
        vdir = f"v{version:08d}"
        cfg = self.config
        pcol = self._pcol
        if pcol is not None:
            (
                self._partition_sorted(
                    self._bucketize(merged), pcol, list(cfg.record_key)
                )
                .write.mode("overwrite")
                .partitionBy(pcol)
                .parquet(str(self.root / vdir))
            )
            data = self._scan_partition_dirs(vdir)
        else:
            merged.sortWithinPartitions(*cfg.record_key).write.mode(
                "overwrite"
            ).parquet(str(self.root / vdir))
            data = {"": vdir}
        commit = Commit(
            version=version,
            operation="compaction",
            data=data,
            deltas=[],
            checkpoint=prev.checkpoint,
            parent=prev.version,
            key_bounds=self._commit_key_bounds(),
        )
        self._write_commit(commit)
        return commit

    def clean(self, retained_commits: int = 5) -> list[str]:
        """Version GC (D13, ``cleaner.commits.retained=5`` handler.py:90-91).

        Deletes data dirs referenced ONLY by commits older than the newest
        ``retained_commits``. Manifests stay (archival trims them).
        """
        commits = self.commits()
        if len(commits) <= retained_commits:
            return []
        live, old = commits[-retained_commits:], commits[:-retained_commits]
        live_dirs: set[str] = set()
        for c in live:
            live_dirs.update(_version_of(d) for d in c.data.values())
            live_dirs.update(_version_of(d) for d in c.deltas)
            live_dirs.update(_version_of(d) for d in c.changelog)
        removed = []
        for c in old:
            for d in [*c.data.values(), *c.deltas, *c.changelog]:
                ver = _version_of(d)
                target = self.root / ver
                if ver not in live_dirs and target.exists():
                    shutil.rmtree(target)
                    removed.append(ver)
        return removed

    def archive(self, keep_min: int = 10, keep_max: int = 15) -> int:
        """Timeline trim (D14, ``keep.min/max.commits`` handler.py:92-93).

        When the active timeline exceeds ``keep_max`` commits, move the
        oldest entries into ``_archived.json`` until ``keep_min`` remain.
        """
        cdir = self.root / COMMITS_DIR
        files = sorted(cdir.glob("[0-9]*.json"))
        if len(files) <= keep_max:
            return 0
        to_archive = files[: len(files) - keep_min]
        apath = cdir / ARCHIVE_FILE
        archived = json.loads(apath.read_text()) if apath.exists() else []
        for p in to_archive:
            archived.append(json.loads(p.read_text()))
            p.unlink()
        apath.write_text(json.dumps(archived))
        return len(to_archive)

    def cluster(
        self,
        target_partitions: int | None = None,
        zorder_by: list[str] | None = None,
    ) -> Commit | None:
        """Clustering rewrite (D15, ``clustering.inline`` handler.py:73,81).

        Rewrites the current snapshot coalesced + key-sorted to fix small
        files from frequent delta commits. At 100 TB this is the service
        that keeps scan parallelism aligned with file sizes.

        ``zorder_by`` orders files by an interleaved-bit (Morton) key
        over the named columns instead of the record key — the
        Delta/Hudi Z-ORDER analog. A range predicate on ANY z-ordered
        column then touches O(files^(1/d)) of the files (min/max file
        stats prune the rest), where linear sort helps only its leading
        column. Bucketization is equal-width over the observed min/max
        (one tiny agg job); all per-row math is JVM bit ops.
        """
        prev = self.latest_commit()
        if prev is None:
            return None
        df = self.read()  # drops any bucket col; recomputed on write
        version = self._next_version()
        vdir = f"v{version:08d}"
        cfg = self.config
        pcol = self._pcol
        zcol = "__zorder"
        if zorder_by:
            df = df.withColumn(zcol, self._zorder_key(df, zorder_by))
            sort_cols = [zcol]
        else:
            sort_cols = list(cfg.record_key)
        if pcol is not None:
            out = self._partition_sorted(
                self._bucketize(df), pcol, list(sort_cols)
            )
            if zorder_by:
                out = out.drop(zcol)
            out.write.mode("overwrite").partitionBy(pcol).parquet(
                str(self.root / vdir)
            )
            data = self._scan_partition_dirs(vdir)
        else:
            n = target_partitions or max(
                1, self.spark.sparkContext.defaultParallelism // 4
            )
            out = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(
                *sort_cols
            )
            if zorder_by:
                out = out.drop(zcol)
            out.write.mode("overwrite").parquet(str(self.root / vdir))
            data = {"": vdir}
        commit = Commit(
            version=version,
            operation="clustering",
            data=data,
            deltas=list(prev.deltas),
            checkpoint=prev.checkpoint,
            parent=prev.version,
            key_bounds=self._commit_key_bounds(),
        )
        self._write_commit(commit)
        return commit

    def restore(self, version: int) -> Commit:
        """Rollback/restore (Hudi ``savepoint``+``restore`` analog): make
        an earlier commit's state current again.

        Implemented as a NEW commit whose manifest points at the old
        commit's data dirs — nothing is rewritten or deleted, the timeline
        stays append-only (an operator can restore a bad restore), and
        versions newer than the target remain readable until cleaned.
        The checkpoint is rolled back with the data so the next
        incremental run re-consumes the undone source files. As in Hudi,
        a restore does not emit a changelog — downstream incremental
        consumers positioned past the target must full-refresh.
        """
        target = self._commit_at(version)
        if target is None:
            raise ValueError(f"version {version} not on timeline")
        prev = self.latest_commit()
        commit = Commit(
            version=self._next_version(),
            operation="restore",
            data=dict(target.data),
            deltas=list(target.deltas),
            checkpoint=dict(target.checkpoint),
            parent=prev.version if prev else None,
            changelog=[],
            key_bounds=self._commit_key_bounds(),
        )
        self._write_commit(commit)
        return commit

    # ---------- helpers ----------

    _ZORDER_BITS = 8  # 256 buckets per dimension

    def _zorder_key(self, df: DataFrame, cols: list[str]):
        """Interleaved-bit (Morton) key over numeric columns.

        Each column is scaled into ``2^_ZORDER_BITS`` equal-width buckets
        between its observed min and max (one small agg job, the only
        non-per-row work), then bucket bits are interleaved so files
        cover hyper-rectangles of the value space. Equal-width (not
        quantile) keeps the mapping a pure expression; heavy skew makes
        buckets uneven but never incorrect — parquet min/max stats still
        prune, just less sharply.
        """
        bits = self._ZORDER_BITS
        nb = 1 << bits
        # Non-numeric dimensions get a numeric surrogate first:
        # timestamps/dates -> epoch seconds (order-preserving), anything
        # else -> a 64-bit hash (no order, but files still cover value
        # clusters, which is what the stat pruning needs).
        dtypes = dict(df.dtypes)
        nums: dict[str, "Column"] = {}
        for c in cols:
            t = dtypes[c]
            if t in ("timestamp", "timestamp_ntz", "date"):
                nums[c] = F.unix_timestamp(F.col(c)).cast("double")
            elif t in ("string", "binary", "boolean"):
                nums[c] = F.xxhash64(F.col(c)).cast("double")
            else:
                nums[c] = F.col(c).cast("double")
        stats = df.agg(
            *[F.min(nums[c]).alias(f"mn_{c}") for c in cols],
            *[F.max(nums[c]).alias(f"mx_{c}") for c in cols],
        ).collect()[0]
        key = F.lit(0).cast("long")
        for i, c in enumerate(cols):
            mn = float(stats[f"mn_{c}"])
            mx = float(stats[f"mx_{c}"])
            span = (mx - mn) or 1.0
            bucket = F.least(
                F.lit(nb - 1),
                F.floor((nums[c] - F.lit(mn)) / span * nb),
            ).cast("long")
            for b in range(bits):
                key = key + F.shiftleft(
                    F.shiftright(bucket, b).bitwiseAND(1), b * len(cols) + i
                )
        return key

    def _next_version(self) -> int:
        c = self.latest_commit()
        return (c.version + 1) if c else 1

    def _scan_partition_dirs(self, vdir: str) -> dict[str, str]:
        """Map hive-style partition dirs written under a version dir."""
        base = self.root / vdir
        out = {}
        for child in sorted(base.iterdir()):
            if child.is_dir() and "=" in child.name:
                out[child.name] = f"{vdir}/{child.name}"
        if not out:
            out[""] = vdir
        return out


def _version_of(rel_dir: str) -> str:
    """'v00000002/l_returnflag=A' -> 'v00000002'."""
    return rel_dir.split("/", 1)[0]


def _pdir(pcol: str, value: Any) -> str:
    """Hive-style partition dir name for a value (Spark's default escaping
    is not replicated here; engine restricts partition columns to simple
    string/number values, which covers the reference's usage)."""
    return f"{pcol}={value}"
