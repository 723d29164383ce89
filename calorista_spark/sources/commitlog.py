"""Minimal commit-log table format: atomic MERGE + time travel on
plain parquet (r9 — VERDICT r8 #2, closing SURVEY §1.4's "replace the
reference's non-atomic read-modify-write" in-sandbox).

The reference's store (main.py:137-161) — and this engine's own
``merge_into_store`` parquet fallback — both have a torn-write window:
the path being read is the path being overwritten, so a crash
mid-write can leave a reader with half a table. The fix is the one
every table format (Delta, Iceberg, Hudi) converges on:

- **Data files are immutable.** Every commit writes its parquet to a
  fresh ``data/<token>/`` directory; nothing a reader could be
  scanning is ever modified or deleted by a writer.
- **The manifest is the table.** ``_commits/v{N}.json`` lists the
  exact files of snapshot N (plus the schema, so empty snapshots
  round-trip). Readers resolve the newest manifest — or any older
  one: ``read(version=N)`` is time travel for free.
- **Publication is one atomic filesystem op.** The manifest is
  written to a temp name, fsync'd, then ``os.link``'d to its final
  version name. link(2) fails with EEXIST if the version was already
  taken — that IS the optimistic-concurrency check: two writers
  racing to commit version N+1 cannot both win, and the loser raises
  :class:`CommitConflictError` instead of silently clobbering
  (os.rename would overwrite). A crash BETWEEN data write and
  manifest link leaves an orphan data dir and a perfectly readable
  previous snapshot; :meth:`vacuum` garbage-collects orphans.
- **Exactly-once streaming MERGE by ledger, not by luck.** Each
  commit may record the foreachBatch ``batch_id``; the manifest
  carries the high-water ``last_batch_id``, so a replayed micro-batch
  (checkpoint recovery) is detected and SKIPPED — replay safety no
  longer depends on the merge happening to be idempotent.

- **Partition-scoped MERGE (r10).** A store committed with
  ``partition_by`` keeps a per-partition file map in every manifest;
  MERGE then rewrites ONLY the partitions the incoming batch touches
  and carries every untouched partition's files into the new manifest
  BY REFERENCE — zero read, zero write, byte-identical across
  versions. This is the same file-level pruning Delta/Iceberg do and
  the granularity the reference itself uses (main.py:137-161 merges
  per date key): a daily merge into a 100 TB store costs O(touched
  partitions), not O(table).
- **Change-data-feed (r10).** :meth:`read_changes` derives the typed
  row-level change feed between two versions from manifest file
  diffs: changed rows can only live in files NOT shared between the
  manifests, so partition-scoped commits make CDF planning exact and
  cheap (it reads the touched partitions only). A streaming face
  (:class:`CommitLogChangesDataSource`) replays the feed as a
  Structured Streaming source with version-based exactly-once offsets.

Scale notes: the manifest lists files, so a snapshot read plans from
the manifest (no directory listing); history depth costs one tiny
JSON per commit. Unpartitioned MERGE still rewrites the full snapshot
(the sanctioned fallback shape); pass ``partition_by`` to get
touched-partition rewrites. Concurrency control is single-winner
optimistic — the same model Delta uses, minus conflict-free retries.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from calorista_spark.operators.merge import merge_upsert, merge_upsert_cdc


class CommitConflictError(RuntimeError):
    """Another writer committed the version this writer raced for."""


def _fsync_file(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


class CommitLogStore:
    """A parquet table with an atomic commit log (see module doc)."""

    def __init__(self, path: str):
        self.path = path
        self.commits_dir = os.path.join(path, "_commits")
        self.data_dir = os.path.join(path, "data")
        os.makedirs(self.commits_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # -- manifest plumbing -------------------------------------------------

    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.commits_dir):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    out.append(int(name[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def manifest(self, version: int) -> dict:
        with open(
            os.path.join(self.commits_dir, f"v{version:08d}.json")
        ) as fh:
            return json.load(fh)

    def last_batch_id(self) -> int | None:
        v = self.latest_version()
        if v is None:
            return None
        return self.manifest(v).get("last_batch_id")

    # -- read --------------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Snapshot read; ``version`` time-travels to any retained
        commit. Planned from the manifest's file list — no directory
        listing, and concurrent writers cannot disturb it."""
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"commit-log store at {self.path} is empty")
        m = self.manifest(v)
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        if not m["files"]:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(
            *[os.path.join(self.path, f) for f in m["files"]]
        )

    # -- write -------------------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        op: str = "overwrite",
        batch_id: int | None = None,
        expect_version: int | None = ...,
        partition_by: str | None = None,
        keys: list[str] | None = None,
        carry_partitions: dict[str, list[str]] | None = None,
    ) -> int:
        """Write ``df`` as a NEW snapshot and atomically publish it.

        ``expect_version`` pins the parent this commit was derived
        from (optimistic concurrency): if another writer published
        first, :class:`CommitConflictError` raises and NOTHING of the
        table changed (the new data dir is an unreferenced orphan).
        Pass ``expect_version=None`` explicitly for blind overwrites.

        r10: ``partition_by`` lays the data out hive-style per
        partition value and records a per-partition file map in the
        manifest (enabling touched-partition MERGE and pruned CDF
        reads). The partition column STAYS in the data files — the
        layout uses a shadow ``__part`` copy — so snapshot reads plan
        exactly like unpartitioned ones, with no partition-inference
        dependency. ``carry_partitions`` (internal, used by
        :meth:`merge`) injects untouched partitions' existing files
        into the new manifest by reference. ``keys`` records the merge
        key so :meth:`read_changes` can classify rows later.
        """
        from urllib.parse import unquote

        latest = self.latest_version()
        if expect_version is not ... and expect_version != latest:
            raise CommitConflictError(
                f"expected parent v{expect_version}, found v{latest}"
            )
        token = uuid.uuid4().hex
        ddir = os.path.join(self.data_dir, token)
        partitions: dict[str, list[str]] = {}
        if partition_by is not None:
            if partition_by not in df.columns:
                raise ValueError(
                    f"partition column {partition_by!r} not in {df.columns}"
                )
            from pyspark.sql import functions as F

            staged = df.withColumn(
                "__part", F.col(partition_by).cast("string")
            )
            staged.write.mode("error").partitionBy("__part").parquet(ddir)
            for sub in sorted(os.listdir(ddir)):
                if not sub.startswith("__part="):
                    continue
                val = unquote(sub[len("__part=") :])
                if val == "__HIVE_DEFAULT_PARTITION__":
                    raise ValueError(
                        "null/empty partition values are not supported: "
                        f"column {partition_by!r} must be total"
                    )
                partitions[val] = sorted(
                    os.path.join("data", token, sub, f)
                    for f in os.listdir(os.path.join(ddir, sub))
                    if f.endswith(".parquet")
                )
            new_files = sorted(f for fl in partitions.values() for f in fl)
        else:
            df.write.mode("error").parquet(ddir)
            new_files = sorted(
                os.path.join("data", token, f)
                for f in os.listdir(ddir)
                if f.endswith(".parquet")
            )
        for f in new_files:  # durability of the immutable data files
            _fsync_file(os.path.join(self.path, f))
        files = list(new_files)
        if carry_partitions:
            if partition_by is None:
                raise ValueError("carry_partitions requires partition_by")
            for val, fl in carry_partitions.items():
                if val in partitions:
                    raise ValueError(
                        f"carried partition {val!r} collides with written data"
                    )
                partitions[val] = list(fl)
                files.extend(fl)
            files.sort()
        prev_last_batch = self.last_batch_id()
        new_version = (latest or 0) + 1
        manifest = {
            "version": new_version,
            "parent": latest,
            "op": op,
            "files": files,
            "schema": df.schema.json(),
            "batch_id": batch_id,
            "last_batch_id": (
                batch_id
                if batch_id is not None
                and (prev_last_batch is None or batch_id > prev_last_batch)
                else prev_last_batch
            ),
        }
        if partition_by is not None:
            manifest["partition_by"] = partition_by
            manifest["partitions"] = {
                v: partitions[v] for v in sorted(partitions)
            }
        if keys is not None:
            manifest["keys"] = list(keys)
        tmp = os.path.join(self.commits_dir, f".tmp-{token}")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
            fh.flush()
            os.fsync(fh.fileno())
        final = os.path.join(self.commits_dir, f"v{new_version:08d}.json")
        try:
            # link(2): atomic publish that FAILS if the version exists
            os.link(tmp, final)
        except FileExistsError as exc:
            raise CommitConflictError(
                f"version v{new_version} was committed concurrently"
            ) from exc
        finally:
            os.unlink(tmp)
        _fsync_file(self.commits_dir)
        return new_version

    def _scope_to_touched_partitions(
        self,
        spark: SparkSession,
        incoming: DataFrame,
        partition_by: str,
        manifest: dict,
    ) -> tuple[DataFrame, dict[str, list[str]]]:
        """Partition pruning for MERGE: returns (target restricted to
        the partitions the batch touches, untouched partitions' file
        map to carry by reference). The touched-value collect is
        bounded by |touched partitions| — the same driver-side size as
        Delta's partition-predicate derivation."""
        from pyspark.sql import functions as F

        if partition_by not in incoming.columns:
            raise ValueError(
                f"incoming batch lacks partition column {partition_by!r}"
            )
        touched = {
            r.p
            for r in incoming.select(
                F.col(partition_by).cast("string").alias("p")
            )
            .distinct()
            .collect()
        }
        if None in touched:
            raise ValueError(
                f"null partition values in batch column {partition_by!r}"
            )
        prev_parts: dict[str, list[str]] = manifest["partitions"]
        carry = {v: fl for v, fl in prev_parts.items() if v not in touched}
        touched_files = [
            f for v, fl in prev_parts.items() if v in touched for f in fl
        ]
        schema = T.StructType.fromJson(json.loads(manifest["schema"]))
        if touched_files:
            target = spark.read.schema(schema).parquet(
                *[os.path.join(self.path, f) for f in touched_files]
            )
        else:
            target = spark.createDataFrame([], schema)
        return target, carry

    def merge(
        self,
        spark: SparkSession,
        incoming: DataFrame,
        keys: list[str],
        batch_id: int | None = None,
        partition_by: str | None = None,
    ) -> int:
        """Transactional keyed upsert (O-D3 on the commit log): read
        the latest snapshot, merge, publish as a new version with the
        read version pinned as the expected parent. No
        localCheckpoint needed — the snapshot being read is never the
        path being written, so the fallback's read-overwrite hazard
        is structurally gone. Replayed ``batch_id``s are skipped.

        r10 partition scoping: on a store committed with
        ``partition_by`` (or when the argument is passed), only the
        partitions present in ``incoming`` are read, merged, and
        rewritten; every untouched partition's files carry into the
        new manifest BY REFERENCE — byte-identical across versions,
        zero IO. Contract (same as the reference's per-date merge,
        main.py:137-161, and Delta's partition-pruned MERGE): the
        partition column must be functionally dependent on ``keys`` —
        a key can never move between partitions, otherwise its old row
        in an untouched partition would survive alongside the new one.
        """
        latest = self.latest_version()
        if batch_id is not None:
            high = self.last_batch_id()
            if high is not None and batch_id <= high:
                return latest  # checkpoint replay — already applied
        if latest is None:
            return self.commit(
                incoming,
                op="merge",
                batch_id=batch_id,
                expect_version=None,
                partition_by=partition_by,
                keys=keys,
            )
        m = self.manifest(latest)
        pb = partition_by if partition_by is not None else m.get("partition_by")
        if pb is None or "partitions" not in m:
            # unpartitioned store (or migration commit onto one): full
            # snapshot merge; passing partition_by here lays the NEW
            # snapshot out partitioned, so the next merge prunes
            target = self.read(spark, latest)
            merged = merge_upsert(
                target, incoming.select(*target.columns), keys
            )
            return self.commit(
                merged,
                op="merge",
                batch_id=batch_id,
                expect_version=latest,
                partition_by=pb,
                keys=keys,
            )
        target, carry = self._scope_to_touched_partitions(
            spark, incoming, pb, m
        )
        merged = merge_upsert(target, incoming.select(*target.columns), keys)
        return self.commit(
            merged,
            op="merge",
            batch_id=batch_id,
            expect_version=latest,
            partition_by=pb,
            keys=keys,
            carry_partitions=carry,
        )

    def merge_cdc(
        self,
        spark: SparkSession,
        incoming: DataFrame,
        keys: list[str],
        op_col: str = "op",
        seq_col: str | None = None,
        batch_id: int | None = None,
        partition_by: str | None = None,
    ) -> int:
        """CDC apply (upserts + tombstone deletes) as one transactional
        commit; same replay ledger and parent pinning as :meth:`merge`,
        and (r10) the same touched-partition scoping — a CDC row's
        partition value is in the batch whether it upserts or deletes,
        so pruning is exact under the partition∈key contract."""
        latest = self.latest_version()
        if batch_id is not None:
            high = self.last_batch_id()
            if high is not None and batch_id <= high:
                return latest
        data_cols = [
            c for c in incoming.columns if c != op_col and c != seq_col
        ]
        carry = None
        if latest is None:
            target = incoming.select(*data_cols).limit(0)
            pb = partition_by
        else:
            m = self.manifest(latest)
            pb = (
                partition_by
                if partition_by is not None
                else m.get("partition_by")
            )
            if pb is None or "partitions" not in m:
                target = self.read(spark, latest)
            else:
                target, carry = self._scope_to_touched_partitions(
                    spark, incoming, pb, m
                )
        merged = merge_upsert_cdc(
            target,
            incoming.select(
                *data_cols, op_col, *([seq_col] if seq_col else [])
            ),
            keys,
            op_col=op_col,
            seq_col=seq_col,
        )
        return self.commit(
            merged,
            op="merge_cdc",
            batch_id=batch_id,
            expect_version=latest,
            partition_by=pb,
            keys=keys,
            carry_partitions=carry,
        )

    def overwrite_partitions(
        self,
        spark: SparkSession,
        df: DataFrame,
        partition_by: str | None = None,
    ) -> int:
        """Atomic dynamic-partition overwrite (r10): REPLACE exactly
        the partitions present in ``df``, carry every other partition
        by reference — the commit-log twin of
        ``spark.sql.sources.partitionOverwriteMode=dynamic``, minus
        the torn-write window (the swap is one manifest link). This is
        the natural sink for incremental rollup maintenance: recompute
        the touched partitions from the fact table, commit, done —
        never reads the previous snapshot at all."""
        latest = self.latest_version()
        if latest is None:
            if partition_by is None:
                raise ValueError(
                    "overwrite_partitions on an empty store needs partition_by"
                )
            return self.commit(
                df,
                op="overwrite_partitions",
                expect_version=None,
                partition_by=partition_by,
            )
        m = self.manifest(latest)
        pb = partition_by if partition_by is not None else m.get("partition_by")
        if pb is None or "partitions" not in m:
            raise ValueError(
                "overwrite_partitions requires a partitioned store "
                "(commit with partition_by first)"
            )
        from pyspark.sql import functions as F

        touched = {
            r.p
            for r in df.select(F.col(pb).cast("string").alias("p"))
            .distinct()
            .collect()
        }
        if None in touched:
            raise ValueError(f"null partition values in column {pb!r}")
        carry = {
            v: fl for v, fl in m["partitions"].items() if v not in touched
        }
        return self.commit(
            df,
            op="overwrite_partitions",
            expect_version=latest,
            partition_by=pb,
            carry_partitions=carry,
        )

    # -- change data feed (r10) ----------------------------------------------

    def _read_files(
        self, spark: SparkSession, files: list[str], schema: T.StructType
    ) -> DataFrame:
        if not files:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(
            *[os.path.join(self.path, f) for f in files]
        )

    def read_changes(
        self,
        spark: SparkSession,
        from_version: int,
        to_version: int | None = None,
        keys: list[str] | None = None,
    ) -> DataFrame:
        """Row-level change-data-feed between two versions (r10 —
        VERDICT r9 #3): every data column plus ``_change_type``
        (``insert`` | ``update_preimage`` | ``update_postimage`` |
        ``delete``) and ``_commit_version``. ``from_version`` is
        EXCLUSIVE, ``to_version`` inclusive (defaults to latest) —
        Delta CDF's convention, so ``read_changes(spark, v)`` streams
        everything after snapshot v.

        Planning is manifest-driven: a changed row can only live in a
        file NOT shared between consecutive manifests, so only the
        file-diff is read — on a partition-scoped store that is
        exactly the touched partitions. Rows rewritten byte-for-byte
        into new files (full-snapshot commits) are suppressed by a
        keyed full-outer join on the canonical row hash, so the feed
        carries true changes only. Keys come from the manifests
        (recorded by :meth:`merge`/:meth:`merge_cdc`) or the ``keys``
        argument for overwrite-only histories.
        """
        from functools import reduce

        from pyspark.sql import functions as F

        from calorista_spark.operators.merge import with_row_hash

        to_v = self.latest_version() if to_version is None else to_version
        if to_v is None or from_version > to_v:
            raise ValueError(
                f"empty version range ({from_version}, {to_version}]"
            )
        frames: list[DataFrame] = []
        for v in range(from_version + 1, to_v + 1):
            m = self.manifest(v)
            schema = T.StructType.fromJson(json.loads(m["schema"]))
            data_cols = schema.fieldNames()
            parent = m.get("parent")
            tag = [
                F.lit(v).cast("long").alias("_commit_version"),
            ]
            if parent is None:
                frames.append(
                    self._read_files(spark, m["files"], schema).select(
                        *data_cols,
                        F.lit("insert").alias("_change_type"),
                        *tag,
                    )
                )
                continue
            mp = self.manifest(parent)
            pschema = T.StructType.fromJson(json.loads(mp["schema"]))
            if [(f.name, f.dataType.simpleString()) for f in pschema.fields] != [
                (f.name, f.dataType.simpleString()) for f in schema.fields
            ]:
                raise ValueError(
                    f"schema changed at v{v}; CDF across schema changes "
                    "is not supported"
                )
            ks = keys if keys is not None else m.get("keys")
            if ks is None:
                raise ValueError(
                    f"v{v} records no merge keys; pass keys= to classify "
                    "overwrite commits"
                )
            pre_files = sorted(set(mp["files"]) - set(m["files"]))
            post_files = sorted(set(m["files"]) - set(mp["files"]))
            pre = with_row_hash(self._read_files(spark, pre_files, schema))
            post = with_row_hash(self._read_files(spark, post_files, schema))
            p = pre.select(
                *[F.col(c).alias(f"__p_{c}") for c in data_cols],
                F.col("row_hash").alias("__p_hash"),
            )
            q = post.select(
                *[F.col(c).alias(f"__q_{c}") for c in data_cols],
                F.col("row_hash").alias("__q_hash"),
            )
            cond = reduce(
                lambda a, b: a & b,
                [p[f"__p_{k}"].eqNullSafe(q[f"__q_{k}"]) for k in ks],
            )
            j = p.join(q, cond, "full_outer")
            deletes = j.filter(F.col("__q_hash").isNull()).select(
                *[F.col(f"__p_{c}").alias(c) for c in data_cols],
                F.lit("delete").alias("_change_type"),
                *tag,
            )
            inserts = j.filter(F.col("__p_hash").isNull()).select(
                *[F.col(f"__q_{c}").alias(c) for c in data_cols],
                F.lit("insert").alias("_change_type"),
                *tag,
            )
            changed = j.filter(
                F.col("__p_hash").isNotNull()
                & F.col("__q_hash").isNotNull()
                & (F.col("__p_hash") != F.col("__q_hash"))
            )
            pre_rows = changed.select(
                *[F.col(f"__p_{c}").alias(c) for c in data_cols],
                F.lit("update_preimage").alias("_change_type"),
                *tag,
            )
            post_rows = changed.select(
                *[F.col(f"__q_{c}").alias(c) for c in data_cols],
                F.lit("update_postimage").alias("_change_type"),
                *tag,
            )
            frames.append(
                deletes.unionByName(inserts)
                .unionByName(pre_rows)
                .unionByName(post_rows)
            )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out

    # -- maintenance ---------------------------------------------------------

    def vacuum(
        self,
        keep_versions: int | None = None,
        retention_seconds: float = 600.0,
    ) -> list[str]:
        """Remove orphan data dirs (crash leftovers / losers of commit
        races) and, with ``keep_versions``, expire old manifests plus
        the data only they referenced. Never touches anything the
        retained manifests list. Returns the deleted paths.

        r10 (VERDICT r9 #2 / ADVICE): unreferenced data dirs younger
        than ``retention_seconds`` (by mtime) are SKIPPED — a concurrent
        writer mid-commit (data written, manifest not yet linked) looks
        identical to a crash orphan, so immediate GC could delete files
        a racing commit then publishes a manifest for. The age gate is
        the same defense as Delta's ``deletedFileRetentionDuration``:
        pick a window longer than any plausible data-write-to-link gap.
        ``retention_seconds=0`` restores immediate GC for quiesced
        single-writer maintenance.
        """
        vs = self.versions()
        keep = vs if keep_versions is None else vs[-keep_versions:]
        referenced: set[str] = set()
        for v in keep:
            for f in self.manifest(v)["files"]:
                referenced.add(f.split(os.sep)[1])
        deleted = []
        for v in vs:
            if v not in keep:
                p = os.path.join(self.commits_dir, f"v{v:08d}.json")
                os.unlink(p)
                deleted.append(p)
        import time as _time

        now = _time.time()
        for token in os.listdir(self.data_dir):
            if token not in referenced:
                p = os.path.join(self.data_dir, token)
                try:
                    age = now - os.path.getmtime(p)
                except OSError:
                    continue  # deleted by a concurrent vacuum
                if age < retention_seconds:
                    continue  # possibly an in-flight writer's dir
                shutil.rmtree(p)
                deleted.append(p)
        return deleted


def start_commitlog_cdc_merge(
    stream: DataFrame,
    store_path: str,
    keys: list[str],
    checkpoint: str,
    op_col: str = "op",
    seq_col: str | None = None,
    trigger_available_now: bool = True,
    on_batch=None,
):
    """Streaming CDC MERGE into a commit-log store: foreachBatch calls
    :meth:`CommitLogStore.merge_cdc` with the micro-batch's
    ``batch_id``, so exactly-once across crash/restart is enforced by
    the commit ledger itself (a replayed batch is skipped by id), not
    by hoping the merge is idempotent. The streaming twin of
    streaming/incremental.start_incremental_cdc_merge with the
    torn-write window removed."""

    def _merge_batch(batch: DataFrame, batch_id: int) -> None:
        if on_batch is not None:
            on_batch(batch_id)
        CommitLogStore(store_path).merge_cdc(
            batch.sparkSession,
            batch,
            keys,
            op_col=op_col,
            seq_col=seq_col,
            batch_id=batch_id,
        )

    writer = stream.writeStream.foreachBatch(_merge_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming change-data-feed source (r10 — VERDICT r9 #3): readStream
# over a commit-log store's version history. Offsets are store
# versions, so exactly-once across checkpoint restarts is the commit
# ledger's own monotonic version counter — `readBetweenOffsets` is a
# deterministic replay of (start, end] by construction.
#
# The reader computes the per-version row diff DRIVER-side (pyarrow
# over the manifest file-diff, pure-Python keyed compare): a
# SimpleDataSourceStreamReader prefetches rows on the driver by
# design, and the per-batch volume here is the CHANGE set of the new
# versions — bounded by touched partitions on a partition-scoped
# store — not the table. The fully-distributed face of the same feed
# is CommitLogStore.read_changes (use it in foreachBatch when change
# sets are large); this source is the low-latency tail consumer.
# ---------------------------------------------------------------------------


def _changes_between_py(
    store: CommitLogStore,
    from_version: int,
    to_version: int,
    keys: list[str] | None,
) -> list[tuple]:
    """Driver-side mirror of :meth:`CommitLogStore.read_changes` —
    same classification, computed with pyarrow + plain dict compare
    (value equality, not hash parity, so the two faces cannot drift).
    Returns tuples in manifest-schema column order + (change_type,
    version), deterministically sorted by key within each version."""
    import pyarrow.parquet as pq

    out: list[tuple] = []
    for v in range(from_version + 1, to_version + 1):
        m = store.manifest(v)
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        cols = schema.fieldNames()
        parent = m.get("parent")

        def load(files: list[str]) -> list[dict]:
            rows: list[dict] = []
            for f in sorted(files):
                rows.extend(
                    pq.read_table(
                        os.path.join(store.path, f), columns=cols
                    ).to_pylist()
                )
            return rows

        if parent is None:
            ks0 = keys if keys is not None else m.get("keys")
            rows = load(m["files"])
            if ks0:
                rows.sort(key=lambda r: tuple(str(r[k]) for k in ks0))
            for r in rows:
                out.append(tuple(r[c] for c in cols) + ("insert", v))
            continue
        mp = store.manifest(parent)
        ks = keys if keys is not None else m.get("keys")
        if ks is None:
            raise ValueError(
                f"v{v} records no merge keys; pass a keys option"
            )
        pre_files = sorted(set(mp["files"]) - set(m["files"]))
        post_files = sorted(set(m["files"]) - set(mp["files"]))

        def index(rows: list[dict]) -> dict[tuple, dict]:
            ix: dict[tuple, dict] = {}
            for r in rows:
                k = tuple(r[c] for c in ks)
                if k in ix:
                    raise ValueError(
                        f"duplicate key {k} in one snapshot; the CDF "
                        "source requires keyed (merge-maintained) stores"
                    )
                ix[k] = r
            return ix

        pre = index(load(pre_files))
        post = index(load(post_files))
        for k in sorted(set(pre) | set(post), key=lambda t: tuple(map(str, t))):
            p, q = pre.get(k), post.get(k)
            if q is None:
                out.append(tuple(p[c] for c in cols) + ("delete", v))
            elif p is None:
                out.append(tuple(q[c] for c in cols) + ("insert", v))
            elif any(p[c] != q[c] for c in cols):
                out.append(
                    tuple(p[c] for c in cols) + ("update_preimage", v)
                )
                out.append(
                    tuple(q[c] for c in cols) + ("update_postimage", v)
                )
    return out


def make_commitlog_changes_datasource():
    """Build the DataSource class lazily (pyspark.sql.datasource import
    kept out of module import time — mirrors sources/python_datasource)."""
    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    class CommitLogChangesStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options: dict):
            self.path = options["path"]
            ks = [k for k in options.get("keys", "").split(",") if k]
            self.keys = ks or None
            self.start_version = int(options.get("starting_version", 0))

        def initialOffset(self) -> dict:
            return {"version": self.start_version}

        def read(self, start: dict):
            store = CommitLogStore(self.path)
            latest = store.latest_version() or 0
            end_v = max(latest, start["version"])
            rows = _changes_between_py(
                store, start["version"], end_v, self.keys
            )
            return iter(rows), {"version": end_v}

        def readBetweenOffsets(self, start: dict, end: dict):
            store = CommitLogStore(self.path)
            return iter(
                _changes_between_py(
                    store, start["version"], end["version"], self.keys
                )
            )

    class CommitLogChangesDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "commitlog_changes"

        def schema(self):
            store = CommitLogStore(self.options["path"])
            v = store.latest_version()
            if v is None:
                raise ValueError(
                    f"commit-log store at {self.options['path']} is empty"
                )
            schema = T.StructType.fromJson(
                json.loads(store.manifest(v)["schema"])
            )
            return T.StructType(
                list(schema.fields)
                + [
                    T.StructField("_change_type", T.StringType(), False),
                    T.StructField("_commit_version", T.LongType(), False),
                ]
            )

        def simpleStreamReader(self, schema):
            return CommitLogChangesStreamReader(self.options)

    return CommitLogChangesDataSource


def register_changes_source(spark: SparkSession) -> None:
    """spark.readStream.format("commitlog_changes").option("path", p)"""
    spark.dataSource.register(make_commitlog_changes_datasource())
