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

Scale notes: the manifest lists files, so a snapshot read plans from
the manifest (no directory listing); MERGE still rewrites the full
snapshot (the sanctioned fallback shape — file-level pruning of
untouched files is the Delta/Iceberg upgrade path and orthogonal to
the commit protocol proven here); history depth costs one tiny JSON
per commit. Concurrency control is single-winner optimistic — the
same model Delta uses, minus conflict-free retries.
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
    ) -> int:
        """Write ``df`` as a NEW snapshot and atomically publish it.

        ``expect_version`` pins the parent this commit was derived
        from (optimistic concurrency): if another writer published
        first, :class:`CommitConflictError` raises and NOTHING of the
        table changed (the new data dir is an unreferenced orphan).
        Pass ``expect_version=None`` explicitly for blind overwrites.
        """
        latest = self.latest_version()
        if expect_version is not ... and expect_version != latest:
            raise CommitConflictError(
                f"expected parent v{expect_version}, found v{latest}"
            )
        token = uuid.uuid4().hex
        ddir = os.path.join(self.data_dir, token)
        df.write.mode("error").parquet(ddir)
        files = sorted(
            os.path.join("data", token, f)
            for f in os.listdir(ddir)
            if f.endswith(".parquet")
        )
        for f in files:  # durability of the immutable data files
            _fsync_file(os.path.join(self.path, f))
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

    def merge(
        self,
        spark: SparkSession,
        incoming: DataFrame,
        keys: list[str],
        batch_id: int | None = None,
    ) -> int:
        """Transactional keyed upsert (O-D3 on the commit log): read
        the latest snapshot, merge, publish as a new version with the
        read version pinned as the expected parent. No
        localCheckpoint needed — the snapshot being read is never the
        path being written, so the fallback's read-overwrite hazard
        is structurally gone. Replayed ``batch_id``s are skipped."""
        latest = self.latest_version()
        if batch_id is not None:
            high = self.last_batch_id()
            if high is not None and batch_id <= high:
                return latest  # checkpoint replay — already applied
        if latest is None:
            return self.commit(
                incoming, op="merge", batch_id=batch_id, expect_version=None
            )
        target = self.read(spark, latest)
        merged = merge_upsert(target, incoming.select(*target.columns), keys)
        return self.commit(
            merged, op="merge", batch_id=batch_id, expect_version=latest
        )

    def merge_cdc(
        self,
        spark: SparkSession,
        incoming: DataFrame,
        keys: list[str],
        op_col: str = "op",
        seq_col: str | None = None,
        batch_id: int | None = None,
    ) -> int:
        """CDC apply (upserts + tombstone deletes) as one transactional
        commit; same replay ledger and parent pinning as :meth:`merge`."""
        latest = self.latest_version()
        if batch_id is not None:
            high = self.last_batch_id()
            if high is not None and batch_id <= high:
                return latest
        data_cols = [
            c for c in incoming.columns if c != op_col and c != seq_col
        ]
        if latest is None:
            target = incoming.select(*data_cols).limit(0)
        else:
            target = self.read(spark, latest)
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
            merged, op="merge_cdc", batch_id=batch_id, expect_version=latest
        )

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
