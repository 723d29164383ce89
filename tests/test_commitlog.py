"""Commit-log table format (sources/commitlog.py, r9): atomicity,
optimistic concurrency, time travel, replay ledger, vacuum, and the
streaming exactly-once proof."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from calorista_spark.sources.commitlog import (
    CommitConflictError,
    CommitLogStore,
    start_commitlog_cdc_merge,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_commit_read_and_time_travel(spark, tmp_path):
    store = CommitLogStore(str(tmp_path / "s"))
    assert store.latest_version() is None
    v1 = store.commit(_df(spark, [(1, "a"), (2, "b")]), expect_version=None)
    v2 = store.merge(spark, _df(spark, [(2, "B"), (3, "c")]), ["k"])
    assert (v1, v2) == (1, 2)
    assert {(r.k, r.v) for r in store.read(spark).collect()} == {
        (1, "a"),
        (2, "B"),
        (3, "c"),
    }
    # time travel: v1 still reads exactly as committed
    assert {(r.k, r.v) for r in store.read(spark, version=1).collect()} == {
        (1, "a"),
        (2, "b"),
    }


def test_crash_between_data_and_manifest_leaves_old_snapshot(spark, tmp_path):
    """The torn-write window of the overwrite fallback is gone: data
    written without a published manifest is invisible, the previous
    snapshot stays fully readable, and vacuum GCs the orphan."""
    store = CommitLogStore(str(tmp_path / "s"))
    store.commit(_df(spark, [(1, "a")]), expect_version=None)
    # simulate the crash: data lands, manifest never publishes
    _df(spark, [(9, "ghost")]).write.parquet(
        os.path.join(store.data_dir, "orphan-token")
    )
    assert store.latest_version() == 1
    assert {(r.k, r.v) for r in store.read(spark).collect()} == {(1, "a")}
    deleted = store.vacuum(retention_seconds=0)
    assert any("orphan-token" in p for p in deleted)
    assert {(r.k, r.v) for r in store.read(spark).collect()} == {(1, "a")}


def test_vacuum_retention_spares_in_flight_writer(spark, tmp_path):
    """r10: an unlinked data dir inside the retention window is an
    in-flight writer as far as vacuum can tell — it must survive; once
    older than the window it is a crash orphan and is GC'd."""
    store = CommitLogStore(str(tmp_path / "s"))
    store.commit(_df(spark, [(1, "a")]), expect_version=None)
    staged = os.path.join(store.data_dir, "inflight-token")
    _df(spark, [(9, "pending")]).write.parquet(staged)
    # inside the window: spared (default retention)
    deleted = store.vacuum()
    assert not any("inflight-token" in p for p in deleted)
    assert os.path.isdir(staged)
    # ...and the spared dir is still publishable: a commit that links a
    # manifest for it afterwards yields a readable snapshot
    # (simulate by re-checking the dir's files are intact)
    assert any(f.endswith(".parquet") for f in os.listdir(staged))
    # age it past the window: now it is an orphan and is GC'd
    old = time.time() - 3600
    os.utime(staged, (old, old))
    deleted = store.vacuum(retention_seconds=600)
    assert any("inflight-token" in p for p in deleted)
    assert not os.path.exists(staged)


def test_concurrent_writer_conflict_detected(spark, tmp_path):
    store = CommitLogStore(str(tmp_path / "s"))
    store.commit(_df(spark, [(1, "a")]), expect_version=None)
    # writer A reads v1 and prepares; writer B commits v2 first
    store.commit(_df(spark, [(1, "B")]), expect_version=1)
    with pytest.raises(CommitConflictError):
        store.commit(_df(spark, [(1, "A")]), expect_version=1)
    # the losing writer changed nothing
    assert store.latest_version() == 2
    assert {(r.k, r.v) for r in store.read(spark).collect()} == {(1, "B")}
    # the race can also lose at the link itself (version published
    # between the parent check and the link): same typed error, and
    # the already-committed v3 is untouched
    from unittest import mock

    final = os.path.join(store.commits_dir, "v00000003.json")
    with open(final, "w") as fh:
        json.dump(dict(store.manifest(2), version=3, parent=2), fh)
    with mock.patch.object(CommitLogStore, "latest_version", return_value=2):
        with pytest.raises(CommitConflictError, match="concurrently"):
            store.commit(_df(spark, [(1, "C")]), expect_version=2)
    assert store.latest_version() == 3
    assert {(r.k, r.v) for r in store.read(spark, version=3).collect()} == {
        (1, "B")
    }


def test_batch_ledger_skips_replays(spark, tmp_path):
    store = CommitLogStore(str(tmp_path / "s"))
    v1 = store.merge(spark, _df(spark, [(1, "a")]), ["k"], batch_id=0)
    v2 = store.merge(spark, _df(spark, [(2, "b")]), ["k"], batch_id=1)
    # checkpoint replay of batch 1 (and a late batch 0): no new commit
    assert store.merge(spark, _df(spark, [(2, "XX")]), ["k"], batch_id=1) == v2
    assert store.merge(spark, _df(spark, [(1, "XX")]), ["k"], batch_id=0) == v2
    assert (v1, v2) == (1, 2)
    assert {(r.k, r.v) for r in store.read(spark).collect()} == {
        (1, "a"),
        (2, "b"),
    }


def test_empty_snapshot_roundtrip(spark, tmp_path):
    store = CommitLogStore(str(tmp_path / "s"))
    store.commit(_df(spark, []), expect_version=None)
    out = store.read(spark)
    assert out.count() == 0 and out.columns == ["k", "v"]


def test_vacuum_expires_history_but_keeps_retained(spark, tmp_path):
    store = CommitLogStore(str(tmp_path / "s"))
    for i in range(4):
        store.merge(spark, _df(spark, [(i, f"v{i}")]), ["k"])
    store.vacuum(keep_versions=2)
    assert store.versions() == [3, 4]
    assert store.read(spark, version=3).count() == 3
    with pytest.raises(FileNotFoundError):
        store.manifest(1)
    assert store.read(spark).count() == 4


def _pdf(spark, rows):
    return spark.createDataFrame(rows, "d string, k long, v string")


def test_partition_scoped_merge_carries_untouched_files(spark, tmp_path):
    """r10 (VERDICT r9 #1): MERGE on a partitioned store rewrites ONLY
    the touched partitions; untouched partitions' files appear in the
    new manifest by reference — identical paths, zero IO — and the
    merged table equals the full-snapshot merge semantics."""
    store = CommitLogStore(str(tmp_path / "s"))
    base = _pdf(
        spark,
        [(f"d{i}", k, f"{i}:{k}") for i in range(5) for k in range(3)],
    )
    v1 = store.commit(
        base, expect_version=None, partition_by="d", keys=["d", "k"]
    )
    batch = _pdf(spark, [("d2", 1, "UPDATED"), ("d2", 99, "INSERTED")])
    v2 = store.merge(spark, batch, ["d", "k"])
    m1, m2 = store.manifest(v1), store.manifest(v2)
    assert m1["partition_by"] == m2["partition_by"] == "d"
    assert m2["keys"] == ["d", "k"]
    # untouched partitions: same file paths, byte-identical by identity
    for d in ("d0", "d1", "d3", "d4"):
        assert m2["partitions"][d] == m1["partitions"][d]
    # touched partition: fully new files
    assert not set(m2["partitions"]["d2"]) & set(m1["partitions"]["d2"])
    # files list is exactly the union of the partition map
    assert sorted(m2["files"]) == sorted(
        f for fl in m2["partitions"].values() for f in fl
    )
    # merged semantics + time travel
    got = {(r.d, r.k, r.v) for r in store.read(spark).collect()}
    expected = {
        (f"d{i}", k, f"{i}:{k}") for i in range(5) for k in range(3)
    } - {("d2", 1, "2:1")} | {("d2", 1, "UPDATED"), ("d2", 99, "INSERTED")}
    assert got == expected
    assert store.read(spark, version=v1).count() == 15


def test_partition_scoped_cdc_and_unpartitioned_migration(spark, tmp_path):
    """merge_cdc prunes identically (a delete's partition value is in
    the batch), and merging with partition_by onto an unpartitioned
    store migrates the layout so the NEXT merge prunes."""
    # CDC on a partitioned store
    store = CommitLogStore(str(tmp_path / "cdc"))
    base = _pdf(
        spark, [(f"d{i}", k, f"{i}:{k}") for i in range(4) for k in range(2)]
    )
    v1 = store.commit(
        base, expect_version=None, partition_by="d", keys=["d", "k"]
    )
    cdc = spark.createDataFrame(
        [("d1", 0, None, "delete"), ("d1", 5, "new", "upsert")],
        "d string, k long, v string, op string",
    )
    v2 = store.merge_cdc(spark, cdc, ["d", "k"])
    m1, m2 = store.manifest(v1), store.manifest(v2)
    for d in ("d0", "d2", "d3"):
        assert m2["partitions"][d] == m1["partitions"][d]
    got = {(r.d, r.k, r.v) for r in store.read(spark).collect()}
    assert ("d1", 0, "1:0") not in got and ("d1", 5, "new") in got
    assert len(got) == 8  # 8 base - 1 delete + 1 insert

    # migration: unpartitioned v1 → partitioned v2 → pruned v3
    mig = CommitLogStore(str(tmp_path / "mig"))
    mig.commit(base, expect_version=None)
    mig.merge(
        spark, _pdf(spark, [("d0", 9, "x")]), ["d", "k"], partition_by="d"
    )
    assert mig.manifest(2)["partition_by"] == "d"
    v3 = mig.merge(spark, _pdf(spark, [("d3", 9, "y")]), ["d", "k"])
    m2m, m3m = mig.manifest(2), mig.manifest(v3)
    for d in ("d0", "d1", "d2"):
        assert m3m["partitions"][d] == m2m["partitions"][d]
    assert mig.read(spark).count() == 10


def test_read_changes_classifies_and_suppresses_rewrites(spark, tmp_path):
    """r10 (VERDICT r9 #3): the batch CDF — inserts at v1, an update
    pre/post pair plus an insert at v2 (a re-sent identical row in the
    same touched partition is suppressed), a delete at v3; version
    ranges are (from, to]."""
    store = CommitLogStore(str(tmp_path / "s"))
    base = _pdf(
        spark, [(f"d{i}", k, f"{i}:{k}") for i in range(3) for k in range(2)]
    )
    store.commit(base, expect_version=None, partition_by="d", keys=["d", "k"])
    # v2: d1 gets one changed row, one identical re-send, one insert
    store.merge(
        spark,
        _pdf(spark, [("d1", 0, "CHANGED"), ("d1", 1, "1:1"), ("d1", 7, "NEW")]),
        ["d", "k"],
    )
    # v3: CDC delete of (d2, 0)
    store.merge_cdc(
        spark,
        spark.createDataFrame(
            [("d2", 0, None, "delete")], "d string, k long, v string, op string"
        ),
        ["d", "k"],
    )
    cdf = store.read_changes(spark, 0)
    rows = {
        (r.d, r.k, r.v, r._change_type, r._commit_version)
        for r in cdf.collect()
    }
    expected = {
        (f"d{i}", k, f"{i}:{k}", "insert", 1) for i in range(3) for k in range(2)
    } | {
        ("d1", 0, "1:0", "update_preimage", 2),
        ("d1", 0, "CHANGED", "update_postimage", 2),
        ("d1", 7, "NEW", "insert", 2),
        ("d2", 0, "2:0", "delete", 3),
    }
    assert rows == expected
    # range (1, 2]: only v2's changes; the identical re-send never shows
    mid = store.read_changes(spark, 1, 2)
    assert {(r.k, r._change_type) for r in mid.collect()} == {
        (0, "update_preimage"),
        (0, "update_postimage"),
        (7, "insert"),
    }
    # the driver-side mirror agrees exactly (same classification)
    from calorista_spark.sources.commitlog import _changes_between_py

    py_rows = {
        tuple(t) for t in _changes_between_py(store, 0, 3, None)
    }
    assert py_rows == rows


def test_streaming_cdf_resumes_from_checkpoint_mid_history(spark, tmp_path):
    """r10: the commitlog_changes streaming source — offsets are store
    versions; a second run from the same checkpoint emits ONLY the
    versions committed after the first run, and the union equals the
    batch CDF."""
    from calorista_spark.sources.commitlog import register_changes_source

    register_changes_source(spark)
    store = CommitLogStore(str(tmp_path / "s"))
    base = _pdf(
        spark, [(f"d{i}", k, f"{i}:{k}") for i in range(3) for k in range(2)]
    )
    store.commit(base, expect_version=None, partition_by="d", keys=["d", "k"])
    store.merge(spark, _pdf(spark, [("d0", 0, "V2")]), ["d", "k"])

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("commitlog_changes")
            .option("path", store.path)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    first = {
        (r.d, r.k, r.v, r._change_type, r._commit_version)
        for r in spark.read.parquet(out).collect()
    }
    assert {t[4] for t in first} == {1, 2}

    # history advances: two more commits, then resume from checkpoint
    store.merge(spark, _pdf(spark, [("d1", 9, "V3")]), ["d", "k"])
    store.merge_cdc(
        spark,
        spark.createDataFrame(
            [("d2", 1, None, "delete")], "d string, k long, v string, op string"
        ),
        ["d", "k"],
    )
    drain()
    total = {
        (r.d, r.k, r.v, r._change_type, r._commit_version)
        for r in spark.read.parquet(out).collect()
    }
    new = total - first
    assert {t[4] for t in new} == {3, 4}
    batch = {
        (r.d, r.k, r.v, r._change_type, r._commit_version)
        for r in store.read_changes(spark, 0).collect()
    }
    assert total == batch


def test_streaming_cdc_restart_exactly_once(spark, tmp_path):
    """Crash ON the tombstone batch, restart from the checkpoint: the
    commit ledger (batch_id high-water) makes the replay a no-op and
    the final table equals the uninterrupted batch fold — with the
    audit trail (one commit per applied batch) visible in history."""
    root = str(tmp_path)
    feed = [
        spark.range(0, 60).select(
            F.col("id").alias("k"),
            F.col("id").cast("string").alias("v"),
            F.lit("upsert").alias("op"),
        ),
        spark.range(0, 20).select(
            (F.col("id") * 3).alias("k"),
            F.lit(None).cast("string").alias("v"),
            F.lit("delete").alias("op"),
        ),
        spark.range(60, 80).select(
            F.col("id").alias("k"),
            F.col("id").cast("string").alias("v"),
            F.lit("upsert").alias("op"),
        ),
    ]
    src = os.path.join(root, "src")
    os.makedirs(src)
    schema = feed[0].schema
    for i, f in enumerate(feed):
        d = os.path.join(src, f"f{i}")
        f.coalesce(1).write.parquet(d)
        t = time.time() - 10 + i
        for name in os.listdir(d):
            os.utime(os.path.join(d, name), (t, t))

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )

    flag = os.path.join(root, "bomb")
    open(flag, "w").close()

    def bomb(batch_id: int) -> None:
        if batch_id == 1 and os.path.exists(flag):
            os.unlink(flag)
            raise RuntimeError("injected failure on the delete batch")

    store_path = os.path.join(root, "store")
    ckpt = os.path.join(root, "ckpt")
    q = start_commitlog_cdc_merge(
        stream(), store_path, ["k"], ckpt, on_batch=bomb
    )
    with pytest.raises(Exception):
        q.awaitTermination()
    # restart from the same checkpoint — batch 1 replays, then batch 2
    q2 = start_commitlog_cdc_merge(stream(), store_path, ["k"], ckpt)
    q2.awaitTermination()

    store = CommitLogStore(store_path)
    got = {(r.k, r.v) for r in store.read(spark).collect()}
    expected = {(k, str(k)) for k in range(80) if not (k < 60 and k % 3 == 0)}
    assert got == expected
    # ledger: batches 0..2 applied exactly once, in order
    applied = [store.manifest(v)["batch_id"] for v in store.versions()]
    assert applied == [0, 1, 2]
    assert store.last_batch_id() == 2
