"""RESTORE-to-version (r14): rollback as a forward commit — Delta's
``RESTORE TABLE ... VERSION AS OF`` semantics. Content (files, stats,
DVs, schema, mapping, clustering, keys) comes from the TARGET version
by reference; the replay ledger (global + per-writer txn map) comes
from the HEAD so streaming writers never double-apply rolled-back
batches; history is append-only (the undone versions stay
time-travelable until vacuum expires them)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from calorista_spark.sources.commitlog import CommitLogStore


def _store(spark, tmp_path, partitioned=True):
    store = CommitLogStore(str(tmp_path / "s"))
    df = spark.createDataFrame(
        [(f"d{i % 3}", i, i * 10) for i in range(30)],
        "d string, k long, amt long",
    )
    store.commit(
        df,
        expect_version=None,
        partition_by="d" if partitioned else None,
        keys=["d", "k"] if partitioned else ["k"],
    )
    return store


def _rows(store, spark, version=None):
    return {
        (r.d, r.k, r.amt) for r in store.read(spark, version).collect()
    }


def _mutate(store, spark):
    """v2 = keyed merge (updates d0, inserts 3 rows), v3 = DV delete."""
    base = store.read(spark, 1)
    batch = base.filter(F.col("d") == "d0").withColumn(
        "amt", F.col("amt") + 1
    )
    inserts = store.read(spark, 1).sparkSession.createDataFrame(
        [("d0", 1000 + i, -1) for i in range(3)],
        "d string, k long, amt long",
    )
    store.merge(spark, batch.unionByName(inserts), ["d", "k"])
    store.delete_where(
        spark, [("k", "in", [0, 5, 10, 15, 20, 25])]
    )
    assert store.latest_version() == 3


def test_restore_roundtrip_partitioned(spark, tmp_path):
    store = _store(spark, tmp_path)
    v1_rows = _rows(store, spark, 1)
    _mutate(store, spark)
    assert _rows(store, spark) != v1_rows
    v4 = store.restore(1)
    assert v4 == 4
    assert _rows(store, spark) == v1_rows
    # history is append-only: the undone versions still time-travel
    assert _rows(store, spark, 3) != v1_rows
    h = store.history()[0]
    assert h["op"] == "restore"
    assert store.manifest_meta(4)["restore_of"] == 1


def test_restore_carries_target_segments_by_reference(spark, tmp_path):
    store = _store(spark, tmp_path)
    _mutate(store, spark)
    store.restore(1)
    t_segs = store.manifest_meta(1)["segments"]
    r_segs = store.manifest_meta(4)["segments"]
    assert {v: sm["ref"] for v, sm in r_segs.items()} == {
        v: sm["ref"] for v, sm in t_segs.items()
    }
    # and the restored snapshot's data files are the target's
    assert store.manifest(4)["files"] == store.manifest(1)["files"]


def test_restore_roundtrip_unpartitioned(spark, tmp_path):
    store = _store(spark, tmp_path, partitioned=False)
    v1_rows = _rows(store, spark, 1)
    store.delete_where(spark, [("k", ">=", 20)])
    assert len(_rows(store, spark)) == 20
    store.restore(1)
    assert _rows(store, spark) == v1_rows


def test_restore_keeps_head_replay_ledger(spark, tmp_path):
    store = _store(spark, tmp_path)
    base = store.read(spark, 1)
    store.merge(
        spark,
        base.filter(F.col("d") == "d1").withColumn(
            "amt", F.col("amt") + 1
        ),
        ["d", "k"],
        batch_id=7,
    )
    assert store.last_batch_id() == 7
    store.restore(1)
    # content rolled back, ledger did NOT: batch 7 must stay replayed
    assert store.last_batch_id() == 7
    assert _rows(store, spark) == _rows(store, spark, 1)


def test_restore_to_intermediate_version_and_dv_carry(spark, tmp_path):
    store = _store(spark, tmp_path)
    _mutate(store, spark)  # v3 has deletion vectors
    v3_rows = _rows(store, spark, 3)
    store.read(spark, 1)  # move the head target away from v3
    store.restore(1)  # v4
    store.restore(3)  # v5: target carries DV files
    assert _rows(store, spark) == v3_rows


def test_restore_as_of_timestamp(spark, tmp_path):
    store = _store(spark, tmp_path)
    t1 = store.manifest_meta(1)["committed_at"]
    _mutate(store, spark)
    store.restore(as_of=t1)
    assert _rows(store, spark) == _rows(store, spark, 1)
    with pytest.raises(ValueError):
        store.restore()
    with pytest.raises(ValueError):
        store.restore(1, as_of=t1)


def test_restore_expired_version_raises(spark, tmp_path):
    store = _store(spark, tmp_path)
    _mutate(store, spark)
    store.vacuum(keep_versions=2, retention_seconds=0.0)
    with pytest.raises(ValueError, match="not retained"):
        store.restore(1)


def test_vacuum_after_restore_keeps_restored_files(spark, tmp_path):
    store = _store(spark, tmp_path)
    v1_rows = _rows(store, spark, 1)
    _mutate(store, spark)
    store.restore(1)  # v4
    # expire everything but the restore commit; v1's files must
    # survive because v4 references them
    store.vacuum(keep_versions=1, retention_seconds=0.0)
    assert store.versions() == [4]
    assert _rows(store, spark) == v1_rows


def test_cdf_across_restore_classifies_the_rollback(spark, tmp_path):
    store = _store(spark, tmp_path)
    _mutate(store, spark)
    store.restore(1)
    feed = store.read_changes(spark, 3, 4)
    by_type = {
        r["_change_type"]: r["n"]
        for r in feed.groupBy("_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # the 3 synthetic inserts of v2 disappear again; the deleted k%5
    # rows come back; the d0 amt bumps revert as update pairs
    assert by_type.get("delete", 0) == 3
    assert by_type.get("insert", 0) > 0
    assert by_type.get("update_preimage", 0) == by_type.get(
        "update_postimage", 0
    )
    assert by_type.get("update_preimage", 0) > 0


def test_clone_is_zero_copy_and_independent(spark, tmp_path):
    store = _store(spark, tmp_path)
    _mutate(store, spark)  # v2 merge, v3 DV delete
    v3_rows = _rows(store, spark, 3)
    clone = store.clone(str(tmp_path / "c"))
    assert clone.latest_version() == 1
    m = clone.manifest_meta(1)
    assert m["op"] == "clone"
    assert m["clone_of"]["version"] == 3
    # same inodes, no data copied (hard links), DVs carried
    import os

    f = clone.manifest(1)["files"][0]
    assert os.stat(os.path.join(clone.path, f)).st_ino == os.stat(
        os.path.join(store.path, f)
    ).st_ino
    assert {
        (r.d, r.k, r.amt) for r in clone.read(spark).collect()
    } == v3_rows
    # divergence: writes on the clone never touch the source
    clone.delete_where(spark, [("k", ">=", 15)])
    assert _rows(store, spark) == v3_rows
    # ledger reset: the clone is a fresh writer domain
    assert clone.last_batch_id() is None


def test_clone_survives_source_vacuum(spark, tmp_path):
    store = _store(spark, tmp_path)
    v1_rows = _rows(store, spark, 1)
    clone = store.clone(str(tmp_path / "c"), version=1)
    _mutate(store, spark)
    # source compacts + vacuums away v1's files; the clone's hard
    # links keep the inodes alive
    store.compact(spark)
    store.vacuum(keep_versions=1, retention_seconds=0.0)
    assert {
        (r.d, r.k, r.amt) for r in clone.read(spark).collect()
    } == v1_rows


def test_clone_guards(spark, tmp_path):
    store = _store(spark, tmp_path)
    with pytest.raises(ValueError, match="destination is the source"):
        store.clone(store.path)
    c = store.clone(str(tmp_path / "c"))
    with pytest.raises(ValueError, match="not empty"):
        store.clone(c.path)
    with pytest.raises(ValueError, match="at most one"):
        store.clone(str(tmp_path / "d"), version=1, as_of=1.0)
