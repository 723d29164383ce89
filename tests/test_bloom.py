"""Bloom-filter file skipping (r14 — sources/bloom.py): equality
point lookups skip files min/max stats cannot (interleaved key
domains), never produce a false negative, survive renames (physical
keying) and DML rewrites (missing sidecar = no skip), and vacuum GCs
orphan sidecars."""

from __future__ import annotations

import os

import pytest

from calorista_spark.sources.commitlog import CommitLogStore


def _store(spark, tmp_path):
    """Two appends with fully OVERLAPPING id ranges but disjoint id
    sets (evens then odds): min/max pruning is provably useless, so
    any file skipping observed is the bloom's."""
    store = CommitLogStore(str(tmp_path / "s"))
    evens = spark.createDataFrame(
        [(2 * i, f"u{2 * i}", "even") for i in range(500)],
        "k long, name string, par string",
    )
    odds = spark.createDataFrame(
        [(2 * i + 1, f"u{2 * i + 1}", "odd") for i in range(500)],
        "k long, name string, par string",
    )
    store.commit(
        evens.coalesce(1), expect_version=None, keys=["k"]
    )
    store.commit(odds.coalesce(1), op="append")
    return store


def test_bloom_skips_files_minmax_cannot(spark, tmp_path):
    store = _store(spark, tmp_path)
    # both files span [0..999]-ish: stats alone keep both
    assert len(store.files_for([("k", "==", 42)])) == 2
    n = store.build_bloom(spark, ["k", "name"])
    assert n == len(store.manifest(store.latest_version())["files"])
    # a point lookup now plans exactly the one file that can match
    assert len(store.files_for([("k", "==", 42)])) == 1
    assert len(store.files_for([("name", "==", "u43")])) == 1
    # absent value: zero files planned
    assert store.files_for([("k", "==", 5000)]) == []
    # IN spanning both parities keeps both files
    assert len(store.files_for([("k", "in", [2, 3])])) == 2


def test_bloom_reads_stay_exact(spark, tmp_path):
    store = _store(spark, tmp_path)
    store.build_bloom(spark, ["k", "name"])
    full = store.read(spark)
    for probe in (0, 1, 41, 42, 997, 998, 5000):
        got = {
            r.k for r in store.read_where(spark, [("k", "==", probe)]).collect()
        }
        want = {
            r.k for r in full.filter(f"k = {probe}").collect()
        }
        assert got == want, probe
    got = {
        r.k
        for r in store.read_where(
            spark, [("k", "in", [7, 8, 5001])]
        ).collect()
    }
    assert got == {7, 8}


def test_bloom_incremental_after_dml(spark, tmp_path):
    store = _store(spark, tmp_path)
    store.build_bloom(spark, ["k"])
    # DML rewrites files; the new files have no sidecars -> no false
    # skipping, lookups stay exact
    store.update_where(
        spark, [("k", "==", 42)], {"name": __import__(
            "pyspark.sql.functions", fromlist=["lit"]
        ).lit("updated")},
    )
    rows = store.read_where(spark, [("k", "==", 42)]).collect()
    assert len(rows) == 1 and rows[0].name == "updated"
    # rebuild covers ONLY the new files (incremental by immutability)
    n_files = len(store.manifest(store.latest_version())["files"])
    n_new = store.build_bloom(spark, ["k"])
    assert 0 < n_new < n_files
    assert store.build_bloom(spark, ["k"]) == 0  # now fully covered


def test_bloom_type_gate_is_conservative(spark, tmp_path):
    store = _store(spark, tmp_path)
    store.build_bloom(spark, ["k"])
    # float literal against a bigint column: bloom must NOT vote
    assert len(store.files_for([("k", "==", 42.0)])) == 2
    got = {
        r.k for r in store.read_where(spark, [("k", "==", 42.0)]).collect()
    }
    assert got == {42}


def test_bloom_survives_rename(spark, tmp_path):
    store = _store(spark, tmp_path)
    store.build_bloom(spark, ["k"])
    store.rename_column("k", "key")
    assert len(store.files_for([("key", "==", 42)])) == 1
    got = {
        r.key
        for r in store.read_where(spark, [("key", "==", 42)]).collect()
    }
    assert got == {42}


def test_bloom_rejects_unsupported_types(spark, tmp_path):
    store = CommitLogStore(str(tmp_path / "s2"))
    df = spark.createDataFrame(
        [(1, 1.5)], "k long, x double"
    )
    store.commit(df, expect_version=None)
    with pytest.raises(ValueError, match="int/string/date"):
        store.build_bloom(spark, ["x"])
    with pytest.raises(ValueError, match="unknown column"):
        store.build_bloom(spark, ["nope"])


def test_vacuum_gcs_orphan_sidecars(spark, tmp_path):
    from calorista_spark.sources import bloom as _bloom

    store = _store(spark, tmp_path)
    store.build_bloom(spark, ["k"])
    bdir = _bloom.bloom_dir(store.path)
    n0 = len(os.listdir(bdir))
    store.compact(spark)  # rewrites files; old sidecars orphaned
    store.vacuum(keep_versions=1, retention_seconds=0.0)
    n1 = len(os.listdir(bdir))
    assert n1 < n0
    # only meta remains (compacted files not yet bloom-covered)
    assert set(os.listdir(bdir)) == {"meta.json"}
    # and lookups on the uncovered rebuilt files are still exact
    got = {
        r.k for r in store.read_where(spark, [("k", "==", 42)]).collect()
    }
    assert got == {42}
    store.build_bloom(spark, ["k"])
    assert len(store.files_for([("k", "==", 42)])) >= 1
