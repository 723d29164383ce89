"""Batch ``commitlog`` Spark DataSource (sources/commitlog_batch.py):
snapshot round-trip with deletion vectors, Catalyst filter pushdown
driving manifest file skipping, time travel, and schema-on-read
across evolution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from calorista_spark.sources.commitlog import CommitLogStore
from calorista_spark.sources.commitlog_batch import register_batch_source


@pytest.fixture()
def clustered_store(spark, tmp_path):
    register_batch_source(spark)
    p = str(tmp_path / "s")
    store = CommitLogStore(p)
    store.commit(
        spark.range(400).selectExpr("id AS k", "id * 10 AS amt"),
        expect_version=None,
        keys=["k"],
    )
    m0 = store.manifest(store.latest_version())
    total = sum(st["bytes"] for st in m0["stats"].values())
    store.compact(
        spark, target_file_bytes=max(1, total // 4), cluster_by=["k"]
    )
    store.delete_where(spark, [("k", "==", 90)], cow_threshold=None)
    return store


def _load(spark, path, **options):
    r = spark.read.format("commitlog").option("path", path)
    for k, v in options.items():
        r = r.option(k, str(v))
    return r.load()


def test_roundtrip_with_deletion_vectors(spark, clustered_store):
    df = _load(spark, clustered_store.path)
    got = {(r.k, r.amt) for r in df.collect()}
    assert got == {(k, k * 10) for k in range(400) if k != 90}
    # bit-identical to the library face
    lib = {(r.k, r.amt) for r in clustered_store.read(spark).collect()}
    assert got == lib


def test_filter_pushdown_prunes_planned_files(spark, clustered_store):
    n_files = len(
        clustered_store.manifest(clustered_store.latest_version())["files"]
    )
    assert n_files >= 4
    df = _load(spark, clustered_store.path)
    # one input partition per live file when nothing is pushed
    assert df.rdd.getNumPartitions() == n_files
    # an equality filter on the clustered key plans O(matching files)
    point = df.filter(F.col("k") == 5)
    assert point.rdd.getNumPartitions() == 1
    assert [(r.k, r.amt) for r in point.collect()] == [(5, 50)]
    # range + IN filters prune too, and residual application is exact
    rng = df.filter((F.col("k") >= 0) & (F.col("k") <= 30))
    assert rng.rdd.getNumPartitions() < n_files
    assert rng.count() == 31
    inq = df.filter(F.col("k").isin(3, 7))
    assert inq.rdd.getNumPartitions() == 1
    assert {r.k for r in inq.collect()} == {3, 7}
    # a filter the skipper can't use (non-key column) stays correct
    assert df.filter(F.col("amt") == 70).count() == 1


def test_time_travel_option(spark, clustered_store):
    v1 = _load(spark, clustered_store.path, version=1)
    assert v1.count() == 400  # before the delete
    head = _load(spark, clustered_store.path)
    assert head.count() == 399


def test_schema_on_read_across_evolution(spark, tmp_path):
    register_batch_source(spark)
    p = str(tmp_path / "evo")
    store = CommitLogStore(p)
    store.commit(
        spark.createDataFrame([(1, "a")], "k long, v string"),
        expect_version=None,
        keys=["k"],
    )
    store.merge(
        spark,
        spark.createDataFrame(
            [(2, "b", 99)], "k long, v string, extra long"
        ),
        ["k"],
        schema_mode="merge",
    )
    df = _load(spark, p)
    assert df.schema.simpleString() == (
        "struct<k:bigint,v:string,extra:bigint>"
    )
    got = {(r.k, r.v, r.extra) for r in df.collect()}
    assert got == {(1, "a", None), (2, "b", 99)}


def test_sql_over_registered_view(spark, clustered_store):
    _load(spark, clustered_store.path).createOrReplaceTempView(
        "store_sql_view"
    )
    row = spark.sql(
        "SELECT CAST(SUM(amt) AS BIGINT) AS s FROM store_sql_view "
        "WHERE k < 10"
    ).first()
    assert row.s == sum(k * 10 for k in range(10))
