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
    # a 1-byte budget forces every file (single row group here) into
    # its own partition — the pre-r13 shape, keeps pruning observable
    df = _load(spark, clustered_store.path, maxBytesPerPartition=1)
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


def test_small_files_coalesce_into_byte_budget(spark, clustered_store):
    n_files = len(
        clustered_store.manifest(clustered_store.latest_version())["files"]
    )
    # default budget (128 MB) packs all of these tiny files together
    df = _load(spark, clustered_store.path)
    assert df.rdd.getNumPartitions() < n_files
    got = {(r.k, r.amt) for r in df.collect()}
    assert got == {(k, k * 10) for k in range(400) if k != 90}


def test_oversized_file_splits_by_row_group(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    register_batch_source(spark)
    p = str(tmp_path / "big")
    store = CommitLogStore(p)
    store.commit(
        spark.range(1000).selectExpr("id AS k", "id * 3 AS amt"),
        expect_version=None,
    )
    # rewrite the committed file with many small row groups so a tiny
    # budget splits it (Spark writes one big group by default)
    m = store.manifest(store.latest_version())
    assert len(m["files"]) >= 1
    import os

    f0 = os.path.join(p, m["files"][0])
    tbl = pq.read_table(f0)
    pq.write_table(tbl, f0, row_group_size=100)
    # drop the stale Hadoop checksum sidecar of the rewritten file
    crc = os.path.join(
        os.path.dirname(f0), f".{os.path.basename(f0)}.crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    store.delete_where(spark, [("k", "==", 7)], cow_threshold=None)

    df = _load(spark, p, maxBytesPerPartition=1)
    n_files = len(store.manifest(store.latest_version())["files"])
    # more partitions than files = the rewritten file split by group
    assert df.rdd.getNumPartitions() > n_files
    got = {(r.k, r.amt) for r in df.collect()}
    # the DV mask must survive the split (positions re-based per range)
    assert got == {(k, k * 3) for k in range(1000) if k != 7}
    assert got == {
        (r.k, r.amt) for r in store.read(spark).collect()
    }


def test_datasource_writer_roundtrip_unpartitioned(spark, tmp_path):
    register_batch_source(spark)
    p = str(tmp_path / "w")
    spark.range(100).selectExpr("id AS k", "id * 2 AS v").write.format(
        "commitlog"
    ).option("path", p).mode("append").save()
    store = CommitLogStore(p)
    assert store.latest_version() == 1
    # library face reads what the Spark face wrote
    assert {(r.k, r.v) for r in store.read(spark).collect()} == {
        (k, 2 * k) for k in range(100)
    }
    # append via Spark face: parent files carried with their stats
    spark.createDataFrame([(500, 1000)], "k long, v long").write.format(
        "commitlog"
    ).option("path", p).mode("append").save()
    assert store.latest_version() == 2
    m1, m2 = store.manifest(1), store.manifest(2)
    assert set(m1["files"]) < set(m2["files"])
    for f in m1["files"]:
        assert m2["stats"][f] == m1["stats"][f]
    assert _load(spark, p).count() == 101
    # library face writes, Spark face reads (other direction)
    store.merge(
        spark,
        spark.createDataFrame([(501, 1002)], "k long, v long"),
        ["k"],
    )
    assert _load(spark, p).count() == 102


def test_datasource_writer_partitioned_append_carries_by_ref(
    spark, tmp_path
):
    register_batch_source(spark)
    p = str(tmp_path / "wp")
    spark.range(60).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS g", "id * 2 AS v"
    ).write.format("commitlog").option("path", p).option(
        "partitionBy", "g"
    ).mode("overwrite").save()
    store = CommitLogStore(p)
    m1 = store.manifest(1)
    assert m1.get("partition_by") == "g"
    assert sorted(m1["partitions"]) == ["0", "1", "2"]
    # append touching only g=1: the other partitions carry by ref
    spark.createDataFrame(
        [(100, "1", 200)], "k long, g string, v long"
    ).write.format("commitlog").option("path", p).mode("append").save()
    m2 = store.manifest(2)
    assert m2["partitions"]["0"] == m1["partitions"]["0"]
    assert m2["partitions"]["2"] == m1["partitions"]["2"]
    assert set(m1["partitions"]["1"]) < set(m2["partitions"]["1"])
    assert store.read(spark).count() == 61
    assert _load(spark, p).count() == 61
    # appending with a conflicting partitionBy is rejected
    with pytest.raises(Exception, match="conflicts"):
        spark.createDataFrame(
            [(101, "1", 202)], "k long, g string, v long"
        ).write.format("commitlog").option("path", p).option(
            "partitionBy", "k"
        ).mode("append").save()


def test_datasource_writer_schema_mismatch_rejected(spark, tmp_path):
    register_batch_source(spark)
    p = str(tmp_path / "ws")
    spark.range(5).selectExpr("id AS k", "id AS v").write.format(
        "commitlog"
    ).option("path", p).mode("append").save()
    with pytest.raises(Exception, match="schema mismatch"):
        spark.range(5).selectExpr(
            "id AS k", "CAST(id AS STRING) AS v"
        ).write.format("commitlog").option("path", p).mode(
            "append"
        ).save()
    # overwrite replaces the schema instead
    spark.range(5).selectExpr(
        "id AS k", "CAST(id AS STRING) AS v"
    ).write.format("commitlog").option("path", p).mode(
        "overwrite"
    ).save()
    assert _load(spark, p).schema.simpleString() == (
        "struct<k:bigint,v:string>"
    )


def test_datasource_writer_occ_conflict(spark, tmp_path):
    """The Spark write face loses a version race exactly like a
    library-face commit with expect_version: the staged data stays an
    unreferenced orphan and the table is untouched."""
    import pyarrow as pa

    from calorista_spark.sources.commitlog import CommitConflictError
    from calorista_spark.sources.commitlog_batch import (
        make_commitlog_batch_datasource,
    )

    p = str(tmp_path / "occ")
    store = CommitLogStore(p)
    store.commit(
        spark.createDataFrame([(1, 10)], "k long, v long"),
        expect_version=None,
    )
    # plan a Spark-face append against v1 (pins parent = 1) ...
    ds = make_commitlog_batch_datasource()(options={"path": p})
    schema = store.read(spark).schema
    writer = ds.writer(schema, overwrite=False)
    msg = writer.write(
        iter(
            pa.table(
                {"k": [2], "v": [20]}
            ).to_batches()
        )
    )
    # ... a concurrent library-face commit lands v2 first ...
    store.commit(
        spark.createDataFrame([(9, 90)], "k long, v long"),
        expect_version=1,
    )
    # ... so the Spark-face commit must conflict, leaving no trace
    with pytest.raises(CommitConflictError):
        writer.commit([msg])
    assert store.latest_version() == 2
    assert {r.k for r in store.read(spark).collect()} == {9}
    # explicit stale pin is rejected at PLAN time
    with pytest.raises(Exception, match="expected parent"):
        spark.createDataFrame([(3, 30)], "k long, v long").write.format(
            "commitlog"
        ).option("path", p).option("expectVersion", "1").mode(
            "append"
        ).save()


def test_datasource_writer_abort_cleans_staging(spark, tmp_path):
    import os

    import pyarrow as pa

    from calorista_spark.sources.commitlog_batch import (
        make_commitlog_batch_datasource,
    )

    p = str(tmp_path / "ab")
    store = CommitLogStore(p)
    store.commit(
        spark.createDataFrame([(1, 10)], "k long, v long"),
        expect_version=None,
    )
    ds = make_commitlog_batch_datasource()(options={"path": p})
    writer = ds.writer(store.read(spark).schema, overwrite=False)
    msg = writer.write(
        iter(pa.table({"k": [2], "v": [20]}).to_batches())
    )
    staged = os.path.join(p, "data", writer.token)
    assert os.path.isdir(staged)
    writer.abort([msg])
    assert not os.path.exists(staged)
    assert store.latest_version() == 1


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


def test_streaming_sink_exactly_once(spark, tmp_path):
    """writeStream.format('commitlog'): each epoch is one table commit
    under batch_id = epoch id; a restarted query replaying an epoch is
    skipped by the commit ledger (exactly-once), and new data after
    the restart appends normally."""
    import os

    register_batch_source(spark)
    src = str(tmp_path / "src")
    p = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def feed(rows):
        spark.createDataFrame(rows, "k long, v long").coalesce(
            1
        ).write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema("k long, v long").parquet(src)
        q = (
            stream.writeStream.format("commitlog")
            .option("path", p)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    feed([(1, 10), (2, 20)])
    run()
    store = CommitLogStore(p)
    assert {(r.k, r.v) for r in store.read(spark).collect()} == {
        (1, 10),
        (2, 20),
    }
    v_after_first = store.latest_version()
    # restart with NO new data: no new commit (ledger skip / no epoch)
    run()
    assert store.latest_version() == v_after_first
    # restart with new data: appends exactly once
    feed([(3, 30)])
    run()
    got = {(r.k, r.v) for r in store.read(spark).collect()}
    assert got == {(1, 10), (2, 20), (3, 30)}
    # the Spark batch face reads what the stream wrote
    ds = {
        (r.k, r.v)
        for r in spark.read.format("commitlog")
        .option("path", p)
        .load()
        .collect()
    }
    assert ds == got
    # ledger recorded epoch ids
    assert store.last_batch_id() is not None
    assert os.path.isdir(os.path.join(p, "_commits"))

def test_overwrite_inherits_partition_layout(spark, tmp_path):
    """mode('overwrite') without option('partitionBy') keeps the
    table's partition layout (ADVICE r13: silently de-partitioning
    loses pruning and partition-scoped merges for every later
    version); option('partitionBy', '') de-partitions explicitly."""
    register_batch_source(spark)
    p = str(tmp_path / "ow")
    spark.range(30).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS g"
    ).write.format("commitlog").option("path", p).option(
        "partitionBy", "g"
    ).mode("overwrite").save()
    store = CommitLogStore(p)
    # plain overwrite: layout inherited
    spark.range(9).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS g"
    ).write.format("commitlog").option("path", p).mode(
        "overwrite"
    ).save()
    m = store.manifest(store.latest_version())
    assert m.get("partition_by") == "g"
    assert sorted(m["partitions"]) == ["0", "1", "2"]
    # explicit de-partition: option("partitionBy", "")
    spark.range(9).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS g"
    ).write.format("commitlog").option("path", p).option(
        "partitionBy", ""
    ).mode("overwrite").save()
    m2 = store.manifest(store.latest_version())
    assert m2.get("partition_by") is None
    assert store.read(spark).count() == 9


def test_streaming_sink_fresh_checkpoint_raises_on_global_ledger(
    spark, tmp_path
):
    """A store whose GLOBAL batch high-water mark is ahead (e.g. CDC
    merges committed batch_id=7) must not silently swallow a streaming
    query that starts at epoch 0 — the pre-r14 behavior dropped those
    epochs (ADVICE r13). Without txnAppId the sink now fails loudly."""
    register_batch_source(spark)
    src = str(tmp_path / "src")
    p = str(tmp_path / "sink")
    store = CommitLogStore(p)
    store.commit(
        spark.createDataFrame([(0, 0)], "k long, v long"),
        expect_version=None,
        batch_id=7,
    )
    spark.createDataFrame([(1, 10)], "k long, v long").coalesce(
        1
    ).write.mode("append").parquet(src)
    stream = spark.readStream.schema("k long, v long").parquet(src)
    q = (
        stream.writeStream.format("commitlog")
        .option("path", p)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="high-water|txnAppId"):
        q.awaitTermination(120)
        raise AssertionError("query should have failed")


def test_streaming_sink_txn_app_scoped_ledger(spark, tmp_path):
    """option('txnAppId'): the writer-scoped replay ledger (Delta's
    txnAppId/txnVersion). A streaming writer's epoch 0 lands even when
    the store's global batch ledger is far ahead, its own replays
    still skip, and it never bumps the global high-water mark."""
    register_batch_source(spark)
    src = str(tmp_path / "src")
    p = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    store = CommitLogStore(p)
    store.commit(
        spark.createDataFrame([(0, 0)], "k long, v long"),
        expect_version=None,
        batch_id=7,
    )

    def feed(rows):
        spark.createDataFrame(rows, "k long, v long").coalesce(
            1
        ).write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema("k long, v long").parquet(src)
        q = (
            stream.writeStream.format("commitlog")
            .option("path", p)
            .option("checkpointLocation", ckpt)
            .option("txnAppId", "ingest-a")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    feed([(1, 10), (2, 20)])
    run()
    got = {(r.k, r.v) for r in store.read(spark).collect()}
    assert got == {(0, 0), (1, 10), (2, 20)}
    v1 = store.latest_version()
    run()  # no new data: no new commit
    assert store.latest_version() == v1
    feed([(3, 30)])
    run()
    got = {(r.k, r.v) for r in store.read(spark).collect()}
    assert got == {(0, 0), (1, 10), (2, 20), (3, 30)}
    # app-scoped ledger advanced; the GLOBAL ledger did not move
    assert store.last_batch_id("ingest-a") is not None
    assert store.last_batch_id() == 7
    # the txn map survives unrelated commits (carried through _publish)
    store.commit(
        spark.createDataFrame([(9, 90)], "k long, v long"), op="append"
    )
    assert store.last_batch_id("ingest-a") is not None
