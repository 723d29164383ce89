"""Non-additive schema evolution via column mapping (r13 — VERDICT
r12 #6): rename/drop are metadata-only commits; files keep stable
physical column names; reads, pruned reads, DML, merge, CDF (across
the rename), compact and both Spark DataSource faces present each
version's logical names."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from calorista_spark.sources.commitlog import CommitLogStore
from calorista_spark.sources.commitlog_batch import register_batch_source


def _base(spark, tmp_path, partitioned=True):
    store = CommitLogStore(str(tmp_path / "s"))
    df = spark.createDataFrame(
        [(f"d{i % 2}", i, i * 10) for i in range(20)],
        "d string, k long, amt long",
    )
    store.commit(
        df,
        expect_version=None,
        partition_by="d" if partitioned else None,
        keys=["d", "k"] if partitioned else ["k"],
    )
    return store


def test_rename_is_metadata_only_and_time_travel_keeps_old_name(
    spark, tmp_path
):
    store = _base(spark, tmp_path)
    m1 = store.manifest(1)
    v2 = store.rename_column("amt", "amount")
    assert v2 == 2
    m2 = store.manifest(2)
    # not a single data file changed
    assert m2["files"] == m1["files"]
    assert m2["column_mapping"] == {"amount": "amt"}
    # head reads the new name, time travel the old
    assert store.read(spark).columns == ["d", "k", "amount"]
    assert store.read(spark, 1).columns == ["d", "k", "amt"]
    got = {(r.k, r.amount) for r in store.read(spark).collect()}
    assert got == {(i, i * 10) for i in range(20)}


def test_rename_back_to_original_drops_mapping(spark, tmp_path):
    store = _base(spark, tmp_path)
    store.rename_column("amt", "amount")
    store.rename_column("amount", "amt")
    m = store.manifest(store.latest_version())
    assert not m.get("column_mapping")
    assert store.read(spark).columns == ["d", "k", "amt"]


def test_pruned_read_and_dml_after_rename(spark, tmp_path):
    store = _base(spark, tmp_path)
    store.rename_column("amt", "amount")
    # read_where on the NEW name prunes against old-named footer stats
    got = {
        (r.k, r.amount)
        for r in store.read_where(
            spark, [("amount", ">=", 150)]
        ).collect()
    }
    assert got == {(i, i * 10) for i in range(15, 20)}
    # DELETE on the new name (DV path)
    store.delete_where(spark, [("amount", "==", 50)], cow_threshold=None)
    assert store.read(spark).count() == 19
    # UPDATE on the new name
    store.update_where(
        spark, [("k", "==", 7)], {"amount": F.lit(999).cast("long")}
    )
    rows = {r.k: r.amount for r in store.read(spark).collect()}
    assert rows[7] == 999 and 5 not in rows


def test_merge_and_compact_after_renaming_key_and_partition(
    spark, tmp_path
):
    store = _base(spark, tmp_path)
    store.rename_column("d", "day")
    store.rename_column("k", "id")
    m = store.manifest(store.latest_version())
    assert m["partition_by"] == "day"
    assert m["keys"] == ["day", "id"]
    # merge through the renamed logical schema
    batch = spark.createDataFrame(
        [("d0", 0, 12345), ("d1", 99, 990)],
        "day string, id long, amt long",
    )
    store.merge(spark, batch, ["day", "id"])
    got = {(r.day, r.id): r.amt for r in store.read(spark).collect()}
    assert got[("d0", 0)] == 12345 and got[("d1", 99)] == 990
    assert len(got) == 21
    # compact (rewrites under physical names) keeps contents
    before = dict(got)
    store.compact(spark, target_file_bytes=1 << 30)
    after = {(r.day, r.id): r.amt for r in store.read(spark).collect()}
    assert after == before


def test_cdf_across_rename_presents_end_schema(spark, tmp_path):
    store = _base(spark, tmp_path)
    # v2: a data change BEFORE the rename
    store.merge(
        spark,
        spark.createDataFrame(
            [("d0", 0, 111)], "d string, k long, amt long"
        ),
        ["d", "k"],
    )
    v3 = store.rename_column("amt", "amount")
    # v4: a data change AFTER the rename
    store.merge(
        spark,
        spark.createDataFrame(
            [("d1", 1, 222)], "d string, k long, amount long"
        ),
        ["d", "k"],
    )
    changes = store.read_changes(spark, 1).collect()
    # the feed presents the END version's logical name for the WHOLE
    # history, and the rename commit itself contributes zero rows
    assert "amount" in changes[0].asDict()
    assert not any(r._commit_version == v3 for r in changes)
    by_ver = {}
    for r in changes:
        by_ver.setdefault(r._commit_version, []).append(r)
    pre2 = [
        r for r in by_ver[2] if r._change_type == "update_preimage"
    ]
    post2 = [
        r for r in by_ver[2] if r._change_type == "update_postimage"
    ]
    assert [(r.k, r.amount) for r in pre2] == [(0, 0)]
    assert [(r.k, r.amount) for r in post2] == [(0, 111)]
    post4 = [
        r for r in by_ver[4] if r._change_type == "update_postimage"
    ]
    assert [(r.k, r.amount) for r in post4] == [(1, 222)]


def test_drop_column_and_safe_readd(spark, tmp_path):
    store = _base(spark, tmp_path)
    v2 = store.drop_column("amt")
    m2 = store.manifest(v2)
    assert m2["files"] == store.manifest(1)["files"]  # metadata-only
    assert m2["retired_columns"] == ["amt"]
    assert store.read(spark).columns == ["d", "k"]
    # time travel still shows the dropped column's data
    assert store.read(spark, 1).columns == ["d", "k", "amt"]
    # re-adding a column NAMED amt must not read the dropped bytes
    batch = spark.createDataFrame(
        [("d0", 0, -7), ("d1", 99, -8)], "d string, k long, amt long"
    )
    store.merge(spark, batch, ["d", "k"], schema_mode="merge")
    m = store.manifest(store.latest_version())
    # the new logical amt got a FRESH physical slot
    assert m["column_mapping"]["amt"] != "amt"
    rows = {(r.d, r.k): r.amt for r in store.read(spark).collect()}
    assert rows[("d0", 0)] == -7 and rows[("d1", 99)] == -8
    # every pre-existing row reads NULL, never the retired bytes
    assert all(
        v is None for kk, v in rows.items() if kk not in
        {("d0", 0), ("d1", 99)}
    )


def test_drop_refusals(spark, tmp_path):
    store = _base(spark, tmp_path)
    with pytest.raises(ValueError, match="partition column"):
        store.drop_column("d")
    with pytest.raises(ValueError, match="merge key"):
        store.drop_column("k")
    un = CommitLogStore(str(tmp_path / "u"))
    un.commit(spark.range(3).selectExpr("id AS x"), expect_version=None)
    with pytest.raises(ValueError, match="last column"):
        un.drop_column("x")
    with pytest.raises(ValueError, match="already exists"):
        store.rename_column("amt", "k")
    with pytest.raises(ValueError, match="unknown column"):
        store.rename_column("nope", "x")


def test_datasource_faces_after_rename(spark, tmp_path):
    register_batch_source(spark)
    store = _base(spark, tmp_path)
    store.rename_column("amt", "amount")
    p = store.path
    df = spark.read.format("commitlog").option("path", p).load()
    assert df.columns == ["d", "k", "amount"]
    got = {(r.k, r.amount) for r in df.collect()}
    assert got == {(i, i * 10) for i in range(20)}
    # pushed filter on the renamed column stays correct
    assert (
        df.filter(F.col("amount") >= 150).count() == 5
    )
    # Spark-face append writes under the PHYSICAL name
    spark.createDataFrame(
        [("d0", 100, 1000)], "d string, k long, amount long"
    ).write.format("commitlog").option("path", p).mode("append").save()
    assert store.read(spark).count() == 21
    lib = {(r.k, r.amount) for r in store.read(spark).collect()}
    ds = {
        (r.k, r.amount)
        for r in spark.read.format("commitlog")
        .option("path", p)
        .load()
        .collect()
    }
    assert lib == ds
    # the appended file physically holds 'amt', not 'amount'
    import os

    import pyarrow.parquet as pq

    m = store.manifest(store.latest_version())
    new_files = set(m["files"]) - set(store.manifest(2)["files"])
    assert new_files
    for f in new_files:
        names = pq.ParquetFile(os.path.join(p, f)).schema_arrow.names
        assert "amt" in names and "amount" not in names


def test_unpartitioned_rename_and_cdf(spark, tmp_path):
    store = CommitLogStore(str(tmp_path / "u"))
    store.commit(
        spark.createDataFrame(
            [(i, i * 2) for i in range(10)], "k long, v long"
        ),
        expect_version=None,
        keys=["k"],
    )
    store.rename_column("v", "value")
    store.merge(
        spark,
        spark.createDataFrame([(3, 333)], "k long, value long"),
        ["k"],
    )
    got = {r.k: r.value for r in store.read(spark).collect()}
    assert got[3] == 333 and len(got) == 10
    ch = store.read_changes(spark, 1).collect()
    assert {
        (r.k, r.value, r._change_type) for r in ch
    } == {(3, 6, "update_preimage"), (3, 333, "update_postimage")}
