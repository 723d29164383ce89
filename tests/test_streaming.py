"""Structured Streaming tests (SURVEY §2.10 ST1/ST2/ST3/ST5): the
helpers run through real readStream/writeStream with availableNow
triggers — batch-mode equivalence is covered by the oracle gate."""

from __future__ import annotations

import datetime
import uuid

from pyspark.sql import functions as F
from pyspark.sql import types as T

from calorista_spark.streaming.incremental import (
    start_incremental_merge,
    tumbling_agg,
    watermarked_dedup,
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, minute)


def _write_batch(spark, path: str, rows) -> None:
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_st1_incremental_merge_two_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    (tmp_path / "store").mkdir()

    _write_batch(spark, src, [(1, _ts(0), 10, 1.0), (2, _ts(1), 10, 2.0)])
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = start_incremental_merge(stream, store, ["event_id"], ckpt)
    q.awaitTermination(120)

    state1 = {r.event_id: r.value for r in spark.read.parquet(store).collect()}
    assert state1 == {1: 1.0, 2: 2.0}

    # batch 2: event 2 changed, event 3 new — reference main.py:146-161
    _write_batch(spark, src, [(2, _ts(2), 10, 20.0), (3, _ts(3), 11, 3.0)])
    stream2 = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q2 = start_incremental_merge(stream2, store, ["event_id"], ckpt)
    q2.awaitTermination(120)

    state2 = {r.event_id: r.value for r in spark.read.parquet(store).collect()}
    assert state2 == {1: 1.0, 2: 20.0, 3: 3.0}


def test_st2_watermarked_dedup_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batch(
        spark,
        src,
        [
            (1, _ts(0), 10, 1.0),
            (1, _ts(0), 10, 1.0),  # exact duplicate (re-delivery)
            (2, _ts(5), 10, 2.0),
        ],
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    deduped = watermarked_dedup(stream, ["event_id"], "ts", "1 hour")
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    assert sorted(r.event_id for r in rows) == [1, 2]


def test_st3_streaming_tumbling_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = [(i, _ts(i), 10, float(i)) for i in range(30)]
    _write_batch(spark, src, rows)

    def agg(df):
        return tumbling_agg(
            df,
            "ts",
            "10 minutes",
            [F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")],
        ).select(F.col("win.start").alias("ws"), "n", "total")

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    name = f"tumb_{uuid.uuid4().hex[:8]}"
    q = (
        agg(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r.ws: (r.n, r.total) for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    batch = {
        r.ws: (r.n, r.total)
        for r in agg(spark.read.schema(EVENT_SCHEMA).parquet(src)).collect()
    }
    assert streamed == batch and len(batch) == 3


def test_st5_late_data_within_watermark_counts(spark, tmp_path):
    # Late row arriving in a later batch, still inside the watermark →
    # dedup state admits it exactly once (update semantics verified via
    # two availableNow passes over a growing directory).
    src = str(tmp_path / "src")
    _write_batch(spark, src, [(1, _ts(40), 10, 1.0)])
    _write_batch(spark, src, [(2, _ts(10), 10, 2.0)])  # 30 min late
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    deduped = watermarked_dedup(stream, ["event_id"], "ts", "2 hours")
    name = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(
        r.event_id for r in spark.sql(f"SELECT * FROM {name}").collect()
    ) == [1, 2]


def test_st6_stream_stream_interval_join_matches_batch(spark, tmp_path):
    # two-sided watermarked interval join: purchases within 20 min of
    # a view, same user. Streamed result must equal the batch join.
    from calorista_spark.streaming.incremental import stream_interval_join

    vsrc, psrc = str(tmp_path / "views"), str(tmp_path / "buys")
    _write_batch(
        spark, vsrc, [(1, _ts(0), 10, 0.0), (2, _ts(5), 11, 0.0), (3, _ts(30), 10, 0.0)]
    )
    _write_batch(
        spark,
        psrc,
        [
            (101, _ts(10), 10, 9.0),   # joins view 1 (10 min later)
            (102, _ts(50), 10, 9.0),   # joins view 3 only (20 min window)
            (103, _ts(6), 12, 9.0),    # no matching user
        ],
    )

    def run(reader):
        views = reader.schema(EVENT_SCHEMA).parquet(vsrc).select(
            "user_id", F.col("event_id").alias("view_id"), "ts"
        )
        buys = (
            reader.schema(EVENT_SCHEMA)
            .parquet(psrc)
            .select(
                F.col("user_id").alias("p_user_id"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("p_ts"),
            )
            .withColumnRenamed("p_user_id", "user_id")
        )
        left = views
        right = buys.withColumnRenamed("user_id", "r_user_id")
        l_wm = left.withWatermark("ts", "1 hour")
        r_wm = right.withWatermark("p_ts", "1 hour")
        return l_wm.join(
            r_wm,
            (l_wm["user_id"] == r_wm["r_user_id"])
            & (r_wm["p_ts"] > l_wm["ts"])
            & (r_wm["p_ts"] <= l_wm["ts"] + F.expr("INTERVAL 20 MINUTES")),
            "inner",
        ).select("user_id", "view_id", "purchase_id")

    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        run(spark.readStream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(
        (r.user_id, r.view_id, r.purchase_id)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    )
    batch = sorted(
        (r.user_id, r.view_id, r.purchase_id) for r in run(spark.read).collect()
    )
    assert streamed == batch == [(10, 1, 101), (10, 3, 102)]


def test_st6_helper_batch_mode(spark):
    # the stream_interval_join helper itself, batch mode: watermarks
    # are no-ops, condition semantics identical
    from calorista_spark.streaming.incremental import stream_interval_join

    left = spark.createDataFrame(
        [(1, _ts(0), 10, 0.0)], EVENT_SCHEMA
    ).withColumnRenamed("ts", "lts")
    right = spark.createDataFrame(
        [(2, _ts(10), 10, 0.0), (3, _ts(40), 10, 0.0)], EVENT_SCHEMA
    ).selectExpr("event_id AS r_event_id", "ts AS rts", "user_id AS r_user_id")
    out = stream_interval_join(
        left.withColumnRenamed("user_id", "k"),
        right.withColumnRenamed("r_user_id", "k"),
        key="k",
        left_ts="lts",
        right_ts="rts",
        upper="20 MINUTES",
    )
    assert [r.r_event_id for r in out.collect()] == [2]


def test_streaming_incremental_rollup_maintenance(spark, tmp_path):
    # §4.1 end-to-end in streaming mode: each micro-batch refreshes
    # ONLY the rollup partitions its rows touch, via foreachBatch
    from calorista_spark.materialize import incremental_rollup_refresh

    src = str(tmp_path / "src")
    fact_store = str(tmp_path / "fact")
    rollup = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    def with_day(df):
        return df.select(
            F.col("ts").cast("date").cast("string").alias("day"), "value"
        )

    def daily(df):
        return df.groupBy("day").agg(
            F.sum("value").alias("total"), F.count(F.lit(1)).alias("n")
        )

    def handle_batch(batch, batch_id):
        s = batch.sparkSession
        batch.write.mode("append").parquet(fact_store)
        fact = with_day(s.read.parquet(fact_store))
        import os
        if not os.path.isdir(rollup) or not any(
            f.startswith("day=") for f in os.listdir(rollup)
        ):
            daily(fact).write.partitionBy("day").mode("overwrite").parquet(rollup)
        else:
            incremental_rollup_refresh(
                fact, with_day(batch), rollup, "day", daily
            )

    def run_pass():
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
        q = (
            stream.writeStream.foreachBatch(handle_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_batch(spark, src, [(1, _ts(0), 10, 1.0), (2, _ts(1), 10, 2.0)])
    run_pass()
    got1 = {str(r.day): r.total for r in spark.read.parquet(rollup).collect()}
    assert got1 == {"2024-01-01": 3.0}

    # second batch lands on the same day → that partition refreshes
    _write_batch(spark, src, [(3, _ts(30), 11, 5.0)])
    run_pass()
    got2 = {
        str(r.day): (r.total, r.n)
        for r in spark.read.parquet(rollup).collect()
    }
    assert got2 == {"2024-01-01": (8.0, 3)}


def test_streaming_rollup_commitlog_crash_restart(spark, tmp_path):
    """r10 (VERDICT r9 #6): the SAME rollup-maintenance ETL, routed
    through a CommitLogStore — and crashed BETWEEN the fact append and
    the rollup commit. The atomic manifest swap means the rollup store
    still reads as the previous version after the crash (no torn
    write), the checkpoint replay re-runs the batch idempotently
    (at-least-once fact append + keyed dedup), and untouched date
    partitions carry by reference across every refresh."""
    import os

    from calorista_spark.materialize import incremental_rollup_refresh
    from calorista_spark.sources.commitlog import CommitLogStore

    src = str(tmp_path / "src")
    fact_store = str(tmp_path / "fact")
    rollup = CommitLogStore(str(tmp_path / "rollup"))
    ckpt = str(tmp_path / "ckpt")
    flag = str(tmp_path / "bomb")
    open(flag, "w").close()

    def with_day(df):
        return df.select(
            "event_id",
            F.col("ts").cast("date").cast("string").alias("day"),
            "value",
        )

    def daily(df):
        return df.groupBy("day").agg(
            F.sum("value").alias("total"), F.count(F.lit(1)).alias("n")
        )

    def handle_batch(batch, batch_id):
        s = batch.sparkSession
        batch.write.mode("append").parquet(fact_store)
        if batch_id == 1 and os.path.exists(flag):
            os.unlink(flag)
            raise RuntimeError("injected crash between fact and rollup")
        # at-least-once fact append + keyed dedup = idempotent fact
        fact = with_day(
            s.read.parquet(fact_store).dropDuplicates(["event_id"])
        )
        incremental_rollup_refresh(fact, with_day(batch), rollup, "day", daily)

    def run_pass():
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
        q = (
            stream.writeStream.foreachBatch(handle_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return q

    day2 = datetime.datetime(2024, 1, 2, 0, 0)
    _write_batch(spark, src, [(1, _ts(0), 10, 1.0), (2, day2, 10, 2.0)])
    run_pass()
    v1 = rollup.latest_version()
    got1 = {r.day: (r.total, r.n) for r in rollup.read(spark).collect()}
    assert got1 == {"2024-01-01": (1.0, 1), "2024-01-02": (2.0, 1)}

    # batch 2 lands on day 1 only — and crashes AFTER the fact append
    _write_batch(spark, src, [(3, _ts(30), 11, 5.0)])
    import pytest as _pytest

    with _pytest.raises(Exception):
        run_pass().awaitTermination()
    # torn-write window is gone: the rollup still reads as v1
    assert rollup.latest_version() == v1
    assert {
        r.day: (r.total, r.n) for r in rollup.read(spark).collect()
    } == got1

    # restart from the checkpoint: batch replays (fact rows duplicated,
    # deduped by key), rollup commits, untouched day-2 partition is
    # carried by reference
    run_pass()
    v2 = rollup.latest_version()
    assert v2 == v1 + 1
    got2 = {r.day: (r.total, r.n) for r in rollup.read(spark).collect()}
    assert got2 == {"2024-01-01": (6.0, 2), "2024-01-02": (2.0, 1)}
    m1, m2 = rollup.manifest(v1), rollup.manifest(v2)
    assert m2["partitions"]["2024-01-02"] == m1["partitions"]["2024-01-02"]
    assert not set(m2["partitions"]["2024-01-01"]) & set(
        m1["partitions"]["2024-01-01"]
    )


def test_drop_duplicates_within_watermark(spark, tmp_path):
    # Spark 3.5+ dropDuplicatesWithinWatermark: dedups re-deliveries
    # whose event times differ slightly (same key, both inside the
    # watermark window) — the realistic at-least-once-delivery case
    # where plain dropDuplicates on (id, ts) would keep both
    src = str(tmp_path / "src")
    _write_batch(
        spark,
        src,
        [
            (1, _ts(0), 10, 1.0),
            (1, _ts(2), 10, 1.0),   # re-delivery, 2 min later timestamp
            (2, _ts(5), 10, 2.0),
        ],
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    name = f"ddww_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    assert sorted(r.event_id for r in rows) == [1, 2]


def test_st6b_left_outer_interval_join_emits_unmatched_after_watermark(
    spark, tmp_path
):
    # Outer interval join: the unmatched left row may only be emitted
    # once the watermark PROVES no match can still arrive — which
    # happens on a later trigger. Two availableNow runs share a
    # checkpoint: run 1 emits the inner match, run 2 (new data pushes
    # the watermark far past the expiry) emits the unmatched view with
    # a null purchase.
    vsrc, psrc = str(tmp_path / "views"), str(tmp_path / "buys")
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    _write_batch(
        spark, vsrc, [(1, _ts(0), 10, 0.0), (2, _ts(0), 11, 0.0)]
    )
    _write_batch(spark, psrc, [(101, _ts(10), 10, 9.0)])

    from calorista_spark.streaming.incremental import stream_interval_join

    def run():
        views = spark.readStream.schema(EVENT_SCHEMA).parquet(vsrc).select(
            F.col("user_id").alias("k"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("vts"),
        )
        buys = spark.readStream.schema(EVENT_SCHEMA).parquet(psrc).select(
            F.col("user_id").alias("k"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("pts"),
        )
        joined = stream_interval_join(
            views, buys,
            key="k", left_ts="vts", right_ts="pts",
            upper="20 MINUTES", watermark="30 minutes", how="left_outer",
        ).select("view_id", "purchase_id")
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r.view_id, r.purchase_id)
            for r in spark.read.parquet(out).collect()
        }

    first = run()
    assert (1, 101) in first          # inner match emits immediately
    assert (2, None) not in first     # unmatched still buffered

    # far-future events on BOTH sources: the join's global watermark is
    # the MIN of the two input watermarks (multipleWatermarkPolicy=min),
    # so advancing only one side would hold the unmatched row forever
    far = _ts(0) + datetime.timedelta(hours=10)
    _write_batch(spark, vsrc, [(998, far, 98, 0.0)])
    _write_batch(spark, psrc, [(999, far, 99, 9.0)])
    second = run()
    assert (2, None) in second        # null-emission after watermark


def test_merge_cdc_batch_bootstrap_enforces_contract(spark, tmp_path):
    """r9: the bootstrap (empty-store) branch goes through the same
    merge_upsert_cdc operator, so a first batch carrying upsert-then-
    delete for one key resolves by seq order instead of keeping the
    upsert."""
    from pyspark.sql import functions as F

    from calorista_spark.streaming.incremental import (
        merge_cdc_batch_into_store,
    )

    store = str(tmp_path / "store")
    import os

    os.makedirs(store)
    batch = spark.createDataFrame(
        [
            (1, "a", "upsert", 1),
            (1, None, "delete", 2),   # same key, later delete wins
            (2, "b", "upsert", 1),
        ],
        ["k", "v", "op", "seq"],
    )
    merge_cdc_batch_into_store(batch, store, ["k"], seq_col="seq")
    got = {(r.k, r.v) for r in spark.read.parquet(store).collect()}
    assert got == {(2, "b")}
    # second batch merges against the bootstrapped store
    batch2 = spark.createDataFrame(
        [(2, None, "delete", 3), (3, "c", "upsert", 3)],
        ["k", "v", "op", "seq"],
    )
    merge_cdc_batch_into_store(batch2, store, ["k"], seq_col="seq")
    got2 = {(r.k, r.v) for r in spark.read.parquet(store).collect()}
    assert got2 == {(3, "c")}
