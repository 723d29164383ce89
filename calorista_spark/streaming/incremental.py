"""Incremental ingest + windowed aggregation (SURVEY §2.10).

The reference's incremental sync (main.py:146-161, README "Incremental
Updates") restated on Structured Streaming:

- ST1: ``readStream`` source → ``foreachBatch`` MERGE into the store.
- ST2: exactly-once dedup = ``withWatermark`` + ``dropDuplicates`` —
  the fingerprint set (main.py:96-105) with *bounded* state.
- ST3/ST4: tumbling / sliding / session windows replace the dashboard's
  calendar-bucket groupbys.
- ST5: late data tolerated up to the watermark (the reference re-polls
  the whole range; we bound it).

All window helpers work in BATCH mode too (Spark evaluates
``window()``/``session_window()`` on static frames) — that's how the
correctness gate checks them against SQL oracles, while the streaming
tests drive the same helpers through ``readStream``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from calorista_spark.operators.merge import merge_upsert


def read_events_stream(spark, sf_dir: str) -> DataFrame:
    """Structured-Streaming source over the events table directory,
    applying the same ``ts``-layout handling as the batch catalog
    (``catalog._read_events``): TIMESTAMP(MICROS) files stream straight
    through as TIMESTAMP_NTZ; legacy TIMESTAMP(NANOS) files stream as
    nanos-as-long and get the rebuilt TIMESTAMP_NTZ, so every window
    helper below works identically in both modes.

    The layout is sniffed from a zero-job batch read of the same file
    (footer only — no data scan), since a stream source needs its
    schema declared up front."""
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    footer = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_is_nanos_long = dict(footer.dtypes).get("ts") == "bigint"
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField(
                "ts",
                T.LongType() if ts_is_nanos_long else T.TimestampNTZType(),
            ),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    # file-stream sources require a directory: stream the sf dir and
    # glob-filter down to the events file
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if not ts_is_nanos_long:
        return raw
    return raw.withColumn(
        "ts",
        F.convert_timezone(
            None, F.lit("UTC"), F.timestamp_micros(F.expr("ts div 1000"))
        ),
    )


def watermarked_dedup(
    stream: DataFrame, keys: list[str], ts_col: str, delay: str = "48 hours"
) -> DataFrame:
    """ST2: exactly-once fingerprint dedup with bounded state. The
    watermark bounds how long a fingerprint is remembered — the price
    of not holding the reference's unbounded in-memory set.

    ``dropDuplicates(keys)`` only evicts state via the watermark when
    the event-time column is part of the dedup subset; for key-only
    dedup the bounded-state form is ``dropDuplicatesWithinWatermark``,
    which expires a key once the watermark passes its first-seen event
    time. Batch frames fall back to plain ``dropDuplicates`` (the
    within-watermark variant is streaming-only).
    """
    if not stream.isStreaming:
        return stream.dropDuplicates(keys)
    wm = stream.withWatermark(ts_col, delay)
    if ts_col in keys:
        return wm.dropDuplicates(keys)
    return wm.dropDuplicatesWithinWatermark(keys)


def tumbling_agg(
    df: DataFrame, ts_col: str, duration: str, aggs: list[Column], extra_keys=()
) -> DataFrame:
    """ST3: tumbling window aggregation (daily totals when
    duration='1 day')."""
    return df.groupBy(F.window(ts_col, duration).alias("win"), *extra_keys).agg(*aggs)


def sliding_agg(
    df: DataFrame, ts_col: str, duration: str, slide: str, aggs: list[Column]
) -> DataFrame:
    """ST4a: sliding windows (weekly trend, recomputed daily)."""
    return df.groupBy(F.window(ts_col, duration, slide).alias("win")).agg(*aggs)


def session_agg(
    df: DataFrame, ts_col: str, gap: str, keys: list[str], aggs: list[Column]
) -> DataFrame:
    """ST4b: session windows (meal-burst grouping): a session closes
    after ``gap`` of inactivity; window end = last event + gap."""
    return df.groupBy(F.session_window(ts_col, gap).alias("win"), *keys).agg(*aggs)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    upper: str,
    watermark: str = "4 hours",
    how: str = "inner",
) -> DataFrame:
    """ST6: stream-stream join with a time-interval condition —
    "right event follows left event on the same key within ``upper``"
    (view→purchase attribution). Both sides carry watermarks so the
    join state is bounded: a buffered left row can be dropped once
    event time passes left_ts + upper + watermark.

    ``how='left_outer'`` emits unmatched left rows with nulls — in
    streaming mode Spark holds them until the watermark proves no
    match can still arrive (the "views that never converted" query);
    the interval condition supplies the state bound both modes need.

    Works identically in batch mode (watermarks are no-ops there),
    which is how the oracle gate checks the semantics; the streaming
    tests drive the same helper through readStream on both sides.
    """
    l_wm = left.withWatermark(left_ts, watermark)
    r_wm = right.withWatermark(right_ts, watermark)
    cond = (
        (l_wm[key] == r_wm[key])
        & (r_wm[right_ts] > l_wm[left_ts])
        & (r_wm[right_ts] <= l_wm[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    return l_wm.join(r_wm, cond, how)


def running_totals_with_state(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` (the
    SURVEY §2.10 escape hatch for semantics no built-in window has):
    per-key running totals that survive across micro-batches.

    State = (n_events, total) per key; timeout cleans up idle keys so
    state stays bounded (the 100 TB requirement for any keyed state).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({"key": [key[0]], "n_events": [n], "total": [total]})

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def merge_batch_into_store(
    batch: DataFrame, store_path: str, keys: list[str]
) -> None:
    """One micro-batch of the ST1 MERGE: the engine's join-based
    upsert against the current parquet store, atomically replacing it.
    IDEMPOTENT per batch (re-merging the same rows is a no-op upsert),
    which is what makes foreachBatch + checkpoint exactly-once across
    crash/restart — proved by scale_smoke.py's restart section. Module
    level so failure-injection harnesses can wrap it without forking
    the merge logic."""
    spark = batch.sparkSession
    import os

    if any(
        f.endswith(".parquet") or f == "_SUCCESS"
        for f in (os.listdir(store_path) if os.path.isdir(store_path) else [])
    ):
        target = spark.read.parquet(store_path)
        merged = merge_upsert(target, batch.select(*target.columns), keys)
    else:
        merged = batch
    # localCheckpoint materializes BEFORE the overwrite truncates
    # the input path (read-overwrite hazard of the parquet fallback;
    # Delta MERGE has no such step).
    merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(store_path)


def merge_cdc_batch_into_store(
    batch: DataFrame,
    store_path: str,
    keys: list[str],
    op_col: str = "op",
    seq_col: str | None = None,
) -> None:
    """One micro-batch of the CDC MERGE (r8): applies upserts AND
    tombstone deletes against the parquet store via
    :func:`operators.merge.merge_upsert_cdc`. IDEMPOTENT per batch —
    re-upserting is a no-op replace, re-deleting an absent key is a
    no-op — so foreachBatch + checkpoint is exactly-once across
    crash/restart exactly like the insert/update-only path.

    r9: the one-row-per-key-per-batch contract is enforced by the
    operator — pass ``seq_col`` (the CDC sequence/ts column) to reduce
    a multi-op micro-batch to the latest op per key; without it a
    duplicate key fails the batch (and the checkpoint replays it)
    rather than applying ops in an undefined order. The bootstrap
    branch (empty store) goes through the SAME operator against an
    empty target so the contract holds from the first batch."""
    from calorista_spark.operators.merge import merge_upsert_cdc

    spark = batch.sparkSession
    import os

    data_cols = [c for c in batch.columns if c != op_col and c != seq_col]
    if any(
        f.endswith(".parquet") or f == "_SUCCESS"
        for f in (os.listdir(store_path) if os.path.isdir(store_path) else [])
    ):
        target = spark.read.parquet(store_path)
    else:
        target = batch.select(*data_cols).limit(0)
    merged = merge_upsert_cdc(
        target,
        batch.select(*data_cols, op_col, *([seq_col] if seq_col else [])),
        keys,
        op_col=op_col,
        seq_col=seq_col,
    )
    merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(
        store_path
    )


def start_incremental_cdc_merge(
    stream: DataFrame,
    store_path: str,
    keys: list[str],
    checkpoint: str,
    op_col: str = "op",
    seq_col: str | None = None,
    trigger_available_now: bool = True,
    on_batch=None,
):
    """ST1 + deletes: foreachBatch CDC MERGE into a parquet store —
    the streaming twin of the ``merge_cdc_events`` query (on Delta:
    ``WHEN MATCHED AND s.op='delete' THEN DELETE``). Same checkpoint /
    exactly-once orchestration as :func:`start_incremental_merge`;
    ``on_batch`` is the failure-injection seam for the restart smoke.
    ``seq_col`` forwards to the per-batch latest-op-per-key reduce."""

    def _merge_batch(batch: DataFrame, batch_id: int) -> None:
        if on_batch is not None:
            on_batch(batch_id)
        merge_cdc_batch_into_store(
            batch, store_path, keys, op_col=op_col, seq_col=seq_col
        )

    writer = stream.writeStream.foreachBatch(_merge_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_incremental_merge(
    stream: DataFrame,
    store_path: str,
    keys: list[str],
    checkpoint: str,
    trigger_available_now: bool = True,
    on_batch=None,
):
    """ST1: foreachBatch MERGE into a parquet store.

    Each micro-batch runs :func:`merge_batch_into_store`. On Delta
    deployments the body becomes a real ``MERGE INTO`` and the rewrite
    disappears; the orchestration (checkpointing, exactly-once batch
    ids) is identical. ``on_batch(batch_id)``, when given, runs before
    each merge — the failure-injection seam the checkpoint-restart
    smoke uses to crash a specific micro-batch.
    """

    def _merge_batch(batch: DataFrame, batch_id: int) -> None:
        if on_batch is not None:
            on_batch(batch_id)
        merge_batch_into_store(batch, store_path, keys)

    writer = stream.writeStream.foreachBatch(_merge_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
