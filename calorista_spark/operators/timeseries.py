"""Time-series operators: resampling, sessionization, gap-fill (LOCF),
fixed-width histograms, first-seen cohort splits.

Generalizes the reference's calendar-bucket trend sections
(streamlit_app.py:378-602: daily/weekly/monthly groupbys over an event
log) into the reusable time-series surface a 100 TB event pipeline
needs. All operators are single-shuffle window/groupBy compositions —
no Python UDFs, no driver-side iteration:

- resample: one groupBy on the truncated timestamp (map-side partial
  aggregation; the shuffle key is the bucket, so cardinality is bounded
  by the time range, not the row count).
- sessionize: one shuffle-sort per (key, ts); the session id is a
  running sum over the boundary flags, so state never leaves the
  window operator (the batch twin of session_window in streaming).
- locf_gapfill: spine × keys is built from ``sequence``/``explode``
  (no driver loop) and the carry is last-ignore-nulls over one
  ordered window — the same pattern as the as-of join (operators/joins).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample(
    df: DataFrame, ts_col: str, unit: str, aggs: dict[str, Column]
) -> DataFrame:
    """Downsample an event stream to fixed calendar buckets.

    ``unit`` is any ``date_trunc`` unit ('hour', 'day', 'week', ...).
    Returns one row per non-empty bucket with the given aggregates.

    ``date_trunc`` yields TIMESTAMP (session-zoned) even for an NTZ
    input; the cast back to NTZ round-trips through the session zone,
    so the bucket keeps the input's wall clock under ANY driver
    timezone.
    """
    bucket = F.date_trunc(unit, F.col(ts_col)).cast("timestamp_ntz").alias("bucket")
    return df.groupBy(bucket).agg(*[c.alias(n) for n, c in aggs.items()])


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap: str = "INTERVAL 12 HOURS",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Assign batch session ids: a new session starts when the gap to
    the previous event (per key) exceeds ``gap``.

    The boundary test compares raw timestamps (``ts > prev + gap``) —
    interval arithmetic is exact, so there is no truncation ambiguity
    at the threshold. ``tiebreak`` columns make the within-key order
    total when timestamps can collide.

    Adds ``session_id`` (1-based per key). One shuffle on ``keys``.
    """
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.col(ts_col) > prev_ts + F.expr(gap)), 1
    ).otherwise(0)
    running = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_id", F.sum(is_new).over(running))


def date_spine(spark, start: str, end: str) -> DataFrame:
    """One row per day in [start, end] — the densify spine (O-R2)
    built executor-side from ``sequence``; no driver loop."""
    return spark.sql(
        f"SELECT explode(sequence(DATE'{start}', DATE'{end}')) AS day"
    )


def locf_gapfill(
    keyed_daily: DataFrame,
    spine: DataFrame,
    keys_df: DataFrame,
    key_cols: Sequence[str],
    day_col: str,
    value_col: str,
    out_col: str,
) -> DataFrame:
    """Left-align per-key daily values onto a dense (key × day) spine
    and carry the last observation forward over gaps.

    Days before a key's first observation stay null — the engine's
    null-not-zero spine policy (SURVEY §7). One window shuffle on
    ``key_cols``.
    """
    grid = keys_df.crossJoin(spine)
    joined = grid.join(keyed_daily, [*key_cols, day_col], "left")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.withColumn(out_col, F.last(value_col, ignorenulls=True).over(w))


def fixed_width_histogram(
    df: DataFrame, col: str, width: float, aggs: dict[str, Column]
) -> DataFrame:
    """Fixed-width histogram: bucket = floor(col / width). Pure
    column arithmetic — no join (contrast events_value_buckets, which
    demonstrates the range-join form of the same analysis)."""
    lo = (F.floor(F.col(col) / F.lit(width)).cast("int") * int(width)).alias(
        "bucket_lo"
    )
    return (
        df.withColumn("bucket_lo", lo)
        .groupBy("bucket_lo")
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )
