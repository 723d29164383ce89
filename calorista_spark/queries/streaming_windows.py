"""Windowed-aggregation queries (SURVEY §2.10 ST3/ST4) evaluated in
batch mode for the correctness gate — the streaming tests drive the
same helpers (``streaming/incremental.py``) through ``readStream``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.functions.numeric import quantized_sum
from calorista_spark.queries.registry import query
from calorista_spark.streaming.incremental import session_agg, sliding_agg, tumbling_agg

# ---------------------------------------------------------------------------
# ST3: tumbling 1-day windows == the dashboard's daily totals.
# ---------------------------------------------------------------------------

_TUMBLING_ORACLE = """
SELECT
  CAST(date_trunc('day', ts) AS TIMESTAMP)                    AS win_start,
  CAST(date_trunc('day', ts) + INTERVAL 1 DAY AS TIMESTAMP)   AS win_end,
  COUNT(*)                                                    AS n_events,
  CAST(SUM(CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
    / 10000.0                                                   AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1
"""


@query("events_tumbling_daily", _TUMBLING_ORACLE)
def events_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST3: tumbling window agg (streamlit_app.py:315-324's daily
    totals over an arriving stream)."""
    events = read_table(spark, sf_dir, "events")
    out = tumbling_agg(
        events,
        "ts",
        "1 day",
        [
            F.count(F.lit(1)).alias("n_events"),
            quantized_sum("value").alias("total_value"),
        ],
    )
    return out.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        "n_events",
        "total_value",
    ).orderBy("win_start")


# ---------------------------------------------------------------------------
# ST4a: sliding 7-day windows advancing daily (weekly trend restated).
# Oracle: every event belongs to the 7 windows starting at
# day(ts) - j, j ∈ [0, 6].
# ---------------------------------------------------------------------------

_SLIDING_ORACLE = """
WITH assigned AS (
  SELECT CAST(date_trunc('day', ts) - j * INTERVAL 1 DAY AS TIMESTAMP) AS win_start,
         value
  FROM events CROSS JOIN (SELECT unnest(range(0, 7)) AS j) offs
)
SELECT win_start,
       CAST(win_start + INTERVAL 7 DAY AS TIMESTAMP) AS win_end,
       COUNT(*)             AS n_events,
       CAST(SUM(CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         / 10000.0   AS total_value
FROM assigned
GROUP BY 1, 2
ORDER BY 1
"""


@query("events_sliding_7d", _SLIDING_ORACLE)
def events_sliding_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4a: sliding window agg — 7-day lookback recomputed daily."""
    events = read_table(spark, sf_dir, "events")
    out = sliding_agg(
        events,
        "ts",
        "7 days",
        "1 day",
        [
            F.count(F.lit(1)).alias("n_events"),
            quantized_sum("value").alias("total_value"),
        ],
    )
    return out.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        "n_events",
        "total_value",
    ).orderBy("win_start")


# ---------------------------------------------------------------------------
# ST4b: 30-minute session windows per user (meal-burst grouping).
# Oracle: gaps-and-islands — new session when the gap >= 30 min;
# session end = last event + 30 min (Spark session_window semantics).
# ---------------------------------------------------------------------------

_SESSION_ORACLE = """
WITH seq AS (
  SELECT user_id, ts, value, event_id,
         -- event_id tiebreak: under duplicate (user_id, ts) rows the
         -- lag/cumsum tie order is otherwise engine-arbitrary (r6
         -- stress audit); session_window itself is tie-robust
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR ts >= prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
  FROM seq
),
numbered AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id,
       CAST(MIN(ts) AS TIMESTAMP)                       AS session_start,
       CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP)  AS session_end,
       COUNT(*)                                         AS n_events,
       CAST(SUM(CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         / 10000.0                               AS total_value
FROM numbered
GROUP BY user_id, session_no
ORDER BY user_id, session_start
"""


@query("events_sessions_30min", _SESSION_ORACLE)
def events_sessions_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4b: session windows via ``session_window`` (native stateful
    operator in streaming; plain aggregation in batch)."""
    events = read_table(spark, sf_dir, "events")
    out = session_agg(
        events,
        "ts",
        "30 minutes",
        ["user_id"],
        [
            F.count(F.lit(1)).alias("n_events"),
            quantized_sum("value").alias("total_value"),
        ],
    )
    return out.select(
        "user_id",
        F.col("win.start").alias("session_start"),
        F.col("win.end").alias("session_end"),
        "n_events",
        "total_value",
    ).orderBy("user_id", "session_start")


# ---------------------------------------------------------------------------
# ST6: stream-stream interval join (view → purchase within 2 h),
# evaluated in batch mode for the oracle; the streaming test drives
# the same helper through readStream with watermarks on both sides.
# ---------------------------------------------------------------------------

_INTERVAL_JOIN_ORACLE = """
SELECT v.user_id,
       v.event_id AS view_id,
       p.event_id AS purchase_id,
       date_diff('microsecond', v.ts, p.ts) AS lag_micros
FROM events v
JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 2 HOUR
ORDER BY v.user_id, view_id, purchase_id
"""


@query("view_purchase_within_2h", _INTERVAL_JOIN_ORACLE)
def view_purchase_within_2h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6: purchase-follows-view attribution within 2 hours — the
    interval equi-join shape whose streaming form
    (``streaming.incremental.stream_interval_join``) keeps bounded
    state via two-sided watermarks. The key condition is an equi-join
    on user_id, so Catalyst plans a hash join with the time bound as a
    post-join filter (not a nested-loop cross product)."""
    ev = read_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("event_id").alias("view_id"), F.col("ts")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    cond = (
        (views["user_id"] == buys["p_user_id"])
        & (buys["p_ts"] > views["ts"])
        & (buys["p_ts"] <= views["ts"] + F.expr("INTERVAL 2 HOURS"))
    )
    return (
        views.join(buys, cond, "inner")
        .select(
            "user_id",
            "view_id",
            "purchase_id",
            F.expr("timestampdiff(MICROSECOND, ts, p_ts)").alias("lag_micros"),
        )
        .orderBy("user_id", "view_id", "purchase_id")
    )


_UNCONVERTED_ORACLE = """
SELECT v.user_id,
       v.event_id AS view_id,
       CAST(p.event_id IS NOT NULL AS BOOLEAN) AS converted
FROM events v
LEFT JOIN events p
  ON v.user_id = p.user_id
 AND p.event_type = 'purchase'
 AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 2 HOUR
WHERE v.event_type = 'view'
ORDER BY v.user_id, view_id, converted
"""


@query("view_purchase_unconverted", _UNCONVERTED_ORACLE)
def view_purchase_unconverted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6b: LEFT OUTER interval join — every view row, flagged by
    whether ANY purchase followed within 2 h (unmatched views survive
    with nulls). The streaming twin is
    ``stream_interval_join(..., how='left_outer')``, where Spark emits
    the unmatched side only after the watermark proves no match can
    still arrive; in batch the same helper degenerates to this plan.
    Equi-join on user_id + post-join time filter, so no cross
    product; one row per (view, matching purchase) before the
    projection keeps the oracle comparable row-for-row."""
    ev = read_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("event_id").alias("view_id"), F.col("ts")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    cond = (
        (views["user_id"] == buys["p_user_id"])
        & (buys["p_ts"] > views["ts"])
        & (buys["p_ts"] <= views["ts"] + F.expr("INTERVAL 2 HOURS"))
    )
    return (
        views.join(buys, cond, "left_outer")
        .select(
            "user_id",
            "view_id",
            F.col("purchase_id").isNotNull().alias("converted"),
        )
        .orderBy("user_id", "view_id", "converted")
    )
