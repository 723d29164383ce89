"""Time-series queries over the events table: resampling,
sessionization, LOCF gap-fill, histograms, cohort splits.

These generalize the reference's trend sections
(streamlit_app.py:378-602 — daily/weekly/monthly calendar buckets) to
the full time-series surface; the batch sessionization twin of the
streaming session_window (ST4) makes the two paths cross-checkable.

Determinism: timestamps compare/bucket with exact interval arithmetic;
durations are whole microseconds (both engines load micros — natively
for the current testdata, via the legacy nanos repair otherwise — so
the diff is exact); every averaged double rounds to 4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.operators.timeseries import (
    date_spine,
    fixed_width_histogram,
    locf_gapfill,
    resample,
    sessionize,
)
from calorista_spark.functions.numeric import quantized_sum
from calorista_spark.queries.registry import query

# ---------------------------------------------------------------------------
# Hourly downsample — the resolution ladder below the daily totals.
# ---------------------------------------------------------------------------

_HOURLY_ORACLE = """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
       COUNT(*) AS n_events,
       FLOOR(SUM(CAST(FLOOR(value * 10000.0 + 0.5) AS HUGEINT)) * 1.0
             / COUNT(*) + 0.5) / 10000.0 AS avg_value,
       CAST(SUM(CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         / 10000.0 AS total_value
FROM events
GROUP BY 1
ORDER BY 1
"""


@query("events_hourly_resample", _HOURLY_ORACLE)
def events_hourly_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample to hourly buckets — one groupBy whose key count is
    bounded by the time range (720 buckets/month at any data scale)."""
    ev = read_table(spark, sf_dir, "events")
    out = resample(
        ev,
        "ts",
        "hour",
        {
            "n_events": F.count(F.lit(1)),
            # deterministic divided average: exact scaled-int sum /
            # count, then FLOOR — raw AVG's last-ulp accumulation noise
            # crossed the round boundary on the r6 stress dataset
            "avg_value": F.floor(
                F.sum(
                    F.floor(F.col("value") * 10000.0 + F.lit(0.5)).cast(
                        "long"
                    )
                )
                / F.count(F.lit(1))
                + F.lit(0.5)
            )
            / 10000.0,
            "total_value": quantized_sum("value"),
        },
    )
    return out.orderBy("bucket")


# ---------------------------------------------------------------------------
# Batch sessionization — 12 h inactivity gap (the events table has
# ~67 events/user/month, so 30 min would make every event its own
# session). Per-session rollup.
# ---------------------------------------------------------------------------

_SESSIONS_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts > lag(ts) OVER w + INTERVAL 12 HOUR THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, event_id,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       CAST(MIN(ts) AS TIMESTAMP) AS session_start,
       CAST(MAX(ts) AS TIMESTAMP) AS session_end,
       date_diff('microsecond', CAST(MIN(ts) AS TIMESTAMP),
                 CAST(MAX(ts) AS TIMESTAMP)) AS duration_micros
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


@query("user_sessions_batch", _SESSIONS_ORACLE)
def user_sessions_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (12 h gap): one shuffle-sort on
    (user_id, ts); the session id is a running boundary-flag sum, the
    batch twin of streaming session_window (ST4)."""
    ev = read_table(spark, sf_dir, "events")
    sess = sessionize(
        ev, ["user_id"], "ts", gap="INTERVAL 12 HOURS", tiebreak=["event_id"]
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.expr("timestampdiff(MICROSECOND, min(ts), max(ts))").alias(
                "duration_micros"
            ),
        )
        .orderBy("user_id", "session_id")
    )


# ---------------------------------------------------------------------------
# LOCF gap-fill over a dense (user × day) spine.
# ---------------------------------------------------------------------------

_LOCF_ORACLE = """
WITH days AS (
  SELECT CAST(r AS DATE) AS day
  FROM range(DATE '2024-01-01', DATE '2024-01-31', INTERVAL 1 DAY) t(r)
),
users AS (SELECT DISTINCT user_id FROM events),
daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         FLOOR(SUM(CAST(FLOOR(value * 10000.0 + 0.5) AS HUGEINT)) * 1.0
               / COUNT(*) + 0.5) / 10000.0 AS day_avg
  FROM events GROUP BY 1, 2
)
SELECT s.user_id, s.day,
       FLOOR(last_value(d.day_avg IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 10000 + 0.5)
         / 10000 AS value_filled
FROM (SELECT u.user_id, dy.day FROM users u CROSS JOIN days dy) s
LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
ORDER BY s.user_id, s.day
"""
# NB: value_filled quantizes via FLOOR(x*1e4 + 0.5)/1e4 (identical
# IEEE ops both engines): carried day averages hit round-half
# boundaries at sf0.1 where engine ROUNDs disagree by 1 ulp.


@query("events_locf_gapfill", _LOCF_ORACLE)
def events_locf_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense (user × day) spine with last-observation-carried-forward;
    days before a user's first event stay null (the null-not-zero
    spine policy, SURVEY §7). Spine rows = users × days — linear in
    keys, independent of event count."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(
        # deterministic divided average (see _HOURLY_ORACLE note): the
        # carried value must be identical in both engines BEFORE the
        # display quantize, or LOCF propagates a 1-ulp divergence
        (
            F.floor(
                F.sum(
                    F.floor(F.col("value") * 10000.0 + F.lit(0.5)).cast(
                        "long"
                    )
                )
                / F.count(F.lit(1))
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("day_avg")
    )
    users = ev.select("user_id").distinct()
    spine = date_spine(spark, "2024-01-01", "2024-01-30")
    filled = locf_gapfill(
        daily, spine, users, ["user_id"], "day", "day_avg", "locf"
    )
    return filled.select(
        "user_id",
        "day",
        # floor-quantized, not ROUND: see the oracle's NB comment
        (F.floor(F.col("locf") * 10000 + 0.5) / 10000).alias("value_filled"),
    ).orderBy("user_id", "day")


# ---------------------------------------------------------------------------
# Fixed-width histogram — the no-join twin of events_value_buckets.
# ---------------------------------------------------------------------------

_HISTOGRAM_ORACLE = """
SELECT CAST(FLOOR(value / 25) AS INTEGER) * 25 AS bucket_lo,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         / 10000.0 AS total_value
FROM events
GROUP BY 1
ORDER BY 1
"""


@query("events_value_histogram", _HISTOGRAM_ORACLE)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram via pure column arithmetic — no
    bucket table, no join; contrast events_value_buckets (J5), which
    computes the same shape with a broadcast range join."""
    ev = read_table(spark, sf_dir, "events")
    return fixed_width_histogram(
        ev,
        "value",
        25.0,
        {
            "n_events": F.count(F.lit(1)),
            "total_value": quantized_sum("value"),
        },
    ).orderBy("bucket_lo")


# ---------------------------------------------------------------------------
# Top-3 events per user by value (dense_rank — keeps ties).
# ---------------------------------------------------------------------------

_TOP3_ORACLE = """
SELECT user_id, event_id, ROUND(value, 4) AS value, rnk
FROM (
  SELECT user_id, event_id, value,
         CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY value DESC) AS BIGINT) AS rnk
  FROM events
)
WHERE rnk <= 3
ORDER BY user_id, rnk, event_id
"""


@query("top3_user_events_dense_rank", _TOP3_ORACLE)
def top3_user_events_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank top-3 per user — rank semantics (ties share a rank
    and all qualify), complementing row_number (W1) and ntile."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc())
    return (
        ev.withColumn("rnk", F.dense_rank().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("user_id", "event_id", F.round("value", 4).alias("value"), "rnk")
        .orderBy("user_id", "rnk", "event_id")
    )


# ---------------------------------------------------------------------------
# New vs returning users per day (first-seen cohort split).
# ---------------------------------------------------------------------------

_NEW_RETURNING_ORACLE = """
WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
f AS (SELECT user_id, day, MIN(day) OVER (PARTITION BY user_id) AS first_day FROM d)
SELECT day,
       CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
       CAST(SUM(CASE WHEN day > first_day THEN 1 ELSE 0 END) AS BIGINT) AS returning_users
FROM f GROUP BY day ORDER BY day
"""


@query("daily_new_vs_returning", _NEW_RETURNING_ORACLE)
def daily_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day split of active users into first-seen vs returning —
    dedup to (user, day), min-over-user window, conditional count."""
    ev = read_table(spark, sf_dir, "events")
    d = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    w = Window.partitionBy("user_id")
    f = d.withColumn("first_day", F.min("day").over(w))
    return (
        f.groupBy("day")
        .agg(
            F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
            .cast("long")
            .alias("new_users"),
            F.sum(F.when(F.col("day") > F.col("first_day"), 1).otherwise(0))
            .cast("long")
            .alias("returning_users"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Cumulative distinct users by day (adoption curve).
# ---------------------------------------------------------------------------

_CUMULATIVE_ORACLE = """
WITH fd AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY 1),
per AS (SELECT first_day AS day, COUNT(*) AS new_users FROM fd GROUP BY 1)
SELECT day, CAST(new_users AS BIGINT) AS new_users,
       CAST(SUM(new_users) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
FROM per ORDER BY day
"""


@query("cumulative_new_users", _CUMULATIVE_ORACLE)
def cumulative_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-distinct-users curve without a running COUNT
    DISTINCT: reduce each user to a first-seen day, then running-sum
    the per-day counts — the scale-safe restatement."""
    ev = read_table(spark, sf_dir, "events")
    fd = ev.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("first_day"))
    per = fd.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        per.withColumn("cum_users", F.sum("new_users").over(w))
        .select("day", "new_users", "cum_users")
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Trailing-window anomaly detection over the daily value series.
# ---------------------------------------------------------------------------

_ANOMALY_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 1e4 + 0.5) AS HUGEINT)) AS DOUBLE) / 1e4
           AS total_value
  FROM events GROUP BY 1
),
w AS (
  SELECT day, total_value,
         AVG(total_value) OVER
           (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS m7,
         STDDEV_SAMP(total_value) OVER
           (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS s7,
         COUNT(*) OVER
           (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS n7
  FROM daily
),
z AS (
  SELECT day, total_value,
         CASE WHEN n7 >= 3 AND s7 > 0
              THEN FLOOR((total_value - m7) / s7 * 1e4 + 0.5) / 1e4 END AS z
  FROM w
)
SELECT day, total_value, z,
       CAST(CASE WHEN z IS NOT NULL AND ABS(z) >= 2.0 THEN 1 ELSE 0 END
            AS INTEGER) AS is_anomaly
FROM z
ORDER BY day
"""


@query("events_daily_anomaly_flags", _ANOMALY_ORACLE)
def events_daily_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: each day's total value
    z-scored against the previous ≤7 days (never including itself);
    |z| ≥ 2 flags the day. Daily totals are quantized sums (exact,
    partition-order-invariant); the z is FLOOR-quantized and the flag
    derives from the QUANTIZED z, so both engines flag identically.
    The day-ordered window is partition-less over O(days) rows —
    bounded, same class as cumulative_new_users."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        (
            F.sum(
                F.floor(F.col("value") * 1e4 + F.lit(0.5)).cast("long")
            ).cast("double")
            / 1e4
        ).alias("total_value")
    )
    w = Window.orderBy("day").rowsBetween(-7, -1)
    z_raw = (F.col("total_value") - F.avg("total_value").over(w)) / F.stddev_samp(
        "total_value"
    ).over(w)
    base = daily.select(
        "day",
        "total_value",
        F.when(
            (F.count(F.lit(1)).over(w) >= 3)
            & (F.stddev_samp("total_value").over(w) > 0),
            F.floor(z_raw * 1e4 + F.lit(0.5)) / 1e4,
        ).alias("z"),
    )
    return base.select(
        "day",
        "total_value",
        "z",
        F.when(F.col("z").isNotNull() & (F.abs("z") >= 2.0), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_anomaly"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Exponentially weighted moving average over the daily series.
# ---------------------------------------------------------------------------

_EWMA_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 1e4 + 0.5) AS HUGEINT)) AS DOUBLE) / 1e4
           AS total_value
  FROM events GROUP BY 1
),
r AS (
  SELECT day, total_value,
         row_number() OVER (ORDER BY day) AS rn
  FROM daily
),
s AS (
  SELECT day, total_value,
         SUM(total_value * power(0.7, -rn)) OVER
           (ORDER BY rn ROWS UNBOUNDED PRECEDING) AS num,
         SUM(power(0.7, -rn)) OVER
           (ORDER BY rn ROWS UNBOUNDED PRECEDING) AS den
  FROM r
)
SELECT day, total_value,
       FLOOR(num / den * 1e4 + 0.5) / 1e4 AS ewma
FROM s
ORDER BY day
"""


@query("events_daily_ewma", _EWMA_ORACLE)
def events_daily_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA (α=0.3, adjust-normalized: s_t = Σ(1-α)^(t-i)·x_i /
    Σ(1-α)^(t-i)) in CLOSED FORM — two windowed sums of pre-scaled
    terms whose common (1-α)^t factor cancels in the ratio, so no
    recursive/sequential dependency exists in the plan. Both engines
    fold the window in day order → bit-identical doubles; output
    FLOOR-quantized. The (1-α)^(-rn) rescaling grows with series
    length (0.7^-31 ≈ 6e4 here — fine for O(days) windows; a years-
    long horizon would chunk + renormalize)."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        (
            F.sum(
                F.floor(F.col("value") * 1e4 + F.lit(0.5)).cast("long")
            ).cast("double")
            / 1e4
        ).alias("total_value")
    )
    # O(days)-bounded global windows — cumulative_new_users class
    w_rn = Window.orderBy("day")
    r = daily.withColumn("rn", F.row_number().over(w_rn))
    w_cum = Window.orderBy("rn").rowsBetween(Window.unboundedPreceding, 0)
    num = F.sum(F.col("total_value") * F.pow(F.lit(0.7), -F.col("rn"))).over(
        w_cum
    )
    den = F.sum(F.pow(F.lit(0.7), -F.col("rn"))).over(w_cum)
    return r.select(
        "day",
        "total_value",
        (F.floor(num / den * 1e4 + F.lit(0.5)) / 1e4).alias("ewma"),
    ).orderBy("day")


# Long-horizon variant (r7 verdict item): the closed form above
# rescales by (1-α)^(-rn), which overflows double around rn≈2000. The
# block-renormalized decomposition below bounds every exponent by
# O(block), so the operator survives multi-year spines; the oracle
# writes the SAME expression tree in SQL (same block split, same
# in-block cumulative, same Horner carry) so both engines fold
# identical IEEE ops — naive-vs-blocked would differ in final ulps
# and flip FLOOR boundaries.
_LH_BLOCK = 50
_LH_QL = repr(0.7**_LH_BLOCK)  # python-computed constant, shared verbatim

_EWMA_LH_ORACLE = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 1e4 + 0.5) AS HUGEINT)) AS DOUBLE) / 1e4
           AS total_value
  FROM events GROUP BY 1
),
rb AS (
  SELECT day, total_value,
         (row_number() OVER (ORDER BY day) - 1) // {_LH_BLOCK} AS b,
         CAST((row_number() OVER (ORDER BY day) - 1) % {_LH_BLOCK} AS INTEGER)
           AS r
  FROM daily
),
s AS (
  SELECT day, total_value, b, r,
         SUM(total_value * power(0.7, -r)) OVER
           (PARTITION BY b ORDER BY r ROWS UNBOUNDED PRECEDING) AS s_num,
         SUM(power(0.7, -r)) OVER
           (PARTITION BY b ORDER BY r ROWS UNBOUNDED PRECEDING) AS s_den
  FROM rb
),
blocks AS (SELECT b AS j, s_num, s_den FROM s WHERE r = {_LH_BLOCK - 1}),
carries AS (
  SELECT j + 1 AS b,
         s_num + {_LH_QL} * (COALESCE(lag(s_num, 1) OVER (ORDER BY j), 0.0)
           + {_LH_QL} * (COALESCE(lag(s_num, 2) OVER (ORDER BY j), 0.0)
             + {_LH_QL} * COALESCE(lag(s_num, 3) OVER (ORDER BY j), 0.0)))
           AS c_num,
         s_den + {_LH_QL} * (COALESCE(lag(s_den, 1) OVER (ORDER BY j), 0.0)
           + {_LH_QL} * (COALESCE(lag(s_den, 2) OVER (ORDER BY j), 0.0)
             + {_LH_QL} * COALESCE(lag(s_den, 3) OVER (ORDER BY j), 0.0)))
           AS c_den
  FROM blocks
)
SELECT day, total_value,
       FLOOR((power(0.7, r) * s_num
              + power(0.7, r + {_LH_BLOCK}) * COALESCE(c_num, 0.0))
             / (power(0.7, r) * s_den
                + power(0.7, r + {_LH_BLOCK}) * COALESCE(c_den, 0.0))
             * 1e4 + 0.5) / 1e4 AS ewma
FROM s LEFT JOIN carries USING (b)
ORDER BY day
"""


@query("events_daily_ewma_longhorizon", _EWMA_LH_ORACLE)
def events_daily_ewma_longhorizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA (α=0.3, adjust-normalized) over the daily series via the
    HORIZON-SAFE block-renormalized closed form
    (operators/windows.py ewma_adjusted_longhorizon): exponents are
    bounded by O(block), so a multi-year (or multi-decade) spine
    cannot overflow — pinned against pandas ``ewm`` at 5,000 days in
    tests. Same semantics as events_daily_ewma (identical output on
    any sub-2000-day series up to final-ulp quantization); both kept
    registered because the r6 query is the simpler exact anchor and
    this is the production path."""
    from calorista_spark.operators.windows import ewma_adjusted_longhorizon

    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        (
            F.sum(
                F.floor(F.col("value") * 1e4 + F.lit(0.5)).cast("long")
            ).cast("double")
            / 1e4
        ).alias("total_value")
    )
    out = ewma_adjusted_longhorizon(
        daily, "day", "total_value", out_col="__raw", alpha=0.3, block=_LH_BLOCK
    )
    return out.select(
        "day",
        "total_value",
        (F.floor(F.col("__raw") * 1e4 + F.lit(0.5)) / 1e4).alias("ewma"),
    ).orderBy("day")
