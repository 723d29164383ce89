"""Product-analytics shapes over the events stream: activity streaks
(gaps-and-islands) and step-windowed funnel conversion — the
aggregation patterns the reference's trend dashboard
(streamlit_app.py:378-602) grows into once events carry behavior.

Scale shape: streaks are one shuffle-sort per user partition
(window + groupBy on the derived island anchor); the funnel is a
chain of per-user min-aggregations, each a keyed shuffle joined
narrowly onto the previous stage — no self-cross-products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.queries.registry import query

# ---------------------------------------------------------------------------
# Gaps-and-islands: per-user consecutive-active-day streaks.
# ---------------------------------------------------------------------------

_STREAKS_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
grp AS (
  SELECT user_id, day,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                    AS INTEGER) AS anchor
  FROM days
),
streaks AS (
  SELECT user_id, MIN(day) AS streak_start, MAX(day) AS streak_end,
         CAST(COUNT(*) AS BIGINT) AS streak_days
  FROM grp GROUP BY user_id, anchor
)
SELECT user_id, CAST(streak_start AS DATE) AS streak_start,
       CAST(streak_end AS DATE) AS streak_end, streak_days
FROM streaks
ORDER BY user_id, streak_start
"""


@query("user_activity_streaks", _STREAKS_ORACLE)
def user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-day activity streaks via the gaps-and-islands
    anchor trick: day minus its per-user rank is constant within a
    consecutive run. One window sort + one groupBy, both partitioned
    by user — no joins, no explode."""
    ev = read_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = days.withColumn(
        "anchor", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    return (
        grp.groupBy("user_id", "anchor")
        .agg(
            F.min("day").alias("streak_start"),
            F.max("day").alias("streak_end"),
            F.count(F.lit(1)).alias("streak_days"),
        )
        .select("user_id", "streak_start", "streak_end", "streak_days")
        .orderBy("user_id", "streak_start")
    )


# ---------------------------------------------------------------------------
# Step-windowed funnel: first view → click within 24 h → purchase
# within 24 h of the click.
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH stage1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
stage2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN stage1 s ON e.user_id = s.user_id
  WHERE e.event_type = 'click' AND e.ts > s.t1
    AND e.ts <= s.t1 + INTERVAL 24 HOUR
  GROUP BY e.user_id
),
stage3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN stage2 s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s.t2
    AND e.ts <= s.t2 + INTERVAL 24 HOUR
  GROUP BY e.user_id
)
SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM stage1
UNION ALL
SELECT '2_click_24h', CAST(COUNT(*) AS BIGINT) FROM stage2
UNION ALL
SELECT '3_purchase_24h', CAST(COUNT(*) AS BIGINT) FROM stage3
ORDER BY stage
"""


@query("user_funnel_conversion", _FUNNEL_ORACLE)
def user_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-stage funnel with 24 h step windows. Each stage is a
    per-user min over a filtered scan joined to the previous stage's
    (user, ts) — stage frames shrink monotonically, so the chain costs
    three keyed shuffles of decreasing size, never a cross product."""
    ev = read_table(spark, sf_dir, "events")

    def stage(prev: DataFrame | None, etype: str, out_ts: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == etype)
        if prev is None:
            return e.groupBy("user_id").agg(F.min("ts").alias(out_ts))
        prev_ts = prev.columns[-1]
        return (
            e.join(prev, "user_id")
            .filter(
                (F.col("ts") > F.col(prev_ts))
                & (
                    F.col("ts")
                    <= F.col(prev_ts) + F.expr("INTERVAL 24 HOURS")
                )
            )
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_ts))
        )

    s1 = stage(None, "view", "t1")
    s2 = stage(s1, "click", "t2")
    s3 = stage(s2, "purchase", "t3")
    counts = [
        s1.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("1_view").alias("stage"), "n_users"
        ),
        s2.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("2_click_24h").alias("stage"), "n_users"
        ),
        s3.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("3_purchase_24h").alias("stage"), "n_users"
        ),
    ]
    out = counts[0].unionByName(counts[1]).unionByName(counts[2])
    return out.orderBy("stage")


# ---------------------------------------------------------------------------
# Weekly cohort retention matrix.
# ---------------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
f AS (
  SELECT user_id, day,
         MIN(day) OVER (PARTITION BY user_id) AS first_day
  FROM d
),
w AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('week', first_day) AS DATE) AS cohort_week,
         (day - first_day) // 7 AS week_offset
  FROM f
),
sized AS (
  SELECT cohort_week,
         CAST(week_offset AS INTEGER) AS week_offset,
         CAST(COUNT(*) AS BIGINT) AS n_active
  FROM w GROUP BY 1, 2
)
SELECT cohort_week, week_offset, n_active,
       FLOOR(n_active * 1.0
             / MAX(CASE WHEN week_offset = 0 THEN n_active END)
               OVER (PARTITION BY cohort_week) * 1e4 + 0.5) / 1e4
         AS retention_pct
FROM sized
ORDER BY cohort_week, week_offset
"""


@query("user_weekly_retention", _RETENTION_ORACLE)
def user_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention matrix: users grouped by first-seen
    week (Monday-truncated in both engines), activity bucketed by
    whole weeks since each user's first day, retention as the share
    of the cohort's week-0 size. Every stage is a keyed aggregation;
    the only window runs per cohort over O(weeks) rows."""
    ev = read_table(spark, sf_dir, "events")
    d = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    f = d.withColumn(
        "first_day", F.min("day").over(Window.partitionBy("user_id"))
    )
    w = f.select(
        "user_id",
        F.trunc("first_day", "week").alias("cohort_week"),
        F.floor(F.datediff("day", "first_day") / 7)
        .cast("int")
        .alias("week_offset"),
    ).distinct()
    sized = w.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    w0 = Window.partitionBy("cohort_week")
    base = F.max(
        F.when(F.col("week_offset") == 0, F.col("n_active"))
    ).over(w0)
    return sized.select(
        "cohort_week",
        "week_offset",
        "n_active",
        (F.floor(F.col("n_active") * 1.0 / base * 1e4 + F.lit(0.5)) / 1e4).alias(
            "retention_pct"
        ),
    ).orderBy("cohort_week", "week_offset")


# ---------------------------------------------------------------------------
# Conversion-latency distribution: as-of view → purchase lag.
# ---------------------------------------------------------------------------

_CONV_LATENCY_ORACLE = """
WITH tagged AS (
  SELECT user_id, ts, 0 AS side, event_id AS r_event_id, ts AS r_ts,
         NULL::BIGINT AS event_id
  FROM events WHERE event_type = 'view'
  UNION ALL
  SELECT user_id, ts, 1 AS side, NULL, NULL, event_id
  FROM events WHERE event_type = 'purchase'
),
carried AS (
  SELECT *,
    last_value(CASE WHEN side = 0
                    THEN {'eid': r_event_id, 'vts': r_ts} END
               IGNORE NULLS) OVER w AS v
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, r_event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
lags AS (
  SELECT isodow(ts) AS purchase_dow,
         date_diff('microsecond', v.vts, ts) / 1000000.0 AS lag_s
  FROM carried WHERE side = 1 AND v IS NOT NULL
)
SELECT CAST(purchase_dow AS INTEGER) AS purchase_dow,
       CAST(COUNT(*) AS BIGINT) AS n_conversions,
       FLOOR(quantile_cont(lag_s, 0.5) * 1e4 + 0.5) / 1e4 AS median_lag_s,
       FLOOR(quantile_cont(lag_s, 0.9) * 1e4 + 0.5) / 1e4 AS p90_lag_s
FROM lags
GROUP BY 1
ORDER BY 1
"""


@query("view_purchase_latency_stats", _CONV_LATENCY_ORACLE)
def view_purchase_latency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency profile: for every purchase, the lag since
    the user's most recent prior view (the LINEAR as-of union-window
    shape — never the quadratic per-user view×purchase join), then
    exact interpolated median/p90 per ISO weekday of the purchase.
    Lag seconds are exact (integer micros / 1e6); percentile
    interpolation parity is the stats_by_returnflag precedent;
    outputs FLOOR-quantized."""
    from calorista_spark.operators.joins import asof_join

    ev = read_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("v_eid"), F.col("ts").alias("v_ts")
    )
    joined = asof_join(
        purchases,
        views,
        partition_keys=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["v_eid", "v_ts"],
    )
    lags = joined.filter(F.col("v_eid_asof").isNotNull()).select(
        (F.weekday("ts") + 1).cast("int").alias("purchase_dow"),
        (
            F.expr(
                "timestampdiff(MICROSECOND, v_ts_asof, ts)"
            ).cast("double")
            / 1e6
        ).alias("lag_s"),
    )
    pcts = F.percentile("lag_s", F.array(F.lit(0.5), F.lit(0.9)))
    return (
        lags.groupBy("purchase_dow")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            pcts.alias("__p"),
        )
        .select(
            "purchase_dow",
            "n_conversions",
            (F.floor(F.element_at("__p", 1) * 1e4 + F.lit(0.5)) / 1e4).alias(
                "median_lag_s"
            ),
            (F.floor(F.element_at("__p", 2) * 1e4 + F.lit(0.5)) / 1e4).alias(
                "p90_lag_s"
            ),
        )
        .orderBy("purchase_dow")
    )
