"""Analytic-function extras: time-based RANGE window frames,
distribution ranks (percent_rank / cume_dist), argmin/argmax lookups
(min_by / max_by), and bivariate statistics (corr / covar / regr).

These round out the window+aggregate surface beyond SURVEY §2.9's
W1-W3: the trailing time window is the general form of the moving
average (W3) for irregular event times, where a ROWS frame is wrong
because rows are not equally spaced.

Portability: the RANGE frame orders by epoch seconds computed as an
NTZ-to-NTZ timestampdiff (no session timezone involvement on either
engine); RANGE includes peer rows identically in Spark and DuckDB, so
tied timestamps cannot diverge. percent_rank/cume_dist are exact
rational values (rank arithmetic), deterministic under ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.queries.registry import query

# ---------------------------------------------------------------------------
# Trailing 3-day RANGE window over irregular event times.
# ---------------------------------------------------------------------------

_TRAILING_ORACLE = """
WITH e AS (
  SELECT user_id, event_id,
         CAST(value AS DECIMAL(18, 6)) AS value_dec,
         date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS epoch_s
  FROM events WHERE user_id < 30
)
SELECT user_id, event_id,
       ROUND(CAST(SUM(value_dec) OVER w AS DOUBLE), 4) AS trailing_sum_3d,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_in_frame
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
             RANGE BETWEEN 259200 PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


@query("events_trailing_3d_range_window", _TRAILING_ORACLE)
def events_trailing_3d_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 3-day rolling total per user over irregular event
    times — a RANGE frame on epoch seconds (a ROWS frame would be
    wrong: events are not equally spaced). One shuffle-sort on
    (user_id, epoch_s); frames never cross partitions, so the plan
    scales with users.

    The windowed sum runs over DECIMAL so it is exact: sliding-frame
    accumulation order differs between engines, and a double sum's
    ulp noise can cross a round-half boundary. The sum (not the mean)
    is reported because mean = exact_decimal / count lands exactly ON
    half boundaries, where Spark rounds HALF_UP and DuckDB half-even."""
    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    epoch_s = F.expr(
        "timestampdiff(SECOND, to_timestamp_ntz('1970-01-01 00:00:00'), ts)"
    )
    e = ev.select(
        "user_id",
        "event_id",
        F.col("value").cast("decimal(18,6)").alias("value_dec"),
        epoch_s.alias("epoch_s"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-259200, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum("value_dec").over(w).cast("double"), 4).alias(
            "trailing_sum_3d"
        ),
        F.count(F.lit(1)).over(w).alias("n_in_frame"),
    ).orderBy("user_id", "event_id")


# ---------------------------------------------------------------------------
# Distribution ranks within each order status.
# ---------------------------------------------------------------------------

_RANKS_ORACLE = """
SELECT o_orderkey, o_orderstatus,
       FLOOR(o_totalprice * 100 + 0.5) / 100 AS o_totalprice,
       ROUND(percent_rank() OVER w, 6) AS pct_rank,
       ROUND(cume_dist() OVER w, 6) AS cume_dist
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice)
ORDER BY o_orderkey
"""


@query("order_percentile_ranks", _RANKS_ORACLE)
def order_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist per status partition — exact rank
    arithmetic ((rank-1)/(n-1), peers counted identically in both
    engines), so ties on price cannot diverge."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        # FLOOR quantize, not ROUND: >2-decimal inputs half-break
        # (r6 stress audit, same class as order_price_quartiles)
        (F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)) / 100).alias(
            "o_totalprice"
        ),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume_dist"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# First/last event per user via argmin/argmax aggregates.
# ---------------------------------------------------------------------------

_FIRST_LAST_ORACLE = """
WITH e AS (
  SELECT user_id, event_type, value, ts, event_id,
         date_diff('microsecond', TIMESTAMP '2024-01-01 00:00:00', ts)
           * 100000 + event_id AS ord
  FROM events
)
SELECT user_id,
       -- first/last (ORDER BY), not arg_min/arg_max: DuckDB's
       -- arg_min IGNORES null values, silently substituting a later
       -- event's value; Spark's min_by carries the null faithfully
       -- (r6 null-injection audit)
       first(event_type ORDER BY ord) AS first_type,
       last(event_type ORDER BY ord) AS last_type,
       ROUND(first(value ORDER BY ord), 4) AS first_value,
       ROUND(last(value ORDER BY ord), 4) AS last_value,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM e
GROUP BY user_id
ORDER BY user_id
"""


@query("user_first_last_event", _FIRST_LAST_ORACLE)
def user_first_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last event per user as min_by/max_by over a unique
    ordinal (event time refined by event_id, so ties cannot make the
    answer engine-dependent). A single partial-aggregable shuffle —
    the scalable alternative to a sort-based first/last window when
    only the endpoints are needed."""
    ev = read_table(spark, sf_dir, "events")
    ord_col = (
        F.expr(
            "timestampdiff(MICROSECOND, to_timestamp_ntz('2024-01-01 00:00:00'), ts)"
        )
        * 100000
        + F.col("event_id")
    ).alias("ord")
    e = ev.select("user_id", "event_type", "value", "event_id", ord_col)
    return (
        e.groupBy("user_id")
        .agg(
            F.min_by("event_type", "ord").alias("first_type"),
            F.max_by("event_type", "ord").alias("last_type"),
            F.round(F.min_by("value", "ord"), 4).alias("first_value"),
            F.round(F.max_by("value", "ord"), 4).alias("last_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Bivariate statistics per event type: correlation, covariance,
# least-squares slope/intercept of value against time-of-month.
# ---------------------------------------------------------------------------

_BIVARIATE_ORACLE = """
WITH e AS (
  SELECT event_type, value,
         date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts) / 86400.0 AS day_frac
  FROM events
)
SELECT event_type,
       ROUND(corr(value, day_frac), 4) AS corr_value_time,
       ROUND(covar_samp(value, day_frac), 4) AS covar_value_time,
       ROUND(regr_slope(value, day_frac), 4) AS slope,
       ROUND(regr_intercept(value, day_frac), 4) AS intercept,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM e
GROUP BY event_type
ORDER BY event_type
"""


@query("events_bivariate_stats", _BIVARIATE_ORACLE)
def events_bivariate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type drift statistics: corr / covar_samp / regr_slope /
    regr_intercept of value against days-since-month-start. All are
    single-pass co-moment aggregates (partial-merge friendly); rounded
    to 4 decimals to absorb summation-order ulps."""
    ev = read_table(spark, sf_dir, "events")
    day_frac = (
        F.expr(
            "timestampdiff(SECOND, to_timestamp_ntz('2024-01-01 00:00:00'), ts)"
        )
        / 86400.0
    ).alias("day_frac")
    e = ev.select("event_type", "value", day_frac)
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.corr("value", "day_frac"), 4).alias("corr_value_time"),
            F.round(F.covar_samp("value", "day_frac"), 4).alias(
                "covar_value_time"
            ),
            F.round(F.regr_slope("value", "day_frac"), 4).alias("slope"),
            F.round(F.regr_intercept("value", "day_frac"), 4).alias("intercept"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )
