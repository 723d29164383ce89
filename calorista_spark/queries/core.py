"""Core reference-derived queries (SURVEY §2.2, §2.3, §2.5, §2.6).

Each query restates a dashboard/ETL computation from the reference on
the TPC-H-ish test tables (FIXTURES.md §B maps tables to operators).
Spark side is declarative DataFrame API — Catalyst pushes the filters
and projections into the parquet scan; oracle side is plain DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.functions.numeric import quantized_sum, quantized_sum_scaled
from calorista_spark.functions.dates import (
    date_to_epoch_days,
    days_in_month,
    epoch_days_to_date,
    iso_week,
    iso_year,
    month_label,
    month_start,
)
from calorista_spark.queries.registry import query

# ---------------------------------------------------------------------------
# Flagship: the reference's date-range section (streamlit_app.py:306-332)
# restated on lineitem — O-F2 between-filter → O-A1 grouped sums → O-O2 sort.
# ---------------------------------------------------------------------------

_DAILY_TOTALS_ORACLE = """
SELECT
  CAST(l_shipdate AS DATE)                                   AS ship_date,
  CAST(SUM(CAST(FLOOR(l_quantity * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
    / 10000.0                                                AS total_qty,
  CAST(SUM(CAST(FLOOR(l_extendedprice * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
    / 10000.0                                                AS total_price,
  CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
                AS BIGINT)) AS DOUBLE) / 10000.0             AS total_disc_price,
  COUNT(*)                                                   AS n_items
FROM lineitem
WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
GROUP BY 1
ORDER BY 1
"""


@query("daily_totals", _DAILY_TOTALS_ORACLE)
def daily_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-F2 + O-A1 + O-O2: daily totals over a date range.

    Reference semantics: streamlit_app.py:306-324 (between filter on
    date, groupby(date).agg(sum×4)). The filter is on the partition-
    friendly date column and reaches the parquet scan (PushedFilters).
    """
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate").between("1996-01-01", "1996-12-31 23:59:59"))
        .groupBy(F.col("l_shipdate").cast("date").alias("ship_date"))
        .agg(
            # quantized: per-day sums grow unboundedly with SF, and at
            # 1e9+ magnitudes round(sum(x),4)'s last decimal is
            # accumulation-order noise (registry conventions)
            quantized_sum("l_quantity").alias("total_qty"),
            quantized_sum("l_extendedprice").alias("total_price"),
            quantized_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("total_disc_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("ship_date")
    )


# ---------------------------------------------------------------------------
# Latest-day section (streamlit_app.py:225-264): argmax date → equality
# filter → global sums. Implemented scale-correct: the max-date is computed
# as a 1-row aggregate and broadcast-joined, no global sort, no collect.
# ---------------------------------------------------------------------------

_LATEST_DAY_ORACLE = """
SELECT
  CAST(o_orderdate AS DATE)        AS order_date,
  CAST(SUM(CAST(FLOOR(o_totalprice * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
    / 10000.0                      AS total_price,
  COUNT(*)                         AS n_orders
FROM orders
WHERE CAST(o_orderdate AS DATE) =
      (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)
GROUP BY 1
"""


@query("latest_day_summary", _LATEST_DAY_ORACLE)
def latest_day_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-O1 (argmax date) + O-F1 (equality filter) + O-A4 (sums).

    Reference: streamlit_app.py:233-251. Spark shape: 1-row max
    aggregate broadcast back onto the fact — O(1) extra cost at any
    scale, versus the reference's sort-all-dates-in-Python.
    """
    orders = read_table(spark, sf_dir, "orders").withColumn(
        "order_date", F.col("o_orderdate").cast("date")
    )
    latest = orders.agg(F.max("order_date").alias("order_date"))
    return (
        orders.join(F.broadcast(latest), "order_date")
        .groupBy("order_date")
        .agg(
            quantized_sum("o_totalprice").alias("total_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Weekly trends (streamlit_app.py:386-417): ISO year/week grouping with
# sum×n, min(date), nunique(date), and the reference's divide-by-7 average
# (deliberately 7 even for partial weeks — SURVEY §7 quirk list).
# ---------------------------------------------------------------------------

_WEEKLY_TRENDS_ORACLE = """
SELECT
  isoyear(CAST(o_orderdate AS DATE))                 AS iso_year,
  week(CAST(o_orderdate AS DATE))                    AS iso_week,
  CAST(SUM(CAST(FLOOR(o_totalprice * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
    / 10000.0                                        AS total_price,
  MIN(CAST(o_orderdate AS DATE))                     AS week_start,
  COUNT(DISTINCT CAST(o_orderdate AS DATE))          AS n_days,
  FLOOR(CAST(SUM(CAST(FLOOR(o_totalprice * 10000.0 + 0.5) AS BIGINT))
             AS DOUBLE) / 7.0 + 0.5) / 10000.0       AS avg_daily_price
FROM orders
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("weekly_trends", _WEEKLY_TRENDS_ORACLE)
def weekly_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-A2 + O-S5 + O-A6 + O-A7 (reference streamlit_app.py:386-417)."""
    orders = read_table(spark, sf_dir, "orders").withColumn(
        "order_date", F.col("o_orderdate").cast("date")
    )
    return (
        orders.groupBy(
            iso_year("order_date").alias("iso_year"),
            iso_week("order_date").alias("iso_week"),
        )
        .agg(
            quantized_sum("o_totalprice").alias("total_price"),
            F.min("order_date").alias("week_start"),
            F.countDistinct("order_date").alias("n_days"),
            # deterministic divided average: scaled exact sum / 7,
            # floor-rounded — every op identical-IEEE in both engines
            (
                F.floor(
                    quantized_sum_scaled("o_totalprice").cast("double") / 7.0
                    + 0.5
                )
                / 10000.0
            ).alias("avg_daily_price"),
        )
        .orderBy("iso_year", "iso_week")
    )


# ---------------------------------------------------------------------------
# Monthly trends (streamlit_app.py:518-543): month truncation + label,
# true days-in-month average (contrast with weekly's /7 — both preserved).
# ---------------------------------------------------------------------------

_MONTHLY_TRENDS_ORACLE = """
SELECT
  CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)   AS month_start,
  strftime(CAST(o_orderdate AS DATE), '%b %Y')                   AS month_label,
  CAST(SUM(CAST(FLOOR(o_totalprice * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
    / 10000.0                                                    AS total_price,
  COUNT(DISTINCT CAST(o_orderdate AS DATE))                      AS n_days,
  FLOOR(CAST(SUM(CAST(FLOOR(o_totalprice * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
        / day(last_day(CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)))
        + 0.5) / 10000.0                                         AS avg_daily_price
FROM orders
GROUP BY 1, 2
ORDER BY 1
"""


@query("monthly_trends", _MONTHLY_TRENDS_ORACLE)
def monthly_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-A3 + O-S6 + O-S8 (reference streamlit_app.py:518-543)."""
    orders = read_table(spark, sf_dir, "orders").withColumn(
        "order_date", F.col("o_orderdate").cast("date")
    )
    grouped = orders.groupBy(
        month_start("order_date").alias("month_start"),
        month_label("order_date").alias("month_label"),
    ).agg(
        quantized_sum("o_totalprice").alias("total_price"),
        F.countDistinct("order_date").alias("n_days"),
        quantized_sum_scaled("o_totalprice").alias("_scaled_total"),
    )
    return (
        grouped.withColumn(
            "avg_daily_price",
            # scaled exact sum / true days-in-month, floor-rounded —
            # identical IEEE ops in both engines (registry conventions)
            F.floor(
                F.col("_scaled_total").cast("double")
                / days_in_month("month_start")
                + 0.5
            )
            / 10000.0,
        )
        .drop("_scaled_total")
        .orderBy("month_start")
    )


# ---------------------------------------------------------------------------
# TPC-H Q1-shaped pricing summary — O-S12 arithmetic + O-A1 multi-agg +
# O-O3 string sort, the canonical "does the agg layer work" query.
# ---------------------------------------------------------------------------

_PRICING_SUMMARY_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(FLOOR(l_quantity * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
    / 10000.0                                                        AS sum_qty,
  CAST(SUM(CAST(FLOOR(l_extendedprice * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
    / 10000.0                                                        AS sum_base_price,
  CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
                AS BIGINT)) AS DOUBLE) / 10000.0                     AS sum_disc_price,
  CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                      * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
    / 10000.0                                                        AS sum_charge,
  ROUND(AVG(l_quantity), 4)                                          AS avg_qty,
  ROUND(AVG(l_extendedprice), 4)                                     AS avg_price,
  ROUND(AVG(l_discount), 4)                                          AS avg_disc,
  COUNT(*)                                                           AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("pricing_summary", _PRICING_SUMMARY_ORACLE)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-A1/O-A4/O-S12/O-O3 on lineitem (TPC-H Q1 shape)."""
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("2001-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            quantized_sum("l_quantity").alias("sum_qty"),
            quantized_sum("l_extendedprice").alias("sum_base_price"),
            quantized_sum(disc_price).alias("sum_disc_price"),
            quantized_sum(disc_price * (1 + F.col("l_tax"))).alias(
                "sum_charge"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Projection + filter + sort (O-P1/O-P2/O-F1/O-O3): the latest-day display
# table (streamlit_app.py:263-265) — select a display subset, sort by a
# string column.
# ---------------------------------------------------------------------------

_PROJECTION_ORACLE = """
SELECT
  l_orderkey    AS order_key,
  l_linenumber  AS line_number,
  l_returnflag  AS return_flag,
  ROUND(l_quantity, 4)       AS qty,
  ROUND(l_extendedprice, 4)  AS price
FROM lineitem
WHERE l_returnflag = 'R' AND l_quantity > 45
ORDER BY return_flag, order_key, line_number
"""


@query("projection_filter_sort", _PROJECTION_ORACLE)
def projection_filter_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-P1 (projection) + O-P2 (rename) + O-F1 + O-O3.

    Both the predicate and the 5-column projection reach the parquet
    scan (PushedFilters + ReadSchema pruning).
    """
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 45))
        .select(
            F.col("l_orderkey").alias("order_key"),
            F.col("l_linenumber").alias("line_number"),
            F.col("l_returnflag").alias("return_flag"),
            F.round("l_quantity", 4).alias("qty"),
            F.round("l_extendedprice", 4).alias("price"),
        )
        .orderBy("return_flag", "order_key", "line_number")
    )


# ---------------------------------------------------------------------------
# Global range summary (O-A4/O-A5): ungrouped sums + min/max bounds over a
# filtered frame (streamlit_app.py:275-276, 364-367).
# ---------------------------------------------------------------------------

_RANGE_SUMMARY_ORACLE = """
SELECT
  MIN(CAST(o_orderdate AS DATE))  AS first_date,
  MAX(CAST(o_orderdate AS DATE))  AS last_date,
  CAST(SUM(CAST(FLOOR(o_totalprice * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
    / 10000.0                     AS total_price,
  COUNT(*)                        AS n_orders
FROM orders
WHERE o_orderstatus = 'F'
"""


@query("range_summary", _RANGE_SUMMARY_ORACLE)
def range_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-A4 (global sums, null-skipping) + O-A5 (min/max bounds)."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderstatus") == "F").agg(
        F.min(F.col("o_orderdate").cast("date")).alias("first_date"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_date"),
        quantized_sum("o_totalprice").alias("total_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Distinct dates (O-R3) and top-k with deterministic tie-break (O-O1/O-O4).
# ---------------------------------------------------------------------------


@query(
    "distinct_order_dates",
    """
SELECT DISTINCT CAST(o_orderdate AS DATE) AS order_date
FROM orders ORDER BY 1
""",
)
def distinct_order_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-R3: distinct values (streamlit_app.py:233)."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.select(F.col("o_orderdate").cast("date").alias("order_date"))
        .distinct()
        .orderBy("order_date")
    )


@query(
    "top_parts_by_price",
    """
SELECT p_partkey, p_name, ROUND(p_retailprice, 4) AS retail_price
FROM part
ORDER BY p_retailprice DESC, p_partkey
LIMIT 10
""",
)
def top_parts_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-O4 (limit) + O-O1 (sort-desc-take-first generalized to top-k).

    Tie-break on the unique key makes the LIMIT deterministic across
    engines; Spark executes this as a TakeOrderedAndProject (no full
    sort materialization).
    """
    part = read_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey", "p_name", F.round("p_retailprice", 4).alias("retail_price")
        )
        .orderBy(F.col("retail_price").desc(), F.col("p_partkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Scalar-function queries: date conversions (O-S1/O-S2), JSON extraction
# (O-S13 on events.props), count-distinct (O-A6), string cleanup (O-S10).
# ---------------------------------------------------------------------------

_EPOCH_ROUNDTRIP_ORACLE = """
SELECT
  CAST(o_orderdate AS DATE)                                   AS order_date,
  datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS epoch_days,
  DATE '1970-01-01' + CAST(
    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INTEGER)
                                                              AS roundtrip_date
FROM orders
WHERE o_orderkey <= 100
ORDER BY o_orderkey
"""


@query("epoch_days_roundtrip", _EPOCH_ROUNDTRIP_ORACLE)
def epoch_days_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-S1 + O-S2: date ↔ epoch-days round trip (main.py:34-39,
    api.py:140-144)."""
    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    with_days = orders.select(
        F.col("o_orderkey"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        date_to_epoch_days("o_orderdate").alias("epoch_days"),
    )
    return with_days.select(
        "order_date",
        "epoch_days",
        epoch_days_to_date(F.col("epoch_days").cast("string")).alias("roundtrip_date"),
    ).orderBy("order_date", "epoch_days")


_JSON_PROPS_ORACLE = """
SELECT
  event_type,
  ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4)  AS avg_k,
  ROUND(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4)  AS sum_k,
  COUNT(*)                                                           AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("json_props_stats", _JSON_PROPS_ORACLE)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-S13 (JSON decode of the props payload, main.py:138) + O-A1.

    ``get_json_object`` stays JVM-side; no Python round trip.
    """
    events = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.groupBy("event_type")
        .agg(
            F.round(F.avg(k), 4).alias("avg_k"),
            F.round(F.sum(k).cast("double"), 4).alias("sum_k"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


@query(
    "distinct_users_by_type",
    """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-A6: exact count-distinct (streamlit_app.py:397). The
    ``approx_users_by_type`` variant is the 100 TB path."""
    events = read_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


_KEY_DATE_ORACLE = """
WITH keyed AS (
  SELECT 'food_entries:' || strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS store_key,
         o_totalprice
  FROM orders
)
SELECT store_key,
       CAST(string_split(store_key, ':')[-1] AS DATE) AS key_date,
       COUNT(*)                    AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         / 10000.0                 AS total_price
FROM keyed
GROUP BY store_key
ORDER BY store_key
"""


@query("storage_key_roundtrip", _KEY_DATE_ORACLE)
def storage_key_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-S3 + §1.4: the reference's ``food_entries:YYYY-MM-DD`` key
    layout — build the key, parse the date back out of it
    (streamlit_app.py:85-91 ``key.split(':')[-1]``), aggregate per
    key. In the engine the key IS the partition directory."""
    from calorista_spark.functions.text import key_date

    orders = read_table(spark, sf_dir, "orders")
    keyed = orders.select(
        F.concat(
            F.lit("food_entries:"),
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd"),
        ).alias("store_key"),
        "o_totalprice",
    )
    return (
        keyed.groupBy("store_key")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            quantized_sum("o_totalprice").alias("total_price"),
        )
        .select(
            "store_key",
            key_date("store_key").alias("key_date"),
            "n_orders",
            "total_price",
        )
        .orderBy("store_key")
    )


_MEASURE_NAMES_ORACLE = """
SELECT DISTINCT
  p_brand AS raw_name,
  upper(substr(replace(lower(p_brand), 'brand#', ''), 1, 1))
    || lower(substr(replace(lower(p_brand), 'brand#', ''), 2)) AS pretty_name
FROM part
ORDER BY raw_name
"""


@query("measure_name_cleanup", _MEASURE_NAMES_ORACLE)
def measure_name_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-S10: strip-prefix + capitalize (streamlit_app.py:452,476,577
    ``replace('total_','').capitalize()``) demonstrated on part brands."""
    part = read_table(spark, sf_dir, "part")
    stripped = F.regexp_replace(F.lower(F.col("p_brand")), "brand#", "")
    pretty = F.concat(
        F.upper(F.substring(stripped, 1, 1)),
        F.lower(F.substring(stripped, 2, 0x7FFFFFFF)),
    )
    return (
        part.select(F.col("p_brand").alias("raw_name"), pretty.alias("pretty_name"))
        .distinct()
        .orderBy("raw_name")
    )
