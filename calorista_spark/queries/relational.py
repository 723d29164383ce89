"""Join + window queries (SURVEY §2.8 J1–J7, §2.9 W1–W3).

The reference has no explicit relational joins (SURVEY §2.8) — these
are the engine-completeness generalizations of its merge (O-D3) and
spine-align (O-R2), verified on the TPC-H-ish star schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.functions.numeric import quantized_sum
from calorista_spark.operators.joins import asof_join, range_bucket_join
from calorista_spark.operators.windows import moving_avg, rank_latest, share_of_total
from calorista_spark.queries.registry import query

# ---------------------------------------------------------------------------
# J1 + J2: the star join. Dims (nation, region) broadcast; the
# fact-to-fact joins shuffle on their keys and AQE handles skew.
# ---------------------------------------------------------------------------

_STAR_JOIN_ORACLE = """
SELECT
  r.r_name                                               AS region_name,
  n.n_name                                               AS nation_name,
  CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000.0
                      + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
  COUNT(*)                                               AS n_lineitems
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN nation n    ON c.c_nationkey = n.n_nationkey
JOIN region r    ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("star_join_revenue", _STAR_JOIN_ORACLE)
def star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 (equi joins) + J2 (broadcast dims): revenue by region/nation."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy(
            F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
        )
        .agg(
            # quantized_sum, not round(sum(...)): at ~1e9 magnitudes the
            # 4th decimal of a double sum is accumulation-order noise
            quantized_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("region_name", "nation_name")
    )


# ---------------------------------------------------------------------------
# J3: outer join keeps customers with zero orders (count = 0, sum = null).
# ---------------------------------------------------------------------------

_CUSTOMER_ORDERS_ORACLE = """
SELECT
  c.c_custkey,
  c.c_mktsegment,
  COUNT(o.o_orderkey)            AS n_orders,
  ROUND(SUM(o.o_totalprice), 4)  AS total_price
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY 1, 2
ORDER BY 1
"""


@query("customer_order_counts", _CUSTOMER_ORDERS_ORACLE)
def customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left outer join; zero-order customers show n_orders=0 and
    null total (null ≠ 0 — the engine's two null policies, SURVEY §7)."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_price"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# J4: semi/anti — "entries not yet in the store" is exactly the O-D3
# insert branch (SURVEY §2.8).
# ---------------------------------------------------------------------------


@query(
    "customers_without_orders",
    """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
ORDER BY c_custkey
""",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 anti join."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return (
        customer.join(
            orders, customer["c_custkey"] == orders["o_custkey"], "left_anti"
        )
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "customers_with_urgent_orders",
    """
SELECT c_custkey, c_mktsegment FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
ORDER BY c_custkey
""",
)
def customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 semi join — existence check without row multiplication."""
    customer = read_table(spark, sf_dir, "customer")
    urgent = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        customer.join(urgent, customer["c_custkey"] == urgent["o_custkey"], "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# J5: range/theta join into value buckets. The bucket table is built in
# the engine (spark.range) and in the oracle (range()) identically.
# ---------------------------------------------------------------------------

_BUCKET_ORACLE = """
WITH buckets AS (
  SELECT i * 50 AS lo, (i + 1) * 50 AS hi,
         CAST(i * 50 AS VARCHAR) || '-' || CAST((i + 1) * 50 AS VARCHAR) AS bucket
  FROM range(0, 8) t(i)
)
SELECT b.bucket, COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(e.value * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         / 10000.0 AS total_value
FROM events e JOIN buckets b ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.bucket ORDER BY b.bucket
"""


@query("events_value_buckets", _BUCKET_ORACLE)
def events_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: inequality join against a broadcast bucket table — a
    broadcast-nested-loop over 8 rows, not a cartesian shuffle."""
    events = read_table(spark, sf_dir, "events")
    buckets = spark.range(0, 8).select(
        (F.col("id") * 50).alias("lo"),
        ((F.col("id") + 1) * 50).alias("hi"),
        F.concat_ws(
            "-", (F.col("id") * 50).cast("string"), ((F.col("id") + 1) * 50).cast("string")
        ).alias("bucket"),
    )
    joined = range_bucket_join(events, buckets, "value")
    return (
        joined.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            quantized_sum("value").alias("total_value"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# J6: as-of join — latest prior 'view' for each 'purchase', per user.
# One shuffle-sort on (user_id, ts); no range-join explosion.
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
WITH tagged AS (
  SELECT user_id, ts, 0 AS side, value AS r_value, event_id AS r_event_id,
         NULL::BIGINT AS event_id, NULL::DOUBLE AS value
  FROM events WHERE event_type = 'view'
  UNION ALL
  SELECT user_id, ts, 1 AS side, NULL, NULL, event_id, value
  FROM events WHERE event_type = 'purchase'
),
carried AS (
  -- carry ONE struct keyed on the non-null event id: carrying value
  -- and id separately with IGNORE NULLS skips a legit null-VALUED
  -- view and resurrects an older value (r6 null-injection audit)
  SELECT *,
    last_value(CASE WHEN side = 0
                    THEN {'eid': r_event_id, 'val': r_value} END
               IGNORE NULLS) OVER w AS view_row
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, r_event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ROUND(value, 4) AS value,
       ROUND(view_row.val, 4) AS view_value,
       view_row.eid AS view_event_id
FROM carried WHERE side = 1
ORDER BY event_id
"""


@query("asof_view_before_purchase", _ASOF_ORACLE)
def asof_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: merge-asof (generalizes the reference's ``last_weight_*``
    carry, models.py:12-13) via union + last-ignore-nulls window."""
    events = read_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value", "event_id"
    )
    joined = asof_join(
        purchases,
        views,
        partition_keys=["user_id"],
        left_ts="ts",
        right_ts="ts",
        # event_id FIRST: the tie-break struct must lead with a
        # non-null unique field — nullable `value` first would order
        # same-ts ties NULLS FIRST in Spark but NULLS LAST in DuckDB
        # (r6 null-injection audit)
        value_cols=["event_id", "value"],
        suffix="_view",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round("value", 4).alias("value"),
        F.round("value_view", 4).alias("view_value"),
        F.col("event_id_view").alias("view_event_id"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# J7: cross join (small sides only — guarded by construction).
# ---------------------------------------------------------------------------


@query(
    "region_nation_cross",
    """
SELECT r.r_name AS region_name, n.n_name AS nation_name
FROM region r CROSS JOIN nation n
ORDER BY 1, 2
""",
)
def region_nation_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: explicit cross join of two dims (the brute-force-similarity
    building block, §2.11 L3)."""
    region = read_table(spark, sf_dir, "region")
    nation = read_table(spark, sf_dir, "nation")
    return (
        region.crossJoin(nation)
        .select(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .orderBy("region_name", "nation_name")
    )


# ---------------------------------------------------------------------------
# W1: top-1 per group under a total order.
# ---------------------------------------------------------------------------

_TOP_ORDER_ORACLE = """
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 4) AS total_price
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn = 1
ORDER BY o_custkey
"""


@query("top_order_per_customer", _TOP_ORDER_ORACLE)
def top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: ranking (latest/largest-first) per key with unique
    tie-break (streamlit_app.py:233-234 generalized)."""
    orders = read_table(spark, sf_dir, "orders")
    top = rank_latest(
        orders,
        partition_keys=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
    )
    return top.select(
        "o_custkey", "o_orderkey", F.round("o_totalprice", 4).alias("total_price")
    ).orderBy("o_custkey")


# ---------------------------------------------------------------------------
# W2: share-of-total within a group (macro-ratio generalized).
# ---------------------------------------------------------------------------

_SHARE_ORACLE = """
WITH nation_rev AS (
  SELECT r.r_name AS region_name, n.n_name AS nation_name,
         SUM(CAST(FLOOR(o.o_totalprice * 1e4 + 0.5) AS HUGEINT)) AS ns
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
)
SELECT region_name, nation_name,
       CAST(ns AS DOUBLE) / 1e4 AS nation_total,
       FLOOR(CAST(ns AS DOUBLE)
             / CAST(SUM(ns) OVER (PARTITION BY region_name) AS DOUBLE)
             * 100 * 1e4 + 0.5) / 1e4 AS region_share_pct
FROM nation_rev
ORDER BY region_name, nation_name
"""


@query("nation_revenue_share", _SHARE_ORACLE)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: c / sum(c) over (partition by grp) ×100
    (streamlit_app.py:459-468's ratio generalized to groups).

    r6 boundary fix: the per-nation revenue is SF-unbounded, so it
    sums as scaled integers (quantized_sum_scaled) — a plain double
    sum floor-quantized AFTER the fact carried accumulation-order
    noise across the quantize boundary on the ×7-magnitude stress
    dataset. The exact integer sum is then handed to the W2
    share_of_total window as an int-valued double (< 2^53, so the
    ≤|nations-per-region| window sum is still exact and
    order-invariant), and the share floor-quantizes."""
    from calorista_spark.functions.numeric import quantized_sum_scaled

    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    nation_rev = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy(
            F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
        )
        .agg(quantized_sum_scaled("o_totalprice").cast("double").alias("ns"))
    )
    shared = share_of_total(
        nation_rev, ["region_name"], "ns", "region_share_pct"
    )
    return shared.select(
        "region_name",
        "nation_name",
        (F.col("ns") / 1e4).alias("nation_total"),
        (F.floor(F.col("region_share_pct") * 1e4 + F.lit(0.5)) / 1e4).alias(
            "region_share_pct"
        ),
    ).orderBy("region_name", "nation_name")


# ---------------------------------------------------------------------------
# W3: trailing 7-day moving average over the daily event series.
# ---------------------------------------------------------------------------

_MOVING_AVG_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         SUM(value) AS day_value
  FROM events GROUP BY 1
)
SELECT day,
       ROUND(day_value, 4) AS day_value,
       ROUND(AVG(day_value) OVER (ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
FROM daily ORDER BY day
"""


@query("moving_avg_daily_values", _MOVING_AVG_ORACLE)
def moving_avg_daily_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: rolling mean (the reference's trend sections as a window
    frame instead of calendar buckets)."""
    events = read_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.col("ts").cast("date").alias("day")
    ).agg(F.sum("value").alias("day_value"))
    with_ma = moving_avg(daily, "day", "day_value", "ma7", window_rows=7)
    return with_ma.select(
        "day",
        F.round("day_value", 4).alias("day_value"),
        F.round("ma7", 4).alias("ma7"),
    ).orderBy("day")
