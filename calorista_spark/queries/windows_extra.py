"""Extended window-function surface: lead/lag, ntile, first/last
value frames, and the correlated-scalar-aggregate join shape
(TPC-H Q17) — completing §2.9 beyond W1–W3."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.queries.registry import query

_ORDER_GAPS_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       datediff('day',
                lag(CAST(o_orderdate AS DATE))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                CAST(o_orderdate AS DATE)) AS days_since_prev,
       CAST(o_orderdate AS DATE) = first_value(CAST(o_orderdate AS DATE))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS is_first_order
FROM orders
ORDER BY o_custkey, order_date, o_orderkey
"""


@query("order_gaps_lag", _ORDER_GAPS_ORACLE)
def order_gaps_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag + first_value over a per-customer order timeline (the
    'time since last entry' analytic the reference's trend sections
    imply). Unique orderkey in the sort keeps frames deterministic."""
    orders = read_table(spark, sf_dir, "orders").withColumn(
        "order_date", F.col("o_orderdate").cast("date")
    )
    w = Window.partitionBy("o_custkey").orderBy("order_date", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "order_date",
        F.datediff("order_date", F.lag("order_date").over(w))
        .cast("long")
        .alias("days_since_prev"),
        (F.col("order_date") == F.first("order_date").over(w)).alias(
            "is_first_order"
        ),
    ).orderBy("o_custkey", "order_date", "o_orderkey")


_NTILE_ORACLE = """
SELECT o_orderkey,
       FLOOR(o_totalprice * 1e4 + 0.5) / 1e4 AS total_price,
       CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS price_quartile
FROM orders
ORDER BY o_orderkey
"""


@query("order_price_quartiles", _NTILE_ORACLE)
def order_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile bucketing over a global order (deterministic via the
    unique-key tiebreak). total_price display uses the FLOOR quantize
    (identical IEEE ops both engines) — round-half engines disagree on
    adversarial >2-decimal inputs (r6 stress dataset)."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        (F.floor(F.col("o_totalprice") * 1e4 + F.lit(0.5)) / 1e4).alias(
            "total_price"
        ),
        F.ntile(4).over(w).alias("price_quartile"),
    ).orderBy("o_orderkey")


_Q17_ORACLE = """
SELECT p.p_brand,
       CAST(FLOOR(CAST(SUM(CAST(FLOOR(l.l_extendedprice * 1e4 + CAST(0.5 AS DOUBLE))
                         AS DECIMAL(18,0))) AS DOUBLE) / CAST(7 AS DOUBLE)
                  + CAST(0.5 AS DOUBLE)) AS DOUBLE)
         / 1e4 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_quantity < (
  SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
  WHERE l2.l_partkey = l.l_partkey
)
GROUP BY p.p_brand
ORDER BY p.p_brand
"""


@query("small_quantity_revenue_q17", _Q17_ORACLE)
def small_quantity_revenue_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar aggregate subquery —
    Catalyst decorrelates it into an aggregate + self-join (SURVEY
    §4.1). Expressed through spark.sql to exercise the SQL path."""
    from calorista_spark.catalog import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(_Q17_ORACLE)
