"""Advanced relational coverage: multi-dimensional aggregation
(rollup/cube — the hypertable-rollup story), statistical aggregates,
quantiles, subqueries, the SQL-text front-end, and TPC-H-shaped
multi-join analytics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calorista_spark.catalog import load_tables, read_table
from calorista_spark.functions.numeric import quantized_sum
from calorista_spark.queries.registry import query

# ---------------------------------------------------------------------------
# ROLLUP / CUBE — hierarchical + all-combination subtotals.
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


@query("rollup_status_priority", _ROLLUP_ORACLE)
def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals (status → status+priority → grand
    total) in one pass — Spark expands the grouping sets without
    re-scanning. The grand-total row comes from an explicit global
    aggregate unioned under the detailed sets: SQL requires the ()
    grouping set to emit one row even over EMPTY input (DuckDB does),
    but Spark's rollup returns zero rows there — the union form is
    identical on non-empty input and standard-compliant on empty
    (r6 empty-input audit)."""
    orders = read_table(spark, sf_dir, "orders")
    detailed = (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            quantized_sum("o_totalprice").alias("total_price"),
            F.grouping_id().alias("__gid"),
        )
        .filter(F.col("__gid") != 3)
        .drop("__gid")
    )
    grand = orders.agg(
        F.count(F.lit(1)).alias("n_orders"),
        quantized_sum("o_totalprice").alias("total_price"),
    ).select(
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("string").alias("o_orderpriority"),
        "n_orders",
        "total_price",
    )
    return (
        detailed.unionByName(grand)
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


_CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(FLOOR(l_quantity * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS total_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@query("cube_flag_status", _CUBE_ORACLE)
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping combinations (the OLAP cube over two dims). Same
    explicit-grand-total union as rollup_status_priority: the ()
    grouping set must emit one row even over empty input."""
    li = read_table(spark, sf_dir, "lineitem")
    detailed = (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            quantized_sum("l_quantity").alias("total_qty"),
            F.grouping_id().alias("__gid"),
        )
        .filter(F.col("__gid") != 3)
        .drop("__gid")
    )
    grand = li.agg(
        F.count(F.lit(1)).alias("n_items"),
        quantized_sum("l_quantity").alias("total_qty"),
    ).select(
        F.lit(None).cast("string").alias("l_returnflag"),
        F.lit(None).cast("string").alias("l_linestatus"),
        "n_items",
        "total_qty",
    )
    return (
        detailed.unionByName(grand)
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


_GROUPING_SETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


@query("grouping_sets_status_priority", _GROUPING_SETS_ORACLE)
def grouping_sets_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary grouping sets (neither pure rollup nor cube) through
    the SQL front-end."""
    load_tables(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_ORACLE)


_PIVOT_ORACLE = """
SELECT l_returnflag,
       ROUND(COALESCE(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0), 4) AS qty_F,
       ROUND(COALESCE(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0), 4) AS qty_O
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("pivot_qty_by_status", _PIVOT_ORACLE)
def pivot_qty_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide reshape — the inverse of O-R1's unpivot): quantities
    by linestatus as columns. Explicit value list keeps the schema
    static for Catalyst."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.coalesce(F.sum("l_quantity"), F.lit(0.0)), 4))
        .withColumnRenamed("F", "qty_F")
        .withColumnRenamed("O", "qty_O")
        .orderBy("l_returnflag")
    )


_SET_OPS_ORACLE = """
SELECT c_custkey,
       'both' AS membership
FROM (
  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
)
UNION ALL
SELECT c_custkey, 'f_only'
FROM (
  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
)
ORDER BY membership, c_custkey
"""


@query("customer_status_set_ops", _SET_OPS_ORACLE)
def customer_status_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set algebra over customer key sets."""
    orders = read_table(spark, sf_dir, "orders")
    f_cust = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    o_cust = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    both = f_cust.intersect(o_cust).withColumn("membership", F.lit("both"))
    # subtract == EXCEPT DISTINCT (set difference); exceptAll would be
    # multiset difference and wrongly keep keys present in both sides
    f_only = f_cust.subtract(o_cust).withColumn("membership", F.lit("f_only"))
    return both.unionByName(f_only).select("c_custkey", "membership").orderBy(
        "membership", "c_custkey"
    )


# ---------------------------------------------------------------------------
# Statistical aggregates + quantiles.
# ---------------------------------------------------------------------------

_STATS_ORACLE = """
SELECT l_returnflag,
       ROUND(stddev_samp(l_extendedprice), 4)              AS price_stddev,
       ROUND(var_samp(l_quantity), 4)                      AS qty_var,
       ROUND(corr(l_quantity, l_extendedprice), 4) + 0     AS qty_price_corr,
       ROUND(covar_samp(l_discount, l_tax), 4) + 0         AS disc_tax_covar,
       ROUND(quantile_cont(l_extendedprice, 0.5), 4)       AS price_median,
       ROUND(quantile_cont(l_extendedprice, 0.9), 4)       AS price_p90
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("stats_by_returnflag", _STATS_ORACLE)
def stats_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact statistical profile per group. ``percentile`` here is the
    exact interpolated quantile; the 100 TB path swaps in
    ``approx_percentile`` (see ``approx_stats_by_returnflag``)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
            F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
            # "+ 0.0" collapses IEEE -0.0 to +0.0: near-zero sums round
            # to signed zero whose sign depends on accumulation order,
            # which differs between engines.
            (F.round(F.corr("l_quantity", "l_extendedprice"), 4) + 0.0).alias(
                "qty_price_corr"
            ),
            (F.round(F.covar_samp("l_discount", "l_tax"), 4) + 0.0).alias(
                "disc_tax_covar"
            ),
            # ONE percentile aggregate for both quantiles: separate
            # percentile() calls each buffer + sort the group's values
            # independently (measured 2x at sf0.1)
            F.percentile(
                "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9))
            ).alias("__ps"),
        )
        .select(
            "l_returnflag",
            "price_stddev",
            "qty_var",
            "qty_price_corr",
            "disc_tax_covar",
            F.round(F.col("__ps")[0], 4).alias("price_median"),
            F.round(F.col("__ps")[1], 4).alias("price_p90"),
        )
        .orderBy("l_returnflag")
    )


@query("approx_stats_by_returnflag")  # no oracle: sketch algorithms differ
def approx_stats_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB variants: approx_percentile (GK sketch) and
    approx_count_distinct (HLL++). Deliberately rows-only-checked —
    sketches are engine-specific by nature; the exact twins above are
    the correctness anchor."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            # rsd 0.02: ~1-2% observed error (±5%-testable) without the
            # heavy register set rsd=0.01 costs
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias(
                "approx_orders"
            ),
            F.round(
                F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)), 4
            ).alias("approx_median"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Subqueries: scalar + EXISTS/NOT EXISTS, through the SQL front-end —
# the engine's full Spark SQL surface over registered views.
# ---------------------------------------------------------------------------

_ABOVE_AVG_ORACLE = """
SELECT o_orderkey, ROUND(o_totalprice, 4) AS total_price
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
ORDER BY o_orderkey
"""


@query("orders_above_avg_scalar_subquery", _ABOVE_AVG_ORACLE)
def orders_above_avg_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery via ``spark.sql`` over the catalog views —
    Catalyst plans the inner aggregate once and broadcasts it."""
    load_tables(spark, sf_dir)
    return spark.sql(_ABOVE_AVG_ORACLE)


_EXISTS_ORACLE = """
SELECT c.c_custkey, c.c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
  AND NOT EXISTS (SELECT 1 FROM orders o2
                  WHERE o2.o_custkey = c.c_custkey AND o2.o_totalprice > 400000)
ORDER BY c.c_custkey
"""


@query("exists_open_no_jumbo", _EXISTS_ORACLE)
def exists_open_no_jumbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS — decorrelated by Catalyst into
    semi/anti joins (SURVEY §4.1 'subquery decorrelation: built-in')."""
    load_tables(spark, sf_dir)
    return spark.sql(_EXISTS_ORACLE)


# ---------------------------------------------------------------------------
# TPC-H-shaped multi-join analytics (Q3/Q5 shapes).
# ---------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT l.l_orderkey,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       CAST(o.o_orderdate AS DATE)                           AS order_date,
       o.o_orderpriority
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND CAST(o.o_orderdate AS DATE) < DATE '1996-03-15'
  AND CAST(l.l_shipdate AS DATE) > DATE '1996-03-15'
GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
ORDER BY revenue DESC, order_date, l_orderkey
LIMIT 10
"""


@query("shipping_priority_q3", _Q3_ORACLE)
def shipping_priority_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → two fact joins → top-10
    by revenue (TakeOrdered, no full sort). The unique orderkey in the
    sort makes the LIMIT deterministic."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate").cast("date") < F.lit("1996-03-15").cast("date"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate").cast("date") > F.lit("1996-03-15").cast("date"))
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "order_date", "l_orderkey")
        .limit(10)
    )


_Q5_ORACLE = """
SELECT n.n_name AS nation_name,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000.0
                           + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
ORDER BY revenue DESC, nation_name
"""


@query("local_supplier_volume_q5", _Q5_ORACLE)
def local_supplier_volume_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-way join with a same-nation correlation
    between customer and supplier; dims broadcast, facts shuffle on
    their join keys."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            # no broadcast hint: supplier is SF-scaled (10k rows × SF);
            # AQE broadcasts it at small SF and shuffles it at scale.
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            # quantized: per-nation revenue grows unboundedly with SF
            quantized_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "nation_name")
    )


# ---------------------------------------------------------------------------
# O-S9/§4.2.3: collision-safe row fingerprints (sha2 == DuckDB sha256).
# ---------------------------------------------------------------------------

_FINGERPRINT_HASH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       sha256(concat_ws('_', CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
                        CAST(l_suppkey AS VARCHAR))) AS fingerprint
FROM lineitem
WHERE l_orderkey <= 100
ORDER BY l_orderkey, l_linenumber
"""


@query("lineitem_fingerprints", _FINGERPRINT_HASH_ORACLE)
def lineitem_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-S9: the reference's concat fingerprint (main.py:54-60)
    hardened to sha256 for MERGE keys at scale (§4.2.3)."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sha2(
            F.concat_ws(
                "_",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
                F.col("l_suppkey").cast("string"),
            ),
            256,
        ).alias("fingerprint"),
    ).orderBy("l_orderkey", "l_linenumber")
