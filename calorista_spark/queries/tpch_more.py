"""TPC-H-shaped plan coverage, adapted to the testdata star schema.

The reference has no relational workload (SURVEY §2.8) — these queries
extend the engine-completeness surface with the classic TPC-H plan
shapes the driver's star schema supports (no partsupp table, no
shipmode/commitdate columns — predicates adapted to existing columns):

- Q4  existence-filtered aggregate (semi join inside a date slice)
- Q6  pure scan-side filter + agg (pushdown showcase)
- Q7  two-nation volume shipping (nation pair join, year rollup)
- Q8  market-share CASE ratio over an 8-table join
- Q9  profit by nation/year (cost model adapted to p_retailprice)
- Q10 returned-item top customers (top-k over a 4-way join)
- Q12 priority counts by return flag (conditional aggregation)
- Q13 customer order-count distribution (outer join + double agg)
- Q14 promo revenue ratio (conditional sum over a part join)
- Q15 top supplier (scalar subquery against a derived view)
- Q18 large-quantity orders (IN over a grouped HAVING subquery)
- Q19 disjunctive OR-of-ANDs join predicate
- Q22 dormant high-balance customers (NOT EXISTS + scalar avg)

Determinism: bounded-magnitude double outputs are round(...,4) on both
engines; SF-unbounded revenue sums use the quantized-sum form (see
registry conventions); every dated output is cast to DATE; counts from
conditional sums are cast to BIGINT (DuckDB sums integers into
HUGEINT); ties in every top-k break on a unique key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.functions.numeric import quantized_sum
from calorista_spark.queries.registry import query

# ---------------------------------------------------------------------------
# Q4: how many orders in a window had at least one late-shipped line.
# Left-semi join — existence, no row multiplication, no dedup needed.
# ---------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("order_priority_check_q4", _Q4_ORACLE)
def order_priority_check_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS → left-semi join; the date filter stays on the
    orders scan (pushed down) so only one quarter shuffles."""
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1996-07-01").cast("date"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > orders["o_orderdate"]),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q6: the forecasting-revenue-change scan. No join, no shuffle beyond
# the final single-row agg — the filters must reach the parquet scan.
# ---------------------------------------------------------------------------

_Q6_ORACLE = """
SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 10000.0 + 0.5)
                    AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
  AND l_discount BETWEEN CAST(0.03 AS DOUBLE) AND CAST(0.07 AS DOUBLE)
  AND l_quantity < 24
"""


@query("forecast_revenue_q6", _Q6_ORACLE)
def forecast_revenue_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: conjunctive scan filters + ungrouped agg. The whole
    predicate is Parquet-pushable; the plan is scan → partial agg →
    single exchange of one row."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            quantized_sum(
                F.col("l_extendedprice") * F.col("l_discount")
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q7: volume shipped between a nation pair, by direction and year.
# nation joins twice under different roles — both broadcast.
# ---------------------------------------------------------------------------

_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(FLOOR(volume * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         / 10000.0 AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND CAST(l.l_shipdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@query("volume_shipping_q7", _Q7_ORACLE)
def volume_shipping_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: the same dim joined twice under two roles; the
    nation-pair disjunction filters after both broadcasts."""
    s = read_table(spark, sf_dir, "supplier")
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date").between("1995-01-01", "1996-12-31")
    )
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        s.join(li, s["s_suppkey"] == li["l_suppkey"])
        .join(o, o["o_orderkey"] == li["l_orderkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("n1_key"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(quantized_sum("volume").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8: one nation's market share inside a region, per order year.
# ---------------------------------------------------------------------------

_Q8_ORACLE = """
SELECT o_year,
       ROUND(SUM(CASE WHEN nation = 'NATION_1' THEN volume ELSE CAST(0 AS DOUBLE) END)
             / SUM(volume), 4) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
  JOIN region r   ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type LIKE 'PROMO%'
)
GROUP BY o_year
ORDER BY o_year
"""


@query("market_share_q8", _Q8_ORACLE)
def market_share_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: 8-table join; the selective part filter (p_type
    LIKE 'PROMO%') prunes the fact early, dims broadcast."""
    p = read_table(spark, sf_dir, "part").filter(F.col("p_type").like("PROMO%"))
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select("n_nationkey", "n_regionkey")
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vol = (
        F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(F.lit(0.0))
    )
    joined = (
        # part/supplier carry NO hint: both are SF-scaled (200k/10k rows
        # × SF), so the broadcast-vs-shuffle choice is AQE's at runtime.
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, s["s_suppkey"] == li["l_suppkey"])
        .join(o, o["o_orderkey"] == li["l_orderkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .join(F.broadcast(n1), c["c_nationkey"] == n1["n_nationkey"])
        .join(F.broadcast(region), n1["n_regionkey"] == region["r_regionkey"])
        .join(F.broadcast(n2), s["s_nationkey"] == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "nation",
        )
    )
    return (
        joined.groupBy("o_year")
        .agg(F.round(F.sum(vol) / F.sum("volume"), 4).alias("mkt_share"))
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9: profit by supplier nation and year. No partsupp table in the
# testdata — the supply-cost term is adapted to 60% of p_retailprice.
# ---------------------------------------------------------------------------

_Q9_ORACLE = """
SELECT nation, o_year,
       CAST(SUM(CAST(FLOOR(amount * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         / 10000.0 AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
         l.l_extendedprice * (1 - l.l_discount)
           - CAST(0.6 AS DOUBLE) * p.p_retailprice * l.l_quantity AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%bolt%'
)
GROUP BY nation, o_year
ORDER BY nation, o_year
"""


@query("profit_by_nation_year_q9", _Q9_ORACLE)
def profit_by_nation_year_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: part-name LIKE prune + 5-way join + two-level
    rollup key (nation, year)."""
    p = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders")
    n = read_table(spark, sf_dir, "nation")
    joined = (
        # part/supplier unhinted (SF-scaled) — AQE decides at runtime.
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, s["s_suppkey"] == li["l_suppkey"])
        .join(o, o["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
            ).alias("amount"),
        )
    )
    return (
        joined.groupBy("nation", "o_year")
        # quantized: the 4th decimal of a ~1e7 double sum is order noise
        .agg(quantized_sum("amount").alias("sum_profit"))
        .orderBy("nation", "o_year")
    )


# ---------------------------------------------------------------------------
# Q10: customers who returned items, ranked by lost revenue.
# Top-k ties break on the unique customer key; the ORDER BY uses the
# rounded measure so both engines rank identical values.
# ---------------------------------------------------------------------------

_Q10_ORACLE = """
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 1e4
                           + 0.5) AS BIGINT)) AS DOUBLE) / 1e4 AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o.o_orderdate AS DATE) < DATE '1996-07-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@query("returned_top_customers_q10", _Q10_ORACLE)
def returned_top_customers_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: selective fact filters + 4-way join + top-20.

    Revenue is an EXACT integer basis-point sum (each term FLOOR-
    quantized to 1e-4 units per row, then SUM(BIGINT)): the r12
    magnitude audit caught the previous round(sum(double)) flaking on
    a x.xxxx5 boundary — the parallel sum's addition order varied
    sub-ulp run to run, landing on either side of the rounding
    boundary. Per-row products are bit-identical across engines (one
    IEEE multiply), so the integer sum is order-independent and
    deterministic (the split_leakage_audit basis-point pattern)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1996-07-01").cast("date"))
    )
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = read_table(spark, sf_dir, "nation")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            (
                F.sum(
                    F.floor(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * F.lit(1e4)
                        + F.lit(0.5)
                    ).cast("long")
                ).cast("double")
                / F.lit(1e4)
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 (adapted: no l_shipmode column): high- vs low-priority line
# counts per return flag — conditional aggregation over a fact join.
# ---------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""


@query("priority_lines_q12", _Q12_ORACLE)
def priority_lines_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional (CASE) aggregation — two measures from
    one pass instead of two filtered scans."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Q13: distribution of orders-per-customer — two aggregations deep,
# with the outer join keeping zero-order customers in the histogram.
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
WITH c_orders AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                     AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("customer_distribution_q13", _Q13_ORACLE)
def customer_distribution_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: join predicate on the outer side (not a post-filter
    — that would drop zero-order customers), then agg-of-agg."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c["c_custkey"] == o["o_custkey"])
            & (o["o_orderpriority"] != "1-URGENT"),
            "left",
        )
        .groupBy(c["c_custkey"])
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q14: promo revenue share in a month — conditional-sum ratio.
# ---------------------------------------------------------------------------

_Q14_ORACLE = """
SELECT ROUND(CAST(100 AS DOUBLE)
       * SUM(CASE WHEN p.p_type LIKE 'PROMO%'
              THEN l.l_extendedprice * (1 - l.l_discount)
              ELSE CAST(0 AS DOUBLE) END)
       / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-03-01'
  AND CAST(l.l_shipdate AS DATE) < DATE '1996-04-01'
"""


@query("promo_revenue_q14", _Q14_ORACLE)
def promo_revenue_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: part join (AQE-sized, part is SF-scaled) + single-pass
    conditional ratio."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-03-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1996-04-01").cast("date"))
    )
    p = read_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return li.join(p, li["l_partkey"] == p["p_partkey"]).agg(
        F.round(F.lit(100.0) * F.sum(promo_rev) / F.sum(rev), 4).alias(
            "promo_revenue_pct"
        )
    )


# ---------------------------------------------------------------------------
# Q15: the supplier(s) with max quarterly revenue. The max-equality
# runs on the ROUNDED revenue so both engines agree at the boundary.
# ---------------------------------------------------------------------------

_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1e4 + 0.5)
                       AS HUGEINT)) AS DOUBLE) / 1e4 AS total_revenue
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""


@query("top_supplier_q15", _Q15_ORACLE)
def top_supplier_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: scalar subquery against a derived view; the view is
    computed once and reused for both sides (Spark reuses the
    exchange; no second scan).

    total_revenue is a QUANTIZED sum, not round(sum(x), 4): the query
    compares an aggregated double FOR EQUALITY against its own MAX,
    and with round-of-double-sum the revenue CTE's two evaluations
    can land on opposite sides of a round-half boundary under
    parallel accumulation — the r7 magnitude-stress audit caught the
    oracle returning ZERO rows that way (a supplier unequal to its
    own max). Scaled-integer sums are exact under any accumulation
    order, so the equality is deterministic in both engines."""
    from calorista_spark.functions.numeric import quantized_sum

    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1996-04-01").cast("date"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        quantized_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = read_table(spark, sf_dir, "supplier")
    return (
        s.join(revenue, s["s_suppkey"] == revenue["supplier_no"])
        .join(
            F.broadcast(max_rev),
            F.col("total_revenue") == F.col("max_revenue"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q18: orders whose total quantity clears a threshold — IN over a
# grouped HAVING subquery (quantities are integral doubles, so the
# HAVING boundary is exact in both engines).
# ---------------------------------------------------------------------------

_Q18_ORACLE = """
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       CAST(o.o_orderdate AS DATE) AS order_date,
       ROUND(o.o_totalprice, 4) AS total_price,
       ROUND(SUM(l.l_quantity), 4) AS total_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
)
GROUP BY c.c_custkey, c.c_name, o.o_orderkey, CAST(o.o_orderdate AS DATE), o.o_totalprice
ORDER BY o.o_orderkey
"""


@query("large_quantity_orders_q18", _Q18_ORACLE)
def large_quantity_orders_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: the IN-subquery becomes a semi join against a
    grouped aggregate. The qualifying key set is a fixed FRACTION of
    orders, so it scales with SF — no broadcast hint; AQE sizes the
    semi join at runtime (broadcast at small SF, shuffle at 100 TB)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        o.join(big, o["o_orderkey"] == F.col("big_orderkey"), "left_semi")
        .join(c, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_totalprice",
        )
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "order_date",
            F.round("o_totalprice", 4).alias("total_price"),
            "total_qty",
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Q19: disjunctive OR-of-ANDs predicate spanning both join sides.
# ---------------------------------------------------------------------------

_Q19_ORACLE = """
SELECT CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000.0
                    + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@query("disjunctive_revenue_q19", _Q19_ORACLE)
def disjunctive_revenue_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: the OR-of-ANDs mixes columns from both sides, so it
    must evaluate post-join — but the per-side implied filters
    (brand IN ..., size <= 15, quantity <= 30) are derivable; we push
    the part-side prune explicitly."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#13", "Brand#20", "Brand#23")
        & (F.col("p_size") >= 1)
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .filter(cond)
        .agg(
            quantized_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q22 (adapted: no phone column — the "country code" is the last
# character of c_name; "dormant" = no order since 2000-01-01, because
# at sf>=0.01 every high-balance customer has *some* order and the
# literal no-orders form verifies zero rows).
# ---------------------------------------------------------------------------

_Q22_ORACLE = """
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(FLOOR(c_acctbal * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         / 10000.0 AS totacctbal
FROM (
  SELECT SUBSTRING(c.c_name, LENGTH(c.c_name), 1) AS cntrycode, c.c_acctbal
  FROM customer c
  WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                       WHERE c_acctbal > CAST(0 AS DOUBLE))
    AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                    AND CAST(o.o_orderdate AS DATE) >= DATE '2000-01-01')
)
GROUP BY cntrycode
ORDER BY cntrycode
"""


@query("dormant_customers_q22", _Q22_ORACLE)
def dormant_customers_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: scalar-avg subquery (broadcast single row) + anti
    join + grouped rollup on a derived code."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    recent = o.filter(
        F.col("o_orderdate").cast("date") >= F.lit("2000-01-01").cast("date")
    )
    rich = (
        c.join(F.broadcast(avg_bal), c["c_acctbal"] > F.col("avg_bal"))
        .join(recent, c["c_custkey"] == recent["o_custkey"], "left_anti")
    )
    return (
        rich.select(
            F.expr("substring(c_name, length(c_name), 1)").alias("cntrycode"),
            "c_acctbal",
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            quantized_sum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
