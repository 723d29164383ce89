"""The remaining TPC-H plan shapes (Q2, Q11, Q16, Q20, Q21), adapted
to the testdata star schema. There is no partsupp table, so the
distinct (l_partkey, l_suppkey) pairs of lineitem act as the
part-supplier bridge, and per-pair unit cost is derived as
min(l_extendedprice / l_quantity).

These complete the classic join-shape coverage beyond SURVEY §2.8:
groupwise-min with a correlated lookup (Q2), scalar-subquery
threshold over a grouped value (Q11), NOT-IN exclusion + count
distinct (Q16), nested semi-join qualification (Q20), and the
double-correlated EXISTS / NOT EXISTS self-join (Q21).

Scale notes: only nation and region (constant 25/5 rows) carry
broadcast hints; part and supplier joins are AQE-sized — TPC-H scales
both linearly with SF, so at small SF AQE runtime-broadcasts them and
at 100 TB they become shuffle joins without a plan rewrite. lineitem
shuffles only on its aggregation keys. Self-joins in Q21 are
equi-joins on l_orderkey, so Catalyst plans one shuffle per side keyed
on the order; at 100 TB the same plan holds with AQE handling skewed
orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.queries.registry import query


def _part_supplier_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partsupp surrogate: one row per (part, supplier) pair seen
    in lineitem, with the minimum observed unit price as cost."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
    )


# ---------------------------------------------------------------------------
# Q2: minimum-cost supplier per part — groupwise min with a total
# tie-break, restricted to one region and a part subset.
# ---------------------------------------------------------------------------

_Q2_ORACLE = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
cand AS (
  SELECT p.p_partkey, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name, ps.cost
  FROM ps JOIN part p ON ps.l_partkey = p.p_partkey
  JOIN supplier s ON ps.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'ASIA' AND p.p_size < 15 AND p.p_type = 'STANDARD'
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY p_partkey
                               ORDER BY cost, s_suppkey) AS rk
  FROM cand
)
SELECT p_partkey, s_name, n_name,
       ROUND(s_acctbal, 2) AS s_acctbal,
       FLOOR(cost * 10000 + 0.5) / 10000 AS min_cost
FROM ranked WHERE rk = 1
ORDER BY p_partkey
"""
# NB: min_cost quantizes via FLOOR(x*1e4 + 0.5)/1e4 — identical IEEE
# double ops in both engines — because the raw unit cost
# (extendedprice/quantity) lands exactly on round-half boundaries at
# sf0.1 where engine ROUND implementations disagree by 1 ulp.


@query("min_cost_supplier_q2", _Q2_ORACLE)
def min_cost_supplier_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: the correlated min-cost subquery decorrelated into a
    per-part window rank (cost, then supplier key — a total order, so
    exactly one winner per part). nation/region are hint-broadcast
    (constant-size); part and supplier carry NO hint — both are
    SF-scaled, so the broadcast-vs-shuffle choice is left to AQE's
    runtime size check. lineitem shuffles once on (partkey, suppkey)."""
    ps = _part_supplier_cost(spark, sf_dir)
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_size") < 15) & (F.col("p_type") == "STANDARD")
    )
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cand = (
        ps.join(part, ps["l_partkey"] == part["p_partkey"])
        .join(supp, ps["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .select("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name", "cost")
    )
    w = Window.partitionBy("p_partkey").orderBy("cost", "s_suppkey")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "p_partkey",
            "s_name",
            "n_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            # floor-quantized, not ROUND: see the oracle's NB comment
            (F.floor(F.col("cost") * 10000 + 0.5) / 10000).alias("min_cost"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# Q11: important parts — value share above a scalar-subquery threshold
# (2× the average per-part value within the nation group).
# ---------------------------------------------------------------------------

_Q11_ORACLE = """
WITH vals AS (
  SELECT l.l_partkey,
         SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000.0
                        + 0.5) AS BIGINT)) AS value_s
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name IN ('NATION_7', 'NATION_8', 'NATION_9')
  GROUP BY l.l_partkey
)
SELECT l_partkey, CAST(value_s AS DOUBLE) / 10000.0 AS value
FROM vals
WHERE value_s * (SELECT COUNT(*) FROM vals) > 2 * (SELECT SUM(value_s) FROM vals)
ORDER BY value DESC, l_partkey
"""
# NB: quantized sums + an INTEGER-rearranged threshold (value*n > 2*total
# instead of value > 2*total/n) — both the displayed value and the
# cutoff MEMBERSHIP are exact in both engines at any magnitude.


@query("important_parts_q11", _Q11_ORACLE)
def important_parts_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: grouped value + an uncorrelated scalar subquery
    (2× mean) as the HAVING threshold, joined in as a broadcast
    single-row frame so the grouped side is scanned once."""
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_7", "NATION_8", "NATION_9")
    )
    # scaled-integer sums; threshold rearranged to integer arithmetic
    # (value*n > 2*total) so membership is exact — see the oracle NB
    q = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000.0 + 0.5
    ).cast("decimal(18,0)")
    vals = (
        li.join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .groupBy("l_partkey")
        .agg(F.sum(q).alias("value_s"))
    )
    threshold = vals.agg(
        F.sum("value_s").alias("total_s"), F.count(F.lit(1)).alias("n")
    )
    return (
        vals.join(F.broadcast(threshold))
        .filter(F.col("value_s") * F.col("n") > 2 * F.col("total_s"))
        .select(
            "l_partkey",
            (F.col("value_s").cast("double") / 10000.0).alias("value"),
        )
        .orderBy(F.col("value").desc(), "l_partkey")
    )


# ---------------------------------------------------------------------------
# Q16: supplier count per (brand, size) excluding flagged suppliers
# (negative account balance stands in for the complaint predicate).
# ---------------------------------------------------------------------------

_Q16_ORACLE = """
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p.p_brand, p.p_size,
       CAST(COUNT(DISTINCT pr.l_suppkey) AS BIGINT) AS supplier_cnt
FROM pairs pr JOIN part p ON pr.l_partkey = p.p_partkey
WHERE p.p_type <> 'ECONOMY' AND p.p_size IN (5, 10, 15, 20, 25)
  AND pr.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
"""


@query("supplier_cnt_q16", _Q16_ORACLE)
def supplier_cnt_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: NOT IN over a key list with no nulls → left-anti
    join. The oracle's DISTINCT pairs step is deliberately NOT
    materialized on the Spark side: countDistinct already dedups
    map-side during partial aggregation, and an explicit .distinct()
    costs a full extra shuffle (measured 1.4s → 0.9s at sf0.1)."""
    li = read_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey")
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_type") != "ECONOMY")
        & F.col("p_size").isin(5, 10, 15, 20, 25)
    )
    flagged = (
        read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        pairs.join(flagged, pairs["l_suppkey"] == flagged["s_suppkey"], "left_anti")
        .join(part, pairs["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


# ---------------------------------------------------------------------------
# Q20: suppliers who shipped a significant volume of 'red' parts in
# 2000 — a grouped HAVING feeding a supplier/nation report.
# ---------------------------------------------------------------------------

_Q20_ORACLE = """
WITH sq AS (
  SELECT l_suppkey, SUM(l_quantity) AS qty
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE 'red%' AND year(CAST(l_shipdate AS DATE)) = 2000
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, n.n_name, ROUND(sq.qty, 4) AS red_qty
FROM sq
JOIN supplier s ON sq.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE sq.qty > 250
ORDER BY s.s_suppkey
"""


@query("excess_red_volume_q20", _Q20_ORACLE)
def excess_red_volume_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: the red-part key set is AQE-sized (SF-scaled, so
    broadcast only at small SF), the year filter prunes the scan, and
    the qualification is a grouped HAVING on summed quantity — one
    lineitem shuffle on l_suppkey."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.year(F.col("l_shipdate").cast("date")) == 2000
    )
    red = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    sq = (
        li.join(red, li["l_partkey"] == red["p_partkey"])
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 250)
    )
    return (
        sq.join(supp, sq["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .select("s_suppkey", "s_name", "n_name", F.round("qty", 4).alias("red_qty"))
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q21: suppliers solely responsible for returns in multi-supplier
# finished orders — EXISTS + NOT EXISTS over two self-joins.
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN orders o ON l1.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F'
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
"""


@query("waiting_suppliers_q21", _Q21_ORACLE)
def waiting_suppliers_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: EXISTS → left-semi, NOT EXISTS → left-anti, both
    equi-joined on l_orderkey so each self-join is one co-partitioned
    shuffle. Orders filter applies before its join; supplier lookup
    broadcasts; top-20 breaks ties on supplier name."""
    li = read_table(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    supp = read_table(spark, sf_dir, "supplier")

    with_other = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    sole_fail = with_other.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        sole_fail.join(orders, F.col("l1.l_orderkey") == orders["o_orderkey"])
        .join(supp, F.col("l1.l_suppkey") == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
