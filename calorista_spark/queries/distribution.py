"""Distribution diagnostics: key-skew profiling (the pre-flight check
before choosing a salted join, operators/joins.salted_join) and
set-valued aggregation (behavior signatures).

At 100 TB, skew is the difference between a 10-minute and a 10-hour
join — the skew report is the measurement that decides the strategy,
itself just two cheap keyed aggregations (count per key, then count
of counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.queries.registry import query

# ---------------------------------------------------------------------------
# Key-skew report: the fan-out histogram of lineitem's join key.
# ---------------------------------------------------------------------------

_SKEW_ORACLE = """
WITH per_key AS (
  SELECT l_orderkey, COUNT(*) AS n_rows
  FROM lineitem GROUP BY l_orderkey
)
SELECT n_rows AS rows_per_key,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(n_rows) AS BIGINT) AS total_rows
FROM per_key
GROUP BY n_rows
ORDER BY n_rows
"""


@query("lineitem_key_skew_report", _SKEW_ORACLE)
def lineitem_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key fan-out histogram (count of keys per rows-per-key):
    two keyed aggregations, both map-side combinable. Reading this
    histogram is how the engine decides between a plain shuffle join,
    a broadcast, or salting (operators/joins.salted_join) — heavy
    tail ⇒ salt."""
    li = read_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_rows"))
    return (
        per_key.groupBy(F.col("n_rows").alias("rows_per_key"))
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n_rows").cast("bigint").alias("total_rows"),
        )
        .orderBy("rows_per_key")
    )


# ---------------------------------------------------------------------------
# Set-valued aggregation: per-user behavior signature = the sorted set
# of event types, then the signature census.
# ---------------------------------------------------------------------------

_SIGNATURE_ORACLE = """
WITH sigs AS (
  SELECT user_id,
         list_aggregate(list_sort(list(DISTINCT event_type)),
                        'string_agg', '+') AS signature
  FROM events
  WHERE ts < TIMESTAMP '2024-01-04 00:00:00'
  GROUP BY user_id
)
SELECT signature, CAST(COUNT(*) AS BIGINT) AS n_users
FROM sigs
GROUP BY signature
ORDER BY n_users DESC, signature
"""


@query("user_behavior_signatures", _SIGNATURE_ORACLE)
def user_behavior_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavior signatures (first 3 days, where type sets still
    differ) via set-valued aggregation: collect_set →
    array_sort → join — deterministic despite collect_set's arbitrary
    order because the sort canonicalizes before any comparison. The
    census shuffle carries one short string per user."""
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("ts") < F.expr("TIMESTAMP_NTZ '2024-01-04 00:00:00'")
    )
    sigs = ev.groupBy("user_id").agg(
        F.array_join(
            F.array_sort(F.collect_set("event_type")), "+"
        ).alias("signature")
    )
    return (
        sigs.groupBy("signature")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), "signature")
    )


# ---------------------------------------------------------------------------
# Revenue-concentration (Pareto) curve by customer decile.
# ---------------------------------------------------------------------------

_PARETO_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 1e4 + 0.5) AS HUGEINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT rev, row_number() OVER (ORDER BY rev DESC, o_custkey) AS rn,
         COUNT(*) OVER () AS n
  FROM per_cust
),
agg AS (
  SELECT CAST(((rn - 1) * 10) // n + 1 AS INTEGER) AS decile,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(rev) AS BIGINT) AS rev_scaled
  FROM ranked GROUP BY 1
),
tot AS (SELECT CAST(SUM(rev_scaled) AS BIGINT) AS total FROM agg)
SELECT decile, n_customers,
       CAST(rev_scaled AS DOUBLE) / 1e4 AS revenue,
       FLOOR(rev_scaled * 100.0 / total * 1e4 + 0.5) / 1e4 AS share_pct,
       FLOOR(SUM(rev_scaled) OVER (ORDER BY decile) * 100.0 / total * 1e4
             + 0.5) / 1e4 AS cum_share_pct
FROM agg, tot
ORDER BY decile
"""


@query("customer_revenue_pareto", _PARETO_ORACLE)
def customer_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration by customer decile (the Pareto / "top 10%
    of customers drive X% of revenue" curve). Per-customer revenue is
    a bounded keyed sum of scaled integers (exact); deciles come from
    the distributed two-pass row number (no single-task sort of the
    customer dimension); the only partition-less window is the
    10-row cumulative share — bounded O(deciles)."""
    from calorista_spark.operators.ranks import global_row_number

    orders = read_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 1e4 + F.lit(0.5)).cast("long")
        ).alias("rev")
    )
    # r14: customer count rides the rank op's offsets frame
    # (attach_total) — the old separate per_cust.agg(count) recomputed
    # the whole per-customer revenue aggregation a second time
    ranked = global_row_number(
        per_cust,
        [F.col("rev").desc(), F.col("o_custkey")],
        out_col="rn",
        attach_total="__n",
    )
    agg = (
        ranked
        .select(
            (
                F.floor((F.col("rn") - 1) * 10 / F.col("__n")).cast("int") + 1
            ).alias("decile"),
            "rev",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("rev").alias("rev_scaled"),
        )
    )
    tot = agg.agg(F.sum("rev_scaled").alias("__total"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        agg.join(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            (F.col("rev_scaled").cast("double") / 1e4).alias("revenue"),
            (
                F.floor(
                    F.col("rev_scaled") * 100.0 / F.col("__total") * 1e4
                    + F.lit(0.5)
                )
                / 1e4
            ).alias("share_pct"),
            (
                F.floor(
                    F.sum("rev_scaled").over(w)
                    * 100.0
                    / F.col("__total")
                    * 1e4
                    + F.lit(0.5)
                )
                / 1e4
            ).alias("cum_share_pct"),
        )
        .orderBy("decile")
    )
