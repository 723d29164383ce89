"""Distribution diagnostics: key-skew profiling (the pre-flight check
before choosing a salted join, operators/joins.salted_join) and
set-valued aggregation (behavior signatures).

At 100 TB, skew is the difference between a 10-minute and a 10-hour
join — the skew report is the measurement that decides the strategy,
itself just two cheap keyed aggregations (count per key, then count
of counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
