"""Result materialization + cache policy (SURVEY §2.1 S12).

The reference caches the full dashboard frame for 3600 s
(streamlit_app.py:19,114) and the Redis connection as a resource.
Engine equivalents: ``cached_view`` pins a DataFrame in executor
memory under a name (Spark's cache is the resource cache; TTL becomes
an explicit ``refresh``), and a materialized store table is simply a
parquet write the next reader scans with pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def cached_view(df: DataFrame, name: str) -> DataFrame:
    """S12: persist + register — subsequent ``spark.table(name)``
    reads hit the in-memory columnar cache, the engine's analog of the
    reference's TTL'd result cache."""
    df.createOrReplaceTempView(name)
    df.sparkSession.catalog.cacheTable(name)
    return df


def refresh(spark: SparkSession, name: str) -> None:
    """Drop the cached copy (the reference's TTL expiry, made
    explicit — a scheduler calls this every cache period)."""
    if spark.catalog.isCached(name):
        spark.catalog.uncacheTable(name)
