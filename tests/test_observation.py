"""Spark Observation API: pipeline-health metrics collected as a side
channel of a REAL query execution (no second pass over the data) —
the mechanism a production job uses to emit row counts / invalid
counts to its monitoring without an extra action."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table


def test_observation_metrics_match_direct_aggregates(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    obs = Observation("corpus_health")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.length("text") < 10, 1)).alias("n_short"),
        F.sum("n_chars").alias("total_chars"),
    )
    # run a real downstream aggregation; metrics ride along
    per_source = observed.groupBy("source").count()
    n_sources = per_source.count()
    got = obs.get
    want_rows = docs.count()
    want_short = docs.filter(F.length("text") < 10).count()
    want_chars = docs.agg(F.sum("n_chars")).first()[0]
    assert got["n_rows"] == want_rows
    assert got["n_short"] == want_short
    assert got["total_chars"] == want_chars
    assert n_sources == docs.select("source").distinct().count()
