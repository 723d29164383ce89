"""Scale-policy operators: salted joins (skew) and bucketed tables
(shuffle-free co-located joins). Correctness here, plan shape where
observable."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from calorista_spark.operators.joins import salted_join
from calorista_spark.sources.parquet_io import write_bucketed_table


def test_salted_join_matches_plain_join(spark):
    # skewed left: one hot key with many rows
    left = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 0), (3, 1)], ["k", "payload"]
    )
    right = spark.createDataFrame([(1, "hot"), (2, "cold"), (4, "orphan")], ["k", "v"])
    plain = left.join(right, "k").select("k", "payload", "v")
    salted = salted_join(left, right, "k", salt_buckets=8).select("k", "payload", "v")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_deterministic(spark):
    left = spark.createDataFrame([(1, i) for i in range(50)], ["k", "payload"])
    right = spark.createDataFrame([(1, "x")], ["k", "v"])
    a = sorted(map(tuple, salted_join(left, right, "k", 4).collect()))
    b = sorted(map(tuple, salted_join(left, right, "k", 4).collect()))
    assert a == b


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    facts = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v1")
    )
    dims = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v2")
    )
    write_bucketed_table(facts, "t_facts", "k", num_buckets=8, sort_col="k")
    write_bucketed_table(dims, "t_dims", "k", num_buckets=8, sort_col="k")
    joined = spark.table("t_facts").join(spark.table("t_dims"), "k")
    # same bucketing on both sides → no Exchange (shuffle) in the plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        buf = io.StringIO()
        with redirect_stdout(buf):
            spark.table("t_facts").join(spark.table("t_dims"), "k").explain()
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert joined.count() == 100
    spark.sql("DROP TABLE IF EXISTS t_facts")
    spark.sql("DROP TABLE IF EXISTS t_dims")
