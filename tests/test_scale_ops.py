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


def test_dynamic_partition_pruning_on_partitioned_store(spark, tmp_path):
    # the 100 TB layout: fact partitioned by date; a filtered dim join
    # must prune fact partitions at runtime (DPP), not scan them all
    store = str(tmp_path / "dpp_store")
    facts = spark.createDataFrame(
        [(d, i, float(i)) for d in ("2024-01-01", "2024-01-02", "2024-01-03")
         for i in range(100)],
        ["date", "k", "v"],
    )
    facts.write.partitionBy("date").mode("overwrite").parquet(store)

    dim = spark.createDataFrame(
        [("2024-01-01", "keep"), ("2024-01-02", "drop"), ("2024-01-03", "drop")],
        ["date", "tag"],
    )
    # DPP plans a pruning subquery only when the dim side carries a
    # selective filter; stats-based benefit estimation is disabled so
    # the toy-sized fixture still exercises the rule
    spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.useStats", "false"
    )
    try:
        joined = (
            spark.read.parquet(store)
            .join(F.broadcast(dim).filter(F.col("tag") == "keep"), "date")
            .groupBy("tag")
            .agg(F.sum("v").alias("total"))
        )
        plan = plan_of_scale(joined)
        assert "dynamicpruning" in plan.lower(), "expected DPP on the scan"
        assert [tuple(r) for r in joined.collect()] == [
            ("keep", float(sum(range(100))))
        ]
    finally:
        spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")


def test_observe_metrics_single_pass(spark):
    # pipeline observability without a second scan: df.observe attaches
    # accumulator-style metrics to the one materialization
    from pyspark.sql import Observation

    obs = Observation("ingest_metrics")
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("bucket")
    )
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.max("bucket").alias("max_bucket"),
    )
    assert observed.count() == 1000
    assert obs.get["n_rows"] == 1000 and obs.get["max_bucket"] == 6


def plan_of_scale(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_runtime_bloom_filter_join_injection(spark, sf_dir):
    """Runtime bloom-filter semi-join pruning (SURVEY §4.3): when a
    selective filter sits on the build side of a shuffle join, Spark
    injects might_contain() into the probe-side scan so most fact rows
    die before the shuffle. The default thresholds are cluster-scale
    (application side >= 10GB), so at 100 TB this fires untouched; the
    test lowers them to prove the engine's join shapes are eligible."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "100MB",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            j.explain("formatted")
        assert "might_contain" in buf.getvalue()
        assert j.count() == 1
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
