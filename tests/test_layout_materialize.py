"""Z-order layout + incremental rollup maintenance (SURVEY §4.1/§4.3
custom work items)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from calorista_spark.materialize import incremental_rollup_refresh
from calorista_spark.operators.layout import (
    quantize,
    zorder_key,
    zorder_repartition,
)


def test_zorder_key_interleaves_bits(spark):
    # x=0b0011, y=0b0101 → z bit i*2 from x, i*2+1 from y:
    # x bits (1,1,0,0) at positions 0,2,4,6 → 0b00010101 = 5 from x? compute:
    # x contributes 1<<0, 1<<2 = 5; y contributes 1<<1, 1<<5 = 34; z = 39
    df = spark.createDataFrame([(3, 5)], ["x", "y"])
    z = df.select(
        zorder_key([F.col("x"), F.col("y")], bits=4).alias("z")
    ).first()["z"]
    assert z == (1 << 0) + (1 << 2) + (1 << 1) + (1 << 5)


def test_quantize_clamps_and_scales(spark):
    df = spark.createDataFrame(
        [(0.0,), (50.0,), (100.0,), (150.0,), (-10.0,)], ["v"]
    )
    out = [
        r[0]
        for r in df.select(
            quantize(F.col("v"), 0.0, 100.0, bits=8).alias("q")
        ).collect()
    ]
    assert out[0] == 0 and out[2] == 255 and out[3] == 255 and out[4] == 0
    assert 125 <= out[1] <= 130  # mid-range lands mid-grid


def test_zorder_repartition_tightens_per_file_ranges(spark, tmp_path):
    # clustered layout: per-partition bounding boxes on BOTH dims must
    # be far tighter than the unclustered write's
    n = 4096
    df = spark.range(n).select(
        (F.col("id") % 64).alias("x"),
        ((F.col("id") * 2654435761) % 64).alias("y"),
        F.col("id").alias("payload"),
    )
    zdf = zorder_repartition(
        df, ["x", "y"], {"x": (0, 63), "y": (0, 63)}, bits=6, num_partitions=16
    )
    assert sorted(map(tuple, zdf.collect())) == sorted(map(tuple, df.collect()))

    spans = (
        zdf.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        )
        .agg(F.avg(F.col("dx") + F.col("dy")).alias("span"))
        .first()["span"]
    )
    # unclustered baseline: every partition spans ~the full 63+63 grid
    assert spans < 80, f"z-order should tighten bounding boxes, got {spans}"


def _rollup(df):
    return df.groupBy("date").agg(
        F.sum("v").alias("total"), F.count(F.lit(1)).alias("n")
    )


def test_incremental_rollup_refreshes_only_affected_partitions(
    spark, tmp_path
):
    rollup_path = str(tmp_path / "rollup")
    fact_rows = [
        ("2024-01-01", 1.0),
        ("2024-01-01", 2.0),
        ("2024-01-02", 3.0),
        ("2024-01-03", 4.0),
    ]
    fact = spark.createDataFrame(fact_rows, ["date", "v"])
    # initial full materialization
    _rollup(fact).write.partitionBy("date").mode("overwrite").parquet(
        rollup_path
    )
    untouched = sorted(glob.glob(f"{rollup_path}/date=2024-01-02/*.parquet"))
    mtimes_before = [os.path.getmtime(p) for p in untouched]

    # a sync touches only 01-01 (new row) and 01-03 (change)
    batch = spark.createDataFrame(
        [("2024-01-01", 10.0), ("2024-01-03", 40.0)], ["date", "v"]
    )
    fact2 = fact.union(batch)
    refreshed = incremental_rollup_refresh(
        fact2, batch, rollup_path, "date", _rollup
    )
    assert sorted(refreshed) == ["2024-01-01", "2024-01-03"]

    # rollup now equals a full recompute
    # partition values are type-inferred on read (string → DATE);
    # compare on the string form
    got = {
        str(r.date): (r.total, r.n)
        for r in spark.read.parquet(rollup_path).collect()
    }
    want = {str(r.date): (r.total, r.n) for r in _rollup(fact2).collect()}
    assert got == want

    # the untouched partition's files were not rewritten
    assert [os.path.getmtime(p) for p in untouched] == mtimes_before


def test_incremental_rollup_empty_batch_is_noop(spark, tmp_path):
    rollup_path = str(tmp_path / "rollup")
    fact = spark.createDataFrame([("2024-01-01", 1.0)], ["date", "v"])
    _rollup(fact).write.partitionBy("date").mode("overwrite").parquet(
        rollup_path
    )
    out = incremental_rollup_refresh(
        fact, fact.limit(0), rollup_path, "date", _rollup
    )
    assert out == []


def test_compact_store_reduces_file_count(spark, tmp_path):
    from calorista_spark.sources.parquet_io import compact_store

    store = str(tmp_path / "frag")
    # simulate micro-batch accretion: 6 appends → ≥6 files per partition
    for batch in range(6):
        spark.createDataFrame(
            [("2024-01-01", batch, float(batch)), ("2024-01-02", batch, 1.0)],
            ["date", "k", "v"],
        ).write.mode("append").partitionBy("date").parquet(store)

    def files_per_part():
        return {
            d: len(glob.glob(f"{store}/date={d}/*.parquet"))
            for d in ("2024-01-01", "2024-01-02")
        }

    before = files_per_part()
    assert all(v >= 6 for v in before.values())
    rows_before = sorted(map(tuple, spark.read.parquet(store).collect()))

    out = compact_store(spark, store, "date")
    after = files_per_part()
    assert all(v == 1 for v in after.values()), after
    assert out == {"2024-01-01": 1, "2024-01-02": 1}
    # content identical after the rewrite
    assert sorted(map(tuple, spark.read.parquet(store).collect())) == rows_before


def test_schema_evolution_merge_read(spark, tmp_path):
    # additive schema evolution on the store: old files lack the new
    # column; mergeSchema read surfaces it as nulls for old rows
    store = str(tmp_path / "evolve")
    spark.createDataFrame([(1, "a")], ["id", "name"]).write.mode(
        "append"
    ).parquet(store)
    spark.createDataFrame(
        [(2, "b", 9.5)], ["id", "name", "score"]
    ).write.mode("append").parquet(store)

    merged = spark.read.option("mergeSchema", "true").parquet(store)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows[1] is None and rows[2] == 9.5
