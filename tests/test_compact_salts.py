"""r14 compact placement: pre-solved hash-slot salts replace
repartitionByRange's boundary-sampling pass (guide §2.4).

Two invariants keep the optimization honest:

1. ``_murmur3_long`` is bit-exact with Spark's ``F.hash`` on LongType
   (HashPartitioning's partition id is ``pmod(murmur3(expr, 42), n)``),
   so a salt solved driver-side lands its bin in exactly the intended
   shuffle slot.
2. A clustered compact still produces at most ``want`` files per
   partition with disjoint contiguous order ranges — the property the
   old range placement guaranteed and the salts must preserve.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from calorista_spark.sources.commitlog import CommitLogStore


def test_murmur3_long_matches_spark_hash(spark):
    values = list(range(-50, 50)) + [
        2**31,
        -(2**31),
        2**62,
        -(2**62),
        123456789012345,
    ]
    rows = (
        spark.createDataFrame([(v,) for v in values], "id long")
        .select("id", F.hash("id").alias("h"))
        .collect()
    )
    for r in rows:
        assert CommitLogStore._murmur3_long(r["id"]) == r["h"], r["id"]


def test_hash_slot_salts_cover_every_slot():
    for n in (1, 2, 7, 64, 119):
        salts = CommitLogStore._hash_slot_salts(n)
        assert len(salts) == n
        for slot, s in enumerate(salts):
            assert CommitLogStore._murmur3_long(s) % n == slot


def test_clustered_compact_one_file_per_bin(spark, tmp_path):
    """Each partition lands at most ``want`` files, and the files'
    cluster-key ranges are disjoint (the stat-tightness property)."""
    store = CommitLogStore(str(tmp_path / "store"))
    df = spark.range(0, 4000).select(
        (F.col("id") % 4).cast("string").alias("p"),
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    # many small input files per partition
    store.commit(
        df.repartition(16),
        op="overwrite",
        expect_version=None,
        partition_by="p",
    )
    m1 = store.manifest(1)
    per_part_bytes = {
        val: sum(m1["stats"][f]["bytes"] for f in fl)
        for val, fl in m1["partitions"].items()
    }
    target = max(per_part_bytes.values()) // 3
    v2 = store.compact(
        spark, target_file_bytes=target, cluster_by=["k"], layout="linear"
    )
    m2 = store.manifest(v2)
    for val, fl in m2["partitions"].items():
        want = max(1, -(-per_part_bytes[val] // target))
        assert len(fl) <= want, (val, len(fl), want)
        # disjoint contiguous k-ranges across the partition's files
        ranges = sorted(
            (
                m2["stats"][f]["cols"]["k"]["min"],
                m2["stats"][f]["cols"]["k"]["max"],
            )
            for f in fl
        )
        for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
            assert hi < lo, (val, ranges)
    # data identical across the compact
    a = store.read(spark, 1).orderBy("k").collect()
    b = store.read(spark, v2).orderBy("k").collect()
    assert a == b
    # convergent: clustered output can compress smaller than its
    # input (sorted columns delta-encode), so ONE re-bin to the new
    # byte count is legitimate — but the schedule must then be a
    # fixpoint (no commit), exactly like the pre-salt range placement
    v3 = store.compact(
        spark, target_file_bytes=target, cluster_by=["k"], layout="linear"
    )
    assert (
        store.compact(
            spark,
            target_file_bytes=target,
            cluster_by=["k"],
            layout="linear",
        )
        == v3
    )
