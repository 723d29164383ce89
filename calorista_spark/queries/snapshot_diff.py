"""Snapshot reconciliation (table diff) — the audit face of the
engine's merge layer (SURVEY §2.4 O-D3's three branches, generalized
to whole-table comparison): given two snapshots of a table, classify
every key as added / removed / changed / unchanged.

This is the operator a pipeline runs to validate an incremental sync
against a full re-extract, or to diff yesterday's store against
today's. One full-outer join on the key; change detection compares a
canonical content value, so wide rows cost one hash each, not one
comparison per column.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.queries.registry import query

# Snapshot A = orders keys [0, 1200); snapshot B = keys [100, 1300)
# with a 10% price bump on [100, 200) — so the diff exhibits all four
# actions deterministically from the one immutable test table.

_DIFF_ORACLE = """
WITH a AS (
  SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
  FROM orders WHERE o_orderkey < 1200
),
b AS (
  SELECT o_orderkey,
         ROUND(CASE WHEN o_orderkey < 200 THEN o_totalprice * 1.1
                    ELSE o_totalprice END, 2) AS price
  FROM orders WHERE o_orderkey >= 100 AND o_orderkey < 1300
)
SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
       CASE WHEN a.o_orderkey IS NULL THEN 'added'
            WHEN b.o_orderkey IS NULL THEN 'removed'
            WHEN a.price <> b.price THEN 'changed'
            ELSE 'unchanged' END AS action,
       a.price AS price_a,
       b.price AS price_b
FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
ORDER BY o_orderkey
"""


@query("orders_snapshot_diff", _DIFF_ORACLE)
def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table diff via one full-outer join on the key. The comparison
    value here is one rounded column; for wide tables the engine
    substitutes the canonical row hash (operators/merge.with_row_hash)
    so the diff stays a single-column comparison at any width."""
    orders = read_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") < 1200).select(
        F.col("o_orderkey").alias("key_a"),
        F.round("o_totalprice", 2).alias("price_a"),
    )
    bumped = F.when(
        F.col("o_orderkey") < 200, F.col("o_totalprice") * 1.1
    ).otherwise(F.col("o_totalprice"))
    b = orders.filter(
        (F.col("o_orderkey") >= 100) & (F.col("o_orderkey") < 1300)
    ).select(
        F.col("o_orderkey").alias("key_b"),
        F.round(bumped, 2).alias("price_b"),
    )
    j = a.join(b, a["key_a"] == b["key_b"], "full_outer")
    action = (
        F.when(F.col("key_a").isNull(), F.lit("added"))
        .when(F.col("key_b").isNull(), F.lit("removed"))
        .when(F.col("price_a") != F.col("price_b"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        F.coalesce(F.col("key_a"), F.col("key_b")).alias("o_orderkey"),
        action.alias("action"),
        "price_a",
        "price_b",
    ).orderBy("o_orderkey")


@query("store_version_diff", _DIFF_ORACLE)
def store_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders_snapshot_diff re-expressed over TWO COMMITTED VERSIONS
    of a commit-log store (r9 — sources/commitlog.py): snapshot A is
    committed as v1, snapshot B as v2 (derived exactly as in
    orders_snapshot_diff, so the oracle is shared verbatim), then the
    diff reads ``store.read(version=1)`` against
    ``store.read(version=2)`` — the time-travel audit a real pipeline
    runs after every MERGE ("what did that commit change?"). The
    store is rebuilt deterministically per call, so the query stays a
    pure function of the orders table."""
    import hashlib
    import shutil
    import tempfile

    from calorista_spark.sources.commitlog import CommitLogStore

    orders = read_table(spark, sf_dir, "orders")
    snap_a = orders.filter(F.col("o_orderkey") < 1200).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )
    bumped = F.when(
        F.col("o_orderkey") < 200, F.col("o_totalprice") * 1.1
    ).otherwise(F.col("o_totalprice"))
    snap_b = orders.filter(
        (F.col("o_orderkey") >= 100) & (F.col("o_orderkey") < 1300)
    ).select("o_orderkey", F.round(bumped, 2).alias("price"))

    # per-(input, process) path: concurrent sessions (sweep + pytest +
    # stress audit) must not rmtree each other's live store mid-read
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = os.path.join(
        tempfile.gettempdir(), f"calorista_store_diff_{tag}_{os.getpid()}"
    )
    shutil.rmtree(path, ignore_errors=True)
    store = CommitLogStore(path)
    v1 = store.commit(snap_a, op="overwrite", expect_version=None)
    v2 = store.commit(snap_b, op="overwrite", expect_version=v1)
    if (v1, v2) != (1, 2):  # not assert: must hold under python -O too
        raise RuntimeError(f"unexpected store versions {(v1, v2)}")

    a = store.read(spark, version=v1).select(
        F.col("o_orderkey").alias("key_a"), F.col("price").alias("price_a")
    )
    b = store.read(spark, version=v2).select(
        F.col("o_orderkey").alias("key_b"), F.col("price").alias("price_b")
    )
    j = a.join(b, a["key_a"] == b["key_b"], "full_outer")
    action = (
        F.when(F.col("key_a").isNull(), F.lit("added"))
        .when(F.col("key_b").isNull(), F.lit("removed"))
        .when(F.col("price_a") != F.col("price_b"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        F.coalesce(F.col("key_a"), F.col("key_b")).alias("o_orderkey"),
        action.alias("action"),
        "price_a",
        "price_b",
    ).orderBy("o_orderkey")
