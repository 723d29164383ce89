"""SCD Type 2 dimension merge (operators/merge.py: scd2_upsert)."""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from calorista_spark.operators.merge import scd2_upsert

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("city", T.StringType()),
        T.StructField("tier", T.StringType()),
        T.StructField("valid_from", T.TimestampType()),
        T.StructField("valid_to", T.TimestampType()),
    ]
)

UPD_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("city", T.StringType()),
        T.StructField("tier", T.StringType()),
        T.StructField("effective_ts", T.TimestampType()),
    ]
)

T0 = datetime.datetime(2024, 1, 1)
T1 = datetime.datetime(2024, 2, 1)
T2 = datetime.datetime(2024, 3, 1)


def _dim(spark):
    return spark.createDataFrame(
        [
            (1, "kyiv", "gold", T0, T1),      # history row (already closed)
            (1, "lviv", "gold", T1, None),    # current
            (2, "odesa", "silver", T0, None), # current, will change
            (3, "dnipro", "bronze", T0, None),# current, no update
        ],
        SCHEMA,
    )


def test_scd2_change_new_and_noop(spark):
    updates = spark.createDataFrame(
        [
            (2, "odesa", "gold", T2),     # tier change → close + open
            (3, "dnipro", "bronze", T2),  # identical → no-op
            (4, "kharkiv", "silver", T2), # new key → insert
        ],
        UPD_SCHEMA,
    )
    out = scd2_upsert(_dim(spark), updates, ["k"])
    rows = {
        (r.k, r.city, r.tier, r.valid_from, r.valid_to) for r in out.collect()
    }
    assert rows == {
        (1, "kyiv", "gold", T0, T1),        # history untouched
        (1, "lviv", "gold", T1, None),      # current kept
        (2, "odesa", "silver", T0, T2),     # closed at effective ts
        (2, "odesa", "gold", T2, None),     # new current version
        (3, "dnipro", "bronze", T0, None),  # no-op kept
        (4, "kharkiv", "silver", T2, None), # brand-new key
    }


def test_scd2_idempotent_on_identical_updates(spark):
    updates = spark.createDataFrame(
        [(2, "odesa", "gold", T2)], UPD_SCHEMA
    )
    once = scd2_upsert(_dim(spark), updates, ["k"])
    twice = scd2_upsert(once, updates, ["k"])
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_scd2_multiple_updates_per_key_take_latest(spark):
    # ADVICE r01: several updates for one key in a batch must not fan
    # out through the full-outer join; the latest effective_ts wins and
    # exactly one row closes + one opens.
    updates = spark.createDataFrame(
        [
            (2, "odesa", "gold", T1),
            (2, "odesa", "platinum", T2),  # later — must win
        ],
        UPD_SCHEMA,
    )
    out = scd2_upsert(_dim(spark), updates, ["k"])
    k2 = sorted(
        (r.city, r.tier, r.valid_from, r.valid_to)
        for r in out.filter(out.k == 2).collect()
    )
    assert k2 == [
        ("odesa", "platinum", T2, None),  # single new current
        ("odesa", "silver", T0, T2),      # single closed row
    ]


def test_scd2_exactly_one_current_row_per_key(spark):
    updates = spark.createDataFrame(
        [(1, "kyiv", "platinum", T2), (2, "odesa", "gold", T2)], UPD_SCHEMA
    )
    out = scd2_upsert(_dim(spark), updates, ["k"])
    current_counts = (
        out.filter(out.valid_to.isNull()).groupBy("k").count().collect()
    )
    assert all(r["count"] == 1 for r in current_counts)
    assert {r.k for r in current_counts} == {1, 2, 3}


def test_scd2_tombstones_end_date_current_only(spark):
    """r8 CDC delete path: tombstones close the current row (no
    successor), ignore unknown/closed keys, and replaying the feed is
    a fixpoint."""
    from calorista_spark.operators.merge import scd2_apply_tombstones

    tombs = spark.createDataFrame(
        [(2, T2), (2, datetime.datetime(2024, 4, 1)),  # dup → earliest wins
         (9, T2)],                                      # unknown key → no-op
        T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("effective_ts", T.TimestampType()),
            ]
        ),
    )
    out = scd2_apply_tombstones(_dim(spark), tombs, ["k"])
    rows = {
        (r.k, r.city, r.valid_from, r.valid_to) for r in out.collect()
    }
    assert rows == {
        (1, "kyiv", T0, T1),   # history untouched
        (1, "lviv", T1, None), # current, not tombstoned
        (2, "odesa", T0, T2),  # retired at the EARLIEST tombstone
        (3, "dnipro", T0, None),
    }
    # idempotent replay: applying the same feed again changes nothing
    again = scd2_apply_tombstones(out, tombs, ["k"])
    assert {
        (r.k, r.city, r.valid_from, r.valid_to) for r in again.collect()
    } == rows


def test_merge_upsert_cdc_branches(spark):
    """All four CDC branches: insert, replace, matched delete,
    unmatched delete (no-op)."""
    from calorista_spark.operators.merge import merge_upsert_cdc

    tgt = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    src = spark.createDataFrame(
        [
            (2, "B", "upsert"),   # replace
            (3, None, "delete"),  # matched delete
            (4, "d", "upsert"),   # insert
            (5, None, "delete"),  # unmatched delete → no-op
        ],
        ["k", "v", "op"],
    )
    out = merge_upsert_cdc(tgt, src, ["k"])
    assert {(r.k, r.v) for r in out.collect()} == {
        (1, "a"), (2, "B"), (4, "d")
    }
    # replay idempotence: applying the same CDC batch to its own
    # output is a fixpoint
    out2 = merge_upsert_cdc(out, src, ["k"])
    assert {(r.k, r.v) for r in out2.collect()} == {
        (1, "a"), (2, "B"), (4, "d")
    }


def test_merge_classify_cdc_branches(spark):
    from calorista_spark.operators.merge import (
        merge_classify,
        with_row_hash,
    )

    tgt = with_row_hash(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c"), (6, "f")], ["k", "v"]
        )
    )
    src = with_row_hash(
        spark.createDataFrame(
            [
                (2, "B", "upsert"),
                (3, "c", "upsert"),
                (4, "d", "upsert"),
                (6, None, "delete"),
                (7, None, "delete"),
            ],
            ["k", "v", "op"],
        ),
        exclude=("op",),
    )
    got = {
        r.k: r.action
        for r in merge_classify(tgt, src, ["k"], op_col="op").collect()
    }
    assert got == {
        1: "keep",
        2: "update",
        3: "unchanged",
        4: "insert",
        6: "delete",
        7: "delete_noop",
    }
