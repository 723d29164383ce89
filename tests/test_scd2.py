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


def test_merge_upsert_cdc_duplicate_key_raises(spark):
    """r9 (ADVICE r8, medium): the one-source-row-per-key-per-batch
    contract is enforced — a batch carrying two ops for one key must
    fail loudly at execution, not fan out through the full-outer join
    with op order ignored."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.base import PySparkException

    from calorista_spark.operators.merge import merge_upsert_cdc

    tgt = spark.createDataFrame([(1, "a")], ["k", "v"])
    src = spark.createDataFrame(
        [(1, "A", "upsert"), (1, None, "delete")], ["k", "v", "op"]
    )
    with pytest.raises((Py4JJavaError, PySparkException)) as exc:
        merge_upsert_cdc(tgt, src, ["k"]).collect()
    assert "multiple source rows" in str(exc.value)


def test_merge_upsert_cdc_seq_reduce_latest_op_wins(spark):
    """With seq_col the source reduces to the latest op per key, so a
    later delete beats an earlier upsert (and vice versa) — the exact
    fan-out/op-order bug the r8 ADVICE described."""
    from calorista_spark.operators.merge import merge_upsert_cdc

    tgt = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    src = spark.createDataFrame(
        [
            (1, "A", "upsert", 1),   # key 1: upsert then delete → gone
            (1, None, "delete", 2),
            (2, None, "delete", 1),  # key 2: delete then upsert → kept
            (2, "B", "upsert", 2),
            (3, "c", "upsert", 1),   # key 3: two upserts → latest wins
            (3, "C", "upsert", 2),
        ],
        ["k", "v", "op", "seq"],
    )
    out = merge_upsert_cdc(tgt, src, ["k"], seq_col="seq")
    assert {(r.k, r.v) for r in out.collect()} == {(2, "B"), (3, "C")}
    # same-seq tie: the delete is the conservative winner
    tie = spark.createDataFrame(
        [(2, "B2", "upsert", 5), (2, None, "delete", 5)],
        ["k", "v", "op", "seq"],
    )
    out2 = merge_upsert_cdc(tgt, tie, ["k"], seq_col="seq")
    assert {(r.k, r.v) for r in out2.collect()} == {(1, "a")}


def test_merge_upsert_cdc_equal_seq_equal_op_tiebreak_exact(spark):
    """r10 (VERDICT r9 #5): two DISTINCT rows with equal seq and equal
    op must reduce to a deterministic winner independent of row order —
    the final tie-break is the collision-proof sha2 row hash, so the
    winner is the row with the smaller canonical hash, both ways."""
    import hashlib
    import json as _json

    from calorista_spark.operators.merge import merge_upsert_cdc

    tgt = spark.createDataFrame([(9, "z")], ["k", "v"])
    rows = [(1, "left", "upsert", 7), (1, "right", "upsert", 7)]

    def canonical_hash(k, v, op, seq):
        # mirror the reduce's tie-break: sha2(to_json(struct(sorted
        # non-seq cols)), 256) — seq is excluded (it is equal within a
        # tie by construction)
        payload = _json.dumps(
            {"k": k, "op": op, "v": v}, separators=(",", ":")
        )
        return hashlib.sha256(payload.encode()).hexdigest()

    expected_v = min(rows, key=lambda r: canonical_hash(*r))[1]
    for ordering in (rows, rows[::-1]):
        src = spark.createDataFrame(ordering, ["k", "v", "op", "seq"])
        out = merge_upsert_cdc(tgt, src, ["k"], seq_col="seq")
        assert {(r.k, r.v) for r in out.collect()} == {
            (9, "z"),
            (1, expected_v),
        }


def test_scd2_tombstone_before_valid_from_clamps(spark):
    """r9 (ADVICE r8): an out-of-order tombstone dated BEFORE the
    current row's valid_from clamps to valid_from — never an inverted
    interval (valid_to < valid_from), which would break point-in-time
    join invariants."""
    from calorista_spark.operators.merge import scd2_apply_tombstones

    early = datetime.datetime(2023, 6, 1)  # before every valid_from
    tombs = spark.createDataFrame(
        [(3, early)],
        T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("effective_ts", T.TimestampType()),
            ]
        ),
    )
    out = scd2_apply_tombstones(_dim(spark), tombs, ["k"])
    row = [r for r in out.collect() if r.k == 3][0]
    assert row.valid_to == row.valid_from == T0
    # invariant: no interval anywhere is inverted
    bad = [
        r for r in out.collect()
        if r.valid_to is not None and r.valid_to < r.valid_from
    ]
    assert bad == []
