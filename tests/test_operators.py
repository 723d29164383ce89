"""Unit tests pinning operator semantics to SURVEY §2 rows —
edge cases the oracle queries can't reach (ties, empty sides, null
policies)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from calorista_spark.functions.dates import epoch_days_to_date
from calorista_spark.operators.dedup import exact_dedup
from calorista_spark.operators.joins import asof_join
from calorista_spark.operators.merge import merge_classify, merge_upsert, with_row_hash
from calorista_spark.operators.reshape import date_spine, densify_by_date


def test_epoch_days_conversion_matches_reference(spark):
    # reference main.py:34-39: int(float(s)) days after 1970-01-01;
    # bad input → None. 1970-01-01 + 20215 days = 2025-05-07.
    df = spark.createDataFrame(
        [("20215.0",), ("0",), ("garbage",), (None,)], ["days_str"]
    )
    out = df.select(epoch_days_to_date("days_str").alias("d")).collect()
    assert out[0].d == datetime.date(1970, 1, 1) + datetime.timedelta(days=20215)
    assert out[1].d == datetime.date(1970, 1, 1)
    assert out[2].d is None
    assert out[3].d is None


def test_exact_dedup_first_seen_wins(spark):
    # two rows same key: the one with smaller order col survives
    df = spark.createDataFrame(
        [("k1", 2, "late"), ("k1", 1, "early"), ("k2", 5, "only")],
        ["key", "seq", "payload"],
    )
    out = {r.key: r.payload for r in exact_dedup(df, ["key"], ["seq"]).collect()}
    assert out == {"k1": "early", "k2": "only"}


def test_merge_upsert_three_branches(spark):
    # reference main.py:146-161: insert / replace-changed / keep
    target = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    source = spark.createDataFrame([(2, "B"), (3, "c")], ["id", "v"])
    merged = {r.id: r.v for r in merge_upsert(target, source, ["id"]).collect()}
    assert merged == {1: "a", 2: "B", 3: "c"}


def test_merge_upsert_rejects_schema_mismatch(spark):
    target = spark.createDataFrame([(1, "a")], ["id", "v"])
    source = spark.createDataFrame([(1, "a", 2)], ["id", "v", "extra"])
    try:
        merge_upsert(target, source, ["id"])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "identical schemas" in str(e)


def test_merge_classify_actions(spark):
    target = with_row_hash(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]))
    source = with_row_hash(
        spark.createDataFrame([(2, "B"), (3, "c"), (4, "d")], ["id", "v"])
    )
    acts = {r.id: r.action for r in merge_classify(target, source, ["id"]).collect()}
    assert acts == {1: "keep", 2: "update", 3: "insert", 4: "insert"}
    # unchanged branch
    same = with_row_hash(spark.createDataFrame([(1, "a")], ["id", "v"]))
    acts2 = {r.id: r.action for r in merge_classify(same, same, ["id"]).collect()}
    assert acts2 == {1: "unchanged"}


def test_merge_upsert_null_update_replaces_value(spark):
    # ADVICE r01: a matched update that sets a field to NULL must win —
    # per-column coalesce would silently keep the old target value and
    # the sync never converges (row_hash keeps saying 'update').
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    target = spark.createDataFrame([(1, "a"), (2, "b")], schema)
    source = spark.createDataFrame([(2, None)], schema)
    merged = {r.id: r.v for r in merge_upsert(target, source, ["id"]).collect()}
    assert merged == {1: "a", 2: None}
    # convergence: re-merging the same source is now a no-op
    once = merge_upsert(target, source, ["id"])
    twice = merge_upsert(once, source, ["id"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_fingerprint_null_yields_empty_segment(spark):
    # ADVICE r01: (1, null, 2) and (1, 2, null) must NOT collide
    from calorista_spark.functions.text import fingerprint

    df = spark.createDataFrame(
        [(1, None, 2), (1, 2, None)], ["a", "b", "c"]
    )
    out = [r.fp for r in df.select(fingerprint("a", "b", "c").alias("fp")).collect()]
    assert out == ["1__2", "1_2_"]
    assert out[0] != out[1]


def test_merge_idempotent(spark):
    # merging the same source twice changes nothing (O-D4)
    target = spark.createDataFrame([(1, "a")], ["id", "v"])
    source = spark.createDataFrame([(1, "A"), (2, "b")], ["id", "v"])
    once = merge_upsert(target, source, ["id"])
    twice = merge_upsert(once, source, ["id"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_asof_join_inclusive_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, 100, 10.0), (1, 50, 11.0), (2, 10, 12.0)],
        ["user_id", "t", "lval"],
    ).select("user_id", F.col("t").cast("long").alias("t"), "lval")
    right = spark.createDataFrame(
        [(1, 100, 1.0), (1, 60, 2.0), (1, 120, 3.0)],
        ["user_id", "t", "rval"],
    ).select("user_id", F.col("t").cast("long").alias("t"), "rval")
    out = asof_join(
        left, right, ["user_id"], "t", "t", ["rval"], suffix="_r"
    ).collect()
    got = {(r.user_id, r.t): r.rval_r for r in out}
    assert got[(1, 100)] == 1.0  # inclusive: right at t=100 matches left t=100
    assert got[(1, 50)] is None  # nothing at or before 50
    assert got[(2, 10)] is None  # user with no right rows at all


def test_date_spine_null_preserving(spark):
    # SURVEY §7: missing days stay null, never 0
    spine = date_spine(spark, "2024-01-01", "2024-01-04")
    agg = spark.createDataFrame(
        [(datetime.date(2024, 1, 2), 5.0)], ["d", "total"]
    )
    out = densify_by_date(agg, "d", spine).orderBy("date").collect()
    assert len(out) == 4
    assert [r.total for r in out] == [None, 5.0, None, None]


def test_ewma_longhorizon_matches_pandas_at_5000_days(spark):
    """r7 verdict item: the block-renormalized EWMA must stay FINITE
    and pandas-exact at horizons where the naive (1-α)^(-rn) closed
    form overflows double (~rn 2000)."""
    import numpy as np
    import pandas as pd

    from calorista_spark.operators.windows import ewma_adjusted_longhorizon

    n = 5000
    vals = [((i * 2654435761) % 100000) / 7.0 - 3000 for i in range(n)]
    days = [
        datetime.date(2000, 1, 1) + datetime.timedelta(days=i)
        for i in range(n)
    ]
    pdf = pd.DataFrame({"day": days, "x": vals})
    got = (
        ewma_adjusted_longhorizon(
            spark.createDataFrame(pdf), "day", "x", out_col="e", alpha=0.3
        )
        .orderBy("day")
        .select("e")
        .toPandas()["e"]
        .to_numpy()
    )
    want = pdf["x"].ewm(alpha=0.3, adjust=True).mean().to_numpy()
    assert np.all(np.isfinite(got))
    rel = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1e-9))
    assert rel < 1e-12, rel


def test_ewma_longhorizon_carry_terms_one(spark):
    """r7 ADVICE item: carry_terms=1 must mean "carry exactly one
    previous block", not double-count the block itself (the old horner
    started its accumulator at lag 0).  With n <= 2*block the single
    carried block IS the complete history, so the result must be
    pandas-exact."""
    import numpy as np
    import pandas as pd

    from calorista_spark.operators.windows import ewma_adjusted_longhorizon

    n, block = 64, 32
    vals = [((i * 48271) % 1000) / 3.0 - 150 for i in range(n)]
    days = [
        datetime.date(2021, 5, 1) + datetime.timedelta(days=i)
        for i in range(n)
    ]
    pdf = pd.DataFrame({"day": days, "x": vals})
    got = (
        ewma_adjusted_longhorizon(
            spark.createDataFrame(pdf),
            "day",
            "x",
            out_col="e",
            alpha=0.25,
            block=block,
            carry_terms=1,
        )
        .orderBy("day")
        .select("e")
        .toPandas()["e"]
        .to_numpy()
    )
    want = pdf["x"].ewm(alpha=0.25, adjust=True).mean().to_numpy()
    rel = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1e-9))
    assert rel < 1e-12, rel


def test_ewma_longhorizon_matches_shorthorizon_query(spark, sf_dir):
    """On a sub-block series the long-horizon variant must agree with
    the r6 exact closed form after quantization."""
    from calorista_spark.queries.timeseries import (
        events_daily_ewma,
        events_daily_ewma_longhorizon,
    )

    a = {
        (r.day, r.total_value): r.ewma
        for r in events_daily_ewma(spark, sf_dir).collect()
    }
    b = {
        (r.day, r.total_value): r.ewma
        for r in events_daily_ewma_longhorizon(spark, sf_dir).collect()
    }
    assert a == b
