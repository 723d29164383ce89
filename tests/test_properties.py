"""Property-based tests (SURVEY §5.4): dedup idempotence, merge
commutativity over batch order, spine completeness — hypothesis
generates the entry batches, a local SparkSession checks the algebra.

Sizes are kept small (Spark round-trips per example are expensive);
the properties, not the volume, carry the value.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from calorista_spark.operators.dedup import exact_dedup
from calorista_spark.operators.merge import merge_upsert
from calorista_spark.operators.reshape import date_spine

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

entry = st.tuples(
    st.integers(min_value=0, max_value=9),  # key
    st.integers(min_value=0, max_value=99),  # seq (arrival order)
    st.floats(min_value=0, max_value=1e6, allow_nan=False),  # value
)
batches = st.lists(entry, min_size=0, max_size=20)


def _df(spark, rows):
    return spark.createDataFrame(
        [(int(k), int(s), float(v)) for k, s, v in rows] or [(0, 0, 0.0)],
        ["key", "seq", "value"],
    ).limit(len(rows))


@given(rows=batches)
@_settings
def test_dedup_idempotent(spark, rows):
    df = _df(spark, rows)
    once = exact_dedup(df, ["key"], ["seq", "value"])
    twice = exact_dedup(once, ["key"], ["seq", "value"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@given(rows=batches)
@_settings
def test_dedup_keeps_min_by_order(spark, rows):
    df = _df(spark, rows)
    got = {
        r.key: (r.seq, r.value)
        for r in exact_dedup(df, ["key"], ["seq", "value"]).collect()
    }
    expect = {}
    for k, s, v in sorted(rows, key=lambda t: (t[0], t[1], t[2])):
        expect.setdefault(k, (s, v))
    assert got == {k: (s, float(v)) for k, (s, v) in expect.items()}


@given(a=batches, b=batches)
@_settings
def test_merge_last_writer_wins_is_associative_in_state(spark, a, b):
    # merging batch A then B == merging (A merged with B) in one shot,
    # because source-wins is right-biased: target ⊕ A ⊕ B == target ⊕ (A ⊕ B)
    da, db = _df(spark, a), _df(spark, b)
    da = exact_dedup(da, ["key"], ["seq", "value"])
    db = exact_dedup(db, ["key"], ["seq", "value"])
    seq = merge_upsert(merge_upsert(_df(spark, []), da, ["key"]), db, ["key"])
    combined = merge_upsert(da, db, ["key"])
    oneshot = merge_upsert(_df(spark, []), combined, ["key"])
    assert sorted(map(tuple, seq.collect())) == sorted(map(tuple, oneshot.collect()))


@given(
    start=st.dates(
        min_value=datetime.date(2020, 1, 1), max_value=datetime.date(2020, 6, 1)
    ),
    n_days=st.integers(min_value=0, max_value=45),
)
@_settings
def test_spine_completeness(spark, start, n_days):
    end = start + datetime.timedelta(days=n_days)
    days = [r.date for r in date_spine(spark, str(start), str(end)).collect()]
    assert len(days) == n_days + 1  # |days| == datediff + 1
    assert days[0] == start and sorted(days)[-1] == end
    assert len(set(days)) == len(days)


# ---------------------------------------------------------------------------
# Distributed two-pass rank == exact window semantics (operators/ranks).
# ---------------------------------------------------------------------------

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from calorista_spark.operators.ranks import (  # noqa: E402
    global_row_number,
    grouped_cume_counts,
    ntile_expr,
)

rank_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # group (3 statuses)
        st.integers(min_value=0, max_value=20),  # value (forces ties)
    ),
    min_size=1,
    max_size=40,
)


def _rank_df(spark, rows):
    # unique id column as tiebreak / row identity
    return spark.createDataFrame(
        [(i, int(g), int(v)) for i, (g, v) in enumerate(rows)],
        ["id", "grp", "val"],
    )


@given(rows=rank_rows)
@_settings
def test_global_row_number_matches_window(spark, rows):
    df = _rank_df(spark, rows)
    got = {
        r.id: r.global_rn
        for r in global_row_number(
            df, ["val", "id"], num_partitions=3
        ).collect()
    }
    w = Window.orderBy("val", "id")
    want = {
        r.id: r.rn
        for r in df.select(
            "id", F.row_number().over(w).alias("rn")
        ).collect()
    }
    assert got == want


@given(rows=rank_rows, n=st.integers(min_value=1, max_value=5))
@_settings
def test_ntile_expr_matches_window_ntile(spark, rows, n):
    df = _rank_df(spark, rows)
    ranked = global_row_number(df, ["val", "id"], num_partitions=3)
    total = df.count()
    got = {
        r.id: r.tile
        for r in ranked.select(
            "id", ntile_expr(F.col("global_rn"), F.lit(total), n).alias("tile")
        ).collect()
    }
    w = Window.orderBy("val", "id")
    want = {
        r.id: r.tile
        for r in df.select("id", F.ntile(n).over(w).alias("tile")).collect()
    }
    assert got == want


@given(rows=rank_rows)
@_settings
def test_grouped_cume_counts_match_window_rank_semantics(spark, rows):
    df = _rank_df(spark, rows)
    cume = grouped_cume_counts(df, "grp", "val", num_partitions=3).collect()
    got = {
        (r.grp, r.val): (r.cnt, r.cum_le, r.n_total) for r in cume
    }
    # exact window-derived expectations per distinct (grp, val)
    w = Window.partitionBy("grp").orderBy("val")
    exact = df.select(
        "grp",
        "val",
        F.count(F.lit(1)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("le"),  # includes peers: cume_dist numerator
        F.count(F.lit(1)).over(
            Window.partitionBy("grp").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    ).collect()
    # window 'le' with range semantics: Spark's orderBy+rows frame counts
    # rows not peers — recompute peer-inclusive via max over the tie group
    from collections import defaultdict

    by_key = defaultdict(list)
    for r in exact:
        by_key[(r.grp, r.val)].append(r)
    for key, rs in by_key.items():
        cnt = len(rs)
        cum_le = max(r.le for r in rs)
        n_total = rs[0].n
        assert got[key] == (cnt, cum_le, n_total), key


@given(rows=rank_rows)
@_settings
def test_ordered_running_sum_matches_window(spark, rows):
    from calorista_spark.operators.ranks import ordered_running_sum

    df = _rank_df(spark, rows)
    got = {
        r.id: r.rs
        for r in ordered_running_sum(
            df,
            [F.col("val").desc(), F.col("id")],
            "val",
            out_col="rs",
            num_partitions=3,
        ).collect()
    }
    w = (
        Window.orderBy(F.col("val").desc(), F.col("id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        r.id: r.rs
        for r in df.select("id", F.sum("val").over(w).alias("rs")).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# As-of join (J6) vs pandas merge_asof as an independent reference.
# ---------------------------------------------------------------------------

asof_sides = st.tuples(
    st.lists(  # left: (key, ts)
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=1,
        max_size=15,
    ),
    st.lists(  # right: (key, ts, value) — unique (key, ts) enforced below
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=999),
        ),
        min_size=0,
        max_size=15,
    ),
)


@given(sides=asof_sides)
@_settings
def test_asof_join_matches_pandas_merge_asof(spark, sides):
    import pandas as pd

    from calorista_spark.operators.joins import asof_join

    lrows, rrows = sides
    # dedupe right on (key, ts): with duplicates, "which value carries"
    # is tie-break policy, not as-of semantics — keep the property crisp
    rmap = {(k, t): v for k, t, v in rrows}
    rrows = [(k, t, v) for (k, t), v in sorted(rmap.items())]

    left = spark.createDataFrame(
        [(i, int(k), int(t)) for i, (k, t) in enumerate(lrows)],
        ["lid", "key", "lts"],
    )
    right_schema = "key INT, rts INT, val INT"
    right = spark.createDataFrame(
        [(int(k), int(t), int(v)) for k, t, v in rrows], right_schema
    )
    got = {
        r.lid: r.val_asof
        for r in asof_join(
            left, right, ["key"], "lts", "rts", ["val"]
        ).collect()
    }

    lpd = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)],
        columns=["lid", "key", "lts"],
    ).sort_values("lts", kind="stable")
    rpd = pd.DataFrame(rrows, columns=["key", "rts", "val"]).sort_values(
        "rts", kind="stable"
    )
    if rpd.empty:
        want = {i: None for i in lpd["lid"]}
    else:
        merged = pd.merge_asof(
            lpd, rpd, left_on="lts", right_on="rts", by="key",
            direction="backward", allow_exact_matches=True,
        )
        want = {
            int(r.lid): (None if pd.isna(r.val) else int(r.val))
            for r in merged.itertuples()
        }
    assert got == want


def test_ntile_expr_safe_under_ansi_when_total_lt_n(spark):
    # ADVICE r5: with total < n the small-tile branch divides by q=0 on
    # every row (Spark evaluates both when() branches); under ANSI mode
    # an unguarded divide raises DIVIDE_BY_ZERO. Pin the guard.
    prev = spark.conf.get("spark.sql.ansi.enabled", None)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        df = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], ["id", "val"])
        ranked = global_row_number(df, ["val", "id"], num_partitions=2)
        got = {
            r.id: r.tile
            for r in ranked.select(
                "id",
                ntile_expr(F.col("global_rn"), F.lit(3), 4).alias("tile"),
            ).collect()
        }
        # SQL ntile(4) over 3 rows: one row per tile 1..3
        assert got == {1: 1, 2: 2, 3: 3}
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.ansi.enabled")
        else:
            spark.conf.set("spark.sql.ansi.enabled", prev)


def test_two_pass_rank_consistent_with_passenger_columns(spark):
    from calorista_spark.operators.ranks import ordered_running_sum

    # r6 regression: a column the offsets branch doesn't need used to
    # let Catalyst prune that branch into a DIFFERENT range exchange;
    # the two exchanges sampled different boundaries and the prefix
    # sums corrupted nondeterministically (seen live at sf0.1 in
    # corpus_token_offsets). The ranged frame is now stage-persisted,
    # so both branches must read identical partitions.
    import random

    rng = random.Random(7)
    rows = [
        (i, rng.randint(0, 50), f"src{i % 7}", "x" * rng.randint(0, 9))
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, ["id", "v", "passenger_a", "passenger_b"])
    out = ordered_running_sum(df, [F.col("id")], "v", out_col="cum")
    got = sorted((r.id, r.v, r.cum) for r in out.collect())
    run = 0
    for _id, v, cum in got:
        run += v
        assert cum == run, (_id, cum, run)
    assert len(got) == 4000


@given(rows=rank_rows)
@_settings
def test_grouped_row_number_matches_window(spark, rows):
    from calorista_spark.operators.ranks import grouped_row_number

    df = _rank_df(spark, rows)
    got = {
        r.id: r.group_rn
        for r in grouped_row_number(
            df, "grp", ["val", "id"], num_partitions=3
        ).collect()
    }
    w = Window.partitionBy("grp").orderBy("val", "id")
    want = {
        r.id: r.rn
        for r in df.select("id", F.row_number().over(w).alias("rn")).collect()
    }
    assert got == want


def test_grouped_row_number_consistent_with_passenger_columns(spark):
    # same branch-divergence regression class as ordered_running_sum:
    # passenger columns must not split the two branches onto different
    # range exchanges (the ranged frame is stage-persisted)
    import random

    from calorista_spark.operators.ranks import grouped_row_number

    rng = random.Random(11)
    rows = [
        (i, rng.randint(0, 50), f"g{i % 4}", "p" * rng.randint(0, 9))
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, ["id", "v", "grp", "passenger"])
    out = grouped_row_number(df, "grp", [F.col("v"), F.col("id")], out_col="rn")
    got = sorted((r.grp, r.v, r.id, r.rn) for r in out.collect())
    per_group: dict = {}
    for grp, v, _id, rn in got:
        per_group.setdefault(grp, []).append(rn)
    assert len(got) == 4000
    for grp, rns in per_group.items():
        assert rns == list(range(1, len(rns) + 1)), grp
