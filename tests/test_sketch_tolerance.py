"""Sketch-tolerance bounds for the two rows-only approx twins
(VERDICT r04 item 7): the driver can only rows-check them (sketches
are engine-specific), so pin their accuracy against the exact anchors
here instead.

HLL++ with default rsd=0.05 and GK approx_percentile at accuracy
10000 are both comfortably within ±5 % on these distributions; a
larger error means the twin's wiring (wrong column, wrong accuracy
parameter) broke, not that the sketch got unlucky — both sketches are
deterministic for a fixed input.
"""

from __future__ import annotations

from calorista_spark.queries import QUERIES

TOL = 0.05


def _rel_err(approx: float, exact: float) -> float:
    return abs(approx - exact) / max(abs(exact), 1e-12)


def test_profile_approx_distincts_within_5pct(spark, sf_dir):
    exact = {
        r.column_name: r.n_distinct
        for r in QUERIES["orders_column_profile"](spark, sf_dir).collect()
    }
    approx = {
        r.column_name: r.n_distinct
        for r in QUERIES["orders_column_profile_approx"](
            spark, sf_dir
        ).collect()
    }
    assert set(approx) == set(exact)
    for col in exact:
        err = _rel_err(approx[col], exact[col])
        assert err <= TOL, f"{col}: approx {approx[col]} vs exact {exact[col]} ({err:.2%})"


def test_approx_stats_within_5pct_of_exact(spark, sf_dir):
    exact = {
        r.l_returnflag: r
        for r in QUERIES["stats_by_returnflag"](spark, sf_dir).collect()
    }
    approx = {
        r.l_returnflag: r
        for r in QUERIES["approx_stats_by_returnflag"](
            spark, sf_dir
        ).collect()
    }
    assert set(approx) == set(exact)
    # exact twin has no distinct-order count; recompute the exact
    # side of approx_orders directly
    from pyspark.sql import functions as F

    from calorista_spark.catalog import read_table

    li = read_table(spark, sf_dir, "lineitem")
    exact_orders = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    for flag, row in approx.items():
        err_med = _rel_err(row.approx_median, exact[flag].price_median)
        assert err_med <= TOL, f"{flag}: median {row.approx_median} vs {exact[flag].price_median}"
        err_cnt = _rel_err(row.approx_orders, exact_orders[flag])
        assert err_cnt <= TOL, f"{flag}: orders {row.approx_orders} vs {exact_orders[flag]}"


def test_sketch_rollup_merge_is_lossless_and_close(spark, sf_dir):
    from pyspark.sql import functions as F

    from calorista_spark.catalog import read_table

    rows = {
        r.day: r.est_users
        for r in QUERIES["events_distinct_users_sketch_rollup"](
            spark, sf_dir
        ).collect()
    }
    merged, direct = rows["TOTAL(merged)"], rows["TOTAL(direct)"]
    # union of the daily sketches equals the single-pass sketch WHILE
    # sketches stay in sparse mode — true at this test SF. Past sparse
    # mode the union is estimate-close, not bit-identical (0.73%
    # measured at sf0.1; the approx-band gate carries that metric).
    assert merged == direct, (merged, direct)
    exact = (
        read_table(spark, sf_dir, "events")
        .agg(F.countDistinct("user_id"))
        .first()[0]
    )
    assert abs(merged - exact) <= max(0.05 * exact, 2), (merged, exact)
    # per-day estimates exist for every day present in the data
    n_days = (
        read_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"))
        .distinct()
        .count()
    )
    assert len(rows) == n_days + 2


def test_theta_overlap_matches_exact_on_test_corpus(spark, sf_dir):
    """Theta intersections are exact below the sketch's nominal-entry
    threshold — on the test corpus every estimate must equal the
    self-join exact answer, and the matrix must cover every type
    pair once (type_a < type_b)."""
    from calorista_spark.approx_bands import APPROX_BANDS
    from calorista_spark.catalog import read_table

    band = APPROX_BANDS["events_type_overlap_theta"](spark, sf_dir)
    assert band["max_rel_err"] == 0.0, band
    n_types = (
        read_table(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .count()
    )
    rows = QUERIES["events_type_overlap_theta"](spark, sf_dir).collect()
    assert len(rows) == n_types * (n_types - 1) // 2
    for r in rows:
        assert r.type_a < r.type_b
        assert r.est_both <= r.est_either


def test_kll_rollup_rank_error_and_empty_guard(spark, sf_dir):
    from calorista_spark.approx_bands import APPROX_BANDS

    band = APPROX_BANDS["events_value_quantiles_kll"](spark, sf_dir)
    assert band["within_tolerance"], band
    rows = {
        r.day: r
        for r in QUERIES["events_value_quantiles_kll"](
            spark, sf_dir
        ).collect()
    }
    assert "TOTAL(merged)" in rows and "TOTAL(direct)" in rows
    for r in rows.values():
        assert r.p50 <= r.p90, r
    # EMPTY input must yield zero rows, not an invalid-sketch error:
    # aggregating zero rows produces a non-null but EMPTY kll buffer
    # that get_quantile rejects (found by the --empty audit in r8)
    empty = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    import calorista_spark.catalog as catalog

    orig = catalog.read_table
    try:
        catalog.read_table = (
            lambda _s, _d, name, **kw: empty
            if name == "events"
            else orig(_s, _d, name, **kw)
        )
        import calorista_spark.queries.profiling as prof

        prof.read_table = catalog.read_table
        assert (
            QUERIES["events_value_quantiles_kll"](spark, "unused").count()
            == 0
        )
    finally:
        catalog.read_table = orig
        import calorista_spark.queries.profiling as prof

        prof.read_table = orig
