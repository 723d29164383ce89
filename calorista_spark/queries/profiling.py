"""Data-profiling surface: the per-column summary every warehouse
exposes (null counts, exact distinct cardinality, min/max) computed in
ONE pass over the table — the engine-side replacement for the
reference's ad-hoc "is this frame usable" guards
(`streamlit_app.py:105-110,229-231`) generalized to any table.

Scale shape (r6): one aggregation pair PER COLUMN —
``groupBy(col).count()`` (map-side combine shrinks each partition to
its distinct values) followed by a one-row summary agg — unioned into
the profile. Each scan prunes to a single parquet column, so total
I/O matches a single 6-column pass, while avoiding the 13× row
multiplication of Spark's expand-based multi-distinct (the previous
formulation): measured 4× faster at sf0.1 (3.5 s → 0.9 s steady
state) and strictly less shuffle volume at 100 TB. The
``approx_count_distinct`` twin below stays the sketch path; the exact
form here is the oracle anchor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.queries.registry import query

# (column, portable min/max rendering) — doubles go through
# DECIMAL(18,2) so both engines render identical strings; timestamps
# through DATE.
_PROFILE_COLS = [
    ("o_orderkey", "CAST({v} AS STRING)"),
    ("o_custkey", "CAST({v} AS STRING)"),
    ("o_orderstatus", "CAST({v} AS STRING)"),
    ("o_totalprice", "CAST(CAST({v} AS DECIMAL(18,2)) AS STRING)"),
    ("o_orderdate", "CAST(CAST({v} AS DATE) AS STRING)"),
    ("o_orderpriority", "CAST({v} AS STRING)"),
]


def _oracle() -> str:
    parts = []
    for c, fmt in _PROFILE_COLS:
        mn = fmt.replace("{v}", f"MIN({c})").replace("STRING", "VARCHAR")
        mx = fmt.replace("{v}", f"MAX({c})").replace("STRING", "VARCHAR")
        parts.append(
            f"SELECT '{c}' AS column_name,\n"
            f"       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS n_nulls,\n"
            f"       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,\n"
            f"       {mn} AS min_value,\n"
            f"       {mx} AS max_value\n"
            f"FROM orders"
        )
    return "\nUNION ALL\n".join(parts) + "\nORDER BY column_name"


_PROFILE_ORACLE = _oracle()


@query("orders_column_profile", _PROFILE_ORACLE)
def orders_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact table profile as a union of per-column two-level aggs:
    ``groupBy(col).count()`` reduces each column to its distinct
    values with map-side combine (n_nulls rides along as the null
    group's count; min/max over the group keys equal min/max over the
    data), then a one-row summary per column. No expand, no 13× row
    blowup — see module docstring for the measured comparison against
    the multi-distinct single-agg form."""
    orders = read_table(spark, sf_dir, "orders")
    parts = []
    for c, fmt in _PROFILE_COLS:
        g = orders.groupBy(c).agg(F.count(F.lit(1)).alias("__cnt"))
        parts.append(
            g.agg(
                F.lit(c).alias("column_name"),
                F.sum(
                    F.when(F.col(c).isNull(), F.col("__cnt")).otherwise(0)
                )
                .cast("bigint")
                .alias("n_nulls"),
                # COUNT(DISTINCT c) semantics: non-null group keys
                F.count(F.when(F.col(c).isNotNull(), 1))
                .cast("bigint")
                .alias("n_distinct"),
                F.expr(fmt.replace("{v}", f"MIN({c})")).alias("min_value"),
                F.expr(fmt.replace("{v}", f"MAX({c})")).alias("max_value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("column_name")


@query("orders_column_profile_approx", None)
def orders_column_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of ``orders_column_profile``: HyperLogLog++
    ``approx_count_distinct`` instead of six exact COUNT(DISTINCT), so
    the plan has NO expand (the exact form multiplies input rows 13×
    through Spark's expand+aggregate) — one ordinary partial/final agg,
    constant memory per column. Sketch output ⇒ rows-only driver check,
    like ``approx_stats_by_returnflag``; the exact twin stays the
    oracle anchor."""
    orders = read_table(spark, sf_dir, "orders")
    aggs = []
    for c, fmt in _PROFILE_COLS:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"{c}__nulls"),
            # rsd 0.02 (vs the 0.05 default): ~2% observed error, inside
            # the ±5% test tolerance, with a 16× smaller register set
            # than rsd=0.01 (which benched 5× slower than default here)
            F.approx_count_distinct(c, rsd=0.02)
            .cast("bigint")
            .alias(f"{c}__distinct"),
            F.expr(fmt.replace("{v}", f"MIN({c})")).alias(f"{c}__min"),
            F.expr(fmt.replace("{v}", f"MAX({c})")).alias(f"{c}__max"),
        ]
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c, _ in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        )
    ).orderBy("column_name")


@query("events_distinct_users_sketch_rollup", None)
def events_distinct_users_sketch_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mergeable-sketch rollup — the 100 TB pattern for distinct
    counts over any time range WITHOUT rescanning raw data: per-day
    HLL sketches (Apache DataSketches via ``hll_sketch_agg``) are
    materialized once, then ANY range's distinct count is a
    ``hll_union_agg`` over the tiny sketch table. Emits per-day
    estimates plus two totals — ``TOTAL(merged)`` (union of the 30
    daily sketches) and ``TOTAL(direct)`` (one sketch over the raw
    table) — the mergeability property that makes pre-aggregation
    sound. The two agree EXACTLY while sketches are in sparse mode
    (sf0.001/sf0.01 here); past sparse mode the DataSketches union
    path (internal HLL_8 → target conversion) lands within sketch
    error but not bit-identical — measured 0.73% at sf0.1, caught by
    the approx-band gate in r8 when an earlier 0/1 equality indicator
    overclaimed losslessness. Pinned ±5% of exact, merged==direct at
    the sparse-mode test SF, and merged-vs-direct ≤5% as a band
    metric (tests/test_sketch_tolerance.py, approx_bands.py). Sketch
    output ⇒ rows-only driver check, like the other sketch twins."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    per_day = daily.select(
        F.col("day").cast("string").alias("day"),
        F.hll_sketch_estimate("sk").cast("long").alias("est_users"),
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("long")
        .alias("est_users")
    ).select(F.lit("TOTAL(merged)").alias("day"), "est_users")
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
        .cast("long")
        .alias("est_users")
    ).select(F.lit("TOTAL(direct)").alias("day"), "est_users")
    return per_day.unionAll(merged).unionAll(direct).orderBy("day")


@query("events_type_overlap_theta", None)
def events_type_overlap_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix via THETA sketches (Apache DataSketches
    ``theta_sketch_agg`` + set operations) — the mergeable-sketch
    answer to "how many distinct users did BOTH event types see?",
    which HLL cannot answer (no intersection) and exact COUNT(DISTINCT)
    answers only with a per-pair self-join over the raw data. One raw
    scan builds k per-type sketches; every pairwise intersection/union
    then runs on the tiny sketch table (k(k-1)/2 rows via a
    broadcast theta-join — the region_nation_cross small-side
    pattern). At 100 TB the raw data is read ONCE for any number of
    pair queries. Sketch output ⇒ rows-only driver check;
    approx_bands.py quantifies each estimate against the exact
    self-join twin (±5% gate)."""
    ev = read_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id").alias("sk")
    )
    a, b = sk.alias("a"), sk.alias("b")
    pairs = a.join(
        F.broadcast(b), F.col("a.event_type") < F.col("b.event_type")
    )
    return (
        pairs.select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.theta_sketch_estimate(
                F.theta_intersection(F.col("a.sk"), F.col("b.sk"))
            )
            .cast("long")
            .alias("est_both"),
            F.theta_sketch_estimate(
                F.theta_union(F.col("a.sk"), F.col("b.sk"))
            )
            .cast("long")
            .alias("est_either"),
        )
        .orderBy("type_a", "type_b")
    )


@query("events_value_quantiles_kll", None)
def events_value_quantiles_kll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE rollup — the percentile sibling of
    ``events_distinct_users_sketch_rollup``: per-day KLL sketches of
    ``value`` (``kll_sketch_agg_double``) are materialized once; any
    range's p50/p90 then comes from ``kll_merge_agg_double`` over the
    tiny sketch table without rescanning raw data. Emits per-day
    medians plus a TOTAL(merged) and TOTAL(direct) row; like the HLL
    twin, merged-vs-direct is estimate-close, NOT bit-identical once
    sketches exceed their exact capacity (k=200 items) — the r8 HLL
    lesson applied from day one. approx_bands.py checks each estimate
    by its EXACT RANK in the true distribution (KLL guarantees ~1.7%
    rank error at default k; value-space tolerance would be
    distribution-dependent). Sketch output ⇒ rows-only driver
    check."""
    ev = read_table(spark, sf_dir, "events")
    vals = ev.select(
        F.to_date("ts").alias("day"), F.col("value").cast("double").alias("v")
    ).where(F.col("v").isNotNull())
    daily = vals.groupBy("day").agg(
        F.kll_sketch_agg_double("v").alias("sk")
    )
    per_day = daily.select(
        F.col("day").cast("string").alias("day"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("p50"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.9)).alias("p90"),
    )
    # empty-input guard: aggregating ZERO rows yields a non-null but
    # EMPTY sketch buffer that get_quantile rejects — filter on the
    # row count, not on sketch nullness (found by the --empty audit)
    merged = (
        daily.agg(
            F.kll_merge_agg_double("sk").alias("msk"),
            F.count(F.lit(1)).alias("__n"),
        )
        .where(F.col("__n") > 0)
        .select(
            F.lit("TOTAL(merged)").alias("day"),
            F.kll_sketch_get_quantile_double("msk", F.lit(0.5)).alias("p50"),
            F.kll_sketch_get_quantile_double("msk", F.lit(0.9)).alias("p90"),
        )
    )
    direct = (
        vals.agg(
            F.kll_sketch_agg_double("v").alias("dsk"),
            F.count(F.lit(1)).alias("__n"),
        )
        .where(F.col("__n") > 0)
        .select(
            F.lit("TOTAL(direct)").alias("day"),
            F.kll_sketch_get_quantile_double("dsk", F.lit(0.5)).alias("p50"),
            F.kll_sketch_get_quantile_double("dsk", F.lit(0.9)).alias("p90"),
        )
    )
    return per_day.unionAll(merged).unionAll(direct).orderBy("day")
