"""Reshape, dedup, and merge queries (SURVEY §2.4, §2.7).

These exercise the operator modules (``operators/reshape.py``,
``operators/dedup.py``, ``operators/merge.py``) through the
correctness gate; the merge queries synthesize a target/source pair
deterministically from the events table so the oracle can rebuild the
exact same inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.operators.dedup import exact_dedup
from calorista_spark.operators.merge import (
    merge_classify,
    merge_upsert,
    merge_upsert_cdc,
    scd2_apply_tombstones,
    with_row_hash,
)
from calorista_spark.operators.reshape import (
    date_spine,
    group_collect,
    pivot_agg,
    unpivot,
)
from calorista_spark.functions.numeric import quantized_sum
from calorista_spark.queries.registry import query

# ---------------------------------------------------------------------------
# O-R1 unpivot: wide totals → long (measure, amount) — used 4× in the
# reference dashboard (streamlit_app.py:346-351,446-451,470-475,571-576).
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT
    l_returnflag,
    CAST(SUM(CAST(FLOOR(l_quantity * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS total_qty,
    CAST(SUM(CAST(FLOOR(l_extendedprice * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS total_price,
    CAST(SUM(CAST(FLOOR(l_discount * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS total_discount
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'total_qty' AS measure, total_qty AS amount FROM wide
UNION ALL
SELECT l_returnflag, 'total_price', total_price FROM wide
UNION ALL
SELECT l_returnflag, 'total_discount', total_discount FROM wide
ORDER BY l_returnflag, measure
"""


@query("unpivot_measures", _UNPIVOT_ORACLE)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-R1: native ``unpivot`` over aggregated measures."""
    li = read_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        quantized_sum("l_quantity").alias("total_qty"),
        quantized_sum("l_extendedprice").alias("total_price"),
        quantized_sum("l_discount").alias("total_discount"),
    )
    return unpivot(
        wide,
        ids=["l_returnflag"],
        values=["total_qty", "total_price", "total_discount"],
        var_name="measure",
        value_name="amount",
    ).orderBy("l_returnflag", "measure")


# ---------------------------------------------------------------------------
# O-R2 date-spine densify: full daily spine, missing days stay NULL —
# the reference's deliberate NaN-preserving reindex
# (streamlit_app.py:326-332; SURVEY §7 "two distinct null policies").
# ---------------------------------------------------------------------------

_SPINE_ORACLE = """
WITH spine AS (
  SELECT CAST(unnest(generate_series(DATE '1996-01-01', DATE '1996-03-31',
                                     INTERVAL 1 DAY)) AS DATE) AS date
),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS order_date,
         CAST(SUM(CAST(FLOOR(o_totalprice * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS total_price,
         COUNT(*) AS n_orders
  FROM orders
  WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-03-31'
  GROUP BY 1
)
SELECT s.date, d.total_price, d.n_orders
FROM spine s LEFT JOIN daily d ON s.date = d.order_date
ORDER BY s.date
"""


@query("date_spine_daily", _SPINE_ORACLE)
def date_spine_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-R2: spine left-join; nulls (not zeros) on missing days."""
    orders = read_table(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            F.col("o_orderdate").between("1996-01-01", "1996-03-31 23:59:59")
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("order_date"))
        .agg(
            quantized_sum("o_totalprice").alias("total_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    spine = date_spine(spark, "1996-01-01", "1996-03-31")
    return (
        F.broadcast(spine)
        .join(daily, spine["date"] == daily["order_date"], "left")
        .select("date", "total_price", "n_orders")
        .orderBy("date")
    )


# ---------------------------------------------------------------------------
# O-R4 union of batches + O-R3 distinct.
# ---------------------------------------------------------------------------


@query(
    "union_region_nation_names",
    """
SELECT DISTINCT name FROM (
  SELECT r_name AS name FROM region
  UNION ALL
  SELECT n_name FROM nation
) ORDER BY name
""",
)
def union_region_nation_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-R4: unionByName across sources, distinct (main.py:100's
    per-day batch append restated)."""
    region = read_table(spark, sf_dir, "region").select(F.col("r_name").alias("name"))
    nation = read_table(spark, sf_dir, "nation").select(F.col("n_name").alias("name"))
    return region.unionByName(nation).distinct().orderBy("name")


# ---------------------------------------------------------------------------
# O-R5 group-collect: deterministic (sorted) per-key lists, serialized
# so the value hash is engine-neutral.
# ---------------------------------------------------------------------------

_GROUP_COLLECT_ORACLE = """
SELECT l_orderkey,
       array_to_string(list_sort(list(l_linenumber)), ',') AS line_numbers,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_orderkey <= 200
GROUP BY l_orderkey
ORDER BY l_orderkey
"""


@query("group_collect_lines", _GROUP_COLLECT_ORACLE)
def group_collect_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-R5: collect entries into per-key lists (main.py:116-130)."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    collected = group_collect(li, ["l_orderkey"], "l_linenumber", sort=True)
    return collected.select(
        "l_orderkey",
        F.array_join(F.col("values"), ",").alias("line_numbers"),
        F.size("values").cast("long").alias("n_lines"),
    ).orderBy("l_orderkey")


# ---------------------------------------------------------------------------
# O-D1/O-D2 exact dedup, deterministic first-seen.
# ---------------------------------------------------------------------------

_DEDUP_ORACLE = """
SELECT user_id, event_type, event_id, ts, ROUND(value, 4) AS value
FROM (
  SELECT user_id, event_type, event_id, ts, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY user_id, event_type
"""


@query("dedup_first_event", _DEDUP_ORACLE)
def dedup_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-D1: first-seen-wins dedup with an explicit arrival order
    (main.py:96-105's fingerprint set, made deterministic)."""
    events = read_table(spark, sf_dir, "events")
    deduped = exact_dedup(
        events, keys=["user_id", "event_type"], keep_order=["ts", "event_id"]
    )
    return deduped.select(
        "user_id", "event_type", "event_id", "ts", F.round("value", 4).alias("value")
    ).orderBy("user_id", "event_type")


# ---------------------------------------------------------------------------
# O-D3/O-D4 merge: target/source derived deterministically from events.
# target  = event_id % 10 < 8           (existing store)
# source  = event_id % 3 == 0, value+1  (incoming batch: some rows changed,
#                                        some brand new — %10>=8 ∩ %3==0)
# ---------------------------------------------------------------------------

_MERGE_ORACLE = """
WITH target AS (
  SELECT event_id, user_id, event_type, value FROM events WHERE event_id % 10 < 8
),
source AS (
  SELECT event_id, user_id, event_type, value + 1 AS value
  FROM events WHERE event_id % 3 = 0
)
SELECT
  COALESCE(s.event_id, t.event_id) AS event_id,
  CASE WHEN s.event_id IS NOT NULL THEN s.user_id ELSE t.user_id END AS user_id,
  CASE WHEN s.event_id IS NOT NULL THEN s.event_type ELSE t.event_type END
    AS event_type,
  ROUND(CASE WHEN s.event_id IS NOT NULL THEN s.value ELSE t.value END, 4)
    AS value
FROM target t FULL OUTER JOIN source s ON t.event_id = s.event_id
ORDER BY event_id
"""


@query("merge_upsert_events", _MERGE_ORACLE)
def merge_upsert_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-D3: changed-row upsert via the engine's join-based MERGE
    fallback (reference main.py:140-161; Delta MERGE on clusters)."""
    events = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    target = events.filter(F.col("event_id") % 10 < 8)
    source = events.filter(F.col("event_id") % 3 == 0).withColumn(
        "value", F.col("value") + 1
    )
    merged = merge_upsert(target, source, keys=["event_id"])
    return merged.withColumn("value", F.round("value", 4)).orderBy("event_id")


_MERGE_CLASSIFY_ORACLE = """
WITH target AS (
  SELECT event_id, value FROM events WHERE event_id % 10 < 8
),
source AS (
  SELECT event_id,
         CASE WHEN event_id % 2 = 0 THEN value + 1 ELSE value END AS value
  FROM events WHERE event_id % 3 = 0
)
SELECT action, COUNT(*) AS n FROM (
  SELECT CASE
    WHEN t.event_id IS NULL THEN 'insert'
    WHEN s.event_id IS NULL THEN 'keep'
    WHEN s.value <> t.value THEN 'update'
    ELSE 'unchanged' END AS action
  FROM target t FULL OUTER JOIN source s ON t.event_id = s.event_id
)
GROUP BY action ORDER BY action
"""


@query("merge_classify_events", _MERGE_CLASSIFY_ORACLE)
def merge_classify_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-D3's three branches (insert/update/no-op, main.py:146-161)
    made explicit via row-hash comparison (§4.2.3)."""
    events = read_table(spark, sf_dir, "events").select("event_id", "value")
    target = with_row_hash(events.filter(F.col("event_id") % 10 < 8))
    source = with_row_hash(
        events.filter(F.col("event_id") % 3 == 0).withColumn(
            "value",
            F.when(F.col("event_id") % 2 == 0, F.col("value") + 1).otherwise(
                F.col("value")
            ),
        )
    )
    classified = merge_classify(target, source, keys=["event_id"])
    return (
        classified.groupBy("action").agg(F.count(F.lit(1)).alias("n")).orderBy("action")
    )


# ---------------------------------------------------------------------------
# r8 CDC delete semantics: the source feed carries op ∈ {upsert,
# delete} — the fourth merge branch (tombstones) the r7 verdict asked
# for. event_id % 4 == 0 rows arrive as deletes; upserts bump value.
# ---------------------------------------------------------------------------

_MERGE_CDC_ORACLE = """
WITH target AS (
  SELECT event_id, user_id, event_type, value FROM events
  WHERE event_id % 10 < 8
),
source AS (
  SELECT event_id, user_id, event_type,
         CASE WHEN event_id % 4 = 0 THEN value ELSE value + 1 END AS value,
         CASE WHEN event_id % 4 = 0 THEN 'delete' ELSE 'upsert' END AS op
  FROM events WHERE event_id % 3 = 0
)
SELECT
  COALESCE(s.event_id, t.event_id) AS event_id,
  CASE WHEN s.op IS NOT NULL THEN s.user_id ELSE t.user_id END AS user_id,
  CASE WHEN s.op IS NOT NULL THEN s.event_type ELSE t.event_type END
    AS event_type,
  ROUND(CASE WHEN s.op IS NOT NULL THEN s.value ELSE t.value END, 4)
    AS value
FROM target t FULL OUTER JOIN source s ON t.event_id = s.event_id
WHERE s.op IS NULL OR s.op <> 'delete'
ORDER BY event_id
"""


@query("merge_cdc_events", _MERGE_CDC_ORACLE)
def merge_cdc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-D3 + deletes: the CDC apply — inserts, replacements, and
    tombstone removals in ONE full-outer shuffle (operators/merge.py
    merge_upsert_cdc; Delta `WHEN MATCHED AND op='delete' THEN DELETE`
    on clusters). Deletes of unseen keys are no-ops, so replaying the
    feed is idempotent."""
    events = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    target = events.filter(F.col("event_id") % 10 < 8)
    source = events.filter(F.col("event_id") % 3 == 0).select(
        "event_id",
        "user_id",
        "event_type",
        F.when(F.col("event_id") % 4 == 0, F.col("value"))
        .otherwise(F.col("value") + 1)
        .alias("value"),
        F.when(F.col("event_id") % 4 == 0, F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
    )
    merged = merge_upsert_cdc(target, source, keys=["event_id"])
    return merged.withColumn("value", F.round("value", 4)).orderBy("event_id")


_MERGE_CLASSIFY_CDC_ORACLE = """
WITH target AS (
  SELECT event_id, value FROM events WHERE event_id % 10 < 8
),
source AS (
  SELECT event_id,
         CASE WHEN event_id % 2 = 0 THEN value + 1 ELSE value END AS value,
         CASE WHEN event_id % 4 = 0 THEN 'delete' ELSE 'upsert' END AS op
  FROM events WHERE event_id % 3 = 0
)
SELECT action, COUNT(*) AS n FROM (
  SELECT CASE
    WHEN s.event_id IS NULL THEN 'keep'
    WHEN s.op = 'delete' AND t.event_id IS NOT NULL THEN 'delete'
    WHEN s.op = 'delete' THEN 'delete_noop'
    WHEN t.event_id IS NULL THEN 'insert'
    WHEN s.value <> t.value THEN 'update'
    ELSE 'unchanged' END AS action
  FROM target t FULL OUTER JOIN source s ON t.event_id = s.event_id
)
GROUP BY action ORDER BY action
"""


@query("merge_classify_cdc_events", _MERGE_CLASSIFY_CDC_ORACLE)
def merge_classify_cdc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full CDC apply audit: all six branches (keep / insert /
    update / unchanged / delete / delete_noop) counted — what a real
    pipeline reports after every MERGE so retired-row volume is
    visible, not silent."""
    events = read_table(spark, sf_dir, "events").select("event_id", "value")
    target = with_row_hash(events.filter(F.col("event_id") % 10 < 8))
    source = with_row_hash(
        events.filter(F.col("event_id") % 3 == 0)
        .withColumn(
            "value",
            F.when(F.col("event_id") % 2 == 0, F.col("value") + 1).otherwise(
                F.col("value")
            ),
        )
        .withColumn(
            "op",
            F.when(F.col("event_id") % 4 == 0, F.lit("delete")).otherwise(
                F.lit("upsert")
            ),
        ),
        exclude=("op",),
    )
    classified = merge_classify(target, source, keys=["event_id"], op_col="op")
    return (
        classified.groupBy("action")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("action")
    )


_SCD2_TOMBSTONE_ORACLE = """
WITH peruser AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         MIN(CAST(ts AS DATE)) AS first_day,
         MAX(CAST(ts AS DATE)) AS last_day
  FROM events GROUP BY user_id
),
dim AS (
  SELECT user_id, n_events, first_day AS valid_from,
         CAST(NULL AS DATE) AS valid_to
  FROM peruser
  UNION ALL
  SELECT user_id, CAST(0 AS BIGINT), first_day - 30, first_day
  FROM peruser WHERE user_id % 5 = 0
),
tomb AS (
  SELECT user_id, last_day + 1 AS eff FROM peruser WHERE user_id % 3 = 0
)
SELECT user_id, n_events, valid_from, valid_to,
       valid_to IS NULL AS is_current
FROM (
  SELECT d.user_id, d.n_events, d.valid_from,
         CASE WHEN d.valid_to IS NOT NULL THEN d.valid_to
              WHEN t.eff IS NULL THEN NULL
              ELSE GREATEST(d.valid_from, t.eff) END
           AS valid_to
  FROM dim d LEFT JOIN tomb t ON d.user_id = t.user_id
)
ORDER BY user_id, valid_from
"""


@query("scd2_tombstone_retirement", _SCD2_TOMBSTONE_ORACLE)
def scd2_tombstone_retirement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 DELETE path (r8): a tombstone feed END-DATES current
    dimension rows (valid_to = tombstone effective time, no successor
    opened) while history rows stream through untouched — how a Type-2
    dimension records entity retirement without losing point-in-time
    joinability. Dim and tombstones are derived deterministically from
    events (current row per user + a synthetic closed history row for
    user_id % 5 == 0; tombstones retire user_id % 3 == 0 the day after
    their last event), so the oracle rebuilds the exact same inputs.
    One keyed shuffle against the current slice only — cost is
    O(|current| + |tombstones|), independent of history depth."""
    events = read_table(spark, sf_dir, "events")
    peruser = events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min(F.col("ts").cast("date")).alias("first_day"),
        F.max(F.col("ts").cast("date")).alias("last_day"),
    )
    current = peruser.select(
        "user_id",
        "n_events",
        F.col("first_day").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    history = peruser.filter(F.col("user_id") % 5 == 0).select(
        "user_id",
        F.lit(0).cast("long").alias("n_events"),
        F.date_sub("first_day", 30).alias("valid_from"),
        F.col("first_day").alias("valid_to"),
    )
    dim = current.unionByName(history)
    tomb = peruser.filter(F.col("user_id") % 3 == 0).select(
        "user_id", F.date_add("last_day", 1).alias("eff")
    )
    out = scd2_apply_tombstones(
        dim, tomb, keys=["user_id"], effective_col="eff", valid_to="valid_to"
    )
    return out.select(
        "user_id",
        "n_events",
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    ).orderBy("user_id", "valid_from")


# ---------------------------------------------------------------------------
# O-D4 idempotence: dedup(dedup(x)) == dedup(x) — expressed as a count
# comparison so the oracle stays trivially SQL.
# ---------------------------------------------------------------------------


@query(
    "dedup_idempotence_counts",
    """
SELECT COUNT(*) AS n_once, COUNT(*) AS n_twice
FROM (SELECT DISTINCT user_id, event_type FROM events)
""",
)
def dedup_idempotence_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-D4: re-running dedup changes nothing (idempotent re-sync,
    main.py:96-105 + 146-161)."""
    events = read_table(spark, sf_dir, "events")
    once = exact_dedup(events, ["user_id", "event_type"], ["ts", "event_id"])
    twice = exact_dedup(once, ["user_id", "event_type"], ["ts", "event_id"])
    return once.agg(F.count(F.lit(1)).alias("n_once")).crossJoin(
        twice.agg(F.count(F.lit(1)).alias("n_twice"))
    )


# ---------------------------------------------------------------------------
# O-R1 inverse — pivot: long events → one summed column per event type
# (the reference's wide dashboard tables). Explicit value list: no
# distinct-scan job, static schema (see operators/reshape.pivot_agg).
# ---------------------------------------------------------------------------

_PIVOT_ORACLE = """
SELECT user_id,
       ROUND(COALESCE(SUM(CASE WHEN event_type = 'click'    THEN value END), 0), 4) AS click,
       ROUND(COALESCE(SUM(CASE WHEN event_type = 'error'    THEN value END), 0), 4) AS error,
       ROUND(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN value END), 0), 4) AS purchase,
       ROUND(COALESCE(SUM(CASE WHEN event_type = 'signup'   THEN value END), 0), 4) AS signup,
       ROUND(COALESCE(SUM(CASE WHEN event_type = 'view'     THEN value END), 0), 4) AS view
FROM events
GROUP BY user_id
ORDER BY user_id
"""

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query("events_type_pivot", _PIVOT_ORACLE)
def events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot per-user event values into one column per event type —
    Spark compiles the explicit-values pivot to the same conditional
    aggregates as the oracle's CASE columns (one shuffle, map-side
    combine, no second scan)."""
    ev = read_table(spark, sf_dir, "events")
    wide = pivot_agg(
        ev.select("user_id", "event_type", "value"),
        ids=["user_id"],
        pivot_col="event_type",
        pivot_values=EVENT_TYPES,
        agg=F.sum("value"),
    )
    return wide.select(
        "user_id",
        *[
            F.round(F.coalesce(F.col(t), F.lit(0.0)), 4).alias(t)
            for t in EVENT_TYPES
        ],
    ).orderBy("user_id")
