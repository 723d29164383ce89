"""Distributed exact global ranking — the scale-safe replacement for
``Window.orderBy(...)`` with no partition key.

A partition-less window funnels EVERY row through one task: correct at
test scale, a guaranteed straggler/OOM at the 100 TB north star. The
classic fix is the two-pass range-partitioned rank:

1. ``repartitionByRange`` on the sort key — a single shuffle that
   gives a TOTAL order across partitions (partition i's keys all sort
   before partition i+1's) while keeping rows spread over P tasks;
2. rank locally inside each physical partition (windows partitioned by
   ``spark_partition_id()`` → P-way parallel, no global funnel);
3. compute per-partition row counts (P rows — tiny), turn them into
   cumulative offsets with a driver-negligible window over P rows, and
   broadcast-join the offsets back: ``global = offset + local``.

Every step is DataFrame-native, deterministic (RangePartitioner's
sampling seed is fixed per input split, and the offsets are derived
from actual counts, so boundaries don't affect the result), and scales
as O(N/P) per task.

WHY THE RANGED FRAME IS STAGE-MATERIALIZED (r6): the pattern consumes
the range-partitioned frame TWICE — the local-rank branch and the
per-partition-offset branch. Those two branches are only consistent
if they observe the SAME partition boundaries. Relying on plan-subtree
identity (ReusedExchange) for that is silently fragile: when the
input carries any column the offsets branch doesn't need, Catalyst
column-prunes that branch into a DIFFERENT exchange, each exchange
samples its own range boundaries, and the global ranks corrupt
nondeterministically — observed in r6 on a fully deterministic
parquet input (corpus_token_offsets, where a passenger ``source``
column flipped ~90 % of rows wrong at sf0.1). ``localCheckpoint
(eager=False)`` freezes exactly one evaluation of the exchange, so
boundaries are sampled once and every consumer (and task retry) reads
the same blocks. Cost: one disk/memory-backed write of the ranged
data — O(N/P) per executor, the same order as the shuffle it already
paid; it also removes the old nondeterministic-input caveat (rand()/
unseeded sample upstream) for free.

Reference parity note: the reference computes ranks/quantiles with
pandas on a single frame (e.g. /root/reference/calorista/
streamlit_app.py trend tables); this module is the distributed
restatement of those semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rank_pid"
_LOCAL = "__rank_local"
_OFFSET = "__rank_offset"


def _range_partitioned(df: DataFrame, order_cols: list[str], num_partitions: int | None):
    p = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # explicit numPartitions: AQE must not re-coalesce this exchange,
    # or the pid-keyed offsets below could drift between branches
    ranged = df.repartitionByRange(p, *order_cols).withColumn(
        "__rank_pid", F.spark_partition_id()
    )
    # freeze ONE evaluation — see module docstring (branch-divergence
    # bug). persist, not checkpoint: cache substitution happens during
    # ANALYSIS, before the optimizer's column pruning can split the
    # branches into distinct exchanges, so both consumers resolve to
    # the same InMemoryRelation (one materialization, one boundary
    # sample) while keeping lineage for executor-loss recovery and
    # column-prunable cache scans. SERIALIZED memory+disk: the cache
    # is data-sized, and the deserialized default's on-heap row
    # objects cost several × the serialized footprint (observed OOM
    # at 10M rows in scale_smoke under a default driver heap).
    # Tracked (calorista_spark.cache): runners call release_caches()
    # after materializing each query so composed sessions don't
    # accumulate staged frames.
    from calorista_spark.cache import tracked_persist

    return tracked_persist(ranged)


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "global_rn",
    num_partitions: int | None = None,
    attach_total: str | None = None,
) -> DataFrame:
    """Exact 1-based global row number over ``order_cols`` (which must
    form a total order — include a unique tiebreak column) WITHOUT a
    single-partition window. Adds ``out_col``; preserves all input
    columns.

    ``attach_total`` (r14, guide §2.4): also attach the TOTAL row
    count as a column of that name, computed from the per-partition
    counts the offsets pass already aggregates — callers that need
    "rank out of N" (ntile, deciles) previously recomputed N with a
    second full scan + aggregation of the input; the total rides the
    same P-row offsets frame and the same broadcast join for free."""
    ranged = _range_partitioned(df, order_cols, num_partitions)
    w_local = Window.partitionBy(_PID).orderBy(*order_cols)
    local = ranged.withColumn(_LOCAL, F.row_number().over(w_local))
    counts = ranged.groupBy(_PID).agg(F.count(F.lit(1)).alias("__n"))
    # cumulative offsets across partition ids: P rows — the ONLY
    # global window in the pattern, and it sees O(P) rows, not O(N)
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    off_cols = [
        _PID,
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias(_OFFSET),
    ]
    if attach_total is not None:
        w_all = Window.orderBy(_PID).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        off_cols.append(F.sum("__n").over(w_all).alias(attach_total))
    offsets = counts.select(*off_cols)
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, (F.col(_OFFSET) + F.col(_LOCAL)).cast("int"))
        .drop(_PID, _LOCAL, _OFFSET)
    )


def ntile_expr(rank: Column, total: Column, n: int) -> Column:
    """SQL-standard ``ntile(n)`` from a precomputed 1-based rank and
    the partition row count: the first ``total % n`` tiles get
    ``total div n + 1`` rows, the rest ``total div n``."""
    # double division then floor-cast: exact while total < 2^53 rows
    # (9e15 — far beyond any realistic partition count)
    q = (total / n).cast("long")
    rem = total - q * n
    big = q + 1  # size of the first `rem` tiles
    in_big = rank <= rem * big
    tile_big = F.floor((rank - 1) / big) + 1
    # guard q=0 (total < n): the otherwise() branch is never TAKEN
    # then, but Spark still EVALUATES it per row — under
    # spark.sql.ansi.enabled=true an unguarded /q would raise
    # DIVIDE_BY_ZERO at runtime
    tile_small = (
        rem + F.floor((rank - 1 - rem * big) / F.greatest(q, F.lit(1))) + 1
    )
    return F.when(in_big, tile_big).otherwise(tile_small).cast("int")


def ordered_running_sum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
    attach_total: str | None = None,
) -> DataFrame:
    """Exact running sum of ``value_col`` over a total order (include
    a unique tiebreak; elements may be desc() Columns) WITHOUT a
    single-partition window — same two-pass shape as
    :func:`global_row_number` with sums instead of counts. The
    building block for budget-style selections ("take the best docs
    until N tokens").

    EXACTNESS: reproduces a sequential window running sum exactly for
    integer/decimal ``value_col`` (partial sums are associative).
    For doubles the two-pass accumulation order differs from a
    sequential window and can diverge in the last ulp — quantize
    double inputs first (``functions.numeric`` conventions) when
    cross-engine-stable output matters.

    ``attach_total`` (r14, guide §2.4): also attach the GRAND total of
    ``value_col`` as a column of that name, derived from the per-
    partition sums the offsets pass already aggregates — budget-style
    callers ("keep until 25 % of all tokens") previously recomputed
    the grand total with a second full scan (for token budgets, a
    second full tokenize) of the input."""
    ranged = _range_partitioned(df, order_cols, num_partitions)
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.withColumn("__rs_local", F.sum(value_col).over(w_local))
    sums = ranged.groupBy(_PID).agg(F.sum(value_col).alias("__n"))
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    off_cols = [
        _PID,
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias(_OFFSET),
    ]
    if attach_total is not None:
        w_all = Window.orderBy(_PID).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        off_cols.append(F.sum("__n").over(w_all).alias(attach_total))
    offsets = sums.select(*off_cols)
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, F.col(_OFFSET) + F.col("__rs_local"))
        .drop(_PID, "__rs_local", _OFFSET)
    )


def grouped_row_number(
    df: DataFrame,
    group_col: str,
    order_cols: list,
    out_col: str = "group_rn",
    num_partitions: int | None = None,
    with_group_counts: bool = False,
):
    """Exact 1-based row number WITHIN each group over ``order_cols``
    (which must totalize the order inside a group — include a unique
    tiebreak) WITHOUT per-group single-task windows.

    ``Window.partitionBy(group)`` funnels each group through ONE task —
    fine for many small groups, a straggler/OOM when a group is a
    whole data source at 100 TB. Same two-pass shape as
    :func:`global_row_number`, keyed by group: range-partition on
    ``(group, *order_cols)`` (a group larger than a partition spans
    ADJACENT partitions, each handling O(N/P) rows), rank locally per
    ``(partition, group)``, then add per-group offsets accumulated
    across partition ids. The offsets frame has one row per
    (partition, group) pair — O(P·|groups|), never O(N) — and is
    BROADCAST, so this pattern assumes LOW-CARDINALITY groups (all
    current callers group by ≤ |sources|/|epochs|/|status|); for a
    high-cardinality group column use a plain
    ``Window.partitionBy(group)`` instead (many small groups spread
    fine across tasks — it's the few-huge-groups case this fixes).
    The building block for per-stratum quota selection ("smallest k
    hashes per source") and per-epoch shuffle orders.

    ``with_group_counts=True`` (r14, guide §2.4) returns ``(ranked,
    counts)`` where ``counts`` is the per-group row-count frame
    ``(group_col, __group_n)`` aggregated from the SAME persisted
    range-partitioned frame — quota-style callers previously derived
    group sizes with a second full scan + aggregation of the input."""
    ranged = _range_partitioned(df, [group_col, *order_cols], num_partitions)
    w_local = Window.partitionBy(_PID, group_col).orderBy(*order_cols)
    local = ranged.withColumn(_LOCAL, F.row_number().over(w_local))
    pg = ranged.groupBy(_PID, group_col).agg(F.count(F.lit(1)).alias("__n"))
    w_off = (
        Window.partitionBy(group_col)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = pg.select(
        _PID,
        group_col,
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias(_OFFSET),
    )
    ranked = (
        local.join(F.broadcast(offsets), [_PID, group_col])
        .withColumn(out_col, (F.col(_OFFSET) + F.col(_LOCAL)).cast("int"))
        .drop(_PID, _LOCAL, _OFFSET)
    )
    if with_group_counts:
        counts = pg.groupBy(group_col).agg(
            F.sum("__n").alias("__group_n")
        )
        return ranked, counts
    return ranked


def grouped_cume_counts(
    df: DataFrame,
    group_col: str,
    value_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Tie-aware cumulative counts per group WITHOUT per-group global
    windows: returns one row per distinct ``(group_col, value_col)``
    with

    - ``cnt``     — rows in the tie group,
    - ``cum_le``  — rows in the group with value <= this value,
    - ``n_total`` — rows in the group.

    From these, ``rank = cum_le - cnt + 1``,
    ``percent_rank = (rank-1)/(n_total-1)``, ``cume_dist = cum_le /
    n_total`` — the exact window-function semantics, computed with one
    combinable aggregation + a range-partitioned local running sum.
    Equal keys always land in one range partition (the partitioner is
    a pure function of the key), so tie groups never split."""
    g = df.groupBy(group_col, value_col).agg(F.count(F.lit(1)).alias("cnt"))
    ranged = _range_partitioned(g, [group_col, value_col], num_partitions)
    w_local = (
        Window.partitionBy(_PID, group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.withColumn("__local_cum", F.sum("cnt").over(w_local))
    # per (pid, group) totals → per-group cumulative offsets across
    # pids: O(P × |groups|) rows, tiny relative to the data
    pg = local.groupBy(_PID, group_col).agg(F.sum("cnt").alias("__n"))
    w_off = (
        Window.partitionBy(group_col)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = pg.select(
        _PID,
        group_col,
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias(_OFFSET),
    )
    totals = pg.groupBy(group_col).agg(F.sum("__n").alias("n_total"))
    return (
        local.join(F.broadcast(offsets), [_PID, group_col])
        .withColumn("cum_le", F.col(_OFFSET) + F.col("__local_cum"))
        .join(F.broadcast(totals), group_col)
        .select(group_col, value_col, "cnt", "cum_le", "n_total")
    )
