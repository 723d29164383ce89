"""Scale-safe twins of the partition-less rank queries.

``order_price_quartiles`` (windows_extra.py) and
``order_percentile_ranks`` (analytic_extra.py) are the exact oracle
anchors, but their window specs funnel all rows (or a third of them)
through single tasks at 100 TB. These twins produce IDENTICAL rows —
same oracle SQL, same hashes — through the distributed two-pass rank
in :mod:`calorista_spark.operators.ranks`, mirroring the
exact/approx twin pattern of ``orders_column_profile[_approx]``.

tests/test_plans.py asserts the twins contain NO partition-less
window over the data (the only global window they may contain runs
over O(num_partitions) count rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.operators.ranks import (
    global_row_number,
    grouped_cume_counts,
    ntile_expr,
)
from calorista_spark.queries.analytic_extra import _RANKS_ORACLE
from calorista_spark.queries.registry import query
from calorista_spark.queries.windows_extra import _NTILE_ORACLE


@query("order_price_quartiles_scalable", _NTILE_ORACLE)
def order_price_quartiles_scalable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ntile(4) over the global (o_totalprice, o_orderkey) order with
    no single-task window: distributed row numbers + the closed-form
    ntile arithmetic, with the total row count broadcast from a 1-row
    aggregate."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    # r14: the total row count rides the rank op's own offsets frame
    # (attach_total) — the old separate orders.agg(count) was a second
    # full scan + aggregation of the input just for the scalar N
    ranked = global_row_number(
        orders,
        ["o_totalprice", "o_orderkey"],
        out_col="__rn",
        attach_total="__total",
    )
    return (
        ranked
        .select(
            "o_orderkey",
            (F.floor(F.col("o_totalprice") * 1e4 + F.lit(0.5)) / 1e4).alias(
                "total_price"
            ),
            ntile_expr(F.col("__rn"), F.col("__total"), 4).alias(
                "price_quartile"
            ),
        )
        .orderBy("o_orderkey")
    )


_BUDGET_ORACLE = """
WITH t AS (
  SELECT doc_id,
         CASE WHEN length(trim(COALESCE(text, ''))) = 0 THEN 0
              ELSE len(string_split_regex(trim(COALESCE(text, '')), '\\s+')) END AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         -- DuckDB widens SUM(BIGINT) to HUGEINT; Spark emits int64.
         -- Cast so the arrow value-hash compares like-for-like.
         CAST(SUM(n_tokens) OVER (ORDER BY n_tokens DESC, doc_id)
              AS BIGINT) AS cum_tokens
  FROM t
), b AS (
  SELECT CAST(FLOOR(SUM(n_tokens) * 0.25) AS BIGINT) AS budget FROM t
)
SELECT doc_id, n_tokens, cum_tokens
FROM c, b
WHERE cum_tokens <= budget
ORDER BY cum_tokens
"""


@query("doc_token_budget_selection", _BUDGET_ORACLE)
def doc_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection: greedily keep the token-richest
    documents until 25 % of the corpus' total tokens — the "fill the
    training budget from the top of the ranking" curation step. The
    running total uses the distributed prefix sum
    (:func:`ordered_running_sum`), so no window ever sees the whole
    corpus; the budget is a broadcast 1-row aggregate. A quality-score
    ordering drops in by swapping the order columns."""
    from calorista_spark.operators.ranks import ordered_running_sum
    from calorista_spark.operators.textstats import token_count

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    # r14: the grand token total rides the prefix-sum op's own offsets
    # frame (attach_total) — the old separate toks.agg was a second
    # full scan AND a second full tokenize of every document
    cum = ordered_running_sum(
        toks,
        [F.col("n_tokens").desc(), F.col("doc_id")],
        "n_tokens",
        out_col="cum_tokens",
        attach_total="__grand",
    )
    budget = F.floor(F.col("__grand") * 0.25).cast("long")
    return (
        cum.filter(F.col("cum_tokens") <= budget)
        .select("doc_id", "n_tokens", "cum_tokens")
        .orderBy("cum_tokens")
    )


@query("order_percentile_ranks_scalable", _RANKS_ORACLE)
def order_percentile_ranks_scalable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """percent_rank + cume_dist per order status without per-status
    global windows: tie-aware cumulative counts at the distinct
    (status, price) level (combinable aggregation + range-partitioned
    running sum), then an equi-join back onto orders to emit per-row
    ranks. rank = cum_le - cnt + 1 reproduces SQL's shared-min-rank
    tie semantics exactly."""
    orders = read_table(spark, sf_dir, "orders")
    cume = grouped_cume_counts(orders, "o_orderstatus", "o_totalprice")
    rank = F.col("cum_le") - F.col("cnt") + 1
    # rename the join keys: per_value shares lineage with orders, so
    # unrenamed columns would be ambiguous in the self-join below
    per_value = cume.select(
        F.col("o_orderstatus").alias("__status"),
        F.col("o_totalprice").alias("__price"),
        F.round(
            F.when(
                F.col("n_total") > 1, (rank - 1) / (F.col("n_total") - 1)
            ).otherwise(F.lit(0.0)),  # SQL: single-row partition → 0
            6,
        ).alias("pct_rank"),
        F.round(F.col("cum_le") / F.col("n_total"), 6).alias("cume_dist"),
    )
    return (
        orders.join(
            per_value,
            (F.col("o_orderstatus") == F.col("__status"))
            & (F.col("o_totalprice") == F.col("__price")),
        )
        .select(
            "o_orderkey",
            "o_orderstatus",
            (F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)) / 100)
            .alias("o_totalprice"),
            "pct_rank",
            "cume_dist",
        )
        .orderBy("o_orderkey")
    )
