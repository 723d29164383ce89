"""Window operators (SURVEY §2.9 W1–W3)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rank_latest(
    df: DataFrame, partition_keys: list[str], order_by: list[Column | str]
) -> DataFrame:
    """W1: keep the top-1 row per key under a total order (the
    reference's sort-desc-take-first at streamlit_app.py:233-234,
    generalized per-group). Callers include a unique tiebreaker in
    ``order_by`` for determinism."""
    w = Window.partitionBy(*partition_keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def share_of_total(
    df: DataFrame, partition_keys: list[str], value: str, out_col: str
) -> DataFrame:
    """W2: value / group-total ×100 (the macro-ratio at
    streamlit_app.py:465-468 generalized to grouped shares)."""
    w = Window.partitionBy(*partition_keys)
    total = F.sum(value).over(w)
    return df.withColumn(
        out_col, F.when(total != 0, F.col(value) / total * 100.0)
    )


def ewma_adjusted_longhorizon(
    df: DataFrame,
    order_col: str,
    value: str,
    out_col: str = "ewma",
    alpha: float = 0.3,
    block: int = 50,
    carry_terms: int = 4,
) -> DataFrame:
    """Adjust-normalized EWMA (pandas ``ewm(alpha, adjust=True)``)
    over a total order, SAFE AT ANY HORIZON — the chunked/renormalized
    variant of the closed form in ``events_daily_ewma`` (r6 verdict
    item: that query's ``(1-α)^(-rn)`` rescale overflows double around
    rn≈2000).

    Decomposition: rows are split into blocks of ``block`` rows; with
    q = 1-α, 0-based in-block offset r and in-block cumulative
    ``S_t = Σ_{i≤t in blk} x_i·q^(-r_i)``,

        num_t = q^r·S_t + q^(r+block)·(S(b-1) + q^block·(S(b-2) + …))

    (den the same with x≡1). Every exponent is bounded by
    ``block + carry_terms·block`` — q^(-49) ≈ 5e7 and q^(250) ≈ 2e-39
    at the defaults — so nothing overflows at ANY series length, and
    the carry truncation error (< q^(carry_terms·block) relative) is
    dozens of orders below double ulp. Pinned against pandas ``ewm``
    at 5,000 rows in tests.

    Plan shape: one O(rows) row_number window and one O(rows/block)
    carry-lag window (both bounded per the PLANS.md audit — callers
    apply this to per-DAY aggregates); the in-block cumulative is a
    ``partitionBy(block)`` window, ≤ ``block`` rows per task.

    Cross-engine note: the oracle twin in queries/timeseries.py writes
    the SAME expression tree in SQL, so both engines fold the same
    IEEE ops in the same order — the determinism argument every
    windowed-double query in the registry relies on.
    """
    q = 1.0 - alpha
    w_rn = Window.orderBy(order_col)
    rows = (
        df.withColumn("__pos", F.row_number().over(w_rn) - 1)
        .withColumn("__b", F.expr(f"__pos div {block}"))
        .withColumn("__r", F.pmod("__pos", block).cast("int"))
    )
    w_blk = (
        Window.partitionBy("__b")
        .orderBy("__r")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    qc = F.lit(q)
    rows = rows.withColumn(
        "__s_num", F.sum(F.col(value) * F.pow(qc, -F.col("__r"))).over(w_blk)
    ).withColumn("__s_den", F.sum(F.pow(qc, -F.col("__r"))).over(w_blk))
    # one row per COMPLETE block (only complete blocks precede others)
    blocks = rows.filter(F.col("__r") == block - 1).select(
        F.col("__b").alias("__j"), "__s_num", "__s_den"
    )
    w_j = Window.orderBy("__j")
    qL = F.lit(q**block)

    def horner(col: str) -> Column:
        # carry_terms=1 means "this block only" — no lagged carry at all.
        if carry_terms <= 1:
            return F.col(col)
        acc: Column = F.coalesce(
            F.lag(col, carry_terms - 1).over(w_j), F.lit(0.0)
        )
        for k in range(carry_terms - 2, 0, -1):
            acc = F.coalesce(F.lag(col, k).over(w_j), F.lit(0.0)) + qL * acc
        return F.col(col) + qL * acc

    carries = blocks.select(
        (F.col("__j") + 1).alias("__b"),
        horner("__s_num").alias("__c_num"),
        horner("__s_den").alias("__c_den"),
    )
    joined = rows.join(F.broadcast(carries), "__b", "left")
    num = F.pow(qc, F.col("__r")) * F.col("__s_num") + F.pow(
        qc, F.col("__r") + block
    ) * F.coalesce(F.col("__c_num"), F.lit(0.0))
    den = F.pow(qc, F.col("__r")) * F.col("__s_den") + F.pow(
        qc, F.col("__r") + block
    ) * F.coalesce(F.col("__c_den"), F.lit(0.0))
    return joined.withColumn(out_col, num / den).drop(
        "__pos", "__b", "__r", "__s_num", "__s_den", "__c_num", "__c_den"
    )


def moving_avg(
    df: DataFrame,
    order_col: str,
    value: str,
    out_col: str,
    window_rows: int = 7,
    partition_keys: list[str] | None = None,
) -> DataFrame:
    """W3: trailing N-row moving average (the rolling variant of the
    reference's weekly/monthly trend buckets)."""
    w = Window.orderBy(order_col).rowsBetween(-(window_rows - 1), 0)
    if partition_keys:
        w = (
            Window.partitionBy(*partition_keys)
            .orderBy(order_col)
            .rowsBetween(-(window_rows - 1), 0)
        )
    return df.withColumn(out_col, F.avg(value).over(w))
