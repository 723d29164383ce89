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
