"""Reshaping operators (SURVEY §2.7 O-R1/O-R2/O-R5).

The date-spine densify preserves the reference's deliberate null
semantics (SURVEY §7 quirk list): a day with no rows stays NULL after
the spine join — never coalesced to 0 — while per-row numeric coercion
defaults to 0.0 before aggregation. Two distinct null policies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def unpivot(
    df: DataFrame,
    ids: list[str],
    values: list[str],
    var_name: str = "measure",
    value_name: str = "amount",
) -> DataFrame:
    """O-R1 melt (reference streamlit_app.py:346-351 et al.), using
    Spark's native ``unpivot`` (no UDF, no explode of structs)."""
    return df.unpivot(ids, values, var_name, value_name)


def pivot_agg(
    df: DataFrame,
    ids: list[str],
    pivot_col: str,
    pivot_values: list[str],
    agg: Column,
) -> DataFrame:
    """The inverse reshape: long → wide with one aggregated column per
    pivot value (the reference's wide dashboard tables, e.g. one
    column per measure/day).

    ``pivot_values`` is REQUIRED: with an explicit value list Spark
    skips the extra distinct-collection job AND the output schema is
    static — at 100 TB an implicit pivot would both scan the data
    twice and risk an unbounded column explosion from a high-cardinality
    key. One shuffle on ``ids``; per-value aggregates map-side combine.
    """
    return df.groupBy(*ids).pivot(pivot_col, pivot_values).agg(agg)


def date_spine(
    spark: SparkSession, start: Column | str, end: Column | str
) -> DataFrame:
    """Dense daily spine [start, end] — ``sequence`` + ``explode``
    generates distributed, not via driver-side range materialization.
    """
    s = F.lit(start) if isinstance(start, str) else start
    e = F.lit(end) if isinstance(end, str) else end
    return spark.range(1).select(
        F.explode(
            F.sequence(F.to_date(s), F.to_date(e), F.expr("interval 1 day"))
        ).alias("date")
    )


def densify_by_date(
    df: DataFrame,
    date_col: str,
    spine: DataFrame,
) -> DataFrame:
    """O-R2: left-align aggregates onto the spine; missing days stay
    null (reference streamlit_app.py:326-332 ``reindex`` keeps NaN).

    The spine side is tiny (one row per day) — broadcast it so the
    fact side never shuffles.
    """
    return F.broadcast(spine).join(
        df, spine["date"] == df[date_col], "left"
    ).drop(date_col)


def group_collect(
    df: DataFrame, keys: list[str], value: Column | str, sort: bool = True
) -> DataFrame:
    """O-R5: collect per-key lists (reference main.py:116-130 builds
    per-date entry lists for the JSON-blob sink). ``sort_array`` makes
    the list deterministic — collect_list order is not."""
    v = F.col(value) if isinstance(value, str) else value
    agg = F.collect_list(v)
    if sort:
        agg = F.sort_array(agg)
    return df.groupBy(*keys).agg(agg.alias("values"))
