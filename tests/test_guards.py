"""O-F4/O-F5/O-S14 guard + formatting semantics."""

from __future__ import annotations

import pytest

from calorista_spark.functions.guards import (
    format_grams,
    format_kcal,
    is_empty,
    validate_date_range,
)
from calorista_spark.pipeline.food_entries import daily_range_section


def test_validate_date_range():
    validate_date_range("2024-01-01", "2024-01-01")  # equal is fine
    with pytest.raises(ValueError, match="after end"):
        validate_date_range("2024-02-01", "2024-01-01")


def test_daily_range_section_rejects_inverted_range(spark):
    entries = spark.createDataFrame([], "date date, calories double, carbohydrate double, fat double, protein double")
    with pytest.raises(ValueError):
        daily_range_section(entries, "2024-02-01", "2024-01-01")


def test_is_empty_probe(spark):
    assert is_empty(spark.range(0))
    assert not is_empty(spark.range(5))


def test_display_formatting(spark):
    # reference streamlit_app.py:173-179: f"{x:.0f} kcal" / f"{x:.1f} g"
    df = spark.createDataFrame([(1234.56,)], ["x"])
    row = df.select(
        format_kcal("x").alias("k"), format_grams("x").alias("g")
    ).collect()[0]
    assert row.k == "1235 kcal"
    assert row.g == "1234.6 g"
