"""Input validation + empty-result guards (SURVEY §2.2 O-F4/O-F5,
§2.3 O-S14).

The reference validates date ranges before querying
(streamlit_app.py:300-302) and short-circuits every dashboard section
on an empty frame (streamlit_app.py:229-231 et al.). Engine versions:
raise BEFORE building the plan; probe emptiness with a limit(1) scan
(never a full count).
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate_date_range(start: str | datetime.date, end: str | datetime.date) -> None:
    """O-F4: reject inverted ranges before any plan is built
    (reference streamlit_app.py:300-302)."""
    s = datetime.date.fromisoformat(str(start))
    e = datetime.date.fromisoformat(str(end))
    if s > e:
        raise ValueError(f"start date {s} is after end date {e}")


def is_empty(df: DataFrame) -> bool:
    """O-F5: cheap emptiness probe — limit-1, not count(). On a
    partitioned store this touches at most one file."""
    return df.limit(1).isEmpty()


def format_kcal(col: Column | str) -> Column:
    """O-S14: display formatting ``f"{x:.0f} kcal"`` (reference
    streamlit_app.py:173-179). Display edge only — never used inside
    engine queries."""
    c = F.col(col) if isinstance(col, str) else col
    return F.format_string("%.0f kcal", c)


def format_grams(col: Column | str) -> Column:
    """O-S14: ``f"{x:.1f} g"``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.format_string("%.1f g", c)
