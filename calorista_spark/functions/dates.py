"""Date/time scalar expressions (SURVEY §2.3 O-S1–S8).

Each docstring cites the reference behavior being re-expressed; all are
native Catalyst expressions (constant-folded, codegen'd, pushdown-safe).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH = "1970-01-01"


def epoch_days_to_date(col: Column | str) -> Column:
    """O-S1: epoch-days (possibly a float-string like ``"20215.0"``)
    → DateType; invalid input → null.

    Reference: main.py:34-39 (``int(float(days_str))`` then
    ``timedelta(days=...)``, None on error).
    """
    c = F.col(col) if isinstance(col, str) else col
    # try_cast, not cast: ANSI mode (Spark 4 default) would throw on
    # malformed input; the reference returns None (main.py:38-39).
    days = c.try_cast("double").try_cast("int")  # "20215.0" → 20215; bad → null
    return F.date_add(F.to_date(F.lit(_EPOCH)), days)


def date_to_epoch_days(col: Column | str) -> Column:
    """O-S2: date → days since 1970-01-01 (reference api.py:140-144)."""
    c = F.col(col) if isinstance(col, str) else col
    # long, not int: int64 matches what SQL engines emit for datediff,
    # keeping the driver's arrow value-hash symmetric with the oracle.
    return F.datediff(c.cast("date"), F.to_date(F.lit(_EPOCH))).cast("long")


def iso_year(col: Column | str) -> Column:
    """O-S5: ISO-8601 week-numbering year (reference
    streamlit_app.py:386 ``isocalendar()[0]``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_part(F.lit("YEAROFWEEK"), c.cast("date")).cast("long")


def iso_week(col: Column | str) -> Column:
    """O-S5: ISO week number 1-53 (``isocalendar()[1]``); Spark's
    ``weekofyear`` is ISO-8601."""
    c = F.col(col) if isinstance(col, str) else col
    return F.weekofyear(c.cast("date")).cast("long")


def month_start(col: Column | str) -> Column:
    """O-S6: truncate to first day of month (``to_period("M")``,
    reference streamlit_app.py:518-519)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_trunc("month", c).cast("date")


def month_label(col: Column | str) -> Column:
    """O-S6: ``strftime("%b %Y")`` label, e.g. ``Feb 2021``
    (reference streamlit_app.py:520)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "MMM yyyy")


def days_in_month(col: Column | str) -> Column:
    """O-S8: number of days in the month of the date
    (reference streamlit_app.py:539 ``dt.days_in_month``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.dayofmonth(F.last_day(c.cast("date")))


def today_in_tz(tz: str = "Europe/Kiev") -> Column:
    """O-S4: timezone-aware "today" (reference main.py:24-31 uses Kyiv
    local time to decide the sync end date). Nondeterministic — used by
    the pipeline, never by the correctness-gated queries."""
    return F.to_date(F.from_utc_timestamp(F.current_timestamp(), tz))
