"""Numeric coercion + derived-measure expressions (O-S11, O-S12, O-A7)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def coerce_double(col: Column | str, default: float = 0.0) -> Column:
    """O-S11: string → double; invalid or missing → ``default``.

    Reference: streamlit_app.py:105-110 (``pd.to_numeric(errors=
    "coerce").fillna(0.0)``) and models.py:49-56 (``float(x or 0)``).
    """
    c = F.col(col) if isinstance(col, str) else col
    # try_cast: ANSI mode throws on malformed strings; the reference
    # coerces them to the default instead.
    return F.coalesce(c.try_cast("double"), F.lit(float(default)))


def share_pct(col: Column | str, total: Column) -> Column:
    """O-A7/W2: share of a total ×100 (macro-ratio semantics,
    reference streamlit_app.py:465-468). Null-safe: 0-total → null."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(total != 0, c / total * 100.0)
