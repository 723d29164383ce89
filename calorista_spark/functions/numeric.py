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


def quantized_sum(col: Column | str, scale: int = 4) -> Column:
    """Cross-engine-exact rounded SUM for large aggregates: quantize
    each row to a scaled integer (``floor(x*10^scale + 0.5)`` — pure
    IEEE ops, identical in any engine), sum EXACTLY as decimals
    (order-independent, overflow-safe far past 100 TB magnitudes),
    unscale to double at the end.

    Per-row quantized values are DECIMAL(18,0) — not (38,0) — so the
    SUM widens to DECIMAL(28,0) and stays on Spark's fast fixed-128
    aggregation path; precision-38 inputs can't widen and fall off it
    (2–4× slower, measured in BENCH_r05). Still exact at scale:
    per-row magnitude < 1e14 at scale 4 (TPC-H prices ≈ 1e5) and a
    100 TB revenue total ≈ 1e17 ≪ 1e28.

    Why not ``round(sum(x), 4)``: at ~1e9+ magnitudes the 4th decimal
    of a double sum sits inside accumulation-order noise (ulp ≈ 5e-7
    per add), so two engines — or two partitionings of the SAME
    engine — can legally disagree by 1 ulp at the rounding boundary.
    Summing integers removes the order dependence entirely.

    Semantics: sum-of-rounded rather than rounded-sum; per-row error
    < 0.5/10^scale, bounded and deterministic. Oracle twin snippet:
    ``CAST(SUM(CAST(FLOOR((x) * 1e4 + 0.5) AS HUGEINT)) AS DOUBLE) /
    10000.0``.
    """
    c = F.col(col) if isinstance(col, str) else col
    q = F.floor(c * F.lit(float(10 ** scale)) + F.lit(0.5)).cast(
        "decimal(18,0)"
    )
    return (F.sum(q).cast("double") / F.lit(float(10 ** scale)))


def quantized_sum_scaled(col: Column | str, scale: int = 4) -> Column:
    """The scaled-integer EXACT sum behind :func:`quantized_sum`
    (DECIMAL, still ×10^scale). Use when a derived column needs the
    sum as input (e.g. ``floor(scaled/7 + 0.5)/1e4`` for a
    deterministic divided average) so every downstream op stays in
    the identical-IEEE regime."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(
        F.floor(c * F.lit(float(10 ** scale)) + F.lit(0.5)).cast(
            "decimal(18,0)"
        )
    )
