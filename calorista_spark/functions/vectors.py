"""Vector column expressions over ``array<float|double>`` (L3/L5).

All pure Catalyst higher-order functions — ``zip_with`` + ``aggregate``
— so similarity math runs JVM-side inside codegen, with no Python or
Arrow transfer. The fold is a sequential left-to-right accumulation,
which makes results deterministic (and bit-identical to any engine that
folds in the same order).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length array columns."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; null if either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


def l2_distance(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance of two equal-length array columns — same
    left-fold shape as ``dot`` (squared differences, then sqrt)."""
    sq = F.aggregate(
        F.zip_with(
            _c(a),
            _c(b),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.sqrt(sq)
