"""Data-layout operators: Z-order clustering (SURVEY §4.3 — "Z-order/
cluster on fingerprint for MERGE locality").

Z-ordering interleaves the bits of several quantized columns into one
sort key, so range-partitioning + sorting by that key co-locates rows
that are close in EVERY clustered dimension. Readers filtering on any
clustered column then skip most files via parquet min/max statistics
— the open-format equivalent of Delta's OPTIMIZE ZORDER BY.

All of it is plain column expressions (shift/and/or), fully inside
whole-stage codegen; the only data movement is the single range
repartition that any clustered rewrite needs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Scale a numeric column into the integer grid [0, 2^bits) —
    the per-dimension normalization Z-ordering interleaves. Values at
    ``hi`` land on the top cell; out-of-range values clamp."""
    cells = (1 << bits) - 1
    scaled = ((col.cast("double") - lo) / (hi - lo)) * cells
    return F.least(
        F.greatest(F.round(scaled, 0).cast("bigint"), F.lit(0)),
        F.lit(cells),
    )


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (already-quantized)
    column into one Morton key: bit i of column j lands at position
    i * n_cols + j. Built as a static OR-chain of shift/mask exprs —
    bits * n_cols terms, all codegen'd, no UDF."""
    n = len(cols)
    terms = []
    for j, c in enumerate(cols):
        c = c.cast("bigint")
        for i in range(bits):
            src = F.shiftright(c, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(src, i * n + j))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_repartition(
    df: DataFrame,
    cols: list[str],
    bounds: dict[str, tuple[float, float]],
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cluster ``df`` by the Z-order of ``cols`` (each quantized with
    its (lo, hi) bound): range-repartition on the Morton key, then
    sort within partitions so parquet row-group min/max stats are
    tight on every clustered column."""
    key = zorder_key(
        [quantize(F.col(c), *bounds[c], bits=bits) for c in cols], bits=bits
    )
    with_key = df.withColumn("__zkey", key)
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        with_key.repartitionByRange(parts, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
