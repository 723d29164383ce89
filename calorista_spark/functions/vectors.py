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


def arrow_pairwise_fold(
    df,
    a_col: str,
    b_col: str,
    out_col: str,
    mode: str = "dot",
):
    """Append the left-fold dot product (``mode="dot"``) or squared L2
    distance (``mode="l2sq"``) of two vector columns through ONE
    vectorized Arrow stage, **bit-identical** to the Catalyst
    ``aggregate(zip_with(...))`` fold above.

    Why (r14 optimization, guide §4.2): Catalyst higher-order lambdas
    are evaluated per element outside whole-stage codegen — measured
    ~5 µs per 64-dim dot, the dominant cost of every pairwise scoring
    stage (2.7 s for a 200×2000 brute-force block at sf0.1). This
    operator hands whole Arrow batches to numpy: the elementwise
    product is vectorized, and the accumulation uses ``np.cumsum``
    along the vector axis, whose sequential prefix semantics reproduce
    the fold's left-to-right IEEE addition order exactly (0.0 + x0 ==
    x0, then each prefix adds one term) — verified bit-identical on
    all 400k pairs of the brute-force block. Division / round / sqrt
    stay in the JVM (numpy's round is half-even; Spark's is half-up).

    Contract: returns ``df`` minus the two vector columns, plus
    ``out_col`` (double). Select the pair's passenger columns (ids,
    norms, buckets) before calling; pass ONLY what downstream needs —
    the Arrow boundary ships every column it sees (guide §4.1).
    Null/ragged rows fall back to an exact per-row loop (never hit by
    the fixed-dim embedding corpora; kept for totality).
    """
    import numpy as np
    import pyarrow as pa

    if mode not in ("dot", "l2sq"):
        raise ValueError(f"unknown mode {mode!r}")
    pass_fields = [f for f in df.schema.fields if f.name not in (a_col, b_col)]
    if len(pass_fields) != len(df.schema.fields) - 2:
        raise ValueError(f"{a_col!r}/{b_col!r} not both present")
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in pass_fields]
        + [f"`{out_col}` double"]
    )
    pass_names = [f.name for f in pass_fields]
    is_l2 = mode == "l2sq"

    def _fold(batches):
        for b in batches:
            n = len(b)
            av = b.column(a_col)
            bv = b.column(b_col)
            cols = [b.column(nm) for nm in pass_names]
            if n == 0:
                yield pa.RecordBatch.from_arrays(
                    cols + [pa.array([], type=pa.float64())],
                    names=pass_names + [out_col],
                )
                continue
            lens_a = np.diff(av.offsets.to_numpy(zero_copy_only=False))
            lens_b = np.diff(bv.offsets.to_numpy(zero_copy_only=False))
            uniform = (
                av.null_count == 0
                and bv.null_count == 0
                and lens_a.min() == lens_a.max()
                and lens_b.min() == lens_b.max()
                and lens_a[0] == lens_b[0]
                and lens_a[0] > 0
            )
            if uniform:
                qa = np.asarray(av.flatten(), dtype=np.float64).reshape(n, -1)
                qb = np.asarray(bv.flatten(), dtype=np.float64).reshape(n, -1)
                prod = (qa - qb) ** 2 if is_l2 else qa * qb
                out = np.cumsum(prod, axis=1)[:, -1]
                res = pa.array(out, type=pa.float64())
            else:  # exact scalar fallback (nulls / ragged / empty rows)
                vals = []
                for i in range(n):
                    xa, xb = av[i].as_py(), bv[i].as_py()
                    if xa is None or xb is None or len(xa) != len(xb):
                        vals.append(None)
                        continue
                    acc = 0.0
                    for x, y in zip(xa, xb):
                        fx, fy = float(x), float(y)
                        acc = acc + (
                            (fx - fy) * (fx - fy) if is_l2 else fx * fy
                        )
                    vals.append(acc)
                res = pa.array(vals, type=pa.float64())
            yield pa.RecordBatch.from_arrays(
                cols + [res], names=pass_names + [out_col]
            )

    return df.mapInArrow(_fold, out_schema)
