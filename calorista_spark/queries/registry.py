"""Query registry backing ``__spark_entry__.py`` and ``bench.py``.

Every operator from SURVEY §2 that the engine claims as done registers
here: a Spark callable ``(spark, sf_dir) -> DataFrame`` and (when
SQL-expressible) a DuckDB oracle SQL string computing the same result
with the SAME column names — the driver compares row count + schema +
order-insensitive value hash.

Cross-engine determinism conventions (why every query looks the way
it does):
- every aggregate/computed double is wrapped in ``round(x, 4)`` on BOTH
  sides, so sub-ulp differences from parallel summation order never
  reach the hash;
- round-half BOUNDARIES are the residual risk: when a value lands
  exactly on x.xxxx5 (observed at sf0.1 for carried averages and
  unit-cost divisions), Spark's BigDecimal HALF_UP and DuckDB's
  scaled-double round can disagree by 1 ulp. Boundary-prone outputs
  quantize via ``FLOOR(x*1e4 + 0.5)/1e4`` instead — identical IEEE
  ops in both engines (see min_cost_supplier_q2, events_locf_gapfill);
- LARGE SUMS amplify it: at ~1e9+ magnitudes the 4th decimal of a
  double sum sits inside accumulation-order noise (ulp ≈ 5e-7/add),
  so ``round(sum(x), 4)`` is not engine-stable no matter the rounding
  mode. Big-aggregate queries use ``functions.numeric.quantized_sum``
  (scaled-integer per-row quantize → exact decimal sum → unscale);
  thresholds over such sums rearrange to integer comparisons
  (important_parts_q11). ``+ 0.0`` collapses IEEE -0.0 wherever a
  near-zero result's sign depends on accumulation order;
- ORACLE SQL must floor integer divisions explicitly: DuckDB ``a / b``
  on integers is FLOAT division, and ``CAST(double AS INTEGER)``
  ROUNDS — use ``a // b`` to mirror Spark's truncating
  ``(col / n).cast("int")`` (bit round 5: LSH band assignment);
- temporal outputs are DATE or formatted strings (the parquet files
  carry timestamp_ntz, so no zone is involved);
- any "pick one row of a tie" op breaks ties on a total order that
  includes a unique key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` marks a non-SQL-expressible op
    (driver falls back to a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
