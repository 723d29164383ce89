"""Changed-row upsert — the reference's signature operation
(SURVEY §2.4 O-D3/O-D4; reference main.py:140-161).

Reference semantics, per date partition:
  - new fingerprint            → INSERT
  - same fingerprint, any field differs → REPLACE with incoming row
  - same fingerprint, identical        → no-op (keep existing)

On a Delta-enabled cluster this is ``MERGE INTO ... WHEN MATCHED AND
src.row_hash <> tgt.row_hash THEN UPDATE WHEN NOT MATCHED THEN
INSERT``. This module is the engine's pure-DataFrame fallback (plain
parquet, no table format): a full-outer join on the key where the
source side wins. Both shapes shuffle once on the merge key; at scale,
bucketing target and source by the key makes the join co-located
(zero shuffle), and the row-hash comparison keeps the update write set
minimal (§4.2.3).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from calorista_spark.functions.text import row_hash


def with_row_hash(df: DataFrame, exclude: tuple[str, ...] = ()) -> DataFrame:
    """Attach the canonical whole-row hash (sorted column order so two
    frames with different column order still compare equal)."""
    cols = sorted(c for c in df.columns if c not in exclude and c != "row_hash")
    return df.withColumn("row_hash", row_hash(*cols))


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """Full-outer merge where source wins on key match.

    Equivalent to the reference's read-modify-write loop but atomic,
    distributed, and one shuffle. Columns must match between frames
    (the engine's schema enforcement guarantees it).
    """
    cols = target.columns
    if set(cols) != set(source.columns):
        raise ValueError(
            f"merge requires identical schemas; target={cols} source={source.columns}"
        )
    t = target.select([F.col(c).alias(f"__t_{c}") for c in cols])
    s = source.select([F.col(c).alias(f"__s_{c}") for c in cols])
    cond = reduce(
        lambda a, b: a & b,
        [t[f"__t_{k}"].eqNullSafe(s[f"__s_{k}"]) for k in keys],
    )
    joined = t.join(s, cond, "full_outer")
    return joined.select(
        [F.coalesce(F.col(f"__s_{c}"), F.col(f"__t_{c}")).alias(c) for c in cols]
    )


def merge_classify(
    target: DataFrame, source: DataFrame, keys: list[str]
) -> DataFrame:
    """Merge audit: label every output row insert / update / unchanged —
    the three branches of reference main.py:146-161 made explicit.
    Needs a ``row_hash`` column on both sides (see ``with_row_hash``).
    """
    t = target.select(*keys, F.col("row_hash").alias("__t_hash"))
    s = source.select(*keys, F.col("row_hash").alias("__s_hash"))
    joined = t.join(s, keys, "full_outer")
    return joined.select(
        *keys,
        F.when(F.col("__t_hash").isNull(), F.lit("insert"))
        .when(F.col("__s_hash").isNull(), F.lit("keep"))
        .when(F.col("__s_hash") != F.col("__t_hash"), F.lit("update"))
        .otherwise(F.lit("unchanged"))
        .alias("action"),
    )
