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

from pyspark.sql import DataFrame, Window
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
    # Presence marker, not per-column coalesce: a matched update that sets
    # a field to NULL must replace the target value (reference main.py:151
    # replaces the whole row), or row_hash re-classifies it forever.
    s = source.select(
        [F.col(c).alias(f"__s_{c}") for c in cols] + [F.lit(True).alias("__s_present")]
    )
    cond = reduce(
        lambda a, b: a & b,
        [t[f"__t_{k}"].eqNullSafe(s[f"__s_{k}"]) for k in keys],
    )
    joined = t.join(s, cond, "full_outer")
    return joined.select(
        [
            F.when(F.col("__s_present").isNotNull(), F.col(f"__s_{c}"))
            .otherwise(F.col(f"__t_{c}"))
            .alias(c)
            for c in cols
        ]
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


def scd2_upsert(
    dim: DataFrame,
    updates: DataFrame,
    keys: list[str],
    effective_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension Type 2 merge: attribute changes close
    the current row (``valid_to`` = the update's effective time) and
    open a new current row; identical updates are no-ops; unseen keys
    insert. History rows are untouched.

    ``dim`` carries (keys, attrs..., valid_from, valid_to) with
    valid_to NULL on current rows; ``updates`` carries (keys, attrs...,
    effective_col). Change detection = canonical row hash over the
    attribute columns (the O-D3 rule applied to dimensions).

    One shuffle on the key for the current-vs-update join; history
    passes through untouched, so at scale the cost is O(|current| +
    |updates|), independent of history depth — and with both sides
    bucketed by key the join co-locates.
    """
    attrs = [
        c
        for c in dim.columns
        if c not in (*keys, valid_from, valid_to, "row_hash")
    ]
    if sorted(attrs) != sorted(
        c
        for c in updates.columns
        if c not in (*keys, effective_col, "row_hash")
    ):
        raise ValueError("dim and updates must share attribute columns")

    history = dim.filter(F.col(valid_to).isNotNull())
    current = with_row_hash(
        dim.filter(F.col(valid_to).isNull()), exclude=(valid_from, valid_to)
    )
    upd = with_row_hash(updates, exclude=(effective_col,))
    # Latest-per-key pre-reduction: multiple updates for one key in a
    # batch would otherwise fan out through the full-outer join into
    # duplicate closed rows and several open "current" rows. Ties on
    # effective time break on the row hash for determinism.
    w = Window.partitionBy(*keys).orderBy(
        F.col(effective_col).desc(), F.col("row_hash")
    )
    upd = (
        upd.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    cur = current.select(
        *keys,
        *[F.col(c).alias(f"__c_{c}") for c in attrs],
        F.col(valid_from).alias("__c_from"),
        F.col("row_hash").alias("__c_hash"),
    )
    s = upd.select(
        *keys,
        *[F.col(c).alias(f"__u_{c}") for c in attrs],
        F.col(effective_col).alias("__u_eff"),
        F.col("row_hash").alias("__u_hash"),
    )
    j = cur.join(s, keys, "full_outer")
    changed = F.col("__c_hash").isNotNull() & F.col("__u_hash").isNotNull() & (
        F.col("__c_hash") != F.col("__u_hash")
    )
    # current rows: kept as-is (no update / identical), or closed out
    kept = j.filter(
        F.col("__c_hash").isNotNull()
        & (F.col("__u_hash").isNull() | (F.col("__u_hash") == F.col("__c_hash")))
    ).select(
        *keys,
        *[F.col(f"__c_{c}").alias(c) for c in attrs],
        F.col("__c_from").alias(valid_from),
        F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
    )
    closed = j.filter(changed).select(
        *keys,
        *[F.col(f"__c_{c}").alias(c) for c in attrs],
        F.col("__c_from").alias(valid_from),
        F.col("__u_eff").alias(valid_to),
    )
    opened = j.filter(changed | F.col("__c_hash").isNull()).select(
        *keys,
        *[F.col(f"__u_{c}").alias(c) for c in attrs],
        F.col("__u_eff").alias(valid_from),
        F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
    )
    out_cols = [*keys, *attrs, valid_from, valid_to]
    return (
        history.select(*out_cols)
        .unionByName(kept)
        .unionByName(closed)
        .unionByName(opened)
    )
