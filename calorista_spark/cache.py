"""Cache hygiene for persisting operators (r7, VERDICT item).

Some operators persist intermediates BY DESIGN: the two-pass rank
family must freeze one evaluation of its range exchange
(operators/ranks.py — boundary-consistency, not an optimization) and
``doc_ccnet_buckets`` persists its thrice-consumed scores frame. A
long-lived session composing many such queries would otherwise
accumulate serialized frames until eviction pressure (or disk) hurts.

This module makes the epilogue explicit and self-contained:

- operators route their persists through :func:`tracked_persist`;
- a runner (bench.py, driver loops, tests) calls
  :func:`release_caches` AFTER materializing each query's result.

Why release can't be automatic inside the operator: ``persist`` is
lazy and the operator returns a lazy DataFrame — unpersisting before
the caller's action would re-expose the ranks' branch-divergence bug
(the persist exists to pin ONE evaluation). Only the code that ran
the action knows when it is safe, hence the runner-side epilogue.

``release_caches(spark)`` also sweeps any remaining persistent RDDs
(``localCheckpoint`` blocks from the iterative operators — connected
components, the all-Spark BPE loop). Call it ONLY between queries:
unpersisting a localCheckpointed RDD drops the only copy of its data
(lineage is truncated), so a DataFrame still holding one must not be
re-used afterwards.
"""

from __future__ import annotations

import weakref

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_TRACKED: list[weakref.ReferenceType] = []


def tracked_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """``df.persist(level)`` + registration for a later
    :func:`release_caches` epilogue. Weakly referenced: a frame the
    caller dropped is simply skipped at release time."""
    _TRACKED.append(weakref.ref(df))
    return df.persist(level)


def release_tracked() -> int:
    """Unpersist every live tracked frame (blocking=False); returns
    how many were released."""
    released = 0
    for ref in _TRACKED:
        df = ref()
        if df is not None:
            try:
                df.unpersist()
                released += 1
            except Exception:  # noqa: BLE001 — stopped session etc.
                pass
    _TRACKED.clear()
    return released


def cached_rdd_count(spark) -> int:
    """Number of persistent RDDs the JVM still tracks (includes SQL
    caches and localCheckpoint blocks)."""
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def release_caches(spark) -> int:
    """Full between-queries epilogue: tracked persists, SQL cache
    registry, and any leftover persistent RDDs (localCheckpoints of
    iterative operators). Returns the persistent-RDD count BEFORE the
    sweep. Safe only after the previous query's result is fully
    materialized — see module docstring."""
    before = cached_rdd_count(spark)
    release_tracked()
    spark.catalog.clearCache()
    jrdds = spark.sparkContext._jsc.getPersistentRDDs()
    for jrdd in list(jrdds.values()):
        try:
            jrdd.unpersist(False)
        except Exception:  # noqa: BLE001
            pass
    return before
