"""Table-format queries (r10 — VERDICT r9 #1/#3): partition-scoped
commit-log MERGE and the change-data-feed reader, both oracle-checked.

Pattern follows snapshot_diff.store_version_diff: the store is rebuilt
deterministically per call from the immutable events table, so each
query stays a pure function of its inputs while exercising the REAL
commit/merge/CDF machinery (sources/commitlog.py). The reference's own
store merges per date key (main.py:137-161 — only touched dates are
rewritten); these queries prove this engine's store now has the same
granularity, plus the incremental-consumer face the reference lacks.

Fixture: the events table aggregated to one row per (event_date,
user_id, event_type) with an exact BIGINT count — 30 date partitions.
The merge batch touches exactly two dates: non-'view' counts double
(updates), 'view' rows are re-sent IDENTICAL (must be suppressed by
CDF and must not break idempotence), and one synthetic 'backfill' row
per clicking user inserts. Everything is integer arithmetic, so both
engines agree bit-for-bit.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.queries.registry import query

_TOUCHED = ("2024-01-05", "2024-01-17")
_KEYS = ["event_date", "user_id", "event_type"]


def _day_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    return events.groupBy(
        F.to_date("ts").alias("event_date"), "user_id", "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))


def _merge_batch(base: DataFrame) -> DataFrame:
    touched = base.filter(
        F.col("event_date").isin([F.lit(d).cast("date") for d in _TOUCHED])
    )
    updates = touched.withColumn(
        "n_events",
        F.when(
            F.col("event_type") != F.lit("view"), F.col("n_events") * 2
        ).otherwise(F.col("n_events")),
    )
    inserts = touched.filter(F.col("event_type") == "click").select(
        "event_date",
        (F.col("user_id") + 100000).alias("user_id"),
        F.lit("backfill").alias("event_type"),
        F.lit(1).cast("long").alias("n_events"),
    )
    return updates.unionByName(inserts)


# The store_* queries all start from the SAME v1 snapshot (the
# 30-date day-counts table). Building it is the dominant fixture cost
# (full events aggregation + partitioned snapshot write), so it is
# built ONCE per (process, input-fingerprint) and each query works on
# a hardlink CLONE: data files are immutable by the format's own
# contract, so a clone is O(#files) link(2) calls and mutations only
# ever add new dirs. The fingerprint covers file names+sizes+mtimes of
# the events table — regenerated input never reuses a stale base (the
# r9 path-only stage-reuse lesson, applied here from the start).
_BASE_CACHE: dict[tuple, str] = {}


def _events_fingerprint(sf_dir: str) -> str:
    p = os.path.join(sf_dir, "events.parquet")
    parts = [sf_dir]
    if os.path.isdir(p):
        for n in sorted(os.listdir(p)):
            st = os.stat(os.path.join(p, n))
            parts.append(f"{n}:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.exists(p):
        st = os.stat(p)
        parts.append(f"{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5(";".join(parts).encode()).hexdigest()[:12]


def _base_store_path(spark: SparkSession, sf_dir: str) -> str:
    from calorista_spark.sources.commitlog import CommitLogStore

    fp = _events_fingerprint(sf_dir)
    key = (sf_dir, fp)
    cached = _BASE_CACHE.get(key)
    if cached and os.path.isfile(
        os.path.join(cached, "_commits", "v00000001.json")
    ):
        return cached
    path = os.path.join(
        tempfile.gettempdir(), f"calorista_storebase_{fp}_{os.getpid()}"
    )
    shutil.rmtree(path, ignore_errors=True)
    store = CommitLogStore(path)
    v1 = store.commit(
        _day_counts(spark, sf_dir),
        op="overwrite",
        expect_version=None,
        partition_by="event_date",
        keys=_KEYS,
        optimize_write=True,  # O(1) files per date, not one per task
    )
    if v1 != 1:  # not assert: must hold under python -O too
        raise RuntimeError(f"unexpected base version {v1}")
    _BASE_CACHE[key] = path
    return path


def _clone_store(spark: SparkSession, sf_dir: str, name: str):
    """A private hardlink clone of the shared v1 base store; mutations
    write new dirs only, so clones never interfere. Per-(query, input,
    process) path: concurrent sessions (sweep + pytest + stress audit)
    must not rmtree each other's live store."""
    from calorista_spark.sources.commitlog import CommitLogStore

    base = _base_store_path(spark, sf_dir)
    tag = hashlib.md5(f"{name}:{sf_dir}".encode()).hexdigest()[:12]
    path = os.path.join(
        tempfile.gettempdir(), f"calorista_{name}_{tag}_{os.getpid()}"
    )
    shutil.rmtree(path, ignore_errors=True)
    shutil.copytree(base, path, copy_function=os.link)
    return CommitLogStore(path)


# r11 (VERDICT r10 #4): the MUTATED store is also cached once per
# (query, input-fingerprint, process) — the first call per process
# exercises the real clone+mutation machinery, repeat calls (bench
# passes 2..n, repeated driver probes) reuse the finished store so
# their timing reflects the READ path, not fixture construction. Safe
# because every query below only READS its store after the one-time
# mutation, and data files are immutable by the format's contract.
_MUTATED_CACHE: dict[tuple, str] = {}


def _mutated_store(spark: SparkSession, sf_dir: str, name: str, mutate):
    from calorista_spark.sources.commitlog import CommitLogStore

    fp = _events_fingerprint(sf_dir)
    key = (name, sf_dir, fp)
    cached = _MUTATED_CACHE.get(key)
    if cached and os.path.isfile(
        os.path.join(cached, "_commits", "v00000001.json")
    ):
        return CommitLogStore(cached)
    store = _clone_store(spark, sf_dir, name)
    mutate(store)
    _MUTATED_CACHE[key] = store.path
    return store


def _build_store(spark: SparkSession, sf_dir: str, name: str):
    """(store, v1, v2): v1 = full 30-date snapshot partitioned by
    event_date; v2 = partition-scoped MERGE of the 2-date batch.
    Built once per process (see _mutated_store), read-only after."""

    def mutate(store):
        base = store.read(spark, 1)  # the committed v1 snapshot
        v2 = store.merge(
            spark, _merge_batch(base), _KEYS, optimize_write=True
        )
        if v2 != 2:
            raise RuntimeError(f"unexpected store versions (1, {v2})")

    return _mutated_store(spark, sf_dir, name, mutate), 1, 2


_PARTITION_MERGE_ORACLE = f"""
WITH base AS (
  SELECT CAST(ts AS DATE) AS event_date, user_id, event_type,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3
),
merged AS (
  SELECT event_date, user_id, event_type,
         CASE WHEN event_date IN (DATE '{_TOUCHED[0]}', DATE '{_TOUCHED[1]}')
                   AND event_type <> 'view'
              THEN n * 2 ELSE n END AS n
  FROM base
  UNION ALL
  SELECT event_date, user_id + 100000, 'backfill', 1
  FROM base
  WHERE event_date IN (DATE '{_TOUCHED[0]}', DATE '{_TOUCHED[1]}')
    AND event_type = 'click'
)
SELECT event_date,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(n) AS BIGINT) AS total_events,
       event_date NOT IN (DATE '{_TOUCHED[0]}', DATE '{_TOUCHED[1]}')
         AS files_carried
FROM merged
GROUP BY event_date
ORDER BY event_date
"""


@query("store_partition_merge_diff", _PARTITION_MERGE_ORACLE)
def store_partition_merge_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scoped MERGE proof (VERDICT r9 #1): merge a 2-date
    batch into a 30-date store, then emit per-date row counts of the
    merged snapshot PLUS ``files_carried`` — whether that date's data
    files in the v2 manifest are the very same paths v1 listed. The
    oracle pins the expected pattern (true for all 28 untouched dates,
    false for the 2 touched), so the correctness gate itself verifies
    the by-reference carry, not just the merged values; byte-identity
    of untouched partitions follows from file identity (data files are
    immutable). The in-query guard additionally hard-fails if a
    touched partition reused any old file."""
    store, v1, v2 = _build_store(spark, sf_dir, "merged")
    p1 = store.manifest(v1)["partitions"]
    p2 = store.manifest(v2)["partitions"]
    carried = []
    for d, fl in p2.items():
        same = p1.get(d) == fl
        if d in _TOUCHED and set(fl) & set(p1.get(d, [])):
            raise RuntimeError(f"touched partition {d} reused old files")
        carried.append((d, same))
    flags = spark.createDataFrame(
        carried, "event_date string, files_carried boolean"
    ).select(
        F.col("event_date").cast("date").alias("event_date"), "files_carried"
    )
    merged = store.read(spark, v2)
    agg = merged.groupBy("event_date").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_events").cast("long").alias("total_events"),
    )
    return agg.join(F.broadcast(flags), "event_date").orderBy("event_date")


_CDF_ORACLE = f"""
WITH base AS (
  SELECT CAST(ts AS DATE) AS event_date, user_id, event_type,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3
),
touched AS (
  SELECT * FROM base
  WHERE event_date IN (DATE '{_TOUCHED[0]}', DATE '{_TOUCHED[1]}')
)
SELECT event_date, user_id, event_type,
       CAST(n AS BIGINT) AS n_events,
       'update_preimage' AS _change_type,
       CAST(2 AS BIGINT) AS _commit_version
FROM touched WHERE event_type <> 'view'
UNION ALL
SELECT event_date, user_id, event_type,
       CAST(n * 2 AS BIGINT), 'update_postimage', CAST(2 AS BIGINT)
FROM touched WHERE event_type <> 'view'
UNION ALL
SELECT event_date, user_id + 100000, 'backfill',
       CAST(1 AS BIGINT), 'insert', CAST(2 AS BIGINT)
FROM touched WHERE event_type = 'click'
ORDER BY event_date, user_id, event_type, _change_type
"""


@query("store_change_feed", _CDF_ORACLE)
def store_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed proof (VERDICT r9 #3): ``read_changes(v1, v2)``
    over the same partition-scoped merge must contain EXACTLY the
    update pre/post pairs for the doubled non-'view' rows and the
    backfill inserts — and nothing for the re-sent identical 'view'
    rows (rewritten into new files, suppressed by the row-hash
    compare). The oracle recomputes the expected feed from the events
    table alone. Planning note: the manifest file-diff means only the
    2 touched partitions are read — the CDF of a daily merge into a
    100 TB store costs O(changed data)."""
    store, v1, v2 = _build_store(spark, sf_dir, "merged")
    return store.read_changes(spark, v1, v2).orderBy(
        "event_date", "user_id", "event_type", "_change_type"
    )


_SKIPPING_ORACLE = """
WITH base AS (
  SELECT CAST(ts AS DATE) AS event_date, user_id, event_type,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(n) AS BIGINT) AS total_events,
       TRUE AS pruned_exact
FROM base
WHERE event_date BETWEEN DATE '2024-01-08' AND DATE '2024-01-12'
GROUP BY event_type
ORDER BY event_type
"""


@query("store_skipping_scan", _SKIPPING_ORACLE)
def store_skipping_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping + compaction proof (r10): commit the 30-date
    snapshot (many small files per date — one per write task), OPTIMIZE
    it with ``compact(cluster_by=["user_id"])``, then ``read_where`` a
    5-date range. The in-query guards pin the table-format invariants
    the SQL oracle can't see, and raise (→ driver red) if violated:

    - compaction is invisible to readers: the CDF across the compact
      commit has ZERO rows (every row rewritten byte-identical);
    - ``files_for`` under the date-range predicate returns EXACTLY the
      union of the in-range partitions' files — footer min/max stats
      prune every out-of-range file and keep every in-range one, so
      the scan opens O(matching files), the property a point lookup
      rides at 100 TB.

    The returned aggregate is computed from ``read_where``'s pruned
    plan, so value parity with the oracle proves pruning lost no rows
    (skipping is conservative, never lossy)."""
    import datetime as _dt

    def mutate(store):
        base = store.read(spark, 1)
        v2 = store.merge(
            spark, _merge_batch(base), _KEYS, optimize_write=True
        )
        # OPTIMIZE with a forced small bin target so each date splits
        # into several files laid along a Morton curve over
        # (user_id, n_events)
        m2 = store.manifest(v2)
        part_bytes = [
            sum(m2["stats"][f]["bytes"] for f in fl if f in m2["stats"])
            for fl in m2.get("partitions", {}).values()
        ]
        v3 = store.compact(
            spark,
            target_file_bytes=max(1, max(part_bytes, default=1) // 4),
            cluster_by=["user_id", "n_events"],
            layout="zorder",
        )
        # invisible-compaction proof: runs ONCE at store build (the
        # first call in the process — still a driver-red guard); the
        # cached repeat calls time the pruned READ, not this re-proof
        if v3 != v2 and store.read_changes(spark, v2, v3).count() != 0:
            raise RuntimeError("compact changed reader-visible data")

    store = _mutated_store(spark, sf_dir, "skipscan", mutate)
    lo, hi = _dt.date(2024, 1, 8), _dt.date(2024, 1, 12)
    preds = [("event_date", "between", (lo, hi))]
    opened = sorted(store.files_for(preds))
    m = store.manifest(store.latest_version())
    expected = sorted(
        f
        for d, fl in m.get("partitions", {}).items()
        if "2024-01-08" <= d <= "2024-01-12"
        for f in fl
    )
    if opened != expected:
        raise RuntimeError(
            f"stats pruning opened {len(opened)} files, "
            f"expected exactly the {len(expected)} in-range ones"
        )
    # z-order check: a single-user point lookup opens a MINORITY of
    # files even though user_id is neither the partition column nor a
    # leading sort key. Enforced only when the store actually split
    # (data-sized inputs; a LIMIT-0 audit table skips the ratio check).
    nf = len(m["files"])
    u_opened = len(store.files_for([("user_id", "==", 7)]))
    if nf >= 60 and u_opened * 2 >= nf:
        raise RuntimeError(
            f"z-order pruning opened {u_opened}/{nf} files for a "
            "single-user lookup — expected a minority"
        )
    return (
        store.read_where(spark, preds)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_events").cast("long").alias("total_events"),
        )
        .withColumn("pruned_exact", F.lit(True))
        .orderBy("event_type")
    )


_EVOLUTION_ORACLE = f"""
WITH base AS (
  SELECT CAST(ts AS DATE) AS event_date, user_id, event_type,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3
),
merged AS (
  SELECT event_date, user_id, event_type,
         CASE WHEN event_date IN (DATE '{_TOUCHED[0]}', DATE '{_TOUCHED[1]}')
                   AND event_type <> 'view'
              THEN n * 2 ELSE n END AS n,
         CASE WHEN event_date IN (DATE '{_TOUCHED[0]}', DATE '{_TOUCHED[1]}')
              THEN 'r10' END AS batch_tag
  FROM base
  UNION ALL
  SELECT event_date, user_id + 100000, 'backfill', 1, 'r10'
  FROM base
  WHERE event_date IN (DATE '{_TOUCHED[0]}', DATE '{_TOUCHED[1]}')
    AND event_type = 'click'
)
SELECT event_date,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(n) AS BIGINT) AS total_events,
       COALESCE(MAX(batch_tag), 'pre-evolution') AS tag
FROM merged
GROUP BY event_date
ORDER BY event_date
"""


@query("store_schema_evolution", _EVOLUTION_ORACLE)
def store_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive schema evolution proof (r10): the merge batch carries a
    NEW column ``batch_tag``; ``schema_mode="merge"`` appends it as
    nullable, so post-merge the table schema is the union, rows the
    batch upserted carry the tag, and every pre-evolution row —
    including the 28 untouched partitions carried BY REFERENCE, whose
    physical files still have the old schema — reads back as a typed
    null. The oracle recomputes the same union from the events table,
    so value parity proves schema-on-read filled the nulls exactly
    (and the carried old-schema files stayed readable)."""
    def mutate(store):
        batch = _merge_batch(store.read(spark, 1)).withColumn(
            "batch_tag", F.lit("r10")
        )
        store.merge(
            spark, batch, _KEYS, schema_mode="merge", optimize_write=True
        )

    store = _mutated_store(spark, sf_dir, "evolve", mutate)
    out = store.read(spark)
    if out.columns != ["event_date", "user_id", "event_type", "n_events", "batch_tag"]:
        raise RuntimeError(f"evolved schema wrong: {out.columns}")
    return (
        out.groupBy("event_date")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_events").cast("long").alias("total_events"),
            F.coalesce(F.max("batch_tag"), F.lit("pre-evolution")).alias(
                "tag"
            ),
        )
        .orderBy("event_date")
    )


_DV_ORACLE = """
WITH base AS (
  SELECT CAST(ts AS DATE) AS event_date, user_id, event_type,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(n) AS BIGINT) AS total_events,
       TRUE AS zero_rewrite
FROM base
WHERE user_id <> 7
GROUP BY event_type
ORDER BY event_type
"""


@query("store_delete_vectors", _DV_ORACLE)
def store_delete_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-vector proof (r10): erase ONE user from the 30-date
    store — the GDPR case — via ``delete_where``, which masks row
    positions in sidecar deletion vectors instead of rewriting files.
    In-query guards raise (→ driver red) unless the table-format
    invariants hold:

    - the delete commit lists the IDENTICAL data files as its parent
      (merge-on-read: zero rewrites, O(deleted rows) cost);
    - the change feed across the delete contains exactly one
      ``delete`` row per erased base row and nothing else.

    The returned aggregate reads the post-delete snapshot through the
    DV-masking plan, so oracle parity proves the masked rows — and
    ONLY those — vanished from every downstream computation."""
    def mutate(store):
        # cow_threshold=None pins the pure-DV path this query proves;
        # the copy-on-write fallback has its own query below
        v2 = store.delete_where(
            spark, [("user_id", "==", 7)], cow_threshold=None
        )
        # CDF proof runs ONCE at store build (first call per process,
        # still driver-red on violation): one histogram pass over the
        # feed + one count over the v1 snapshot
        if v2 == 1:
            return
        hist = {
            r["_change_type"]: r["n"]
            for r in store.read_changes(spark, 1, v2)
            .groupBy("_change_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        n_del = hist.get("delete", 0)
        if set(hist) - {"delete"}:
            raise RuntimeError("delete CDF carries non-delete rows")
        expected = store.read(spark, 1).filter(F.col("user_id") == 7).count()
        if n_del != expected:
            raise RuntimeError(
                f"CDF shows {n_del} deletes, expected {expected}"
            )

    store = _mutated_store(spark, sf_dir, "dv", mutate)
    v1, v2 = 1, store.latest_version()
    if v2 != v1:
        m1, m2 = store.manifest(v1), store.manifest(v2)
        if m2["files"] != m1["files"]:
            raise RuntimeError("delete_where rewrote data files")
    return (
        store.read(spark)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_events").cast("long").alias("total_events"),
        )
        .withColumn("zero_rewrite", F.lit(True))
        .orderBy("event_type")
    )


_UPDATE_ORACLE = """
WITH base AS (
  SELECT CAST(ts AS DATE) AS event_date, user_id, event_type,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN user_id = 7 THEN n * 10 ELSE n END) AS BIGINT)
         AS total_events,
       TRUE AS zero_rewrite
FROM base
GROUP BY event_type
ORDER BY event_type
"""


@query("store_update_where", _UPDATE_ORACLE)
def store_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read UPDATE proof (r10): multiply one user's counts by
    10 via ``update_where`` — one commit that deletion-vector-masks the
    old rows and appends the updated ones, never rewriting a matching
    file. Guards raise (→ driver red) unless:

    - every parent data file is still listed in the update commit
      (zero rewrites — O(updated rows) cost);
    - the change feed across the update is EXACTLY one
      update_preimage + one update_postimage per touched base row.

    Value parity of the post-update aggregate against the oracle's
    CASE expression proves the masked-old/appended-new composition
    reads back as a plain updated table."""
    def mutate(store):
        v2 = store.update_where(
            spark,
            [("user_id", "==", 7)],
            {"n_events": F.col("n_events") * 10},
            cow_threshold=None,  # pin the DV+append path this query proves
        )
        if v2 == 1:
            return
        # CDF proof runs ONCE at store build (driver-red on violation)
        hist = {
            r["_change_type"]: r["n"]
            for r in store.read_changes(spark, 1, v2)
            .groupBy("_change_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        pre = hist.get("update_preimage", 0)
        post = hist.get("update_postimage", 0)
        touched = (
            store.read(spark, version=1).filter(F.col("user_id") == 7).count()
        )
        if not (pre == post == touched) or set(hist) - {
            "update_preimage",
            "update_postimage",
        }:
            raise RuntimeError(
                f"update CDF wrong: pre={pre} post={post} touched={touched}"
            )

    store = _mutated_store(spark, sf_dir, "upd", mutate)
    v1, v2 = 1, store.latest_version()
    if v2 != v1:
        m1, m2 = store.manifest(v1), store.manifest(v2)
        if not set(m1["files"]) <= set(m2["files"]):
            raise RuntimeError("update_where rewrote parent data files")
    return (
        store.read(spark)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_events").cast("long").alias("total_events"),
        )
        .withColumn("zero_rewrite", F.lit(True))
        .orderBy("event_type")
    )


_COW_DELETE_ORACLE = """
WITH base AS (
  SELECT CAST(ts AS DATE) AS event_date, user_id, event_type,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3
)
SELECT event_date,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(n) AS BIGINT) AS total_events,
       TRUE AS rewritten
FROM base
WHERE event_type <> 'view'
GROUP BY event_date
ORDER BY event_date
"""


@query("store_cow_broad_delete", _COW_DELETE_ORACLE)
def store_cow_broad_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write broad-DML proof (r11 — VERDICT r10 #2): delete a
    FIFTH of the table (every 'view' row) with ``cow_threshold=0.0``,
    forcing the rewrite path — the degenerate-DV case a GDPR-style
    sparse delete never hits but a broad retention sweep does. Guards
    raise (→ driver red) unless the table-format invariants hold:

    - the commit grew NO deletion vectors (every touched file was
      rewritten without its matching rows instead — files left the
      manifest and survivor files replaced them);
    - the change feed across the delete is exactly one ``delete`` row
      per erased base row and nothing else (rewritten survivors are
      suppressed by the row-hash compare).

    Value parity of the post-delete per-date aggregate against the
    oracle proves the rewrite lost nothing it shouldn't and kept
    nothing it should have dropped. The deletion-vector twin of this
    query is ``store_delete_vectors``; together they pin both sides of
    the per-file DV-vs-rewrite decision (unit tests cover the mixed
    case)."""

    def mutate(store):
        v2 = store.delete_where(
            spark, [("event_type", "==", "view")], cow_threshold=0.0
        )
        if v2 == 1:
            return
        # CDF proof runs ONCE at store build (driver-red on violation)
        hist = {
            r["_change_type"]: r["n"]
            for r in store.read_changes(spark, 1, v2)
            .groupBy("_change_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        n_del = hist.get("delete", 0)
        if set(hist) - {"delete"}:
            raise RuntimeError("delete CDF carries non-delete rows")
        expected = (
            store.read(spark, 1)
            .filter(F.col("event_type") == "view")
            .count()
        )
        if n_del != expected:
            raise RuntimeError(
                f"CDF shows {n_del} deletes, expected {expected}"
            )

    store = _mutated_store(spark, sf_dir, "cowdel", mutate)
    v1, v2 = 1, store.latest_version()
    if v2 != v1:
        m1, m2 = store.manifest(v1), store.manifest(v2)
        if m2.get("dv"):
            raise RuntimeError("broad delete grew DVs instead of rewriting")
        if not set(m1["files"]) - set(m2["files"]):
            raise RuntimeError("broad delete rewrote no files")
    return (
        store.read(spark)
        .groupBy("event_date")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_events").cast("long").alias("total_events"),
        )
        .withColumn("rewritten", F.lit(True))
        .orderBy("event_date")
    )


_CONCURRENT_ORACLE = f"""
WITH base AS (
  SELECT CAST(ts AS DATE) AS event_date, user_id, event_type,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3
)
SELECT event_date,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN event_date IN (DATE '{_TOUCHED[0]}',
                                         DATE '{_TOUCHED[1]}')
                          AND event_type <> 'view'
                     THEN n * 2 ELSE n END) AS BIGINT) AS total_events,
       TRUE AS rebased
FROM base
GROUP BY event_date
ORDER BY event_date
"""


@query("store_concurrent_merge", _CONCURRENT_ORACLE)
def store_concurrent_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commuting-writer proof (r11 — VERDICT r10 #5): two writers race
    one store with MERGEs touching DISJOINT single-date partitions
    (each doubles its date's non-'view' counts); writer B is injected
    between writer A's data stage and manifest publish, so A always
    loses the version race. A must detect commutation and REBASE —
    guards raise (→ driver red) unless:

    - both commits landed (versions 2 and 3) with NO conflict error
      and NO recompute (A's staging ran exactly once);
    - A's published manifest carries B's partition files BY REFERENCE
      (identical paths) and every untouched partition still lists the
      v1 files.

    Value parity of the final per-date aggregate against the oracle —
    which applies BOTH writers' updates — proves the rebase lost
    neither writer's changes."""
    from calorista_spark.sources.commitlog import CommitLogStore

    def one_date_batch(base: DataFrame, day: str) -> DataFrame:
        return (
            base.filter(F.col("event_date") == F.lit(day).cast("date"))
            .filter(F.col("event_type") != "view")
            .withColumn("n_events", F.col("n_events") * 2)
        )

    def mutate(store):
        store_b = CommitLogStore(store.path)
        base = store.read(spark, 1)
        batch_a = one_date_batch(base, _TOUCHED[0])
        batch_b = one_date_batch(base, _TOUCHED[1])
        stage_calls = {"n": 0}
        orig_stage = store._stage_snapshot_data

        def counting_stage(*a, **k):
            stage_calls["n"] += 1
            return orig_stage(*a, **k)

        store._stage_snapshot_data = counting_stage
        orig_publish = store._publish
        armed = {"left": 1}

        def racy_publish(manifest, token):
            if armed["left"] > 0:
                armed["left"] -= 1
                store_b.merge(spark, batch_b, _KEYS, optimize_write=True)
            return orig_publish(manifest, token)

        store._publish = racy_publish
        v_a = store.merge(spark, batch_a, _KEYS, optimize_write=True)
        if v_a != 3:
            raise RuntimeError(f"expected the rebase to publish v3, got {v_a}")
        if stage_calls["n"] != 1:
            raise RuntimeError(
                f"disjoint-partition race recomputed ({stage_calls['n']} "
                "stagings) instead of rebasing"
            )
        m1, m2, m3 = store.manifest(1), store.manifest(2), store.manifest(3)
        # .get(): a stress dataset may not contain the touched dates
        if m3["partitions"].get(_TOUCHED[1]) != m2["partitions"].get(
            _TOUCHED[1]
        ):
            raise RuntimeError("rebase dropped the winner's partition files")
        for d, fl in m1["partitions"].items():
            if d not in _TOUCHED and m3["partitions"].get(d) != fl:
                raise RuntimeError(f"rebase disturbed untouched partition {d}")

    store = _mutated_store(spark, sf_dir, "racemerge", mutate)
    return (
        store.read(spark)
        .groupBy("event_date")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_events").cast("long").alias("total_events"),
        )
        .withColumn("rebased", F.lit(True))
        .orderBy("event_date")
    )


_DV_HEAVY_ORACLE = """
WITH base AS (
  SELECT CAST(ts AS DATE) AS event_date, user_id, event_type,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(n) AS BIGINT) AS total_events
FROM base
WHERE user_id > 4
GROUP BY event_type
ORDER BY event_type
"""


@query("store_dv_heavy_read", _DV_HEAVY_ORACLE)
def store_dv_heavy_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DV-HEAVY read-path benchmark (r12 — VERDICT r11 #7): users 0-4
    have activity on essentially every date, so one pure-DV delete
    (``cow_threshold=None``) plants a deletion vector on ~every data
    file of the 30-date store. The timed body is then a SNAPSHOT READ
    through the r12 executor-side DV plan (``_read_files`` /
    ``_dv_frame``, sources/commitlog.py): the driver ships only
    (file, sidecar) path pairs, each task decodes its sidecars, and
    the anti-join is broadcast-hinted only while total sidecar bytes
    stay small — the plan whose regression surface this query pins
    round over round.

    Build-time guards (first call per process, driver-red on
    violation): the delete rewrote NOTHING (pure merge-on-read) and
    DVs cover at least half the files — the shape that made the old
    driver-side decode a 100 TB scale-killer."""

    def mutate(store):
        v2 = store.delete_where(
            spark, [("user_id", "between", (0, 4))], cow_threshold=None
        )
        if v2 == 1:
            return  # stress dataset without users 0-4: nothing masked
        m1, m2 = store.manifest(1), store.manifest(v2)
        if m2["files"] != m1["files"]:
            raise RuntimeError("dv-heavy fixture rewrote data files")
        dv = m2.get("dv", {})
        if 2 * len(dv) < len(m2["files"]):
            raise RuntimeError(
                f"DV coverage too sparse: {len(dv)}/{len(m2['files'])} files"
            )

    store = _mutated_store(spark, sf_dir, "dvheavy", mutate)
    # pin the DISTRIBUTED DV plan regardless of sidecar size: at test
    # SF the sidecars fit the broadcast cap, which would route the
    # read through the driver-decode fast path and stop pinning the
    # executor-side plan this query exists to benchmark
    store.dv_broadcast_bytes = 0
    return (
        store.read(spark)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_events").cast("long").alias("total_events"),
        )
        .orderBy("event_type")
    )


_SPARK_READ_DV_GUARDED: set[str] = set()


_SPARK_READ_DV_ORACLE = """
WITH base AS (
  SELECT CAST(ts AS DATE) AS event_date, user_id, event_type,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(n) AS BIGINT) AS total_events
FROM base
WHERE user_id > 4 AND event_date >= DATE '2024-01-20'
GROUP BY event_type
ORDER BY event_type
"""


@query("store_spark_read_dv", _SPARK_READ_DV_ORACLE)
def store_spark_read_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch-DataSource read face, oracle-checked on a DV-BEARING
    store with a PUSHED filter (r13 — VERDICT r12 #1's 'done' bar:
    until now only the library face had an oracle query; the
    ``spark.read.format("commitlog")`` face went through rows-only
    pytest checks).

    Shares the dv-heavy fixture of ``store_dv_heavy_read`` (users 0-4
    deleted purely merge-on-read, so ~every file carries a deletion
    vector). The read goes through the Python DataSource: Catalyst
    hands the ``event_date >=`` filter to ``pushFilters`` → manifest
    segment skipping plans O(matching dates) input partitions; each
    task applies its files' DV masks as one vectorized numpy/Arrow
    boolean filter (sources/commitlog_batch.py). An in-query guard
    pins the pruning: with a 1-byte partition budget (one partition
    per file/row-group) the filtered plan must enumerate strictly
    fewer partitions than the store holds files."""
    from calorista_spark.sources.commitlog_batch import load_snapshot_df

    def mutate(store):
        v2 = store.delete_where(
            spark, [("user_id", "between", (0, 4))], cow_threshold=None
        )
        if v2 == 1:
            return  # stress dataset without users 0-4: nothing masked
        m1, m2 = store.manifest(1), store.manifest(v2)
        if m2["files"] != m1["files"]:
            raise RuntimeError("dv-heavy fixture rewrote data files")
        dv = m2.get("dv", {})
        if 2 * len(dv) < len(m2["files"]):
            raise RuntimeError(
                f"DV coverage too sparse: {len(dv)}/{len(m2['files'])} files"
            )

    store = _mutated_store(spark, sf_dir, "dvheavy", mutate)
    cutoff = "2024-01-20"
    # r15: memoized DataSource load (plan metadata only — the read
    # still goes through the Python DataSource's pushFilters +
    # DV-masking partitions)
    df = load_snapshot_df(spark, store.path).filter(
        F.col("event_date") >= F.lit(cutoff).cast("date")
    )
    n_files = len(store.manifest(store.latest_version())["files"])
    # prune guard once per (process, store): it plans a second scan
    # purely to count partitions — a fixture-style assertion, not part
    # of the measured read path
    if n_files >= 10 and store.path not in _SPARK_READ_DV_GUARDED:
        pruned = (
            load_snapshot_df(spark, store.path, max_bytes=1)
            .filter(F.col("event_date") >= F.lit(cutoff).cast("date"))
            .rdd.getNumPartitions()
        )
        if pruned >= n_files:
            raise RuntimeError(
                f"pushdown did not prune: {pruned} partitions for "
                f"{n_files} files"
            )
        _SPARK_READ_DV_GUARDED.add(store.path)
    return (
        df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_events").cast("long").alias("total_events"),
        )
        .orderBy("event_type")
    )


_SPARK_WRITE_ORACLE = f"""
WITH base AS (
  SELECT CAST(ts AS DATE) AS event_date, user_id, event_type,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3
),
appended AS (
  SELECT event_date, user_id, event_type, n FROM base
  UNION ALL
  SELECT event_date, user_id + 100000, 'backfill', 1
  FROM base
  WHERE event_date IN (DATE '{_TOUCHED[0]}', DATE '{_TOUCHED[1]}')
    AND event_type = 'click'
)
SELECT event_date,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(n) AS BIGINT) AS total_events
FROM appended
WHERE event_date IN (DATE '{_TOUCHED[0]}', DATE '{_TOUCHED[1]}')
GROUP BY event_date
ORDER BY event_date
"""

_SPARK_WRITE_CACHE: dict[tuple, str] = {}


@query("store_spark_write_roundtrip", _SPARK_WRITE_ORACLE)
def store_spark_write_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Write-then-read THROUGH THE SPARK FACES ONLY (r13 — VERDICT
    r12 #2): ``df.write.format("commitlog")`` lands the partitioned
    base snapshot (mode("overwrite") + option("partitionBy")), a
    second Spark-face write appends the backfill batch, and the
    result is read back with ``spark.read.format("commitlog")`` under
    a pushed date filter — the library is never called on the data
    path. Build-time guards pin the append semantics: v2 must carry
    every untouched date partition of v1 BY REFERENCE (identical file
    lists) while the touched dates gain files."""
    from calorista_spark.sources.commitlog import CommitLogStore
    from calorista_spark.sources.commitlog_batch import (
        register_batch_source,
    )

    register_batch_source(spark)
    fp = _events_fingerprint(sf_dir)
    key = (sf_dir, fp)
    path = _SPARK_WRITE_CACHE.get(key)
    if path is None or not os.path.isfile(
        os.path.join(path, "_commits", "v00000002.json")
    ):
        path = os.path.join(
            tempfile.gettempdir(),
            f"calorista_sparkwrite_{fp}_{os.getpid()}",
        )
        shutil.rmtree(path, ignore_errors=True)
        base = _day_counts(spark, sf_dir)
        (
            base.write.format("commitlog")
            .option("path", path)
            .option("partitionBy", "event_date")
            .option("keys", ",".join(_KEYS))
            .mode("overwrite")
            .save()
        )
        backfill = (
            base.filter(
                F.col("event_date").isin(
                    [F.lit(d).cast("date") for d in _TOUCHED]
                )
            )
            .filter(F.col("event_type") == "click")
            .select(
                "event_date",
                (F.col("user_id") + 100000).alias("user_id"),
                F.lit("backfill").alias("event_type"),
                F.lit(1).cast("long").alias("n_events"),
            )
        )
        (
            backfill.write.format("commitlog")
            .option("path", path)
            .mode("append")
            .save()
        )
        store = CommitLogStore(path)
        if store.latest_version() != 2:
            raise RuntimeError(
                f"expected Spark-face writes at v1+v2, got "
                f"{store.latest_version()}"
            )
        m1, m2 = store.manifest(1), store.manifest(2)
        for d, fl in m1["partitions"].items():
            if d in _TOUCHED:
                if not set(fl) < set(m2["partitions"].get(d, [])):
                    raise RuntimeError(
                        f"append did not extend touched partition {d}"
                    )
            elif m2["partitions"].get(d) != fl:
                raise RuntimeError(
                    f"append disturbed untouched partition {d}"
                )
        _SPARK_WRITE_CACHE[key] = path
    from calorista_spark.sources.commitlog_batch import load_snapshot_df

    return (
        load_snapshot_df(spark, path)
        .filter(
            F.col("event_date").isin(
                [F.lit(d).cast("date") for d in _TOUCHED]
            )
        )
        .groupBy("event_date")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_events").cast("long").alias("total_events"),
        )
        .orderBy("event_date")
    )


_COLUMN_MAPPING_ORACLE = f"""
WITH base AS (
  SELECT CAST(ts AS DATE) AS event_date, user_id, event_type,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3
),
merged AS (
  SELECT event_date, user_id, event_type,
         CASE WHEN event_date IN (DATE '{_TOUCHED[0]}', DATE '{_TOUCHED[1]}')
                   AND event_type <> 'view'
              THEN n * 2 ELSE n END AS event_count
  FROM base
),
agg AS (
  SELECT event_date,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(event_count) AS BIGINT) AS total_events
  FROM merged GROUP BY event_date
),
posts AS (
  SELECT event_date, CAST(COUNT(*) AS BIGINT) AS n_cdf_posts
  FROM base
  WHERE event_date IN (DATE '{_TOUCHED[0]}', DATE '{_TOUCHED[1]}')
    AND event_type <> 'view'
  GROUP BY event_date
)
SELECT a.event_date, a.n_rows, a.total_events,
       COALESCE(p.n_cdf_posts, 0) AS n_cdf_posts
FROM agg a LEFT JOIN posts p ON p.event_date = a.event_date
ORDER BY a.event_date
"""


@query("store_column_mapping", _COLUMN_MAPPING_ORACLE)
def store_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-additive schema evolution through the correctness gate
    (r13 — VERDICT r12 #6): rename ``n_events`` → ``event_count`` as a
    METADATA-ONLY commit (guard: not one data file changes), merge a
    post-rename batch through the renamed logical schema (touched
    dates' non-'view' counts double; 'view' rows re-sent identical
    must suppress), then aggregate the head snapshot AND count each
    date's ``update_postimage`` rows from a change feed that CROSSES
    the rename — the oracle recomputes both, so the driver hash pins
    rename semantics, merge-through-mapping, row-hash suppression
    across the rename, and the CDF's end-schema presentation."""

    def mutate(store):
        m1 = store.manifest(1)
        v2 = store.rename_column("n_events", "event_count")
        m2 = store.manifest(v2)
        if m2["files"] != m1["files"]:
            raise RuntimeError("rename rewrote data files")
        if m2.get("column_mapping") != {"event_count": "n_events"}:
            raise RuntimeError(
                f"bad mapping: {m2.get('column_mapping')}"
            )
        base = store.read(spark, 1).withColumnRenamed(
            "n_events", "event_count"
        )
        touched = base.filter(
            F.col("event_date").isin(
                [F.lit(d).cast("date") for d in _TOUCHED]
            )
        )
        batch = touched.withColumn(
            "event_count",
            F.when(
                F.col("event_type") != F.lit("view"),
                F.col("event_count") * 2,
            ).otherwise(F.col("event_count")),
        )
        v3 = store.merge(spark, batch, _KEYS, optimize_write=True)
        if v3 != 3:
            raise RuntimeError(f"unexpected merge version {v3}")

    store = _mutated_store(spark, sf_dir, "colmap", mutate)
    agg = (
        store.read(spark)
        .groupBy("event_date")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("event_count").cast("long").alias("total_events"),
        )
    )
    posts = (
        store.read_changes(spark, 1)
        .filter(F.col("_change_type") == "update_postimage")
        .groupBy("event_date")
        .agg(F.count(F.lit(1)).alias("n_cdf_posts"))
    )
    return (
        agg.join(posts, "event_date", "left")
        .select(
            "event_date",
            "n_rows",
            "total_events",
            F.coalesce(F.col("n_cdf_posts"), F.lit(0))
            .cast("long")
            .alias("n_cdf_posts"),
        )
        .orderBy("event_date")
    )


_BLOOM_LOOKUP_ORACLE = """
WITH uc AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT user_id, event_type, CAST(n AS BIGINT) AS n_events
FROM uc
WHERE user_id IN (7, 8, 42)
ORDER BY user_id, event_type
"""

_BLOOM_CACHE: dict[tuple, str] = {}


@query("store_bloom_point_lookup", _BLOOM_LOOKUP_ORACLE)
def store_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-sidecar file skipping (r14 — sources/bloom.py) inside the
    correctness gate: the per-user rollup is committed as TWO files
    with fully overlapping ``user_id`` ranges but disjoint parity
    sets, so min/max stats can never separate them — any skipping is
    the bloom's. The point lookup (mixed-parity IN list) must both
    match the plain-SQL oracle bit-for-bit (no false negatives — the
    invariant) AND demonstrably skip at least one file on a
    single-parity probe (guarded via ``last_prune_profile``)."""
    from calorista_spark.sources.commitlog import CommitLogStore

    fp = _events_fingerprint(sf_dir)
    key = (sf_dir, fp)
    path = _BLOOM_CACHE.get(key)
    if path is None or not os.path.isfile(
        os.path.join(path, "_commits", "v00000002.json")
    ):
        path = os.path.join(
            tempfile.gettempdir(),
            f"calorista_bloomlkp_{fp}_{os.getpid()}",
        )
        shutil.rmtree(path, ignore_errors=True)
        store = CommitLogStore(path)
        uc = (
            read_table(spark, sf_dir, "events")
            .groupBy("user_id", "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        store.commit(
            uc.filter("user_id % 2 = 0").coalesce(1),
            expect_version=None,
            keys=["user_id", "event_type"],
        )
        store.commit(
            uc.filter("user_id % 2 = 1").coalesce(1), op="append"
        )
        store.build_bloom(spark, ["user_id", "event_type"])
        _BLOOM_CACHE[key] = path
    store = CommitLogStore(path)
    # guard: a single-parity probe must actually skip the other
    # parity's file (min/max provably cannot — ranges fully overlap).
    # Probe user 8: even parity and present at every SF (sf0.001 only
    # has users 0-14; a probe outside the segment's min/max range is
    # pruned before blooms ever load — segments_loaded == 0 — and
    # proves nothing about the bloom, so only enforce when the
    # segment was actually consulted).
    store.files_for([("user_id", "==", 8)])
    prof = store.last_prune_profile
    if (
        prof is not None
        and prof.get("segments_loaded", 0) > 0
        and prof.get("files_bloom_skipped", 0) < 1
    ):
        raise RuntimeError(f"bloom skipped nothing: {prof}")
    return (
        store.read_where(spark, [("user_id", "in", [7, 8, 42])])
        .groupBy("user_id", "event_type")
        .agg(F.sum("n_events").cast("long").alias("n_events"))
        .orderBy("user_id", "event_type")
    )
