"""Minimal commit-log table format: atomic MERGE + time travel on
plain parquet (r9 — VERDICT r8 #2, closing SURVEY §1.4's "replace the
reference's non-atomic read-modify-write" in-sandbox).

The reference's store (main.py:137-161) — and this engine's own
``merge_into_store`` parquet fallback — both have a torn-write window:
the path being read is the path being overwritten, so a crash
mid-write can leave a reader with half a table. The fix is the one
every table format (Delta, Iceberg, Hudi) converges on:

- **Data files are immutable.** Every commit writes its parquet to a
  fresh ``data/<token>/`` directory; nothing a reader could be
  scanning is ever modified or deleted by a writer.
- **The manifest is the table.** ``_commits/v{N}.json`` lists the
  exact files of snapshot N (plus the schema, so empty snapshots
  round-trip). Readers resolve the newest manifest — or any older
  one: ``read(version=N)`` is time travel for free.
- **Publication is one atomic filesystem op.** The manifest is
  written to a temp name, fsync'd, then ``os.link``'d to its final
  version name. link(2) fails with EEXIST if the version was already
  taken — that IS the optimistic-concurrency check: two writers
  racing to commit version N+1 cannot both win, and the loser raises
  :class:`CommitConflictError` instead of silently clobbering
  (os.rename would overwrite). A crash BETWEEN data write and
  manifest link leaves an orphan data dir and a perfectly readable
  previous snapshot; :meth:`vacuum` garbage-collects orphans.
- **Exactly-once streaming MERGE by ledger, not by luck.** Each
  commit may record the foreachBatch ``batch_id``; the manifest
  carries the high-water ``last_batch_id``, so a replayed micro-batch
  (checkpoint recovery) is detected and SKIPPED — replay safety no
  longer depends on the merge happening to be idempotent.

- **Partition-scoped MERGE (r10).** A store committed with
  ``partition_by`` keeps a per-partition file map in every manifest;
  MERGE then rewrites ONLY the partitions the incoming batch touches
  and carries every untouched partition's files into the new manifest
  BY REFERENCE — zero read, zero write, byte-identical across
  versions. This is the same file-level pruning Delta/Iceberg do and
  the granularity the reference itself uses (main.py:137-161 merges
  per date key): a daily merge into a 100 TB store costs O(touched
  partitions), not O(table).
- **Change-data-feed (r10).** :meth:`read_changes` derives the typed
  row-level change feed between two versions from manifest file
  diffs: changed rows can only live in files NOT shared between the
  manifests, so partition-scoped commits make CDF planning exact and
  cheap (it reads the touched partitions only). A streaming face
  (:class:`CommitLogChangesDataSource`) replays the feed as a
  Structured Streaming source with version-based exactly-once offsets.
- **Deletion vectors (r10).** :meth:`delete_where` is merge-on-read
  row deletion: instead of rewriting every file that holds a matching
  row, the commit records each touched file's deleted ROW POSITIONS
  in a sidecar bitmap and the manifest maps file → DV; every read
  path (snapshot, pruned, merge target, CDF, compaction input)
  anti-filters those positions via ``_metadata.row_index``. A sparse
  delete — the GDPR erasure case — costs O(deleted rows), not
  O(touched files), exactly Delta's DV / Iceberg v2 position-delete
  design; :meth:`compact` purges DVs back into clean files.
  :meth:`update_where` composes the same mask with an append of the
  updated rows, completing the merge-on-read DML trio (INSERT /
  DELETE / UPDATE, plus keyed MERGE).
- **Data skipping, OPTIMIZE, Z-order, schema evolution, time travel
  (r10).** Footer-lifted per-file stats drive :meth:`files_for` /
  :meth:`read_where` manifest-level pruning; :meth:`compact`
  bin-packs small files with linear or Z-order (``layout="zorder"``)
  clustering so the stats become tight in every clustered dimension;
  ``schema_mode="merge"`` evolves the schema additively;
  ``read(as_of=ts)`` / :meth:`history` give TIMESTAMP AS OF and the
  audit trail.

- **Executor-side DV build + copy-on-write DML (r11).** DELETE/UPDATE
  deletion vectors are built and written by the EXECUTORS — the scan's
  matching (file, position) pairs group by file and each task writes
  its file's merged bitmap sidecar; the driver receives one summary
  row per touched file, never the positions (VERDICT r10 #1: the
  driver-side collect was the one remaining 100 TB scale-killer).
  When a file's merged mask would exceed ``cow_threshold`` of its
  rows, the commit rewrites that file copy-on-write instead of growing
  a huge DV — per-file decision, exactly Delta's DV-vs-rewrite
  tradeoff (VERDICT r10 #2). Path identity everywhere uses an exact
  percent-decode of ``_metadata.file_path`` (URI) so partition values
  with spaces/unicode cannot silently break DV joins, and footer-stat
  pruning of naive timestamp predicates mirrors ``F.lit``'s
  driver-local-timezone conversion (both ADVICE r10 fixes).
- **Commuting-writer rebase (r11).** MERGE that loses the version
  race no longer just raises: when the interleaved commits touched
  DISJOINT partitions (files + DVs of every partition this merge read
  are identical in both heads) the already-staged data REBASES onto
  the new head — a new manifest, zero recompute, zero data IO;
  overlapping writers recompute from the new snapshot. Bounded by
  ``max_retries``, same logical-conflict model as Delta's commit
  protocol.

- **Segmented manifests (r12 — VERDICT r11 #4).** The per-file bulk
  of a commit (file list, footer stats, DV map) lives in
  CONTENT-ADDRESSED per-partition segment files; the commit JSON keeps
  scalars plus per-partition segment refs and a merged stat ENVELOPE
  (Iceberg's manifest-list shape). Untouched partitions dedupe to the
  parent's segment byte-for-byte, so commits write O(touched
  partitions) of manifest; pruned reads test envelopes first and parse
  only matching segments; MERGE scoping, DML composition, CDF diffs
  and DV purge all load O(affected partitions). Measured at 10^5
  fabricated file entries: a point read parses 1/2000 segments ~300×
  faster than full hydration, an incremental commit writes ~10^-5 of
  the manifest bytes (scale_smoke.py ``manifest_scale``). Format-1
  (inline) manifests stay fully readable; the next commit migrates.

Scale notes: the manifest lists files, so a snapshot read plans from
the manifest (no directory listing); history depth costs one tiny
JSON per commit — and with segmented manifests the commit JSON stays
small regardless of table size. Unpartitioned MERGE still rewrites
the full snapshot (the sanctioned fallback shape); pass
``partition_by`` to get touched-partition rewrites. Concurrency
control is optimistic with commutation-aware retries — the same model
Delta uses.
"""

from __future__ import annotations

import datetime
import hashlib
import json
import math
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from calorista_spark.operators.merge import merge_upsert, merge_upsert_cdc


def _duckdb_validate_files(
    root: str,
    files: list[str],
    schema_json: dict,
    mapping: dict[str, str],
    cons: dict[str, str],
) -> None:
    """CHECK-constraint validation of staged parquet WITHOUT a
    SparkSession — the Spark DataSource write face commits from a
    session-less Python worker, so it validates through DuckDB over
    the files it just wrote. :meth:`CommitLogStore.add_constraint`
    gates every expression on DuckDB bindability at creation time, so
    an enforced constraint is always evaluable here; the SQL-standard
    tri-state (only FALSE violates) matches the Spark-side gate."""
    if not cons or not files:
        return
    import duckdb

    logical = [f["name"] for f in schema_json["fields"]]
    sel = ", ".join(
        f'"{mapping.get(n, n)}" AS "{n}"' for n in logical
    )
    paths = [os.path.join(root, f) for f in files]
    viol = " OR ".join(f"(({e}) IS FALSE)" for e in cons.values())
    con = duckdb.connect()
    try:
        n_bad = con.sql(
            f"SELECT COUNT(*) FROM (SELECT {sel} FROM "
            f"read_parquet({paths!r})) WHERE {viol}"
        ).fetchone()[0]
    finally:
        con.close()
    if n_bad:
        raise ConstraintViolationError(
            f"write violates CHECK constraint(s) {sorted(cons)}: "
            f"{n_bad} row(s)"
        )


class ConstraintViolationError(RuntimeError):
    """A write produced rows that fail a table CHECK constraint; the
    commit was aborted before publish (the staged files are orphans
    vacuum reaps). SQL-standard semantics: a row violates only when
    the expression evaluates to FALSE — NULL/UNKNOWN passes."""


class CommitConflictError(RuntimeError):
    """Another writer committed the version this writer raced for."""


# -- file statistics (r10: data skipping) -----------------------------------
#
# Every committed parquet file gets a manifest stats entry: row count,
# byte size, and per-column min/max/null_count lifted STRAIGHT FROM THE
# PARQUET FOOTER (pyarrow metadata — zero extra scan; the writer
# already paid for these). Reads with simple predicates then prune
# files whose stat range provably cannot match, BEFORE Spark ever
# plans the scan — the same manifest-level skipping Delta/Iceberg do,
# and the reason a point lookup against a 100 TB store opens a handful
# of files instead of all of them. Pruning is strictly conservative:
# a column chunk with missing/unserializable stats keeps its file.
#
# Serialization: numbers/bools/strings are stored raw; dates and
# timestamps are stored as {"k": "d"|"t"|"tn", "v": isoformat} so
# comparisons stay lexicographic-correct and MIXED kinds (a date
# predicate against a timestamp column) are treated as incomparable
# → never pruned (a date-vs-midnight tie would otherwise misprune).
#
# r11 (ADVICE r10): tz-AWARE datetimes normalize to UTC under kind
# "t"; tz-NAIVE ones keep kind "tn". The two kinds never compare:
# a naive TimestampType predicate is converted by F.lit via the
# DRIVER's local timezone (TimestampType.toInternal — verified, NOT
# the session timezone) while INT64 footer stats are UTC-adjusted,
# so treating naive-vs-aware as comparable silently mispruned on any
# non-UTC machine. :meth:`CommitLogStore.files_for` converts naive
# predicate values against TimestampType columns with the SAME
# toInternal arithmetic (restoring exact pruning); any remaining kind
# mismatch keeps the file — conservative, never lossy.


def _stat_value(v):
    """Normalize a stat/predicate value for JSON + ordered compare;
    None = unsupported type (disables pruning for that comparison)."""
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, (int, float)):
        return v if not (isinstance(v, float) and math.isnan(v)) else None
    if isinstance(v, str):
        return v
    if isinstance(v, datetime.datetime):  # before date: datetime IS a date
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
            return {"k": "t", "v": v.isoformat(timespec="microseconds")}
        return {"k": "tn", "v": v.isoformat(timespec="microseconds")}
    if isinstance(v, datetime.date):
        return {"k": "d", "v": v.isoformat()}
    return None


def _holds_datetime(value) -> bool:
    """True when a predicate value (scalar, between-pair, or in-list)
    contains a datetime.datetime (date subclasses excluded — only
    timestamp-kind stats had the pre-r11 ambiguity)."""
    if isinstance(value, (tuple, list)):
        return any(isinstance(v, datetime.datetime) for v in value)
    return isinstance(value, datetime.datetime)


def _pruning_predicates(predicates: list[tuple], schema: T.StructType):
    """Predicates normalized for STATS comparison only (the residual
    filter always uses the originals, so read semantics are untouched):
    naive datetime values aimed at a TimestampType column are converted
    to UTC using EXACTLY the arithmetic ``F.lit`` applies
    (``TimestampType.toInternal`` = ``time.mktime`` over the SYSTEM
    local timezone — verified against pyspark source, NOT the session
    timezone), so footer-stat pruning compares the same instant the
    residual filter will. TimestampNTZ columns keep naive values (kind
    'tn' on both sides — pyarrow lifts their stats naive too).
    Kind-mismatched comparisons never prune (conservative)."""
    import time as _time

    by_type = {f.name: f.dataType for f in schema.fields}

    def conv(v):
        if isinstance(v, datetime.datetime) and v.tzinfo is None:
            # mirror TimestampType.toInternal bit for bit (mktime's
            # tm_isdst=-1 DST resolution included) so the pruned set
            # is a strict superset of the residual's matches
            seconds = int(_time.mktime(v.timetuple()))
            return datetime.datetime.fromtimestamp(
                seconds, tz=datetime.timezone.utc
            ).replace(microsecond=v.microsecond)
        return v

    out = []
    for col, op, value in predicates:
        if isinstance(by_type.get(col), T.TimestampType):
            if op == "between":
                value = (conv(value[0]), conv(value[1]))
            elif op == "in":
                value = [conv(v) for v in value]
            else:
                value = conv(value)
        out.append((col, op, value))
    return out


def _stat_cmp(a, b) -> int | None:
    """Ordered compare of two normalized stat values; None = the pair
    is incomparable (different kinds) and must not prune."""
    if a is None or b is None:
        return None
    if isinstance(a, dict) or isinstance(b, dict):
        if (
            isinstance(a, dict)
            and isinstance(b, dict)
            and a.get("k") == b.get("k")
        ):
            return (a["v"] > b["v"]) - (a["v"] < b["v"])
        return None
    num_a = isinstance(a, (int, float))
    num_b = isinstance(b, (int, float))
    if num_a != num_b:
        return None
    return (a > b) - (a < b)


def _parquet_file_stats(abs_path: str) -> dict:
    """File-level stats from the parquet footer: rows, bytes, and for
    each column with complete row-group statistics, {min, max, nulls}.
    A column missing stats in ANY row group is omitted (conservative)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(abs_path).metadata
    cols: dict[str, dict] = {}
    incomplete: set[str] = set()
    for rg in range(md.num_row_groups):
        group = md.row_group(rg)
        for ci in range(group.num_columns):
            chunk = group.column(ci)
            name = chunk.path_in_schema
            if "." in name or name in incomplete:
                continue  # nested leaves: skip (top-level atomics only)
            st = chunk.statistics
            if st is None or not st.has_min_max:
                incomplete.add(name)
                cols.pop(name, None)
                continue
            mn, mx = _stat_value(st.min), _stat_value(st.max)
            if mn is None or mx is None:
                incomplete.add(name)
                cols.pop(name, None)
                continue
            nulls = st.null_count if st.has_null_count else None
            cur = cols.get(name)
            if cur is None:
                cols[name] = {"min": mn, "max": mx, "nulls": nulls}
            else:
                if _stat_cmp(mn, cur["min"]) == -1:
                    cur["min"] = mn
                if _stat_cmp(mx, cur["max"]) == 1:
                    cur["max"] = mx
                cur["nulls"] = (
                    None
                    if nulls is None or cur["nulls"] is None
                    else cur["nulls"] + nulls
                )
    return {
        "rows": md.num_rows,
        "bytes": os.path.getsize(abs_path),
        "cols": cols,
    }


def _file_matches(stats: dict | None, predicates: list[tuple]) -> bool:
    """True unless the file's stats PROVE no row can satisfy every
    predicate. Predicates: (col, op, value) with op in
    ==, <, <=, >, >=, between (value=(lo, hi)), in (value=list)."""
    if not stats:
        return True
    cols = stats.get("cols", {})
    for col, op, value in predicates:
        st = cols.get(col)
        if st is None:
            continue
        mn, mx = st["min"], st["max"]
        if op == "==":
            v = _stat_value(value)
            if _stat_cmp(v, mn) == -1 or _stat_cmp(v, mx) == 1:
                return False
        elif op in ("<", "<="):
            v = _stat_value(value)
            c = _stat_cmp(mn, v)
            if c == 1 or (op == "<" and c == 0):
                return False
        elif op in (">", ">="):
            v = _stat_value(value)
            c = _stat_cmp(mx, v)
            if c == -1 or (op == ">" and c == 0):
                return False
        elif op == "between":
            lo, hi = (_stat_value(value[0]), _stat_value(value[1]))
            if _stat_cmp(mx, lo) == -1 or _stat_cmp(mn, hi) == 1:
                return False
        elif op == "in":
            vs = [_stat_value(v) for v in value]
            if vs and all(
                _stat_cmp(v, mn) == -1 or _stat_cmp(v, mx) == 1 for v in vs
            ):
                return False
        else:
            raise ValueError(f"unsupported predicate op {op!r}")
    return True


def _predicate_column(col, op, value):
    """The exact Spark filter a predicate stands for (pruning is a
    superset of this; applying it keeps read_where semantics exact)."""
    from pyspark.sql import functions as F

    c = F.col(col)
    if op == "==":
        return c == F.lit(value)
    if op == "<":
        return c < F.lit(value)
    if op == "<=":
        return c <= F.lit(value)
    if op == ">":
        return c > F.lit(value)
    if op == ">=":
        return c >= F.lit(value)
    if op == "between":
        return c.between(F.lit(value[0]), F.lit(value[1]))
    if op == "in":
        return c.isin(list(value))
    raise ValueError(f"unsupported predicate op {op!r}")


# -- schema evolution (r10) -------------------------------------------------


def _union_schema(base: T.StructType, incoming: T.StructType) -> T.StructType:
    """Additive schema merge: base columns in order, then incoming's
    NEW columns appended as nullable. A same-name column with a
    different type raises — no silent widening/coercion (Delta's
    mergeSchema contract)."""
    by_name = {f.name: f for f in base.fields}
    fields = list(base.fields)
    for f in incoming.fields:
        prev = by_name.get(f.name)
        if prev is None:
            fields.append(T.StructField(f.name, f.dataType, True))
        elif prev.dataType.simpleString() != f.dataType.simpleString():
            raise ValueError(
                f"schema conflict on column {f.name!r}: "
                f"{prev.dataType.simpleString()} vs "
                f"{f.dataType.simpleString()}"
            )
    return T.StructType(fields)


def _align_to(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project ``df`` to ``schema``'s columns in order, filling columns
    it lacks with typed nulls (how pre-evolution rows acquire the new
    columns)."""
    from pyspark.sql import functions as F

    have = set(df.columns)
    return df.select(
        *[
            F.col(f.name)
            if f.name in have
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in schema.fields
        ]
    )


_ZORDER_NUMERIC = ("int", "bigint", "smallint", "tinyint", "float", "double")


def _physical_struct(
    schema: T.StructType, mapping: dict[str, str]
) -> T.StructType:
    """The schema as written in parquet files: logical field names
    replaced by their stable physical names (identity when the table
    never renamed/dropped — the pre-r13 fast path)."""
    if not mapping:
        return schema
    return T.StructType(
        [
            T.StructField(
                mapping.get(f.name, f.name),
                f.dataType,
                f.nullable,
                f.metadata,
            )
            for f in schema.fields
        ]
    )


def _to_physical(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Rename mapped logical columns to their physical names (column
    order and unmapped columns — e.g. the ``__part`` shadow —
    untouched). Projections preserve row order, so this composes with
    ``sortWithinPartitions`` upstream."""
    if not mapping or not any(c in mapping for c in df.columns):
        return df
    from pyspark.sql import functions as F

    return df.select(
        *[
            F.col(c).alias(mapping[c]) if c in mapping else F.col(c)
            for c in df.columns
        ]
    )


def _map_predicates(
    predicates: list[tuple], mapping: dict[str, str]
) -> list[tuple]:
    """Predicate column names logical → physical (footer stats are
    keyed by the names actually in the files)."""
    if not mapping:
        return predicates
    return [(mapping.get(c, c), op, v) for c, op, v in predicates]


def _zorder_column(df: DataFrame, cols: list[str], bits: int = 4):
    """Z-value expression for multi-dimensional clustering: each column
    is bucketed into 2^bits RANK buckets by approx quantiles (the ONLY
    driver-side materialization is the boundary list — 2^bits values
    per column, data-size independent), then the bucket bits are
    interleaved. Sorting by the result gives every output file a tight
    min/max rectangle in EVERY clustered dimension, so manifest-stats
    pruning bites on any of them — the Delta OPTIMIZE ZORDER BY trade:
    each single dimension prunes a bit worse than a dedicated linear
    sort, but all dimensions prune at once. Numeric columns only (use
    linear clustering for strings/dates). The whole expression is
    built-in functions — JVM-side, no UDF.

    Why quantile buckets at 2^4, not more, and not uniform width: the
    bucket expression is a chain of 2^bits-1 CASE WHENs per column, and
    64-bucket chains hit a measured Janino codegen cliff (an 11 s
    compact dropped to 3 s at 16 buckets); uniform ``width_bucket``
    is O(1) per row but collapses under outlier skew (one backfill ID
    at key+100000 squeezed every real user into bucket 0, destroying
    the very pruning z-order exists for). Sixteen rank buckets per
    dimension is granularity enough for FILE-level skipping while
    staying on the fast side of both cliffs."""
    from pyspark.sql import functions as F

    for c in cols:
        if dict(df.dtypes).get(c) not in _ZORDER_NUMERIC:
            raise ValueError(
                f"zorder column {c!r} must be numeric "
                f"(got {dict(df.dtypes).get(c)}); use linear clustering"
            )
    n = 1 << bits
    probs = [i / n for i in range(1, n)]
    all_bounds = df.approxQuantile(cols, probs, 1.0 / (4 * n))

    def bucket(c: str, bounds: list[float]):
        # rank bucket = #boundaries <= value; nulls sort first (bucket 0)
        e = F.lit(0)
        for b in sorted(set(bounds)):
            e = e + F.when(F.col(c) >= F.lit(b), 1).otherwise(0)
        return F.when(F.col(c).isNull(), F.lit(0)).otherwise(e).cast("long")

    buckets = [bucket(c, bs) for c, bs in zip(cols, all_bounds)]
    # interleave via the shared Morton-key builder (operators/layout)
    from calorista_spark.operators.layout import zorder_key

    return zorder_key(buckets, bits=bits).alias("__zval")


def _rmtree_ignore_missing(path: str) -> None:
    """``shutil.rmtree`` tolerating only concurrent-deletion races
    (FileNotFoundError); every other failure (EACCES, EROFS, ...)
    propagates so a vacuum that cannot delete reports the truth
    (ADVICE r12 — replaces blanket ``ignore_errors=True``)."""

    def onerror(_fn, _p, exc_info):
        if not issubclass(exc_info[0], FileNotFoundError):
            raise exc_info[1]

    shutil.rmtree(path, onerror=onerror)


def _fsync_file(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


# -- deletion vectors (r10) ---------------------------------------------------
#
# A DV is the sorted set of deleted row positions (parquet physical
# row index, 0-based — exactly what Spark's ``_metadata.row_index``
# exposes) for ONE immutable data file. Stored as a little-endian
# uint64 sidecar with a magic header; sorted delta-friendly and
# trivially mmap-able. Production engines use roaring bitmaps here —
# same contract, denser encoding; the format is versioned (``CLDV1``)
# so that swap stays local to these two functions.

_DV_MAGIC = b"CLDV1\x00"


def _reshape_partitions(
    parts: dict[str, list[str]], removed: set[str], added: dict[str, list[str]]
) -> dict[str, list[str]]:
    """The partition→files map after a DML commit removed some files
    (copy-on-write rewrites) and added others; partitions left with no
    files drop out of the map entirely."""
    out = {v: [f for f in fl if f not in removed] for v, fl in parts.items()}
    for val, fl in added.items():
        out[val] = sorted(out.get(val, []) + list(fl))
    return {v: out[v] for v in sorted(out) if out[v]}


def _clustering_after_dml(
    m: dict, removed: set[str], added: dict[str, list[str]]
) -> dict:
    """Clustering entries that survive a DML commit: any partition
    whose file set changed (a copy-on-write rewrite or an appended
    update file) loses its layout guarantee; pure-DV commits (no file
    changes) keep every entry — masking positions does not disturb the
    on-disk order, and footer stats stay a conservative superset."""
    clustering = m.get("clustering", {})
    if not removed and not added:
        return dict(clustering)
    parts = m.get("partitions")
    if parts is None:  # unpartitioned: any file change voids the entry
        return {}
    touched = set(added)
    for v, fl in parts.items():
        if any(f in removed for f in fl):
            touched.add(v)
    return {v: cl for v, cl in clustering.items() if v not in touched}


def _decoded_path_col():
    """``_metadata.file_path`` as a decoded absolute filesystem path —
    JVM-side, no Python round-trip. The metadata column is a file URI
    with percent-encoded specials (space → %20, %% → %25, unicode →
    UTF-8 escapes) but a LITERAL ``+``; ``url_decode`` is
    form-decoding (``+`` → space), so literal plusses are protected as
    %2B first, making the whole thing an exact percent-decode. Without
    this, a partition value containing a space made every
    path-identity join (DV anti-join, DML position scan) silently miss
    (ADVICE r10)."""
    from pyspark.sql import functions as F

    return F.regexp_replace(
        F.url_decode(
            F.regexp_replace(F.col("_metadata.file_path"), r"\+", "%2B")
        ),
        "^file:/+",
        "/",
    )


def _encode_dv(positions) -> bytes:
    import numpy as np

    arr = np.unique(np.asarray(sorted(positions), dtype=np.uint64))
    return _DV_MAGIC + arr.astype("<u8").tobytes()


def _decode_dv(blob: bytes):
    import numpy as np

    if not blob.startswith(_DV_MAGIC):
        raise ValueError("not a CLDV1 deletion vector")
    return np.frombuffer(blob[len(_DV_MAGIC) :], dtype="<u8")


# -- segmented manifests (r12 — VERDICT r11 #4) -------------------------------
#
# manifest_format 2 splits the per-file bulk of a commit — file list,
# footer stats, deletion-vector map — out of the commit JSON into
# CONTENT-ADDRESSED per-partition segment files under
# ``_commits/seg/<sha1>.json`` (Iceberg's manifest-list shape). The
# commit JSON keeps only scalars plus, per partition, the segment ref
# and a MERGED stat envelope (min/max per column across the
# partition's files). Consequences at 10^5–10^6 files:
#
# - A commit that carries a partition by reference reuses the parent's
#   segment VERBATIM (same content → same hash → same file): publish
#   I/O and JSON encoding are O(touched partitions), not O(table).
# - A pruned read (:meth:`CommitLogStore.files_for`) tests the segment
#   envelope FIRST and loads only segments whose envelope might match:
#   driver parse cost is O(matching partitions' segments).
# - Full hydration (:meth:`CommitLogStore.manifest` — the legacy
#   all-files dict) still exists for maintenance ops (compact, vacuum,
#   full-snapshot reads) that are inherently O(files).
#
# Segments are immutable and shared across versions; :meth:`vacuum`
# GCs the ones no retained manifest references (age-gated, same
# in-flight-writer defense as data dirs). Format 1 manifests (inline
# files/stats/dv) remain fully readable — hydration is the identity.

MANIFEST_FORMAT = 2

# hydration/meta/segment caches per store instance are bounded by
# these entry counts; entries are immutable once written, so eviction
# is correctness-neutral (a reload re-parses the same bytes)
_META_CACHE_MAX = 256
_FULL_CACHE_MAX = 8
_SEG_CACHE_MAX = 512


def _merge_file_stats(stats_list: list[dict | None]) -> dict:
    """One segment-level stat envelope from per-file footer stats:
    rows/bytes summed, per-column min/max widened, null counts summed.
    Shaped exactly like a per-file entry so :func:`_file_matches`
    applies unchanged at segment granularity. Conservative: a column
    missing from ANY file (or any file missing stats entirely) is
    dropped from the envelope — the segment then never prunes on it."""
    rows = 0
    nbytes = 0
    cols: dict[str, dict] | None = None
    complete = True
    for st in stats_list:
        if not st:
            complete = False
            cols = {}
            continue
        rows += st.get("rows", 0)
        nbytes += st.get("bytes", 0)
        fc = st.get("cols", {})
        if not complete:
            continue
        if cols is None:
            cols = {
                c: {"min": v["min"], "max": v["max"], "nulls": v["nulls"]}
                for c, v in fc.items()
            }
            continue
        for c in list(cols):
            v = fc.get(c)
            if v is None:
                del cols[c]
                continue
            cur = cols[c]
            if _stat_cmp(v["min"], cur["min"]) == -1:
                cur["min"] = v["min"]
            if _stat_cmp(v["max"], cur["max"]) == 1:
                cur["max"] = v["max"]
            cur["nulls"] = (
                None
                if v["nulls"] is None or cur["nulls"] is None
                else cur["nulls"] + v["nulls"]
            )
    return {"rows": rows, "bytes": nbytes, "cols": cols or {}}


class CommitLogStore:
    """A parquet table with an atomic commit log (see module doc)."""

    def __init__(self, path: str):
        # resolve ONCE, against the Python driver's cwd: Spark's JVM
        # resolves relative paths against its OWN user.dir (fixed at
        # session start) and executor tasks against theirs, so a
        # relative store path would scatter reads/writes across three
        # different roots. Every downstream join/open then agrees.
        path = os.path.abspath(path)
        self.path = path
        self.commits_dir = os.path.join(path, "_commits")
        self.seg_dir = os.path.join(path, "_commits", "seg")
        self.data_dir = os.path.join(path, "data")
        os.makedirs(self.commits_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)
        # per-instance caches over IMMUTABLE artifacts (a committed
        # manifest/segment is never modified); callers must treat the
        # returned dicts as read-only — every composition site builds
        # fresh dicts rather than mutating a loaded manifest
        self._meta_cache: dict[int, dict] = {}
        self._full_cache: dict[int, dict] = {}
        self._seg_cache: dict[str, dict] = {}
        # instrumentation: profile of the most recent files_for call
        # ({"segments_total", "segments_loaded", "files_matched"});
        # None until a segment-indexed manifest is pruned. Read by the
        # scale smoke to PROVE pruned reads load only touched segments.
        self.last_prune_profile: dict | None = None

    # -- manifest plumbing -------------------------------------------------

    def _load_segment(self, ref: str) -> dict:
        seg = self._seg_cache.get(ref)
        if seg is None:
            with open(os.path.join(self.path, ref)) as fh:
                seg = json.load(fh)
            if len(self._seg_cache) >= _SEG_CACHE_MAX:
                self._seg_cache.clear()
            self._seg_cache[ref] = seg
        return seg

    def _write_segment(self, seg: dict) -> str:
        """Persist one manifest segment content-addressed; identical
        content (an untouched partition carried across versions)
        dedupes to the same file — zero rewrite. Returns the ref
        (store-relative path). Durable before the commit JSON that
        references it can link."""
        blob = json.dumps(seg, sort_keys=True, separators=(",", ":")).encode()
        sha = hashlib.sha1(blob).hexdigest()
        rel = os.path.join("_commits", "seg", f"{sha}.json")
        final = os.path.join(self.path, rel)
        if not os.path.exists(final):
            os.makedirs(self.seg_dir, exist_ok=True)
            tmp = final + ".tmp-" + uuid.uuid4().hex[:8]
            with open(tmp, "wb") as fh:
                fh.write(blob)
                fh.flush()
                os.fsync(fh.fileno())
            # replace, not link: racing writers carry IDENTICAL bytes
            # (content address), so last-write-wins is harmless
            os.replace(tmp, final)
            _fsync_file(self.seg_dir)
        return rel

    def _segment_manifest(self, full: dict) -> dict:
        """Split a fully-composed manifest dict into the format-2
        commit JSON: scalars stay inline, per-file bulk moves to
        content-addressed segments keyed by partition value (one
        segment keyed ``""`` for unpartitioned stores).
        ``full["__carry_segments__"]`` (partition value → segment
        entry from the PARENT meta) injects carried-by-reference
        partitions without their files ever being materialized."""
        carry_segments = full.pop("__carry_segments__", {})
        stats = full.get("stats", {})
        dv = full.get("dv", {})
        partitioned = "partitions" in full or bool(carry_segments)
        groups = (
            full.get("partitions", {})
            if partitioned
            else ({"": full["files"]} if full["files"] else {})
        )
        segments: dict[str, dict] = {}
        for val, fl in groups.items():
            if val in carry_segments:
                raise ValueError(
                    f"partition {val!r} both written and carried by ref"
                )
            fl = sorted(fl)
            seg = {
                "files": fl,
                "stats": {f: stats[f] for f in fl if f in stats},
            }
            seg_dv = {f: dv[f] for f in fl if f in dv}
            if seg_dv:
                seg["dv"] = seg_dv
            segments[val] = {
                "ref": self._write_segment(seg),
                "n_files": len(fl),
                "n_dv": len(seg_dv),
                "stats": _merge_file_stats(
                    [stats.get(f) for f in fl]
                ),
            }
        if partitioned:
            grouped = {f for fl in groups.values() for f in fl}
            if grouped != set(full["files"]):
                raise ValueError(
                    "manifest files and partition map disagree: "
                    f"{sorted(grouped ^ set(full['files']))[:5]} ..."
                )
        segments.update(carry_segments)
        meta = {
            k: v
            for k, v in full.items()
            if k not in ("files", "stats", "dv", "partitions")
        }
        meta["manifest_format"] = MANIFEST_FORMAT
        meta["partitioned"] = partitioned
        meta["segments"] = {v: segments[v] for v in sorted(segments)}
        return meta

    def _hydrate(self, meta: dict) -> dict:
        """The legacy all-files manifest dict for a commit JSON of any
        format. Format 1 is the identity; format 2 loads every segment
        — O(files), reserved for paths that genuinely plan the whole
        snapshot (full reads, compact, vacuum, model checks)."""
        if meta.get("manifest_format", 1) < 2:
            return meta
        files: list[str] = []
        stats: dict[str, dict] = {}
        dv: dict[str, str] = {}
        parts: dict[str, list[str]] = {}
        for val, sm in meta.get("segments", {}).items():
            seg = self._load_segment(sm["ref"])
            files.extend(seg["files"])
            stats.update(seg.get("stats", {}))
            dv.update(seg.get("dv", {}))
            if meta.get("partitioned"):
                parts[val] = list(seg["files"])
        full = {
            k: v
            for k, v in meta.items()
            if k not in ("segments", "manifest_format", "partitioned")
        }
        full["files"] = sorted(files)
        full["stats"] = {f: stats[f] for f in sorted(stats)}
        if dv:
            full["dv"] = {f: dv[f] for f in sorted(dv)}
        if meta.get("partitioned"):
            full["partitions"] = {v: parts[v] for v in sorted(parts)}
        return full

    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.commits_dir):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    out.append(int(name[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def manifest_meta(self, version: int) -> dict:
        """The commit JSON as written — for format-2 manifests a SMALL
        document (scalars + per-partition segment refs/envelopes),
        regardless of table size. Treat as read-only (cached)."""
        meta = self._meta_cache.get(version)
        if meta is None:
            with open(
                os.path.join(self.commits_dir, f"v{version:08d}.json")
            ) as fh:
                meta = json.load(fh)
            if len(self._meta_cache) >= _META_CACHE_MAX:
                self._meta_cache.clear()
            self._meta_cache[version] = meta
        return meta

    def manifest(self, version: int) -> dict:
        """The HYDRATED manifest (inline files/stats/dv/partitions,
        format-1 shape) — O(files) for format-2 manifests; prefer
        :meth:`manifest_meta` + selective segment loads on hot paths.
        Treat as read-only (cached)."""
        full = self._full_cache.get(version)
        if full is None:
            full = self._hydrate(self.manifest_meta(version))
            if len(self._full_cache) >= _FULL_CACHE_MAX:
                self._full_cache.clear()
            self._full_cache[version] = full
        return full

    def _segment_index(self, meta: dict) -> dict[str, dict] | None:
        """partition value → segment entry for a format-2 meta; None
        for format-1 manifests (no segment structure to exploit)."""
        if meta.get("manifest_format", 1) >= 2:
            return meta.get("segments", {})
        return None

    def _partition_slice(
        self, meta: dict, values: set[str]
    ) -> tuple[dict[str, list[str]], dict[str, dict], dict[str, str]]:
        """(partitions, stats, dv) restricted to ``values`` — loads
        ONLY those partitions' segments on a format-2 manifest (the
        O(touched) commit path); format-1 slices the inline maps."""
        idx = self._segment_index(meta)
        if idx is None:
            parts = {
                v: fl
                for v, fl in meta.get("partitions", {}).items()
                if v in values
            }
            in_slice = {f for fl in parts.values() for f in fl}
            stats = {
                f: st
                for f, st in meta.get("stats", {}).items()
                if f in in_slice
            }
            dv = {
                f: p for f, p in meta.get("dv", {}).items() if f in in_slice
            }
            return parts, stats, dv
        parts, stats, dv = {}, {}, {}
        for val in values:
            sm = idx.get(val)
            if sm is None:
                continue
            seg = self._load_segment(sm["ref"])
            parts[val] = list(seg["files"])
            stats.update(seg.get("stats", {}))
            dv.update(seg.get("dv", {}))
        return parts, stats, dv

    def last_batch_id(self, app_id: str | None = None) -> int | None:
        """High-water batch id of the replay ledger. With ``app_id``,
        the WRITER-SCOPED high-water mark (the Delta txnAppId/
        txnVersion pattern — r14, ADVICE r13): each named writer gets
        its own monotonic epoch sequence in the manifest's ``txn``
        map, so a restarted streaming query with a fresh checkpoint
        (epochs restart at 0) can never be confused with a replay of
        another writer's batches."""
        v = self.latest_version()
        if v is None:
            return None
        m = self.manifest_meta(v)
        if app_id is not None:
            return (m.get("txn") or {}).get(app_id)
        return m.get("last_batch_id")

    def version_as_of(self, ts: float) -> int:
        """The snapshot a reader at wall-clock ``ts`` (unix seconds)
        would have seen: the newest version committed at or before it —
        Delta's TIMESTAMP AS OF. Raises if ``ts`` predates the table."""
        best = None
        for v in self.versions():
            at = self.manifest_meta(v).get("committed_at")
            if at is not None and at <= ts:
                best = v
        if best is None:
            raise ValueError(
                f"no commit at or before ts={ts} in {self.path}"
            )
        return best

    def history(self) -> list[dict]:
        """DESCRIBE HISTORY: one row per retained commit, newest first —
        the audit trail (version, op, committed_at, batch_id, file and
        partition counts, DV presence). Meta-only on format-2
        manifests: segment envelopes carry the counts, so a long
        history over a huge table never hydrates file lists."""
        out = []
        for v in reversed(self.versions()):
            m = self.manifest_meta(v)
            idx = self._segment_index(m)
            if idx is not None:
                n_files = sum(sm["n_files"] for sm in idx.values())
                n_parts = (len(idx) or None) if m.get("partitioned") else None
                n_dv = sum(sm.get("n_dv", 0) for sm in idx.values())
                rows = sum(sm["stats"].get("rows", 0) for sm in idx.values())
            else:
                n_files = len(m["files"])
                n_parts = len(m.get("partitions", {})) or None
                n_dv = len(m.get("dv", {})) or 0
                rows = sum(
                    st["rows"] for st in m.get("stats", {}).values()
                )
            out.append(
                {
                    "version": v,
                    "parent": m.get("parent"),
                    "op": m.get("op"),
                    "committed_at": m.get("committed_at"),
                    "batch_id": m.get("batch_id"),
                    "n_files": n_files,
                    "n_partitions": n_parts,
                    "n_dv_files": n_dv,
                    "rows_physical": rows,
                }
            )
        return out

    # -- read --------------------------------------------------------------

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        as_of: float | None = None,
    ) -> DataFrame:
        """Snapshot read; ``version`` time-travels to any retained
        commit, ``as_of`` (unix seconds) to the newest commit at or
        before that wall-clock instant. Planned from the manifest's
        file list — no directory listing, and concurrent writers
        cannot disturb it."""
        if as_of is not None:
            if version is not None:
                raise ValueError("pass version OR as_of, not both")
            version = self.version_as_of(as_of)
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"commit-log store at {self.path} is empty")
        m = self.manifest(v)
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        return self._read_files(
            spark,
            m["files"],
            schema,
            dv=m.get("dv"),
            mapping=m.get("column_mapping"),
        )

    def files_for(
        self, predicates: list[tuple], version: int | None = None
    ) -> list[str]:
        """The manifest-pruned file list for a snapshot read under
        ``predicates`` — every file whose footer-lifted stats do NOT
        prove it can contain no matching row. Strictly a superset of
        the files that hold matches, so :meth:`read_where` built on it
        is exact. This is the skipping a point lookup or a date-range
        scan rides at 100 TB: O(matching files) opened, not O(table).

        Predicates: ``(col, op, value)`` with op in ``== < <= > >=``,
        ``between`` (value = (lo, hi)), ``in`` (value = list). Values
        must be non-null python literals; pass ``datetime``/``date``
        objects for temporal columns (kind-mismatched comparisons are
        conservatively never pruned; naive datetimes against a
        TimestampType column are interpreted exactly as ``F.lit``
        interprets them — the driver's local timezone).

        r12 (VERDICT r11 #4): on segmented manifests this is TWO-level
        — the per-partition segment envelope (merged min/max) is
        tested first and only segments that might match are loaded, so
        the driver parses O(matching partitions) of file metadata, not
        the table's. :attr:`last_prune_profile` records the ratio."""
        return self._files_for_pruned(predicates, version)[0]

    def _files_for_pruned(
        self, predicates: list[tuple], version: int | None = None
    ) -> tuple[
        list[str], dict[str, str], dict[str, dict], dict[str, str] | None
    ]:
        """(pruned files, their DV map, their stats, file→partition) —
        the internal face of :meth:`files_for` that also surfaces the
        surviving files' metadata WITHOUT hydrating the manifest, so
        :meth:`read_where` and the DML planners stay O(matching
        segments) on the driver. The partition map is ``None`` on
        format-1 manifests (no segment structure)."""
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"commit-log store at {self.path} is empty")
        meta = self.manifest_meta(v)
        usable = predicates
        if meta.get("stats_format", 1) < 2:
            # pre-r11 manifests stored tz-naive timestamps under kind
            # 't' WITHOUT UTC normalization — incomparable with the
            # r11+ predicate conversion, so datetime predicates never
            # prune against them (ADVICE r11); date predicates ('d')
            # were always well-defined and keep pruning
            usable = [
                (c, op, val)
                for c, op, val in predicates
                if not _holds_datetime(val)
            ]
        preds = _pruning_predicates(
            usable, T.StructType.fromJson(json.loads(meta["schema"]))
        )
        # footer stats are keyed by PHYSICAL column names; predicates
        # arrive logical (r13 column mapping)
        preds = _map_predicates(preds, meta.get("column_mapping") or {})
        idx = self._segment_index(meta)
        if idx is None:
            m = self.manifest(v)
            stats = m.get("stats", {})
            out = [f for f in m["files"] if _file_matches(stats.get(f), preds)]
            out, _skip = self._bloom_prune(
                out, preds,
                T.StructType.fromJson(json.loads(meta["schema"])),
                meta.get("column_mapping"),
            )
            keep = set(out)
            self.last_prune_profile = None
            return (
                out,
                {f: p for f, p in m.get("dv", {}).items() if f in keep},
                {f: st for f, st in stats.items() if f in keep},
                None,
            )
        out: list[str] = []
        dvm: dict[str, str] = {}
        stm: dict[str, dict] = {}
        part_of: dict[str, str] = {}
        loaded = 0
        for val in sorted(idx):
            sm = idx[val]
            if not _file_matches(sm.get("stats"), preds):
                continue  # segment envelope proves no file can match
            loaded += 1
            seg = self._load_segment(sm["ref"])
            seg_stats = seg.get("stats", {})
            seg_dv = seg.get("dv", {})
            for f in seg["files"]:
                if _file_matches(seg_stats.get(f), preds):
                    out.append(f)
                    part_of[f] = val
                    if f in seg_stats:
                        stm[f] = seg_stats[f]
                    if f in seg_dv:
                        dvm[f] = seg_dv[f]
        out, bloom_skipped = self._bloom_prune(
            out, preds,
            T.StructType.fromJson(json.loads(meta["schema"])),
            meta.get("column_mapping"),
        )
        keep = set(out)
        dvm = {f: p for f, p in dvm.items() if f in keep}
        stm = {f: st for f, st in stm.items() if f in keep}
        part_of = {f: p for f, p in part_of.items() if f in keep}
        self.last_prune_profile = {
            "segments_total": len(idx),
            "segments_loaded": loaded,
            "files_matched": len(out),
            "files_bloom_skipped": bloom_skipped,
            # exact planned IO of this pruned scan (r14 — the ANN
            # bytes-scanned record in SCALING reads it)
            "planned_bytes": sum(
                st.get("bytes", 0) for st in stm.values()
            ),
        }
        return sorted(out), dvm, stm, part_of

    def read_where(
        self,
        spark: SparkSession,
        predicates: list[tuple],
        version: int | None = None,
    ) -> DataFrame:
        """Snapshot read with manifest-level data skipping: plans ONLY
        :meth:`files_for`'s survivors, then applies the full predicate
        as a residual filter — bit-identical to filtering a full
        :meth:`read`, minus the skipped IO. (Parquet row-group pushdown
        still applies inside each surviving file; this layer removes
        whole files before Spark ever lists them.)"""
        from functools import reduce

        if not predicates:
            raise ValueError(
                "predicates must be non-empty; use read() for a full scan"
            )
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"commit-log store at {self.path} is empty")
        meta = self.manifest_meta(v)
        schema = T.StructType.fromJson(json.loads(meta["schema"]))
        # segment-selective: file list AND the survivors' DV map come
        # from the matching segments only — a pruned read of a 10^6
        # file table never parses the full manifest (VERDICT r11 #4)
        files, dvm, _stats, _parts = self._files_for_pruned(
            predicates, version=v
        )
        residual = reduce(
            lambda a, b: a & b,
            [_predicate_column(c, op, val) for c, op, val in predicates],
        )
        return self._read_files(
            spark, files, schema, dv=dvm, mapping=meta.get("column_mapping")
        ).filter(residual)

    # -- write -------------------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        op: str = "overwrite",
        batch_id: int | None = None,
        expect_version: int | None = ...,
        partition_by: str | None = None,
        keys: list[str] | None = None,
        carry_partitions: dict[str, list[str]] | None = None,
        clustering: dict | None = None,
        sort_by: list[str] | None = None,
        sort_expr=None,
        optimize_write: bool = False,
    ) -> int:
        """Write ``df`` as a NEW snapshot and atomically publish it.

        ``expect_version`` pins the parent this commit was derived
        from (optimistic concurrency): if another writer published
        first, :class:`CommitConflictError` raises and NOTHING of the
        table changed (the new data dir is an unreferenced orphan).
        Pass ``expect_version=None`` explicitly for blind overwrites.

        r10: ``partition_by`` lays the data out hive-style per
        partition value and records a per-partition file map in the
        manifest (enabling touched-partition MERGE and pruned CDF
        reads). The partition column STAYS in the data files — the
        layout uses a shadow ``__part`` copy — so snapshot reads plan
        exactly like unpartitioned ones, with no partition-inference
        dependency. ``carry_partitions`` (internal, used by
        :meth:`merge`) injects untouched partitions' existing files
        into the new manifest by reference. ``keys`` records the merge
        key so :meth:`read_changes` can classify rows later.

        r11: internally split into :meth:`_stage_snapshot_data` (write
        the immutable data files) + :meth:`_commit_staged` (compose a
        manifest against a parent and publish) so a MERGE that loses
        the version race can REBASE the already-written data onto the
        new head instead of rewriting it (see :meth:`merge`).
        """
        latest = self.latest_version()
        if expect_version is not ... and expect_version != latest:
            raise CommitConflictError(
                f"expected parent v{expect_version}, found v{latest}"
            )
        carry_files = None
        if op == "append" and latest is not None:
            # r14: APPEND semantics on the library face. Before this,
            # commit(op="append") staged only the new data and
            # published a manifest WITHOUT the parent's files — an
            # overwrite wearing an append label. Appends now inherit
            # the table's layout/schema/keys (the Spark writer face's
            # contract, commitlog_batch.py) and carry every parent
            # file by reference.
            meta = self.manifest_meta(latest)
            inherited = meta.get("partition_by")
            if partition_by is not None and partition_by != inherited:
                raise ValueError(
                    f"append partition_by={partition_by!r} conflicts "
                    f"with the table's {inherited!r}"
                )
            partition_by = inherited
            declared = T.StructType.fromJson(json.loads(meta["schema"]))
            want = {(f.name, f.dataType) for f in declared.fields}
            got = {(f.name, f.dataType) for f in df.schema.fields}
            if want != got:
                raise ValueError(
                    "append schema mismatch: table has "
                    f"{sorted(n for n, _ in want)}, write has "
                    f"{sorted(n for n, _ in got)} (use merge with "
                    "schema_mode='merge' for schema evolution)"
                )
            if keys is None:
                k = meta.get("keys")
                keys = list(k) if k else None
        staged = self._stage_snapshot_data(
            df, partition_by, sort_by, sort_expr, optimize_write,
            parent=latest,
        )
        if op == "append" and latest is not None:
            meta = self.manifest_meta(latest)
            if partition_by is not None and self._meta_partitioned(meta):
                idx = self._segment_index(meta)
                parent_parts = (
                    {v: None for v in idx}
                    if idx is not None
                    else {
                        v: list(fl)
                        for v, fl in self.manifest(latest)[
                            "partitions"
                        ].items()
                    }
                )
                touched = set(staged["partitions"]) & set(parent_parts)
                auto_carry = {
                    v: parent_parts[v]
                    for v in parent_parts
                    if v not in touched
                }
                if carry_partitions:
                    auto_carry.update(carry_partitions)
                carry_partitions = auto_carry
                if touched:
                    if idx is not None:
                        sliced, _st, _dv = self._partition_slice(
                            meta, touched
                        )
                    else:
                        sliced = {v: parent_parts[v] for v in touched}
                    carry_files = {v: list(fl) for v, fl in sliced.items()}
            else:
                parent_files = self.manifest(latest)["files"]
                if parent_files:
                    carry_files = {"": list(parent_files)}
        return self._commit_staged(
            staged,
            op=op,
            parent=latest,
            batch_id=batch_id,
            partition_by=partition_by,
            keys=keys,
            carry_partitions=carry_partitions,
            carry_files=carry_files,
            clustering=clustering,
        )

    def _staging_mapping(
        self, parent: int | None, schema: T.StructType
    ) -> dict[str, str]:
        """The logical→physical column mapping this staged write must
        use (r13 column mapping): existing logical columns keep their
        stamped physical names; a NEW logical column whose name would
        collide with a retired physical name (re-added after a drop)
        or another column's physical name (freed by a rename) gets a
        fresh deterministic physical name — old files' bytes for the
        retired column can then never bleed into the new one."""
        if parent is None:
            return {}
        meta = self.manifest_meta(parent)
        mapping = dict(meta.get("column_mapping") or {})
        retired = set(meta.get("retired_columns") or [])
        taken = set(mapping.values()) | retired
        out: dict[str, str] = {}
        for f in schema.fields:
            if f.name in mapping:
                out[f.name] = mapping[f.name]
            elif f.name in taken:
                base = hashlib.md5(
                    f"{f.name}:{parent}:{len(retired)}".encode()
                ).hexdigest()
                i = 0
                fresh = f"{f.name}__{base[:8]}"
                while fresh in taken:
                    i += 1
                    fresh = f"{f.name}__{base[: 8 + i]}"
                out[f.name] = fresh
                taken.add(fresh)
        return out

    def _stage_snapshot_data(
        self,
        df: DataFrame,
        partition_by: str | None,
        sort_by: list[str] | None,
        sort_expr,
        optimize_write: bool,
        parent: int | None = None,
    ) -> dict:
        """Write ``df``'s data files under a fresh ``data/<token>/``
        dir — the immutable half of a commit, reusable across publish
        attempts. Returns {token, partitions, files, stats, schema,
        column_mapping}. ``df`` arrives with LOGICAL column names;
        files are written under the stable PHYSICAL names derived from
        ``parent``'s mapping (identity on never-evolved tables)."""
        from urllib.parse import unquote

        mapping = self._staging_mapping(parent, df.schema)
        logical_schema_json = df.schema.json()
        token = uuid.uuid4().hex
        ddir = os.path.join(self.data_dir, token)
        partitions: dict[str, list[str]] = {}
        if partition_by is not None:
            if partition_by not in df.columns:
                raise ValueError(
                    f"partition column {partition_by!r} not in {df.columns}"
                )
            from pyspark.sql import functions as F

            staged = df.withColumn(
                "__part", F.col(partition_by).cast("string")
            )
            if optimize_write:
                # Delta-style optimized write: hash-shuffle rows to
                # their partition value before the hive write, so each
                # partition gets O(1) files instead of one per upstream
                # task — without this, a 32-task write into 30
                # partitions lands ~960 small files that compact must
                # then clean up.
                # r15 (guide §2 "scale-adaptive partitioning", §6):
                # the task count is NOT pinned — repartition by the
                # column alone leaves the exchange's partition count to
                # AQE, which sizes it from the staged bytes
                # (advisoryPartitionSizeInBytes). A merge-sized batch
                # coalesces to one or two tasks (the r14 form launched
                # defaultParallelism tasks — 30 of 32 empty for every
                # 2-date merge at local[32]); a bulk load fans out to
                # the session's shuffle partitions. Files per partition
                # value stay O(1) either way: the hive writer splits by
                # value within each task. Trade-off (why it's opt-in):
                # a single huge partition still lands in one task — at
                # real scale enable it for merge-sized batches, not
                # initial bulk loads.
                staged = staged.repartition(F.col("__part"))
            order_keys = (
                [F.col(c) for c in sort_by]
                if sort_by
                else ([sort_expr] if sort_expr is not None else [])
            )
            if order_keys:
                # task-local sort with __part as the leading key: the
                # write's required partition ordering is then already
                # satisfied, so no second (unstable) sort can disturb
                # the clustering order inside each file. sort_expr lets
                # the key be a computed column (z-value) that is sorted
                # by but never written.
                staged = staged.sortWithinPartitions("__part", *order_keys)
            # physical rename LAST (a projection — preserves the sort)
            staged = _to_physical(staged, mapping)
            staged.write.mode("error").partitionBy("__part").parquet(ddir)
            for sub in sorted(os.listdir(ddir)):
                if not sub.startswith("__part="):
                    continue
                val = unquote(sub[len("__part=") :])
                if val == "__HIVE_DEFAULT_PARTITION__":
                    raise ValueError(
                        "null/empty partition values are not supported: "
                        f"column {partition_by!r} must be total"
                    )
                partitions[val] = sorted(
                    os.path.join("data", token, sub, f)
                    for f in os.listdir(os.path.join(ddir, sub))
                    if f.endswith(".parquet")
                )
            new_files = sorted(f for fl in partitions.values() for f in fl)
        else:
            if sort_by:
                df = df.sortWithinPartitions(*sort_by)
            elif sort_expr is not None:
                df = df.sortWithinPartitions(sort_expr)
            _to_physical(df, mapping).write.mode("error").parquet(ddir)
            new_files = sorted(
                os.path.join("data", token, f)
                for f in os.listdir(ddir)
                if f.endswith(".parquet")
            )
        for f in new_files:  # durability of the immutable data files
            _fsync_file(os.path.join(self.path, f))
        if parent is not None:
            cons = self.manifest_meta(parent).get("constraints") or {}
            self._validate_constraints(
                df.sparkSession, new_files, df.schema, mapping, cons
            )
        # footer-lifted stats for every NEW file (no extra scan);
        # carried files reuse their parent-manifest entry at publish
        return {
            "token": token,
            "partitions": partitions,
            "files": new_files,
            "stats": {
                f: _parquet_file_stats(os.path.join(self.path, f))
                for f in new_files
            },
            "schema": logical_schema_json,
            "column_mapping": mapping,
        }

    def _commit_staged(
        self,
        staged: dict,
        *,
        op: str,
        parent: int | None,
        batch_id: int | None = None,
        partition_by: str | None = None,
        keys: list[str] | None = None,
        carry_partitions: dict[str, list[str]] | None = None,
        carry_files: dict[str, list[str]] | None = None,
        clustering: dict | None = None,
        txn_app: str | None = None,
        constraints: dict[str, str] | None = None,
    ) -> int:
        """Compose a manifest for already-staged data files against
        ``parent`` and publish it atomically; stats/DV/clustering of
        carried partitions come from the PARENT manifest, so the same
        staged data can be re-published against a newer head (merge
        rebase) without touching the files.

        r12: ``carry_files`` carries individual parent files INSIDE
        partitions this commit also wrote (file-granular MERGE — the
        key-disjoint siblings of a rewritten file). They merge into
        the partition's file list, keep their parent stats and
        deletion vectors, and VOID the partition's clustering entry
        (its layout is no longer uniform).

        r12 segmented manifests (VERDICT r11 #4): a carry_partitions
        value of ``None`` carries that partition AS THE PARENT'S
        SEGMENT REF — its file list is never parsed, so composing a
        commit against a 10^6-file table costs O(touched partitions)
        on the driver, not O(table). Explicit file lists remain
        supported (compact's rewrite bookkeeping, format-1 parents)
        and load only those partitions' segments."""
        latest = parent
        token = staged["token"]
        partitions = {v: list(fl) for v, fl in staged["partitions"].items()}
        new_files = list(staged["files"])
        stats = dict(staged["stats"])
        prev_meta = self.manifest_meta(latest) if latest is not None else {}
        prev_clustering = prev_meta.get("clustering", {})
        prev_idx = (
            self._segment_index(prev_meta) if latest is not None else None
        )
        carry_refs: dict[str, dict] = {}
        explicit_carry: dict[str, list[str]] = {}
        for val, fl in (carry_partitions or {}).items():
            if fl is not None:
                explicit_carry[val] = list(fl)
            elif prev_idx is not None and val in prev_idx:
                carry_refs[val] = prev_idx[val]
            else:
                # format-1 parent (or missing segment): degrade to an
                # explicit carry of the hydrated partition's files
                explicit_carry[val] = list(
                    self.manifest(latest)["partitions"][val]
                )
        need_vals = set(explicit_carry) | set(carry_files or {})
        if need_vals and latest is not None:
            if prev_idx is None and not self._meta_partitioned(prev_meta):
                # format-1 unpartitioned parent: no partition map to
                # slice — the hydrated manifest IS the slice
                pm = self.manifest(latest)
                prev_stats = pm.get("stats", {})
                prev_dv = pm.get("dv", {})
            else:
                _, prev_stats, prev_dv = self._partition_slice(
                    prev_meta, need_vals
                )
        else:
            prev_stats, prev_dv = {}, {}
        files = list(new_files)
        dv_map: dict[str, str] = {}
        if carry_refs or explicit_carry:
            if partition_by is None:
                raise ValueError("carry_partitions requires partition_by")
            for val in carry_refs:
                if val in partitions:
                    raise ValueError(
                        f"carried partition {val!r} collides with written data"
                    )
            for val, fl in explicit_carry.items():
                if val in partitions or val in carry_refs:
                    raise ValueError(
                        f"carried partition {val!r} collides with written data"
                    )
                partitions[val] = list(fl)
                files.extend(fl)
                for f in fl:
                    if f in prev_stats:
                        stats[f] = prev_stats[f]
                    # carried files keep their deletion vectors: the
                    # carry is by reference, so their masked rows must
                    # stay masked in the new snapshot too
                    if f in prev_dv:
                        dv_map[f] = prev_dv[f]
            files.sort()
        if carry_files:
            if partition_by is None:
                # unpartitioned file-granular MERGE: carried files are
                # keyed "" (the unpartitioned segment key) and join the
                # flat file list with their parent stats and DVs
                if set(carry_files) != {""}:
                    raise ValueError(
                        "unpartitioned carry_files must be keyed ''"
                    )
                for f in carry_files[""]:
                    files.append(f)
                    if f in prev_stats:
                        stats[f] = prev_stats[f]
                    if f in prev_dv:
                        dv_map[f] = prev_dv[f]
                files.sort()
            else:
                for val, fl in carry_files.items():
                    if val in (carry_partitions or {}):
                        raise ValueError(
                            f"partition {val!r} is both fully and "
                            "partially carried"
                        )
                    partitions[val] = sorted(
                        set(partitions.get(val, [])) | set(fl)
                    )
                    files.extend(fl)
                    for f in fl:
                        if f in prev_stats:
                            stats[f] = prev_stats[f]
                        if f in prev_dv:
                            dv_map[f] = prev_dv[f]
                files.sort()
        # clustering metadata: explicit entries for partitions THIS
        # commit laid out sorted (compact), carried entries for
        # partitions carried by reference; a rewrite without clustering
        # drops the partition's entry (its layout guarantee is gone)
        cluster_map = {
            v: (dict(cl) if isinstance(cl, dict) else list(cl))
            for v, cl in (clustering or {}).items()
        }
        if carry_partitions:
            for val in carry_partitions:
                if val in prev_clustering and val not in cluster_map:
                    cluster_map[val] = prev_clustering[val]
        prev_last_batch = self.last_batch_id()
        new_version = (latest or 0) + 1
        manifest = {
            "version": new_version,
            "parent": latest,
            "op": op,
            "files": files,
            "schema": staged["schema"],
            "batch_id": batch_id,
            # an app-scoped batch rides the per-writer txn ledger only
            # (applied in _publish); bumping the GLOBAL high-water mark
            # for it would silently swallow other writers' batch ids
            "last_batch_id": (
                batch_id
                if batch_id is not None
                and txn_app is None
                and (prev_last_batch is None or batch_id > prev_last_batch)
                else prev_last_batch
            ),
        }
        if txn_app is not None:
            manifest["txn_app"] = txn_app
        if constraints is not None:
            # explicit SET (add/drop); otherwise _publish carries the
            # parent's map forward
            manifest["constraints"] = {
                k: constraints[k] for k in sorted(constraints)
            }
        manifest["stats"] = {f: stats[f] for f in sorted(stats)}
        if dv_map:
            manifest["dv"] = {f: dv_map[f] for f in sorted(dv_map)}
        if partition_by is not None:
            manifest["partition_by"] = partition_by
            manifest["partitions"] = {
                v: partitions[v] for v in sorted(partitions)
            }
        if cluster_map:
            manifest["clustering"] = {
                v: cluster_map[v] for v in sorted(cluster_map)
            }
        if keys is not None:
            manifest["keys"] = list(keys)
        # r13 column mapping: the staged write's logical→physical map
        # becomes the snapshot's; retired physical names accumulate so
        # a re-added logical name can never alias dropped bytes
        cm = staged.get("column_mapping") or {}
        if cm:
            manifest["column_mapping"] = {k: cm[k] for k in sorted(cm)}
        retired = staged.get("retired_columns")
        if retired is None and latest is not None:
            retired = prev_meta.get("retired_columns")
        if retired:
            manifest["retired_columns"] = sorted(retired)
        if carry_refs:
            manifest["__carry_segments__"] = carry_refs
        if latest is not None and (
            carry_refs or explicit_carry or carry_files
        ):
            # carried per-file stats keep their PARENT's stats_format:
            # stamping a pre-r11 parent's naive timestamp stats as
            # format 2 would re-enable datetime pruning against values
            # that were never UTC-normalized (silent misprune on a
            # non-UTC driver). Only a commit that carries nothing old
            # (full rewrite / fresh append chain) upgrades the marker.
            manifest["stats_format"] = prev_meta.get("stats_format", 1)
        return self._publish(manifest, token)

    def _publish(self, manifest: dict, token: str) -> int:
        """Atomically publish a fully-built manifest (fsync'd temp +
        link(2); EEXIST = lost the optimistic-concurrency race)."""
        import time as _time

        new_version = manifest["version"]
        manifest["committed_at"] = _time.time()
        # per-writer txn ledger (r14, ADVICE r13 — Delta's txnAppId/
        # txnVersion): the parent's app→high-water map carries forward
        # on EVERY commit path (this is the single publish choke
        # point), and a commit stamped with txn_app advances only its
        # own writer's entry
        txn_app = manifest.pop("txn_app", None)
        parent = manifest.get("parent")
        txn = (
            dict(self.manifest_meta(parent).get("txn") or {})
            if parent is not None
            else {}
        )
        if txn_app is not None and manifest.get("batch_id") is not None:
            b = int(manifest["batch_id"])
            prev = txn.get(txn_app)
            if prev is None or b > prev:
                txn[txn_app] = b
        if txn:
            manifest["txn"] = {k: txn[k] for k in sorted(txn)}
        # CHECK constraints carry forward on every commit path unless
        # the commit sets them explicitly (add/drop/restore/clone);
        # an explicit EMPTY dict after drop-last stays empty
        if "constraints" not in manifest and parent is not None:
            pc = self.manifest_meta(parent).get("constraints")
            if pc:
                manifest["constraints"] = pc
        # stats_format 2 = r11+ timestamp kinds ('t' strictly UTC, 'tn'
        # naive). Manifests WITHOUT the marker may hold pre-r11 naive
        # values under kind 't'; files_for treats their datetime
        # predicates as unprunable (ADVICE r11) instead of mispruning
        # on a non-UTC driver.
        manifest.setdefault("stats_format", 2)
        # manifest_format 2 (r12): per-file bulk leaves the commit
        # JSON for content-addressed per-partition segments — publish
        # cost O(touched partitions), untouched segments dedupe to the
        # parent's files byte-for-byte
        meta = self._segment_manifest(manifest)
        tmp = os.path.join(self.commits_dir, f".tmp-{token}")
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
            fh.flush()
            os.fsync(fh.fileno())
        final = os.path.join(self.commits_dir, f"v{new_version:08d}.json")
        try:
            # link(2): atomic publish that FAILS if the version exists
            os.link(tmp, final)
        except FileExistsError as exc:
            raise CommitConflictError(
                f"version v{new_version} was committed concurrently"
            ) from exc
        finally:
            os.unlink(tmp)
        _fsync_file(self.commits_dir)
        return new_version

    def _scope_to_touched_partitions(
        self,
        spark: SparkSession,
        incoming: DataFrame,
        partition_by: str,
        manifest: dict,
        keys: list[str] | None = None,
    ) -> tuple[DataFrame, dict[str, list[str]], set[str], dict[str, list[str]]]:
        """Partition + FILE pruning for MERGE: returns (target
        restricted to the files the batch can touch, untouched
        partitions' file map to carry by reference, the touched value
        set, carried FILES within touched partitions).

        r12 (VERDICT r11 #2): within a touched partition, a file whose
        footer key stats provably cannot contain ANY incoming key is
        carried BY REFERENCE instead of read + rewritten — the same
        file-level rewrite pruning Delta's MERGE does, so a 1-row
        upsert into a wide partition rewrites O(matching files), not
        the partition. One aggregation job over the batch derives, per
        touched partition, each merge-key column's min/max + null flag
        (the driver collects O(touched partitions) rows — same bound
        as before); a candidate file is carried only when the stat
        check PROVES disjointness, and any uncertainty (missing stats,
        null incoming keys — eqNullSafe matches target nulls —
        timestamp keys, whose collect round-trip is DST-ambiguous)
        conservatively keeps the file in the rewrite set.

        r12 segmented manifests: ``manifest`` may be a format-2 META —
        only the TOUCHED partitions' segments are loaded (file lists,
        stats, DVs); untouched partitions come back as ``None`` carry
        entries, which :meth:`_commit_staged` turns into parent
        segment refs without ever parsing their file lists."""
        from pyspark.sql import functions as F

        if partition_by not in incoming.columns:
            raise ValueError(
                f"incoming batch lacks partition column {partition_by!r}"
            )
        schema = T.StructType.fromJson(json.loads(manifest["schema"]))
        idx = self._segment_index(manifest)
        by_ref = idx is not None
        data_keys = [
            k
            for k in (keys or [])
            if k != partition_by
            and k in incoming.columns
            and not isinstance(
                {f.name: f.dataType for f in schema.fields}.get(k),
                T.TimestampType,
            )
        ]
        aggs = []
        for k in data_keys:
            aggs.extend(
                [
                    F.min(F.col(k)).alias(f"__mn_{k}"),
                    F.max(F.col(k)).alias(f"__mx_{k}"),
                    F.max(F.col(k).isNull().cast("int")).alias(f"__nl_{k}"),
                ]
            )
        grouped = incoming.groupBy(
            F.col(partition_by).cast("string").alias("__p")
        )
        if aggs:
            rows = grouped.agg(*aggs).collect()
        else:
            # no usable non-partition merge key (keys == [partition_by],
            # or all keys timestamp-typed / absent from the batch):
            # partition-level scoping only — GroupedData.agg() rejects
            # an empty aggregate list, and count() keeps the same
            # one-row-per-touched-partition driver bound
            rows = grouped.count().collect()
        ranges = {r["__p"]: r.asDict() for r in rows}
        touched = set(ranges)
        if None in touched:
            raise ValueError(
                f"null partition values in batch column {partition_by!r}"
            )
        all_vals = set(idx) if by_ref else set(manifest["partitions"])
        if by_ref:
            # O(touched): only the touched partitions' segments load;
            # the rest carry as refs (None), never parsed
            prev_parts, stats, prev_dv = self._partition_slice(
                manifest, all_vals & touched
            )
            carry: dict[str, list[str] | None] = {
                v: None for v in all_vals - touched
            }
        else:
            prev_parts = {
                v: fl
                for v, fl in manifest["partitions"].items()
                if v in touched
            }
            stats = manifest.get("stats", {})
            prev_dv = manifest.get("dv", {})
            carry = {
                v: fl
                for v, fl in manifest["partitions"].items()
                if v not in touched
            }
        carry_files: dict[str, list[str]] = {}
        read_files: list[str] = []
        for val, fl in prev_parts.items():
            preds = []
            r = ranges[val]
            for k in data_keys:
                mn, mx = r[f"__mn_{k}"], r[f"__mx_{k}"]
                if r[f"__nl_{k}"] or mn is None or mx is None:
                    continue  # null keys present: unprunable on k
                if _stat_value(mn) is None or _stat_value(mx) is None:
                    continue  # unsupported stat type: unprunable on k
                preds.append((k, "between", (mn, mx)))
            if not preds:
                read_files.extend(fl)
                continue
            preds = _map_predicates(
                preds, manifest.get("column_mapping") or {}
            )
            kept = []
            for f in fl:
                if _file_matches(stats.get(f), preds):
                    read_files.append(f)
                else:
                    kept.append(f)
            if kept:
                carry_files[val] = sorted(kept)
        # DV-aware: a touched file's deleted rows must not resurrect
        # through the merge's rewrite of that partition
        target = self._read_files(
            spark, sorted(read_files), schema, dv=prev_dv,
            mapping=manifest.get("column_mapping"),
        )
        return target, carry, touched, carry_files

    def _scope_unpartitioned_files(
        self,
        spark: SparkSession,
        incoming: DataFrame,
        meta: dict,
        version: int,
        keys: list[str] | None,
    ) -> tuple[DataFrame, list[str] | None]:
        """File pruning for MERGE on an UNPARTITIONED store: the same
        footer-stat disjointness proof :meth:`_scope_to_touched_partitions`
        runs per touched partition, applied to the whole file set.
        Returns (target restricted to files the batch's key range can
        touch, files carried by reference — ``None`` when nothing is
        provably disjoint).

        r12 (closes the VERDICT r11 #2 corner): without this, an
        unpartitioned store fell back to a full-snapshot merge — a
        1-row upsert into a key-clustered 1 TB table rewrote every
        file. One single-row aggregation over the batch derives each
        merge key's min/max + null flag; a file is carried only when
        its stats PROVE no incoming key can live in it, with the same
        conservative keeps (missing stats, null keys, timestamp keys)
        as the partitioned path."""
        from pyspark.sql import functions as F

        schema = T.StructType.fromJson(json.loads(meta["schema"]))
        ftypes = {f.name: f.dataType for f in schema.fields}
        data_keys = [
            k
            for k in (keys or [])
            if k in incoming.columns
            and not isinstance(ftypes.get(k), T.TimestampType)
        ]
        idx = self._segment_index(meta)
        if idx is not None:
            parts, stats, dv = self._partition_slice(meta, set(idx))
            files = sorted(f for fl in parts.values() for f in fl)
        else:
            m = self.manifest(version)
            files = sorted(m["files"])
            stats = m.get("stats", {})
            dv = m.get("dv", {})
        preds = []
        if data_keys:
            aggs = []
            for k in data_keys:
                aggs.extend(
                    [
                        F.min(F.col(k)).alias(f"__mn_{k}"),
                        F.max(F.col(k)).alias(f"__mx_{k}"),
                        F.max(F.col(k).isNull().cast("int")).alias(
                            f"__nl_{k}"
                        ),
                    ]
                )
            r = incoming.agg(*aggs).first().asDict()
            for k in data_keys:
                mn, mx = r[f"__mn_{k}"], r[f"__mx_{k}"]
                if r[f"__nl_{k}"] or mn is None or mx is None:
                    continue  # null/absent keys: unprunable on k
                if _stat_value(mn) is None or _stat_value(mx) is None:
                    continue  # unsupported stat type: unprunable on k
                preds.append((k, "between", (mn, mx)))
        mapping = meta.get("column_mapping")
        if not preds:
            return (
                self._read_files(
                    spark, files, schema, dv=dv, mapping=mapping
                ),
                None,
            )
        preds = _map_predicates(preds, mapping or {})
        read_files: list[str] = []
        kept: list[str] = []
        for f in files:
            if _file_matches(stats.get(f), preds):
                read_files.append(f)
            else:
                kept.append(f)
        target = self._read_files(
            spark, read_files, schema, dv=dv, mapping=mapping
        )
        return target, (kept or None)

    def _merge_commutes(
        self,
        old_parent: int | None,
        new_parent: int,
        pb: str | None,
        touched: set[str] | None,
        keys: list[str] | None,
    ) -> bool:
        """True when the commits between ``old_parent`` and
        ``new_parent`` provably did not touch anything this merge READ:
        same schema / partition column / merge keys, and every touched
        partition's files AND their deletion vectors are identical in
        both manifests. Then the merge's staged output is valid against
        the new head too — the operations commute and the loser of the
        version race may rebase instead of recomputing (the same
        logical-conflict check Delta's commit protocol runs).

        Segment-aware (r12): only the TOUCHED partitions' segments of
        the two heads are loaded — the check is O(touched), and two
        heads sharing a partition's segment ref compare equal without
        either segment being parsed."""
        if old_parent is None or pb is None or touched is None:
            return False
        mold = self.manifest_meta(old_parent)
        mnew = self.manifest_meta(new_parent)

        def shape(schema_json: str):
            # names + types, nullability ignored: a merge commit often
            # relaxes nullable flags (count() output vs upsert union)
            # without changing what any reader plans — that must not
            # veto an otherwise-commuting rebase
            st = T.StructType.fromJson(json.loads(schema_json))
            return tuple((f.name, f.dataType.simpleString()) for f in st)

        if (
            mnew.get("partition_by") != pb
            or not self._meta_partitioned(mold)
            or not self._meta_partitioned(mnew)
            or shape(mnew["schema"]) != shape(mold["schema"])
            or mold.get("keys") != mnew.get("keys")
        ):
            return False
        io, inw = self._segment_index(mold), self._segment_index(mnew)
        if io is not None and inw is not None:
            # fast path: identical segment refs ⇒ identical files+DVs
            rest = {
                v
                for v in touched
                if io.get(v) is None
                or (io.get(v) or {}).get("ref")
                != (inw.get(v) or {}).get("ref")
            }
            if not rest:
                return True
        else:
            rest = set(touched)
        po, _so, dv_old = self._partition_slice(mold, rest)
        pn, _sn, dv_new = self._partition_slice(mnew, rest)
        for v in rest:
            fo = po.get(v, [])
            if fo != pn.get(v, []):
                return False
            if any(dv_old.get(f) != dv_new.get(f) for f in fo):
                return False
        return True

    def _meta_partitioned(self, meta: dict) -> bool:
        """Whether a commit JSON (either format) describes a
        partition-mapped snapshot."""
        if meta.get("manifest_format", 1) >= 2:
            return bool(meta.get("partitioned"))
        return "partitions" in meta

    def _merge_commit_with_retries(
        self,
        spark: SparkSession,
        prepare,
        op: str,
        keys: list[str],
        batch_id: int | None,
        optimize_write: bool,
        max_retries: int,
    ) -> int:
        """Shared MERGE commit driver (r11 — VERDICT r10 #5): stage
        the merged data once, then publish; on losing the version race,
        REBASE onto the new head when the interleaved commits touched
        disjoint partitions (zero recompute, zero rewrite — the staged
        files are carried as-is with the carry list re-derived from the
        new head), otherwise recompute the merge from the new snapshot.
        Both paths bounded by ``max_retries`` total."""
        latest = self.latest_version()
        merged, carry, pb, touched, carry_files = prepare(latest)
        staged = self._stage_snapshot_data(
            merged, pb, None, None, optimize_write, parent=latest
        )
        retries = 0
        while True:
            try:
                return self._commit_staged(
                    staged,
                    op=op,
                    parent=latest,
                    batch_id=batch_id,
                    partition_by=pb,
                    keys=keys,
                    carry_partitions=carry,
                    carry_files=carry_files,
                )
            except CommitConflictError:
                if retries >= max_retries:
                    raise
                retries += 1
                new_latest = self.latest_version()
                if batch_id is not None:
                    high = self.last_batch_id()
                    if high is not None and batch_id <= high:
                        # another instance already applied this batch
                        return new_latest
                if self._merge_commutes(latest, new_latest, pb, touched, keys):
                    # rebase: same staged data, carry list re-derived
                    # from the new head. carry_files stays VALID as-is:
                    # _merge_commutes proved every touched partition's
                    # files + DVs identical in both heads, and carried
                    # files live inside touched partitions by
                    # construction.
                    m2 = self.manifest_meta(new_latest)
                    idx2 = self._segment_index(m2)
                    if idx2 is not None:
                        carry = {v: None for v in idx2 if v not in touched}
                    else:
                        carry = {
                            v: fl
                            for v, fl in m2["partitions"].items()
                            if v not in touched
                        }
                    latest = new_latest
                    continue
                latest = new_latest
                merged, carry, pb, touched, carry_files = prepare(latest)
                staged = self._stage_snapshot_data(
                    merged, pb, None, None, optimize_write, parent=latest
                )

    def merge(
        self,
        spark: SparkSession,
        incoming: DataFrame,
        keys: list[str],
        batch_id: int | None = None,
        partition_by: str | None = None,
        schema_mode: str = "strict",
        optimize_write: bool = False,
        max_retries: int = 2,
    ) -> int:
        """Transactional keyed upsert (O-D3 on the commit log): read
        the latest snapshot, merge, publish as a new version with the
        read version pinned as the expected parent. No
        localCheckpoint needed — the snapshot being read is never the
        path being written, so the fallback's read-overwrite hazard
        is structurally gone. Replayed ``batch_id``s are skipped.

        r10 partition scoping: on a store committed with
        ``partition_by`` (or when the argument is passed), only the
        partitions present in ``incoming`` are read, merged, and
        rewritten; every untouched partition's files carry into the
        new manifest BY REFERENCE — byte-identical across versions,
        zero IO. Contract (same as the reference's per-date merge,
        main.py:137-161, and Delta's partition-pruned MERGE): the
        partition column must be functionally dependent on ``keys`` —
        a key can never move between partitions, otherwise its old row
        in an untouched partition would survive alongside the new one.

        r10 schema evolution: ``schema_mode="strict"`` (default) keeps
        the table schema fixed — incoming extra columns are dropped,
        missing ones raise. ``schema_mode="merge"`` evolves the table:
        new incoming columns append as NULLABLE, existing rows (and
        carried-by-reference partitions, whose files keep the old
        physical schema) read back as null for them; a same-name
        type conflict raises. Manifest schema becomes the union, so
        every read — snapshot, pruned, CDF — plans the evolved shape.

        r11 concurrency (VERDICT r10 #5): losing the version race no
        longer surfaces a :class:`CommitConflictError` immediately —
        when the interleaved commits touched DISJOINT partitions the
        merge REBASES its already-written data onto the new head (the
        operations commute: zero recompute, zero IO beyond a new
        manifest), otherwise it recomputes from the new snapshot; both
        bounded by ``max_retries`` before the error propagates.
        """
        if batch_id is not None:
            high = self.last_batch_id()
            if high is not None and batch_id <= high:
                return self.latest_version()  # checkpoint replay

        def prepare(latest):
            if latest is None:
                return incoming, None, partition_by, None, None
            meta = self.manifest_meta(latest)
            pb = (
                partition_by
                if partition_by is not None
                else meta.get("partition_by")
            )
            carry_files = None
            if pb is None or not self._meta_partitioned(meta):
                carry, touched = None, None
                if pb is None:
                    # unpartitioned store: file-granular scoping — only
                    # files whose key stats can intersect the batch are
                    # read/rewritten, the rest carry by reference
                    target, kept = self._scope_unpartitioned_files(
                        spark, incoming, meta, latest, keys
                    )
                    if kept:
                        carry_files = {"": kept}
                else:
                    # migration commit (partition_by passed onto an
                    # unpartitioned store): the NEW snapshot is laid
                    # out partitioned, so the full table rewrites once
                    # and every later merge prunes
                    target = self.read(spark, latest)
            else:
                target, carry, touched, carry_files = (
                    self._scope_to_touched_partitions(
                        spark, incoming, pb, meta, keys=keys
                    )
                )
            if schema_mode == "merge":
                union = _union_schema(target.schema, incoming.schema)
                merged = merge_upsert(
                    _align_to(target, union), _align_to(incoming, union), keys
                )
            else:
                merged = merge_upsert(
                    target, incoming.select(*target.columns), keys
                )
            return merged, carry, pb, touched, carry_files

        return self._merge_commit_with_retries(
            spark, prepare, "merge", keys, batch_id, optimize_write,
            max_retries,
        )

    def merge_cdc(
        self,
        spark: SparkSession,
        incoming: DataFrame,
        keys: list[str],
        op_col: str = "op",
        seq_col: str | None = None,
        batch_id: int | None = None,
        partition_by: str | None = None,
        schema_mode: str = "strict",
        optimize_write: bool = False,
        max_retries: int = 2,
    ) -> int:
        """CDC apply (upserts + tombstone deletes) as one transactional
        commit; same replay ledger, parent pinning, and (r11)
        rebase-or-recompute conflict retries as :meth:`merge`, and
        (r10) the same touched-partition scoping — a CDC row's
        partition value is in the batch whether it upserts or deletes,
        so pruning is exact under the partition∈key contract.
        ``schema_mode="merge"`` evolves the table additively, exactly
        as in :meth:`merge`."""
        if batch_id is not None:
            high = self.last_batch_id()
            if high is not None and batch_id <= high:
                return self.latest_version()

        def prepare(latest):
            data_cols = [
                c for c in incoming.columns if c != op_col and c != seq_col
            ]
            carry, touched, carry_files = None, None, None
            batch = incoming
            if latest is None:
                target = batch.select(*data_cols).limit(0)
                pb = partition_by
            else:
                meta = self.manifest_meta(latest)
                pb = (
                    partition_by
                    if partition_by is not None
                    else meta.get("partition_by")
                )
                if pb is None or not self._meta_partitioned(meta):
                    if pb is None:
                        # unpartitioned: file-granular scoping over the
                        # FULL batch (delete rows included), so a
                        # tombstone's file is always in the rewrite set
                        target, kept = self._scope_unpartitioned_files(
                            spark, batch, meta, latest, keys
                        )
                        if kept:
                            carry_files = {"": kept}
                    else:
                        target = self.read(spark, latest)
                else:
                    # the key-range scope sees the FULL batch (delete
                    # rows included), so a tombstone's file is always
                    # in the rewrite set
                    target, carry, touched, carry_files = (
                        self._scope_to_touched_partitions(
                            spark, batch, pb, meta, keys=keys
                        )
                    )
            if schema_mode == "merge":
                union = _union_schema(
                    target.schema, batch.select(*data_cols).schema
                )
                target = _align_to(target, union)
                batch = _align_to(
                    batch,
                    T.StructType(
                        list(union.fields)
                        + [
                            f
                            for f in batch.schema.fields
                            if f.name == op_col or f.name == seq_col
                        ]
                    ),
                )
                data_cols = union.fieldNames()
            merged = merge_upsert_cdc(
                target,
                batch.select(
                    *data_cols, op_col, *([seq_col] if seq_col else [])
                ),
                keys,
                op_col=op_col,
                seq_col=seq_col,
            )
            return merged, carry, pb, touched, carry_files

        return self._merge_commit_with_retries(
            spark, prepare, "merge_cdc", keys, batch_id, optimize_write,
            max_retries,
        )

    def overwrite_partitions(
        self,
        spark: SparkSession,
        df: DataFrame,
        partition_by: str | None = None,
    ) -> int:
        """Atomic dynamic-partition overwrite (r10): REPLACE exactly
        the partitions present in ``df``, carry every other partition
        by reference — the commit-log twin of
        ``spark.sql.sources.partitionOverwriteMode=dynamic``, minus
        the torn-write window (the swap is one manifest link). This is
        the natural sink for incremental rollup maintenance: recompute
        the touched partitions from the fact table, commit, done —
        never reads the previous snapshot at all."""
        latest = self.latest_version()
        if latest is None:
            if partition_by is None:
                raise ValueError(
                    "overwrite_partitions on an empty store needs partition_by"
                )
            return self.commit(
                df,
                op="overwrite_partitions",
                expect_version=None,
                partition_by=partition_by,
            )
        meta = self.manifest_meta(latest)
        pb = (
            partition_by
            if partition_by is not None
            else meta.get("partition_by")
        )
        if pb is None or not self._meta_partitioned(meta):
            raise ValueError(
                "overwrite_partitions requires a partitioned store "
                "(commit with partition_by first)"
            )
        from pyspark.sql import functions as F

        touched = {
            r.p
            for r in df.select(F.col(pb).cast("string").alias("p"))
            .distinct()
            .collect()
        }
        if None in touched:
            raise ValueError(f"null partition values in column {pb!r}")
        idx = self._segment_index(meta)
        if idx is not None:
            # untouched partitions carry as segment refs — the commit
            # never parses their file lists (O(touched) driver cost)
            carry = {v: None for v in idx if v not in touched}
        else:
            m = self.manifest(latest)
            carry = {
                v: fl
                for v, fl in m["partitions"].items()
                if v not in touched
            }
        return self.commit(
            df,
            op="overwrite_partitions",
            expect_version=latest,
            partition_by=pb,
            carry_partitions=carry,
        )

    # -- non-additive schema evolution (r13 — VERDICT r12 #6) ---------------

    def _metadata_only_commit(
        self,
        latest: int,
        meta: dict,
        *,
        op: str,
        schema: T.StructType,
        mapping: dict[str, str],
        retired: list[str] | None,
        partition_by: str | None,
        keys: list[str] | None,
        clustering: dict | None,
        constraints: dict[str, str] | None = None,
    ) -> int:
        """Publish a commit that changes ONLY table metadata: every
        data file (and DV, and per-file stats) carries from the parent
        by reference — on a segmented manifest the driver never parses
        a single file list, so a rename of a 10^6-file table costs one
        manifest write."""
        staged = {
            "token": uuid.uuid4().hex,
            "partitions": {},
            "files": [],
            "stats": {},
            "schema": schema.json(),
            "column_mapping": mapping,
            "retired_columns": retired,
        }
        carry_partitions: dict[str, list[str] | None] | None = None
        carry_files: dict[str, list[str]] | None = None
        if self._meta_partitioned(meta):
            idx = self._segment_index(meta)
            carry_partitions = (
                {v: None for v in idx}
                if idx is not None
                else {
                    v: list(fl)
                    for v, fl in self.manifest(latest)[
                        "partitions"
                    ].items()
                }
            )
        else:
            files = self.manifest(latest)["files"]
            if files:
                carry_files = {"": list(files)}
        return self._commit_staged(
            staged,
            op=op,
            parent=latest,
            partition_by=partition_by,
            keys=keys,
            carry_partitions=carry_partitions,
            carry_files=carry_files,
            clustering=clustering,
            constraints=constraints,
        )

    def rename_column(self, old: str, new: str) -> int:
        """Rename a column WITHOUT rewriting any data (Delta's
        column-mapping semantics, r13 — VERDICT r12 #6): the logical
        name changes in the table schema while every file keeps the
        column under its stable PHYSICAL name, recorded in the
        manifest's ``column_mapping``. Snapshot reads, pruned reads,
        DML, CDF and time travel all present the name each version
        declared; a change feed CROSSING the rename presents the
        column's full history under the END version's name (physical
        identity is the join). Metadata references (partition_by,
        merge keys, clustering) follow the rename. O(1) commit cost on
        segmented manifests — all data carries by reference."""
        latest = self.latest_version()
        if latest is None:
            raise FileNotFoundError(
                f"commit-log store at {self.path} is empty"
            )
        meta = self.manifest_meta(latest)
        schema = T.StructType.fromJson(json.loads(meta["schema"]))
        names = schema.fieldNames()
        if old not in names:
            raise ValueError(f"unknown column {old!r}; have {names}")
        if new in names:
            raise ValueError(f"column {new!r} already exists")
        if not new or "." in new:
            raise ValueError(f"invalid column name {new!r}")
        mapping = dict(meta.get("column_mapping") or {})
        phys = mapping.pop(old, old)
        if phys != new:
            mapping[new] = phys
        new_schema = T.StructType(
            [
                T.StructField(
                    new if f.name == old else f.name,
                    f.dataType,
                    f.nullable,
                    f.metadata,
                )
                for f in schema.fields
            ]
        )

        def ren(c: str) -> str:
            return new if c == old else c

        keys = meta.get("keys")
        clustering = meta.get("clustering")
        return self._metadata_only_commit(
            latest,
            meta,
            op="rename_column",
            schema=new_schema,
            mapping=mapping,
            retired=meta.get("retired_columns"),
            partition_by=(
                ren(meta["partition_by"])
                if meta.get("partition_by") is not None
                else None
            ),
            keys=[ren(k) for k in keys] if keys is not None else None,
            clustering=(
                {
                    v: (
                        {**t, "cols": [ren(c) for c in t["cols"]]}
                        if isinstance(t, dict)
                        else [ren(c) for c in t]
                    )
                    for v, t in clustering.items()
                }
                if clustering
                else None
            ),
        )

    def drop_column(self, name: str) -> int:
        """Drop a column WITHOUT rewriting any data (r13 — VERDICT
        r12 #6): the field leaves the table schema; its physical name
        is RETIRED in the manifest so a later re-added column of the
        same name gets a fresh physical slot and can never read the
        dropped bytes. The data remains in old files (time travel to
        pre-drop versions still presents it; physical erasure is a
        rewrite — :meth:`compact` — plus :meth:`vacuum`, the GDPR
        path). Refuses to drop the partition column, a merge key, or
        the last column."""
        latest = self.latest_version()
        if latest is None:
            raise FileNotFoundError(
                f"commit-log store at {self.path} is empty"
            )
        meta = self.manifest_meta(latest)
        schema = T.StructType.fromJson(json.loads(meta["schema"]))
        names = schema.fieldNames()
        if name not in names:
            raise ValueError(f"unknown column {name!r}; have {names}")
        if len(names) == 1:
            raise ValueError("cannot drop the last column")
        if meta.get("partition_by") == name:
            raise ValueError(
                f"{name!r} is the partition column; repartition via a "
                "full overwrite first"
            )
        if name in (meta.get("keys") or []):
            raise ValueError(
                f"{name!r} is a merge key; dropping it would break "
                "keyed merge and CDF classification"
            )
        mapping = dict(meta.get("column_mapping") or {})
        phys = mapping.pop(name, name)
        retired = sorted(
            set(meta.get("retired_columns") or []) | {phys}
        )
        new_schema = T.StructType(
            [f for f in schema.fields if f.name != name]
        )
        clustering = meta.get("clustering")
        kept_clustering = None
        if clustering:
            kept_clustering = {}
            for v, t in clustering.items():
                cols = t["cols"] if isinstance(t, dict) else t
                if name not in cols:
                    kept_clustering[v] = t
            # entries referencing the dropped column lose their layout
            # guarantee and are omitted
        return self._metadata_only_commit(
            latest,
            meta,
            op="drop_column",
            schema=new_schema,
            mapping=mapping,
            retired=retired,
            partition_by=meta.get("partition_by"),
            keys=meta.get("keys"),
            clustering=kept_clustering or None,
        )

    def restore(
        self, to_version: int | None = None, *, as_of: float | None = None
    ) -> int:
        """ROLLBACK as a forward commit (Delta's ``RESTORE TABLE ...
        VERSION AS OF`` — r14): publish a NEW version whose snapshot
        content — files, per-file stats, deletion vectors, schema,
        column mapping, retired slots, clustering, merge keys — is
        exactly the retained target version's. History is never
        rewritten (time travel to the undone versions still works, the
        audit trail shows the restore), and every data file carries by
        reference, so restoring a 10^6-file table costs one manifest
        write: on a segmented (format-2) partitioned target the
        partitions carry as the TARGET's content-addressed segment
        refs without their file lists ever parsing.

        The replay ledger is the one thing taken from the HEAD, not
        the target: ``last_batch_id`` and the per-writer ``txn`` map
        must keep their high-water marks, or a streaming writer would
        re-apply batches the restore rolled back and double them on
        the next epoch (Delta keeps txn actions across RESTORE for the
        same reason).

        Restoring to a version that vacuum has expired raises — the
        commit JSON is gone and its unshared files may be too.
        Vacuum-safety going forward is free: the restore commit itself
        references the files, so they are retained as long as it is.
        """
        if (to_version is None) == (as_of is None):
            raise ValueError("pass exactly one of to_version / as_of")
        if as_of is not None:
            to_version = self.version_as_of(as_of)
        try:
            tmeta = self.manifest_meta(to_version)
        except FileNotFoundError:
            raise ValueError(
                f"version v{to_version} is not retained in {self.path} "
                "(never committed, or expired by vacuum)"
            ) from None
        tidx = self._segment_index(tmeta)
        for _attempt in range(5):
            latest = self.latest_version()
            manifest = {
                "version": (latest or 0) + 1,
                "parent": latest,
                "op": "restore",
                "restore_of": to_version,
                "schema": tmeta["schema"],
                "batch_id": None,
                "last_batch_id": self.last_batch_id(),
                # carried stats keep the TARGET's stats_format: naive
                # pre-r11 timestamp stats must stay non-prunable
                "stats_format": tmeta.get("stats_format", 1),
            }
            for k in ("keys", "column_mapping", "retired_columns"):
                if tmeta.get(k) is not None:
                    manifest[k] = tmeta[k]
            # table metadata restores WITH the data (Delta RESTORE
            # semantics): explicit set blocks the head-carry in
            # _publish, so constraints added after the target vanish
            manifest["constraints"] = tmeta.get("constraints") or {}
            if tidx is not None and tmeta.get("partitioned"):
                # O(partitions): target segments carry by reference
                manifest["files"] = []
                manifest["partitions"] = {}
                manifest["stats"] = {}
                if tmeta.get("partition_by") is not None:
                    manifest["partition_by"] = tmeta["partition_by"]
                if tmeta.get("clustering"):
                    manifest["clustering"] = tmeta["clustering"]
                manifest["__carry_segments__"] = dict(tidx)
            else:
                full = self.manifest(to_version)
                manifest["files"] = list(full["files"])
                manifest["stats"] = dict(full.get("stats", {}))
                if full.get("dv"):
                    manifest["dv"] = dict(full["dv"])
                if "partitions" in full:
                    manifest["partitions"] = {
                        v: list(fl)
                        for v, fl in full["partitions"].items()
                    }
                    manifest["partition_by"] = full.get("partition_by")
                if full.get("clustering"):
                    manifest["clustering"] = full["clustering"]
            try:
                return self._publish(manifest, uuid.uuid4().hex)
            except CommitConflictError:
                if _attempt == 4:
                    raise
        raise AssertionError("unreachable")

    def clone(
        self,
        dest_path: str,
        version: int | None = None,
        *,
        as_of: float | None = None,
    ) -> "CommitLogStore":
        """Zero-copy CLONE of one retained snapshot into a NEW store
        (Delta's ``CREATE TABLE ... SHALLOW CLONE`` use case — r14:
        dev/test forks of a production table, reproducible experiment
        pins). Every data file and DV sidecar is ``link(2)``-ed into
        the destination (copy-on-cross-device fallback), so no table
        bytes are rewritten; the clone's v1 manifest carries the
        source snapshot's schema/stats/DVs/partitions/clustering/
        column-mapping verbatim under ``op="clone"`` with provenance
        in ``clone_of``.

        Hard links make the divergence guarantees STRONGER than a
        path-referencing shallow clone: both stores see immutable
        inodes, writes on either side only ever add new files, and a
        ``vacuum`` that unlinks a shared file on one side cannot free
        the other side's data (the inode lives until its last ref
        drops) — no cross-store vacuum protocol needed.

        The replay ledger does NOT carry (a clone is a new writer
        domain — Delta clones reset txn identity for the same reason);
        the clone starts at version 1 with an empty commit history of
        its own. Destination must be an empty store path."""
        if as_of is not None:
            if version is not None:
                raise ValueError("pass at most one of version / as_of")
            version = self.version_as_of(as_of)
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(
                f"commit-log store at {self.path} is empty"
            )
        try:
            meta = self.manifest_meta(v)
        except FileNotFoundError:
            raise ValueError(
                f"version v{v} is not retained in {self.path} "
                "(never committed, or expired by vacuum)"
            ) from None
        dest = CommitLogStore(dest_path)
        if os.path.realpath(dest.path) == os.path.realpath(self.path):
            raise ValueError("clone destination is the source store")
        if dest.latest_version() is not None:
            raise ValueError(
                f"clone destination {dest.path} is not empty "
                f"(at v{dest.latest_version()})"
            )
        full = self.manifest(v)
        import shutil as _shutil

        for rel in list(full["files"]) + list(
            (full.get("dv") or {}).values()
        ):
            src = os.path.join(self.path, rel)
            dst = os.path.join(dest.path, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            try:
                os.link(src, dst)
            except FileExistsError:
                pass  # idempotent retry after a crashed clone
            except OSError:
                # cross-device (EXDEV) or FS without hard links
                _shutil.copy2(src, dst)
        manifest = {
            "version": 1,
            "parent": None,
            "op": "clone",
            "clone_of": {"path": self.path, "version": v},
            "files": list(full["files"]),
            "schema": full["schema"],
            "batch_id": None,
            "last_batch_id": None,
            "stats": dict(full.get("stats", {})),
            "stats_format": meta.get("stats_format", 1),
        }
        if full.get("dv"):
            manifest["dv"] = dict(full["dv"])
        if "partitions" in full:
            manifest["partitions"] = {
                val: list(fl) for val, fl in full["partitions"].items()
            }
            manifest["partition_by"] = full.get("partition_by")
        for k in (
            "keys",
            "column_mapping",
            "retired_columns",
            "clustering",
            "constraints",
        ):
            if full.get(k) is not None:
                manifest[k] = full[k]
        dest._publish(manifest, uuid.uuid4().hex)
        return dest

    # -- bloom skipping (r14) ------------------------------------------------

    _BLOOM_TYPES = (
        T.ByteType,
        T.ShortType,
        T.IntegerType,
        T.LongType,
        T.StringType,
        T.DateType,
    )

    def build_bloom(
        self,
        spark: SparkSession,
        cols: list[str],
        fpp: float = 0.01,
        version: int | None = None,
    ) -> int:
        """Build per-file Bloom sidecars for EQUALITY skipping on
        ``cols`` (int/string/date families only — see
        ``sources/bloom.py`` for the design). Executors each read only
        their files' target columns; sidecars publish atomically from
        the tasks, so the driver never holds filter bytes. Immutable
        data files make this incremental for free: files already
        covered are skipped, files rewritten by DML lack sidecars
        until the next build (= never skipped, never stale). Returns
        the number of files indexed this call."""
        from calorista_spark.sources import bloom as _bloom

        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(
                f"commit-log store at {self.path} is empty"
            )
        meta = self.manifest_meta(v)
        schema = T.StructType.fromJson(json.loads(meta["schema"]))
        by_name = {f.name: f.dataType for f in schema.fields}
        for c in cols:
            if c not in by_name:
                raise ValueError(
                    f"unknown column {c!r}; have {schema.fieldNames()}"
                )
            if not isinstance(by_name[c], self._BLOOM_TYPES):
                raise ValueError(
                    f"bloom column {c!r} has type "
                    f"{by_name[c].simpleString()}; only int/string/"
                    "date families carry equality blooms"
                )
        mapping = meta.get("column_mapping") or {}
        phys = sorted(mapping.get(c, c) for c in cols)
        todo = [
            f
            for f in self.manifest(v)["files"]
            if not self._bloom_covers(f, phys)
        ]
        if todo:
            import pandas as _pd

            store_path = self.path
            fpp_ = fpp

            def _build(frames):
                done = []
                for pdf in frames:
                    for rel in pdf["file"]:
                        done.append(
                            _bloom.build_file_bloom(
                                store_path, rel, phys, fpp_
                            )
                        )
                yield _pd.DataFrame({"n_cols": done})

            n = (
                spark.createDataFrame(
                    [(f,) for f in todo], "file string"
                )
                .repartition(min(len(todo), 64))
                .mapInPandas(_build, "n_cols int")
                .count()
            )
            if n != len(todo):
                raise RuntimeError(
                    f"bloom build incomplete: {n}/{len(todo)} files"
                )
        # meta records PHYSICAL names: sidecars are keyed physical and
        # probes arrive physical (post _map_predicates), so renames
        # never invalidate the filters
        _bloom.write_meta(self.path, phys, fpp)
        self._bloom_meta_cache = None  # force re-read on next probe
        return len(todo)

    def _bloom_covers(self, file_rel: str, phys_cols: list[str]) -> bool:
        from calorista_spark.sources import bloom as _bloom

        sc = _bloom.load_sidecar(self.path, file_rel)
        return sc is not None and all(
            c in sc.get("cols", {}) for c in phys_cols
        )

    def _bloom_prune(
        self,
        files: list[str],
        preds: list[tuple],
        schema: T.StructType,
        mapping: dict[str, str] | None = None,
    ) -> tuple[list[str], int]:
        """(surviving files, n skipped) — consult Bloom sidecars for
        ``==`` / ``in`` predicates over covered columns. ``preds`` are
        already PHYSICAL-named (post ``_map_predicates``) and so is
        the bloom meta; the type gate keeps a probe whose literal type
        doesn't match the column family from ever voting
        (conservative)."""
        from calorista_spark.sources import bloom as _bloom

        bm = getattr(self, "_bloom_meta_cache", None)
        if bm is None:
            bm = _bloom.load_meta(self.path) or {}
            self._bloom_meta_cache = bm
        covered = set(bm.get("cols") or [])
        if not covered:
            return files, 0
        mp = mapping or {}
        by_name = {
            mp.get(f.name, f.name): f.dataType for f in schema.fields
        }

        def type_ok(col: str, v) -> bool:
            t = by_name.get(col)
            if isinstance(v, bool):
                return False
            if isinstance(
                t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
            ):
                return isinstance(v, int)
            if isinstance(t, T.StringType):
                return isinstance(v, str)
            if isinstance(t, T.DateType):
                return isinstance(v, datetime.date) and not isinstance(
                    v, datetime.datetime
                )
            return False

        probes = []
        for col, op, value in preds:
            if op not in ("==", "in") or col not in covered:
                continue
            vals = value if op == "in" else [value]
            if all(type_ok(col, v) for v in vals):
                probes.append((col, op, value))
        if not probes:
            return files, 0
        kept = [
            f
            for f in files
            if _bloom.probe_keep(
                self._bloom_sidecar_cached(f), probes
            )
        ]
        return kept, len(files) - len(kept)

    # -- CHECK constraints (r14) ---------------------------------------------

    def constraints(self) -> dict[str, str]:
        v = self.latest_version()
        if v is None:
            return {}
        return dict(self.manifest_meta(v).get("constraints") or {})

    def add_constraint(
        self, spark: SparkSession, name: str, expr: str
    ) -> int:
        """ALTER TABLE ... ADD CONSTRAINT name CHECK (expr) — Delta
        parity. The EXISTING data must already satisfy the expression
        (one pruned columnar scan proves it; a violating table refuses
        the constraint, exactly like Delta), then a metadata-only
        commit records it and every later write validates its NEW
        files before publish (:meth:`_validate_constraints`).
        SQL-standard tri-state: only FALSE violates, NULL passes —
        ``col IS NOT NULL`` expresses NOT NULL."""
        latest = self.latest_version()
        if latest is None:
            raise FileNotFoundError(
                f"commit-log store at {self.path} is empty"
            )
        from pyspark.sql import functions as F

        cons = self.constraints()
        if name in cons:
            raise ValueError(
                f"constraint {name!r} already exists: {cons[name]!r}"
            )
        bad = (
            self.read(spark)
            .filter(F.expr(f"({expr}) <=> FALSE"))
            .limit(1)
            .collect()
        )
        if bad:
            raise ConstraintViolationError(
                f"existing rows violate CHECK ({expr}); e.g. "
                f"{bad[0].asDict()}"
            )
        # cross-engine bindability gate: the Spark DataSource write
        # face commits from a session-less worker and enforces through
        # DuckDB (_duckdb_validate_files), so the expression must bind
        # there too — refused NOW, loudly, not silently unenforced on
        # one write path later. The portable comparison/boolean/
        # arithmetic/IS NULL subset covers real CHECK constraints.
        import duckdb

        con = duckdb.connect()
        try:
            con.register("t", self.read(spark).limit(0).toPandas())
            con.sql(f"SELECT (({expr}) IS FALSE) FROM t LIMIT 0")
        except duckdb.Error as e:
            raise ValueError(
                f"CHECK ({expr}) does not bind in DuckDB, which "
                "enforces the Spark write face; use the portable "
                f"expression subset ({e})"
            ) from None
        finally:
            con.close()
        cons[name] = expr
        return self._constraints_commit(latest, cons, op="add_constraint")

    def drop_constraint(self, name: str) -> int:
        latest = self.latest_version()
        if latest is None:
            raise FileNotFoundError(
                f"commit-log store at {self.path} is empty"
            )
        cons = self.constraints()
        if name not in cons:
            raise ValueError(
                f"unknown constraint {name!r}; have {sorted(cons)}"
            )
        del cons[name]
        return self._constraints_commit(
            latest, cons, op="drop_constraint"
        )

    def _constraints_commit(
        self, latest: int, cons: dict[str, str], *, op: str
    ) -> int:
        """Metadata-only commit that SETS the constraints map (carried
        files by reference, like rename/drop column)."""
        meta = self.manifest_meta(latest)
        schema = T.StructType.fromJson(json.loads(meta["schema"]))
        v = self._metadata_only_commit(
            latest,
            meta,
            op=op,
            schema=schema,
            mapping=dict(meta.get("column_mapping") or {}),
            retired=meta.get("retired_columns"),
            partition_by=meta.get("partition_by"),
            keys=meta.get("keys"),
            clustering=meta.get("clustering"),
            constraints=cons,
        )
        return v

    def _validate_constraints(
        self,
        spark: SparkSession,
        files: list[str],
        schema: T.StructType,
        mapping: dict[str, str] | None,
        cons: dict[str, str],
    ) -> None:
        """Abort-before-publish gate: scan the freshly STAGED files
        (columnar, pruned to the constraint columns, early-exit on
        first hit) rather than re-running the caller's upstream plan a
        second time. Orphaned files of an aborted commit are vacuum's
        normal prey."""
        if not cons or not files:
            return
        from pyspark.sql import functions as F

        viol = " OR ".join(
            f"(({e}) <=> FALSE)" for e in cons.values()
        )
        bad = (
            self._read_files(spark, files, schema, mapping=mapping)
            .filter(F.expr(viol))
            .limit(1)
            .collect()
        )
        if bad:
            raise ConstraintViolationError(
                "write violates CHECK constraint(s) "
                f"{sorted(cons)}; e.g. {bad[0].asDict()}"
            )

    def _bloom_sidecar_cached(self, file_rel: str) -> dict | None:
        from calorista_spark.sources import bloom as _bloom

        cache = getattr(self, "_bloom_sidecar_cache", None)
        if cache is None:
            cache = self._bloom_sidecar_cache = {}
        if file_rel not in cache:
            if len(cache) >= 4096:
                cache.clear()
            cache[file_rel] = _bloom.load_sidecar(self.path, file_rel)
        return cache[file_rel]

    def _build_dv_artifacts(
        self,
        spark: SparkSession,
        files: list[str],
        schema: T.StructType,
        residual,
        prev_dv: dict[str, str],
        token: str,
        cow_threshold: float | None,
        stats: dict,
    ) -> list[dict]:
        """Executor-side deletion-vector construction (r11 — VERDICT
        r10 #1, replacing the driver-side position collect): scan the
        candidate files under ``residual``, group the matching row
        positions BY FILE, and let each task write its file's merged DV
        sidecar directly — the driver receives exactly ONE summary row
        per touched file (rel path, dv path, live-match count, total
        mask size, copy-on-write verdict), never the positions
        themselves. A DELETE matching 1% of a 100 TB table therefore
        materializes O(touched files) on the driver, not O(deleted
        rows); per-TASK memory is bounded by one file's positions
        (files are bin-packed toward target_file_bytes, so a few
        million positions at most — the same boundedness Delta's DV
        writer has).

        Each task also dedups against the file's EXISTING deletion
        vector (read task-side from shared storage), so already-deleted
        rows neither re-delete nor re-update, and decides copy-on-write
        per file: when the merged mask would exceed ``cow_threshold``
        of the file's rows, no DV is written and the caller rewrites
        the file instead (Delta's DV-vs-rewrite tradeoff). DV writes
        are tempfile + rename with a name deterministic in (commit
        token, file), so task retries / speculative execution are
        idempotent."""
        import pandas as pd  # noqa: F401 — worker-side dependency

        root = os.path.abspath(self.path)
        # executor-side callbacks must resolve sidecars against the
        # ABSOLUTE store root: a task's cwd need not be the driver's
        store_path = root
        dv_map = {f: prev_dv[f] for f in files if f in prev_dv}
        rows_map = {
            f: (stats.get(f) or {}).get("rows") for f in files
        }
        tracked = set(files)
        os.makedirs(os.path.join(self.data_dir, token), exist_ok=True)

        def _one_file(pdf):
            import hashlib as _hashlib
            import os as _os

            import pandas as _pd

            apath = pdf["__path"].iloc[0]
            rel = _os.path.relpath(apath, root)
            if rel not in tracked:
                raise RuntimeError(f"DML scan hit untracked file {rel}")
            existing: set[int] = set()
            if rel in dv_map:
                with open(_os.path.join(store_path, dv_map[rel]), "rb") as fh:
                    existing = {int(p) for p in _decode_dv(fh.read())}
            new = {int(p) for p in pdf["__pos"]} - existing
            merged = existing | new
            n_rows = rows_map.get(rel)
            cow = bool(
                new
                and cow_threshold is not None
                and n_rows
                and len(merged) > cow_threshold * n_rows
            )
            dv_rel = None
            if new and not cow:
                name = (
                    "dv-" + _hashlib.sha1(rel.encode()).hexdigest()[:20] + ".bin"
                )
                dv_rel = _os.path.join("data", token, name)
                final = _os.path.join(store_path, dv_rel)
                tmp = final + ".tmp-" + _os.urandom(6).hex()
                with open(tmp, "wb") as fh:
                    fh.write(_encode_dv(merged))
                    fh.flush()
                    _os.fsync(fh.fileno())
                _os.replace(tmp, final)  # atomic: retries are idempotent
            return _pd.DataFrame(
                [
                    {
                        "rel": rel,
                        "dv_rel": dv_rel,
                        "n_new": len(new),
                        "n_total": len(merged),
                        "cow": cow,
                    }
                ]
            )

        out = (
            self._dml_position_scan(spark, files, schema, residual)
            .groupBy("__path")
            .applyInPandas(
                _one_file,
                "rel string, dv_rel string, n_new long, n_total long, "
                "cow boolean",
            )
            .collect()
        )
        return [r.asDict() for r in out]

    def _dml_position_scan(
        self, spark: SparkSession, files: list[str], schema: T.StructType, residual
    ) -> DataFrame:
        """(__path, __pos) of the rows in ``files`` matching
        ``residual``: decoded absolute file path + row position. The
        ``_metadata.file_path`` URI is percent-DECODED JVM-side
        (protecting literal ``+``, which a file URI never encodes) so
        paths with spaces / unicode / URI-special characters compare
        equal to their on-disk manifest form (ADVICE r10)."""
        from pyspark.sql import functions as F

        return (
            spark.read.schema(schema)
            .parquet(*[os.path.join(self.path, f) for f in files])
            .filter(residual)
            .select(
                _decoded_path_col().alias("__path"),
                F.col("_metadata.row_index").alias("__pos"),
            )
        )

    def _write_dml_files(
        self,
        df: DataFrame,
        m: dict,
        token: str,
        subdir: str,
        coalesce_partitions: bool = True,
        validate: bool = False,
    ) -> tuple[dict[str, list[str]], list[str], dict[str, dict]]:
        """Write DML result rows under ``data/<token>/<subdir>`` —
        hive-laid-out per partition value when the store is partitioned.
        ``coalesce_partitions=True`` (the sparse-DML append shape)
        hash-shuffles rows to their partition value first so each
        touched partition gets ONE appended file; pass ``False`` for
        copy-on-write rewrites — a broad rewrite must not pay a full
        shuffle of the surviving data, and writing from the scan tasks
        directly keeps ~one output file per rewritten input file
        (:meth:`compact` bin-packs later if needed). Returns (partition
        value → new files, all new files, footer stats per new file);
        zero-row outputs are dropped."""
        from urllib.parse import unquote

        from pyspark.sql import functions as F

        ddir = os.path.join(self.data_dir, token, subdir)
        pb = m.get("partition_by")
        # DML frames arrive LOGICAL; files are written physical (r13
        # column mapping — the __part shadow derives from the logical
        # name first, then the projection renames the payload)
        mapping = m.get("column_mapping") or {}
        new_parts: dict[str, list[str]] = {}
        if pb is not None and self._meta_partitioned(m):
            staged = df.withColumn("__part", F.col(pb).cast("string"))
            staged = _to_physical(staged, mapping)
            if coalesce_partitions:
                staged = staged.repartition(F.col("__part"))
            staged.write.mode("error").partitionBy("__part").parquet(ddir)
            for sub in sorted(os.listdir(ddir)):
                if not sub.startswith("__part="):
                    continue
                val = unquote(sub[len("__part=") :])
                if val == "__HIVE_DEFAULT_PARTITION__":
                    raise ValueError(
                        f"DML produced a null/empty partition value on {pb!r}"
                    )
                fl = sorted(
                    os.path.join("data", token, subdir, sub, f)
                    for f in os.listdir(os.path.join(ddir, sub))
                    if f.endswith(".parquet")
                )
                if fl:
                    new_parts[val] = fl
        else:
            df = _to_physical(df, mapping)
            if coalesce_partitions:
                df = df.coalesce(1)
            df.write.mode("error").parquet(ddir)
            fl = sorted(
                os.path.join("data", token, subdir, f)
                for f in os.listdir(ddir)
                if f.endswith(".parquet")
            )
            if fl:
                new_parts[""] = fl
        stats: dict[str, dict] = {}
        for val in sorted(new_parts):
            kept = []
            for f in new_parts[val]:
                st = _parquet_file_stats(os.path.join(self.path, f))
                if st["rows"] == 0:  # all rows of this slice vanished
                    os.unlink(os.path.join(self.path, f))
                    continue
                stats[f] = st
                kept.append(f)
            new_parts[val] = kept
        new_parts = {v: fl for v, fl in new_parts.items() if fl}
        files = sorted(f for fl in new_parts.values() for f in fl)
        for f in files:
            _fsync_file(os.path.join(self.path, f))
        if validate:
            # DML paths that MODIFY rows (update/merge) gate their new
            # files on the table's CHECK constraints; pure-survivor
            # rewrites (CoW delete, purge_dv) pass validate=False —
            # rows that entered under the constraints cannot start
            # violating them by being copied
            self._validate_constraints(
                df.sparkSession,
                files,
                T.StructType.fromJson(json.loads(m["schema"])),
                mapping,
                m.get("constraints") or {},
            )
        return new_parts, files, stats

    def _publish_dml(
        self,
        latest: int,
        meta: dict,
        token: str,
        *,
        op: str,
        batch_id: int | None,
        removed: set[str],
        new_parts: dict[str, list[str]],
        new_stats: dict[str, dict],
        dv_updates: dict[str, str],
        file_part: dict[str, str] | None,
    ) -> int:
        """Compose and publish the manifest of a DELETE/UPDATE/REORG
        commit. ``removed`` = copy-on-write-replaced files,
        ``new_parts``/``new_stats`` = appended or rewritten output
        (keyed ``""`` on unpartitioned stores), ``dv_updates`` = new
        deletion-vector sidecars for surviving files, ``file_part`` =
        partition of every file in removed/dv_updates (from
        :meth:`_files_for_pruned`).

        On segmented manifests the composition is O(affected
        partitions): only segments holding a removed/DV-updated file
        or receiving output are loaded and recomposed; every other
        partition carries as the parent's segment ref — the driver
        never parses the rest of a 10^6-file table (VERDICT r11 #4).
        Format-1 manifests fall back to full composition."""
        prev_last_batch = meta.get("last_batch_id")
        last_batch = (
            batch_id
            if batch_id is not None
            and (prev_last_batch is None or batch_id > prev_last_batch)
            else prev_last_batch
        )
        new_files = sorted(f for fl in new_parts.values() for f in fl)
        idx = self._segment_index(meta)
        if idx is None or file_part is None:
            m = self.manifest(latest)
            stats = {
                f: st
                for f, st in m.get("stats", {}).items()
                if f not in removed
            }
            stats.update(new_stats)
            new_dv = {
                f: p
                for f, p in m.get("dv", {}).items()
                if f not in removed
            }
            new_dv.update(dv_updates)
            manifest = {
                "version": latest + 1,
                "parent": latest,
                "op": op,
                "files": sorted(
                    [f for f in m["files"] if f not in removed] + new_files
                ),
                "schema": m["schema"],
                "batch_id": batch_id,
                "last_batch_id": last_batch,
                "stats": {f: stats[f] for f in sorted(stats)},
            }
            if new_dv:
                manifest["dv"] = {f: new_dv[f] for f in sorted(new_dv)}
            for k in ("partition_by", "keys"):
                if k in m:
                    manifest[k] = m[k]
            for k in ("column_mapping", "retired_columns"):
                if k in meta:
                    manifest[k] = meta[k]
            if "partitions" in m:
                manifest["partitions"] = _reshape_partitions(
                    m["partitions"], removed, new_parts
                )
            if "clustering" in m:
                kept = _clustering_after_dml(m, removed, new_parts)
                if kept:
                    manifest["clustering"] = kept
            if any(f not in removed for f in m.get("stats", {})):
                # surviving files keep parent-era stats: propagate the
                # parent's stats_format so pre-r11 naive timestamp
                # stats never get re-marked prunable (see _commit_staged)
                manifest["stats_format"] = meta.get("stats_format", 1)
            return self._publish(manifest, token)
        affected = {file_part[f] for f in removed | set(dv_updates)} | set(
            new_parts
        )
        parts_slice, stats_slice, dv_slice = self._partition_slice(
            meta, affected
        )
        partitioned = self._meta_partitioned(meta)
        files: list[str] = []
        stats: dict[str, dict] = {}
        dv: dict[str, str] = {}
        out_parts: dict[str, list[str]] = {}
        voided: set[str] = set()
        carried_old_stats = False
        for val in sorted(affected):
            old_fl = parts_slice.get(val, [])
            fl = sorted(
                [f for f in old_fl if f not in removed]
                + list(new_parts.get(val, []))
            )
            if (removed & set(old_fl)) or new_parts.get(val):
                voided.add(val)  # file set changed: layout guarantee gone
            if not fl:
                continue  # partition emptied out entirely
            out_parts[val] = fl
            files.extend(fl)
            for f in fl:
                st = new_stats.get(f)
                if st is None:
                    st = stats_slice.get(f)
                    if st is not None:
                        carried_old_stats = True
                if st is not None:
                    stats[f] = st
                d = dv_updates.get(f) or dv_slice.get(f)
                if d is not None:
                    dv[f] = d
        manifest = {
            "version": latest + 1,
            "parent": latest,
            "op": op,
            "files": sorted(files),
            "schema": meta["schema"],
            "batch_id": batch_id,
            "last_batch_id": last_batch,
            "stats": {f: stats[f] for f in sorted(stats)},
        }
        if dv:
            manifest["dv"] = {f: dv[f] for f in sorted(dv)}
        for k in ("partition_by", "keys", "column_mapping", "retired_columns"):
            if k in meta:
                manifest[k] = meta[k]
        if partitioned:
            manifest["partitions"] = out_parts
        clustering = meta.get("clustering", {})
        kept = {v: cl for v, cl in clustering.items() if v not in voided}
        if kept:
            manifest["clustering"] = kept
        carry_refs = {v: idx[v] for v in idx if v not in affected}
        if carry_refs:
            manifest["__carry_segments__"] = carry_refs
        if carry_refs or carried_old_stats:
            manifest["stats_format"] = meta.get("stats_format", 1)
        return self._publish(manifest, token)

    def delete_where(
        self,
        spark: SparkSession,
        predicates: list[tuple],
        batch_id: int | None = None,
        cow_threshold: float | None = 0.5,
    ) -> int:
        """Merge-on-read row deletion (r10; r11 — VERDICT r10 #1/#2):
        delete every row matching ``predicates`` (same grammar as
        :meth:`files_for`). Per touched file, the commit either updates
        its deletion vector (sparse case) or — when the merged mask
        would exceed ``cow_threshold`` of the file's rows — rewrites
        the file copy-on-write without the deleted rows (Delta's
        DV-vs-rewrite tradeoff; ``cow_threshold=None`` forces pure DV,
        ``0.0`` forces rewrite). Every read path masks DV positions
        from then on, and :meth:`compact` later purges them into clean
        files.

        Cost model (why this is the 100 TB erasure path): planning
        prunes to the stat-matching files, the scan reads only those,
        DV bitmaps are built and written EXECUTOR-side (one task per
        touched file — see :meth:`_build_dv_artifacts`), and the driver
        materializes one summary row per touched file — O(touched
        files), never O(deleted rows). A delete matching a large
        fraction of every file degrades gracefully into a distributed
        rewrite via the copy-on-write path instead of growing
        table-sized bitmaps.

        Returns the new version; if nothing matched, returns the
        current version and writes NO commit."""
        from functools import reduce

        from pyspark.sql import functions as F

        if not predicates:
            raise ValueError(
                "predicates must be non-empty; refusing an implicit "
                "full-table delete"
            )
        latest = self.latest_version()
        if latest is None:
            raise FileNotFoundError(f"commit-log store at {self.path} is empty")
        if batch_id is not None:
            high = self.last_batch_id()
            if high is not None and batch_id <= high:
                return latest
        meta = self.manifest_meta(latest)
        schema = T.StructType.fromJson(json.loads(meta["schema"]))
        # segment-selective planning: candidates, their DVs, their row
        # counts and their partitions all come from the matching
        # segments — never the full manifest
        cand, cand_dv, cand_stats, file_part = self._files_for_pruned(
            predicates, version=latest
        )
        if not cand:
            return latest
        mapping = meta.get("column_mapping") or {}
        residual = reduce(
            lambda a, b: a & b,
            [_predicate_column(c, op, val) for c, op, val in predicates],
        )
        # the position scan reads raw files (physical column names);
        # its residual must reference them directly (r13 mapping)
        residual_phys = reduce(
            lambda a, b: a & b,
            [
                _predicate_column(c, op, val)
                for c, op, val in _map_predicates(predicates, mapping)
            ],
        )
        token = uuid.uuid4().hex
        summaries = self._build_dv_artifacts(
            spark, cand, _physical_struct(schema, mapping),
            residual_phys, cand_dv, token, cow_threshold, cand_stats,
        )
        touched = [s for s in summaries if s["n_new"] > 0]
        if not touched:
            return latest  # nothing LIVE matched: no commit
        cow_files = sorted(s["rel"] for s in touched if s["cow"])
        dv_updates = {
            s["rel"]: s["dv_rel"] for s in touched if not s["cow"]
        }
        new_parts: dict[str, list[str]] = {}
        new_stats: dict[str, dict] = {}
        if cow_files:
            # survivors = rows where the predicate is NOT true (a null
            # predicate keeps the row, matching the DV path's filter)
            keep = ~F.coalesce(residual, F.lit(False))
            surv = self._read_files(
                spark, cow_files, schema, dv=cand_dv, mapping=mapping
            ).filter(keep)
            new_parts, _new_files, new_stats = self._write_dml_files(
                surv, meta, token, "rw", coalesce_partitions=False
            )
        return self._publish_dml(
            latest,
            meta,
            token,
            op="delete",
            batch_id=batch_id,
            removed=set(cow_files),
            new_parts=new_parts,
            new_stats=new_stats,
            dv_updates=dv_updates,
            file_part=file_part,
        )

    def update_where(
        self,
        spark: SparkSession,
        predicates: list[tuple],
        assignments: dict,
        batch_id: int | None = None,
        cow_threshold: float | None = 0.5,
    ) -> int:
        """Merge-on-read UPDATE (r10; r11 — VERDICT r10 #1/#2): set
        ``assignments`` (column → Column expression or literal) on
        every row matching ``predicates``, as ONE commit. Per touched
        file, either the old row positions are masked via an
        executor-built deletion vector and the updated rows APPEND as
        new files (sparse case — no matching file rewritten), or —
        when the merged mask would exceed ``cow_threshold`` of the
        file's rows — the file is rewritten copy-on-write with the
        assignments applied in place (``cow_threshold=None`` forces
        pure DV, ``0.0`` forces rewrite). The DML trio is thus
        complete: INSERT (:meth:`commit` / :meth:`merge`), DELETE
        (:meth:`delete_where`), UPDATE (here) — all atomic, all
        CDF-visible (the change feed classifies these commits as
        update pre/post pairs through the keyed row-hash join, or
        delete+insert if an assignment moves a key). An assignment may
        change the partition column: the updated row lands under its
        NEW partition value.

        Scale: like :meth:`delete_where`, the driver materializes one
        summary row per touched file — never the matched positions —
        so a broad UPDATE against a 100 TB table stays executor-bound.

        Returns the new version; no matches → current version, no
        commit."""
        from functools import reduce

        from pyspark.sql import Column
        from pyspark.sql import functions as F

        if not predicates:
            raise ValueError(
                "predicates must be non-empty; refusing an implicit "
                "full-table update"
            )
        latest = self.latest_version()
        if latest is None:
            raise FileNotFoundError(f"commit-log store at {self.path} is empty")
        if batch_id is not None:
            high = self.last_batch_id()
            if high is not None and batch_id <= high:
                return latest
        meta = self.manifest_meta(latest)
        schema = T.StructType.fromJson(json.loads(meta["schema"]))
        by_type = {f.name: f.dataType for f in schema.fields}
        for c in assignments:
            if c not in by_type:
                raise ValueError(f"unknown column {c!r} in assignments")
        cand, dv_prev, cand_stats, file_part = self._files_for_pruned(
            predicates, version=latest
        )
        if not cand:
            return latest
        mapping = meta.get("column_mapping") or {}
        residual = reduce(
            lambda a, b: a & b,
            [_predicate_column(c, op, val) for c, op, val in predicates],
        )
        residual_phys = reduce(
            lambda a, b: a & b,
            [
                _predicate_column(c, op, val)
                for c, op, val in _map_predicates(predicates, mapping)
            ],
        )
        token = uuid.uuid4().hex
        summaries = self._build_dv_artifacts(
            spark, cand, _physical_struct(schema, mapping),
            residual_phys, dv_prev, token, cow_threshold, cand_stats,
        )
        touched = [s for s in summaries if s["n_new"] > 0]
        if not touched:
            return latest  # nothing LIVE matched: no commit
        cow_files = sorted(s["rel"] for s in touched if s["cow"])
        dv_files = sorted(s["rel"] for s in touched if not s["cow"])
        dv_updates = {
            s["rel"]: s["dv_rel"] for s in touched if not s["cow"]
        }

        def _assigned(f: T.StructField):
            v = assignments[f.name]
            e = v if isinstance(v, Column) else F.lit(v)
            return e.cast(f.dataType)

        new_parts: dict[str, list[str]] = {}
        new_stats: dict[str, dict] = {}
        if dv_files:
            # sparse path: the masked rows re-append with assignments
            # applied (existing DVs respected — a previously deleted
            # row neither re-emits nor resurrects)
            matching = self._read_files(
                spark, dv_files, schema, dv=dv_prev, mapping=mapping
            ).filter(residual)
            updated = matching.select(
                *[
                    (
                        _assigned(f).alias(f.name)
                        if f.name in assignments
                        else F.col(f.name)
                    )
                    for f in schema.fields
                ]
            )
            new_parts, _nf, new_stats = self._write_dml_files(
                updated, meta, token, "upd", validate=True
            )
        if cow_files:
            # copy-on-write path: rewrite the whole file, assignments
            # applied in place on the matching rows (null predicate →
            # row kept unchanged, matching the sparse path's filter)
            cond = F.coalesce(residual, F.lit(False))
            rewritten = self._read_files(
                spark, cow_files, schema, dv=dv_prev, mapping=mapping
            ).select(
                *[
                    (
                        F.when(cond, _assigned(f))
                        .otherwise(F.col(f.name))
                        .alias(f.name)
                        if f.name in assignments
                        else F.col(f.name)
                    )
                    for f in schema.fields
                ]
            )
            parts_rw, _files_rw, stats_rw = self._write_dml_files(
                rewritten, meta, token, "rw",
                coalesce_partitions=False, validate=True,
            )
            for val, fl in parts_rw.items():
                new_parts[val] = sorted(new_parts.get(val, []) + fl)
            new_stats.update(stats_rw)
        return self._publish_dml(
            latest,
            meta,
            token,
            op="update",
            batch_id=batch_id,
            removed=set(cow_files),
            new_parts=new_parts,
            new_stats=new_stats,
            dv_updates=dv_updates,
            file_part=file_part,
        )

    # -- change data feed (r10) ----------------------------------------------

    # deletion-vector anti-join frames whose sidecars total at most
    # this many bytes get a broadcast hint (the sparse-delete fast
    # path: zero shuffle of the data table); larger delete sets join
    # distributed (SMJ/shuffled-hash under AQE) — the driver never
    # holds positions either way, only O(files) path metadata.
    dv_broadcast_bytes: int = 8 << 20
    # distributed DV decode emits positions in Arrow batches of this
    # many entries (~8 MB of int64 each): task memory stays O(chunk)
    # even for a sidecar carrying hundreds of millions of positions
    dv_decode_chunk: int = 1 << 20

    def _read_files(
        self,
        spark: SparkSession,
        files: list[str],
        schema: T.StructType,
        dv: dict[str, str] | None = None,
        mapping: dict[str, str] | None = None,
    ) -> DataFrame:
        """Plan a read of ``files``; files with a deletion vector in
        ``dv`` get their deleted positions anti-joined out via
        ``_metadata.row_index``. DV-free files keep the plain fast
        path: no metadata column, no join.

        r12 (VERDICT r11 #1): DV sidecars are decoded EXECUTOR-side —
        the driver builds only an O(touched files) (data path, sidecar
        path) pairing; each task opens its sidecar from shared storage
        (exactly as the write side's :meth:`_build_dv_artifacts` does)
        and explodes the positions. ``cow_threshold=0.5`` legally lets
        DVs reach 50% of every file between compactions, so at 100 TB
        the delete set can be billions of rows — the r11 driver decode
        + forced broadcast was the one remaining read-path scale
        killer. The anti-join is broadcast-HINTED only while the
        sidecar byte total stays under :attr:`dv_broadcast_bytes`
        (driver-side ``getsize`` metadata, never content); past it the
        join runs distributed."""
        from pyspark.sql import functions as F

        if not files:
            return spark.createDataFrame([], schema)
        # files are written under PHYSICAL column names (stable across
        # rename/drop — r13 column mapping); plan physical, present
        # logical at the end
        pschema = _physical_struct(schema, mapping or {})
        pcols = pschema.fieldNames()
        # absolute root: the DV anti-join matches _metadata.file_path
        # (always fully qualified) against driver-built paths, and a
        # relative self.path would make the two sides diverge
        root = os.path.abspath(self.path)
        dv = {f: p for f, p in (dv or {}).items() if f in set(files)}
        plain = [f for f in files if f not in dv]
        frames: list[DataFrame] = []
        if plain:
            frames.append(
                spark.read.schema(pschema).parquet(
                    *[os.path.join(root, f) for f in plain]
                )
            )
        if dv:
            dvdf = self._dv_frame(spark, dv)
            live = (
                spark.read.schema(pschema)
                .parquet(*[os.path.join(root, f) for f in dv])
                .withColumn("__path", _decoded_path_col())
                .withColumn("__pos", F.col("_metadata.row_index"))
                .join(
                    dvdf,
                    (F.col("__path") == F.col("__dv_path"))
                    & (F.col("__pos") == F.col("__dv_pos")),
                    "left_anti",
                )
                .select(*pcols)
            )
            frames.append(live)
        out = frames[0]
        for fr in frames[1:]:
            out = out.unionByName(fr)
        if mapping:
            out = out.select(
                *[
                    F.col(p).alias(l)
                    for p, l in zip(pcols, schema.fieldNames())
                ]
            )
        return out

    def _dv_frame(self, spark: SparkSession, dv: dict[str, str]) -> DataFrame:
        """The deleted-position frame ``(__dv_path, __dv_pos)`` for a
        file→sidecar map. ADAPTIVE (r12 bench): when the total sidecar
        byte size (driver-side ``getsize`` metadata) is under
        :attr:`dv_broadcast_bytes`, the driver decodes the sidecars
        itself and broadcasts the position frame — bounded by the byte
        cap, pure-JVM join, no Python workers (Delta ships small DVs
        the same way; the 8 MB default decodes in milliseconds while
        the executor path costs ~2 s of Arrow/worker spin-up on an
        otherwise sub-second read). Past the cap, executor tasks
        decode their slice of sidecars: the driver ships only path
        pairs and the anti-join runs distributed — the delete set is
        never materialized on the driver (VERDICT r11 #1; the 100 TB
        path). Set ``dv_broadcast_bytes = 0`` to force the distributed
        path (store_dv_heavy_read and the DV smoke pin its plan)."""
        from pyspark.sql import functions as F

        # abspath BOTH sides: the sidecar path is opened inside an
        # executor task whose cwd need not be the driver's, so a
        # store constructed with a relative path must resolve it
        # driver-side before shipping
        root = os.path.abspath(self.path)
        pairs = [
            (os.path.join(root, f), os.path.join(root, p))
            for f, p in sorted(dv.items())
        ]
        total_bytes = 0
        for _, sidecar in pairs:
            try:
                total_bytes += os.path.getsize(sidecar)
            except OSError:
                total_bytes += self.dv_broadcast_bytes + 1  # assume big

        if total_bytes <= self.dv_broadcast_bytes:
            # small-DV fast path: driver decode bounded by the byte
            # cap, shipped as ONE Arrow-backed pandas frame built from
            # the decoded numpy arrays — no boxed Python tuple list,
            # no per-position object allocation (ADVICE r12: the old
            # list-of-tuples build cost seconds of driver CPU and
            # ~100 MB RSS at the 8 MB cap)
            import numpy as np
            import pandas as pd

            path_chunks: list = []
            pos_chunks: list = []
            for dpath, sidecar in pairs:
                with open(sidecar, "rb") as fh:
                    arr = _decode_dv(fh.read()).astype("int64")
                if len(arr):
                    path_chunks.append(
                        np.full(len(arr), dpath, dtype=object)
                    )
                    pos_chunks.append(arr)
            pdf = pd.DataFrame(
                {
                    "__dv_path": (
                        np.concatenate(path_chunks)
                        if path_chunks
                        else np.array([], dtype=object)
                    ),
                    "__dv_pos": (
                        np.concatenate(pos_chunks)
                        if pos_chunks
                        else np.array([], dtype="int64")
                    ),
                }
            )
            return F.broadcast(
                spark.createDataFrame(
                    pdf, "__dv_path string, __dv_pos long"
                )
            )

        # distributed path: each task decodes its slice of sidecars in
        # BOUNDED chunks (VERDICT r12 #7 — the old pandas_udf returned
        # one whole-sidecar array<long> cell, so a 50%-deleted
        # 128M-row file put a ~500 MB array in a single Arrow value).
        # mapInPandas yields one (path, pos) frame per chunk; the
        # sidecar file itself is read incrementally (fixed 8-byte
        # records after the magic), so task memory is O(chunk), not
        # O(sidecar), at any delete density.
        chunk = int(self.dv_decode_chunk)

        def _decode_chunks(frames):
            import numpy as _np
            import pandas as _pd

            for pdf_in in frames:
                for dpath, sp in zip(
                    pdf_in["__dv_path"], pdf_in["__dv_sidecar"]
                ):
                    with open(sp, "rb") as fh:
                        magic = fh.read(len(_DV_MAGIC))
                        if magic != _DV_MAGIC:
                            raise ValueError(
                                f"not a CLDV1 deletion vector: {sp}"
                            )
                        while True:
                            buf = fh.read(chunk * 8)
                            if not buf:
                                break
                            pos = _np.frombuffer(
                                buf, dtype="<u8"
                            ).astype("int64")
                            yield _pd.DataFrame(
                                {"__dv_path": dpath, "__dv_pos": pos}
                            )

        par = spark.sparkContext.defaultParallelism
        return (
            spark.createDataFrame(
                pairs, "__dv_path string, __dv_sidecar string"
            )
            .repartition(max(1, min(len(pairs), par)))
            .mapInPandas(
                _decode_chunks, "__dv_path string, __dv_pos long"
            )
        )

    def _file_diff(
        self, parent: int, child: int
    ) -> tuple[list[str], list[str], dict[str, str], dict[str, str]]:
        """(pre_files, post_files, parent DV map, child DV map) — the
        manifest file-diff CDF planning rides on. File identity
        includes the deletion vector: a file whose DV changed reads as
        pre (parent's mask) AND post (child's mask). Segment-aware
        (r12): partitions whose segment REF is identical in both
        manifests provably contribute nothing and are never parsed, so
        the diff is O(touched partitions) on a partition-scoped store."""
        mp_meta = self.manifest_meta(parent)
        mc_meta = self.manifest_meta(child)
        ip = self._segment_index(mp_meta)
        ic = self._segment_index(mc_meta)
        if ip is None or ic is None:
            mp, mc = self.manifest(parent), self.manifest(child)
            pdv, cdv = mp.get("dv", {}), mc.get("dv", {})
            pid = {(f, pdv.get(f)) for f in mp["files"]}
            cid = {(f, cdv.get(f)) for f in mc["files"]}
        else:
            vals = {
                v
                for v in set(ip) | set(ic)
                if (ip.get(v) or {}).get("ref")
                != (ic.get(v) or {}).get("ref")
            }
            pp, _ps, pdv = self._partition_slice(mp_meta, vals)
            pc, _cs, cdv = self._partition_slice(mc_meta, vals)
            pid = {(f, pdv.get(f)) for fl in pp.values() for f in fl}
            cid = {(f, cdv.get(f)) for fl in pc.values() for f in fl}
        pre = sorted(f for f, _ in pid - cid)
        post = sorted(f for f, _ in cid - pid)
        return pre, post, pdv, cdv

    def read_changes(
        self,
        spark: SparkSession,
        from_version: int,
        to_version: int | None = None,
        keys: list[str] | None = None,
    ) -> DataFrame:
        """Row-level change-data-feed between two versions (r10 —
        VERDICT r9 #3): every data column plus ``_change_type``
        (``insert`` | ``update_preimage`` | ``update_postimage`` |
        ``delete``) and ``_commit_version``. ``from_version`` is
        EXCLUSIVE, ``to_version`` inclusive (defaults to latest) —
        Delta CDF's convention, so ``read_changes(spark, v)`` streams
        everything after snapshot v.

        Planning is manifest-driven: a changed row can only live in a
        file NOT shared between consecutive manifests, so only the
        file-diff is read — on a partition-scoped store that is
        exactly the touched partitions. Rows rewritten byte-for-byte
        into new files (full-snapshot commits) are suppressed by a
        keyed full-outer join on the canonical row hash, so the feed
        carries true changes only. Keys come from the manifests
        (recorded by :meth:`merge`/:meth:`merge_cdc`) or the ``keys``
        argument for overwrite-only histories.
        """
        from functools import reduce

        from pyspark.sql import functions as F

        from calorista_spark.operators.merge import with_row_hash

        to_v = self.latest_version() if to_version is None else to_version
        if to_v is None or from_version > to_v:
            raise ValueError(
                f"empty version range ({from_version}, {to_version}]"
            )
        def _phys_rename(frame: DataFrame, cols, mapping):
            """Step frames union in PHYSICAL column space (r13 column
            mapping): a renamed column keeps its identity across
            versions because its physical name never changes."""
            if not mapping:
                return frame
            return frame.select(
                *[F.col(c).alias(mapping.get(c, c)) for c in cols],
                "_change_type",
                "_commit_version",
            )

        frames: list[DataFrame] = []
        for v in range(from_version + 1, to_v + 1):
            m = self.manifest_meta(v)
            schema = T.StructType.fromJson(json.loads(m["schema"]))
            mapping = m.get("column_mapping") or {}
            data_cols = schema.fieldNames()
            parent = m.get("parent")
            tag = [
                F.lit(v).cast("long").alias("_commit_version"),
            ]
            if parent is None:
                m0 = self.manifest(v)
                frames.append(
                    _phys_rename(
                        self._read_files(
                            spark,
                            m0["files"],
                            schema,
                            dv=m0.get("dv"),
                            mapping=mapping,
                        ).select(
                            *data_cols,
                            F.lit("insert").alias("_change_type"),
                            *tag,
                        ),
                        data_cols,
                        mapping,
                    )
                )
                continue
            # file identity includes its deletion vector: a file whose
            # DV changed reads as pre (parent's mask) AND post (child's
            # mask); the row-hash join then surfaces exactly the newly
            # masked rows as deletes and suppresses the unchanged rest.
            # Segment-aware: untouched partitions never parse (r12)
            pre_files, post_files, pdv, cdv = self._file_diff(parent, v)
            if not pre_files and not post_files:
                # metadata-only commit (rename_column / drop_column /
                # pure carries): provably zero row changes — and the
                # only legal way a non-additive schema change crosses
                # the feed (the guard below never sees it)
                continue
            mp = self.manifest_meta(parent)
            pschema = T.StructType.fromJson(json.loads(mp["schema"]))
            pmapping = mp.get("column_mapping") or {}
            # compare PHYSICAL name→type maps: a rename (same physical,
            # new logical) is not an evolution of the row identity
            pmap = {
                pmapping.get(f.name, f.name): f.dataType.simpleString()
                for f in pschema.fields
            }
            cmap = {
                mapping.get(f.name, f.name): f.dataType.simpleString()
                for f in schema.fields
            }
            # additive evolution is fine: parent files read under the
            # child schema surface typed nulls for appended columns, so
            # pre/post row hashes stay comparable. Drops/retypes aren't.
            if set(pmap) - set(cmap) or any(
                pmap[n] != cmap[n] for n in pmap
            ):
                raise ValueError(
                    f"schema changed non-additively at v{v}; CDF only "
                    "supports appended nullable columns"
                )
            ks = keys if keys is not None else m.get("keys")
            if ks is None:
                raise ValueError(
                    f"v{v} records no merge keys; pass keys= to classify "
                    "overwrite commits"
                )
            pre = with_row_hash(
                self._read_files(
                    spark, pre_files, schema, dv=pdv, mapping=mapping
                )
            )
            post = with_row_hash(
                self._read_files(
                    spark, post_files, schema, dv=cdv, mapping=mapping
                )
            )
            p = pre.select(
                *[F.col(c).alias(f"__p_{c}") for c in data_cols],
                F.col("row_hash").alias("__p_hash"),
            )
            q = post.select(
                *[F.col(c).alias(f"__q_{c}") for c in data_cols],
                F.col("row_hash").alias("__q_hash"),
            )
            cond = reduce(
                lambda a, b: a & b,
                [p[f"__p_{k}"].eqNullSafe(q[f"__q_{k}"]) for k in ks],
            )
            j = p.join(q, cond, "full_outer")

            # ONE pass over the join (r14, guide §2.3): the old shape
            # unioned four filters of `j`, and Catalyst computes the
            # full-outer join once PER UNION BRANCH (only the shuffle
            # exchanges get reused) — 4 joins of two table-sized sides
            # per CDF step. Classify instead into an array of change
            # structs and explode: identical rows, one join, one scan.
            def _payload(side: str, ctype: str):
                return F.struct(
                    *[
                        F.col(f"__{side}_{c}").alias(c)
                        for c in data_cols
                    ],
                    F.lit(ctype).alias("_change_type"),
                )

            changes = (
                F.when(
                    F.col("__q_hash").isNull(),
                    F.array(_payload("p", "delete")),
                )
                .when(
                    F.col("__p_hash").isNull(),
                    F.array(_payload("q", "insert")),
                )
                .when(
                    F.col("__p_hash") != F.col("__q_hash"),
                    F.array(
                        _payload("p", "update_preimage"),
                        _payload("q", "update_postimage"),
                    ),
                )
                # unchanged (equal hashes): NULL array — explode drops
                # the row, matching the old suppression filters
            )
            frames.append(
                _phys_rename(
                    j.select(changes.alias("__ch"))
                    .select(F.explode("__ch").alias("__c"))
                    .select(
                        *[
                            F.col(f"__c.{c}").alias(c)
                            for c in data_cols
                        ],
                        F.col("__c._change_type").alias("_change_type"),
                        *tag,
                    ),
                    data_cols,
                    mapping,
                )
            )
        # histories spanning an additive schema evolution produce
        # frames with different column sets; the feed surfaces the END
        # version's schema, pre-evolution change rows reading null for
        # appended columns (schema-on-read, same as snapshot reads).
        # Frames are in PHYSICAL column space here; the final select
        # presents the END version's LOGICAL names, so a feed crossing
        # a rename carries the renamed column's full history under its
        # new name (r13 column mapping).
        end_meta = self.manifest_meta(to_v)
        out_schema = T.StructType.fromJson(json.loads(end_meta["schema"]))
        end_mapping = end_meta.get("column_mapping") or {}
        if not frames:
            return spark.createDataFrame(
                [],
                T.StructType(
                    list(out_schema.fields)
                    + [
                        T.StructField("_change_type", T.StringType()),
                        T.StructField("_commit_version", T.LongType()),
                    ]
                ),
            )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f, allowMissingColumns=True)
        return out.select(
            *[
                F.col(end_mapping.get(c, c)).alias(c)
                for c in out_schema.fieldNames()
            ],
            "_change_type",
            "_commit_version",
        )

    # -- maintenance ---------------------------------------------------------

    def compact(
        self,
        spark: SparkSession,
        target_file_bytes: int = 128 << 20,
        cluster_by: list[str] | None = None,
        partitions: list[str] | None = None,
        layout: str = "linear",
        max_retries: int = 0,
    ) -> int:
        """See :meth:`_compact_once`. ``max_retries`` > 0 lets a
        compaction that loses the version race to a concurrent DML
        commit recompute from the NEW head instead of surfacing
        :class:`CommitConflictError` — always safe: compaction is
        data-neutral, so re-deriving from the newer snapshot can never
        lose the interleaved writer's rows or resurrect its deletes
        (the conflict check itself is what PREVENTS resurrection — a
        compact staged against the old head must never publish over a
        delete it did not read)."""
        while True:
            try:
                return self._compact_once(
                    spark, target_file_bytes, cluster_by, partitions, layout
                )
            except CommitConflictError:
                if max_retries <= 0:
                    raise
                max_retries -= 1

    @staticmethod
    def _murmur3_long(value: int, seed: int = 42) -> int:
        """Spark's ``F.hash`` of one LongType value: Murmur3 x86-32
        over the long's two little-endian 32-bit halves, signed-int
        result. Pinned bit-exact against ``F.hash`` by
        ``tests/test_compact_salts.py`` — HashPartitioning's partition
        id is ``pmod(this, numPartitions)``, which is what lets
        :meth:`_hash_slot_salts` pre-solve placement driver-side."""
        c1, c2 = 0xCC9E2D51, 0x1B873593
        h = seed & 0xFFFFFFFF
        v = value & 0xFFFFFFFFFFFFFFFF
        for k in (v & 0xFFFFFFFF, (v >> 32) & 0xFFFFFFFF):
            k = (k * c1) & 0xFFFFFFFF
            k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
            k = (k * c2) & 0xFFFFFFFF
            h ^= k
            h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
            h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
        h ^= 8  # total byte length of the hashed input
        h ^= h >> 16
        h = (h * 0x85EBCA6B) & 0xFFFFFFFF
        h ^= h >> 13
        h = (h * 0xC2B2AE35) & 0xFFFFFFFF
        h ^= h >> 16
        return h - (1 << 32) if h >= (1 << 31) else h

    @classmethod
    def _hash_slot_salts(cls, n: int) -> list[int]:
        """For each shuffle slot p in [0, n): a long ``s`` with
        ``pmod(hash(s), n) == p`` (Spark's HashPartitioning id is
        exactly ``pmod(murmur3(expr, 42), n)``). Pure driver-side
        arithmetic — O(n log n) expected probes, NO Spark job, NO scan
        of table data — so compact can place each quantile bin into
        exactly its own output task via plain hash repartition instead
        of ``repartitionByRange``, whose boundary sampling is a whole
        extra pass over the rewrite set (r14, guide §2.4). A wrong
        salt could only MERGE bins into one task (fewer, fatter files
        — a layout-quality miss, never a data error); the murmur3
        parity test pins even that away."""
        salts: dict[int, int] = {}
        candidate = 0
        while len(salts) < n:
            slot = cls._murmur3_long(candidate) % n
            salts.setdefault(slot, candidate)
            candidate += 1
        return [salts[p] for p in range(n)]

    def _with_compact_buckets(
        self, df: DataFrame, pb: str, order, todo: dict[str, int]
    ):
        """``df`` plus a deterministic ``__cbkt`` bin id AND a
        ``__csalt`` placement key: partition value → a contiguous id
        block of its ``todo`` width, rows placed by their ORDER-key
        position against that partition's own quantile grid (one
        aggregation pass over the rewrite set, boundaries broadcast
        back as a tiny array-typed dim). ``__csalt`` is the bin's
        pre-computed hash-slot salt (:meth:`_hash_slot_salts`):
        ``repartition(total, __csalt)`` lands every bin in exactly its
        own task — one file per bin, disjoint contiguous order ranges,
        tight skippable stats, a stable compact-idempotence check, and
        NO range-boundary sampling pass (sampled repartitionByRange
        gave none of the first three and cost an extra scan). Returns
        ``None`` for non-numeric order keys (the quantile grid needs
        an ordered cast to double)."""
        from pyspark.sql import functions as F

        dt = df.select(order.alias("__o")).schema[0].dataType.simpleString()
        if dt not in _ZORDER_NUMERIC:
            return None
        offsets: dict[str, int] = {}
        off = 0
        for v in sorted(todo):
            offsets[v] = off
            off += todo[v]
        od = order.cast("double")
        # grid capped at 1024: the probs list is a literal in the
        # aggregate plan, and a partition wanting more bins than the
        # grid simply gets up-to-1024 proportionally larger files —
        # still bounded, still contiguous, still idempotent
        grid = min(max(todo.values()), 1024)
        bounds_by_part: dict[str, list[float]] = {v: [] for v in todo}
        if grid > 1:
            probs = [i / grid for i in range(1, grid)]
            qrows = (
                df.groupBy(F.col(pb).cast("string").alias("__p"))
                .agg(
                    F.percentile_approx(od, probs, 10000).alias("__qs")
                )
                .collect()
            )
            for r in qrows:
                w = todo.get(r["__p"])
                qs = [q for q in (r["__qs"] or []) if q is not None]
                if not w or w <= 1 or not qs:
                    continue
                # w-1 evenly spaced boundaries from the grid
                picks = sorted(
                    {
                        qs[min(len(qs) - 1, max(0, round(j * grid / min(w, grid)) - 1))]
                        for j in range(1, min(w, grid))
                    }
                )
                bounds_by_part[r["__p"]] = picks
        total = sum(todo.values())
        slot_salts = self._hash_slot_salts(total)
        salts_by_part = {
            v: [
                slot_salts[offsets[v] + j]
                for j in range(len(bounds_by_part[v]) + 1)
            ]
            for v in todo
        }
        bdf = df.sparkSession.createDataFrame(
            [
                (v, offsets[v], bounds_by_part[v], salts_by_part[v])
                for v in sorted(todo)
            ],
            "__p string, __off int, __bounds array<double>, "
            "__salts array<bigint>",
        )
        joined = df.join(
            F.broadcast(bdf),
            F.col(pb).cast("string") == F.col("__p"),
            "left",
        )
        local = F.coalesce(
            F.size(F.filter(F.col("__bounds"), lambda b: b <= od)),
            F.lit(0),
        )
        bucket = F.coalesce(F.col("__off"), F.lit(0)) + local
        salt = F.coalesce(
            F.element_at(F.col("__salts"), local + F.lit(1)),
            F.lit(0).cast("bigint"),
        )
        return (
            joined.withColumn("__cbkt", bucket)
            .withColumn("__csalt", salt)
            .drop("__p", "__off", "__bounds", "__salts")
        )

    def _compact_once(
        self,
        spark: SparkSession,
        target_file_bytes: int = 128 << 20,
        cluster_by: list[str] | None = None,
        partitions: list[str] | None = None,
        layout: str = "linear",
    ) -> int:
        """OPTIMIZE (r10): bin-pack each partition's files toward
        ``target_file_bytes`` and, with ``cluster_by``, lay rows out
        range-partitioned + sorted on those columns so the footer
        min/max stats become tight disjoint ranges — the combination
        that makes :meth:`files_for` pruning bite on non-partition
        predicates. Data is bit-identical before/after: the commit is
        ``op="compact"`` metadata-only from a reader's point of view,
        time travel still reaches the pre-compact layout, and
        :meth:`read_changes` across it yields ZERO rows (the row-hash
        suppression sees every row rewritten unchanged). Untouched
        partitions carry by reference; vacuum later reclaims the
        superseded small files. This is the standing answer to
        streaming ingest's small-files problem at 100 TB: merge often,
        compact on a schedule, never block readers.

        A partition is skipped when it already meets the bin target
        AND (if ``cluster_by``) its manifest clustering entry matches —
        so a scheduled ``compact()`` is idempotent: re-running returns
        the latest version without writing a commit.

        r10 ``layout="zorder"``: instead of a linear sort on
        ``cluster_by``, rows are laid out along a Z-order (Morton)
        curve over ALL the cluster columns (see :func:`_zorder_column`)
        — every file gets a tight stat rectangle in every dimension, so
        :meth:`files_for` prunes on predicates over ANY clustered
        column, not just the leading one. Numeric columns only.
        """
        from pyspark.sql import functions as F

        if layout not in ("linear", "zorder"):
            raise ValueError(f"unknown layout {layout!r}")
        if layout == "zorder" and not cluster_by:
            raise ValueError("layout='zorder' requires cluster_by")
        cluster_tag = (
            {"layout": "zorder", "cols": list(cluster_by)}
            if layout == "zorder" and cluster_by
            else cluster_by
        )
        latest = self.latest_version()
        if latest is None:
            raise FileNotFoundError(f"commit-log store at {self.path} is empty")
        meta = self.manifest_meta(latest)
        schema = T.StructType.fromJson(json.loads(meta["schema"]))
        clustering = meta.get("clustering", {})
        pb = meta.get("partition_by")
        idx = self._segment_index(meta)
        if pb is None or not self._meta_partitioned(meta):
            m = self.manifest(latest)  # one segment (or format-1)
            stats = m.get("stats", {})
            dv = m.get("dv", {})
            fl = m["files"]
            nb = sum(
                (
                    stats[f]["bytes"]
                    if f in stats
                    else os.path.getsize(os.path.join(self.path, f))
                )
                for f in fl
            )
            want = max(1, math.ceil(nb / target_file_bytes))
            if (
                len(fl) <= want
                and not any(f in dv for f in fl)  # DV purge forces rewrite
                and (cluster_by is None or clustering.get("") == cluster_tag)
            ):
                return latest
            df = self._read_files(
                spark, fl, schema, dv=dv,
                mapping=meta.get("column_mapping"),
            )
            zval = None
            if layout == "zorder":
                zval = _zorder_column(df, cluster_by)
                df = df.repartitionByRange(want, zval)
            elif cluster_by:
                df = df.repartitionByRange(
                    want, *[F.col(c) for c in cluster_by]
                )
            else:
                df = df.coalesce(want)
            return self.commit(
                df,
                op="compact",
                expect_version=latest,
                keys=meta.get("keys"),
                clustering={"": cluster_tag} if cluster_by else None,
                sort_by=cluster_by if layout == "linear" else None,
                sort_expr=zval,
            )
        todo: dict[str, int] = {}
        if idx is not None:
            # segment-selective (r12): the envelope carries n_files /
            # total bytes / n_dv, so the scheduled-maintenance sweep
            # picks its work list META-ONLY and loads only the
            # partitions it will actually rewrite — O(todo) driver
            # cost on a 10^6-file table whose partitions mostly
            # already meet the bin target
            for val, sm in idx.items():
                if partitions is not None and val not in partitions:
                    continue
                want = max(
                    1,
                    math.ceil(
                        sm["stats"].get("bytes", 0) / target_file_bytes
                    ),
                )
                if (
                    sm["n_files"] <= want
                    and sm.get("n_dv", 0) == 0
                    and (
                        cluster_by is None
                        or clustering.get(val) == cluster_tag
                    )
                ):
                    continue
                todo[val] = want
            if not todo:
                return latest
            parts, _stats_slice, dv = self._partition_slice(meta, set(todo))
            carry: dict[str, list[str] | None] = {
                val: None for val in idx if val not in todo
            }
        else:
            m = self.manifest(latest)
            stats = m.get("stats", {})
            dv = m.get("dv", {})

            def nbytes(f: str) -> int:
                st = stats.get(f)
                if st is not None:
                    return st["bytes"]
                return os.path.getsize(os.path.join(self.path, f))

            all_parts: dict[str, list[str]] = m["partitions"]
            for val, fl in all_parts.items():
                if partitions is not None and val not in partitions:
                    continue
                want = max(
                    1,
                    math.ceil(
                        sum(nbytes(f) for f in fl) / target_file_bytes
                    ),
                )
                if (
                    len(fl) <= want
                    and not any(f in dv for f in fl)
                    and (
                        cluster_by is None
                        or clustering.get(val) == cluster_tag
                    )
                ):
                    continue
                todo[val] = want
            if not todo:
                return latest
            parts = {val: all_parts[val] for val in todo}
            carry = {
                val: fl
                for val, fl in all_parts.items()
                if val not in todo
            }
        touched_files = [f for val in todo for f in parts[val]]
        df = self._read_files(
            spark, touched_files, schema, dv=dv,
            mapping=meta.get("column_mapping"),
        )
        total = sum(todo.values())
        zval = None
        secondary: list[str] = []
        if layout == "zorder":
            zval = _zorder_column(df, cluster_by)
            order = zval
        else:
            secondary = cluster_by or meta.get("keys") or []
            order = F.col(secondary[0]) if secondary else None
        if order is None:
            df = df.repartition(total, F.col(pb))
        else:
            # deterministic per-partition bins (r12): a single global
            # repartitionByRange SAMPLES its boundaries, so a small
            # partition straddling a sampled boundary lands want+k
            # files and the next scheduled compact rewrites it AGAIN —
            # OPTIMIZE never converges. Exact per-partition quantile
            # buckets guarantee n_files ≤ want per partition, so the
            # idempotence check is stable round over round.
            bucketed = self._with_compact_buckets(df, pb, order, todo)
            if bucketed is None:
                # non-numeric order key: sampled ranges remain the
                # documented fallback (rare for clustering keys)
                cols = (
                    [F.col(pb), zval]
                    if zval is not None
                    else [F.col(pb)] + [F.col(c) for c in secondary]
                )
                df = df.repartitionByRange(total, *cols)
            else:
                # hash-place each bin via its PRE-SOLVED slot salt
                # (r14, guide §2.4): pmod(hash(__csalt), total) == the
                # bin's own slot by construction, so every bin lands
                # alone in exactly its task — one file per bin, never
                # split, never merged — and the rewrite set is NOT
                # scanned an extra time for range-boundary sampling
                # (repartitionByRange's sketch pass). Raw hash
                # placement on __cbkt would merge arbitrary bins and
                # destroy the stat tightness clustering exists for;
                # the salt removes that hazard deterministically.
                df = bucketed.repartition(total, F.col("__csalt")).drop(
                    "__cbkt", "__csalt"
                )
        return self.commit(
            df,
            op="compact",
            expect_version=latest,
            partition_by=pb,
            keys=meta.get("keys"),
            carry_partitions=carry,
            clustering=(
                {val: cluster_tag for val in todo} if cluster_by else None
            ),
            sort_by=cluster_by if layout == "linear" else None,
            sort_expr=zval,
        )

    def purge_dv(
        self,
        spark: SparkSession,
        dv_fraction: float = 0.1,
        max_retries: int = 0,
    ) -> int:
        """Targeted deletion-vector purge (r12 — VERDICT r11 #5;
        Delta's ``REORG TABLE ... APPLY (PURGE)``): rewrite ONLY the
        files whose DV mass exceeds ``dv_fraction`` of their rows —
        the rewrite applies the mask and drops the file's DV — and
        carry every other file (DV'd or clean) untouched. This keeps
        DV mass maintainable on a schedule without paying a full
        :meth:`compact` bin-pack of the table: cost is O(DV-heavy
        files), data is row-identical before/after (the commit is
        ``op="reorg"``; CDF across it yields zero rows), and losing a
        version race to a concurrent writer conflicts exactly like
        compaction (``max_retries`` recomputes from the new head).
        The DV size is read from sidecar byte lengths — driver-side
        stat metadata, never content. Returns the new version; no
        DV-heavy files → current version, no commit."""
        while True:
            try:
                return self._purge_dv_once(spark, dv_fraction)
            except CommitConflictError:
                if max_retries <= 0:
                    raise
                max_retries -= 1

    def _purge_dv_once(self, spark: SparkSession, dv_fraction: float) -> int:
        latest = self.latest_version()
        if latest is None:
            raise FileNotFoundError(f"commit-log store at {self.path} is empty")
        meta = self.manifest_meta(latest)
        idx = self._segment_index(meta)
        if idx is None:
            m = self.manifest(latest)
            dv = dict(m.get("dv", {}))
            stats = m.get("stats", {})
            file_part = None
        else:
            # segment-selective: only segments that HOLD deletion
            # vectors (n_dv > 0 in the envelope) are parsed — a purge
            # sweep over a mostly-clean 10^6-file table reads metadata
            # proportional to its DV'd partitions
            dv, stats, file_part = {}, {}, {}
            for val in sorted(idx):
                if idx[val].get("n_dv", 0) == 0:
                    continue
                seg = self._load_segment(idx[val]["ref"])
                seg_stats = seg.get("stats", {})
                for f, p in seg.get("dv", {}).items():
                    dv[f] = p
                    file_part[f] = val
                    if f in seg_stats:
                        stats[f] = seg_stats[f]
        if not dv:
            return latest
        heavy: list[str] = []
        for f, dvp in sorted(dv.items()):
            n_rows = (stats.get(f) or {}).get("rows")
            try:
                n_del = (
                    os.path.getsize(os.path.join(self.path, dvp))
                    - len(_DV_MAGIC)
                ) // 8
            except OSError:
                n_del = None
            # unknown sizes rewrite (conservative: the point of the op
            # is bounding DV mass, not preserving an unreadable DV)
            if not n_rows or n_del is None or n_del > dv_fraction * n_rows:
                heavy.append(f)
        if not heavy:
            return latest
        schema = T.StructType.fromJson(json.loads(meta["schema"]))
        token = uuid.uuid4().hex
        live = self._read_files(
            spark, heavy, schema, dv=dv,
            mapping=meta.get("column_mapping"),
        )
        new_parts, _nf, new_stats = self._write_dml_files(
            live, meta, token, "purge", coalesce_partitions=False
        )
        return self._publish_dml(
            latest,
            meta,
            token,
            op="reorg",
            batch_id=None,
            removed=set(heavy),
            new_parts=new_parts,
            new_stats=new_stats,
            dv_updates={},
            file_part=file_part,
        )

    def vacuum(
        self,
        keep_versions: int | None = None,
        retention_seconds: float = 600.0,
    ) -> list[str]:
        """Remove orphan data dirs (crash leftovers / losers of commit
        races) and, with ``keep_versions``, expire old manifests plus
        the data only they referenced. Never touches anything the
        retained manifests list. Returns the deleted paths.

        r10 (VERDICT r9 #2 / ADVICE): unreferenced data dirs younger
        than ``retention_seconds`` (by mtime) are SKIPPED — a concurrent
        writer mid-commit (data written, manifest not yet linked) looks
        identical to a crash orphan, so immediate GC could delete files
        a racing commit then publishes a manifest for. The age gate is
        the same defense as Delta's ``deletedFileRetentionDuration``:
        pick a window longer than any plausible data-write-to-link gap.
        ``retention_seconds=0`` restores immediate GC for quiesced
        single-writer maintenance.

        r11: GC is FILE-granular inside still-referenced data dirs
        too. A copy-on-write DELETE/UPDATE (or a DV re-merge) replaces
        individual files of an older commit while its siblings stay
        live, so once history expires, the dir stays referenced but
        the replaced file is garbage; token-level GC would leak it
        forever — the difference between "deleted" and physically
        ERASED for a GDPR sweep (erasure = COW delete → history expiry
        → vacuum). Live-token file GC never applies to a dir younger
        than the retention window (an in-flight writer's own dir), and
        a file referenced by ANY retained manifest is never touched.
        """
        vs = self.versions()
        keep = vs if keep_versions is None else vs[-keep_versions:]
        referenced_tokens: set[str] = set()
        referenced_files: set[str] = set()
        referenced_segs: set[str] = set()
        for v in keep:
            idx = self._segment_index(self.manifest_meta(v))
            if idx is not None:
                referenced_segs.update(
                    os.path.basename(sm["ref"]) for sm in idx.values()
                )
            mm = self.manifest(v)
            for f in list(mm["files"]) + list(mm.get("dv", {}).values()):
                referenced_tokens.add(f.split(os.sep)[1])
                referenced_files.add(f)
        deleted = []
        for v in vs:
            if v not in keep:
                p = os.path.join(self.commits_dir, f"v{v:08d}.json")
                try:
                    os.unlink(p)
                except FileNotFoundError:
                    pass  # raced with a concurrent vacuum: already gone
                # any OTHER OSError (EACCES/EROFS/...) propagates: a
                # vacuum that cannot actually delete must not report
                # success while retaining data (ADVICE r12)
                # expired versions must stop resolving through this
                # instance's caches too (time travel to them is gone)
                self._meta_cache.pop(v, None)
                self._full_cache.pop(v, None)
                deleted.append(p)
        import time as _time

        now = _time.time()

        def young(path: str) -> bool:
            try:
                return now - os.path.getmtime(path) < retention_seconds
            except OSError:
                return True  # raced with a concurrent vacuum: skip

        for token in os.listdir(self.data_dir):
            tdir = os.path.join(self.data_dir, token)
            if token not in referenced_tokens:
                if young(tdir):
                    continue  # possibly an in-flight writer's dir
                # ignore-MISSING only: a concurrent vacuum may reap the
                # same dir mid-walk, but a permission/readonly failure
                # must propagate, not masquerade as a completed GC
                # (ADVICE r12 — was a blanket ignore_errors)
                _rmtree_ignore_missing(tdir)
                deleted.append(tdir)
                continue
            if young(tdir):
                continue  # a racing commit may still be staging here
            # referenced dir: reap the individual files no retained
            # manifest lists (COW-replaced data / superseded DVs)
            for dirpath, _dirs, files in os.walk(tdir, topdown=False):
                for fn in files:
                    # skip write-layer metadata (_SUCCESS, hidden .crc
                    # checksums) — only data/DV payload files are GC'd
                    if fn == "_SUCCESS" or fn.startswith((".", "_")):
                        continue
                    ap = os.path.join(dirpath, fn)
                    rel = os.path.relpath(ap, self.path)
                    if rel in referenced_files:
                        continue
                    try:  # raced with a concurrent vacuum: skip
                        os.unlink(ap)
                    except FileNotFoundError:
                        continue
                    deleted.append(ap)
                if dirpath != tdir:
                    try:
                        if not os.listdir(dirpath):
                            os.rmdir(dirpath)
                    except OSError:
                        continue
        # manifest segments no retained commit references (expired
        # history / losers of commit races). Age-gated like data dirs:
        # an in-flight publish writes its segments BEFORE linking the
        # commit JSON, so a young unreferenced segment may be about to
        # become referenced. OSError-tolerant for concurrent vacuums.
        if os.path.isdir(self.seg_dir):
            for fn in os.listdir(self.seg_dir):
                # unreferenced segments AND crash-orphaned .tmp files
                if fn in referenced_segs:
                    continue
                ap = os.path.join(self.seg_dir, fn)
                if young(ap):
                    continue
                try:
                    os.unlink(ap)
                except FileNotFoundError:
                    continue
                deleted.append(ap)
        # bloom sidecars of files no retained manifest lists (r14):
        # sidecars are derived data keyed by file path, so GC is just
        # name-set subtraction — never age-gated on the DATA's side
        # (a sidecar for a file that no longer exists can't be about
        # to become referenced), but .tmp partials are age-gated like
        # segments (an executor may still be publishing one)
        from calorista_spark.sources import bloom as _bloom

        bdir = _bloom.bloom_dir(self.path)
        if os.path.isdir(bdir):
            live = {
                _bloom.sidecar_name(f) for f in referenced_files
            }
            for fn in os.listdir(bdir):
                if fn == _bloom._META_FILE or fn in live:
                    continue
                ap = os.path.join(bdir, fn)
                if ".tmp-" in fn and young(ap):
                    continue
                try:
                    os.unlink(ap)
                except FileNotFoundError:
                    continue
                deleted.append(ap)
            self._bloom_sidecar_cache = {}
        return deleted


def start_commitlog_cdc_merge(
    stream: DataFrame,
    store_path: str,
    keys: list[str],
    checkpoint: str,
    op_col: str = "op",
    seq_col: str | None = None,
    trigger_available_now: bool = True,
    on_batch=None,
):
    """Streaming CDC MERGE into a commit-log store: foreachBatch calls
    :meth:`CommitLogStore.merge_cdc` with the micro-batch's
    ``batch_id``, so exactly-once across crash/restart is enforced by
    the commit ledger itself (a replayed batch is skipped by id), not
    by hoping the merge is idempotent. The streaming twin of
    streaming/incremental.start_incremental_cdc_merge with the
    torn-write window removed."""

    def _merge_batch(batch: DataFrame, batch_id: int) -> None:
        if on_batch is not None:
            on_batch(batch_id)
        CommitLogStore(store_path).merge_cdc(
            batch.sparkSession,
            batch,
            keys,
            op_col=op_col,
            seq_col=seq_col,
            batch_id=batch_id,
        )

    writer = stream.writeStream.foreachBatch(_merge_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming change-data-feed source (r10 — VERDICT r9 #3): readStream
# over a commit-log store's version history. Offsets are store
# versions, so exactly-once across checkpoint restarts is the commit
# ledger's own monotonic version counter — `readBetweenOffsets` is a
# deterministic replay of (start, end] by construction.
#
# The reader computes the per-version row diff DRIVER-side (pyarrow
# over the manifest file-diff, pure-Python keyed compare): a
# SimpleDataSourceStreamReader prefetches rows on the driver by
# design, and the per-batch volume here is the CHANGE set of the new
# versions — bounded by touched partitions on a partition-scoped
# store — not the table. The fully-distributed face of the same feed
# is CommitLogStore.read_changes (use it in foreachBatch when change
# sets are large); this source is the low-latency tail consumer.
# ---------------------------------------------------------------------------


def _vals_differ(a, b) -> bool:
    """Value inequality matching the Spark face's row-hash semantics:
    NaN == NaN (Spark's hash of a NaN float is stable, so an unchanged
    NaN row is suppressed there — the driver-side compare must agree
    or the two faces drift; ADVICE r10). Applies inside lists/dicts
    too (array/map columns)."""
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return False
        return a != b
    if isinstance(a, list) and isinstance(b, list):
        return len(a) != len(b) or any(
            _vals_differ(x, y) for x, y in zip(a, b)
        )
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) != set(b) or any(_vals_differ(a[k], b[k]) for k in a)
    return a != b


def _changes_between_py(
    store: CommitLogStore,
    from_version: int,
    to_version: int,
    keys: list[str] | None,
    out_cols: list[str] | None = None,
) -> list[tuple]:
    """Driver-side mirror of :meth:`CommitLogStore.read_changes` —
    same classification, computed with pyarrow + plain dict compare
    (value equality, not hash parity, so the two faces cannot drift).
    Returns tuples in ``out_cols`` order (default: the END version's
    schema — pre-evolution change rows read null for appended columns)
    + (change_type, version), deterministically sorted by key within
    each version. A version whose schema has columns BEYOND
    ``out_cols`` raises: a fixed-schema consumer (a running stream)
    cannot represent it and must restart."""
    import pyarrow.parquet as pq

    if out_cols is None:
        out_cols = T.StructType.fromJson(
            json.loads(store.manifest_meta(to_version)["schema"])
        ).fieldNames()
    out: list[tuple] = []
    for v in range(from_version + 1, to_version + 1):
        m = store.manifest_meta(v)
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        mapping = m.get("column_mapping") or {}
        cols = schema.fieldNames()
        if set(cols) - set(out_cols):
            raise ValueError(
                f"v{v} schema has columns beyond the reader's "
                f"({sorted(set(cols) - set(out_cols))}); restart the "
                "stream to pick up the evolved schema"
            )
        parent = m.get("parent")

        def load(files: list[str], dvm: dict | None = None) -> list[dict]:
            rows: list[dict] = []
            for f in sorted(files):
                t = pq.read_table(os.path.join(store.path, f))
                have = set(t.column_names)
                masked: set[int] = set()
                if dvm and f in dvm:  # deletion vector: skip positions
                    with open(os.path.join(store.path, dvm[f]), "rb") as fh:
                        masked = {int(p) for p in _decode_dv(fh.read())}
                # files hold PHYSICAL names (r13 column mapping);
                # pre-evolution files lack appended columns → nulls,
                # mirroring the Spark face's schema-on-read
                phys = {c: mapping.get(c, c) for c in cols}
                present = [c for c in cols if phys[c] in have]
                for i, r in enumerate(
                    t.select([phys[c] for c in present]).to_pylist()
                ):
                    if i in masked:
                        continue
                    rows.append({c: r.get(phys[c]) for c in cols})
            return rows

        if parent is None:
            ks0 = keys if keys is not None else m.get("keys")
            m0 = store.manifest(v)
            rows = load(m0["files"], m0.get("dv"))
            if ks0:
                rows.sort(key=lambda r: tuple(str(r[k]) for k in ks0))
            for r in rows:
                out.append(
                    tuple(r.get(c) for c in out_cols) + ("insert", v)
                )
            continue
        ks = keys if keys is not None else m.get("keys")
        if ks is None:
            raise ValueError(
                f"v{v} records no merge keys; pass a keys option"
            )
        # segment-aware diff: untouched partitions never parse (r12)
        pre_files, post_files, pdv, cdv = store._file_diff(parent, v)

        def index(rows: list[dict]) -> dict[tuple, dict]:
            ix: dict[tuple, dict] = {}
            for r in rows:
                k = tuple(r[c] for c in ks)
                if k in ix:
                    raise ValueError(
                        f"duplicate key {k} in one snapshot; the CDF "
                        "source requires keyed (merge-maintained) stores"
                    )
                ix[k] = r
            return ix

        pre = index(load(pre_files, pdv))
        post = index(load(post_files, cdv))
        for k in sorted(set(pre) | set(post), key=lambda t: tuple(map(str, t))):
            p, q = pre.get(k), post.get(k)
            if q is None:
                out.append(
                    tuple(p.get(c) for c in out_cols) + ("delete", v)
                )
            elif p is None:
                out.append(
                    tuple(q.get(c) for c in out_cols) + ("insert", v)
                )
            elif any(_vals_differ(p[c], q[c]) for c in cols):
                out.append(
                    tuple(p.get(c) for c in out_cols)
                    + ("update_preimage", v)
                )
                out.append(
                    tuple(q.get(c) for c in out_cols)
                    + ("update_postimage", v)
                )
    return out


def make_commitlog_changes_datasource():
    """Build the DataSource class lazily (pyspark.sql.datasource import
    kept out of module import time — mirrors sources/python_datasource)."""
    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    class CommitLogChangesStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options: dict, out_cols: list[str] | None = None):
            self.path = options["path"]
            ks = [k for k in options.get("keys", "").split(",") if k]
            self.keys = ks or None
            self.start_version = int(options.get("starting_version", 0))
            # r12 (VERDICT r11 #6) admission control: cap the number
            # of changed DATA FILES one micro-batch may span (the
            # commit-log analog of maxFilesPerTrigger), so a backfill
            # from v0 over a long history progresses in bounded
            # batches instead of one giant one. Always admits at
            # least one version (a single huge commit still lands —
            # versions are the atomicity unit).
            mft = int(options.get("max_files_per_trigger", 0))
            self.max_files = mft if mft > 0 else None
            # the stream's schema is FIXED at start: emit every batch
            # in it (pre-evolution rows null-fill; a version evolved
            # beyond it raises a restart error instead of silently
            # misaligning tuples)
            self.out_cols = out_cols

        def initialOffset(self) -> dict:
            return {"version": self.start_version}

        def _admitted_end(
            self, store: CommitLogStore, start_v: int, latest: int
        ) -> int:
            """The furthest version whose cumulative changed-file
            count from ``start_v`` fits the per-trigger budget —
            derived from manifest file-diffs alone (no data IO)."""
            if self.max_files is None or latest <= start_v:
                return latest
            budget = self.max_files
            end = start_v
            for v in range(start_v + 1, latest + 1):
                meta = store.manifest_meta(v)
                parent = meta.get("parent")
                if parent is None:
                    idx = store._segment_index(meta)
                    if idx is not None:
                        n = sum(sm["n_files"] for sm in idx.values())
                    else:
                        n = len(meta["files"])
                else:
                    pre, post, _pdv, _cdv = store._file_diff(parent, v)
                    n = len(pre) + len(post)
                if end > start_v and n > budget:
                    break
                end = v
                budget -= n
                if budget <= 0:
                    break
            return end

        def read(self, start: dict):
            store = CommitLogStore(self.path)
            latest = store.latest_version() or 0
            latest = max(latest, start["version"])
            end_v = self._admitted_end(store, start["version"], latest)
            rows = _changes_between_py(
                store, start["version"], end_v, self.keys, self.out_cols
            )
            return iter(rows), {"version": end_v}

        def readBetweenOffsets(self, start: dict, end: dict):
            store = CommitLogStore(self.path)
            return iter(
                _changes_between_py(
                    store,
                    start["version"],
                    end["version"],
                    self.keys,
                    self.out_cols,
                )
            )

    class CommitLogChangesDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "commitlog_changes"

        def schema(self):
            store = CommitLogStore(self.options["path"])
            v = store.latest_version()
            if v is None:
                raise ValueError(
                    f"commit-log store at {self.options['path']} is empty"
                )
            schema = T.StructType.fromJson(
                json.loads(store.manifest_meta(v)["schema"])
            )
            return T.StructType(
                list(schema.fields)
                + [
                    T.StructField("_change_type", T.StringType(), False),
                    T.StructField("_commit_version", T.LongType(), False),
                ]
            )

        def simpleStreamReader(self, schema):
            out_cols = [
                f.name
                for f in schema.fields
                if f.name not in ("_change_type", "_commit_version")
            ]
            return CommitLogChangesStreamReader(self.options, out_cols)

    return CommitLogChangesDataSource


def register_changes_source(spark: SparkSession) -> None:
    """spark.readStream.format("commitlog_changes").option("path", p)"""
    spark.dataSource.register(make_commitlog_changes_datasource())
