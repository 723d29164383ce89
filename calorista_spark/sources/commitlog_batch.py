"""Batch Spark DataSource over a commit-log store (Spark 4 Python
DataSource API): ``spark.read.format("commitlog")``.

The store's programmatic face (:meth:`CommitLogStore.read` /
``read_where``) requires calling the library; this source makes the
table format a first-class Spark relation — usable from SQL, joins,
and any DataFrame pipeline — with the table format's scale features
wired into Spark's own scan planning:

- **Catalyst filter pushdown → manifest skipping.** ``pushFilters``
  receives the query's typed filters; the translatable ones
  (=, <, <=, >, >=, IN on top-level columns) feed
  :meth:`CommitLogStore.files_for`, so planning opens O(matching
  files) — the same two-level (segment envelope → footer stats)
  pruning the library face uses. ALL filters are also returned as
  residual: file skipping is conservative (file-level min/max), so
  Spark re-applies exact row-level filtering — exactly how
  Delta/Iceberg scans split the work.
- **One input partition per data file**, read executor-side with
  pyarrow; a file's deletion-vector sidecar is decoded inside its
  task and applied as a positional mask (no driver materialization,
  no global delete-set broadcast).
- **Snapshot isolation**: the file list is pinned at plan time, so a
  concurrent writer committing mid-scan cannot tear the read.
- **Time travel** via ``option("version", N)``.

The streaming face (change feed) lives in
:func:`~calorista_spark.sources.commitlog.make_commitlog_changes_datasource`;
this is its batch sibling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T


def _pushed_predicates(filters) -> tuple[list[tuple], list]:
    """(files_for predicates, translated filters) from typed Spark
    filters. Untranslatable shapes (nested columns, string matchers,
    Not, null tests) are simply not used for skipping — correctness
    never depends on them because every filter stays residual."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        LessThan,
        LessThanOrEqual,
    )

    ops = {
        EqualTo: "==",
        GreaterThan: ">",
        GreaterThanOrEqual: ">=",
        LessThan: "<",
        LessThanOrEqual: "<=",
    }
    preds: list[tuple] = []
    used: list = []
    for f in filters:
        op = ops.get(type(f))
        try:
            if op is not None and len(f.attribute) == 1:
                if f.value is None:
                    continue
                preds.append((f.attribute[0], op, f.value))
                used.append(f)
            elif isinstance(f, In) and len(f.attribute) == 1:
                vals = [v for v in f.value if v is not None]
                if vals:
                    preds.append((f.attribute[0], "in", vals))
                    used.append(f)
        except Exception:
            continue  # unknown filter shape: skip, stays residual
    return preds, used


def make_commitlog_batch_datasource():
    """Build the DataSource class lazily (mirrors
    make_commitlog_changes_datasource: pyspark.sql.datasource stays
    out of module import time)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class CommitLogFilePartition(InputPartition):
        def __init__(
            self, root: str, file: str, sidecar: str | None, schema_json: str
        ):
            self.root = root
            self.file = file
            self.sidecar = sidecar
            self.schema_json = schema_json

    class CommitLogBatchReader(DataSourceReader):
        def __init__(self, options):
            self.path = options["path"]
            v = options.get("version")
            self.version = int(v) if v is not None else None
            self.preds: list[tuple] = []

        def pushFilters(self, filters):
            preds, _used = _pushed_predicates(filters)
            self.preds = preds
            # everything is residual: manifest skipping is file-level
            # and conservative; Spark must re-apply exact filters
            return filters

        def partitions(self):
            from calorista_spark.sources.commitlog import CommitLogStore

            store = CommitLogStore(self.path)
            v = (
                store.latest_version()
                if self.version is None
                else self.version
            )
            if v is None:
                return []
            meta = store.manifest_meta(v)
            files, dvm, _stats, _parts = store._files_for_pruned(
                self.preds, v
            )
            root = os.path.abspath(self.path)
            return [
                CommitLogFilePartition(
                    root, f, dvm.get(f), meta["schema"]
                )
                for f in sorted(files)
            ]

        def read(self, partition):
            import json as _json

            import pyarrow as pa
            import pyarrow.parquet as pq

            from pyspark.sql.pandas.types import to_arrow_schema

            from calorista_spark.sources.commitlog import _decode_dv

            st = T.StructType.fromJson(
                _json.loads(partition.schema_json)
            )
            cols = st.fieldNames()
            tbl = pq.read_table(
                os.path.join(partition.root, partition.file)
            )
            have = set(tbl.column_names)
            # schema-on-read: pre-evolution files lack appended
            # columns — fill nulls; every column cast to the declared
            # arrow type so evolved and original files batch-align
            arrays = []
            fields = []
            target = to_arrow_schema(st)
            for name, typ in zip(cols, target.types):
                if name in have:
                    arrays.append(
                        tbl.column(name).cast(typ, safe=False)
                    )
                else:
                    arrays.append(pa.nulls(len(tbl), type=typ))
                fields.append(pa.field(name, typ))
            out = pa.table(arrays, schema=pa.schema(fields))
            if partition.sidecar is not None:
                with open(
                    os.path.join(partition.root, partition.sidecar),
                    "rb",
                ) as fh:
                    masked = {int(p) for p in _decode_dv(fh.read())}
                if masked:
                    keep = pa.array(
                        [i not in masked for i in range(len(out))]
                    )
                    out = out.filter(keep)
            yield from out.to_batches()

    class CommitLogBatchDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "commitlog"

        def schema(self):
            import json as _json

            from calorista_spark.sources.commitlog import CommitLogStore

            store = CommitLogStore(self.options["path"])
            v = self.options.get("version")
            v = int(v) if v is not None else store.latest_version()
            if v is None:
                raise FileNotFoundError(
                    f"commit-log store at {self.options['path']} is empty"
                )
            return T.StructType.fromJson(
                _json.loads(store.manifest_meta(v)["schema"])
            )

        def reader(self, schema):
            return CommitLogBatchReader(self.options)

    return CommitLogBatchDataSource


def register_batch_source(spark: SparkSession) -> None:
    """Register format name ``commitlog`` on this session, enabling
    Python-source filter pushdown (required by Spark whenever a
    reader implements ``pushFilters``; a runtime SQL conf)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(make_commitlog_batch_datasource())
