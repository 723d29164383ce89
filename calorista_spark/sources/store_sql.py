"""SQL-text DML dispatcher + catalog naming for commit-log stores
(r14 — VERDICT r13 #3 and #8).

Why a dispatcher exists at all: Spark's Python DataSource API has no
writable hook for SQL DML — ``MERGE INTO`` / ``UPDATE`` / ``DELETE``
text submitted to ``spark.sql`` resolves against Spark's catalog,
which cannot route mutations to a Python-implemented source. READS
are fully native (``spark.read.format("commitlog")`` → temp view →
arbitrary ``spark.sql``); for DML-as-SQL-text, :func:`store_sql`
parses the documented grammar below and dispatches to the library
faces (:meth:`CommitLogStore.merge` / :meth:`delete_where` /
:meth:`update_where`), which carry all the OCC / replay-ledger /
deletion-vector machinery. README.md states exactly which SQL surface
is native vs shimmed.

Catalog naming (#8): stores register under names
(:func:`register_store`), any grammar position that takes a table
accepts ``commitlog.<name>`` as well as ``commitlog.`/abs/path```,
and :func:`register_store_views` publishes every registered store as
a temp view for native SQL reads — so ``spark.sql`` text stops
hard-coding filesystem paths.

Supported DML grammar (case-insensitive keywords)::

    DELETE FROM commitlog.<table> WHERE <pred>
    UPDATE commitlog.<table> SET col = <spark-sql-expr>[, ...]
        WHERE <pred>
    INSERT INTO commitlog.<table> (<select ...>) | <view-name>
    RESTORE TABLE commitlog.<table> TO VERSION AS OF <n>
    RESTORE TABLE commitlog.<table> TO TIMESTAMP AS OF '<iso-ts>'
    OPTIMIZE commitlog.<table> [ZORDER BY (c1[, c2 ...])]
    VACUUM commitlog.<table> [RETAIN <n> VERSIONS]
    ALTER TABLE commitlog.<table> ADD CONSTRAINT <name> CHECK (<expr>)
    ALTER TABLE commitlog.<table> DROP CONSTRAINT <name>

Read side: :func:`store_sql_query` runs arbitrary SELECT text where
any ``commitlog.<table>`` reference may carry ``VERSION AS OF <n>`` /
``TIMESTAMP AS OF '<iso-ts>'`` — rewritten to snapshot-pinned views
over the batch DataSource, then executed natively.
    MERGE INTO commitlog.<table> [AS] t
        USING (<select ...>) | <view-name> [AS] s
        ON t.k = s.k [AND t.k2 = s.k2 ...]
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *

``<table>`` = a registered name or a backtick-quoted path.
``<pred>`` = AND-conjunction of ``col <op> <lit>``, ``col BETWEEN
<lit> AND <lit>``, ``col IN (<lit>, ...)`` with op in ``= == < <= >
>=`` — exactly the store's pruning grammar (``files_for``), so every
SQL predicate is also a data-skipping predicate; richer predicates
raise with this explanation rather than silently scanning the table.
``<lit>`` = number, 'string', DATE 'yyyy-mm-dd', TIMESTAMP '...',
TRUE/FALSE. UPDATE's right-hand sides are arbitrary Spark SQL
expressions (they run through ``F.expr`` on the matched rows, not
through pruning). The MERGE form is the keyed upsert-all
(``WHEN MATCHED UPDATE SET * / WHEN NOT MATCHED INSERT *``) — the
semantic :meth:`CommitLogStore.merge` implements; row-conditional
merge clauses are not part of the store's merge contract and raise.

An optional trailing ``OPTIONS (batch_id = <int>)`` rides the replay
ledger, making SQL-text DML exactly-once under retries too.
"""

from __future__ import annotations

import datetime as _dt
import re

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Catalog naming (#8): process-level name → path registry.
# ---------------------------------------------------------------------------

_STORES: dict[str, str] = {}

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def register_store(name: str, path: str) -> None:
    """Register ``path`` under a catalog ``name``; later SQL refers to
    ``commitlog.<name>`` and :func:`register_store_views` exposes it
    for native reads."""
    if not _NAME_RE.match(name):
        raise ValueError(
            f"store name {name!r} must be a bare identifier "
            "(letters/digits/_, not starting with a digit)"
        )
    import os

    _STORES[name] = os.path.abspath(path)


def unregister_store(name: str) -> None:
    _STORES.pop(name, None)


def registered_stores() -> dict[str, str]:
    return dict(_STORES)


def store_path(name: str) -> str:
    try:
        return _STORES[name]
    except KeyError:
        raise KeyError(
            f"no store registered under {name!r}; call "
            "register_store(name, path) first "
            f"(registered: {sorted(_STORES)})"
        ) from None


def register_store_views(
    spark: SparkSession, names: list[str] | None = None
) -> list[str]:
    """Publish each registered store as a temp view (via the batch
    DataSource, so DV masking / column mapping / time travel defaults
    all apply) — ``spark.sql("SELECT ... FROM <name>")`` reads the
    current snapshot with no path in sight. Returns the view names.

    Views are SNAPSHOT-PINNED: the DataSource resolves the store
    version once at load (deliberate — planning can never straddle a
    commit landing mid-query; ADVICE r12), so a view registered here
    keeps reading the version current at registration. Re-run this
    after DML to advance the published views — the store_sql DML faces
    never read through views, so they are unaffected."""
    from calorista_spark.sources.commitlog_batch import load_snapshot_df

    out = []
    for name in sorted(names if names is not None else _STORES):
        path = store_path(name)
        # r15: memoized load — re-registering views over an unchanged
        # snapshot (every bench pass does) reuses the plan object
        # instead of paying the Python DataSource's schema round trip
        load_snapshot_df(spark, path).createOrReplaceTempView(name)
        out.append(name)
    return out


# ---------------------------------------------------------------------------
# Literal / predicate parsing (the store's files_for grammar).
# ---------------------------------------------------------------------------

_LIT_RE = re.compile(
    r"""\s*(?:
        (?P<date>DATE\s*'(?P<date_v>[^']*)')
      | (?P<ts>TIMESTAMP\s*'(?P<ts_v>[^']*)')
      | (?P<str>'(?P<str_v>(?:[^']|'')*)')
      | (?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
      | (?P<bool>TRUE|FALSE)
      | (?P<null>NULL)
    )""",
    re.IGNORECASE | re.VERBOSE,
)


def _parse_literal(s: str, pos: int):
    m = _LIT_RE.match(s, pos)
    if not m:
        raise ValueError(f"expected a literal at: {s[pos:pos + 40]!r}")
    if m.group("null") is not None:
        raise ValueError(
            "NULL comparisons are not prunable predicates; the store "
            "grammar (files_for) takes non-null literals only"
        )
    if m.group("date") is not None:
        val = _dt.date.fromisoformat(m.group("date_v"))
    elif m.group("ts") is not None:
        val = _dt.datetime.fromisoformat(m.group("ts_v"))
    elif m.group("str") is not None:
        val = m.group("str_v").replace("''", "'")
    elif m.group("bool") is not None:
        val = m.group("bool").upper() == "TRUE"
    else:
        n = m.group("num")
        val = float(n) if ("." in n or "e" in n or "E" in n) else int(n)
    return val, m.end()


_COL_RE = re.compile(r"\s*(?:`(?P<q>[^`]+)`|(?P<b>[A-Za-z_][A-Za-z0-9_]*))")
_OP_RE = re.compile(r"\s*(==|=|<=|>=|<>|!=|<|>|\bBETWEEN\b|\bIN\b)", re.IGNORECASE)
_AND_RE = re.compile(r"\s*AND\b", re.IGNORECASE)


def parse_predicates(text: str) -> list[tuple]:
    """WHERE text → the store's ``(col, op, val)`` predicate list.
    Conjunctions only: every term is ALSO a pruning predicate, so the
    DML plans O(matching files). Anything richer raises loudly."""
    preds: list[tuple] = []
    pos = 0
    n = len(text)
    while True:
        m = _COL_RE.match(text, pos)
        if not m:
            raise ValueError(
                f"expected a column name at: {text[pos:pos + 40]!r}"
            )
        col = m.group("q") or m.group("b")
        pos = m.end()
        om = _OP_RE.match(text, pos)
        if not om:
            raise ValueError(
                f"expected an operator after {col!r} at: "
                f"{text[pos:pos + 40]!r}"
            )
        op = om.group(1).upper()
        pos = om.end()
        if op in ("=", "=="):
            val, pos = _parse_literal(text, pos)
            preds.append((col, "==", val))
        elif op in ("<", "<=", ">", ">="):
            val, pos = _parse_literal(text, pos)
            preds.append((col, op, val))
        elif op in ("<>", "!="):
            raise ValueError(
                "'!=' is not a prunable store predicate (files_for "
                "grammar: == < <= > >= BETWEEN IN); rewrite the DML "
                "or use the library face with a residual filter"
            )
        elif op == "BETWEEN":
            lo, pos = _parse_literal(text, pos)
            am = _AND_RE.match(text, pos)
            if not am:
                raise ValueError("BETWEEN requires 'lo AND hi'")
            pos = am.end()
            hi, pos = _parse_literal(text, pos)
            preds.append((col, "between", (lo, hi)))
        else:  # IN
            m2 = re.compile(r"\s*\(").match(text, pos)
            if not m2:
                raise ValueError("IN requires a parenthesized list")
            pos = m2.end()
            vals = []
            while True:
                v, pos = _parse_literal(text, pos)
                vals.append(v)
                m3 = re.compile(r"\s*(,|\))").match(text, pos)
                if not m3:
                    raise ValueError("IN list: expected ',' or ')'")
                pos = m3.end()
                if m3.group(1) == ")":
                    break
            preds.append((col, "in", vals))
        am = _AND_RE.match(text, pos)
        if am:
            pos = am.end()
            continue
        if text[pos:].strip():
            raise ValueError(
                "only AND-conjunctions of prunable terms are supported "
                f"in SQL DML predicates; leftover: {text[pos:].strip()[:60]!r}"
            )
        if pos >= n or not text[pos:].strip():
            return preds


# ---------------------------------------------------------------------------
# Statement parsing + dispatch.
# ---------------------------------------------------------------------------

_TABLE_PAT = r"commitlog\.(?:`(?P<path>[^`]+)`|(?P<name>[A-Za-z_][A-Za-z0-9_]*))"

_OPTIONS_RE = re.compile(
    r"\s*OPTIONS\s*\(\s*batch_id\s*=\s*(?P<bid>\d+)\s*\)\s*$",
    re.IGNORECASE,
)

_DELETE_RE = re.compile(
    rf"^\s*DELETE\s+FROM\s+{_TABLE_PAT}\s+WHERE\s+(?P<pred>.+?)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_UPDATE_RE = re.compile(
    rf"^\s*UPDATE\s+{_TABLE_PAT}\s+SET\s+(?P<set>.+?)\s+"
    r"WHERE\s+(?P<pred>.+?)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_RE = re.compile(
    rf"^\s*INSERT\s+INTO\s+{_TABLE_PAT}\s+"
    r"(?:\((?P<sub>.+)\)|(?P<view>[A-Za-z_][A-Za-z0-9_]*))\s*$",
    re.IGNORECASE | re.DOTALL,
)
_RESTORE_RE = re.compile(
    rf"^\s*RESTORE\s+TABLE\s+{_TABLE_PAT}\s+TO\s+"
    r"(?:VERSION\s+AS\s+OF\s+(?P<ver>\d+)"
    r"|TIMESTAMP\s+AS\s+OF\s+(?:TIMESTAMP\s+)?'(?P<ts>[^']+)')\s*$",
    re.IGNORECASE | re.DOTALL,
)
_OPTIMIZE_RE = re.compile(
    rf"^\s*OPTIMIZE\s+{_TABLE_PAT}"
    r"(?:\s+ZORDER\s+BY\s*\(\s*(?P<zcols>[^)]+?)\s*\))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ADD_CONSTRAINT_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+{_TABLE_PAT}\s+ADD\s+CONSTRAINT\s+"
    r"(?P<cname>[A-Za-z_][A-Za-z0-9_]*)\s+CHECK\s*\((?P<expr>.+)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_CONSTRAINT_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+{_TABLE_PAT}\s+DROP\s+CONSTRAINT\s+"
    r"(?P<cname>[A-Za-z_][A-Za-z0-9_]*)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_VACUUM_RE = re.compile(
    rf"^\s*VACUUM\s+{_TABLE_PAT}"
    r"(?:\s+RETAIN\s+(?P<keep>\d+)\s+VERSIONS)?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_MERGE_RE = re.compile(
    rf"^\s*MERGE\s+INTO\s+{_TABLE_PAT}"
    r"(?:\s+AS)?\s+(?P<t>[A-Za-z_][A-Za-z0-9_]*)\s+"
    r"USING\s+(?:\((?P<sub>.+)\)|(?P<view>[A-Za-z_][A-Za-z0-9_]*))"
    r"(?:\s+AS)?\s+(?P<s>[A-Za-z_][A-Za-z0-9_]*)\s+"
    r"ON\s+(?P<on>.+?)\s+"
    r"WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+"
    r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _resolve_table(m: re.Match) -> str:
    import os

    path = m.group("path")
    if path is not None:
        return os.path.abspath(path)
    return store_path(m.group("name"))


def _split_top_level_commas(s: str) -> list[str]:
    out, depth, start, quote = [], 0, 0, None
    for i, ch in enumerate(s):
        if quote:
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"', "`"):
            quote = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(s[start:i])
            start = i + 1
    out.append(s[start:])
    return [p.strip() for p in out if p.strip()]


def _parse_on_keys(on: str, t: str, s: str) -> list[str]:
    keys = []
    for term in re.split(r"\s+AND\s+", on.strip(), flags=re.IGNORECASE):
        m = re.match(
            r"^\s*([A-Za-z_][A-Za-z0-9_]*)\.`?([A-Za-z_][A-Za-z0-9_]*)`?"
            r"\s*=\s*([A-Za-z_][A-Za-z0-9_]*)\.`?([A-Za-z_][A-Za-z0-9_]*)`?\s*$",
            term,
        )
        if not m:
            raise ValueError(
                f"MERGE ON terms must be '<t>.col = <s>.col'; got {term!r}"
            )
        a_al, a_col, b_al, b_col = m.groups()
        if {a_al, b_al} != {t, s}:
            raise ValueError(
                f"ON term {term!r} must reference aliases {t!r} and {s!r}"
            )
        if a_col != b_col:
            raise ValueError(
                "MERGE keys must share the column name on both sides "
                f"(the store's keyed-merge contract); got {term!r}"
            )
        keys.append(a_col)
    return keys


_TT_REF_RE = re.compile(
    rf"{_TABLE_PAT}"
    r"(?:\s+VERSION\s+AS\s+OF\s+(?P<ver>\d+)"
    r"|\s+TIMESTAMP\s+AS\s+OF\s+(?:TIMESTAMP\s+)?'(?P<ts>[^']+)')?",
    re.IGNORECASE,
)


def store_sql_query(spark: SparkSession, sql: str):
    """Arbitrary ``spark.sql`` SELECT text over commit-log stores with
    Delta-style time travel (r14): every ``commitlog.<name>`` or
    ``commitlog.`/path``` reference — optionally suffixed ``VERSION AS
    OF <n>`` or ``TIMESTAMP AS OF '<iso-ts>'`` (naive = UTC) — is
    rewritten to a snapshot-pinned temp view over the batch
    DataSource, then the rewritten text runs natively (Catalyst
    pushdown, DV masking, column mapping all apply; two references at
    different versions compose in one statement, e.g. a
    version-over-version diff join). Returns the DataFrame. Reads
    only — DML text goes through :func:`store_sql`."""
    import hashlib
    import os

    from calorista_spark.sources.commitlog import CommitLogStore
    from calorista_spark.sources.commitlog_batch import (
        register_batch_source,
    )

    register_batch_source(spark)

    def repl(m: re.Match) -> str:
        path = (
            os.path.abspath(m.group("path"))
            if m.group("path") is not None
            else store_path(m.group("name"))
        )
        ver = m.group("ver")
        if m.group("ts") is not None:
            ts = _dt.datetime.fromisoformat(m.group("ts"))
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=_dt.timezone.utc)
            ver = str(CommitLogStore(path).version_as_of(ts.timestamp()))
        tag = hashlib.md5(f"{path}@{ver}".encode()).hexdigest()[:12]
        view = f"__cl_tt_{tag}"
        from calorista_spark.sources.commitlog_batch import (
            load_snapshot_df,
        )

        load_snapshot_df(spark, path, version=ver).createOrReplaceTempView(
            view
        )
        return view

    return spark.sql(_TT_REF_RE.sub(repl, sql))


def store_sql(spark: SparkSession, sql: str) -> int:
    """Execute one DML statement from the documented grammar against a
    commit-log store; returns the store's resulting version. See the
    module docstring for the exact surface and why this is a
    dispatcher rather than native ``spark.sql``."""
    from calorista_spark.sources.commitlog import CommitLogStore

    batch_id = None
    om = _OPTIONS_RE.search(sql)
    if om:
        batch_id = int(om.group("bid"))
        sql = sql[: om.start()]

    m = _DELETE_RE.match(sql)
    if m:
        store = CommitLogStore(_resolve_table(m))
        return store.delete_where(
            spark, parse_predicates(m.group("pred")), batch_id=batch_id
        )

    m = _UPDATE_RE.match(sql)
    if m:
        store = CommitLogStore(_resolve_table(m))
        assignments = {}
        for part in _split_top_level_commas(m.group("set")):
            am = re.match(
                r"^\s*`?([A-Za-z_][A-Za-z0-9_]*)`?\s*=\s*(.+)$",
                part,
                re.DOTALL,
            )
            if not am:
                raise ValueError(f"bad SET assignment: {part!r}")
            assignments[am.group(1)] = F.expr(am.group(2).strip())
        return store.update_where(
            spark,
            parse_predicates(m.group("pred")),
            assignments,
            batch_id=batch_id,
        )

    m = _RESTORE_RE.match(sql)
    if m:
        store = CommitLogStore(_resolve_table(m))
        if m.group("ver") is not None:
            return store.restore(int(m.group("ver")))
        ts = _dt.datetime.fromisoformat(m.group("ts"))
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        return store.restore(as_of=ts.timestamp())

    m = _OPTIMIZE_RE.match(sql)
    if m:
        store = CommitLogStore(_resolve_table(m))
        z = m.group("zcols")
        if z is not None:
            cols = [
                c.strip().strip("`") for c in z.split(",") if c.strip()
            ]
            return store.compact(
                spark, cluster_by=cols, layout="zorder", max_retries=2
            )
        return store.compact(spark, max_retries=2)

    m = _ADD_CONSTRAINT_RE.match(sql)
    if m:
        store = CommitLogStore(_resolve_table(m))
        return store.add_constraint(
            spark, m.group("cname"), m.group("expr").strip()
        )

    m = _DROP_CONSTRAINT_RE.match(sql)
    if m:
        store = CommitLogStore(_resolve_table(m))
        return store.drop_constraint(m.group("cname"))

    m = _VACUUM_RE.match(sql)
    if m:
        store = CommitLogStore(_resolve_table(m))
        keep = m.group("keep")
        store.vacuum(
            keep_versions=int(keep) if keep is not None else None
        )
        return store.latest_version()

    m = _MERGE_RE.match(sql)
    if m:
        store = CommitLogStore(_resolve_table(m))
        keys = _parse_on_keys(m.group("on"), m.group("t"), m.group("s"))
        src = (
            spark.sql(m.group("sub"))
            if m.group("sub") is not None
            else spark.table(m.group("view"))
        )
        # r15 (guide §6 — small files): the SQL MERGE face always
        # optimizes its write. A SQL source is an arbitrary plan whose
        # task count leaks into the staged write (one file per task ×
        # touched partition — measured 3.3 s vs 1.6 s for the library
        # merge on the same batch); the AQE-sized optimize_write
        # exchange lands O(1) files per partition value at any scale.
        # Layout-only: commit contents and results are unchanged.
        return store.merge(
            spark, src, keys, batch_id=batch_id, optimize_write=True
        )

    m = _INSERT_RE.match(sql)
    if m:
        store = CommitLogStore(_resolve_table(m))
        # commit() records batch ids but doesn't replay-skip (its
        # overwrite face is used by bootstraps); the SQL INSERT face
        # IS a retried-pipeline surface, so skip here
        if batch_id is not None:
            high = store.last_batch_id()
            if high is not None and batch_id <= high:
                return store.latest_version()
        src = (
            spark.sql(m.group("sub"))
            if m.group("sub") is not None
            else spark.table(m.group("view"))
        )
        return store.commit(src, op="append", batch_id=batch_id)

    raise ValueError(
        "unrecognized store DML; supported statements are the "
        "documented subset (module docstring of "
        "calorista_spark.sources.store_sql): DELETE FROM commitlog.<t> "
        "WHERE ..., UPDATE commitlog.<t> SET ... WHERE ..., MERGE INTO "
        "commitlog.<t> t USING <src> s ON t.k = s.k WHEN MATCHED THEN "
        "UPDATE SET * WHEN NOT MATCHED THEN INSERT *, RESTORE TABLE "
        "commitlog.<t> TO VERSION AS OF n, OPTIMIZE commitlog.<t> "
        "[ZORDER BY (...)], VACUUM commitlog.<t> [RETAIN n VERSIONS]"
    )
