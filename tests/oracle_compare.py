"""Replicates the driver's DuckDB-oracle comparison locally.

The driver (per ``__spark_entry__.py`` contract) compares row count +
schema + order-insensitive value hash between each Spark query and its
DuckDB oracle SQL. We reproduce that as an exact comparison over
normalized sorted rows: if this passes, any reasonable value-hash
passes too. A looser float-tolerance diff is reported on failure to
distinguish "rounding convention broke" from "wrong semantics".
"""

from __future__ import annotations

import datetime
import math
from typing import Any

import duckdb

from calorista_spark.catalog import TABLES, table_path


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    rel = con.sql(sql)
    return [d[0] for d in rel.description], rel.fetchall()


def _norm_value(v: Any) -> Any:
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # deliberately does NOT collapse -0.0: the driver's value hash
        # may distinguish it, so queries must normalize signed zeros
        # themselves ("+ 0.0" after round — see registry conventions)
        return repr(v)
    if isinstance(v, list):
        return tuple(_norm_value(x) for x in v)
    return v


def _norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Column-name-sorted, row-sorted normalization (order-insensitive)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def compare(
    spark_df, oracle_sql: str, sf_dir: str, float_tol: float = 1e-6
) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    problems: list[str] = []
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)

    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"schema mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}")

    sn = _norm_rows(s_cols, s_rows)
    on = _norm_rows(o_cols, o_rows)
    if sn == on:
        return problems

    # exact mismatch — find first differing row for diagnostics
    for i, (a, b) in enumerate(zip(sn, on)):
        if a != b:
            close = _rows_close(a, b, float_tol)
            problems.append(
                f"value mismatch at sorted row {i}:\n  spark : {a}\n  oracle: {b}\n"
                f"  (within float tol {float_tol}: {close})"
            )
            break
    else:
        problems.append("row sets differ in tail rows")
    return problems


def _rows_close(a: tuple, b: tuple, tol: float) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        try:
            fx, fy = float(x), float(y)
            if not math.isclose(fx, fy, rel_tol=tol, abs_tol=tol):
                return False
        except (TypeError, ValueError):
            if x != y:
                return False
    return True


# ---------------------------------------------------------------------------
# Arrow-dtype parity (r6): the driver's value hash folds the arrow
# TYPE FAMILY of each column, not just the Python values — r5's one
# red row (doc_token_budget_selection) was int64 values hashed under
# decimal128 on the DuckDB side (HUGEINT window sum). Values matched;
# the hash didn't. This check catches that class locally: canonical
# arrow type of every oracle column must equal the canonical type of
# the Spark schema. Int widths are compared strictly (cheap to align,
# see functions/dates.py casts) even though the driver tolerates them.
# ---------------------------------------------------------------------------


def canon_arrow_type(t) -> str:
    """pyarrow DataType → canonical family string."""
    s = str(t)
    if s.startswith(("string", "large_string")):
        return "string"
    if s.startswith("date"):
        return "date"
    if s.startswith("timestamp"):
        return "timestamp"
    if s.startswith(("list", "large_list")):
        return f"list<{canon_arrow_type(t.value_type)}>"
    if s.startswith("decimal"):
        return f"decimal({t.precision},{t.scale})"
    return s


def canon_spark_type(dt) -> str:
    """Spark DataType → the arrow family Spark's collect emits."""
    import pyspark.sql.types as T

    if isinstance(dt, T.LongType):
        return "int64"
    if isinstance(dt, T.IntegerType):
        return "int32"
    if isinstance(dt, T.ShortType):
        return "int16"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"list<{canon_spark_type(dt.elementType)}>"
    return str(dt)


def compare_arrow_types(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Return per-column canonical-dtype mismatches (empty == parity).

    Spark side is schema-only (no job); the oracle runs at the test SF
    (cheap) because DuckDB exposes result arrow types only on execute.
    """
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    oschema = con.sql(oracle_sql).arrow().schema
    otypes = {f.name: canon_arrow_type(f.type) for f in oschema}
    stypes = {
        f.name: canon_spark_type(f.dataType) for f in spark_df.schema.fields
    }
    problems = []
    for c in sorted(set(otypes) | set(stypes)):
        a, b = stypes.get(c), otypes.get(c)
        if a != b:
            problems.append(f"column {c!r}: spark={a} oracle={b}")
    return problems
