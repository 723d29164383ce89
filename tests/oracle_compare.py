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
