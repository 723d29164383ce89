"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``calorista_spark``; this module only adapts
its registry to the driver's contract.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from calorista_spark.queries import QUERIES

    return QUERIES["daily_totals"](spark, "/root/testdata/sf0.001")


def _verification_rank(names: list[str]) -> dict[str, tuple]:
    """Sort key per query so the driver's fixed-size correctness window
    rotates across rounds: never-driver-verified names first, then names
    whose latest driver row was red (re-check fixes), then green names
    ordered by the round they were last verified in (oldest first).
    Within each tier, registry order is preserved.
    """
    last_round: dict[str, int] = {}
    last_green: dict[str, bool] = {}
    here = Path(__file__).resolve().parent
    for path in sorted(here.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            err = row.get("err")
            green = (
                (err is None or err == "no_oracle")
                and row.get("rows_match") is not False
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            )
            last_round[name] = rnd
            last_green[name] = green
    ranks: dict[str, tuple] = {}
    for idx, name in enumerate(names):
        if name not in last_round:
            ranks[name] = (0, 0, idx)
        elif not last_green[name]:
            ranks[name] = (1, 0, idx)
        else:
            ranks[name] = (2, last_round[name], idx)
    return ranks


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    the driver's correctness window covers unverified queries first."""
    from calorista_spark.queries import QUERIES

    names = list(QUERIES)
    ranks = _verification_rank(names)
    return {n: QUERIES[n] for n in sorted(names, key=ranks.__getitem__)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; keys absent here fall back
    to the driver's rows-only check (non-SQL-expressible ops)."""
    from calorista_spark.queries import ORACLES

    return dict(ORACLES)
