"""Drive every registered query through the DuckDB-oracle comparison —
the local replica of the driver's t2 correctness gate (sf0.001 here;
the driver re-runs at sf0.01)."""

from __future__ import annotations

import pytest

from calorista_spark.queries import ORACLES, QUERIES
from tests.oracle_compare import compare

SQL_CHECKED = sorted(ORACLES)
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    problems = compare(df, ORACLES[name], sf_dir)
    assert not problems, f"{name}:\n" + "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    # every query key has either an oracle or is explicitly rows-only
    assert set(e.oracle_sql()) <= set(e.queries())


def test_no_equality_against_rounded_double_aggregate():
    """Conventions lint (r7, from the Q15 flake): an oracle that
    compares a value FOR EQUALITY against an aggregate of itself
    (`= (SELECT MAX/MIN ...)`) must not build that value with
    ROUND(SUM(...)) — round-of-double-sum lands on .xxxx5 boundaries
    nondeterministically under parallel accumulation, so the CTE's
    two evaluations can disagree with each other (observed: Q15's
    oracle returning zero rows on the magnitude-stress data). Use the
    quantized-sum rendering instead."""
    import re

    from calorista_spark.queries import ORACLES

    offenders = []
    for name, sql in ORACLES.items():
        if re.search(r"=\s*\(\s*SELECT\s+(MAX|MIN)\b", sql, re.I) and re.search(
            r"ROUND\s*\(\s*SUM\s*\(", sql, re.I
        ):
            offenders.append(name)
    assert not offenders, (
        f"equality against a ROUND(SUM(double)) aggregate in: {offenders} "
        "— use the quantized-sum rendering (registry conventions)"
    )
