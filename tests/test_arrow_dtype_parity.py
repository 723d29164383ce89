"""Arrow-dtype parity for every oracle-checked query (r6).

The driver's value hash folds each column's arrow type family: r5's
one red row was identical int64 values hashed under DuckDB's
decimal128 (HUGEINT window sum). The value comparison in
test_oracle_parity can't see that — this one can, without collecting
the Spark side at all (schema analysis only).
"""

from __future__ import annotations

import pytest

from calorista_spark.queries import ORACLES, QUERIES
from tests.oracle_compare import compare_arrow_types


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_arrow_dtype_parity(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    problems = compare_arrow_types(df, ORACLES[name], sf_dir)
    assert not problems, f"{name}:\n" + "\n".join(problems)
