"""Pure-SQL query surface: the same engine driven entirely through
``spark.sql`` over the catalog's registered temp views — proof that
every capability is reachable from SQL text as well as the DataFrame
API (the reference's users could port either way).

Each query registers the views it needs via ``catalog.load_tables``
and submits one SQL string. Catalyst treats these identically to the
DataFrame forms (same plans, same pushdown), so no separate plan
audits are needed; the oracle SQL is near-verbatim the submitted SQL,
which also makes these the clearest parity demonstrations.

Includes a recursive CTE (Spark 4 ``WITH RECURSIVE``) building the
date spine — the declarative twin of ``sequence()+explode`` (O-R2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from calorista_spark.catalog import read_table
from calorista_spark.queries.registry import query


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for name in names:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


# ---------------------------------------------------------------------------
# Star join in SQL text.
# ---------------------------------------------------------------------------

_SQL_REVENUE = """
SELECT n.n_name,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000.0
                           + 0.5) AS DECIMAL(18,0))) AS DOUBLE) / 10000.0
         AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


@query("sql_revenue_by_nation", _SQL_REVENUE)
def sql_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-text form of the star join — identical plan to the
    DataFrame form (broadcast dims, one fact shuffle)."""
    _views(spark, sf_dir, "lineitem", "supplier", "nation")
    return spark.sql(_SQL_REVENUE)


# ---------------------------------------------------------------------------
# Window ranking in SQL text (top-3 parts per brand by price).
# ---------------------------------------------------------------------------

_SQL_TOP3 = """
SELECT p_brand, p_partkey, p_name, ROUND(p_retailprice, 2) AS p_retailprice
FROM (
  SELECT *, row_number() OVER (PARTITION BY p_brand
            ORDER BY p_retailprice DESC, p_partkey) AS rk
  FROM part
)
WHERE rk <= 3
ORDER BY p_brand, rk
"""


@query("sql_brand_top3_parts", _SQL_TOP3)
def sql_brand_top3_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed top-k through SQL text; ties broken on the part key so
    the top-3 set is a total order."""
    _views(spark, sf_dir, "part")
    return spark.sql(_SQL_TOP3)


# ---------------------------------------------------------------------------
# Recursive CTE date spine (Spark 4 WITH RECURSIVE) + null-preserving
# left join — the declarative twin of O-R2's sequence()+explode.
# ---------------------------------------------------------------------------

_SQL_RECURSIVE_SPINE = """
WITH RECURSIVE spine(day) AS (
  SELECT DATE '2024-01-01'
  UNION ALL
  SELECT CAST(day + INTERVAL 1 DAY AS DATE) FROM spine
  WHERE day < DATE '2024-01-31'
),
daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
  FROM events GROUP BY 1
)
SELECT CAST(s.day AS DATE) AS day, CAST(d.n_events AS BIGINT) AS n_events
FROM spine s LEFT JOIN daily d ON s.day = d.day
ORDER BY day
"""


@query("sql_recursive_date_spine", _SQL_RECURSIVE_SPINE)
def sql_recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE date spine left-joined onto daily event counts —
    missing days stay NULL (O-R2's null policy). The recursion depth
    is the calendar length, independent of data volume, so this stays
    a driver-side-tiny plan fragment at any scale."""
    _views(spark, sf_dir, "events")
    return spark.sql(_SQL_RECURSIVE_SPINE)
