"""L6: the Python escape hatch — Arrow-batched pandas UDFs, grouped
``applyInPandas``, and a Spark 4 UDTF (SURVEY §2.11 L6).

These exist to prove the extension surface works end-to-end; the
engine's own query set never needs them (test_plans.py pins the
no-Python invariant for everything else). Each one's math is
deterministic so even these are oracle-checked.
"""

# NOTE: no `from __future__ import annotations` here — pandas_udf
# resolves real type hints at decoration time; stringified ones break
# its signature parser.

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from calorista_spark.catalog import read_table
from calorista_spark.queries.registry import query

# ---------------------------------------------------------------------------
# Scalar pandas_udf: L2 norm of the embedding column via numpy.
# ---------------------------------------------------------------------------

_PANDAS_NORM_ORACLE = """
SELECT vec_id,
       ROUND(sqrt(list_sum(list_transform(list_zip(embedding, embedding),
             x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))), 6) AS norm
FROM embeddings
ORDER BY vec_id
"""


@query("embedding_norm_pandas_udf", _PANDAS_NORM_ORACLE)
def embedding_norm_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar pandas UDF (the 10-100× faster alternative
    to row-at-a-time Python UDFs). Rounded to 6 digits so numpy's
    pairwise summation and SQL's left fold agree."""
    import pandas as pd

    @F.pandas_udf(T.DoubleType())
    def vec_norm(s: pd.Series) -> pd.Series:
        import numpy as np

        return s.map(
            lambda v: float(np.sqrt(np.sum(np.asarray(v, dtype="float64") ** 2)))
        )

    emb = read_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.round(vec_norm("embedding"), 6).alias("norm")
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# Grouped-map applyInPandas: per-group z-scores.
# ---------------------------------------------------------------------------

_ZSCORE_ORACLE = """
SELECT event_id, event_type,
       ROUND((value - AVG(value) OVER (PARTITION BY event_type))
             / stddev_samp(value) OVER (PARTITION BY event_type), 4) + 0 AS zscore
FROM events
ORDER BY event_id
"""

_ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("zscore", T.DoubleType()),
    ]
)


@query("event_zscores_apply_in_pandas", _ZSCORE_ORACLE)
def event_zscores_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: whole-group pandas computation (the
    shape custom stateful/statistical operators take when they truly
    need pandas). One shuffle on the group key, Arrow both ways."""

    def zscore(pdf):
        mean = pdf["value"].mean()
        std = pdf["value"].std(ddof=1)  # matches stddev_samp
        out = pdf[["event_id", "event_type"]].copy()
        # + 0.0 collapses IEEE -0.0 (sign of a near-zero round depends
        # on accumulation order, which differs across engines)
        out["zscore"] = ((pdf["value"] - mean) / std).round(4) + 0.0
        return out

    events = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    return events.groupBy("event_type").applyInPandas(
        zscore, schema=_ZSCORE_SCHEMA
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Python UDTF (Spark 4): 1-row → N-rows word positions.
# ---------------------------------------------------------------------------

_UDTF_ORACLE = """
WITH t AS (
  -- empty tokens filtered: the UDTF uses python str.split(), which
  -- drops leading/trailing empties that a regex split keeps
  -- (r6 whitespace-edge audit); null text => no rows on both sides
  SELECT doc_id,
         list_filter(string_split_regex(lower(COALESCE(text, '')), '\\s+'),
                     x -> x <> '') AS w
  FROM documents WHERE doc_id < 10
)
SELECT doc_id,
       CAST(generate_subscripts(w, 1) AS INTEGER) AS pos,
       unnest(w) AS word
FROM t
ORDER BY doc_id, pos
"""


@query("doc_word_positions_udtf", _UDTF_ORACLE)
def doc_word_positions_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: the table-function extension point (Spark 4
    ``udtf``), emitting (pos, word) rows per document.
    ``useArrow=True``: rows cross the JVM↔Python boundary as Arrow
    batches (ArrowEvalPythonUDTF) instead of pickled rows — the last
    row-at-a-time Python stage in the registry, removed r6 (the
    bench-visible cost at 10 docs is nil; the plan shape is the
    point)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, word string", useArrow=True)
    class WordPositions:
        def eval(self, text: str):
            if text is None:
                return
            for i, w in enumerate(text.lower().split()):
                yield i + 1, w

    spark.udtf.register("word_positions", WordPositions)
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, wp.pos, wp.word
        FROM _udtf_docs d, LATERAL word_positions(d.text) wp
        ORDER BY d.doc_id, wp.pos
        """
    )


# ---------------------------------------------------------------------------
# Grouped-AGG pandas_udf: many rows -> one scalar per group — the
# fourth UDF shape (scalar / grouped-map / UDTF / grouped-agg).
# ---------------------------------------------------------------------------

_GEOMEAN_ORACLE = """
SELECT event_type,
       FLOOR(exp(AVG(ln(value))) * 1e4 + 0.5) / 1e4 AS geo_mean_value
FROM events
WHERE value > 0
GROUP BY event_type
ORDER BY event_type
"""


@query("event_geomean_grouped_agg_udf", _GEOMEAN_ORACLE)
def event_geomean_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas_udf (Arrow batches in, ONE scalar out
    per group): geometric mean of event values per type. Spark plans
    it as a real aggregate node (ArrowAggregatePython). Note: grouped-
    aggregate pandas UDFs do NOT support partial aggregation — each
    group's rows are fully materialized in the Python worker; the win
    over grouped-map is plan shape (one scalar out per group instead
    of a whole re-emitted frame), not map-side combine. The log-mean is
    FLOOR-quantized on both sides (magnitude-bounded output, mean
    noise ~1e-13, registry conventions)."""
    import numpy as np
    import pandas as pd

    @F.pandas_udf(T.DoubleType())
    def geomean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))

    events = read_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("value") > 0)
        .groupBy("event_type")
        .agg(geomean("value").alias("__g"))
        .select(
            "event_type",
            (F.floor(F.col("__g") * 1e4 + F.lit(0.5)) / 1e4).alias(
                "geo_mean_value"
            ),
        )
        .orderBy("event_type")
    )
