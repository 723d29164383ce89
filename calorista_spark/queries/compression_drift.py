"""Embedding compression and corpus-distribution drift — Tier-B
(north-star) ops for the 100 TB vector/curation stack.

- Int8 scalar quantization is how production ANN indexes shrink 100 TB
  of float32 vectors 4× before sharding: per-dimension min/max reduce
  to a 64-value table (corpus-size independent, broadcast back), then
  encode/decode is a stateless per-row pass. The query reports the
  per-vector reconstruction error so the quality cost is observable.
  Bucket edges use floor(), not round(), so no half-way rounding-mode
  divergence between engines can move a code point.
- Split drift compares the source composition of the train vs test
  hash splits (same rule as doc_train_test_split) with per-source KL
  contributions — the check that a hash split didn't skew the mixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.queries.registry import query

# ---------------------------------------------------------------------------
# Int8 scalar quantization + reconstruction error.
# code_i = min(255, floor((x_i - dmin_i) / (dmax_i - dmin_i) * 256));
# dequant_i = dmin_i + (code_i + 0.5) * (dmax_i - dmin_i) / 256.
# ---------------------------------------------------------------------------

_QUANT_ORACLE = """
WITH dims AS (
  SELECT CAST(unnest(range(1, 65)) AS INTEGER) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
),
bounds AS (
  SELECT dim, MIN(val) AS dmin, MAX(val) AS dmax FROM dims GROUP BY dim
),
barr AS (
  SELECT list(dmin ORDER BY dim) AS mins, list(dmax ORDER BY dim) AS maxs
  FROM bounds
),
err AS (
  SELECT e.vec_id,
         CAST(LEAST(255, floor((CAST(e.embedding[1] AS DOUBLE) - b.mins[1])
              / (b.maxs[1] - b.mins[1]) * 256)) AS INTEGER) AS first_code,
         list_sum(list_transform(range(1, 65), i ->
           (CAST(e.embedding[i] AS DOUBLE)
            - (b.mins[i]
               + (LEAST(255, floor((CAST(e.embedding[i] AS DOUBLE) - b.mins[i])
                   / (b.maxs[i] - b.mins[i]) * 256)) + CAST(0.5 AS DOUBLE))
                 * (b.maxs[i] - b.mins[i]) / 256))
           * (CAST(e.embedding[i] AS DOUBLE)
            - (b.mins[i]
               + (LEAST(255, floor((CAST(e.embedding[i] AS DOUBLE) - b.mins[i])
                   / (b.maxs[i] - b.mins[i]) * 256)) + CAST(0.5 AS DOUBLE))
                 * (b.maxs[i] - b.mins[i]) / 256))))
           / 64 AS mse
  FROM embeddings e CROSS JOIN barr b
)
SELECT vec_id, first_code, ROUND(mse, 6) AS quant_mse
FROM err
ORDER BY vec_id
"""


@query("embedding_int8_quant_error", _QUANT_ORACLE)
def embedding_int8_quant_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension int8 scalar quantization: the 64-row min/max
    bounds table aggregates map-side and broadcasts back, so
    encode + reconstruction-error measurement is one stateless narrow
    pass over the vectors — the exact shape that survives a 100 TB
    corpus (bounds cost is independent of corpus size)."""
    emb = read_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        F.posexplode("embedding").alias("pos", "val")
    ).select((F.col("pos") + 1).alias("dim"), F.col("val").cast("double").alias("val"))
    bounds = dims.groupBy("dim").agg(
        F.min("val").alias("dmin"), F.max("val").alias("dmax")
    )
    barr = bounds.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "dmin"))), lambda s: s.dmin
        ).alias("mins"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "dmax"))), lambda s: s.dmax
        ).alias("maxs"),
    )

    def at(arr: str, i):
        return F.element_at(F.col(arr), i)

    idx = F.sequence(F.lit(1), F.lit(64))
    code = lambda i: F.least(  # noqa: E731
        F.lit(255),
        F.floor(
            (at("embedding", i).cast("double") - at("mins", i))
            / (at("maxs", i) - at("mins", i))
            * 256
        ),
    )
    dequant = lambda i: at("mins", i) + (code(i) + 0.5) * (  # noqa: E731
        at("maxs", i) - at("mins", i)
    ) / 256
    sq_err = F.aggregate(
        F.transform(
            idx,
            lambda i: (at("embedding", i).cast("double") - dequant(i))
            * (at("embedding", i).cast("double") - dequant(i)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        emb.join(F.broadcast(barr))
        .select(
            "vec_id",
            code(F.lit(1)).cast("int").alias("first_code"),
            F.round(sq_err / 64, 6).alias("quant_mse"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# Train/test split drift: per-source composition + KL contribution.
# Split rule matches doc_train_test_split (md5 first hex char < 'c').
# ---------------------------------------------------------------------------

_DRIFT_ORACLE = """
WITH labeled AS (
  SELECT source,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' AS is_train
  FROM documents
),
per_source AS (
  SELECT source,
         CAST(COUNT(*) FILTER (WHERE is_train) AS BIGINT) AS n_train,
         CAST(COUNT(*) FILTER (WHERE NOT is_train) AS BIGINT) AS n_test
  FROM labeled GROUP BY source
),
tot AS (
  SELECT SUM(n_train) AS t_train, SUM(n_test) AS t_test FROM per_source
)
SELECT source, n_train, n_test,
       ROUND(n_train * 1.0 / t.t_train, 4) AS train_share,
       ROUND(n_test * 1.0 / t.t_test, 4) AS test_share,
       ROUND((n_train * 1.0 / t.t_train)
             * ln((n_train * 1.0 / t.t_train) / (n_test * 1.0 / t.t_test)), 6)
         AS kl_contrib
FROM per_source CROSS JOIN tot t
ORDER BY source
"""


@query("corpus_split_drift", _DRIFT_ORACLE)
def corpus_split_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did the hash split preserve the source mixture? Per-source
    train/test shares plus the per-source KL(train‖test) contribution.
    One groupBy(source) (tiny output) and a one-row totals frame
    broadcast back — no per-document state anywhere."""
    docs = read_table(spark, sf_dir, "documents")
    labeled = docs.select(
        "source",
        (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "c").alias(
            "is_train"
        ),
    )
    per_source = labeled.groupBy("source").agg(
        F.count(F.when(F.col("is_train"), 1)).alias("n_train"),
        F.count(F.when(~F.col("is_train"), 1)).alias("n_test"),
    )
    tot = per_source.agg(
        F.sum("n_train").alias("t_train"), F.sum("n_test").alias("t_test")
    )
    p = F.col("n_train") * 1.0 / F.col("t_train")
    q = F.col("n_test") * 1.0 / F.col("t_test")
    return (
        per_source.join(F.broadcast(tot))
        .select(
            "source",
            "n_train",
            "n_test",
            F.round(p, 4).alias("train_share"),
            F.round(q, 4).alias("test_share"),
            F.round(p * F.log(p / q), 6).alias("kl_contrib"),
        )
        .orderBy("source")
    )
