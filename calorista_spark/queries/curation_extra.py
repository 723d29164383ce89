"""Curation extras: sequence packing, fuzzy name matching, and
higher-order array functions — the remaining dataset-assembly ops on
the Tier-B (north-star) surface.

- Sequence packing assigns documents to fixed-token-budget bins (the
  step that packs chunks into training context windows). Greedy
  running-total packing is a window cumsum, so it stays one
  shuffle-sort per source partition at any scale.
- Fuzzy matching (levenshtein) is the entity-resolution primitive for
  near-identical names; the oracle-checked form runs on a bounded
  block (key < 200) because all-pairs edit distance is quadratic —
  the documented scale path is LSH/blocking first (see operators/
  dedup.py), then exact distances within blocks only.
- Array stats exercise the higher-order-function surface (transform /
  filter / aggregate) that vector columns rely on, all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.queries.registry import query

# ---------------------------------------------------------------------------
# Sequence packing: greedy fill of 512-token bins per source.
# ---------------------------------------------------------------------------

_PACK_ORACLE = """
WITH t AS (
  SELECT source, doc_id,
         len(string_split_regex(lower(COALESCE(text, '')), '\\s+')) AS n_tokens
  FROM documents
),
packed AS (
  SELECT source, doc_id, n_tokens,
         CAST((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) - n_tokens) // 512 AS BIGINT) AS bin_id
  FROM t
)
SELECT source, bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       ROUND(SUM(n_tokens) / 512.0, 4) AS fill_ratio
FROM packed
GROUP BY source, bin_id
ORDER BY source, bin_id
"""


@query("doc_pack_bins", _PACK_ORACLE)
def doc_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: bin = floor(running_tokens_before /
    512) within each source, deterministic because the running sum
    orders by the unique doc_id. One shuffle-sort on (source, doc_id);
    bins never cross sources, so packing parallelizes per source
    exactly like the training-shard writer would."""
    docs = read_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+"))
    t = docs.select("source", "doc_id", n_tokens.alias("n_tokens"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = t.withColumn(
        "bin_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 512),
    )
    return (
        packed.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
            F.round(F.sum("n_tokens") / 512.0, 4).alias("fill_ratio"),
        )
        .orderBy("source", "bin_id")
    )


# ---------------------------------------------------------------------------
# Fuzzy name matching within a block — edit distance <= 2.
# ---------------------------------------------------------------------------

_FUZZY_ORACLE = """
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
FROM part a JOIN part b ON a.p_partkey < b.p_partkey
WHERE a.p_partkey < 200 AND b.p_partkey < 200
  AND levenshtein(a.p_name, b.p_name) <= 2
ORDER BY key_a, key_b
"""


@query("part_name_fuzzy_pairs", _FUZZY_ORACLE)
def part_name_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution primitive: near-identical part names by
    levenshtein distance. All-pairs is O(n²), so the exact form runs
    on a bounded block; at scale the same comparison runs *inside*
    LSH/blocking buckets (operators/dedup.py), never globally."""
    part = read_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    a = part.select(
        F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a")
    )
    b = part.select(
        F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b")
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, F.col("key_a") < F.col("key_b"))
        .filter(dist <= 2)
        .select("key_a", "key_b", "name_a", "name_b", dist.alias("edit_dist"))
        .orderBy("key_a", "key_b")
    )


# ---------------------------------------------------------------------------
# Higher-order array functions over embeddings.
# ---------------------------------------------------------------------------

_ARRAY_STATS_ORACLE = """
SELECT vec_id,
       ROUND(list_sum(list_transform(embedding,
             x -> abs(CAST(x AS DOUBLE)))), 6) AS l1_norm,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive,
       ROUND(list_max(list_transform(embedding,
             x -> abs(CAST(x AS DOUBLE)))), 6) AS max_abs
FROM embeddings
ORDER BY vec_id
"""


@query("embedding_array_stats", _ARRAY_STATS_ORACLE)
def embedding_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L1 norm / positive-count / max-abs via the
    higher-order functions (aggregate, filter, array_max) — all
    JVM-side expressions, no UDF, no shuffle (narrow projection +
    final sort only)."""
    emb = read_table(spark, sf_dir, "embeddings")
    abs_arr = F.transform("embedding", lambda x: F.abs(x.cast("double")))
    l1 = F.aggregate(
        abs_arr, F.lit(0.0), lambda acc, x: acc + x
    )
    return emb.select(
        "vec_id",
        F.round(l1, 6).alias("l1_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        F.round(F.array_max(abs_arr), 6).alias("max_abs"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# Scalar int8 quantization (SQ8) of embeddings with reconstruction-
# error audit — the memory-reduction step an ANN index applies before
# serving billions of vectors.
# ---------------------------------------------------------------------------

_SQ8_ORACLE = """
WITH v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vals
  FROM embeddings
),
s AS (
  SELECT vec_id, vals,
         list_min(vals) AS mn,
         list_max(vals) - list_min(vals) AS rng
  FROM v
),
c AS (
  SELECT vec_id, vals, mn, rng,
         list_transform(vals, x -> CASE WHEN rng > 0
             THEN CAST(FLOOR((x - mn) / rng * 255 + 0.5) AS BIGINT)
             ELSE 0 END) AS codes
  FROM s
)
SELECT vec_id,
       CAST(len(vals) AS INTEGER) AS dim,
       FLOOR(rng / 255 * 1e9 + 0.5) / 1e9 AS scale_q,
       CAST(list_sum(codes) AS BIGINT) AS sum_codes,
       CAST(list_max(codes) AS INTEGER) AS max_code,
       CAST(list_sum(list_transform(list_zip(vals, codes), p ->
            CAST(FLOOR(ABS(p[1] - (mn + (p[2] * rng) / 255)) * 1e9 + 0.5)
                 AS BIGINT))) AS BIGINT) AS sum_abs_err_nano
FROM c
ORDER BY vec_id
"""


@query("embedding_sq8_quantization", _SQ8_ORACLE)
def embedding_sq8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector scalar int8 quantization (min/max affine codes,
    the SQ8 of FAISS/Milvus) with a reconstruction-error audit —
    code sums/max pin the quantizer itself, and the summed per-element
    |error| pins the dequantize path. All JVM-side higher-order
    expressions (transform/zip_with/aggregate), no UDF, no shuffle.

    Determinism: codes are FLOOR of identical correctly-rounded IEEE
    chains in both engines; per-element errors are quantized to
    integer nano-units BEFORE summing, so the fold order of the array
    sum can never surface (the quantized_sum convention applied inside
    an array). Null embeddings propagate as null rows in both engines
    (text-op totality convention's numeric sibling)."""
    emb = read_table(spark, sf_dir, "embeddings")
    vals = F.transform("embedding", lambda x: x.cast("double"))
    e = emb.select("vec_id", vals.alias("vals"))
    mn = F.array_min("vals")
    rng = F.array_max("vals") - F.array_min("vals")
    e = e.select("vec_id", "vals", mn.alias("mn"), rng.alias("rng"))
    codes = F.transform(
        "vals",
        lambda x: F.when(
            F.col("rng") > 0,
            F.floor((x - F.col("mn")) / F.col("rng") * 255 + F.lit(0.5)),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )
    e = e.select("vec_id", "vals", "mn", "rng", codes.alias("codes"))
    err_nano = F.zip_with(
        "vals",
        "codes",
        lambda x, c: F.floor(
            F.abs(x - (F.col("mn") + (c * F.col("rng")) / 255)) * 1e9
            + F.lit(0.5)
        ).cast("long"),
    )
    return e.select(
        "vec_id",
        F.size("vals").alias("dim"),
        (F.floor(F.col("rng") / 255 * 1e9 + F.lit(0.5)) / 1e9).alias(
            "scale_q"
        ),
        F.aggregate(
            "codes", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("sum_codes"),
        F.array_max("codes").cast("int").alias("max_code"),
        F.aggregate(
            err_nano, F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("sum_abs_err_nano"),
    ).orderBy("vec_id")
