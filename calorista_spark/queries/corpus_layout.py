"""Corpus-layout operators for large-scale pretraining data (r6).

Two jobs every 100 TB training run needs that the curation suite
didn't yet cover:

- **Token linearization** (`corpus_token_offsets`): give every
  document its ``[start_token, end_token)`` interval in the global
  concatenated token stream, in a deterministic corpus order. This is
  the primitive behind resumable data loading ("we stopped at global
  token position T — which shard/doc is that?") and fixed-seed data
  ordering. Implemented with the distributed two-pass prefix sum
  (:func:`operators.ranks.ordered_running_sum`) — no single-task
  window anywhere, so the linearization itself scales.
- **Temperature-weighted source mixture** (`source_temperature_weights`):
  the multilingual/multi-source sampling scheme of mT5/XLM —
  ``q_i ∝ p_i^(1/T)`` with ``T = 2`` (α = 0.5) — computed from
  per-source token mass. Upsamples the tail, downsamples the head;
  the emitted ``rate = q/p`` is the per-source sampling factor a
  downstream hash-sampler applies. One tiny aggregate (|sources|
  rows) after a map-side-combined token count: nothing here grows
  with corpus size except the first groupBy.

Cross-engine determinism: token counts are integers; the prefix sum
is integer-exact (see ordered_running_sum's docstring); the mixture's
cross-source normalizer sums sqrt masses AS SCALED INTEGERS
(``floor(sqrt(p_i)*1e9 + 0.5)``) so the normalization constant is
partition-order-invariant, mirroring the quantized_sum convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.operators.ranks import ordered_running_sum
from calorista_spark.operators.textstats import token_count
from calorista_spark.queries.registry import query

_TOKENS = """
  SELECT doc_id, source,
         CASE WHEN length(trim(COALESCE(text, ''))) = 0 THEN 0
              ELSE len(string_split_regex(trim(COALESCE(text, '')), '\\s+')) END AS n_tokens
  FROM documents
"""

_OFFSETS_ORACLE = f"""
WITH t AS ({_TOKENS})
SELECT doc_id, source, n_tokens,
       CAST(SUM(n_tokens) OVER (ORDER BY doc_id) - n_tokens AS BIGINT)
         AS start_token,
       CAST(SUM(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) AS end_token
FROM t
ORDER BY doc_id
"""


@query("corpus_token_offsets", _OFFSETS_ORACLE)
def corpus_token_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global token interval per document over the deterministic
    ``doc_id`` corpus order, via the distributed prefix sum — the
    resumable-dataloader index. ``end_token`` of the last row is the
    corpus token count; ``[start, end)`` intervals tile the stream
    with no gaps (pinned by the oracle hash)."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", token_count("text").cast("long").alias("n_tokens")
    )
    cum = ordered_running_sum(
        toks, [F.col("doc_id")], "n_tokens", out_col="end_token"
    )
    return cum.select(
        "doc_id",
        "source",
        "n_tokens",
        (F.col("end_token") - F.col("n_tokens")).alias("start_token"),
        "end_token",
    ).orderBy("doc_id")


_MIXTURE_ORACLE = f"""
WITH t AS ({_TOKENS}),
per_src AS (
  -- CAST: DuckDB SUM(BIGINT) widens to HUGEINT (int128); Spark emits
  -- int64 — the arrow value-hash must compare like-for-like
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
  FROM t GROUP BY source
),
tot AS (SELECT SUM(n_tokens) AS total FROM per_src),
scaled AS (
  SELECT source, n_docs, n_tokens,
         n_tokens * 1.0 / total AS p,
         CAST(FLOOR(SQRT(n_tokens * 1.0 / total) * 1e9 + 0.5) AS BIGINT)
           AS sq_scaled
  FROM per_src, tot
),
z AS (SELECT SUM(sq_scaled) AS z FROM scaled)
SELECT source, n_docs, n_tokens,
       FLOOR(p * 1e6 + 0.5) / 1e6 AS p,
       FLOOR((sq_scaled * 1.0 / z) * 1e6 + 0.5) / 1e6 AS q,
       FLOOR(((sq_scaled * 1.0 / z) / p) * 1e4 + 0.5) / 1e4 AS rate
FROM scaled, z
ORDER BY source
"""


@query("source_temperature_weights", _MIXTURE_ORACLE)
def source_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mT5/XLM temperature sampling (T=2): per-source natural share
    ``p``, tempered share ``q ∝ sqrt(p)``, and the sampling factor
    ``rate = q/p`` to feed a hash-sampler. The normalizer sums
    scaled-integer sqrt masses, so ``q`` is exactly reproducible
    regardless of partitioning."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", token_count("text").cast("long").alias("n_tokens")
    )
    per_src = toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
    )
    total = per_src.agg(F.sum("n_tokens").alias("__total"))
    scaled = per_src.join(F.broadcast(total)).select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens") * 1.0 / F.col("__total")).alias("p"),
        F.floor(
            F.sqrt(F.col("n_tokens") * 1.0 / F.col("__total")) * 1e9
            + F.lit(0.5)
        )
        .cast("long")
        .alias("sq_scaled"),
    )
    z = scaled.agg(F.sum("sq_scaled").alias("__z"))
    q = F.col("sq_scaled") * 1.0 / F.col("__z")
    return (
        scaled.join(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            (F.floor(F.col("p") * 1e6 + F.lit(0.5)) / 1e6).alias("p"),
            (F.floor(q * 1e6 + F.lit(0.5)) / 1e6).alias("q"),
            (F.floor((q / F.col("p")) * 1e4 + F.lit(0.5)) / 1e4).alias(
                "rate"
            ),
        )
        .orderBy("source")
    )
