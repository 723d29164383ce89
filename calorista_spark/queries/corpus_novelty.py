"""Corpus n-gram novelty (r6) — the redundancy-growth signal a
pretraining pipeline tracks as it appends sources: for each document
(in the deterministic doc_id ingest order), what fraction of its
8-grams has never been seen in any EARLIER document?

Filtering on it implements incremental cross-doc near-dedup ("keep a
doc only if ≥ x ppm of it is new"), and the aggregate curve
(novelty vs doc_id) shows when a corpus stops contributing new text.

Scale shape: one explode to the gram stream, a distinct on
(doc_id, h), ONE unordered window over the h partition for the
first-occurrence doc (min — no sort, and it saves the groupBy+
join-back's extra shuffle, the same single-pass-over-the-hash-key
trick as doc_dup_span_report), then a groupBy doc. Every stage keyed,
nothing all-pairs. The 60-bit md5-prefix gram hash is the same
cross-engine convention as doc_dup_span_report (lm_scoring.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.queries.registry import query

_NOVELTY_ORACLE = """
WITH base AS (
  SELECT doc_id, string_split_regex(lower(COALESCE(text, '')), '\\s+') AS w FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         CAST('0x' || substr(md5(array_to_string(list_slice(w, i, i + 7),
              ' ')), 1, 15) AS BIGINT) AS h
  FROM base, unnest(range(1, greatest(len(w) - 6, 1))) AS t(i)
  WHERE len(w) >= 8
),
firsts AS (SELECT h, MIN(doc_id) AS first_doc FROM grams GROUP BY h),
per_doc AS (
  SELECT g.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(CASE WHEN f.first_doc < g.doc_id THEN 1 ELSE 0 END)
              AS BIGINT) AS n_seen_before
  FROM grams g JOIN firsts f USING (h)
  GROUP BY g.doc_id
)
SELECT b.doc_id,
       CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(p.n_seen_before, 0) AS BIGINT) AS n_seen_before,
       CASE WHEN COALESCE(p.n_grams, 0) = 0 THEN NULL
            ELSE CAST((p.n_grams - p.n_seen_before) * 1000000 // p.n_grams
                      AS BIGINT) END AS novelty_ppm
FROM base b LEFT JOIN per_doc p USING (doc_id)
ORDER BY b.doc_id
"""


@query("doc_ngram_novelty", _NOVELTY_ORACLE)
def doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: distinct 8-gram hashes, how many first
    occurred in an earlier doc_id, and the novel fraction in ppm
    (integer division per the registry's `//` convention; docs under
    8 words emit 0 grams and a null ppm)."""
    docs = read_table(spark, sf_dir, "documents", fan_out=True)
    base = docs.select(
        "doc_id", F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+").alias("w")
    )
    gram_hashes = F.expr(
        "CASE WHEN size(w) >= 8 THEN "
        "transform(sequence(1, size(w) - 7), "
        "  i -> conv(substring(md5(array_join(slice(w, i, 8), ' ')), 1, 15),"
        "            16, 10)) "
        "ELSE CAST(array() AS array<string>) END"
    )
    # r15 (guide §2.4): DISTINCT (doc_id, h) is per-document set
    # semantics — dedupe in the ARRAY domain before the explode
    # (array_distinct) instead of shuffling the whole gram stream
    # through a (doc_id, h) distinct exchange; one full-stream
    # Exchange drops out of the plan and the row count entering the
    # h-window shrinks to the same distinct stream as before.
    grams = base.select(
        "doc_id",
        F.explode(F.array_distinct(gram_hashes)).alias("hs"),
    ).select("doc_id", F.col("hs").cast("bigint").alias("h"))
    first_doc = F.min("doc_id").over(Window.partitionBy("h"))
    per_doc = (
        grams.withColumn("first_doc", first_doc)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") < F.col("doc_id"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_seen_before"),
        )
    )
    return (
        base.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("n_seen_before", F.lit(0))
            .cast("bigint")
            .alias("n_seen_before"),
            F.expr(
                "CASE WHEN coalesce(n_grams, 0) = 0 THEN NULL "
                "ELSE (n_grams - n_seen_before) * 1000000 div n_grams END"
            )
            .cast("bigint")
            .alias("novelty_ppm"),
        )
        .orderBy("doc_id")
    )
