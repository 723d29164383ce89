"""End-to-end corpus curation pipeline (the Tier-B capstone): raw →
quality gate → exact dedup → deterministic sample, with the per-source
funnel report a production data-curation run logs at every stage.

Composability demonstration: each stage is one of the session's
already-verified operators (quality thresholds, content-hash dedup,
md5-prefix Bernoulli sampling) chained as plain DataFrame
transformations — Catalyst fuses the stage predicates into the
minimal set of scans/shuffles rather than materializing between
stages, which is exactly why the curation pipeline is declared, not
scripted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.queries.registry import query

_CURATION_ORACLE = """
WITH terms AS (
  SELECT doc_id, unnest(string_split_regex(lower(COALESCE(text, '')), '\\s+')) AS term
  FROM documents
),
metrics AS (
  SELECT doc_id, COUNT(*) AS n_words, COUNT(DISTINCT term) AS n_distinct
  FROM terms GROUP BY doc_id
),
quality AS (
  SELECT d.doc_id, d.source, d.text
  FROM documents d JOIN metrics m ON d.doc_id = m.doc_id
  WHERE m.n_words >= 30 AND 1.0 - m.n_distinct * 1.0 / m.n_words <= 0.55
),
deduped AS (
  SELECT MIN(doc_id) AS doc_id, source
  FROM (SELECT doc_id, source, md5(text) AS h FROM quality)
  GROUP BY h, source
),
sampled AS (
  SELECT doc_id, source FROM deduped
  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
),
raw_n AS (SELECT source, COUNT(*) AS n_raw FROM documents GROUP BY source),
q_n AS (SELECT source, COUNT(*) AS n_quality FROM quality GROUP BY source),
d_n AS (SELECT source, COUNT(*) AS n_deduped FROM deduped GROUP BY source),
s_n AS (SELECT source, COUNT(*) AS n_sampled FROM sampled GROUP BY source)
SELECT r.source,
       CAST(r.n_raw AS BIGINT) AS n_raw,
       CAST(COALESCE(q.n_quality, 0) AS BIGINT) AS n_quality,
       CAST(COALESCE(d.n_deduped, 0) AS BIGINT) AS n_deduped,
       CAST(COALESCE(s.n_sampled, 0) AS BIGINT) AS n_sampled
FROM raw_n r
LEFT JOIN q_n q ON r.source = q.source
LEFT JOIN d_n d ON r.source = d.source
LEFT JOIN s_n s ON r.source = s.source
ORDER BY r.source
"""


@query("corpus_curation_pipeline", _CURATION_ORACLE)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation funnel per source: raw → quality-pass → exact-
    deduped (min doc_id per content hash within source) → 75% hash
    sample. Four stage counts in one job; every stage predicate is
    deterministic, so the funnel is reproducible run-over-run and
    cluster-size-independent."""
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents", fan_out=True)
    # per-row metrics: no explode/groupBy/self-join needed — word and
    # distinct-word counts are array expressions on the tokenized row
    w = F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
    flagged = docs.select(
        "doc_id",
        "source",
        F.md5("text").alias("h"),
        (
            (F.size(w) >= 30)
            & (1.0 - F.size(F.array_distinct(w)) / F.size(w) <= 0.55)
        ).alias("q_pass"),
    )
    # dedup survivor = min doc_id within (source, h) among quality
    # docs; the q_pass key in the window partition confines ranking to
    # the quality group, so one window pass computes the whole funnel
    rn = F.row_number().over(
        Window.partitionBy("source", "h", "q_pass").orderBy("doc_id")
    )
    staged = flagged.select(
        "doc_id",
        "source",
        "q_pass",
        (F.col("q_pass") & (rn == 1)).alias("dedup_keep"),
    ).withColumn(
        "sampled",
        F.col("dedup_keep")
        & (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "c"),
    )
    cnt = lambda c, name: F.count(F.when(F.col(c), 1)).cast("bigint").alias(name)
    return (
        staged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_raw"),
            cnt("q_pass", "n_quality"),
            cnt("dedup_keep", "n_deduped"),
            cnt("sampled", "n_sampled"),
        )
        .orderBy("source")
    )
