"""Exact-allocation sampling + data-ordering operators (r6, Tier B).

Three curation jobs that round out the sampling/ordering surface:

- **Stratified exact-size sample** (`corpus_stratified_sample`):
  doc-proportional per-source quotas by the largest-remainder
  (Hamilton) method — the sample size is EXACTLY ``floor(0.2 * N)``
  docs, unlike the Bernoulli hash sample (`doc_hash_sample`) whose
  size is binomial. Selection within a stratum is "smallest k md5
  hashes", reproducible on any cluster size.
- **Per-epoch shuffle order** (`corpus_epoch_shuffle`): the
  deterministic global permutation a dataloader consumes —
  ``position = rank of md5(doc_id:epoch) within the epoch`` — so
  every epoch reshuffles, any worker can recompute its slice, and
  resume-from-step is a filter, not a replay.
- **Upsampling materialization plan** (`corpus_epoch_plan`): turns
  the temperature-sampling rates of ``source_temperature_weights``
  into integer per-doc repeat counts (``floor(rate)`` plus a
  hash-Bernoulli for the fractional part) and reports the achieved
  per-source rate — the step that converts a sampling *policy* into
  a concrete epoch manifest.

Scale shape: quota/rate math runs on |sources|-row aggregates
(broadcast); the per-row work is stateless projections; the only
rank machinery is the two-pass grouped row number
(:func:`operators.ranks.grouped_row_number`), which never funnels a
group through one task — a whole source (or epoch) larger than a
partition spans adjacent range partitions. The quota CTE's window
runs over O(|sources|) rows — bounded, like the rank offsets window.

Cross-engine determinism: md5 hex compares lexicographically the
same in Spark and DuckDB; quotas/repeats are integer arithmetic
(DuckDB ``//`` mirrors Spark's truncating div — registry
conventions); the fractional-repeat threshold compares 6-hex-char
prefixes against ``printf('%06x', floor(frac * 16^6))``, identical
IEEE+format ops in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.operators.ranks import grouped_row_number
from calorista_spark.operators.textstats import token_count
from calorista_spark.queries.registry import query

_STRATIFIED_ORACLE = """
WITH per_src AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_corpus,
         (CAST(SUM(c) AS BIGINT) * 20) // 100 AS n_target
  FROM per_src
),
alloc AS (
  SELECT source, c,
         (n_target * c) // n_corpus AS base,
         n_target * c - ((n_target * c) // n_corpus) * n_corpus AS rem,
         n_target
  FROM per_src, tot
),
quota AS (
  SELECT source,
         base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
                          <= n_target - (SELECT CAST(SUM(base) AS BIGINT) FROM alloc)
                     THEN 1 ELSE 0 END AS quota
  FROM alloc
),
ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
SELECT r.doc_id, r.source
FROM ranked r JOIN quota q ON r.source = q.source
WHERE r.rn <= q.quota
ORDER BY r.doc_id
"""


@query("corpus_stratified_sample", _STRATIFIED_ORACLE)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly ``floor(0.2 * |corpus|)`` docs, stratified by source
    with largest-remainder quotas, members = smallest ``quota`` md5
    hashes per source. Quota math is a |sources|-row broadcast;
    membership ranking is the two-pass grouped row number (no
    single-task-per-source window)."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    # r14 (guide §2.4): ONE scan feeds both branches — the ranked
    # membership AND the per-source counts the quota math starts from
    # both come off the rank op's persisted range-partitioned frame
    # (with_group_counts), where the old shape scanned + aggregated
    # the documents table a second time just for per_src
    ranked, counts = grouped_row_number(
        docs.withColumn("__h", F.md5(F.col("doc_id").cast("string"))),
        "source",
        [F.col("__h"), F.col("doc_id")],
        out_col="__rn",
        with_group_counts=True,
    )
    per_src = counts.select("source", F.col("__group_n").alias("c"))
    tot = per_src.agg(
        F.sum("c").alias("n_corpus"),
        F.floor(F.sum("c") * 20 / 100).cast("long").alias("n_target"),
    )
    # integer `div`, not floor-of-double /: when n_target*c exceeds
    # 2^53 (plausible at 100 TB doc counts) the double quotient loses
    # ulps and its floor can differ by 1 from the oracle's exact `//`
    alloc = per_src.join(F.broadcast(tot)).select(
        "source",
        "c",
        F.expr("n_target * c div n_corpus").cast("long").alias("base"),
        (
            F.col("n_target") * F.col("c")
            - F.expr("n_target * c div n_corpus").cast("long")
            * F.col("n_corpus")
        ).alias("rem"),
        "n_target",
    )
    spare = alloc.agg(
        (F.max("n_target") - F.sum("base")).alias("n_spare")
    )
    # |sources|-row frame: the partition-less window is bounded, same
    # class as the two-pass rank's O(P) offsets window
    w = Window.orderBy(F.col("rem").desc(), F.col("source"))
    quota = (
        alloc.join(F.broadcast(spare))
        .withColumn(
            "quota",
            F.col("base")
            + F.when(
                F.row_number().over(w) <= F.col("n_spare"), F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .select("source", "quota")
    )
    return (
        ranked.join(F.broadcast(quota), "source")
        .filter(F.col("__rn") <= F.col("quota"))
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


_EPOCH_SHUFFLE_ORACLE = """
WITH e AS (SELECT CAST(unnest(range(0, 2)) AS INTEGER) AS epoch),
keyed AS (
  SELECT d.doc_id, e.epoch,
         md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(e.epoch AS VARCHAR)) AS h
  FROM documents d, e
)
SELECT epoch, doc_id,
       CAST(row_number() OVER (
         PARTITION BY epoch ORDER BY h, doc_id) AS INTEGER) AS position
FROM keyed
ORDER BY epoch, position
"""


@query("corpus_epoch_shuffle", _EPOCH_SHUFFLE_ORACLE)
def corpus_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch global shuffle positions (epochs 0–1):
    ``position`` ranks ``md5(doc_id:epoch)`` within the epoch via the
    two-pass grouped row number, so no epoch ever funnels through one
    task and the full permutation is recomputable from (doc_id,
    epoch) alone — the property that makes mid-epoch resume a cheap
    filter."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    keyed = docs.select(
        "doc_id", F.explode(F.array(F.lit(0), F.lit(1))).alias("epoch")
    ).withColumn(
        "__h",
        F.md5(
            F.concat_ws(
                ":",
                F.col("doc_id").cast("string"),
                F.col("epoch").cast("string"),
            )
        ),
    )
    ranked = grouped_row_number(
        keyed, "epoch", [F.col("__h"), F.col("doc_id")], out_col="position"
    )
    return ranked.select("epoch", "doc_id", "position").orderBy(
        "epoch", "position"
    )


_TOKENS = """
  SELECT doc_id, source,
         CASE WHEN length(trim(COALESCE(text, ''))) = 0 THEN 0
              ELSE len(string_split_regex(trim(COALESCE(text, '')), '\\s+')) END AS n_tokens
  FROM documents
"""

_EPOCH_PLAN_ORACLE = f"""
WITH t AS ({_TOKENS}),
per_src AS (
  SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
  FROM t GROUP BY source
),
tot AS (SELECT SUM(n_tokens) AS total FROM per_src),
scaled AS (
  SELECT source, n_tokens,
         n_tokens * 1.0 / total AS p,
         CAST(FLOOR(SQRT(n_tokens * 1.0 / total) * 1e9 + 0.5) AS BIGINT)
           AS sq_scaled
  FROM per_src, tot
),
z AS (SELECT SUM(sq_scaled) AS z FROM scaled),
rates AS (
  SELECT source,
         FLOOR(((sq_scaled * 1.0 / z) / p) * 1e4 + 0.5) / 1e4 AS rate
  FROM scaled, z
),
planned AS (
  SELECT d.source, r.rate,
         CAST(FLOOR(r.rate) AS BIGINT)
         + CASE WHEN substr(md5('rep:' || CAST(d.doc_id AS VARCHAR)), 1, 6)
                     < printf('%06x', CAST(FLOOR((r.rate - FLOOR(r.rate))
                                                 * 16777216) AS INTEGER))
                THEN 1 ELSE 0 END AS n_repeats
  FROM documents d JOIN rates r ON d.source = r.source
)
SELECT source, rate,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_repeats) AS BIGINT) AS n_out,
       FLOOR(SUM(n_repeats) * 1.0 / COUNT(*) * 1e4 + 0.5) / 1e4
         AS achieved_rate
FROM planned
GROUP BY source, rate
ORDER BY source
"""


@query("corpus_epoch_plan", _EPOCH_PLAN_ORACLE)
def corpus_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the temperature-sampling policy (T=2, as in
    ``source_temperature_weights``) into per-doc integer repeat
    counts: every doc repeats ``floor(rate)`` times plus one more
    with probability ``frac(rate)`` decided by a 24-bit md5 prefix —
    deterministic, cluster-size-independent. Emits the per-source
    manifest (docs in, rows out, achieved vs target rate). Rates are
    a |sources|-row broadcast; the repeat decision is a stateless
    per-row projection."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", token_count("text").cast("long").alias("n_tokens")
    )
    per_src = toks.groupBy("source").agg(F.sum("n_tokens").alias("n_tokens"))
    total = per_src.agg(F.sum("n_tokens").alias("__total"))
    scaled = per_src.join(F.broadcast(total)).select(
        "source",
        (F.col("n_tokens") * 1.0 / F.col("__total")).alias("p"),
        F.floor(
            F.sqrt(F.col("n_tokens") * 1.0 / F.col("__total")) * 1e9
            + F.lit(0.5)
        )
        .cast("long")
        .alias("sq_scaled"),
    )
    z = scaled.agg(F.sum("sq_scaled").alias("__z"))
    rates = (
        scaled.join(F.broadcast(z))
        .select(
            "source",
            (
                F.floor(
                    (F.col("sq_scaled") * 1.0 / F.col("__z") / F.col("p"))
                    * 1e4
                    + F.lit(0.5)
                )
                / 1e4
            ).alias("rate"),
        )
    )
    frac = F.col("rate") - F.floor(F.col("rate"))
    thr = F.format_string(
        "%06x", F.floor(frac * 16777216).cast("int")
    )
    planned = (
        docs.select("doc_id", "source")
        .join(F.broadcast(rates), "source")
        .withColumn(
            "n_repeats",
            F.floor(F.col("rate")).cast("long")
            + F.when(
                F.substring(
                    F.md5(F.concat(F.lit("rep:"), F.col("doc_id").cast("string"))),
                    1,
                    6,
                )
                < thr,
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
    )
    return (
        planned.groupBy("source", "rate")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_repeats").alias("n_out"),
            (
                F.floor(
                    F.sum("n_repeats") * 1.0 / F.count(F.lit(1)) * 1e4
                    + F.lit(0.5)
                )
                / 1e4
            ).alias("achieved_rate"),
        )
        .select("source", "rate", "n_docs", "n_out", "achieved_rate")
        .orderBy("source")
    )
