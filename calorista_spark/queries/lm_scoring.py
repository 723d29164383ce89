"""LM-based corpus scoring (SURVEY §2.11 L4/Tier-B extensions): the
three model-driven curation passes a training-data pipeline runs after
the rule-based filters —

- duplicated-span detection (the substring-dedup signal of Lee et al.,
  "Deduplicating Training Data Makes Language Models Better"):
  sliding 8-word grams, cross-corpus duplicate grams, per-doc maximal
  merged spans;
- reference-LM scoring (CCNet-style): a bigram LM estimated on the
  target-language slice scores every document's negative log
  likelihood;
- DSIR importance weights (Xie et al., "Data Selection for Language
  Models via Importance Resampling"): per-word log-ratio of target vs
  raw unigram distributions, summed per document.

Cross-engine determinism: every log-probability is quantized to
integer micro-nats (``floor(ln(p) * 1e6)``) BEFORE any summation, so
per-document sums are exact integer arithmetic regardless of
accumulation order. ``ln`` itself is bit-identical between the JVM
(``java.lang.Math.log``) and DuckDB (libm) on identical double inputs,
and the inputs are exact IEEE divisions of identical integer counts.

Scale shape: gram/token streams reduce through keyed shuffles with
map-side combine; the LM / log-ratio tables are vocabulary-sized
(corpus-independent) join sides that AQE broadcasts; the only global
windows run over vocabulary-sized aggregates (the corpus_lm.py
precedent). The span query's shuffle key is a 60-bit gram hash, never
the gram text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.operators.checkpoint import stage_checkpoint
from calorista_spark.queries.registry import query

_WORDS_SQL = "string_split_regex(lower(COALESCE(text, '')), '\\s+')"

# ---------------------------------------------------------------------------
# Duplicated-span report: sliding 8-grams, duplicate = gram hash seen
# >= 2 times anywhere in the corpus (including within one document),
# per-document overlapping-or-adjacent spans merged to maximal ranges.
# ---------------------------------------------------------------------------

_DUP_SPAN_ORACLE = f"""
WITH base AS (
  SELECT doc_id, {_WORDS_SQL} AS w FROM documents
),
grams AS (
  SELECT doc_id, CAST(i AS INTEGER) AS pos,
         CAST('0x' || substr(md5(array_to_string(list_slice(w, i, i + 7),
              ' ')), 1, 15) AS BIGINT) AS h
  FROM base, unnest(range(1, greatest(len(w) - 6, 1))) AS t(i)
),
dup AS (
  SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY h) AS cnt FROM grams
),
marked AS (
  SELECT doc_id, pos,
         CASE WHEN MAX(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR pos > MAX(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
         THEN 1 ELSE 0 END AS new_span
  FROM dup WHERE cnt >= 2
),
islands AS (
  SELECT doc_id, pos,
         SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM marked
),
spans AS (
  SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + 7 AS e
  FROM islands GROUP BY 1, 2
),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
         CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens
  FROM spans GROUP BY 1
)
SELECT b.doc_id,
       CAST(COALESCE(p.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST(len(b.w) AS BIGINT) AS total_tokens,
       CAST(COALESCE(p.dup_tokens, 0) * 1000000 // len(b.w) AS BIGINT)
         AS dup_ppm
FROM base b LEFT JOIN per_doc p USING (doc_id)
ORDER BY b.doc_id
"""


@query("doc_dup_span_report", _DUP_SPAN_ORACLE)
def doc_dup_span_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span report. The gram hash (60-bit md5
    prefix, identical in both engines) is the shuffle key; duplicate
    detection is ONE window count over that key (no join-back rescan of
    the gram stream); span merging is the gaps-and-islands pattern
    (running max of span end, new island when the next gram starts past
    it). Docs shorter than 8 words surface with zero spans via the
    final vocabulary-independent left join on doc_id."""
    docs = read_table(spark, sf_dir, "documents", fan_out=True)
    words = F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
    base = docs.select("doc_id", words.alias("w"))
    # guard: sequence(1, 0) would DESCEND in Spark, so gate on size>=8
    gram_hashes = F.expr(
        "CASE WHEN size(w) >= 8 THEN "
        "transform(sequence(1, size(w) - 7), "
        "  i -> conv(substring(md5(array_join(slice(w, i, 8), ' ')), 1, 15),"
        "            16, 10)) "
        "ELSE CAST(array() AS array<string>) END"
    )
    grams = base.select(
        "doc_id", F.posexplode(gram_hashes).alias("pos0", "hs")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.col("hs").cast("bigint").alias("h"),
    )
    dup = grams.withColumn(
        "cnt", F.count(F.lit(1)).over(Window.partitionBy("h"))
    ).filter(F.col("cnt") >= 2)
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + 7).over(
        w_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = dup.select(
        "doc_id",
        "pos",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end + 1), 1)
        .otherwise(0)
        .alias("new_span"),
    )
    islands = marked.withColumn(
        "island",
        F.sum("new_span").over(
            w_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    spans = islands.groupBy("doc_id", "island").agg(
        F.min("pos").alias("s"), (F.max("pos") + 7).alias("e")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias("dup_tokens"),
    )
    return (
        base.select("doc_id", F.size("w").cast("bigint").alias("total_tokens"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_dup_spans", F.lit(0)).cast("bigint")
            .alias("n_dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("bigint")
            .alias("dup_tokens"),
            "total_tokens",
            F.expr("coalesce(dup_tokens, 0) * 1000000 div total_tokens")
            .cast("bigint")
            .alias("dup_ppm"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Reference-LM scoring: bigram LM P(w2|w1) estimated on the lang='en'
# slice; every document scored by integer-micro-nat NLL over covered
# grams, with the out-of-vocabulary gram count reported alongside.
# ---------------------------------------------------------------------------

_LM_SCORE_ORACLE = f"""
WITH base AS (
  SELECT doc_id, lang, {_WORDS_SQL} AS w FROM documents
),
ref_pairs AS (
  SELECT unnest(list_transform(range(1, greatest(len(w), 1)),
         i -> w[i] || ' ' || w[i + 1])) AS b
  FROM base WHERE lang = 'en'
),
tc AS (
  SELECT string_split(b, ' ')[1] AS w1, string_split(b, ' ')[2] AS w2,
         COUNT(*) AS c2
  FROM ref_pairs GROUP BY 1, 2
),
lm AS (
  SELECT w1, w2,
         CAST(floor(ln(c2 * 1.0 / (SUM(c2) OVER (PARTITION BY w1)))
              * 1000000) AS BIGINT) AS lp
  FROM tc
),
doc_pairs AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(1, greatest(len(w), 1)),
                i -> w[i] || ' ' || w[i + 1])) AS b
  FROM base
),
split_pairs AS (
  SELECT doc_id, lang, string_split(b, ' ')[1] AS w1,
         string_split(b, ' ')[2] AS w2
  FROM doc_pairs
),
scored AS (
  SELECT d.doc_id, d.lang, l.lp
  FROM split_pairs d LEFT JOIN lm l ON d.w1 = l.w1 AND d.w2 = l.w2
)
SELECT doc_id, lang,
       CAST(COUNT(lp) AS BIGINT) AS covered_grams,
       CAST(COUNT(*) - COUNT(lp) AS BIGINT) AS oov_grams,
       CAST(-COALESCE(SUM(lp), 0) AS BIGINT) AS nll_micronats,
       CASE WHEN COUNT(lp) > 0
            THEN CAST((-SUM(lp)) // COUNT(lp) AS BIGINT) END
         AS avg_nll_micronats
FROM scored GROUP BY 1, 2
ORDER BY doc_id
"""


@query("doc_lm_quality_score", _LM_SCORE_ORACLE)
def doc_lm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style reference-LM scoring. The LM is a bigram conditional
    table over the target slice — vocabulary-sized, so its prefix
    totals are a window over the aggregated counts (one pipeline, the
    corpus_lm.py lesson) and the scoring join's build side stays
    broadcastable at any corpus size. Log-probs are quantized to
    micro-nats per gram before the per-doc integer sum. Documents with
    fewer than two words have no bigrams and drop out (both engines
    alike)."""
    docs = read_table(spark, sf_dir, "documents", fan_out=True)
    words = F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
    base = docs.select("doc_id", "lang", words.alias("w"))
    m = F.greatest(F.size("w") - 1, F.lit(0))
    pairs = F.explode(
        F.zip_with(
            F.slice("w", 1, m),
            F.slice("w", 2, m),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    ).alias("b")
    split_b = F.split(F.col("b"), " ")
    # r15 (guide §2.3 — ONE bigram pass): the corpus was previously
    # bigram-exploded twice — once over the lang='en' slice to
    # estimate the LM, once over ALL docs to score them. Pre-aggregate
    # the full stream to per-(doc, lang, w1, w2) counts and checkpoint
    # THAT; the LM's (w1, w2) counts are sums of the en rows' per-doc
    # counts and the scoring join consumes the same compact frame, so
    # each document is tokenized and exploded exactly once. Counts
    # stay exact integers throughout.
    doc_pairs = base.select("doc_id", "lang", pairs).select(
        "doc_id",
        "lang",
        split_b.getItem(0).alias("w1"),
        split_b.getItem(1).alias("w2"),
    )
    pairs_c = stage_checkpoint(
        doc_pairs.groupBy("doc_id", "lang", "w1", "w2").agg(
            F.count(F.lit(1)).alias("n")
        ),
        eager=True,
    )
    tc = (
        pairs_c.filter(F.col("lang") == "en")
        .groupBy("w1", "w2")
        .agg(F.sum("n").alias("c2"))
    )
    lm = tc.select(
        "w1",
        "w2",
        F.floor(
            F.log(
                F.col("c2") * 1.0 / F.sum("c2").over(Window.partitionBy("w1"))
            )
            * 1000000
        )
        .cast("bigint")
        .alias("lp"),
    )
    return (
        pairs_c.join(lm, ["w1", "w2"], "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(F.when(F.col("lp").isNotNull(), F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("covered_grams"),
            F.sum(F.when(F.col("lp").isNull(), F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("oov_grams"),
            (-F.coalesce(F.sum(F.col("n") * F.col("lp")), F.lit(0)))
            .cast("bigint")
            .alias("nll_micronats"),
        )
        .withColumn(
            "avg_nll_micronats",
            F.expr(
                "CASE WHEN covered_grams > 0 "
                "THEN nll_micronats div covered_grams END"
            ).cast("bigint"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# DSIR importance weights: per-word micro-nat log-ratio between the
# target (lang='en') and raw unigram distributions, summed per doc.
# ---------------------------------------------------------------------------

_DSIR_ORACLE = f"""
WITH base AS (
  SELECT doc_id, source, lang, {_WORDS_SQL} AS w FROM documents
),
tok AS (
  SELECT doc_id, source, lang, unnest(w) AS term FROM base
),
u AS (
  SELECT term, COUNT(*) AS cr,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
  FROM tok GROUP BY term
),
u2 AS (
  SELECT term, cr, ct, SUM(cr) OVER () AS tr, SUM(ct) OVER () AS tt FROM u
),
lr AS (
  SELECT term,
         CAST(floor((ln(ct * 1.0 / tt) - ln(cr * 1.0 / tr)) * 1000000)
              AS BIGINT) AS lr_micro
  FROM u2 WHERE ct > 0
)
SELECT k.doc_id, k.source, k.lang,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(COUNT(*) - COUNT(l.lr_micro) AS BIGINT) AS oov_words,
       CAST(COALESCE(SUM(l.lr_micro), 0) AS BIGINT)
         AS dsir_logratio_micronats
FROM tok k LEFT JOIN lr l USING (term)
GROUP BY 1, 2, 3
ORDER BY k.doc_id
"""


@query("doc_dsir_weights", _DSIR_ORACLE)
def doc_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weighting. ONE keyed aggregation produces
    both unigram distributions (raw count + conditional target count —
    no second pass over the token stream); the corpus totals attach as
    a broadcast 1-row aggregate; the log-ratio table joined back onto
    the token stream is vocabulary-sized (broadcastable). Words outside
    the target vocabulary are excluded from the sum and reported as
    oov_words."""
    docs = read_table(spark, sf_dir, "documents", fan_out=True)
    words = F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
    tok = docs.select(
        "doc_id", "source", "lang", F.explode(words).alias("term")
    )
    # r15 note (measure-first, guide §1): the dsir twin of the
    # lm-score one-pass rewrite (pre-aggregate to per-(doc, term)
    # counts, checkpoint that, derive both distributions from it) was
    # A/B'd and REVERTED — 7-sample medians 1.15 s (this form) vs
    # 1.27 s (pre-agg form) at sf0.1: unigrams dedupe far less than
    # bigrams per doc, so the materialized (doc, term) frame costs
    # more than the second tokenize it saves.
    u = tok.groupBy("term").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("ct"),
    )
    # corpus totals as a broadcast 1-row aggregate, NOT a
    # partition-less window: an open vocabulary can be billions of
    # terms, and an unpartitioned window would funnel them all
    # through one task just to attach two scalars. Materialize the
    # vocab table first so the totals branch doesn't re-run the
    # token-stream aggregation (test_plans pins the single pass).
    u = stage_checkpoint(u, eager=True)
    totals = u.agg(F.sum("cr").alias("tr"), F.sum("ct").alias("tt"))
    u2 = u.join(F.broadcast(totals))
    lr = u2.filter(F.col("ct") > 0).select(
        "term",
        F.floor(
            (
                F.log(F.col("ct") * 1.0 / F.col("tt"))
                - F.log(F.col("cr") * 1.0 / F.col("tr"))
            )
            * 1000000
        )
        .cast("bigint")
        .alias("lr_micro"),
    )
    return (
        tok.join(lr, "term", "left")
        .groupBy("doc_id", "source", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            (F.count(F.lit(1)) - F.count("lr_micro"))
            .cast("bigint")
            .alias("oov_words"),
            F.coalesce(F.sum("lr_micro"), F.lit(0))
            .cast("bigint")
            .alias("dsir_logratio_micronats"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# CCNet head/middle/tail bucketing over the reference-LM scores.
# ---------------------------------------------------------------------------

_CCNET_BUCKETS_ORACLE = f"""
WITH scores AS ({_LM_SCORE_ORACLE.rsplit("ORDER BY", 1)[0]}),
b AS (
  SELECT doc_id, lang, avg_nll_micronats,
         COUNT(*) OVER (PARTITION BY lang ORDER BY avg_nll_micronats)
           AS cnt_le,
         COUNT(*) OVER (PARTITION BY lang) AS n_tot
  FROM scores WHERE avg_nll_micronats IS NOT NULL
)
SELECT doc_id, lang, avg_nll_micronats,
       CASE WHEN 3 * cnt_le <= n_tot THEN 'head'
            WHEN 3 * cnt_le <= 2 * n_tot THEN 'middle'
            ELSE 'tail' END AS bucket
FROM b
UNION ALL
SELECT doc_id, lang, avg_nll_micronats, 'oov' AS bucket
FROM scores WHERE avg_nll_micronats IS NULL
ORDER BY doc_id
"""


@query("doc_ccnet_buckets", _CCNET_BUCKETS_ORACLE)
def doc_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail corpus split: per language, docs sort
    by reference-LM perplexity (avg NLL, integer micro-nats from
    :func:`doc_lm_quality_score`) and the best/middle/worst thirds
    become the quality tiers the pipeline samples from. Tie-aware and
    value-based — the tercile test is 3·cum_le ≤ k·n in INTEGERS
    (identical in any engine; ties share a bucket), computed at the
    distinct (lang, score) level via the two-pass grouped cumulative
    counts (no per-language single-task window). Docs with no covered
    bigrams land in an explicit 'oov' bucket."""
    from calorista_spark.cache import tracked_persist
    from calorista_spark.operators.ranks import grouped_cume_counts

    # persist: the scores frame feeds THREE consumers (the cume-count
    # input, the per-doc join-back, and the oov branch) — without it
    # each re-runs the full reference-LM pipeline (trigram-LM build +
    # join), measured 4.2 s → ~2.5 s at sf0.1. Serialized like the
    # rank ops' staged frames; tracked so runners' release_caches()
    # epilogue reclaims it after materialization.
    scores = tracked_persist(
        doc_lm_quality_score(spark, sf_dir).select(
            "doc_id", "lang", "avg_nll_micronats"
        )
    )
    scored = scores.filter(F.col("avg_nll_micronats").isNotNull())
    cume = grouped_cume_counts(scored, "lang", "avg_nll_micronats")
    per_value = cume.select(
        F.col("lang").alias("__lang"),
        F.col("avg_nll_micronats").alias("__nll"),
        F.when(3 * F.col("cum_le") <= F.col("n_total"), F.lit("head"))
        .when(3 * F.col("cum_le") <= 2 * F.col("n_total"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
    bucketed = scored.join(
        per_value,
        (F.col("lang") == F.col("__lang"))
        & (F.col("avg_nll_micronats") == F.col("__nll")),
    ).select("doc_id", "lang", "avg_nll_micronats", "bucket")
    oov = scores.filter(F.col("avg_nll_micronats").isNull()).select(
        "doc_id", "lang", "avg_nll_micronats", F.lit("oov").alias("bucket")
    )
    return bucketed.unionAll(oov).orderBy("doc_id")
