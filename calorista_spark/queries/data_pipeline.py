"""Training-data pipeline operators (SURVEY §2.11 Tier B, north-star
extensions): deterministic sampling / split / mixture, sliding-window
chunking, repetition metrics, quality filtering, PII-style redaction.

These are the dataset-curation ops a large-scale LLM pipeline runs
between raw ingest and tokenization. All are expressed as pure
DataFrame transformations (no Python UDFs in the hot path) so they
scale to 100 TB: sampling/split/mixture are stateless per-row hash
predicates (no shuffle at all), chunking is a fused explode, and the
metric ops are single keyed shuffles on (doc_id) / (doc_id, term).

Cross-engine determinism: randomness is replaced by md5 hex-prefix
comparisons — `md5(cast(id as string))` produces identical lowercase
hex in Spark and DuckDB, and lexicographic comparison of a hex prefix
against a constant implements Bernoulli(p) with p = prefix/16^k. This
is also the production-correct design: hash-based sampling is
reproducible across runs and cluster sizes, which `rand()` is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.queries.registry import query

_WORDS_SQL = "string_split_regex(lower(COALESCE(text, '')), '\\s+')"


# ---------------------------------------------------------------------------
# Deterministic Bernoulli sample — keep a doc iff the first two hex
# chars of md5(doc_id) fall below '28' (0x28/0x100 = 15.6%).
# ---------------------------------------------------------------------------

_SAMPLE_ORACLE = """
SELECT doc_id, source, n_chars
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '28'
ORDER BY doc_id
"""


@query("doc_hash_sample", _SAMPLE_ORACLE)
def doc_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~15.6% Bernoulli sample. A pure per-row predicate:
    no shuffle, fully pushdown-friendly, and the same rows survive on
    any cluster size — unlike ``df.sample`` whose output depends on
    partitioning."""
    docs = read_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    return (
        docs.filter(F.substring(h, 1, 2) < "28")
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Deterministic train/test split — hash-range assignment, then the
# per-split/source composition the pipeline would log.
# ---------------------------------------------------------------------------

_SPLIT_ORACLE = """
WITH assigned AS (
  SELECT *, CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
                 THEN 'train' ELSE 'test' END AS split
  FROM documents
)
SELECT split, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(CAST(n_chars AS DOUBLE)), 4) AS avg_chars
FROM assigned
GROUP BY split, source
ORDER BY split, source
"""


@query("doc_train_test_split", _SPLIT_ORACLE)
def doc_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """75/25 train/test assignment by hash range ('0'..'b' of 16 hex
    chars = 12/16). Assignment is a stateless projection; only the
    composition report shuffles (tiny: |splits|×|sources| groups)."""
    docs = read_table(spark, sf_dir, "documents")
    h1 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return (
        docs.withColumn(
            "split", F.when(h1 < "c", F.lit("train")).otherwise(F.lit("test"))
        )
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(F.col("n_chars").cast("double")), 4).alias("avg_chars"),
        )
        .orderBy("split", "source")
    )


# ---------------------------------------------------------------------------
# Weighted corpus mixture — per-source keep rates (even-numbered
# sources 25%, odd 75%), the "dataset mixing" step of pretraining
# data assembly, made deterministic per (doc_id, source).
# ---------------------------------------------------------------------------

_MIXTURE_ORACLE = """
WITH rated AS (
  SELECT source,
         CASE WHEN CAST(regexp_extract(source, 'src(\\d+)', 1) AS INTEGER) % 2 = 0
              THEN '4' ELSE 'c' END AS cut,
         substr(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 1) AS h
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(COUNT(*) FILTER (WHERE h < cut) AS BIGINT) AS n_kept,
       ROUND(COUNT(*) FILTER (WHERE h < cut) * 1.0 / COUNT(*), 4) AS keep_frac
FROM rated
GROUP BY source
ORDER BY source
"""


@query("corpus_source_mixture", _MIXTURE_ORACLE)
def corpus_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted downsampling per source: even sources
    keep ~4/16, odd ~12/16, via one hex char of md5(doc_id:source).
    At 100 TB this is the same stateless predicate — the report agg
    is the only shuffle and has |sources| groups."""
    docs = read_table(spark, sf_dir, "documents")
    src_num = F.regexp_extract(F.col("source"), r"src(\d+)", 1).cast("int")
    cut = F.when(src_num % 2 == 0, F.lit("4")).otherwise(F.lit("c"))
    h = F.substring(
        F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.col("source"))),
        1,
        1,
    )
    kept = F.sum(F.when(h < cut, 1).otherwise(0))
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            kept.cast("bigint").alias("n_kept"),
            F.round(kept * 1.0 / F.count(F.lit(1)), 4).alias("keep_frac"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Sliding-window chunking — size-40 token windows, stride 30 (10-token
# overlap), the context-window packing step before tokenization.
# ---------------------------------------------------------------------------

_CHUNK_ORACLE = f"""
WITH w AS (
  SELECT doc_id, {_WORDS_SQL} AS words FROM documents
),
s AS (
  SELECT doc_id, words,
         unnest(range(0, greatest(len(words), 1), 30)) AS start
  FROM w
)
SELECT doc_id,
       CAST(start // 30 AS INTEGER) AS chunk_id,
       CAST(len(list_slice(words, start + 1, start + 40)) AS INTEGER)
         AS n_tokens,
       md5(list_aggregate(list_slice(words, start + 1, start + 40),
                          'string_agg', ' ')) AS chunk_hash
FROM s
ORDER BY doc_id, chunk_id
"""


@query("doc_chunk_sliding", _CHUNK_ORACLE)
def doc_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token chunks: starts = sequence(0, n-1, stride),
    chunk = slice(words, start+1, 40). The sequence+explode stays
    fused with the split projection (one narrow stage, no shuffle);
    chunk identity is reported as an md5 so the verify payload stays
    small regardless of chunk text size."""
    docs = read_table(spark, sf_dir, "documents")
    words = F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(words) - 1, F.lit(0)), F.lit(30)
    )
    exploded = docs.select(
        "doc_id",
        words.alias("words"),
        F.explode(starts).alias("start"),
    )
    chunk = F.slice(F.col("words"), F.col("start") + 1, 40)
    return exploded.select(
        "doc_id",
        (F.col("start") / 30).cast("int").alias("chunk_id"),
        F.size(chunk).alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    ).orderBy("doc_id", "chunk_id")


# ---------------------------------------------------------------------------
# Repetition metrics — Gopher-style duplicate-content signals per doc:
# duplicate-word fraction, top-word fraction, top-bigram fraction.
# ---------------------------------------------------------------------------

_REPETITION_ORACLE = f"""
WITH w AS (SELECT doc_id, {_WORDS_SQL} AS words FROM documents),
terms AS (SELECT doc_id, unnest(words) AS term FROM w),
tc AS (
  SELECT doc_id, term, COUNT(*) AS cnt FROM terms GROUP BY doc_id, term
),
word_stats AS (
  SELECT doc_id,
         SUM(cnt) AS n_words,
         COUNT(*) AS n_distinct,
         MAX(cnt) AS top_cnt
  FROM tc GROUP BY doc_id
),
bigrams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(words)),
                               i -> words[i] || ' ' || words[i + 1])) AS bg
  FROM w
),
bc AS (SELECT doc_id, bg, COUNT(*) AS cnt FROM bigrams GROUP BY doc_id, bg),
bigram_stats AS (
  SELECT doc_id, SUM(cnt) AS n_bigrams, MAX(cnt) AS top_bg_cnt
  FROM bc GROUP BY doc_id
)
SELECT w.doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       ROUND(1.0 - n_distinct * 1.0 / n_words, 4) AS dup_word_frac,
       ROUND(top_cnt * 1.0 / n_words, 4) AS top_word_frac,
       ROUND(top_bg_cnt * 1.0 / n_bigrams, 4) AS top_bigram_frac
FROM word_stats w JOIN bigram_stats b ON w.doc_id = b.doc_id
ORDER BY w.doc_id
"""


@query("doc_repetition_metrics", _REPETITION_ORACLE)
def doc_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals (the Gopher repetition family
    restated columnar): two keyed aggregations on (doc_id, gram) that
    reduce to per-doc stats — partial aggregation makes the shuffle
    carry one row per distinct gram, not per token."""
    docs = read_table(spark, sf_dir, "documents", fan_out=True)
    words = F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
    terms = docs.select("doc_id", F.explode(words).alias("term"))
    tc = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("cnt"))
    word_stats = tc.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("cnt").alias("top_cnt"),
    )
    n = F.size(words)
    bigrams = F.zip_with(
        F.slice(words, 1, n - 1),
        F.slice(words, 2, n - 1),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    bc = (
        docs.select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    bigram_stats = bc.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_bigrams"), F.max("cnt").alias("top_bg_cnt")
    )
    return (
        word_stats.join(bigram_stats, "doc_id")
        .select(
            "doc_id",
            F.col("n_words").cast("bigint").alias("n_words"),
            F.round(1.0 - F.col("n_distinct") / F.col("n_words"), 4).alias(
                "dup_word_frac"
            ),
            F.round(F.col("top_cnt") / F.col("n_words"), 4).alias(
                "top_word_frac"
            ),
            F.round(F.col("top_bg_cnt") / F.col("n_bigrams"), 4).alias(
                "top_bigram_frac"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Quality filter — threshold rules over length / mean word length /
# duplication, reported as a per-source pass/fail composition.
# ---------------------------------------------------------------------------

_QUALITY_FILTER_ORACLE = f"""
WITH terms AS (
  SELECT doc_id, source, unnest({_WORDS_SQL}) AS term FROM documents
),
per_doc AS (
  SELECT doc_id, source,
         COUNT(*) AS n_words,
         COUNT(DISTINCT term) AS n_distinct,
         SUM(len(term)) * 1.0 / COUNT(*) AS mean_wlen
  FROM terms GROUP BY doc_id, source
),
flagged AS (
  SELECT source,
         CASE WHEN n_words >= 30
               AND mean_wlen BETWEEN 3.8 AND 5.2
               AND 1.0 - n_distinct * 1.0 / n_words <= 0.55
              THEN 'keep' ELSE 'drop' END AS verdict,
         n_words
  FROM per_doc
)
SELECT source, verdict, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(n_words * 1.0), 4) AS avg_words
FROM flagged
GROUP BY source, verdict
ORDER BY source, verdict
"""


@query("doc_quality_filter", _QUALITY_FILTER_ORACLE)
def doc_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based quality gate (length / mean-word-length / dup-rate
    thresholds, the C4/Gopher filter shape). All thresholds compare
    exact integer-ratio doubles, so the keep/drop verdict is
    bit-identical across engines."""
    docs = read_table(spark, sf_dir, "documents")
    words = F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
    terms = docs.select("doc_id", "source", F.explode(words).alias("term"))
    per_doc = terms.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.countDistinct("term").alias("n_distinct"),
        (F.sum(F.length("term")) * 1.0 / F.count(F.lit(1))).alias("mean_wlen"),
    )
    keep = (
        (F.col("n_words") >= 30)
        & F.col("mean_wlen").between(3.8, 5.2)
        & (1.0 - F.col("n_distinct") / F.col("n_words") <= 0.55)
    )
    return (
        per_doc.withColumn(
            "verdict", F.when(keep, F.lit("keep")).otherwise(F.lit("drop"))
        )
        .groupBy("source", "verdict")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(F.col("n_words") * 1.0), 4).alias("avg_words"),
        )
        .orderBy("source", "verdict")
    )


# ---------------------------------------------------------------------------
# PII-style redaction — scrub digit runs from the events props payload
# and report per-type redaction stats (the text-cleaning shape; the
# real pipeline swaps the pattern for email/phone/SSN regexes).
# ---------------------------------------------------------------------------

_REDACTION_ORACLE = """
WITH red AS (
  SELECT event_type,
         len(regexp_extract_all(props, '[0-9]+')) AS n_runs,
         regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS redacted
  FROM events
  WHERE props IS NOT NULL
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(n_runs) AS BIGINT) AS total_digit_runs,
       ROUND(AVG(len(redacted) * 1.0), 4) AS avg_redacted_len
FROM red
GROUP BY event_type
ORDER BY event_type
"""


@query("props_pii_redaction_stats", _REDACTION_ORACLE)
def props_pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digit-run redaction over the JSON props column: regexp_replace
    (Spark replaces all matches; the DuckDB twin needs the 'g' flag)
    plus a per-type audit count. Simple char-class patterns keep Java
    and RE2 regex semantics identical."""
    events = read_table(spark, sf_dir, "events")
    red = events.filter(F.col("props").isNotNull()).select(
        "event_type",
        F.size(F.regexp_extract_all(F.col("props"), F.lit("[0-9]+"), 0)).alias(
            "n_runs"
        ),
        F.regexp_replace("props", "[0-9]+", "<NUM>").alias("redacted"),
    )
    return (
        red.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("n_runs").cast("bigint").alias("total_digit_runs"),
            F.round(F.avg(F.length("redacted") * 1.0), 4).alias(
                "avg_redacted_len"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Corpus-wide line-level dedup (CCNet's per-line hash dedup, the step
# that strips boilerplate headers/footers shared across pages).
# ---------------------------------------------------------------------------

_LINE_DEDUP_ORACLE = """
WITH lines AS (
  SELECT d.source, d.doc_id, pos, line
  FROM (
    SELECT source, doc_id,
           unnest(string_split(COALESCE(text, ''), chr(10))) AS line,
           unnest(range(len(string_split(COALESCE(text, ''), chr(10)))))
             AS pos
    FROM documents
  ) AS d
  WHERE length(trim(line)) > 0
),
keeper AS (
  SELECT line, MIN(ROW(doc_id, pos)) AS keep_key
  FROM lines GROUP BY line
),
flagged AS (
  SELECT l.source, l.line,
         ROW(l.doc_id, l.pos) = k.keep_key AS kept
  FROM lines l JOIN keeper k USING (line)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(length(line)) AS BIGINT) AS n_chars,
       CAST(SUM(CASE WHEN kept THEN length(line) ELSE 0 END) AS BIGINT)
         AS n_chars_kept,
       FLOOR(CAST(SUM(CASE WHEN kept THEN length(line) ELSE 0 END)
                  AS DOUBLE)
             / CAST(SUM(length(line)) AS DOUBLE) * 1e6 + 0.5) / 1e6
         AS kept_char_frac
FROM flagged
GROUP BY source
ORDER BY source
"""


@query("corpus_line_dedup", _LINE_DEDUP_ORACLE)
def corpus_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus-wide LINE dedup: every non-blank line is
    deduplicated across the whole corpus (first occurrence by
    (doc_id, line position) wins — a total order, so the keeper is
    deterministic), reported per source as line/char keep rates — the
    "how much boilerplate does each feed carry" intake question.

    Scale shape: posexplode → one keyed groupBy(line) with map-side
    combine for the keeper key (at 100 TB the group key becomes
    xxhash64(line) — same plan, 8-byte keys; the literal line is kept
    here so the oracle can recompute it) → equi-join back on the line
    key → per-source aggregation. No window, no all-pairs; the keeper
    MIN is a combinable aggregate, exactly the L1 exact-dedup shape
    one level below documents."""
    docs = read_table(spark, sf_dir, "documents", fan_out=True)
    lines = docs.select(
        "source",
        "doc_id",
        F.posexplode(
            F.split(F.coalesce("text", F.lit("")), "\n")
        ).alias("pos", "line"),
    ).filter(F.length(F.trim("line")) > 0)
    # Keeper key is the lexicographic MIN over (doc_id, pos) structs —
    # no arithmetic composite (doc_id*K + pos collides past K lines per
    # doc and can overflow long for hashed doc_ids; struct ordering is
    # total and overflow-free on both engines).
    keeper = lines.groupBy("line").agg(
        F.min(F.struct("doc_id", "pos")).alias("keep_key")
    )
    flagged = lines.join(keeper, "line").select(
        "source",
        "line",
        (F.struct("doc_id", "pos") == F.col("keep_key")).alias("kept"),
    )
    kept_chars = F.sum(
        F.when(F.col("kept"), F.length("line")).otherwise(F.lit(0))
    )
    all_chars = F.sum(F.length("line"))
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            all_chars.cast("long").alias("n_chars"),
            kept_chars.cast("long").alias("n_chars_kept"),
            (
                F.floor(
                    kept_chars.cast("double")
                    / all_chars.cast("double")
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("kept_char_frac"),
        )
        .orderBy("source")
    )
