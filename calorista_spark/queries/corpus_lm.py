"""Corpus statistics for tokenizer/LM design (SURVEY §2.11 L4
extensions): vocabulary coverage curves and trigram conditional
probabilities — the counting passes a tokenizer trainer or n-gram
LM runs over a corpus.

Scale shape: both queries reduce token streams to vocabulary-sized
aggregates before any windowing, so the expensive stages are plain
keyed shuffles with map-side partial aggregation; the global ranking
window runs over the (tiny, corpus-independent) vocabulary only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.queries.registry import query

_WORDS_SQL = "string_split_regex(lower(COALESCE(text, '')), '\\s+')"

# ---------------------------------------------------------------------------
# Vocabulary coverage: how much of the token stream the top-k words
# cover (the tokenizer-budget curve).
# ---------------------------------------------------------------------------

_VOCAB_ORACLE = f"""
WITH terms AS (
  SELECT unnest({_WORDS_SQL}) AS term FROM documents
),
freq AS (SELECT term, COUNT(*) AS cnt FROM terms GROUP BY term),
ranked AS (
  SELECT term, cnt,
         CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS rank,
         SUM(cnt) OVER (ORDER BY cnt DESC, term
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER () AS total
  FROM freq
)
SELECT rank, term, CAST(cnt AS BIGINT) AS cnt,
       ROUND(cum * 1.0 / total, 6) AS cum_share
FROM ranked WHERE rank <= 100
ORDER BY rank
"""


@query("corpus_vocab_coverage", _VOCAB_ORACLE)
def corpus_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 vocabulary coverage curve. The token explode reduces to
    per-term counts with map-side combine; then top-100 FIRST
    (TakeOrderedAndProject — per-partition heaps; an open-vocabulary
    corpus can have billions of distinct terms, so no window may see
    the full vocab), the grand total as a broadcast 1-row aggregate,
    and rank/cumulative windows only over the bounded 100-row result.
    Identical output to ranking the full vocab: the top-k ordering key
    equals the rank ordering key (cnt desc, term)."""
    docs = read_table(spark, sf_dir, "documents", fan_out=True)
    terms = docs.select(
        F.explode(F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+")).alias("term")
    )
    freq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("__total"))
    top = freq.orderBy(F.col("cnt").desc(), "term").limit(100)
    w_rank = Window.orderBy(F.col("cnt").desc(), "term")
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        top.join(F.broadcast(total))
        .select(
            F.row_number().over(w_rank).cast("bigint").alias("rank"),
            "term",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.round(
                F.sum("cnt").over(w_cum) * 1.0 / F.col("__total"), 6
            ).alias("cum_share"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Trigram conditional probabilities: P(w3 | w1 w2) for trigrams seen
# at least 5 times — the n-gram LM estimation pass.
# ---------------------------------------------------------------------------

_TRIGRAM_ORACLE = f"""
WITH w AS (SELECT {_WORDS_SQL} AS words FROM documents),
tri AS (
  SELECT unnest(list_transform(range(1, greatest(len(words) - 1, 1)),
         i -> words[i] || ' ' || words[i + 1] || ' ' || words[i + 2])) AS t3
  FROM w
),
split_t AS (
  SELECT string_split(t3, ' ') AS p FROM tri
),
tc AS (
  SELECT p[1] AS w1, p[2] AS w2, p[3] AS w3, COUNT(*) AS c3
  FROM split_t GROUP BY 1, 2, 3
),
bc AS (SELECT w1, w2, SUM(c3) AS c2 FROM tc GROUP BY 1, 2)
SELECT tc.w1, tc.w2, tc.w3,
       CAST(tc.c3 AS BIGINT) AS c3, CAST(bc.c2 AS BIGINT) AS c2,
       CAST((tc.c3 * 1000000) // bc.c2 AS BIGINT) AS cond_p_ppm
FROM tc JOIN bc ON tc.w1 = bc.w1 AND tc.w2 = bc.w2
WHERE tc.c3 >= 5
ORDER BY tc.w1, tc.w2, tc.w3
"""


@query("corpus_trigram_lm", _TRIGRAM_ORACLE)
def corpus_trigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram LM estimation: trigram counts, their bigram-prefix
    totals, and the conditional probability. The trigram explode stays
    fused with the split projection (zip_with over shifted slices —
    no self-join); prefix totals come from a window over (w1, w2) on
    the already-aggregated counts, so the explode pipeline runs ONCE
    (a groupBy+join of the same frame recomputes it: measured 1.8s vs
    1.4s at sf0.1)."""
    docs = read_table(spark, sf_dir, "documents", fan_out=True)
    words = F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
    n = F.size(words)
    m = F.greatest(n - 2, F.lit(0))
    s1 = F.slice(words, 1, m)
    s2 = F.slice(words, 2, m)
    s3 = F.slice(words, 3, m)
    t12 = F.zip_with(s1, s2, lambda a, b: F.concat_ws(" ", a, b))
    t123 = F.zip_with(t12, s3, lambda ab, c: F.concat_ws(" ", ab, c))
    parts = F.split(F.col("t3"), " ")
    tc = (
        docs.select(F.explode(t123).alias("t3"))
        .select(
            parts.getItem(0).alias("w1"),
            parts.getItem(1).alias("w2"),
            parts.getItem(2).alias("w3"),
        )
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c3"))
    )
    w_prefix = Window.partitionBy("w1", "w2")
    return (
        tc.withColumn("c2", F.sum("c3").over(w_prefix))
        .filter(F.col("c3") >= 5)
        .select(
            "w1",
            "w2",
            "w3",
            F.col("c3").cast("bigint").alias("c3"),
            F.col("c2").cast("bigint").alias("c2"),
            # integer parts-per-million: exact in both engines (a
            # double ratio rounds half-cases differently across them)
            F.expr("c3 * 1000000 div c2").cast("bigint").alias("cond_p_ppm"),
        )
        .orderBy("w1", "w2", "w3")
    )


@query("corpus_bpe_merges", None)
def corpus_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer training: the first 8 BPE merges learned from the
    corpus (Sennrich subword units — see operators/bpe.py for the
    scale shape: one corpus pass for word counts, then vocab-sized
    iterations with a 1-row collect per learned merge). Iterative ⇒
    rows-only driver check; the algorithm is pinned against a pure-
    python reference implementation in tests/test_bpe.py, including
    the non-overlapping left-to-right merge semantics and the
    deterministic (count desc, pair asc) tie-break."""
    from calorista_spark.operators.bpe import learn_bpe_merges

    docs = read_table(spark, sf_dir, "documents")
    merges, _ = learn_bpe_merges(docs, 8)
    return spark.createDataFrame(
        [
            (i + 1, left, right, cnt)
            for i, (left, right, cnt) in enumerate(merges)
        ],
        "merge_rank int, left string, right string, pair_count long",
    ).orderBy("merge_rank")


@query("corpus_bpe_compression", None)
def corpus_bpe_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLY path: after learning 8 BPE merges, the
    per-source compression report — words, characters, BPE tokens,
    and chars-per-token — by joining each source's word stream
    against the trained vocabulary's symbol counts (vocab-sized
    broadcast side; the corpus pass is one explode + one keyed agg).
    The "how much does this tokenizer compress each feed" question a
    tokenizer-training run answers before committing. Iterative
    upstream ⇒ rows-only, like corpus_bpe_merges."""
    from calorista_spark.operators.bpe import learn_bpe_merges
    from calorista_spark.operators.similarity import words_of

    docs = read_table(spark, sf_dir, "documents")
    _, vocab = learn_bpe_merges(docs, 8)
    sym_counts = vocab.select(
        "word", F.size("symbols").alias("n_sym"), F.length("word").alias("n_chr")
    )
    words = docs.select(
        "source", F.explode(words_of("text")).alias("word")
    ).filter(F.length("word") > 0)
    return (
        words.join(F.broadcast(sym_counts), "word")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_chr").alias("n_chars"),
            F.sum("n_sym").alias("n_bpe_tokens"),
            (
                F.floor(
                    F.sum("n_chr") * 1.0 / F.sum("n_sym") * 1e4 + F.lit(0.5)
                )
                / 1e4
            ).alias("chars_per_token"),
        )
        .orderBy("source")
    )
