"""Extra text-analysis and embedding queries (SURVEY §2.11 L3/L4):
word bigrams, exact TF-IDF, per-label centroids, euclidean top-k.

Tokenization matches the corpus convention used across llm.py:
``split(lower(text), '\\s+')`` == DuckDB
``string_split_regex(lower(COALESCE(text, '')), '\\s+')``. Logarithms and square
roots are correctly-rounded IEEE ops, identical across engines; sums
are left folds; every ranking breaks ties on the term / candidate id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.functions.vectors import cosine_similarity, l2_distance
from calorista_spark.queries.registry import query

_WORDS = "string_split_regex(lower(COALESCE(text, '')), '\\s+')"


# ---------------------------------------------------------------------------
# L4: top word bigrams across the corpus — the n-gram frequency
# profile (shingle explode stays fused with its projection, the
# perf invariant from the minhash pipeline).
# ---------------------------------------------------------------------------

_BIGRAM_ORACLE = f"""
WITH w AS (SELECT {_WORDS} AS words FROM documents),
b AS (
  SELECT unnest(list_transform(range(1, len(words)),
                i -> words[i] || ' ' || words[i + 1])) AS bigram
  FROM w
)
SELECT bigram, COUNT(*) AS n
FROM b
GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 20
"""


@query("doc_bigram_topk", _BIGRAM_ORACLE)
def doc_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 word bigrams: zip words with their tail (no
    self-join), explode, count. Ties break on the bigram string."""
    docs = read_table(spark, sf_dir, "documents", fan_out=True)
    words = F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
    n = F.size(words)
    bigrams = F.zip_with(
        F.slice(words, 1, n - 1),
        F.slice(words, 2, n - 1),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# L4: exact TF-IDF, top-3 terms per document. The exact twin of the
# HashingTF+IDF sketch path — term frequencies and document
# frequencies are real counts, idf = ln(N / df).
# ---------------------------------------------------------------------------

_TFIDF_ORACLE = f"""
WITH terms AS (
  SELECT doc_id, unnest({_WORDS}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term
),
df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms GROUP BY term
),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 4) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tfidf,
         CAST(row_number() OVER (PARTITION BY doc_id
              ORDER BY tfidf DESC, term) AS INTEGER) AS rank
  FROM scored
)
SELECT doc_id, term, tfidf, rank FROM ranked WHERE rank <= 3
ORDER BY doc_id, rank
"""


@query("doc_tfidf_top_terms", _TFIDF_ORACLE)
def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact TF-IDF top-3 terms per doc. The df table is vocab-sized
    — broadcast onto the tf side; ranking on (rounded score, term)."""
    from calorista_spark.operators.checkpoint import stage_checkpoint

    docs = read_table(spark, sf_dir, "documents", fan_out=True)
    terms = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+")).alias("term")
    )
    # r15 (guide §2.3 — VERDICT r14 #5 follow-up): r14 derived df from
    # tf counting on RUNTIME exchange reuse, which the static plan
    # never confirmed. Make the reuse structural: checkpoint the
    # compact (doc, term) frame once — the df branch, the n_docs
    # scalar, and the scoring stream all ride it, so the corpus is
    # exploded exactly once by construction.
    tf = stage_checkpoint(
        terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")),
        eager=True,
    )
    # one row per (doc, term) means COUNT(*) == COUNT(DISTINCT doc_id)
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # every document emits >= 1 term row (split of coalesce(text, '')
    # is never empty — null/empty text yields the '' term), so the
    # distinct doc count of tf IS the table's distinct doc count; no
    # third scan of the documents parquet
    n_docs = tf.select(
        F.countDistinct("doc_id").cast("double").alias("n_docs")
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tfidf", "rank")
        .orderBy("doc_id", "rank")
    )


# ---------------------------------------------------------------------------
# L3/L5: per-label centroids in long form (label, dim, value) — the
# building block the IVF index materializes; exposed as its own op.
# ---------------------------------------------------------------------------

_CENTROID_ORACLE = """
WITH dims AS (
  SELECT label, CAST(unnest(range(1, 65)) AS INTEGER) AS dim,
         unnest(embedding) AS val
  FROM embeddings WHERE embedding IS NOT NULL
)
SELECT label, dim, ROUND(AVG(CAST(val AS DOUBLE)), 6) AS centroid_val,
       CAST(COUNT(*) AS BIGINT) AS n_vectors
FROM dims
GROUP BY label, dim
ORDER BY label, dim
"""


@query("embedding_centroids", _CENTROID_ORACLE)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elementwise per-label mean in long form: posexplode → groupBy
    (label, dim). One shuffle keyed on (label, dim) — 64·|labels|
    groups regardless of corpus size."""
    # null vectors are excluded EXPLICITLY on both sides: DuckDB's
    # zipped unnest emits 64 null rows for a null list (inflating
    # COUNT) while posexplode emits none (r6 null-injection audit)
    emb = read_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    dims = emb.select(
        "label", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "label", (F.col("pos") + 1).cast("int").alias("dim"), F.col("val")
    )
    return (
        dims.groupBy("label", "dim")
        .agg(
            F.round(F.avg(F.col("val").cast("double")), 6).alias("centroid_val"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
        .orderBy("label", "dim")
    )


# ---------------------------------------------------------------------------
# L3: euclidean top-k — the L2 twin of the cosine brute-force path.
# ---------------------------------------------------------------------------

_L2_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) "
    "* (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))"
)

_EUCLID_ORACLE = f"""
WITH nn AS (SELECT * FROM embeddings WHERE embedding IS NOT NULL),
q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM nn WHERE vec_id < 5),
scored AS (
  SELECT q.q_id, c.vec_id AS cand_id,
         ROUND(sqrt({_L2_DOT.format(a='q.q_vec', b='c.embedding')}), 6) AS dist
  FROM q CROSS JOIN nn c
  WHERE c.vec_id <> q.q_id
),
ranked AS (
  SELECT q_id, cand_id, dist,
         CAST(row_number() OVER (PARTITION BY q_id
              ORDER BY dist, cand_id) AS INTEGER) AS rank
  FROM scored
)
SELECT q_id, cand_id, dist, rank FROM ranked WHERE rank <= 5
ORDER BY q_id, rank
"""


@query("embedding_euclidean_topk", _EUCLID_ORACLE)
def embedding_euclidean_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest neighbors by L2 distance for a probe batch —
    same crossJoin + per-query window as the cosine baseline, ranking
    ascending on (rounded distance, candidate id)."""
    # ANN indexes exclude null vectors; a null distance would also
    # rank NULLS FIRST in Spark vs NULLS LAST in DuckDB
    emb = read_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    c = emb.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_vec")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("q_id") != F.col("cand_id"))
        .select(
            "q_id",
            "cand_id",
            F.round(l2_distance("q_vec", "c_vec"), 6).alias("dist"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("dist"), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", "cand_id", "dist", "rank")
        .orderBy("q_id", "rank")
    )


# ---------------------------------------------------------------------------
# L3: hard-negative mining — for each probe, the single most similar
# vector with a DIFFERENT label (the contrastive-training negative).
# ---------------------------------------------------------------------------

_COS_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
)

_HARD_NEG_ORACLE = f"""
WITH norms AS (
  SELECT vec_id, label, embedding,
         sqrt({_COS_DOT.format(a='embedding', b='embedding')}) AS norm
  FROM embeddings
),
q AS (
  SELECT vec_id AS q_id, label AS q_label, embedding AS q_vec, norm AS q_norm
  FROM norms WHERE vec_id < 8
),
scored AS (
  SELECT q.q_id, q.q_label, c.vec_id AS cand_id, c.label AS cand_label,
         ROUND({_COS_DOT.format(a='q.q_vec', b='c.embedding')}
               / (q.q_norm * c.norm), 6) AS sim
  FROM q JOIN norms c ON c.label <> q.q_label
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY q_id ORDER BY sim DESC, cand_id) AS rn
  FROM scored
)
SELECT q_id, q_label, cand_id, cand_label, sim
FROM ranked WHERE rn = 1
ORDER BY q_id
"""


@query("embedding_hard_negatives", _HARD_NEG_ORACLE)
def embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per probe
    (vec_id < 8), the top-1 cosine neighbor whose label differs.
    The probe batch broadcasts; candidates stream through a single
    partial-aggregatable ``max(struct(sim, -cand_id, ...))`` per
    query — map-side combine keeps the shuffle at |probes| rows, so
    (unlike a per-query window over all candidates) no task ever
    holds a query's full candidate set. Ties break to the smaller
    candidate id via the negated-id struct field."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_vec"),
    )
    c = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("cand_label"),
        F.col("embedding").alias("c_vec"),
    )
    scored = c.join(
        F.broadcast(q), F.col("cand_label") != F.col("q_label")
    ).select(
        "q_id",
        "q_label",
        "cand_id",
        "cand_label",
        F.round(cosine_similarity("q_vec", "c_vec"), 6).alias("sim"),
    )
    best = scored.groupBy("q_id", "q_label").agg(
        F.max(
            F.struct(
                F.col("sim").alias("sim"),
                (-F.col("cand_id")).alias("__neg"),
                F.col("cand_id").alias("cand_id"),
                F.col("cand_label").alias("cand_label"),
            )
        ).alias("m")
    )
    return best.select(
        "q_id",
        "q_label",
        F.col("m.cand_id").alias("cand_id"),
        F.col("m.cand_label").alias("cand_label"),
        F.col("m.sim").alias("sim"),
    ).orderBy("q_id")
