"""Benchmark decontamination, BM25 retrieval, and semantic dedup —
three more Tier-B training-data ops (BASELINE.json north star).

- Decontamination: the step every pretraining pipeline runs before
  evaluation — find test-split documents whose word n-grams leak from
  the train split. Shape at scale: gram-keyed hash join (test grams ⋈
  distinct train grams) + one groupBy(doc) — both map-side combinable,
  no quadratic work.
- BM25: the lexical-retrieval scorer. Corpus statistics (N, avgdl,
  per-term df) reduce to ONE tiny row broadcast back to the scan;
  per-document term frequencies are higher-order array expressions, so
  scoring is a stateless narrow pass + TakeOrdered top-k.
- SemDeDup-style pruning (Abbas et al. 2023 semantic dedup): rank
  vectors by cosine similarity to their cluster centroid and keep the
  most central half per cluster. Centroids are a 64·|labels|-row
  aggregate (corpus-size independent) broadcast back; similarity is a
  deterministic left-fold (functions/vectors.py).

Reference tie-in: generalizes the reference's fingerprint dedup
(main.py:54-60) to semantic space and adds the retrieval/eval-hygiene
ops the reference never needed at food-log scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.functions.vectors import dot, l2_norm
from calorista_spark.operators.similarity import shingles, words_of
from calorista_spark.queries.registry import query

# DuckDB fragments mirroring operators/similarity.py (same as llm.py).
_WORDS = "string_split_regex(lower(COALESCE(text, '')), '\\s+')"
_SHINGLES = (
    f"CASE WHEN len({_WORDS}) >= 3 THEN "
    f"list_transform(range(1, len({_WORDS}) - 1), "
    f"i -> array_to_string(list_slice({_WORDS}, i, i + 2), ' ')) "
    f"ELSE [] END"
)

# ---------------------------------------------------------------------------
# Train/test decontamination: 3-gram leakage from train into test.
# Split rule matches doc_train_test_split (md5 first hex char < 'c').
# ---------------------------------------------------------------------------

_DECONTAM_ORACLE = f"""
WITH labeled AS (
  SELECT doc_id, text,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' AS is_train
  FROM documents
),
grams AS (
  SELECT doc_id, is_train, unnest(list_distinct({_SHINGLES})) AS gram
  FROM labeled
),
train_grams AS (SELECT DISTINCT gram FROM grams WHERE is_train),
test_hits AS (
  SELECT g.doc_id, t.gram IS NOT NULL AS hit
  FROM grams g LEFT JOIN train_grams t USING (gram)
  WHERE NOT g.is_train
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(*) FILTER (WHERE hit) AS BIGINT) AS n_leaked,
       ROUND(COUNT(*) FILTER (WHERE hit) * 1.0 / COUNT(*), 4) AS contamination,
       COUNT(*) FILTER (WHERE hit) * 2 >= COUNT(*) AS contaminated
FROM test_hits
GROUP BY doc_id
ORDER BY doc_id
"""


@query("doc_decontamination_report", _DECONTAM_ORACLE)
def doc_decontamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per test-split document: how many of its distinct word 3-grams
    also occur anywhere in the train split. One gram-keyed left join
    (the train side is already distinct, so the join is |grams|-bounded)
    then a groupBy(doc_id) — the standard eval-decontamination shape
    that survives a 100× corpus because nothing is quadratic."""
    docs = read_table(spark, sf_dir, "documents", fan_out=True)
    labeled = docs.select(
        "doc_id",
        (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "c").alias(
            "is_train"
        ),
        F.explode(F.array_distinct(shingles("text", 3))).alias("gram"),
    )
    # single pass: a max-over-gram window marks leaked grams without a
    # second tokenize of the train branch (a distinct+join formulation
    # re-exploded every document twice — 2× the dominant cost)
    hit = F.max(F.when(F.col("is_train"), True)).over(
        Window.partitionBy("gram")
    )
    test_hits = labeled.withColumn("hit", hit).filter(~F.col("is_train"))
    n_hit = F.count(F.when(F.col("hit"), 1))
    return (
        test_hits.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            n_hit.alias("n_leaked"),
            F.round(n_hit * 1.0 / F.count(F.lit(1)), 4).alias("contamination"),
            (n_hit * 2 >= F.count(F.lit(1))).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# BM25 retrieval over a fixed 3-term query. Lucene-style idf
# (ln(1 + (N-df+0.5)/(df+0.5))) so scores stay positive; k1=1.2,
# b=0.75. Term frequencies are per-row array expressions — corpus
# stats are the only aggregation, and they reduce to one row.
# ---------------------------------------------------------------------------

_BM25_TERMS = ("join", "hash", "scan")

_BM25_TF = "CAST(len(list_filter({w}, x -> x = '{t}')) AS DOUBLE)"
_BM25_PART = (
    "(ln(1 + (stats.n_docs - stats.df_{t} + 0.5) / (stats.df_{t} + 0.5)) * "
    "d.tf_{t} * (CAST(1.2 AS DOUBLE) + 1) / "
    "(d.tf_{t} + CAST(1.2 AS DOUBLE) * (1 - CAST(0.75 AS DOUBLE) "
    "+ CAST(0.75 AS DOUBLE) * d.dl / stats.avgdl)))"
)

_BM25_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         CAST(len({_WORDS}) AS DOUBLE) AS dl,
         {_BM25_TF.format(w=_WORDS, t='join')} AS tf_join,
         {_BM25_TF.format(w=_WORDS, t='hash')} AS tf_hash,
         {_BM25_TF.format(w=_WORDS, t='scan')} AS tf_scan
  FROM documents
),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         SUM(dl) / COUNT(*) AS avgdl,
         CAST(COUNT(*) FILTER (WHERE tf_join > 0) AS DOUBLE) AS df_join,
         CAST(COUNT(*) FILTER (WHERE tf_hash > 0) AS DOUBLE) AS df_hash,
         CAST(COUNT(*) FILTER (WHERE tf_scan > 0) AS DOUBLE) AS df_scan
  FROM d
),
scored AS (
  SELECT d.doc_id,
         ROUND({_BM25_PART.format(t='join')} + {_BM25_PART.format(t='hash')}
               + {_BM25_PART.format(t='scan')}, 4) AS bm25
  FROM d CROSS JOIN stats
)
SELECT doc_id, bm25,
       CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER) AS rank
FROM scored
ORDER BY rank
LIMIT 20
"""


@query("doc_bm25_search", _BM25_ORACLE)
def doc_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for the fixed query {join, hash, scan}. Corpus
    statistics (N, avgdl, df per term) aggregate to a single row that
    broadcasts back onto the stateless per-document scoring pass, so
    the whole retrieval is scan → one-row agg → broadcast-join →
    TakeOrdered(20) — no full sort, no wide shuffle at any scale."""
    docs = read_table(spark, sf_dir, "documents", fan_out=True)
    w = words_of("text")

    def tf_col(t: str):
        # NB: a two-arg lambda in F.filter means (element, index) —
        # bind the term via closure, keep the lambda single-arg.
        return F.size(F.filter(w, lambda x: x == t)).cast("double").alias(f"tf_{t}")

    d = docs.select(
        "doc_id",
        F.size(w).cast("double").alias("dl"),
        *[tf_col(t) for t in _BM25_TERMS],
    )
    stats = d.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.count(F.when(F.col(f"tf_{t}") > 0, 1)).cast("double").alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )

    def part(t: str):
        idf = F.log(
            1
            + (F.col("n_docs") - F.col(f"df_{t}") + 0.5) / (F.col(f"df_{t}") + 0.5)
        )
        tf = F.col(f"tf_{t}")
        return (
            idf
            * tf
            * (F.lit(1.2) + 1)
            / (tf + F.lit(1.2) * (1 - F.lit(0.75) + F.lit(0.75) * F.col("dl") / F.col("avgdl")))
        )

    scored = d.join(F.broadcast(stats)).select(
        "doc_id",
        F.round(part("join") + part("hash") + part("scan"), 4).alias("bm25"),
    )
    # top-k FIRST (TakeOrderedAndProject — per-partition heaps, no
    # global sort), then rank within the bounded 20-row result; a
    # global row_number window before the limit would funnel the whole
    # corpus through one partition.
    top = scored.orderBy(F.col("bm25").desc(), "doc_id").limit(20)
    return top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.col("bm25").desc(), "doc_id")),
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# SemDeDup-style semantic pruning: keep the most-central half of each
# label cluster by cosine-to-centroid. Centroids rounded to 6 decimals
# BEFORE the similarity fold so both engines chain from identical
# numbers (see registry conventions).
# ---------------------------------------------------------------------------

_SEMDEDUP_ORACLE = """
WITH dims AS (
  SELECT label, CAST(unnest(range(1, 65)) AS INTEGER) AS dim,
         unnest(embedding) AS val
  FROM embeddings
),
cent AS (
  SELECT label, dim, ROUND(AVG(CAST(val AS DOUBLE)), 6) AS cv
  FROM dims GROUP BY label, dim
),
carr AS (SELECT label, list(cv ORDER BY dim) AS cvec FROM cent GROUP BY label),
scored AS (
  SELECT e.label, e.vec_id,
         list_sum(list_transform(list_zip(e.embedding, c.cvec),
                  x -> CAST(x[1] AS DOUBLE) * x[2]))
         / (sqrt(list_sum(list_transform(e.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(c.cvec, x -> x * x)))) AS sim
  FROM embeddings e JOIN carr c USING (label)
),
ranked AS (
  SELECT label, vec_id, sim,
         CAST(row_number() OVER (PARTITION BY label
              ORDER BY sim DESC, vec_id) AS INTEGER) AS rank,
         COUNT(*) OVER (PARTITION BY label) AS n
  FROM scored
)
SELECT label, vec_id, ROUND(sim, 4) + 0 AS centroid_sim, rank,
       rank * 2 <= n + 1 AS kept
FROM ranked
ORDER BY label, rank
"""
# NB: "+ 0" collapses IEEE -0.0 to +0.0 — a similarity rounding to
# zero can carry either sign depending on the engine's dot-product
# accumulation order.


@query("embedding_semdedup_prune", _SEMDEDUP_ORACLE)
def embedding_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup (SemDeDup): per label cluster, rank vectors by
    cosine similarity to the cluster centroid and keep the most
    central ceil(n/2). The centroid table is 64·|labels| rows
    regardless of corpus size → broadcast join; the rank shuffle is
    keyed by label (cluster id), the same key the upstream IVF
    partitioning already produces, so at scale this adds one narrow
    pass over each cluster."""
    emb = read_table(spark, sf_dir, "embeddings")
    dims = emb.select("label", F.posexplode("embedding").alias("pos", "val"))
    cent = dims.groupBy("label", (F.col("pos") + 1).cast("int").alias("dim")).agg(
        F.round(F.avg(F.col("val").cast("double")), 6).alias("cv")
    )
    carr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cv"))), lambda s: s.cv
        ).alias("cvec")
    )
    sim = dot("embedding", "cvec") / (l2_norm("embedding") * l2_norm("cvec"))
    w = Window.partitionBy("label").orderBy(F.col("sim").desc(), "vec_id")
    wn = Window.partitionBy("label")
    return (
        emb.join(F.broadcast(carr), "label")
        .select("label", "vec_id", sim.alias("sim"))
        .select(
            "label",
            "vec_id",
            "sim",
            F.row_number().over(w).alias("rank"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .select(
            "label",
            "vec_id",
            # + 0.0 collapses -0.0 (see oracle NB)
            (F.round("sim", 4) + 0.0).alias("centroid_sim"),
            "rank",
            (F.col("rank") * 2 <= F.col("n") + 1).alias("kept"),
        )
        .orderBy("label", "rank")
    )
