"""Tier-B LLM-data-pipeline queries (SURVEY §2.11 L1–L5) over the
``documents`` and ``embeddings`` corpora.

Every oracle mirrors the engine's computation primitive-for-primitive
(md5 hashes, left-fold dot products, floor-division bit tests), which
is what makes hash-level parity possible for these non-relational ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.operators.checkpoint import stage_checkpoint
from calorista_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    lsh_candidate_pairs,
    minhash_band_keys,
    minhash_consts_sql,
    minhash_signatures,
    ngram_jaccard,
    shingle_sets,
    simhash_32,
    with_norm,
)
from calorista_spark.operators.textstats import (
    bag_fingerprint,
    bpe_ish_token_count,
    predict_lang,
    quality_features,
    quality_score,
    rolling_hash,
    token_count,
)
from calorista_spark.queries.registry import query

# Shared oracle fragments (DuckDB dialect) mirroring similarity.py.
_WORDS = "string_split_regex(lower(COALESCE(text, '')), '\\s+')"
_SHINGLES = (
    f"CASE WHEN len({_WORDS}) >= 3 THEN "
    f"list_transform(range(1, len({_WORDS}) - 1), "
    f"i -> array_to_string(list_slice({_WORDS}, i, i + 2), ' ')) "
    f"ELSE [] END"
)
_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
)


# ---------------------------------------------------------------------------
# L1: exact dedup at corpus scale — hash-groupBy on content hash.
# ---------------------------------------------------------------------------

_EXACT_DEDUP_ORACLE = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents
GROUP BY md5(text)
ORDER BY keep_doc_id
"""


@query("doc_exact_dedup", _EXACT_DEDUP_ORACLE)
def doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1: exact dedup by content hash (scales O-D1: main.py:54-60's
    fingerprint set → hash-groupBy, map-side combinable)."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .orderBy("keep_doc_id")
    )


# ---------------------------------------------------------------------------
# L4: token counting — whitespace + BPE-ish regex.
# ---------------------------------------------------------------------------

_TOKEN_STATS_ORACLE = f"""
SELECT
  doc_id,
  length(COALESCE(text, ''))                                  AS n_chars,
  CASE WHEN length(trim(COALESCE(text, ''))) = 0 THEN 0
       ELSE len(string_split_regex(trim(COALESCE(text, '')), '\\s+')) END AS n_tokens,
  len(regexp_extract_all(COALESCE(text, ''), '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))   AS n_bpe_tokens,
  len(list_distinct({_WORDS}))                  AS n_distinct_tokens
FROM documents
ORDER BY doc_id
"""


@query("doc_token_stats", _TOKEN_STATS_ORACLE)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: whitespace + BPE-ish token counts per document."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long").alias("n_chars"),
        token_count("text").cast("long").alias("n_tokens"),
        bpe_ish_token_count("text").cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+")))
        .cast("long")
        .alias("n_distinct_tokens"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# L4: quality scoring — length/punct/stopword signals.
# ---------------------------------------------------------------------------

_STOPWORDS_SQL = (
    "['the','a','an','of','and','or','to','in','is','are',"
    "'was','that','this','it','for','on','with','as','at']"
)

_QUALITY_ORACLE = f"""
WITH feat AS (
  SELECT doc_id,
    length(COALESCE(text, '')) AS n_chars,
    CASE WHEN length(trim(COALESCE(text, ''))) = 0 THEN 0
         ELSE len(string_split_regex(trim(COALESCE(text, '')), '\\s+')) END AS n_tokens,
    len(list_filter({_WORDS}, w -> list_contains({_STOPWORDS_SQL}, w))) AS n_stop,
    len(regexp_extract_all(COALESCE(text, ''), '[^\\w\\s]')) AS n_punct
  FROM documents
)
SELECT doc_id,
  n_tokens,
  ROUND(CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens END, 4)  AS stopword_ratio,
  ROUND(CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars END, 4)   AS punct_ratio,
  ROUND(CASE WHEN n_tokens >= 10 AND n_tokens <= 100000
             THEN CAST(0.4 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
      + CASE WHEN COALESCE(CAST(n_stop AS DOUBLE) / NULLIF(n_tokens, 0), 0.0) >= 0.01
             THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
      + CASE WHEN COALESCE(CAST(n_punct AS DOUBLE) / NULLIF(n_chars, 0), 0.0) <= 0.2
             THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END, 4)         AS quality
FROM feat
ORDER BY doc_id
"""


@query("doc_quality_scores", _QUALITY_ORACLE)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: deterministic quality score (pre-training corpus filters)."""
    docs = read_table(spark, sf_dir, "documents", fan_out=True)
    feats = quality_features("text")
    return docs.select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        F.round(feats["stopword_ratio"], 4).alias("stopword_ratio"),
        F.round(feats["punct_ratio"], 4).alias("punct_ratio"),
        F.round(quality_score("text"), 4).alias("quality"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# L4: language ID — marker-word argmax, alphabetically-first tie-break.
# ---------------------------------------------------------------------------

_LANG_LISTS = {
    "de": "['der','die','das','und','ist','nicht','ein','zu']",
    "en": "['the','a','of','and','to','in','is','that']",
    "es": "['el','la','los','y','es','una','que','en']",
    "fr": "['le','la','les','et','est','une','que','dans']",
}

_LANG_ORACLE = f"""
WITH scores AS (
  SELECT doc_id, lang,
    len(list_filter({_WORDS}, w -> list_contains({_LANG_LISTS['de']}, w))) AS s_de,
    len(list_filter({_WORDS}, w -> list_contains({_LANG_LISTS['en']}, w))) AS s_en,
    len(list_filter({_WORDS}, w -> list_contains({_LANG_LISTS['es']}, w))) AS s_es,
    len(list_filter({_WORDS}, w -> list_contains({_LANG_LISTS['fr']}, w))) AS s_fr
  FROM documents
)
SELECT doc_id, lang,
  CASE
    WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
    WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
    WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
    WHEN s_es >= s_fr THEN 'es'
    ELSE 'fr'
  END AS predicted_lang
FROM scores
ORDER BY doc_id
"""


@query("doc_lang_id", _LANG_ORACLE)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: n-gram-heuristic language ID. The test corpus's ``lang``
    column is synthetic metadata (text vocabulary is shared across
    labels), so the gate verifies the deterministic classifier, not
    label recovery."""
    docs = read_table(spark, sf_dir, "documents", fan_out=True)
    with_words = docs.withColumn("__words", F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+"))
    return with_words.select(
        "doc_id",
        "lang",
        predict_lang("text", words=F.col("__words")).alias("predicted_lang"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# L1/L4: content fingerprints — order-insensitive bag hash + order-
# sensitive rolling hash.
# ---------------------------------------------------------------------------

_FINGERPRINT_ORACLE = f"""
SELECT doc_id,
  md5(array_to_string(list_sort(list_distinct({_WORDS})), ' ')) AS bag_fp,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(COALESCE(text, ''), ''), ch -> CAST(ascii(ch) AS BIGINT))),
    (a, c) -> (a * 31 + c) % 1000000007) AS rolling_fp
FROM documents
ORDER BY doc_id
"""


@query("doc_fingerprints", _FINGERPRINT_ORACLE)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: document fingerprinting (bag hash for cheap dedup keys,
    polynomial rolling hash for order-sensitive identity)."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        bag_fingerprint("text").alias("bag_fp"),
        rolling_hash("text").alias("rolling_fp"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# L2: MinHash signatures (value-checked), LSH near-dup pairs, SimHash.
# ---------------------------------------------------------------------------

# Mirrors similarity.MINHASH_A/B via the literal constant table
# (r12: per-seed md5-derived coefficients — see similarity.py).
_MINHASH_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct({_SHINGLES})) AS shingle FROM documents
),
hashed AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(shingle), 1, 15)) AS BIGINT) % 1000000007 AS h
  FROM sh
),
seeded AS (
  SELECT doc_id, CAST(s.seed AS INTEGER) AS seed, s.a, s.b, h
  FROM hashed CROSS JOIN (
    SELECT * FROM (VALUES {minhash_consts_sql()}) t(seed, a, b)
  ) s
)
SELECT doc_id, seed,
       MIN((CAST(a AS BIGINT) * h + b) % 1000000007) AS minhash
FROM seeded
GROUP BY doc_id, seed
ORDER BY doc_id, seed
"""


@query("doc_minhash_signatures", _MINHASH_ORACLE)
def doc_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 stage 1: 16-seed MinHash signatures, long format."""
    docs = read_table(spark, sf_dir, "documents")
    return minhash_signatures(docs, "doc_id", "text", num_hashes=16, n=3).orderBy(
        "doc_id", "seed"
    )


# Shared CTE chain: the full LSH near-dup pipeline down to VERIFIED
# (exact Jaccard >= 0.8) pairs — used by doc_neardup_pairs and the
# cross-split leakage audit.
def lsh_verified_pairs_ctes(src: str = "documents") -> str:
    """The LSH near-dup CTE chain (shingle → minhash → band →
    bucket-join → exact-Jaccard ≥ 0.8) as a CTE BODY (no leading
    WITH), parameterized on the source relation so composed pipelines
    (queries/corpus_e2e.py, r9) can run it over an upstream stage
    instead of the raw table. ``src`` must expose (doc_id, text)."""
    return f"""sh AS (
  SELECT doc_id, unnest(list_distinct({_SHINGLES})) AS shingle FROM {src}
),
hashed AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(shingle), 1, 15)) AS BIGINT) % 1000000007 AS h
  FROM sh
),
seeded AS (
  SELECT doc_id, CAST(s.seed AS INTEGER) AS seed, s.a, s.b, h
  FROM hashed CROSS JOIN (
    SELECT * FROM (VALUES {minhash_consts_sql()}) t(seed, a, b)
  ) s
),
sig AS (
  SELECT doc_id, seed,
         MIN((CAST(a AS BIGINT) * h + b) % 1000000007) AS minhash
  FROM seeded GROUP BY doc_id, seed
),
bands AS (
  SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
         string_agg(CAST(minhash AS VARCHAR), '|' ORDER BY seed) AS band_key
  FROM sig GROUP BY doc_id, CAST(seed // 4 AS INTEGER)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
sets AS (SELECT doc_id, list_distinct({_SHINGLES}) AS s FROM {src}),
pairs AS (
  SELECT c.id_a, c.id_b,
         CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
           / len(list_distinct(list_concat(sa.s, sb.s))) AS jaccard
  FROM cand c
  JOIN sets sa ON sa.doc_id = c.id_a
  JOIN sets sb ON sb.doc_id = c.id_b
  WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        / len(list_distinct(list_concat(sa.s, sb.s))) >= 0.8
)"""


_LSH_VERIFIED_PAIRS_CTES = "WITH " + lsh_verified_pairs_ctes()


def _lsh_verified_jaccard(spark: SparkSession, sf_dir: str):
    """(docs, jaccard-of-candidates) — the standalone LSH near-dup
    chain with ONE tokenize pass (r14 optimization, guide §2.3 "don't
    recompute"): the distinct-shingle sets are stage-checkpointed and
    feed BOTH the minhash signature build and the exact-Jaccard verify
    branches, where previously each standalone query tokenized +
    shingled the corpus three times (once in the fused minhash
    explode, once per Jaccard side). Measured on doc_neardup_pairs at
    sf0.1: warm 2.92 s → 1.94 s, identical output (the composed
    corpus_e2e DAG already used this sets= shape, so the equivalence
    was already oracle-pinned there)."""
    docs = read_table(spark, sf_dir, "documents")
    sets = shingle_sets(docs, "doc_id", "text", n=3, materialize=True)
    # r15 (guide §2.4): band keys come straight off the wide minhash
    # aggregate — the long-format unpivot + second (id, band) exchange
    # + sorted collect_list of lsh_band_keys drop out of the plan
    # (keys byte-identical; doc_minhash_signatures still pins the
    # long format through its own oracle)
    bands = minhash_band_keys(
        docs, "doc_id", "text", num_hashes=16, n=3, rows_per_band=4,
        sets=sets,
    )
    cand = lsh_candidate_pairs(bands, "doc_id", materialize_bands=True)
    jac = ngram_jaccard(
        cand, docs, "doc_id", "text", n=3, sets=sets, materialize_pairs=True
    )
    return docs, jac

_NEARDUP_ORACLE = (
    _LSH_VERIFIED_PAIRS_CTES
    + """
SELECT id_a, id_b, ROUND(jaccard, 4) AS jaccard
FROM pairs
ORDER BY id_a, id_b
"""
)


@query("doc_neardup_pairs", _NEARDUP_ORACLE)
def doc_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 full pipeline: shingle → minhash → band → bucket-join →
    exact-Jaccard verify ≥ 0.8. The band join is a hash join — no
    all-pairs comparison anywhere."""
    _docs, jac = _lsh_verified_jaccard(spark, sf_dir)
    return (
        jac.filter(F.col("jaccard") >= 0.8)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


_LEAKAGE_ORACLE = (
    _LSH_VERIFIED_PAIRS_CTES
    + """,
splits AS (
  SELECT doc_id,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
              THEN 'train' ELSE 'test' END AS split
  FROM documents
)
SELECT CASE WHEN a.split = b.split THEN a.split ELSE 'cross' END
         AS boundary,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CAST(FLOOR(p.jaccard * 1e4 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_jaccard_bp
FROM pairs p
JOIN splits a ON a.doc_id = p.id_a
JOIN splits b ON b.doc_id = p.id_b
GROUP BY 1
ORDER BY 1
"""
)


@query("split_leakage_audit", _LEAKAGE_ORACLE)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-contamination guard: do any near-duplicate pairs CROSS the
    train/test boundary? Runs the full verified LSH near-dup pipeline
    (identical to doc_neardup_pairs), classifies every >= 0.8-Jaccard
    pair by the hash-range split of doc_train_test_split, and reports
    per-boundary pair counts — 'cross' rows are test docs whose
    near-twin sits in training data, the leakage a held-out eval must
    not have. Per-pair Jaccards are FLOOR-quantized to integer basis
    points BEFORE the group sum (exact any accumulation order). Same
    scale shape as the near-dup pipeline: banded hash joins, then two
    keyed equi-joins of the (small) verified-pair set against the
    split assignment — AQE broadcasts the pair side; nothing
    all-pairs and no doc-sized broadcast."""
    docs, jac = _lsh_verified_jaccard(spark, sf_dir)
    jac = jac.filter(F.col("jaccard") >= 0.8)
    split_of = docs.select(
        "doc_id",
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "c",
            F.lit("train"),
        )
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    j = jac.join(
        split_of.select(
            F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")
        ),
        "id_a",
    ).join(
        split_of.select(
            F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")
        ),
        "id_b",
    )
    return (
        j.groupBy(
            F.when(F.col("split_a") == F.col("split_b"), F.col("split_a"))
            .otherwise(F.lit("cross"))
            .alias("boundary")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                F.floor(F.col("jaccard") * 1e4 + F.lit(0.5)).cast("long")
            ).alias("sum_jaccard_bp"),
        )
        .orderBy("boundary")
    )


_SIMHASH_ORACLE = """
WITH words AS (
  SELECT doc_id, unnest(list_distinct(string_split_regex(lower(COALESCE(text, '')), '\\s+'))) AS word
  FROM documents
),
hashed AS (
  SELECT doc_id, CAST(concat('0x', substr(md5(word), 1, 8)) AS BIGINT) AS h FROM words
),
bits AS (
  SELECT doc_id, h, CAST(unnest(range(0, 32)) AS INTEGER) AS b FROM hashed
),
per_bit AS (
  SELECT doc_id, b,
         CAST(SUM((CAST(floor(h / pow(2.0, b)) AS BIGINT) % 2) * 2 - 1) AS BIGINT) AS s
  FROM bits GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN CAST(pow(2.0, b) AS BIGINT) ELSE 0 END) AS BIGINT)
         AS simhash
FROM per_bit GROUP BY doc_id ORDER BY doc_id
"""


@query("doc_simhash", _SIMHASH_ORACLE)
def doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: 32-bit SimHash fingerprints."""
    docs = read_table(spark, sf_dir, "documents")
    return simhash_32(docs, "doc_id", "text").orderBy("doc_id")


_SIMHASH_CTE = """
WITH words AS (
  SELECT doc_id, unnest(list_distinct(string_split_regex(lower(COALESCE(text, '')), '\\s+'))) AS word
  FROM documents
),
hashed AS (
  SELECT doc_id, CAST(concat('0x', substr(md5(word), 1, 8)) AS BIGINT) AS h FROM words
),
bits AS (
  SELECT doc_id, h, CAST(unnest(range(0, 32)) AS INTEGER) AS b FROM hashed
),
per_bit AS (
  SELECT doc_id, b,
         CAST(SUM((CAST(floor(h / pow(2.0, b)) AS BIGINT) % 2) * 2 - 1) AS BIGINT) AS s
  FROM bits GROUP BY doc_id, b
),
sim AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN CAST(pow(2.0, b) AS BIGINT) ELSE 0 END) AS BIGINT)
           AS simhash
  FROM per_bit GROUP BY doc_id
)
"""

_SIMHASH_NEARDUP_ORACLE = (
    _SIMHASH_CTE
    + """,
halves AS (
  SELECT doc_id, simhash, i AS half_idx,
         (simhash >> (16 * i)) & 65535 AS half_val
  FROM sim CROSS JOIN (SELECT CAST(unnest(range(0, 2)) AS INTEGER) AS i)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, a.simhash AS sh_a, b.doc_id AS id_b, b.simhash AS sh_b
  FROM halves a JOIN halves b
    ON a.half_idx = b.half_idx AND a.half_val = b.half_val AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(sh_a, sh_b)) <= 1
ORDER BY id_a, id_b
"""
)


@query("doc_simhash_neardup", _SIMHASH_NEARDUP_ORACLE)
def doc_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: SimHash near-dup pairs (hamming ≤ 1) via QUERY-EXPANSION
    banding.

    r10 scale fix (found by the shuffle-VOLUME record at 16×,
    SCALING_r10; the third rung of this query's banding ladder):
    half-banding pigeonholes hamming≤1 into 2×16-bit buckets, but any
    FIXED bucket space saturates — measured by-bucket candidate pairs
    on vocabulary-remapped scaled corpora grow superlinearly once
    |docs| approaches the 65 536 bucket values (3.1M/2.5M at 4×,
    28M at 16×: unrelated dense clusters start colliding). Query
    expansion removes the bucket space entirely: each doc emits its
    fingerprint plus all 32 single-bit flips (33 probes), and a pair
    with hamming≤1 matches EXACTLY ONCE as probe(a) == fingerprint(b)
    with id_a < id_b — an exact 32-bit equi-join whose left volume is
    a constant 33 rows/doc (linear at every corpus size) and whose
    output IS the answer (no over-generated candidates, no distinct).
    The hamming column is recomputed for the output contract; the
    filter is a no-op by construction. SHUFFLE_HASH pins the physical
    strategy so the plan is identical at every scale. The oracle keeps
    the half-banding formulation — two independent derivations of the
    same relation.
    """
    docs = read_table(spark, sf_dir, "documents")
    # both join branches read the signatures; checkpoint the tiny
    # (doc_id, simhash) frame so the tokenize+hash pipeline runs once,
    # not once per branch
    sim = stage_checkpoint(simhash_32(docs, "doc_id", "text"))
    probes = F.array(
        F.col("simhash"),
        *[
            F.col("simhash").bitwiseXOR(F.lit(1 << b).cast("long"))
            for b in range(32)
        ],
    )
    a = sim.select(
        F.col("doc_id").alias("id_a"),
        F.col("simhash").alias("sh_a"),
        F.explode(probes).alias("probe"),
    )
    b = sim.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b")
    )
    cand = a.join(
        b.hint("shuffle_hash"),
        (a["probe"] == b["sh_b"]) & (a["id_a"] < b["id_b"]),
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.select("id_a", "id_b", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= 1)
        .orderBy("id_a", "id_b")
    )


_NEARDUP_DEDUP_ORACLE = (
    _LSH_VERIFIED_PAIRS_CTES
    + """
SELECT d.doc_id FROM documents d
WHERE d.doc_id NOT IN (SELECT id_b FROM pairs)
ORDER BY d.doc_id
"""
)


@query("doc_neardup_dedup_survivors", _NEARDUP_DEDUP_ORACLE)
def doc_neardup_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 end state: actually DROP near-duplicates — keep the lower
    doc_id of every confirmed pair (the lowest-id-wins rule over the
    near-dup relation; a full connected-components pass is the
    iterative extension)."""
    docs, jac = _lsh_verified_jaccard(spark, sf_dir)
    losers = jac.filter(F.col("jaccard") >= 0.8).select(
        F.col("id_b").alias("doc_id")
    )
    # r14 (guide §3.1): broadcast the id-only loser list — the anti-
    # join was a SortMergeJoin shuffling both sides; map-side anti
    # drops two exchanges (bloom prefilter is the >broadcast-cap form)
    return (
        docs.join(F.broadcast(losers), "doc_id", "left_anti")
        .select("doc_id")
        .orderBy("doc_id")
    )


_NGRAM_JACCARD_ORACLE = f"""
WITH sets AS (SELECT doc_id, list_distinct({_SHINGLES}) AS s FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(CASE WHEN len(list_distinct(list_concat(a.s, b.s))) > 0
             THEN CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                  / len(list_distinct(list_concat(a.s, b.s))) END, 4) AS jaccard
FROM sets a JOIN sets b ON b.doc_id = a.doc_id + 1
ORDER BY id_a
"""


@query("doc_ngram_jaccard", _NGRAM_JACCARD_ORACLE)
def doc_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: exact word-3-gram Jaccard as a standalone operator, over
    the deterministic adjacent-id pair set (the same primitive that
    verifies LSH candidates in ``doc_neardup_pairs``)."""
    docs = read_table(spark, sf_dir, "documents")
    ids = docs.select("doc_id")
    pairs = ids.select(F.col("doc_id").alias("id_a")).join(
        ids.select(F.col("doc_id").alias("id_b")),
        F.col("id_b") == F.col("id_a") + 1,
    )
    # r14: one tokenize pass — the two Jaccard set lookups read a
    # checkpointed shingle-set frame instead of each re-tokenizing
    sets = shingle_sets(docs, "doc_id", "text", n=3, materialize=True)
    jac = ngram_jaccard(pairs, docs, "doc_id", "text", n=3, sets=sets)
    return jac.select(
        "id_a", "id_b", F.round("jaccard", 4).alias("jaccard")
    ).orderBy("id_a")


# unit-normalize once so each candidate pair costs exactly ONE fold;
# probe side scoped to a query batch (vec_id < 200) — the full-corpus
# near-dup sweep is the IVF-pruned path's job.
_COMPONENTS_ORACLE = (
    _LSH_VERIFIED_PAIRS_CTES.replace("WITH sh AS", "WITH RECURSIVE sh AS")
    + """,
edges AS (
  SELECT id_a AS node, id_b AS nbr FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(node, comp) AS (
  SELECT node, node FROM (SELECT DISTINCT node FROM edges)
  UNION
  SELECT e.node, r.comp FROM edges e JOIN reach r ON e.nbr = r.node
)
SELECT node AS doc_id, MIN(comp) AS component
FROM reach GROUP BY node ORDER BY doc_id
"""
)


@query("doc_neardup_components", _COMPONENTS_ORACLE)
def doc_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: full connected-components clustering of the near-dup graph
    (iterative min-label propagation on Spark; transitive-closure
    recursive CTE in the oracle). The proper keep-one rule: one
    survivor per component, not per pair."""
    from calorista_spark.operators.graph import connected_components

    _docs, jac = _lsh_verified_jaccard(spark, sf_dir)
    edges = jac.filter(F.col("jaccard") >= 0.8).select("id_a", "id_b")
    comps = connected_components(edges)
    return comps.select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component")
    ).orderBy("doc_id")


_COSINE_NEARDUP_ORACLE = f"""
WITH units AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(x AS DOUBLE)
                / sqrt({_DOT.format(a='embedding', b='embedding')})) AS unit
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, ROUND(sim, 6) AS sim
FROM units a JOIN units b ON a.vec_id < b.vec_id AND a.vec_id < 200,
     LATERAL (SELECT {_DOT.format(a='a.unit', b='b.unit')} AS sim) s
WHERE sim >= 0.4
ORDER BY id_a, id_b
"""


@query("embedding_cosine_neardup", _COSINE_NEARDUP_ORACLE)
def embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2/L3: embedding-cosine near-dup pairs (sim ≥ τ) for a probe
    batch. Unit vectors are materialized once so each pair is a single
    left-fold dot product; the IVF bucketing above is the
    candidate-pruning path for full-corpus sweeps."""
    from calorista_spark.functions.vectors import dot

    emb = with_norm(read_table(spark, sf_dir, "embeddings", fan_out=True))
    units = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x.cast("double") / F.col("norm")
        ).alias("unit"),
    )
    a = units.filter(F.col("vec_id") < 200).select(
        F.col("vec_id").alias("id_a"), F.col("unit").alias("u_a")
    )
    b = units.select(F.col("vec_id").alias("id_b"), F.col("unit").alias("u_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("sim_raw", dot("u_a", "u_b"))
        .filter(F.col("sim_raw") >= 0.4)
        .select("id_a", "id_b", F.round("sim_raw", 6).alias("sim"))
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# L3: similarity search — brute-force exact and IVF approximate.
# ---------------------------------------------------------------------------

_TOPK_BRUTE_ORACLE = f"""
WITH norms AS (
  SELECT vec_id, embedding,
         sqrt({_DOT.format(a='embedding', b='embedding')}) AS norm
  FROM embeddings
),
q AS (SELECT vec_id AS q_id, embedding AS q_vec, norm AS q_norm FROM norms WHERE vec_id < 5),
scored AS (
  SELECT q.q_id, c.vec_id AS cand_id,
         ROUND({_DOT.format(a='q.q_vec', b='c.embedding')} / (q.q_norm * c.norm), 6) AS sim
  FROM q CROSS JOIN norms c
  WHERE c.vec_id <> q.q_id
),
ranked AS (
  SELECT q_id, cand_id, sim,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, cand_id) AS INTEGER) AS rank
  FROM scored
)
SELECT q_id, cand_id, sim, rank FROM ranked WHERE rank <= 5
ORDER BY q_id, rank
"""


@query("embedding_topk_bruteforce", _TOPK_BRUTE_ORACLE)
def embedding_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 exact baseline: crossJoin + cosine + per-query window.
    Dot products are sequential left folds — bit-identical across
    engines (verified), so even pre-round sims agree."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    return cosine_topk_bruteforce(queries_df, emb, k=5).orderBy("q_id", "rank")


_TOPK_IVF_ORACLE_TMPL = f"""
WITH norms AS (
  SELECT vec_id, label, embedding,
         sqrt({_DOT.format(a='embedding', b='embedding')}) AS norm
  FROM embeddings
),
q AS (SELECT vec_id AS q_id, embedding AS q_vec, norm AS q_norm FROM norms WHERE vec_id < 5),
dims AS (
  SELECT label, CAST(unnest(range(1, 65)) AS INTEGER) AS dim, unnest(embedding) AS val
  FROM embeddings
),
cent_long AS (
  SELECT label, dim, ROUND(AVG(CAST(val AS DOUBLE)), 6) AS cval
  FROM dims GROUP BY label, dim
),
cents AS (
  SELECT label, list(cval ORDER BY dim) AS centroid FROM cent_long GROUP BY label
),
cents_n AS (
  SELECT label, centroid, sqrt({_DOT.format(a='centroid', b='centroid')}) AS c_norm
  FROM cents
),
assigned AS (
  SELECT q_id, label AS probe_bucket, q_vec, q_norm FROM (
    SELECT q.q_id, c.label, q.q_vec, q.q_norm,
           row_number() OVER (
             PARTITION BY q.q_id
             ORDER BY ROUND({_DOT.format(a='q.q_vec', b='c.centroid')} / (q.q_norm * c.c_norm), 6) DESC,
                      c.label) AS rn
    FROM q CROSS JOIN cents_n c
  ) WHERE rn <= {{nprobe}}
),
scored AS (
  SELECT a.q_id, a.probe_bucket, e.vec_id AS cand_id,
         ROUND({_DOT.format(a='a.q_vec', b='e.embedding')} / (a.q_norm * e.norm), 6) AS sim
  FROM assigned a JOIN norms e ON e.label = a.probe_bucket AND e.vec_id <> a.q_id
),
ranked AS (
  SELECT q_id, probe_bucket, cand_id, sim,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, cand_id) AS INTEGER) AS rank
  FROM scored
)
SELECT q_id, probe_bucket, cand_id, sim, rank FROM ranked WHERE rank <= 5
ORDER BY q_id, rank
"""


_TOPK_IVF_ORACLE = _TOPK_IVF_ORACLE_TMPL.format(nprobe=1)


@query("embedding_topk_ivf", _TOPK_IVF_ORACLE)
def embedding_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 scale path: IVF with label buckets as the coarse quantizer
    (nprobe=1). Candidate set shrinks |C| → |C|/|buckets|; bucket
    lookup is a hash join, not a crossJoin."""
    emb = read_table(spark, sf_dir, "embeddings")
    return cosine_topk_ivf(emb, F.col("vec_id") < 5, bucket_col="label", k=5).select(
        "q_id",
        F.col("probe_bucket"),
        "cand_id",
        "sim",
        "rank",
    ).orderBy("q_id", "rank")


_LABEL_STATS_ORACLE = f"""
SELECT label,
       COUNT(*) AS n_vectors,
       MIN(len(embedding)) AS dim,
       ROUND(AVG(sqrt({_DOT.format(a='embedding', b='embedding')})), 4) AS avg_norm
FROM embeddings
GROUP BY label
ORDER BY label
"""


@query("embedding_label_stats", _LABEL_STATS_ORACLE)
def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: vector-column profiling (the multimodal schema's typed
    metadata story: array<float> + scalar stats in one pass)."""
    emb = with_norm(read_table(spark, sf_dir, "embeddings"))
    return (
        emb.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min(F.size("embedding")).cast("long").alias("dim"),
            F.round(F.avg("norm"), 4).alias("avg_norm"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# L3: self-evaluation of the approximate index — recall@5 of IVF
# against the exact brute-force top-k, per query and oracle-checked.
# ---------------------------------------------------------------------------

_IVF_RECALL_ORACLE = f"""
WITH brute AS (SELECT q_id, cand_id FROM ({_TOPK_BRUTE_ORACLE})),
ivf AS (SELECT q_id, cand_id FROM ({_TOPK_IVF_ORACLE})),
hits AS (
  SELECT b.q_id, COUNT(*) AS n_hits
  FROM ivf i JOIN brute b ON i.q_id = b.q_id AND i.cand_id = b.cand_id
  GROUP BY b.q_id
)
SELECT q.q_id,
       CAST(COALESCE(h.n_hits, 0) AS INTEGER) AS n_hits,
       ROUND(COALESCE(h.n_hits, 0) / 5.0, 4) AS recall_at_5
FROM (SELECT DISTINCT q_id FROM brute) q
LEFT JOIN hits h ON q.q_id = h.q_id
ORDER BY q.q_id
"""


@query("embedding_ivf_recall", _IVF_RECALL_ORACLE)
def embedding_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF (nprobe=1) index vs the exact baseline —
    the approximation-quality measurement an ANN deployment monitors.
    Both top-k frames are per-query-tiny, so the semi-join + count is
    negligible next to producing them; at scale the brute side runs on
    a sampled probe set only."""
    brute = embedding_topk_bruteforce(spark, sf_dir).select("q_id", "cand_id")
    ivf = embedding_topk_ivf(spark, sf_dir).select("q_id", "cand_id")
    hits = (
        ivf.join(brute, ["q_id", "cand_id"], "left_semi")
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        brute.select("q_id")
        .distinct()
        .join(hits, "q_id", "left")
        .select(
            "q_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("int").alias("n_hits"),
            F.round(F.coalesce(F.col("n_hits"), F.lit(0)) / 5.0, 4).alias(
                "recall_at_5"
            ),
        )
        .orderBy("q_id")
    )


_TOPK_IVF_P3_ORACLE = _TOPK_IVF_ORACLE_TMPL.format(nprobe=3)


@query("embedding_topk_ivf_probe3", _TOPK_IVF_P3_ORACLE)
def embedding_topk_ivf_probe3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 scale path, multi-probe: the query visits its 3 nearest
    centroid buckets — 3× the candidates of nprobe=1, still a hash
    join on the bucket key (vs |C| for brute force). The knob an ANN
    deployment turns when ``embedding_ivf_recall`` reads too low."""
    emb = read_table(spark, sf_dir, "embeddings")
    return (
        cosine_topk_ivf(
            emb, F.col("vec_id") < 5, bucket_col="label", k=5, nprobe=3
        )
        .select("q_id", "probe_bucket", "cand_id", "sim", "rank")
        .orderBy("q_id", "rank")
    )
