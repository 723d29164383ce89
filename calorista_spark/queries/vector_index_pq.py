"""Fused IVF×PQ (ADC) index queries — the 100 TB ANN read path (r14,
VERDICT r13 #1) plus the label-free k-means bootstrap (#2).

``embedding_ann_pq_topk`` drives :class:`IVFPQIndex` end to end:
coarse quantizer trained per-label over the bootstrap slice, PQ
codebook = the frozen ``vector_pq`` constant (shipped pre-trained,
like a production index), holdout slice ingested incrementally under
the replay ledger, then the query scans ONLY the probed buckets' PQ
CODES (integer ADC against per-query lookup tables), shortlists
top-``_RERANK`` and reranks just those rows against raw vectors by
rounded cosine. The DuckDB oracle recomputes every stage — centroids,
nearest-bucket assignment, per-vector codes from the literal codebook,
per-query LUTs (the query row's own distance arrays ARE the ADC
tables), integer ADC, shortlist, rerank — so training + ingest +
both quantizers + the fused read path all sit inside the driver's
hash gate. Oracle-checkable ANN is possible here because every
distance that crosses an argmin or a rank is quantized to integer
micro-units first (the operators/pq.py convention).

``embedding_ann_kmeans_recall`` is the label-free path: k-means
(deterministic seeded Lloyd's, sample-bounded — operators/pq.py's
trainer with m=1) is iterative and oracle-infeasible, so the query is
rows-only with a quantified band (calorista_spark/approx_bands.py):
probing ALL buckets must reproduce the brute-force anchor exactly
(recall 1.0 — any wiring bug in assignment, similarity, or pruning
breaks it), while the nprobe=2 recall column reports the honest
approximation quality.

Both sides exclude null and element-null embeddings explicitly (PQ
codes are undefined for them; the raw index still carries them for
exact paths)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.queries.llm import _DOT, _TOPK_BRUTE_ORACLE
from calorista_spark.queries.registry import query
from calorista_spark.queries.vector_index import _emb_fingerprint
from calorista_spark.queries.vector_pq import PQ_CODEBOOK, _CB, _DUCK_D, _NAMES

_HOLDOUT = "vec_id % 10 = 7"
_NPROBE = 2
_K = 5
# 16×k refine factor: on THIS corpus (isotropic — the worst case for
# PQ, see vector_pq's honesty note) the measured shortlist needed to
# match the raw-IVF path's recall@5 is 80 at sf0.1 (50 → 10/11 hits,
# 80 → 11/11); clustered real embeddings need far less. Pinned by
# tests/test_ann_index.py::test_adc_recall_not_below_raw_ivf.
_RERANK = 80
_KM_NLIST = 8

_NONULL_DUCK = (
    "embedding IS NOT NULL "
    "AND len(list_filter(embedding, x -> x IS NULL)) = 0"
)
_NONULL_SPARK = (
    "embedding IS NOT NULL AND NOT exists(embedding, x -> x IS NULL)"
)

_PQIDX_CACHE: dict[tuple, str] = {}
_KMIDX_CACHE: dict[tuple, str] = {}


def _built_ivfpq_index(spark: SparkSession, sf_dir: str):
    """Shared fixture, the vector_index pattern: bootstrap over the
    non-holdout corpus (coarse quantizer per-label; PQ codebook = the
    frozen constant), upsert the holdout slice incrementally under
    batch_id=1, REPLAY it (ledger must skip — guarded here, so the
    correctness gate pins exactly-once ingest of BOTH halves)."""
    from calorista_spark.operators.ann_index import IVFPQIndex

    fp = _emb_fingerprint(sf_dir)
    key = (sf_dir, fp)
    path = _PQIDX_CACHE.get(key)
    if path is not None and os.path.isfile(
        os.path.join(path, "pq_codes", "_commits", "v00000002.json")
    ):
        return IVFPQIndex(path)
    path = os.path.join(
        tempfile.gettempdir(), f"calorista_ivfpq_{fp}_{os.getpid()}"
    )
    shutil.rmtree(path, ignore_errors=True)
    idx = IVFPQIndex(path)
    emb = read_table(spark, sf_dir, "embeddings").where(_NONULL_SPARK)
    idx.bootstrap(
        spark, emb.filter(f"NOT ({_HOLDOUT})"), codebook=_CB
    )
    holdout = emb.filter(_HOLDOUT)
    idx.upsert(spark, holdout, batch_id=1)
    va = idx.assignments_store.latest_version()
    vc = idx.pq_codes_store.latest_version()
    idx.upsert(spark, holdout, batch_id=1)  # replay: exactly-once
    if (
        idx.assignments_store.latest_version() != va
        or idx.pq_codes_store.latest_version() != vc
    ):
        raise RuntimeError(
            "replayed IVFPQ upsert produced a new version — ledger broken"
        )
    _PQIDX_CACHE[key] = path
    return IVFPQIndex(path)


# Oracle assembly. The per-subvector distance arrays (_DUCK_D, from
# the literal codebook) serve TWO roles: on candidate rows their
# argmin positions ARE the PQ codes; on query rows the arrays ARE the
# ADC lookup tables (||q_j - c||² for every centroid). So
# ADC(q, cand) = Σ_j qd_j[ position_of_min(cd_j) ] — pure integer
# arithmetic, engine-identical.
_QNAMES = [f"q{n}" for n in _NAMES]
_ADC_DUCK = "CAST(" + " + ".join(
    f"p.{qn}[list_position(c.{dn}, list_min(c.{dn}))]"
    for qn, dn in zip(_QNAMES, _NAMES)
) + " AS BIGINT)"

_ANN_PQ_TOPK_ORACLE = f"""
WITH live AS (
  SELECT vec_id, label, embedding FROM embeddings
  WHERE {_NONULL_DUCK}
),
norms AS (
  SELECT vec_id, embedding,
         sqrt({_DOT.format(a='embedding', b='embedding')}) AS norm
  FROM live
),
dims AS (
  SELECT label, CAST(unnest(range(1, 65)) AS INTEGER) AS dim,
         unnest(embedding) AS val
  FROM live WHERE NOT ({_HOLDOUT})
),
cent_long AS (
  SELECT label, dim, ROUND(AVG(CAST(val AS DOUBLE)), 6) AS cval
  FROM dims GROUP BY label, dim
),
cents AS (
  SELECT label AS bucket, list(cval ORDER BY dim) AS centroid
  FROM cent_long GROUP BY label
),
cents_n AS (
  SELECT bucket, centroid,
         sqrt({_DOT.format(a='centroid', b='centroid')}) AS c_norm
  FROM cents
),
assigned AS (
  SELECT vec_id, bucket, embedding, norm FROM (
    SELECT e.vec_id, c.bucket, e.embedding, e.norm,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY ROUND({_DOT.format(a='e.embedding', b='c.centroid')}
                            / (e.norm * c.c_norm), 6) DESC,
                      c.bucket) AS rn
    FROM norms e CROSS JOIN cents_n c
  ) WHERE rn = 1
),
cd AS (
  SELECT vec_id,
         {", ".join(f"{e} AS {n}" for n, e in zip(_NAMES, _DUCK_D))}
  FROM live
),
qn AS (
  SELECT vec_id AS q_id, embedding AS q_vec, norm AS q_norm
  FROM norms WHERE vec_id < 5
),
qd AS (
  SELECT vec_id AS q_id,
         {", ".join(f"{e} AS {qn}" for qn, e in zip(_QNAMES, _DUCK_D))}
  FROM live WHERE vec_id < 5
),
probes AS (
  SELECT q_id, bucket AS probe_bucket, q_vec, q_norm FROM (
    SELECT q.q_id, c.bucket, q.q_vec, q.q_norm,
           row_number() OVER (
             PARTITION BY q.q_id
             ORDER BY ROUND({_DOT.format(a='q.q_vec', b='c.centroid')}
                            / (q.q_norm * c.c_norm), 6) DESC,
                      c.bucket) AS rn
    FROM qn q CROSS JOIN cents_n c
  ) WHERE rn <= {_NPROBE}
),
adc AS (
  SELECT pr.q_id, pr.q_vec, pr.q_norm, a.vec_id AS cand_id,
         {_ADC_DUCK} AS adc_dist_q
  FROM probes pr
  JOIN assigned a ON a.bucket = pr.probe_bucket AND a.vec_id <> pr.q_id
  JOIN cd c ON c.vec_id = a.vec_id
  JOIN qd p ON p.q_id = pr.q_id
),
shortlist AS (
  SELECT q_id, q_vec, q_norm, cand_id, adc_dist_q FROM (
    SELECT *, row_number() OVER (
      PARTITION BY q_id ORDER BY adc_dist_q, cand_id) AS sr
    FROM adc
  ) WHERE sr <= {_RERANK}
),
reranked AS (
  SELECT s.q_id, s.cand_id, s.adc_dist_q,
         ROUND({_DOT.format(a='s.q_vec', b='n.embedding')}
               / (s.q_norm * n.norm), 6) AS sim
  FROM shortlist s JOIN norms n ON n.vec_id = s.cand_id
),
final AS (
  SELECT q_id, cand_id, adc_dist_q, sim,
         CAST(row_number() OVER (
           PARTITION BY q_id ORDER BY sim DESC, cand_id
         ) AS INTEGER) AS rank
  FROM reranked
)
SELECT q_id, cand_id, adc_dist_q, sim, rank
FROM final WHERE rank <= {_K}
ORDER BY q_id, rank
"""


@query("embedding_ann_pq_topk", _ANN_PQ_TOPK_ORACLE)
def embedding_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused IVFADC top-k from the PERSISTED index: the corpus-scale
    pass scans the probed buckets' PQ codes (4–16 B per candidate —
    the bytes-scanned payoff over ``embedding_ann_index_topk``'s raw
    probe), integer ADC against per-query LUTs, top-{_RERANK}
    shortlist, exact cosine rerank of the shortlist only. The oracle
    recomputes the entire fused semantics, so both quantizers, the
    incremental ingest, and the two-stage read path are all inside
    the hash gate."""
    idx = _built_ivfpq_index(spark, sf_dir)
    emb = read_table(spark, sf_dir, "embeddings").where(_NONULL_SPARK)
    return idx.topk_adc(
        spark,
        emb.filter(F.col("vec_id") < 5),
        k=_K,
        nprobe=_NPROBE,
        rerank=_RERANK,
    ).orderBy("q_id", "rank")


_ANN_PQ_RECALL_ORACLE = f"""
WITH brute AS (SELECT q_id, cand_id FROM ({_TOPK_BRUTE_ORACLE})),
ann AS (SELECT q_id, cand_id FROM ({_ANN_PQ_TOPK_ORACLE})),
hits AS (
  SELECT b.q_id, COUNT(*) AS n_hits
  FROM ann a JOIN brute b ON a.q_id = b.q_id AND a.cand_id = b.cand_id
  GROUP BY b.q_id
)
SELECT q.q_id,
       CAST(COALESCE(h.n_hits, 0) AS INTEGER) AS n_hits,
       ROUND(COALESCE(h.n_hits, 0) / 5.0, 4) AS recall_at_5
FROM (SELECT DISTINCT q_id FROM brute) q
LEFT JOIN hits h ON q.q_id = h.q_id
ORDER BY q.q_id
"""


@query("embedding_ann_pq_recall", _ANN_PQ_RECALL_ORACLE)
def embedding_ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the fused ADC path against the exact brute-force
    anchor — same shape as ``embedding_ann_index_recall`` so the two
    are directly comparable; tests/test_ann_index_queries pins
    ADC-path recall >= the raw-IVF path's (the rerank stage must not
    lose what the probe found)."""
    from calorista_spark.queries.llm import embedding_topk_bruteforce

    brute = embedding_topk_bruteforce(spark, sf_dir).select(
        "q_id", "cand_id"
    )
    ann = embedding_ann_pq_topk(spark, sf_dir).select("q_id", "cand_id")
    hits = (
        ann.join(brute, ["q_id", "cand_id"], "left_semi")
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        brute.select("q_id")
        .distinct()
        .join(hits, "q_id", "left")
        .select(
            "q_id",
            F.coalesce(F.col("n_hits"), F.lit(0))
            .cast("int")
            .alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / 5.0, 4
            ).alias("recall_at_5"),
        )
        .orderBy("q_id")
    )


def _built_kmeans_index(spark: SparkSession, sf_dir: str):
    """Label-free fixture: k-means bootstrap over the non-holdout
    corpus (no label column in sight), holdout upserted incrementally
    + replayed (ledger guard)."""
    from calorista_spark.operators.ann_index import IVFVectorIndex

    fp = _emb_fingerprint(sf_dir)
    key = (sf_dir, fp)
    path = _KMIDX_CACHE.get(key)
    if path is not None and os.path.isfile(
        os.path.join(path, "assignments", "_commits", "v00000002.json")
    ):
        return IVFVectorIndex(path)
    path = os.path.join(
        tempfile.gettempdir(), f"calorista_kmidx_{fp}_{os.getpid()}"
    )
    shutil.rmtree(path, ignore_errors=True)
    idx = IVFVectorIndex(path)
    emb = (
        read_table(spark, sf_dir, "embeddings")
        .where(_NONULL_SPARK)
        .select("vec_id", "embedding")  # NO label: the point of #2
    )
    idx.bootstrap_kmeans(
        spark, emb.filter(f"NOT ({_HOLDOUT})"), nlist=_KM_NLIST
    )
    holdout = emb.filter(_HOLDOUT)
    idx.upsert(spark, holdout, batch_id=1)
    v = idx.assignments_store.latest_version()
    idx.upsert(spark, holdout, batch_id=1)  # replay: exactly-once
    if idx.assignments_store.latest_version() != v:
        raise RuntimeError(
            "replayed kmeans-index upsert produced a new version"
        )
    _KMIDX_CACHE[key] = path
    return IVFVectorIndex(path)


@query("embedding_ann_kmeans_recall")  # rows-only: k-means is iterative
def embedding_ann_kmeans_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Self-evaluating recall of the LABEL-FREE k-means index (VERDICT
    r13 #2): per query, recall@5 vs the brute anchor at nprobe=2 (the
    honest approximation) AND at nprobe=nlist (full probe — must be
    EXACTLY 1.0: scanning every partition is brute force, so anything
    below 1.0 is a wiring bug, not an approximation). The full-probe
    column is the band's 0-tolerance metric
    (calorista_spark/approx_bands.py)."""
    from calorista_spark.queries.llm import embedding_topk_bruteforce

    idx = _built_kmeans_index(spark, sf_dir)
    emb = read_table(spark, sf_dir, "embeddings").where(_NONULL_SPARK)
    q = emb.filter(F.col("vec_id") < 5)
    brute = embedding_topk_bruteforce(spark, sf_dir).select(
        "q_id", "cand_id"
    )

    def _recall(nprobe: int, hits_col: str, rec_col: str) -> DataFrame:
        ann = idx.topk(spark, q, k=_K, nprobe=nprobe).select(
            "q_id", "cand_id"
        )
        return (
            ann.join(brute, ["q_id", "cand_id"], "left_semi")
            .groupBy("q_id")
            .agg(F.count(F.lit(1)).cast("int").alias(hits_col))
            .withColumn(
                rec_col, F.round(F.col(hits_col) / float(_K), 4)
            )
        )

    probe2 = _recall(_NPROBE, "n_hits_probe2", "recall_probe2")
    full = _recall(_KM_NLIST, "n_hits_full", "recall_full")
    return (
        brute.select("q_id")
        .distinct()
        .join(probe2, "q_id", "left")
        .join(full, "q_id", "left")
        .select(
            "q_id",
            F.coalesce("n_hits_probe2", F.lit(0)).alias("n_hits_probe2"),
            F.coalesce("recall_probe2", F.lit(0.0)).alias("recall_probe2"),
            F.coalesce("n_hits_full", F.lit(0)).alias("n_hits_full"),
            F.coalesce("recall_full", F.lit(0.0)).alias("recall_full"),
        )
        .orderBy("q_id")
    )


# ---------------------------------------------------------------------------
# SDC (symmetric distance) — the code-to-code half of the PQ family
# (Jégou et al. §III.A). ADC keeps the query raw; SDC quantizes BOTH
# sides, which is what an all-corpus neighbor join uses at 100 TB:
# the bucket-bounded self-join below touches ONLY the pq_codes store
# (integer table lookups), never a raw vector. The k×k-per-subspace
# lookup tables are codebook-derived LITERALS rendered identically
# into both engines, so — unlike ADC — there is no per-query float
# path anywhere.
# ---------------------------------------------------------------------------

from calorista_spark.operators.pq import sdc_tables as _sdc_tables  # noqa: E402

_SDC = _sdc_tables(_CB)


# Spark side: Arrow-batched numpy gather (operators/pq.py
# sdc_dist_udf) — the literal-array expression form measured 0 WSCG
# spans (4096 literals blow janino) and ~4 s interpreted per 400k
# pairs; the numpy path is the same measured decision as
# pq_assign_udf. Integer-only, so it cannot diverge from the SQL
# renderer the oracle uses.
from calorista_spark.operators.pq import sdc_dist_udf as _sdc_dist_udf  # noqa: E402

_SDC_UDF = _sdc_dist_udf(_SDC)


def _sdc_expr_duck() -> str:
    parts = []
    for j, tab in enumerate(_SDC):
        lit = (
            "list_value("
            + ", ".join(
                "list_value(" + ", ".join(str(v) for v in row) + ")"
                for row in tab
            )
            + ")"
        )
        dn = _NAMES[j]
        parts.append(
            f"({lit}[list_position(a.{dn}, list_min(a.{dn}))])"
            f"[list_position(b.{dn}, list_min(b.{dn}))]"
        )
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


_SDC_TOP1_ORACLE = f"""
WITH live AS (
  SELECT vec_id, label, embedding FROM embeddings
  WHERE {_NONULL_DUCK}
),
norms AS (
  SELECT vec_id, embedding,
         sqrt({_DOT.format(a='embedding', b='embedding')}) AS norm
  FROM live
),
dims AS (
  SELECT label, CAST(unnest(range(1, 65)) AS INTEGER) AS dim,
         unnest(embedding) AS val
  FROM live WHERE NOT ({_HOLDOUT})
),
cent_long AS (
  SELECT label, dim, ROUND(AVG(CAST(val AS DOUBLE)), 6) AS cval
  FROM dims GROUP BY label, dim
),
cents AS (
  SELECT label AS bucket, list(cval ORDER BY dim) AS centroid
  FROM cent_long GROUP BY label
),
cents_n AS (
  SELECT bucket, centroid,
         sqrt({_DOT.format(a='centroid', b='centroid')}) AS c_norm
  FROM cents
),
assigned AS (
  SELECT vec_id, bucket FROM (
    SELECT e.vec_id, c.bucket,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY ROUND({_DOT.format(a='e.embedding', b='c.centroid')}
                            / (e.norm * c.c_norm), 6) DESC,
                      c.bucket) AS rn
    FROM norms e CROSS JOIN cents_n c
  ) WHERE rn = 1
),
cd AS (
  SELECT vec_id,
         {", ".join(f"{e} AS {n}" for n, e in zip(_NAMES, _DUCK_D))}
  FROM live
),
pairs AS (
  SELECT aa.vec_id, bb.vec_id AS neighbor_id,
         {_sdc_expr_duck()} AS sdc_dist_q
  FROM assigned aa
  JOIN assigned bb ON aa.bucket = bb.bucket
                  AND aa.vec_id <> bb.vec_id
  JOIN cd a ON a.vec_id = aa.vec_id
  JOIN cd b ON b.vec_id = bb.vec_id
),
top1 AS (
  SELECT vec_id, neighbor_id, sdc_dist_q,
         row_number() OVER (
           PARTITION BY vec_id ORDER BY sdc_dist_q, neighbor_id
         ) AS rn
  FROM pairs
)
SELECT vec_id, neighbor_id, sdc_dist_q
FROM top1 WHERE rn = 1
ORDER BY vec_id
"""


@query("embedding_sdc_top1_neighbor", _SDC_TOP1_ORACLE)
def embedding_sdc_top1_neighbor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Every indexed vector's nearest IN-BUCKET neighbor by symmetric
    PQ distance, computed ENTIRELY from the persisted pq_codes store:
    a bucket-bounded self-join (never all-pairs — the coarse quantizer
    caps candidates at N/nlist per side, the simhash-bucket precedent)
    whose distance is m integer lookups into codebook-literal k×k
    tables. This is the all-corpus neighbor-join shape embedding
    dedup runs at 100 TB: code bytes only, raw vectors untouched.
    Ties break on (sdc, neighbor_id); the oracle recomputes buckets,
    codes, and every table lookup."""
    from pyspark.sql import Window

    idx = _built_ivfpq_index(spark, sf_dir)
    codes = idx.pq_codes_store.read(spark)
    a = codes.select(
        F.col("vec_id"),
        F.col("bucket"),
        F.col("codes").alias("a_codes"),
    )
    b = codes.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("bucket").alias("b_bucket"),
        F.col("codes").alias("b_codes"),
    )
    pairs = (
        a.join(b, (a["bucket"] == b["b_bucket"]))
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select(
            "vec_id",
            "neighbor_id",
            _SDC_UDF(F.col("a_codes"), F.col("b_codes")).alias(
                "sdc_dist_q"
            ),
        )
    )
    w = Window.partitionBy("vec_id").orderBy("sdc_dist_q", "neighbor_id")
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("vec_id", "neighbor_id", "sdc_dist_q")
        .orderBy("vec_id")
    )
