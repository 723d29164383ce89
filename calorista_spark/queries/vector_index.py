"""Persisted IVF vector index queries (L3's ingest face — r13,
VERDICT r12 #4): build-once / upsert-incrementally / query-from-index,
all oracle-checked.

The fixture mirrors the table-format queries' pattern: the index is
built ONCE per (input-fingerprint, process) — bootstrap over the
corpus MINUS a holdout slice, then the holdout slice upserted
incrementally under a ``batch_id`` (and REPLAYED, proving the ledger
skips it) — and every call after the first only exercises the read
path. The DuckDB oracle recomputes the entire index semantics in SQL
(per-label centroids over the bootstrap subset, nearest-centroid
assignment for every vector, nprobe probing, in-bucket ranking), so
the correctness gate covers training, ingest, and query together.

Null embeddings are excluded explicitly on both sides (the corpus
null-vector convention, COVERAGE.md)."""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.queries.llm import _DOT, _TOPK_BRUTE_ORACLE
from calorista_spark.queries.registry import query

# the holdout slice ingested INCREMENTALLY after bootstrap
_HOLDOUT = "vec_id % 10 = 7"
_NPROBE = 2
_K = 5

_INDEX_CACHE: dict[tuple, str] = {}


def _emb_fingerprint(sf_dir: str) -> str:
    p = os.path.join(sf_dir, "embeddings.parquet")
    parts = [sf_dir]
    if os.path.isdir(p):
        for n in sorted(os.listdir(p)):
            st = os.stat(os.path.join(p, n))
            parts.append(f"{n}:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.exists(p):
        st = os.stat(p)
        parts.append(f"{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5(";".join(parts).encode()).hexdigest()[:12]


def _built_index(spark: SparkSession, sf_dir: str):
    """The shared index fixture: bootstrap on the non-holdout corpus,
    one incremental upsert of the holdout slice (batch_id=1), one
    REPLAY of the same batch (must be skipped by the ledger — guarded
    here, so the correctness gate itself pins exactly-once ingest)."""
    from calorista_spark.operators.ann_index import IVFVectorIndex

    fp = _emb_fingerprint(sf_dir)
    key = (sf_dir, fp)
    path = _INDEX_CACHE.get(key)
    if path is not None and os.path.isfile(
        os.path.join(path, "assignments", "_commits", "v00000002.json")
    ):
        return IVFVectorIndex(path)
    path = os.path.join(
        tempfile.gettempdir(), f"calorista_annidx_{fp}_{os.getpid()}"
    )
    shutil.rmtree(path, ignore_errors=True)
    idx = IVFVectorIndex(path)
    # "flag" = a filterable attribute CO-LOCATED with the index rows
    # (r14 filtered search): deterministic vec_id % 3 so the DuckDB
    # oracle recomputes it exactly
    emb = (
        read_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .withColumn("flag", (F.col("vec_id") % 3).cast("int"))
    )
    idx.bootstrap(
        spark, emb.filter(f"NOT ({_HOLDOUT})"), attr_cols=["flag"]
    )
    holdout = emb.filter(_HOLDOUT)
    idx.upsert(spark, holdout, batch_id=1, attr_cols=["flag"])
    v_after = idx.assignments_store.latest_version()
    # replay: exactly-once
    idx.upsert(spark, holdout, batch_id=1, attr_cols=["flag"])
    if idx.assignments_store.latest_version() != v_after:
        raise RuntimeError(
            "replayed upsert produced a new version — ledger broken"
        )
    _INDEX_CACHE[key] = path
    return IVFVectorIndex(path)


_ANN_TOPK_ORACLE = f"""
WITH live AS (
  SELECT vec_id, label, embedding FROM embeddings
  WHERE embedding IS NOT NULL
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
q AS (
  SELECT vec_id AS q_id, embedding AS q_vec, norm AS q_norm
  FROM norms WHERE vec_id < 5
),
probes AS (
  SELECT q_id, bucket AS probe_bucket, q_vec, q_norm FROM (
    SELECT q.q_id, c.bucket, q.q_vec, q.q_norm,
           row_number() OVER (
             PARTITION BY q.q_id
             ORDER BY ROUND({_DOT.format(a='q.q_vec', b='c.centroid')}
                            / (q.q_norm * c.c_norm), 6) DESC,
                      c.bucket) AS rn
    FROM q CROSS JOIN cents_n c
  ) WHERE rn <= {_NPROBE}
),
scored AS (
  SELECT p.q_id, p.probe_bucket, a.vec_id AS cand_id,
         ROUND({_DOT.format(a='p.q_vec', b='a.embedding')}
               / (p.q_norm * a.norm), 6) AS sim
  FROM probes p
  JOIN assigned a ON a.bucket = p.probe_bucket AND a.vec_id <> p.q_id
),
ranked AS (
  SELECT q_id, probe_bucket, cand_id, sim,
         CAST(row_number() OVER (
           PARTITION BY q_id ORDER BY sim DESC, cand_id
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT q_id, probe_bucket, cand_id, sim, rank
FROM ranked WHERE rank <= {_K}
ORDER BY q_id, rank
"""


@query("embedding_ann_index_topk", _ANN_TOPK_ORACLE)
def embedding_ann_index_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-k from the PERSISTED IVF index (operators/ann_index.py):
    centroids trained once over the bootstrap corpus, the holdout
    slice ingested incrementally (exactly-once replay guarded in the
    fixture), probes reading ONLY the probed buckets' partitions
    through the store's manifest pruning. The oracle recomputes the
    full index semantics, so training + ingest + query are all inside
    the correctness gate."""
    idx = _built_index(spark, sf_dir)
    emb = read_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    return idx.topk(
        spark,
        emb.filter(F.col("vec_id") < 5),
        k=_K,
        nprobe=_NPROBE,
    ).orderBy("q_id", "rank")


_ANN_RECALL_ORACLE = f"""
WITH brute AS (SELECT q_id, cand_id FROM ({_TOPK_BRUTE_ORACLE})),
ann AS (SELECT q_id, cand_id FROM ({_ANN_TOPK_ORACLE})),
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


@query("embedding_ann_index_recall", _ANN_RECALL_ORACLE)
def embedding_ann_index_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Recall@5 of the PERSISTED index (nprobe=2) against the exact
    brute-force anchor — the approximation-quality monitor for the
    ingest-face deployment, same shape as ``embedding_ivf_recall``.
    NOTE: the brute anchor ranks over the full corpus; a query whose
    true neighbors straddle un-probed buckets reads < 1.0 — that gap
    is the measurement, not an error."""
    from calorista_spark.queries.llm import embedding_topk_bruteforce

    brute = embedding_topk_bruteforce(spark, sf_dir).select(
        "q_id", "cand_id"
    )
    ann = embedding_ann_index_topk(spark, sf_dir).select(
        "q_id", "cand_id"
    )
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


_ANN_FILTERED_ORACLE = f"""
WITH live AS (
  SELECT vec_id, label, embedding FROM embeddings
  WHERE embedding IS NOT NULL
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
q AS (
  SELECT vec_id AS q_id, embedding AS q_vec, norm AS q_norm
  FROM norms WHERE vec_id < 5
),
probes AS (
  SELECT q_id, bucket AS probe_bucket, q_vec, q_norm FROM (
    SELECT q.q_id, c.bucket, q.q_vec, q.q_norm,
           row_number() OVER (
             PARTITION BY q.q_id
             ORDER BY ROUND({_DOT.format(a='q.q_vec', b='c.centroid')}
                            / (q.q_norm * c.c_norm), 6) DESC,
                      c.bucket) AS rn
    FROM q CROSS JOIN cents_n c
  ) WHERE rn <= {_NPROBE}
),
scored AS (
  SELECT p.q_id, p.probe_bucket, a.vec_id AS cand_id,
         ROUND({_DOT.format(a='p.q_vec', b='a.embedding')}
               / (p.q_norm * a.norm), 6) AS sim
  FROM probes p
  JOIN assigned a ON a.bucket = p.probe_bucket AND a.vec_id <> p.q_id
  WHERE (a.vec_id % 3) = 1
),
ranked AS (
  SELECT q_id, probe_bucket, cand_id, sim,
         CAST(row_number() OVER (
           PARTITION BY q_id ORDER BY sim DESC, cand_id
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT q_id, probe_bucket, cand_id, sim, rank
FROM ranked WHERE rank <= {_K}
ORDER BY q_id, rank
"""


@query("embedding_ann_filtered_topk", _ANN_FILTERED_ORACLE)
def embedding_ann_filtered_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FILTERED ANN search (r14): top-k from the persisted IVF index
    restricted to candidates whose co-located attribute matches
    (``flag = vec_id % 3 = 1``, stored WITH the index rows at
    bootstrap/upsert). The predicate rides the SAME ``read_where``
    call as the bucket probe, so it is manifest-level data skipping
    inside the probed partitions plus an exact residual — never a
    post-join against an external attribute table. The oracle
    recomputes training, assignment, probing, the attribute, and the
    filtered ranking, so the whole filtered-search path sits inside
    the correctness gate."""
    idx = _built_index(spark, sf_dir)
    emb = read_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    return idx.topk(
        spark,
        emb.filter(F.col("vec_id") < 5),
        k=_K,
        nprobe=_NPROBE,
        where=[("flag", "==", 1)],
    ).orderBy("q_id", "rank")
