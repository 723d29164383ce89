"""Incremental near-dup admission as an oracle-checked query
(SURVEY §2.11 L2, ingest face; operators/incremental_dedup.py).

The corpus (doc_id % 5 != 0, ~80%) bootstraps a persisted signature
index once per (process, input fingerprint); each query call admits
the remaining ~20% as a sync batch against a hardlink CLONE of that
index (the clone keeps the call pure — admission mutates its own
store and the report is deterministic however many times the query
runs). The DuckDB oracle recomputes the full semantic from scratch:
MinHash signatures over all documents, band-key candidates between
the two splits, signature-agreement (>= 8 of 16 positions) verify,
and the corpus_dup > batch_dup > admitted status rule with
lowest-id-wins inside the batch.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.operators.incremental_dedup import NearDupIndex
from calorista_spark.queries.llm import lsh_verified_pairs_ctes
from calorista_spark.queries.registry import query

# sig + bands CTEs (identical hash family to the engine); the exact-
# jaccard tail CTEs of the shared chain go unreferenced and unplanned
_ADMIT_ORACLE = (
    "WITH "
    + lsh_verified_pairs_ctes()
    + """,
cand_cn AS (
  SELECT DISTINCT a.doc_id AS id_i, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0
),
corpus_dup AS (
  SELECT DISTINCT c.id_b
  FROM cand_cn c
  JOIN sig sa ON sa.doc_id = c.id_i
  JOIN sig sb ON sb.doc_id = c.id_b AND sb.seed = sa.seed
  GROUP BY c.id_i, c.id_b
  HAVING SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) >= 8
),
cand_nn AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 = 0
),
batch_dup AS (
  SELECT DISTINCT c.id_b
  FROM cand_nn c
  JOIN sig sa ON sa.doc_id = c.id_a
  JOIN sig sb ON sb.doc_id = c.id_b AND sb.seed = sa.seed
  GROUP BY c.id_a, c.id_b
  HAVING SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) >= 8
)
SELECT d.doc_id,
       CASE WHEN d.doc_id IN (SELECT id_b FROM corpus_dup)
              THEN 'corpus_dup'
            WHEN d.doc_id IN (SELECT id_b FROM batch_dup)
              THEN 'batch_dup'
            ELSE 'admitted' END AS status
FROM documents d
WHERE d.doc_id % 5 = 0
ORDER BY d.doc_id
"""
)

_BASE_CACHE: dict[tuple, str] = {}


def _documents_fingerprint(sf_dir: str) -> str:
    p = os.path.join(sf_dir, "documents.parquet")
    parts = [sf_dir]
    if os.path.isdir(p):
        for n in sorted(os.listdir(p)):
            st = os.stat(os.path.join(p, n))
            parts.append(f"{n}:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.exists(p):
        st = os.stat(p)
        parts.append(f"{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5(";".join(parts).encode()).hexdigest()[:12]


def _base_index_path(spark: SparkSession, sf_dir: str) -> str:
    """The corpus-bootstrapped index, built ONCE per (process, input
    fingerprint) — signature computation over 80% of the documents
    table is the dominant fixture cost, the admission under test is
    not."""
    fp = _documents_fingerprint(sf_dir)
    key = (sf_dir, fp)
    cached = _BASE_CACHE.get(key)
    if cached and os.path.isfile(
        os.path.join(cached, "_commits", "v00000001.json")
    ):
        return cached
    path = os.path.join(
        tempfile.gettempdir(), f"calorista_neardupidx_{fp}_{os.getpid()}"
    )
    shutil.rmtree(path, ignore_errors=True)
    idx = NearDupIndex(path)
    corpus = read_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 5 != 0
    )
    idx.bootstrap(spark, corpus, batch_id=1)
    _BASE_CACHE[key] = path
    return path


@query("doc_incremental_neardup_admission", _ADMIT_ORACLE)
def doc_incremental_neardup_admission(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """L2 ingest face: admit the doc_id % 5 == 0 slice as a sync batch
    against the signature index of the other 80%, reporting each batch
    doc's admission status. Exercises the REAL operator end to end:
    persisted index read, broadcast band join, signature-agreement
    verify, lowest-id-wins batch dedup, and the admitted-signature
    merge commit (against a throwaway clone, so the query stays
    pure)."""
    base = _base_index_path(spark, sf_dir)
    clone = os.path.join(
        tempfile.gettempdir(), f"calorista_neardupadm_{uuid.uuid4().hex}"
    )
    shutil.copytree(base, clone, copy_function=os.link)
    idx = NearDupIndex(clone)
    try:
        batch = read_table(spark, sf_dir, "documents").where(
            F.col("doc_id") % 5 == 0
        )
        # the report is eagerly stage-checkpointed inside admit(), so
        # dropping the clone store afterwards is safe
        report = idx.admit(spark, batch, batch_id=2)
    finally:
        shutil.rmtree(clone, ignore_errors=True)
    return report.orderBy("doc_id")
