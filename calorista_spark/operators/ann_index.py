"""Persisted IVF vector index with an incremental ingest face
(SURVEY §2.11 L3 — r13, VERDICT r12 #4).

The batch similarity operators (operators/similarity.py) recompute
centroids and bucket assignments per job; a production ANN deployment
trains the coarse quantizer once and then INGESTS embeddings against
it. This module mirrors r12's L2 pattern (the near-dup signature
index, operators/incremental_dedup.py): the index is a pair of
:class:`~calorista_spark.sources.commitlog.CommitLogStore` tables,

- ``<root>/centroids``  — ``(bucket int, centroid array<double>,
  c_norm double)``: the frozen coarse quantizer, trained once at
  :meth:`bootstrap` (per-label mean, the same deterministic quantizer
  ``ivf_centroids`` uses). Small (``nlist`` rows) — always broadcast.
- ``<root>/assignments`` — ``(vec_id long, bucket int, embedding,
  norm double)``, PARTITIONED BY bucket: every indexed vector under
  its nearest centroid. Partitioning is the scale feature: a probe
  reads only the probed buckets' partitions through the store's
  manifest pruning (``read_where``), so query cost is
  O(nprobe · N / nlist) rows scanned, not O(N) — and the index is
  never recomputed.

Ingest (:meth:`upsert`) assigns new vectors to their nearest frozen
centroid (one broadcast join, map-side) and MERGEs them into the
assignments table keyed by ``vec_id``; passing ``batch_id`` rides the
commit ledger, so a replayed sync is exactly-once — identical to the
L2 admission machinery. Centroid drift is handled the standard IVF
way: retrain = :meth:`bootstrap` over the current corpus (frozen
quantizers are how FAISS/ScaNN deployments run; incremental
centroid updates would silently re-bucket old vectors).

Determinism conventions match the batch operators so DuckDB oracles
can mirror the whole index: centroid components and similarities are
``ROUND(.., 6)``; nearest-centroid ties break on the LOWEST bucket id;
top-k ranks on (sim DESC, cand_id).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calorista_spark.functions.vectors import dot, l2_norm
from calorista_spark.operators.similarity import ivf_centroids
from calorista_spark.sources.commitlog import CommitLogStore

ANN_FAMILY_VERSION = 1

_PARAMS_FILE = "_ann_family.json"
_PQ_PARAMS_FILE = "_pq_family.json"


class IVFVectorIndex:
    """A persisted IVF (inverted-file) cosine index over an
    ``array<float|double>`` embedding column. See module doc."""

    def __init__(self, path: str, round_digits: int = 6):
        self.path = os.path.abspath(path)
        self.round_digits = round_digits
        os.makedirs(self.path, exist_ok=True)
        self.centroids_store = CommitLogStore(
            os.path.join(self.path, "centroids")
        )
        self.assignments_store = CommitLogStore(
            os.path.join(self.path, "assignments")
        )
        self._check_family()

    # -- family pinning (same defense as NearDupIndex's) -------------------

    def _params(self) -> dict:
        return {
            "family_version": ANN_FAMILY_VERSION,
            "metric": "cosine",
            "round_digits": self.round_digits,
        }

    def _check_family(self) -> None:
        p = os.path.join(self.path, _PARAMS_FILE)
        if not os.path.exists(p):
            tmp = p + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(self._params(), fh)
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(tmp, p)
            return
        with open(p) as fh:
            stamped = json.load(fh)
        mine = self._params()
        diffs = {
            k: (stamped.get(k), mine[k])
            for k in mine
            if stamped.get(k) != mine[k]
        }
        if diffs:
            raise ValueError(
                "ANN index parameter mismatch (stored vs requested): "
                f"{diffs}. Rank order persisted under one rounding/"
                "metric does not reproduce under another; open with "
                "the stamped parameters or re-bootstrap."
            )

    # -- internals ----------------------------------------------------------

    def centroids(self, spark: SparkSession) -> DataFrame:
        """(bucket, centroid, c_norm) — the frozen quantizer."""
        return self.centroids_store.read(spark)

    def _assign(
        self, emb: DataFrame, id_col: str, vec_col: str, cents: DataFrame
    ) -> DataFrame:
        """(vec_id, bucket, embedding, norm): each vector under its
        nearest centroid by rounded cosine, ties to the lowest bucket.
        One broadcast nested-loop against nlist rows — map-side, no
        shuffle of the vector table."""
        from pyspark.sql import Window

        v = emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
        ).withColumn("norm", l2_norm("embedding"))
        sim = F.round(
            dot("embedding", "centroid") / (F.col("norm") * F.col("c_norm")),
            self.round_digits,
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.col("__sim").desc(), F.col("bucket")
        )
        return (
            v.crossJoin(F.broadcast(cents))
            .withColumn("__sim", sim)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("vec_id", "bucket", "embedding", "norm")
        )

    # -- build / ingest -----------------------------------------------------

    def bootstrap(
        self,
        spark: SparkSession,
        emb: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        bucket_col: str = "label",
        batch_id: int | None = None,
    ) -> None:
        """Train the quantizer over a LABELED corpus (per-label mean —
        deterministic, the convention of ``ivf_centroids``) and index
        every corpus vector under its nearest centroid. Re-running
        re-trains (an overwrite commit): the retrain path when drift
        accumulates."""
        cents = ivf_centroids(
            emb, bucket_col, vec_col, self.round_digits
        ).select(
            F.col(bucket_col).alias("bucket"),
            "centroid",
            l2_norm("centroid").alias("c_norm"),
        )
        self.centroids_store.commit(
            cents, op="overwrite", expect_version=None
        )
        assigned = self._assign(
            emb, id_col, vec_col, self.centroids_store.read(spark)
        )
        self.assignments_store.commit(
            assigned,
            op="overwrite",
            expect_version=None,
            partition_by="bucket",
            keys=["vec_id"],
            batch_id=batch_id,
            optimize_write=True,
        )

    def upsert(
        self,
        spark: SparkSession,
        emb: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        batch_id: int | None = None,
    ) -> None:
        """Ingest a batch: assign against the FROZEN centroids and
        merge into the assignments table keyed by vec_id — only the
        touched buckets' partitions rewrite (file-granular MERGE), and
        a replayed ``batch_id`` is skipped by the commit ledger
        (exactly-once, the L2 admission pattern)."""
        assigned = self._assign(
            emb, id_col, vec_col, self.centroids_store.read(spark)
        )
        self.assignments_store.merge(
            spark,
            assigned,
            keys=["vec_id"],
            batch_id=batch_id,
            optimize_write=True,
        )

    # -- query ----------------------------------------------------------------

    def topk(
        self,
        spark: SparkSession,
        queries: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 5,
        nprobe: int = 1,
    ) -> DataFrame:
        """Approximate top-k neighbors of each query vector, reading
        ONLY the probed buckets' partitions from the persisted index
        (manifest-pruned ``read_where`` — the index data outside the
        probe set is never planned). Output matches
        ``cosine_topk_ivf``'s shape: (q_id, probe_bucket, cand_id,
        sim, rank)."""
        from pyspark.sql import Window

        cents = self.centroids_store.read(spark)
        q = queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
        ).withColumn("q_norm", l2_norm("q_vec"))
        csim = F.round(
            dot("q_vec", "centroid") / (F.col("q_norm") * F.col("c_norm")),
            self.round_digits,
        )
        wq = Window.partitionBy("q_id").orderBy(
            F.col("c_sim").desc(), F.col("bucket")
        )
        assigned = (
            q.crossJoin(F.broadcast(cents))
            .withColumn("c_sim", csim)
            .withColumn("__rn", F.row_number().over(wq))
            .filter(F.col("__rn") <= nprobe)
            .select(
                "q_id", "q_vec", "q_norm",
                F.col("bucket").alias("probe_bucket"),
            )
        )
        # the probed bucket set is <= nlist values (quantizer-sized,
        # driver-bounded by construction) — collecting it lets the
        # store prune non-probed partitions OUT OF THE PLAN
        probed = sorted(
            r.probe_bucket
            for r in assigned.select("probe_bucket").distinct().collect()
        )
        if not probed:
            return spark.createDataFrame(
                [],
                "q_id long, probe_bucket int, cand_id long, "
                "sim double, rank int",
            )
        cands = self.assignments_store.read_where(
            spark, [("bucket", "in", probed)]
        ).select(
            F.col("vec_id").alias("cand_id"),
            F.col("bucket").alias("c_bucket"),
            F.col("embedding").alias("c_vec"),
            F.col("norm").alias("c_norm"),
        )
        sim = F.round(
            dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")),
            self.round_digits,
        )
        scored = (
            assigned.join(
                cands, assigned["probe_bucket"] == cands["c_bucket"]
            )
            .filter(F.col("q_id") != F.col("cand_id"))
            .select("q_id", "probe_bucket", "cand_id", sim.alias("sim"))
        )
        w = Window.partitionBy("q_id").orderBy(
            F.col("sim").desc(), F.col("cand_id")
        )
        return scored.withColumn(
            "rank", F.row_number().over(w).cast("int")
        ).filter(F.col("rank") <= k)


class PQCodeIndex:
    """Persisted product-quantization index (the PQ half of VERDICT
    r12 #4's parenthetical): the trained codebook AND the per-vector
    codes live in commit-log stores, so neither is recomputed per job.

    - ``<root>/codebook`` — ``(subspace int, code int, centroid
      array<double>)``: the frozen trained quantizer (m·k rows —
      tiny; float64 parquet roundtrip is exact, so the reloaded
      codebook is BIT-IDENTICAL to the trained one and every
      downstream code/ADC value is reproducible).
    - ``<root>/codes`` — ``(vec_id long, codes array<int>, recon
      bigint)``: each vector's m codes + integer-quantized
      reconstruction error, assigned by the Arrow-batched numpy
      projection (operators/pq.py ``pq_assign_udf`` — the measured
      fast path). :meth:`upsert` merges new batches keyed by
      ``vec_id`` under the ``batch_id`` replay ledger (exactly-once),
      mirroring :class:`IVFVectorIndex`.

    Codebook drift = retrain = :meth:`bootstrap` again (an overwrite
    commit of both stores); codes assigned under the old codebook are
    replaced wholesale because PQ codes are meaningless across
    codebooks."""

    def __init__(self, path: str):
        self.path = os.path.abspath(path)
        os.makedirs(self.path, exist_ok=True)
        self.codebook_store = CommitLogStore(
            os.path.join(self.path, "codebook")
        )
        self.codes_store = CommitLogStore(os.path.join(self.path, "codes"))

    # -- build / ingest ------------------------------------------------------

    def bootstrap(
        self,
        spark: SparkSession,
        emb: DataFrame,
        codebook=None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        batch_id: int | None = None,
        m: int = 8,
        k: int = 16,
        sample_n: int = 16384,
    ) -> None:
        """Persist the codebook (trained here via the deterministic
        sample-bounded trainer unless a pre-trained array is passed —
        production indexes ship their codebook exactly like the BPE
        merge table) and code the whole corpus."""
        import numpy as np

        from calorista_spark.operators.pq import train_pq_from_df

        if codebook is None:
            codebook = train_pq_from_df(
                emb, vec_col=vec_col, id_col=id_col, m=m, k=k,
                sample_n=sample_n,
            )
        cb = np.asarray(codebook, dtype=np.float64)
        rows = [
            (int(j), int(c), [float(x) for x in cb[j, c]])
            for j in range(cb.shape[0])
            for c in range(cb.shape[1])
        ]
        self.codebook_store.commit(
            spark.createDataFrame(
                rows, "subspace int, code int, centroid array<double>"
            ),
            op="overwrite",
            expect_version=None,
        )
        coded = self._assign_codes(spark, emb, id_col, vec_col)
        self.codes_store.commit(
            coded,
            op="overwrite",
            expect_version=None,
            keys=["vec_id"],
            batch_id=batch_id,
        )

    def codebook(self, spark: SparkSession):
        """The persisted quantizer as the (m, k, dsub) numpy array —
        bit-identical to what :meth:`bootstrap` stored."""
        import numpy as np

        rows = self.codebook_store.read(spark).collect()
        m = 1 + max(r.subspace for r in rows)
        k = 1 + max(r.code for r in rows)
        dsub = len(rows[0].centroid)
        cb = np.empty((m, k, dsub), dtype=np.float64)
        for r in rows:
            cb[r.subspace, r.code] = r.centroid
        return cb

    def _assign_codes(
        self, spark: SparkSession, emb: DataFrame, id_col: str, vec_col: str
    ) -> DataFrame:
        from pyspark.sql import functions as F

        from calorista_spark.operators.pq import pq_assign_udf

        assign = pq_assign_udf(self.codebook(spark))
        return emb.select(
            F.col(id_col).alias("vec_id"),
            assign(F.col(vec_col)).alias("__pq"),
        ).select(
            "vec_id", F.col("__pq.codes").alias("codes"),
            F.col("__pq.recon").alias("recon"),
        )

    def upsert(
        self,
        spark: SparkSession,
        emb: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        batch_id: int | None = None,
    ) -> None:
        """Code a new batch under the FROZEN persisted codebook and
        merge keyed by vec_id; replayed ``batch_id``s are skipped by
        the commit ledger (exactly-once)."""
        coded = self._assign_codes(spark, emb, id_col, vec_col)
        self.codes_store.merge(
            spark, coded, keys=["vec_id"], batch_id=batch_id
        )

    def codes(self, spark: SparkSession) -> DataFrame:
        return self.codes_store.read(spark)
