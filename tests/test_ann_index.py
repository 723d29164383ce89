"""Persisted IVF vector index (operators/ann_index.py): bootstrap /
incremental upsert with exactly-once replay, frozen-centroid
assignment, probe-time partition pruning, and family pinning."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from calorista_spark.operators.ann_index import IVFVectorIndex


def _emb(spark, rows):
    # rows: (vec_id, [floats], label)
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def _cluster(center, jitter):
    return [c + jitter for c in center]


@pytest.fixture()
def corpus(spark):
    # three well-separated clusters along distinct axes
    a, b, c = [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]
    rows = []
    for i in range(6):
        rows.append((i, _cluster(a, 0.01 * i), 0))
        rows.append((10 + i, _cluster(b, 0.01 * i), 1))
        rows.append((20 + i, _cluster(c, 0.01 * i), 2))
    return _emb(spark, rows)


def test_bootstrap_upsert_and_topk(spark, tmp_path, corpus):
    idx = IVFVectorIndex(str(tmp_path / "idx"))
    idx.bootstrap(spark, corpus)
    # an unlabeled new vector lands in its nearest cluster's bucket
    new = spark.createDataFrame(
        [(100, [0.9, 0.05, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    idx.upsert(spark, new, batch_id=1)
    assigned = {
        r.vec_id: r.bucket
        for r in idx.assignments_store.read(spark).collect()
    }
    assert assigned[100] == 0
    assert len(assigned) == 19
    # top-k of a probe near cluster b stays inside bucket 1 (nprobe=1)
    q = spark.createDataFrame(
        [(999, [0.0, 1.0, 0.01, 0.0])],
        "vec_id long, embedding array<float>",
    )
    top = idx.topk(spark, q, k=3, nprobe=1).collect()
    assert len(top) == 3
    assert all(r.probe_bucket == 1 for r in top)
    assert all(10 <= r.cand_id < 20 for r in top)
    assert top[0].rank == 1 and top[0].sim == max(r.sim for r in top)


def test_upsert_replay_is_exactly_once(spark, tmp_path, corpus):
    idx = IVFVectorIndex(str(tmp_path / "idx"))
    idx.bootstrap(spark, corpus)
    new = spark.createDataFrame(
        [(100, [0.9, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    idx.upsert(spark, new, batch_id=7)
    v = idx.assignments_store.latest_version()
    before = {
        (r.vec_id, r.bucket)
        for r in idx.assignments_store.read(spark).collect()
    }
    idx.upsert(spark, new, batch_id=7)  # replay
    assert idx.assignments_store.latest_version() == v
    after = {
        (r.vec_id, r.bucket)
        for r in idx.assignments_store.read(spark).collect()
    }
    assert after == before


def test_centroids_frozen_across_upserts(spark, tmp_path, corpus):
    idx = IVFVectorIndex(str(tmp_path / "idx"))
    idx.bootstrap(spark, corpus)
    cents_before = {
        r.bucket: tuple(r.centroid)
        for r in idx.centroids(spark).collect()
    }
    # a flood of new vectors near cluster a must NOT move centroids
    flood = spark.createDataFrame(
        [(200 + i, [0.5, 0.5, 0.0, 0.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    idx.upsert(spark, flood, batch_id=1)
    cents_after = {
        r.bucket: tuple(r.centroid)
        for r in idx.centroids(spark).collect()
    }
    assert cents_after == cents_before
    assert idx.centroids_store.latest_version() == 1


def test_probe_reads_only_probed_partitions(spark, tmp_path, corpus):
    idx = IVFVectorIndex(str(tmp_path / "idx"))
    idx.bootstrap(spark, corpus)
    q = spark.createDataFrame(
        [(999, [1.0, 0.02, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    idx.topk(spark, q, k=2, nprobe=1).collect()
    prof = idx.assignments_store.last_prune_profile
    assert prof is not None
    # 3 bucket partitions exist; an nprobe=1 query loads exactly 1
    assert prof["segments_total"] == 3
    assert prof["segments_loaded"] == 1


def test_family_params_pinned(spark, tmp_path, corpus):
    p = str(tmp_path / "idx")
    IVFVectorIndex(p, round_digits=6)
    IVFVectorIndex(p, round_digits=6)  # same params: fine
    with pytest.raises(ValueError, match="parameter mismatch"):
        IVFVectorIndex(p, round_digits=4)


def test_topk_sims_match_exact_cosine(spark, tmp_path, corpus):
    idx = IVFVectorIndex(str(tmp_path / "idx"))
    idx.bootstrap(spark, corpus)
    qvec = [0.0, 0.0, 1.0, 0.0]
    q = spark.createDataFrame(
        [(999, qvec)], "vec_id long, embedding array<float>"
    )
    got = {
        r.cand_id: r.sim
        for r in idx.topk(spark, q, k=2, nprobe=1).collect()
    }
    rows = {
        r.vec_id: list(r.embedding)
        for r in corpus.filter(F.col("label") == 2).collect()
    }
    for cid, sim in got.items():
        v = rows[cid]
        exact = sum(a * b for a, b in zip(qvec, v)) / (
            math.sqrt(sum(a * a for a in qvec))
            * math.sqrt(sum(b * b for b in v))
        )
        assert abs(sim - round(exact, 6)) < 1e-9


def test_pq_code_index_roundtrip_and_replay(spark, tmp_path, corpus):
    import numpy as np

    from calorista_spark.operators.ann_index import PQCodeIndex
    from calorista_spark.operators.pq import train_pq_codebook

    X = np.array(
        [r.embedding for r in corpus.orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    cb = train_pq_codebook(X, m=2, k=4)
    idx = PQCodeIndex(str(tmp_path / "pq"))
    idx.bootstrap(spark, corpus.filter("vec_id < 20"), codebook=cb)
    # float64 parquet roundtrip is exact
    assert np.array_equal(idx.codebook(spark), cb)
    # incremental upsert under the ledger
    idx.upsert(spark, corpus.filter("vec_id >= 20"), batch_id=1)
    v = idx.codes_store.latest_version()
    before = {
        (r.vec_id, tuple(r.codes)) for r in idx.codes(spark).collect()
    }
    assert len(before) == 18
    idx.upsert(spark, corpus.filter("vec_id >= 20"), batch_id=1)
    assert idx.codes_store.latest_version() == v
    after = {
        (r.vec_id, tuple(r.codes)) for r in idx.codes(spark).collect()
    }
    assert after == before
    # stored codes match a fresh assignment under the same codebook
    fresh = {
        (r.vec_id, tuple(r.codes))
        for r in idx._assign_codes(
            spark, corpus, "vec_id", "embedding"
        ).collect()
    }
    assert after == fresh

def test_pq_family_params_pinned(spark, tmp_path, corpus):
    """ADVICE r13: re-bootstrapping an existing PQ index under
    different {m, k, sample_n} must raise instead of silently training
    a new codebook (codes are meaningless across codebooks); force=True
    is the deliberate retrain escape."""
    from calorista_spark.operators.ann_index import PQCodeIndex

    p = str(tmp_path / "pq")
    idx = PQCodeIndex(p)
    idx.bootstrap(spark, corpus, m=2, k=4, sample_n=64)
    # same params: retrain allowed (the documented drift path)
    idx.bootstrap(spark, corpus, m=2, k=4, sample_n=64)
    with pytest.raises(ValueError, match="parameter mismatch"):
        idx.bootstrap(spark, corpus, m=4, k=4, sample_n=64)
    # force: deliberate retrain rewrites the stamp
    idx.bootstrap(spark, corpus, m=4, k=4, sample_n=64, force=True)
    idx.bootstrap(spark, corpus, m=4, k=4, sample_n=64)  # now pinned


def test_ivf_retract_removes_from_topk(spark, tmp_path, corpus):
    """VERDICT r13 #7: a retracted vector must never appear in topk;
    replayed retract batch_ids are skipped; the surviving index equals
    an index that never contained the vectors (same frozen centroids)."""
    idx = IVFVectorIndex(str(tmp_path / "idx"))
    idx.bootstrap(spark, corpus)
    q = spark.createDataFrame(
        [(999, [0.0, 1.0, 0.01, 0.0])],
        "vec_id long, embedding array<float>",
    )
    before = [r.cand_id for r in idx.topk(spark, q, k=3, nprobe=1).collect()]
    victim = before[0]
    idx.retract(spark, [victim], batch_id=11)
    after = idx.topk(spark, q, k=3, nprobe=1).collect()
    assert victim not in {r.cand_id for r in after}
    assert [r.rank for r in after] == [1, 2, 3]
    # replay is exactly-once
    v = idx.assignments_store.latest_version()
    idx.retract(spark, [victim], batch_id=11)
    assert idx.assignments_store.latest_version() == v
    # rebuild equivalence: retract(X) then query == the same-centroid
    # index whose candidate set never held X
    expected = [
        r.cand_id
        for r in idx.topk(spark, q, k=3, nprobe=1).collect()
    ]
    rebuilt = IVFVectorIndex(str(tmp_path / "idx2"))
    rebuilt.bootstrap(spark, corpus)  # same corpus -> same centroids
    rebuilt.retract(spark, [victim])
    assert [
        r.cand_id for r in rebuilt.topk(spark, q, k=3, nprobe=1).collect()
    ] == expected


def test_pq_retract_removes_codes(spark, tmp_path, corpus):
    from calorista_spark.operators.ann_index import PQCodeIndex

    idx = PQCodeIndex(str(tmp_path / "pq"))
    idx.bootstrap(spark, corpus, m=2, k=4, sample_n=64)
    assert idx.codes(spark).filter("vec_id = 3").count() == 1
    idx.retract(spark, [3, 4], batch_id=2)
    assert idx.codes(spark).filter("vec_id IN (3, 4)").count() == 0
    v = idx.codes_store.latest_version()
    idx.retract(spark, [3, 4], batch_id=2)  # replay skipped
    assert idx.codes_store.latest_version() == v

@pytest.fixture()
def corpus8(spark):
    """Like `corpus` but 8-dim (PQ needs dim % m == 0 with dsub >= 2)."""
    import random

    rng = random.Random(7)
    base = {
        0: [1.0, 0.0, 0.0, 0.0, 0.2, 0.0, 0.0, 0.0],
        1: [0.0, 1.0, 0.0, 0.0, 0.0, 0.2, 0.0, 0.0],
        2: [0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.2, 0.0],
    }
    rows = []
    for lbl, center in base.items():
        for i in range(8):
            vec = [c + rng.uniform(-0.05, 0.05) for c in center]
            rows.append((lbl * 10 + i, vec, lbl))
    return _emb(spark, rows)


def test_ivfpq_topk_adc_matches_raw_topk_with_full_rerank(
    spark, tmp_path, corpus8
):
    """With rerank >= the probed candidate count, the fused ADC path
    must return EXACTLY what the raw-vector probe returns (same
    shortlist in, same cosine rerank out) — the correctness anchor
    under which smaller rerank budgets trade bytes for recall."""
    from calorista_spark.operators.ann_index import IVFPQIndex

    idx = IVFPQIndex(str(tmp_path / "idx"))
    idx.bootstrap(spark, corpus8, m=4, k=4, sample_n=64)
    q = corpus8.filter("vec_id IN (0, 11)")
    raw = idx.topk(spark, q, k=3, nprobe=2)
    fused = idx.topk_adc(spark, q, k=3, nprobe=2, rerank=1000)
    want = sorted(
        (r.q_id, r.cand_id, r.sim, r.rank) for r in raw.collect()
    )
    got = sorted(
        (r.q_id, r.cand_id, r.sim, r.rank) for r in fused.collect()
    )
    assert got == want
    # adc distances are integers present on every row
    assert all(
        isinstance(r.adc_dist_q, int) for r in fused.collect()
    )


def test_ivfpq_upsert_feeds_both_halves_exactly_once(
    spark, tmp_path, corpus8
):
    from calorista_spark.operators.ann_index import IVFPQIndex

    idx = IVFPQIndex(str(tmp_path / "idx"))
    idx.bootstrap(spark, corpus8.filter("vec_id < 20"), m=4, k=4)
    new = corpus8.filter("vec_id >= 20").drop("label")
    idx.upsert(spark, new, batch_id=3)
    va = idx.assignments_store.latest_version()
    vc = idx.pq_codes_store.latest_version()
    idx.upsert(spark, new, batch_id=3)  # replay
    assert idx.assignments_store.latest_version() == va
    assert idx.pq_codes_store.latest_version() == vc
    n_raw = idx.assignments_store.read(spark).count()
    n_codes = idx.pq_codes_store.read(spark).count()
    assert n_raw == n_codes == 24
    # codes live under the same bucket partition as the raw vectors
    raw_b = {
        r.vec_id: r.bucket
        for r in idx.assignments_store.read(spark).collect()
    }
    for r in idx.pq_codes_store.read(spark).collect():
        assert raw_b[r.vec_id] == r.bucket


def test_ivfpq_adc_scan_prunes_to_probed_code_partitions(
    spark, tmp_path, corpus8
):
    """The 100 TB claim itself: an nprobe=1 ADC query loads exactly 1
    of the 3 code partitions AND 1 of the 3 raw partitions (rerank),
    and the planned code bytes are a small fraction of the raw bytes."""
    from calorista_spark.operators.ann_index import IVFPQIndex

    idx = IVFPQIndex(str(tmp_path / "idx"))
    idx.bootstrap(spark, corpus8, m=4, k=4)
    q = corpus8.filter("vec_id = 0")
    idx.topk_adc(spark, q, k=2, nprobe=1, rerank=10).collect()
    code_prof = idx.pq_codes_store.last_prune_profile
    raw_prof = idx.assignments_store.last_prune_profile
    assert code_prof["segments_total"] == 3
    assert code_prof["segments_loaded"] == 1
    assert raw_prof["segments_loaded"] == 1
    # bytes: the probed code partition is much smaller than the raw one
    def planned_bytes(store, bucket):
        m = store.manifest(store.latest_version())
        return sum(
            m["stats"][f]["bytes"] for f in m["partitions"][bucket]
        )

    bucket = sorted(idx.pq_codes_store.manifest(
        idx.pq_codes_store.latest_version())["partitions"])[0]
    assert planned_bytes(idx.pq_codes_store, bucket) < planned_bytes(
        idx.assignments_store, bucket
    )


def test_ivfpq_retract_hits_both_halves(spark, tmp_path, corpus8):
    from calorista_spark.operators.ann_index import IVFPQIndex

    idx = IVFPQIndex(str(tmp_path / "idx"))
    idx.bootstrap(spark, corpus8, m=4, k=4)
    q = corpus8.filter("vec_id = 0")
    before = idx.topk_adc(spark, q, k=2, nprobe=1, rerank=100).collect()
    victim = before[0].cand_id
    idx.retract(spark, [victim], batch_id=9)
    after = idx.topk_adc(spark, q, k=2, nprobe=1, rerank=100).collect()
    assert victim not in {r.cand_id for r in after}
    assert idx.pq_codes_store.read(spark).filter(
        F.col("vec_id") == victim
    ).count() == 0


def test_bootstrap_kmeans_labelfree(spark, tmp_path, corpus):
    """Label-free training must recover the cluster structure: every
    cluster lands in one bucket, probes prune, and full-probe topk is
    exact (recall 1.0 vs brute within the index)."""
    idx = IVFVectorIndex(str(tmp_path / "idx"))
    idx.bootstrap_kmeans(spark, corpus.drop("label"), nlist=3)
    assigned = {
        r.vec_id: r.bucket
        for r in idx.assignments_store.read(spark).collect()
    }
    assert len(assigned) == 18
    # each true cluster maps to exactly one trained bucket
    for lo in (0, 10, 20):
        assert len({assigned[lo + i] for i in range(6)}) == 1
    assert len({assigned[0], assigned[10], assigned[20]}) == 3
    # trainer provenance recorded in the family stamp
    import json as _json
    import os as _os

    with open(_os.path.join(idx.path, "_ann_family.json")) as fh:
        assert _json.load(fh)["trainer"] == "kmeans"
    # probe pruning still holds under the kmeans quantizer
    q = spark.createDataFrame(
        [(999, [0.0, 1.0, 0.01, 0.0])],
        "vec_id long, embedding array<float>",
    )
    top = idx.topk(spark, q, k=3, nprobe=1).collect()
    prof = idx.assignments_store.last_prune_profile
    assert prof["segments_total"] == 3 and prof["segments_loaded"] == 1
    assert {r.cand_id for r in top} <= set(range(10, 20))

def test_adc_recall_not_below_raw_ivf(spark, sf_dir):
    """VERDICT r13 #1's gate: the fused ADC path's recall@5 vs the
    brute anchor must be >= the raw-IVF probe's — the shortlist+rerank
    must not lose what the probe found (the _RERANK constant is sized
    for this on the worst-case isotropic corpus; see vector_index_pq)."""
    from calorista_spark.queries import QUERIES

    ivf = sum(
        r.n_hits
        for r in QUERIES["embedding_ann_index_recall"](
            spark, sf_dir
        ).collect()
    )
    pq = sum(
        r.n_hits
        for r in QUERIES["embedding_ann_pq_recall"](
            spark, sf_dir
        ).collect()
    )
    assert pq >= ivf, (pq, ivf)

def test_streaming_ann_ingest_exactly_once(spark, tmp_path, corpus8):
    """ST x L3 (r14): start_ann_ingest upserts each epoch into the
    FUSED index under batch_id = epoch; a restart with no new data
    commits nothing, new data appends exactly once, and both halves
    stay row-for-row in sync."""
    from calorista_spark.operators.ann_index import (
        IVFPQIndex,
        start_ann_ingest,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    p = str(tmp_path / "idx")
    idx = IVFPQIndex(p)
    idx.bootstrap(spark, corpus8.filter("vec_id < 20"), m=4, k=4)

    def feed(df):
        df.select("vec_id", "embedding").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        stream = spark.readStream.schema(
            "vec_id long, embedding array<float>"
        ).parquet(src)
        q = start_ann_ingest(stream, p, ckpt, fused=True)
        q.awaitTermination(120)

    feed(corpus8.filter("vec_id >= 20"))
    run()
    assert idx.assignments_store.read(spark).count() == 24
    assert idx.pq_codes_store.read(spark).count() == 24
    va = idx.assignments_store.latest_version()
    vc = idx.pq_codes_store.latest_version()
    run()  # restart, no new data: nothing commits
    assert idx.assignments_store.latest_version() == va
    assert idx.pq_codes_store.latest_version() == vc
    # one more vector streams in exactly once
    feed(
        spark.createDataFrame(
            [(900, [1.0, 0.0, 0.0, 0.0, 0.2, 0.0, 0.0, 0.0])],
            "vec_id long, embedding array<float>",
        )
    )
    run()
    assert idx.assignments_store.read(spark).count() == 25
    assert idx.pq_codes_store.read(spark).count() == 25


def test_ann_compact_erases_retracted_and_preserves_topk(
    spark, tmp_path, corpus8
):
    from calorista_spark.operators.ann_index import IVFPQIndex

    idx = IVFPQIndex(str(tmp_path / "idx"))
    idx.bootstrap(spark, corpus8, m=4, k=4)
    q = corpus8.filter("vec_id = 0")
    victims = [
        r.cand_id
        for r in idx.topk_adc(spark, q, k=2, nprobe=1, rerank=100).collect()
    ]
    idx.retract(spark, victims)
    before = sorted(
        (r.q_id, r.cand_id, r.rank)
        for r in idx.topk_adc(spark, q, k=2, nprobe=1, rerank=100).collect()
    )
    idx.compact(spark, dv_fraction=0.0)
    after = sorted(
        (r.q_id, r.cand_id, r.rank)
        for r in idx.topk_adc(spark, q, k=2, nprobe=1, rerank=100).collect()
    )
    assert after == before
    # physically erased: no DV entries remain in either half
    for store in (idx.assignments_store, idx.pq_codes_store):
        m = store.manifest(store.latest_version())
        assert not m.get("dv"), m.get("dv")
    # probe pruning still intact post-compact
    idx.topk_adc(spark, q, k=2, nprobe=1, rerank=100).collect()
    assert idx.pq_codes_store.last_prune_profile["segments_loaded"] == 1


def test_filtered_topk_with_colocated_attrs(spark, tmp_path, corpus):
    """r14 filtered search: attribute column stored WITH the index,
    predicate composed into the same pruned read as the bucket probe;
    ranking is among MATCHING candidates only."""
    idx = IVFVectorIndex(str(tmp_path / "idx"))
    withattr = corpus.withColumn(
        "parity", (F.col("vec_id") % 2).cast("int")
    )
    idx.bootstrap(spark, withattr, attr_cols=["parity"])
    q = spark.createDataFrame(
        [(999, [0.0, 1.0, 0.01, 0.0])],
        "vec_id long, embedding array<float>",
    )
    top = idx.topk(
        spark, q, k=10, nprobe=1, where=[("parity", "==", 0)]
    ).collect()
    # bucket 1 holds vec_ids 10..15; parity 0 -> {10, 12, 14}
    assert {r.cand_id for r in top} == {10, 12, 14}
    assert [r.rank for r in sorted(top, key=lambda r: r.rank)] == [1, 2, 3]
    # ranks are re-sequenced among matches (no gaps from filtered-out
    # higher-sim candidates) and still pruned to the probed partition
    prof = idx.assignments_store.last_prune_profile
    assert prof["segments_loaded"] == 1
    # reserved-name collision raises loudly
    with pytest.raises(ValueError, match="collide"):
        idx.bootstrap(spark, withattr, attr_cols=["norm"])
