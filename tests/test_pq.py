"""Product-quantization family: trainer determinism, bit-exact code
parity against a numpy reference, ADC ranking quality, and null
totality.

The recall pins are deliberately rank-based, not recall-based: the
synthetic embeddings are isotropic (top-10 margin ≈ 3% of the
distance scale), so high recall@10 is information-theoretically out
of reach for ANY 8-byte-code quantizer on this corpus — see the
honesty note in queries/vector_pq.py."""

from __future__ import annotations

import numpy as np
import pytest

from calorista_spark.operators.pq import train_pq_codebook
from calorista_spark.queries import QUERIES
from calorista_spark.queries.vector_pq import _CB, PQ_QUERY_VEC


def _load(sf_dir):
    import duckdb

    rows = duckdb.sql(
        "SELECT vec_id, embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet') "
        "WHERE embedding IS NOT NULL ORDER BY vec_id"
    ).fetchall()
    return (
        np.array([r[0] for r in rows]),
        np.array([r[1] for r in rows], dtype=np.float64),
    )


def _numpy_codes_recon(X):
    """Reference implementation of the quantized assign path: integer
    micro-unit distances, argmin first-index ties."""
    m, k, dsub = _CB.shape
    codes = np.empty((len(X), m), dtype=int)
    recon = np.zeros(len(X), dtype=np.int64)
    for j in range(m):
        sub = X[:, j * dsub : (j + 1) * dsub]
        d2 = ((sub[:, None, :] - _CB[j][None, :, :]) ** 2).sum(axis=2)
        dq = np.floor(d2 * 1e6 + 0.5).astype(np.int64)
        codes[:, j] = dq.argmin(axis=1)
        recon += dq.min(axis=1)
    return codes, recon


def test_trainer_is_deterministic_and_validates():
    rng = np.random.default_rng(7)
    X = rng.normal(size=(200, 16))
    a = train_pq_codebook(X, m=4, k=8, iters=10)
    b = train_pq_codebook(X.copy(), m=4, k=8, iters=10)
    assert np.array_equal(a, b)
    with pytest.raises(ValueError):
        train_pq_codebook(X, m=5, k=8)  # 16 % 5 != 0
    with pytest.raises(ValueError):
        train_pq_codebook(X[:4], m=4, k=8)  # n < k


def test_training_beats_naive_init():
    rng = np.random.default_rng(11)
    X = rng.normal(size=(300, 16))
    cb = train_pq_codebook(X, m=4, k=8, iters=20)

    def recon(cents_per_sub):
        total = 0.0
        for j in range(4):
            sub = X[:, j * 4 : (j + 1) * 4]
            d2 = ((sub[:, None, :] - cents_per_sub[j][None, :, :]) ** 2).sum(
                axis=2
            )
            total += d2.min(axis=1).mean()
        return total

    naive = np.stack([X[:8, j * 4 : (j + 1) * 4] for j in range(4)])
    assert recon(cb) < recon(naive)


def test_codes_match_numpy_reference(spark, sf_dir):
    ids, X = _load(sf_dir)
    codes, recon = _numpy_codes_recon(X)
    got = {
        r.vec_id: (r.pq_codes, r.recon_err_q)
        for r in QUERIES["embedding_pq_codes"](spark, sf_dir).collect()
        if r.pq_codes is not None
    }
    assert len(got) == len(ids)
    for i, vid in enumerate(ids):
        want = "-".join(str(c) for c in codes[i])
        assert got[vid] == (want, recon[i]), vid


def test_adc_topk_ranking_quality(spark, sf_dir):
    ids, X = _load(sf_dir)
    q = np.array(PQ_QUERY_VEC)
    exact = ((X - q) ** 2).sum(axis=1)
    rank_of = np.empty(len(X))
    rank_of[np.argsort(exact, kind="stable")] = np.arange(len(X))
    rows = QUERIES["embedding_topk_pq_adc"](spark, sf_dir).collect()
    assert len(rows) == 10
    sel = [np.where(ids == r.vec_id)[0][0] for r in rows]
    # ADC's picks live in the nearest ~20% of the exact ranking even
    # on this isotropic corpus (random picks would average 50%)
    assert rank_of[sel].mean() / len(X) < 0.3
    # exact top-1 overlap isn't guaranteed, but some of the exact
    # top-10 must appear
    exact_top10 = set(ids[np.argsort(exact, kind="stable")[:10]])
    assert len(exact_top10 & {r.vec_id for r in rows}) >= 1
    # the rider column is the true quantized distance
    for r in rows:
        i = np.where(ids == r.vec_id)[0][0]
        assert r.exact_dist_q == int(np.floor(exact[i] * 1e6 + 0.5))


def test_null_embedding_totality(spark):
    """Null totality: whole-null AND element-null vectors (r9, ADVICE
    r8) both yield NULL codes/error — never a truncated codes string
    from concat_ws silently skipping null per-subspace codes — and
    neither is servable by the top-k path."""
    m_dim = _CB.shape[0] * _CB.shape[2]
    df = spark.createDataFrame(
        [(1, [0.1] * m_dim), (2, None), (3, [0.1] * (m_dim - 1) + [None])],
        "vec_id long, embedding array<float>",
    )
    import calorista_spark.catalog as catalog

    orig = catalog.read_table
    try:
        catalog.read_table = (
            lambda _s, _d, name, **kw: df if name == "embeddings" else orig(_s, _d, name, **kw)
        )
        # queries modules bind read_table at import; patch theirs too
        import calorista_spark.queries.vector_pq as vq

        vq.read_table = catalog.read_table
        rows = {
            r.vec_id: r for r in QUERIES["embedding_pq_codes"](spark, "unused").collect()
        }
        assert rows[1].pq_codes is not None and rows[1].recon_err_q is not None
        assert rows[2].pq_codes is None and rows[2].recon_err_q is None
        # element-null: NULL out, not a truncated '0-3-...' fragment
        assert rows[3].pq_codes is None and rows[3].recon_err_q is None
        topk = QUERIES["embedding_topk_pq_adc"](spark, "unused").collect()
        assert [r.vec_id for r in topk] == [1]
    finally:
        catalog.read_table = orig
        import calorista_spark.queries.vector_pq as vq

        vq.read_table = orig


def test_ivfpq_prunes_and_broadcasts(spark, sf_dir):
    """IVFPQ must (a) return results from <= NPROBE cells, (b) rank
    candidates by the same ADC order the pure-ADC query uses within
    those cells, and (c) broadcast the probe list (plan-asserted)."""
    from calorista_spark.queries.vector_pq import _NPROBE

    df = QUERIES["embedding_topk_ivfpq"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 10
    assert len({r.label for r in rows}) <= _NPROBE
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # within the probed cells, ADC order must agree with the pure-ADC
    # ranking restricted to those cells
    adc_all = {
        r.vec_id: r.adc_dist_q
        for r in QUERIES["embedding_topk_pq_adc"](spark, sf_dir).collect()
    }
    for r in rows:
        if r.vec_id in adc_all:
            assert adc_all[r.vec_id] == r.adc_dist_q


def test_pq_recall_self_eval_shape(spark, sf_dir):
    """One row (hits, k); both rankings are TakeOrdered, the overlap
    is a broadcast semi-join — no cartesian, no global sort."""
    df = QUERIES["embedding_pq_recall"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 1
    hits, k = rows[0].hits, rows[0].k
    assert k == 10 and 0 <= hits <= k
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_rerank_recovers_recall(spark, sf_dir):
    """The two-stage serve must beat (or tie) raw ADC on recall@10 —
    the exact re-rank can only promote true neighbors that the
    shortlist already contains."""
    ids, X = _load(sf_dir)
    q = np.array(PQ_QUERY_VEC)
    exact = ((X - q) ** 2).sum(axis=1)
    exact_top10 = set(ids[np.argsort(exact, kind="stable")[:10]])
    adc_hits = exact_top10 & {
        r.vec_id
        for r in QUERIES["embedding_topk_pq_adc"](spark, sf_dir).collect()
    }
    rr_rows = QUERIES["embedding_topk_pq_rerank"](spark, sf_dir).collect()
    rr_hits = exact_top10 & {r.vec_id for r in rr_rows}
    assert len(rr_hits) >= len(adc_hits), (rr_hits, adc_hits)
    assert len(rr_hits) >= 3  # shortlist-50 recovers a real share here
    # output is ordered by true distance
    dists = [r.exact_dist_q for r in rr_rows]
    assert dists == sorted(dists)

def test_sdc_tables_and_udf_match_bruteforce(spark):
    """SDC (r14): the k×k-per-subspace tables equal the brute
    centroid-pair distances under the family's micro-unit floor, and
    the Arrow gather UDF reproduces Σ_j T_j[a_j][b_j] exactly."""
    import numpy as np

    from calorista_spark.operators.pq import (
        sdc_dist_udf,
        sdc_tables,
        train_pq_codebook,
    )

    rng = np.random.RandomState(5)
    X = rng.randn(64, 8)
    cb = train_pq_codebook(X, m=2, k=4)
    T = sdc_tables(cb)
    for j in range(2):
        for a in range(4):
            for b in range(4):
                acc = 0.0
                for x, y in zip(cb[j, a], cb[j, b]):
                    dlt = x - y
                    acc = acc + dlt * dlt
                assert T[j][a][b] == int(np.floor(acc * 1e6 + 0.5))
            assert T[j][a][a] == 0
    udf = sdc_dist_udf(T)
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [([0, 1], [3, 2]), ([1, 1], [1, 1]), (None, [0, 0]), ([0], [0, 0])],
        "a array<int>, b array<int>",
    ).select(F.expr("a"), F.expr("b"))
    got = [r[0] for r in df.select(udf("a", "b")).collect()]
    assert got[0] == T[0][0][3] + T[1][1][2]
    assert got[1] == 0
    assert got[2] is None and got[3] is None  # totality
