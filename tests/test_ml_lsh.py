"""Spark ML LSH cross-validation: the ML path must find the pairs the
exact (oracle-checked) pipeline confirms."""

from __future__ import annotations

from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.operators.ml_lsh import ml_ann_topk, ml_neardup_pairs
from calorista_spark.operators.similarity import (
    lsh_band_keys,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard,
)


def test_ml_minhash_finds_exact_pipeline_pairs(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    # ground truth: exact pipeline pairs with jaccard >= 0.9
    sig = minhash_signatures(docs, "doc_id", "text")
    cand = lsh_candidate_pairs(lsh_band_keys(sig, "doc_id", 4), "doc_id")
    truth = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard(cand, docs, "doc_id", "text")
        .filter(F.col("jaccard") >= 0.9)
        .collect()
    }
    assert truth, "corpus should contain injected near-dups"

    ml_pairs = {
        (r.id_a, r.id_b)
        for r in ml_neardup_pairs(docs, max_jaccard_distance=0.15).collect()
    }
    missed = truth - ml_pairs
    # probabilistic recall — allow a small miss rate, none expected
    assert len(missed) <= max(1, len(truth) // 10), f"ML LSH missed {missed}"


def test_ml_ann_includes_true_nearest(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    target = emb.filter(F.col("vec_id") == 0).collect()[0]
    neighbors = ml_ann_topk(emb, target.embedding, k=3).collect()
    ids = [r.vec_id for r in neighbors]
    assert ids[0] == 0  # the query vector itself is its own nearest
    assert len(ids) == 3
