"""Spark ML LSH variants (SURVEY §2.11 L2/L3 alternatives).

The hand-rolled minhash/LSH in ``similarity.py`` is the
oracle-checkable path (portable hashing). These wrappers expose the
Spark ML equivalents — ``MinHashLSH.approxSimilarityJoin`` for
near-dup pairs and ``BucketedRandomProjectionLSH`` for ANN — which use
JVM-internal hash families (not reproducible in DuckDB, so they are
rows-only-checked) but come with battle-tested implementations and
``numHashTables`` tuning.

Cross-validation: ``tests/test_ml_lsh.py`` checks the ML path finds
the same high-Jaccard pairs as the exact pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from calorista_spark.operators.similarity import shingles


def ml_neardup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hash_tables: int = 8,
    max_jaccard_distance: float = 0.2,
    num_features: int = 1 << 18,
) -> DataFrame:
    """L2 via Spark ML: shingle → HashingTF (binary) → MinHashLSH →
    approxSimilarityJoin. Returns (id_a, id_b, jaccard_distance)
    with id_a < id_b. Fixed seed → deterministic within Spark."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sets = docs.select(
        F.col(id_col), F.array_distinct(shingles(text_col, n)).alias("sh")
    ).filter(F.size("sh") > 0)
    tf = HashingTF(
        inputCol="sh", outputCol="features", numFeatures=num_features, binary=True
    )
    feats = tf.transform(sets)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42
    )
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, max_jaccard_distance, distCol="jaccard_distance"
    )
    return (
        joined.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            "jaccard_distance",
        )
    )


def ml_ann_topk(
    emb: DataFrame,
    query_vec,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
) -> DataFrame:
    """L3 via Spark ML: BucketedRandomProjectionLSH approx nearest
    neighbors (Euclidean). The exact cosine top-k in similarity.py is
    the correctness baseline; this is the sub-linear candidate path."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.linalg import Vectors

    feats = emb.select(
        F.col(id_col), array_to_vector(F.col(vec_col)).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(feats)
    key = Vectors.dense([float(x) for x in query_vec])
    return model.approxNearestNeighbors(feats, key, k, distCol="euclidean_distance")
