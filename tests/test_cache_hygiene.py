"""Cache-hygiene epilogue (r7): persisting queries must leave ZERO
persistent RDDs behind once the runner's release_caches() epilogue
runs — the contract bench.py relies on for no-net-cache-growth over
the full registry."""

from __future__ import annotations

from calorista_spark.cache import cached_rdd_count, release_caches
from calorista_spark.queries import QUERIES

# one representative per persisting family: two-pass rank
# (tracked_persist in operators/ranks.py), the thrice-consumed
# LM-scores frame, and an iterative localCheckpoint user
_PERSISTING = [
    "customer_revenue_pareto",
    "doc_ccnet_buckets",
    "doc_neardup_groups",
]


def test_release_caches_after_each_query(spark, sf_dir):
    for name in _PERSISTING:
        if name not in QUERIES:
            continue
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        assert cached_rdd_count(spark) > 0, f"{name}: expected a persist"
        release_caches(spark)
        assert cached_rdd_count(spark) == 0, f"{name}: cache not reclaimed"


def test_release_caches_is_idempotent(spark):
    release_caches(spark)
    assert cached_rdd_count(spark) == 0
    release_caches(spark)
    assert cached_rdd_count(spark) == 0


def test_results_identical_after_release(spark, sf_dir):
    """Releasing between queries must not change results (persist is
    pinned-evaluation, not semantics): run a rank-family query twice
    with a release in between and compare."""
    name = "customer_revenue_pareto"
    r1 = [tuple(r) for r in QUERIES[name](spark, sf_dir).collect()]
    release_caches(spark)
    r2 = [tuple(r) for r in QUERIES[name](spark, sf_dir).collect()]
    release_caches(spark)
    assert r1 == r2
