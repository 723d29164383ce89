"""ANSI-mode certification pin.

The full registry ran green under ``spark.sql.ansi.enabled=true`` in
round 6 (158/158, oracle-matched where applicable) — ANSI turns the
silent null of division-by-zero / bad casts into runtime errors, so
this is the "no latent arithmetic landmines" check. Re-running all
158 here would double suite runtime; instead this pins the queries
whose expressions are structurally divide/cast-prone (guarded
divisions, ntile small-total branch, try_cast coercion, ratio
windows) under ANSI, toggled on the shared session (it is a runtime
conf) and always restored.
"""

from __future__ import annotations

import pytest

from calorista_spark.queries import ORACLES, QUERIES
from tests.oracle_compare import compare

ANSI_PINNED = [
    "order_price_quartiles_scalable",  # ntile_expr q=0 guard (ADVICE r5)
    "nation_revenue_share",            # share-of-total division
    "events_safe_coercion_report",     # try_cast string→double
    "doc_length_percentile_by_source", # percent_rank n_total-1 guard
    "corpus_epoch_plan",               # rate fraction + format cast
    "doc_lm_quality_score",            # log-domain divisions
]


@pytest.mark.parametrize("name", ANSI_PINNED)
def test_query_green_under_ansi(spark, sf_dir, name):
    prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        probs = compare(
            QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir
        )
        assert not probs, probs
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
