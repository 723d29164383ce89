"""Aggregates every query module into the registry.

Importing this package populates ``QUERIES`` / ``ORACLES`` — the
surface consumed by ``__spark_entry__.py``, ``bench.py``, and the
parity tests.
"""

from calorista_spark.queries import advanced  # noqa: F401
from calorista_spark.queries import analytic_extra  # noqa: F401
from calorista_spark.queries import compression_drift  # noqa: F401
from calorista_spark.queries import core  # noqa: F401
from calorista_spark.queries import corpus_layout  # noqa: F401
from calorista_spark.queries import corpus_e2e  # noqa: F401
from calorista_spark.queries import corpus_lm  # noqa: F401
from calorista_spark.queries import corpus_sampling  # noqa: F401
from calorista_spark.queries import corpus_novelty  # noqa: F401
from calorista_spark.queries import curation_extra  # noqa: F401
from calorista_spark.queries import curation_pipeline  # noqa: F401
from calorista_spark.queries import incremental_admission  # noqa: F401
from calorista_spark.queries import llm  # noqa: F401
from calorista_spark.queries import lm_scoring  # noqa: F401
from calorista_spark.queries import multimodal_codec  # noqa: F401
from calorista_spark.queries import product_analytics  # noqa: F401
from calorista_spark.queries import profiling  # noqa: F401
from calorista_spark.queries import quality_audit  # noqa: F401
from calorista_spark.queries import relational  # noqa: F401
from calorista_spark.queries import retrieval_decontam  # noqa: F401
from calorista_spark.queries import scalable_ranks  # noqa: F401
from calorista_spark.queries import reshape_dedup  # noqa: F401
from calorista_spark.queries import semistructured  # noqa: F401
from calorista_spark.queries import snapshot_diff  # noqa: F401
from calorista_spark.queries import sql_api  # noqa: F401
from calorista_spark.queries import store_sql_api  # noqa: F401
from calorista_spark.queries import streaming_windows  # noqa: F401
from calorista_spark.queries import table_format  # noqa: F401
from calorista_spark.queries import data_pipeline  # noqa: F401
from calorista_spark.queries import distribution  # noqa: F401
from calorista_spark.queries import text_embed_extra  # noqa: F401
from calorista_spark.queries import timeseries  # noqa: F401
from calorista_spark.queries import tpch_more  # noqa: F401
from calorista_spark.queries import tpch_rest  # noqa: F401
from calorista_spark.queries import udf_surface  # noqa: F401
from calorista_spark.queries import vector_index  # noqa: F401
from calorista_spark.queries import vector_index_pq  # noqa: F401
from calorista_spark.queries import vector_pq  # noqa: F401
from calorista_spark.queries import windows_extra  # noqa: F401
from calorista_spark.queries.registry import ORACLES, QUERIES  # noqa: F401
