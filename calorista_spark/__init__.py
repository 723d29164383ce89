"""calorista_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
ETL/dashboard system (see SURVEY.md) as idiomatic Spark: DataFrame/SQL
declarative plans optimized by Catalyst, partitioned columnar storage,
Structured Streaming for incremental ingest, and LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB scale.

Layout:
    session     — SparkSession factory with scale-oriented defaults
    catalog     — test-table catalog (parquet star schema + events/docs/embeddings)
    schemas     — enforced StructTypes for the reference's record types
    functions/  — scalar column expressions (dates, text, numeric, vectors, json)
    operators/  — relational + LLM operators (dedup, merge, reshape, joins,
                  windows, similarity, textstats, multimodal)
    sources/    — connectors (REST w/ file fake, nested-payload normalizer, parquet IO)
    streaming/  — incremental ingest, watermarked dedup, windowed aggregation
    pipeline/   — the end-to-end food-entries ETL restated on Spark
    queries     — the SURVEY §2 query set, (spark, sf_dir) -> DataFrame
    oracles     — DuckDB ANSI-SQL equivalents for the correctness gate
"""

__version__ = "0.1.0"
