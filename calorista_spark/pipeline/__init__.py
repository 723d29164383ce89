"""End-to-end pipelines (SURVEY §3): the reference's ETL + dashboard
restated as Spark jobs."""
