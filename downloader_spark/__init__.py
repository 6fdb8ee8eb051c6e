"""downloader_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the dataflow semantics of
m-lab/downloader (an incremental fetch/dedup/publish archival pipeline),
extended with the relational + LLM-data-pipeline operator surface needed
to query the archived data at 100 TB scale.

Layout:
    session.py    SparkSession factory (local defaults, AQE, Arrow, UTC)
    io.py         loaders for the driver-generated parquet tables
    plans/        query registry: SURVEY.md §2 query-key -> (DataFrame fn, oracle SQL)
    operators/    reference-core + relational + LLM-pipeline operators
    sources/      ingest framework: stores, creation-log parsing, inventory
    functions/    cross-engine-exact scalar/aggregate helpers
    streaming/    Structured Streaming wrappers over the batch semantics
"""

__version__ = "0.1.0"
