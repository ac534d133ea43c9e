"""tia_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, idiomatic-Spark engine providing the query and data-processing
capabilities of the ``dendihandian/tia-data-pipeline`` reference (REST/JSON
ingestion semantics, record normalization, idempotent keyed loads, event-time
windows, enrichment joins / grouped counts), extended with LLM-data-pipeline
operators (exact/fuzzy dedup, embedding similarity search, text analysis,
multimodal columns, streaming windows) — every operator expressed through the
DataFrame/SQL API so Catalyst + Tungsten pick the physical strategy and the
same plan scales from local[32] to a 1000-executor cluster.

Layout:
    session     SparkSession factory (UTC, AQE, Arrow)
    catalog     named-table loading over the parquet corpus
    functions/  column-level functions (text metrics, hashing, vectors)
    operators/  relational + LLM-pipeline operators (dedup, similarity, windows)
    sources/    ingestion sources (REST, JSON, JDBC) and sinks
    plans/      the declared-query contract (SURVEY.md §2.6)
    streaming/  Structured Streaming forms of the incremental pipelines
"""

from tia_data_pipeline_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
