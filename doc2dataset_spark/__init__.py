"""doc2dataset_spark — a PySpark-native document-ETL + analytics engine.

A from-scratch re-expression of the capabilities of marianna13/doc2dataset
(reference surveyed in SURVEY.md) on Apache Spark: the document download /
extract / filter / write dataflow becomes one declarative DataFrame lineage
(Catalyst-optimized, Arrow-vectorized UDFs only where Spark built-ins cannot
express the semantics), plus the relational / dedup / similarity / text-
analysis query surface a large-scale training-data pipeline needs.

Layout:
    session     — SparkSession factory (local + cluster-ready defaults)
    config      — pipeline configuration dataclass + validation
    sources/    — url-list readers (txt/csv/tsv/json/jsonl/parquet, .gz),
                  HTTP/file fetch operator (mapInPandas + thread pool)
    functions/  — scalar/text/hash/langid/similarity column functions
    operators/  — sharding & keys, extraction, filters, dedup, similarity,
                  text analysis, relational query builders
    sinks/      — parquet / jsonl / files / webdataset / tfrecord / dummy
                  writers + stats manifest
    plans/      — the end-to-end download() pipeline assembly
    streaming/  — structured-streaming analogs (tumbling windows, sessions)
    queries/    — the declared query surface (SURVEY §2.3) with DuckDB oracles
"""

from doc2dataset_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
