"""End-to-end pipeline assembly."""

from doc2dataset_spark.plans.pipeline import build_pipeline, download  # noqa: F401
