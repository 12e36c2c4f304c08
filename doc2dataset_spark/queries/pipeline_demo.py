"""The document-ETL pipeline as a registered query (rows-only check — the
oracle cannot fetch files, but the driver smoke-verifies schema + rows).

Runs the full reference dataflow — url csv → fetch(file://) → decode →
page explode → native filters → hash/language enrichment — over a
deterministic FAKEDOC fixture corpus generated under /tmp.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from doc2dataset_spark.config import DownloadConfig
from doc2dataset_spark.plans.pipeline import build_pipeline
from doc2dataset_spark.queries.core import query

_FIXTURE_ROOT = "/tmp/doc2dataset_spark_fixture_corpus"


def _ensure_corpus() -> str:
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from tests.fixtures import build_corpus, write_url_csv

    os.makedirs(_FIXTURE_ROOT, exist_ok=True)
    meta = build_corpus(_FIXTURE_ROOT)
    write_url_csv(_FIXTURE_ROOT, meta)
    return os.path.join(_FIXTURE_ROOT, "urls.csv")


@query("pipeline_etl_e2e", oracle=None, tags=("pipeline",))
def pipeline_etl_e2e(spark, sf_dir):
    """flagship ETL dataflow on the hermetic corpus; returns per-page rows
    with status taxonomy, word counts, image counts, hashes, language."""
    url_csv = _ensure_corpus()
    cfg = DownloadConfig(
        url_list=url_csv,
        output_folder="/tmp/doc2dataset_spark_fixture_out",
        input_format="csv",
        save_additional_columns=["caption"],
        verify_hash=("sha256", "sha256"),
        compute_hash="sha256",
        min_words_per_page=5,
        max_images_per_page=4,
        min_image_size=5,
        max_aspect_ratio=3.0,
        get_language=True,
        thread_count=8,
        number_sample_per_shard=4,
    )
    pages = build_pipeline(spark, cfg)
    return pages.select(
        F.element_at(F.split("url", "/"), -1).alias("doc"),
        "page_no",
        "status",
        "error_message",
        "total_words",
        "images_per_page",
        "language",
        "sha256",
        "key",
    )
