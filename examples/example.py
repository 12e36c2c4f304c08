"""End-to-end ETL example — the Spark-native twin of the reference's
`examples/example.py` (doc2dataset reference, examples/example.py:1-47),
hermetic instead of live-URL: builds a synthetic corpus of FAKEDOC
documents, writes a url list, runs download(), prints the stats roll-up.

    python examples/example.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from doc2dataset_spark.config import DownloadConfig
from doc2dataset_spark.plans.pipeline import download
from doc2dataset_spark.session import get_spark

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from fixtures import build_corpus, write_url_csv  # noqa: E402

if __name__ == "__main__":
    spark = get_spark(app_name="example")
    root = tempfile.mkdtemp(prefix="doc2dataset_example_")
    meta = build_corpus(root)
    url_list = write_url_csv(root, meta)

    cfg = DownloadConfig(
        url_list=url_list,
        input_format="csv",
        output_folder=os.path.join(root, "out"),
        output_format="parquet",
        number_sample_per_shard=4,
        min_words_per_page=5,
        get_language=True,
        compute_hash="sha256",
        save_additional_columns=["caption"],
    )
    t0 = time.time()
    pages, stats, summary = download(spark, cfg, return_frames=True)
    print(f"wall: {time.time() - t0:.1f}s")
    summary.show(truncate=False)
    pages.groupBy("status").count().show()
    print("samples at:", os.path.join(cfg.output_folder, "samples"))
