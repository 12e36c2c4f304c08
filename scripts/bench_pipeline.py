#!/usr/bin/env python
"""ETL pipeline throughput: docs/sec through the full download() path —
the reference's only performance currency (`logger.py:114`,
``img_per_sec = count / duration``).

Builds N_DOCS synthetic FAKEDOC documents (multi-page, image tags, the
fixture generator's content rules) served over file://, runs download()
end-to-end (fetch → extract → explode → filters → parquet sink + stats
manifest), and prints one JSON line:

    {"metric": "pipeline_docs_per_sec", "value": ..., "docs": N,
     "pages": ..., "wall_sec": ..., "sink": "parquet"}

Reference envelope for context: 256 fetch threads x 1 process
(`main.py:69-74`); here the same corpus flows through Spark tasks, so
the number is comparable order-of-magnitude, not thread-for-thread.

    python scripts/bench_pipeline.py [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

from fixtures import fakedoc, para  # noqa: E402

from doc2dataset_spark.config import DownloadConfig  # noqa: E402
from doc2dataset_spark.plans.pipeline import download  # noqa: E402
from doc2dataset_spark.session import get_spark  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
PAGES_PER_DOC = 4


def build_n(root: str, n_docs: int, tag: str) -> str:
    docs_dir = os.path.join(root, f"docs_{tag}")
    os.makedirs(docs_dir)
    rows = []
    for i in range(n_docs):
        pages = [
            f"<p>{para(25, i + p)}</p>"
            + ('<img width="100" height="100" src="x.png"/>' if p % 2 else "")
            for p in range(PAGES_PER_DOC)
        ]
        path = os.path.join(docs_dir, f"d{i:05d}.fake")
        with open(path, "wb") as f:
            f.write(fakedoc(pages))
        rows.append(f"file://{path}")
    url_list = os.path.join(root, f"urls_{tag}.csv")
    with open(url_list, "w") as f:
        f.write("url\n" + "\n".join(rows) + "\n")
    return url_list


def build(root: str) -> str:
    return build_n(root, N_DOCS, "main")


def main() -> None:
    spark = get_spark(app_name="bench_pipeline")
    root = tempfile.mkdtemp(prefix="bench_pipeline_")
    try:
        # warmup: a tiny end-to-end run so JVM startup + Python-worker
        # spawn + codegen aren't billed to the measured corpus (they cost
        # ~14 s cold and are once-per-cluster, not per-batch, in production)
        warm_urls = build_n(root, 20, "warm")
        download(
            spark,
            DownloadConfig(
                url_list=warm_urls,
                output_folder=os.path.join(root, "warm_out"),
                input_format="csv",
                output_format="dummy",
                min_words_per_page=5,
            ),
        )
        url_list = build(root)
        out = os.path.join(root, "out")
        cfg = DownloadConfig(
            url_list=url_list,
            output_folder=out,
            input_format="csv",
            output_format="parquet",
            min_words_per_page=5,
            count_words=True,
            number_sample_per_shard=500,
        )
        t0 = time.time()
        download(spark, cfg)
        wall = time.time() - t0
        pages = spark.read.parquet(os.path.join(out, "samples")).count()
        print(
            json.dumps(
                {
                    "metric": "pipeline_docs_per_sec",
                    "value": round(N_DOCS / wall, 1),
                    "docs": N_DOCS,
                    "pages": pages,
                    "wall_sec": round(wall, 2),
                    "sink": "parquet",
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
