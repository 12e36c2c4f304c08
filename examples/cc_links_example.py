"""CC WAT link-mining example — the Spark-native twin of the reference's
`examples/get_pdf_links_from_cc.py:113-131`, hermetic instead of live-S3:
builds two synthetic WAT files plus a ``wat.paths.gz`` index, samples the
index, mines PDF links distributed, and writes the deduplicated url list
as parquet (the input format ``download()`` accepts).

Against a real crawl, only the three marked lines change (crawl root +
fsspec-installed s3):

    python examples/cc_links_example.py
"""

from __future__ import annotations

import gzip
import os
import random
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from doc2dataset_spark.session import get_spark
from doc2dataset_spark.sources import cc_wat

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from test_cc_wat import wat_record, write_wat  # noqa: E402

from pathlib import Path

if __name__ == "__main__":
    spark = get_spark(app_name="cc_links_example")
    root = Path(tempfile.mkdtemp(prefix="cc_links_"))

    # --- synthetic stand-in for s3://commoncrawl/crawl-data/*/wat.paths.gz
    write_wat(
        root / "a.wat.gz",
        [
            wat_record(
                "http://site-a.com/index.html",
                links=[{"url": "docs/paper.pdf"}, {"url": "http://cdn.com/x.pdf"}],
            )
        ],
    )
    write_wat(
        root / "b.wat.gz",
        [
            wat_record(
                "https://site-b.org/list.html",
                links=[{"url": "http://cdn.com/x.pdf"}, {"url": "/local/report.PDF"}],
            )
        ],
    )
    (root / "wat.paths.gz").write_bytes(gzip.compress(b"a.wat.gz\nb.wat.gz\n"))

    crawl_root = str(root)  # real run: "s3://commoncrawl/"
    index = os.path.join(crawl_root, "wat.paths.gz")
    wats = [os.path.join(crawl_root, p) for p in cc_wat.read_wat_index(index)]
    wats = random.sample(wats, k=len(wats))  # real run: sample wat_count of ~90k

    links = cc_wat.mine_links(spark, wats, suffix=".pdf")
    links.show(truncate=False)
    out = str(root / "pdf_links.parquet")
    links.write.mode("overwrite").parquet(out)
    n = spark.read.parquet(out).count()
    print(f"{n} unique pdf links -> {out}")
    assert n == 3

    # production upgrade over the reference's raw-string dedup: collapse
    # case/port/tracking-param spellings and budget the crawl per host
    canon = cc_wat.dedup_canonical(links)
    canon.show(truncate=False)
    cc_wat.host_stats(canon).orderBy("host").show(truncate=False)
