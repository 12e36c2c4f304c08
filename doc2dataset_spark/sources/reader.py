"""URL-list readers (reference S1-S8, `reader.py:53-120`).

The reference reads the whole input on the driver, slices it into 10k-row
Arrow files under ``_tmp/`` and hands ``(shard_id, path)`` tuples to workers
(`reader.py:125-169`). Here the input *is* a DataFrame: Spark's scan
parallelism replaces the shard files, Catalyst prunes parquet columns
(the reference prunes by hand, `reader.py:103-110`), and gzip variants are
transparent through Hadoop codec inference (`reader.py:87-89`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doc2dataset_spark.config import DownloadConfig


def _column_list(cfg: DownloadConfig) -> list[str]:
    """Input projection (reference `reader.py:60-71`): additional columns +
    the verify-hash column + the url column. Deduplicated — a custom
    url_col or hash column also listed in save_additional_columns would
    otherwise be selected twice, and the later withColumnRenamed would
    rename BOTH copies into an ambiguous duplicate."""
    cols = list(cfg.save_additional_columns or [])
    if cfg.verify_hash is not None:
        cols.append(cfg.verify_hash[0])
    cols.append(cfg.url_col)
    return list(dict.fromkeys(cols))


def read_url_list(spark: SparkSession, cfg: DownloadConfig) -> DataFrame:
    """Scan the url list (any supported format, file or directory) into a
    DataFrame with the url column renamed to ``url`` and the verify-hash
    column renamed to its hash-type name (reference `reader.py:114-120`)."""
    fmt = cfg.input_format
    path = cfg.url_list
    if os.path.isdir(path):
        # directory scan (S8, `reader.py:53-58`): glob same-format files;
        # spark.read handles the glob natively, incl. .gz members
        path = os.path.join(path, f"*.{fmt}*")

    if fmt == "txt":
        # TRIM the value, not just the emptiness test: spark.read.text
        # strips only \n, so CRLF files would leave a trailing \r on every
        # url and every fetch would fail
        df = spark.read.text(path).select(
            F.trim(F.col("value")).alias(cfg.url_col)
        )
        df = df.filter(F.length(F.col(cfg.url_col)) > 0)
    elif fmt == "csv":
        df = spark.read.csv(path, header=True, inferSchema=False)
    elif fmt == "tsv":
        df = spark.read.csv(path, header=True, sep="\t", inferSchema=False)
    elif fmt == "json":
        df = spark.read.json(path, multiLine=True)
    elif fmt == "jsonl":
        df = spark.read.json(path)
    elif fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "orc":
        # ORC is Spark-native (same columnar pruning/pushdown path as
        # parquet); the reference's fsspec reader has no ORC branch — this
        # is an engine extension, validated by round-trip test
        df = spark.read.orc(path)
    elif fmt == "xml":
        # Spark 4 ships the XML datasource built in (rowTag splits the
        # document into rows); engine extension like ORC — the reference
        # has no XML branch. Row tag fixed to 'row' for url-list inputs.
        df = spark.read.format("xml").option("rowTag", "row").load(path)
    else:  # pragma: no cover - guarded by cfg.validate()
        raise ValueError(f"unknown input_format {fmt!r}")

    if fmt != "txt":
        # column pruning: explicit select so even non-parquet inputs carry
        # only what the pipeline needs (parquet pruning pushes to the scan)
        df = df.select(*_column_list(cfg))

    df = df.withColumnRenamed(cfg.url_col, "url")
    if cfg.verify_hash is not None:
        vh_col, vh_type = cfg.verify_hash
        if vh_col != vh_type:
            df = df.withColumnRenamed(vh_col, vh_type)
    return df
