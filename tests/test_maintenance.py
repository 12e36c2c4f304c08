"""Compaction maintenance op (round 6): many small files -> few
target-sized files, data identical, hive partitioning preserved,
transactional swap leaves no tmp debris."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from doc2dataset_spark.sinks.maintenance import compact_parquet
from doc2dataset_spark.session import load_table


def test_compact_merges_small_files_losslessly(spark, sf_dir, tmp_path):
    out = str(tmp_path / "frag")
    li = load_table(spark, sf_dir, "lineitem")
    # fragment: 40 tiny files
    li.repartition(40).write.parquet(out)
    before = sorted(map(tuple, spark.read.parquet(out).collect()))
    n_before = len(glob.glob(os.path.join(out, "*.parquet")))
    assert n_before >= 40

    stats = compact_parquet(spark, out, target_bytes=1 << 40)  # one file
    assert stats["files_before"] == n_before
    assert stats["files_after"] == 1
    after = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert after == before
    # no tmp/old debris next to the directory
    assert not [
        d for d in os.listdir(tmp_path) if "__compact" in d or "__old" in d
    ]


def test_compact_respects_target_size(spark, sf_dir, tmp_path):
    out = str(tmp_path / "frag")
    load_table(spark, sf_dir, "lineitem").repartition(32).write.parquet(out)
    total = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(out, "*.parquet"))
    )
    target = max(total // 4, 1)
    stats = compact_parquet(spark, out, target_bytes=target)
    # ceil(total/target) ~ 4-5 files (re-encoding shifts sizes slightly)
    assert 2 <= stats["files_after"] <= 8
    assert stats["files_after"] < stats["files_before"]


def test_compact_preserves_hive_partitions(spark, sf_dir, tmp_path):
    out = str(tmp_path / "part")
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "flag", F.col("l_returnflag")
    )
    li.repartition(12).write.partitionBy("flag").parquet(out)
    before = spark.read.parquet(out).groupBy("flag").count().collect()
    compact_parquet(spark, out, target_bytes=1 << 40, partition_by=["flag"])
    got = spark.read.parquet(out)
    after = got.groupBy("flag").count().collect()
    assert sorted(map(tuple, after)) == sorted(map(tuple, before))
    # partition dirs survived (pruning still works)
    assert any(
        d.startswith("flag=") for d in os.listdir(out) if not d.startswith("_")
    )


def test_schema_evolution_merge_read(spark, sf_dir, tmp_path):
    """Operational reality check: a long-lived corpus directory whose
    later batches added a column reads cleanly with mergeSchema — old
    rows surface NULL for the new column, and compaction unifies the
    layout under the merged schema."""
    out = str(tmp_path / "evolving")
    li = load_table(spark, sf_dir, "lineitem").limit(200)
    li.select("l_orderkey", "l_quantity").write.parquet(out)
    li.select(
        "l_orderkey", "l_quantity", F.lit("batch2").alias("provenance")
    ).write.mode("append").parquet(out)

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert "provenance" in merged.columns
    assert merged.count() == 400
    assert merged.filter(F.col("provenance").isNull()).count() == 200

    # compaction writes the merged schema everywhere
    compact_parquet(spark, out, target_bytes=1 << 40)
    flat = spark.read.parquet(out)
    assert "provenance" in flat.columns and flat.count() == 400
