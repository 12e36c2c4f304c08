#!/usr/bin/env python
"""ANN recall characterization over any embeddings dir (round-5 verdict,
Next round #6): mean recall of each ANN variant against the exact k-NN
truth, on both the driver's near-uniform vectors and the clustered
fixture, so the index defaults are justified on realistic data.

    python scripts/ann_recall_sweep.py [sf_dir_or_fixture ...]

With no args: sweeps /root/testdata/sf0.1 (uniform) and a freshly
generated clustered fixture (scripts/make_clustered_embeddings.py
defaults) side by side. Prints one markdown table row per (corpus,
variant).
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def _mean_recall_frame(df) -> float:
    return round(
        df.agg(F.avg("recall").alias("r")).collect()[0]["r"], 4
    )


def _recall_vs_truth(spark, sf_dir, ann_df, k: int) -> float:
    """recall@k of an (qid, cid) ANN frame against the exact kNN graph."""
    from doc2dataset_spark.queries.curation_extras import _knn_graph

    truth = _knn_graph(spark, sf_dir).select("qid", "cid")
    ann = ann_df.select(
        F.col("qid").alias("aqid"), F.col("cid").alias("acid")
    )
    hits = truth.join(
        ann,
        (F.col("qid") == F.col("aqid")) & (F.col("cid") == F.col("acid")),
        "left",
    )
    per_q = hits.groupBy("qid").agg(
        (F.count("acid") / float(k)).alias("recall")
    )
    return _mean_recall_frame(per_q)


def sweep(spark, sf_dir: str, corpus_label: str) -> list[tuple]:
    from doc2dataset_spark.queries import REGISTRY
    from doc2dataset_spark.queries.scale import IVF_TOP_K

    rows = []
    # IVF nprobe=1: the registered per-query recall eval
    r1 = _mean_recall_frame(
        REGISTRY["ann_recall_eval"].builder(spark, sf_dir)
    )
    rows.append((corpus_label, "ivf nprobe=1", "recall@3", r1))
    # IVF nprobe=2: probe2 output against the same truth
    r2 = _recall_vs_truth(
        spark,
        sf_dir,
        REGISTRY["sim_ann_ivf_probe2"].builder(spark, sf_dir),
        IVF_TOP_K,
    )
    rows.append((corpus_label, "ivf nprobe=2", "recall@3", r2))
    # hyperplane LSH (8 planes): same truth, top-3 output
    rh = _recall_vs_truth(
        spark,
        sf_dir,
        REGISTRY["sim_ann_hyperplane"].builder(spark, sf_dir),
        3,
    )
    rows.append((corpus_label, "hyperplane lsh", "recall@3", rh))
    # PQ ADC and IVF-PQ: registered per-query recall@5 eval
    rpq = _mean_recall_frame(
        REGISTRY["ann_pq_recall"].builder(spark, sf_dir)
    )
    rows.append((corpus_label, "pq adc (trained)", "recall@5", rpq))
    return rows


def main() -> None:
    from doc2dataset_spark.session import get_spark
    from scripts.make_clustered_embeddings import make_clustered_embeddings

    spark = get_spark(app_name="ann-recall-sweep")
    targets: list[tuple[str, str]] = []
    if len(sys.argv) > 1:
        targets = [(d, d) for d in sys.argv[1:]]
    else:
        tmp = tempfile.mkdtemp(prefix="clustered_emb_")
        make_clustered_embeddings(tmp)
        targets = [
            ("/root/testdata/sf0.1", "uniform sf0.1 (n=2000)"),
            (tmp, "clustered (n=2000, k=24, sigma=0.35)"),
        ]

    print("| corpus | variant | metric | mean |")
    print("|---|---|---|---|")
    for sf_dir, label in targets:
        for _, variant, metric, val in sweep(spark, sf_dir, label):
            print(f"| {label} | {variant} | {metric} | {val} |")


if __name__ == "__main__":
    main()
