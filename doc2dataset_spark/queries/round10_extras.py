"""Round-10 queries: complete the detector-evaluation family and the
winnowing warm path (round-9 verdict, Next round #3/#8).

- ``dedup_simhash_recall``        SimHash hamming<=3 band detector judged
                                  against exact shingle-Jaccard >= 0.5
- ``dedup_embedding_cell_recall`` SemDeDup cell blocking judged against
                                  the exact tiled cosine >= 0.4 pair set
- ``dedup_winnow_indexed``        dedup_winnow served from the persisted
                                  winnowed-fingerprint postings index

With these, every approximate near-dup detector in the registry
(MinHash LSH, winnowing, SimHash, embedding cells) ships an oracle-gated
precision/recall row — a parameter change that silently costs recall
fails the driver hash, not a human review. Reference parity: the
reference pipeline has no dedup at all beyond URL dropDuplicates
(/root/reference/examples/get_pdf_links_from_cc.py:126); this family is
part of the training-data-pipeline surface the brief makes first-class.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from doc2dataset_spark.queries.core import REGISTRY, query
from doc2dataset_spark.queries.round9_extras import _detector_recall_oracle

# the exact-cosine detector threshold (dedup.dedup_embedding_cosine's
# declared semantics — pairs with cosine >= this are true near-dups)
EMB_COS_THRESHOLD = 0.4


def detector_recall_frame(wq, eq):
    """(n_detector, n_exact, n_both, precision, recall) — one row: the
    detector pair set ``wq`` judged against the ground-truth pair set
    ``eq`` (both (da, db) frames). The single Spark-side definition of
    the detector-evaluation row (round9_extras' winnow/minhash rows
    predate it and keep their inlined twins for gate stability; the
    column recipe is identical). Composition-only plan: one full outer
    join on the pair key + one aggregate row."""
    j = wq.withColumn("in_w", F.lit(True)).join(
        eq.withColumn("in_e", F.lit(True)),
        ["da", "db"],
        "full",
    ).select(
        F.coalesce("in_w", F.lit(False)).alias("in_w"),
        F.coalesce("in_e", F.lit(False)).alias("in_e"),
    )
    return j.agg(
        F.sum(F.col("in_w").cast("int")).cast("bigint").alias("n_detector"),
        F.sum(F.col("in_e").cast("int")).cast("bigint").alias("n_exact"),
        F.sum((F.col("in_w") & F.col("in_e")).cast("int"))
        .cast("bigint")
        .alias("n_both"),
        F.round(
            F.sum((F.col("in_w") & F.col("in_e")).cast("int")).cast("double")
            / F.sum(F.col("in_w").cast("int")),
            4,
        ).alias("precision"),
        F.round(
            F.sum((F.col("in_w") & F.col("in_e")).cast("int")).cast("double")
            / F.sum(F.col("in_e").cast("int")),
            4,
        ).alias("recall"),
    )


@query(
    "dedup_simhash_recall",
    oracle=None,  # assigned below: composes both detectors' own oracles
    tags=("dedup", "documents", "eval"),
)
def dedup_simhash_recall(spark, sf_dir):
    """Detector evaluation for SimHash: the hamming<=3 banded pair set
    judged against exact shingle-Jaccard >= 0.5 ground truth. Unlike
    MinHash (which estimates Jaccard directly), SimHash's fingerprint
    approximates COSINE over token-frequency vectors — so both its
    precision and its recall against the Jaccard truth are informative
    and neither is 1.0 by construction: precision exposes
    cosine-close-but-Jaccard-far false positives, recall exposes
    Jaccard-close pairs whose frequency profiles differ enough to flip
    >3 fingerprint bits. Pinning both means a banding or bit-width
    change that shifts either direction fails the driver hash."""
    from doc2dataset_spark.queries.dedup import (
        dedup_ngram_jaccard,
        dedup_simhash_pairs,
    )

    wq = dedup_simhash_pairs(spark, sf_dir).select("da", "db")
    eq = dedup_ngram_jaccard(spark, sf_dir).select("da", "db")
    return detector_recall_frame(wq, eq)


REGISTRY["dedup_simhash_recall"].oracle = _detector_recall_oracle(
    REGISTRY["dedup_simhash_pairs"].oracle,
    REGISTRY["dedup_ngram_jaccard"].oracle,
)


@query(
    "dedup_embedding_cell_recall",
    oracle=None,  # assigned below
    tags=("dedup", "embeddings", "eval"),
)
def dedup_embedding_cell_recall(spark, sf_dir):
    """Detector evaluation for SemDeDup cell blocking: the cell-blocked
    pair set AT the exact detector's threshold (cosine >= 0.4 — the
    cell query's own 0.3 floor is a wider net; pairs in [0.3, 0.4) are
    not near-dups under the ground-truth semantics and are excluded
    from the detector side rather than counted as false positives)
    judged against the exact tiled O(n^2) cosine >= 0.4 pair set.
    Within-cell cosines are exact, so precision is 1.0 by construction;
    recall IS the blocking loss — the fraction of true near-dup pairs
    split across cell boundaries, the number the SemDeDup recipe trades
    for its O(n^2/K) pair space. A centroid-count or assignment change
    that moves it fails the driver hash."""
    from doc2dataset_spark.queries.dedup import (
        dedup_embedding_cell,
        dedup_embedding_cosine,
    )

    wq = (
        dedup_embedding_cell(spark, sf_dir)
        .filter(F.col("cos") >= EMB_COS_THRESHOLD)
        .select(F.col("va").alias("da"), F.col("vb").alias("db"))
    )
    eq = dedup_embedding_cosine(spark, sf_dir).select(
        F.col("va").alias("da"), F.col("vb").alias("db")
    )
    return detector_recall_frame(wq, eq)


REGISTRY["dedup_embedding_cell_recall"].oracle = _detector_recall_oracle(
    f"""SELECT va AS da, vb AS db
    FROM ({REGISTRY["dedup_embedding_cell"].oracle})
    WHERE cos >= {EMB_COS_THRESHOLD}""",
    f"""SELECT va AS da, vb AS db
    FROM ({REGISTRY["dedup_embedding_cosine"].oracle})""",
)


@query(
    "dedup_winnow_indexed",
    oracle=REGISTRY["dedup_winnow"].oracle,
    tags=("dedup", "documents", "index"),
)
def dedup_winnow_indexed(spark, sf_dir):
    """dedup_winnow served from the PERSISTED winnowed-fingerprint
    postings (operators/winnow_index.py — the fourth persisted-index
    lifecycle): df pruning, per-doc counts, the fp-blocked self-join,
    and the fingerprint-set Jaccard all run over the index files alone;
    the corpus is never scanned at serve time. First call per corpus
    builds the index into a content-keyed temp cache (what a deployment
    does at ingest); subsequent calls never recompute a fingerprint.
    batch_id partitioning is the incremental seam (new_batch_pairs).
    Identical oracle — fingerprints are the exact winnow_fingerprints
    expressions, so index-served pairs are hash-identical to the
    in-query path (the shared pairs_from_postings scoring)."""
    from doc2dataset_spark.fsio import artifact_cache_dir, ensure_local_cache_dir
    from doc2dataset_spark.operators.winnow_index import (
        build_winnow_index,
        pairs_from_postings,
        read_postings,
    )

    idx = ensure_local_cache_dir(
        artifact_cache_dir(sf_dir, "wn", "documents"),
        "postings",
        lambda tmp: build_winnow_index(spark, sf_dir, tmp),
    )
    return pairs_from_postings(read_postings(spark, idx).cache())
