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
from doc2dataset_spark.session import load_table

# the exact-cosine detector threshold — imported from dedup.py (one
# definition shared by the ground-truth query, its oracle, and this
# evaluation row, so they cannot silently diverge)
from doc2dataset_spark.queries.dedup import EMB_COS_THRESHOLD  # noqa: E402


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


# deterministic 10% holdout: md5-hash bucket 0 of 10 (the hash split a
# real pipeline uses so membership is stable under re-runs and appends)
SPLIT_BUCKETS = 10
_SPLIT_SPARK = (
    "pmod(cast(conv(substring(md5(cast(doc_id AS string)), 1, 12), 16, 10) "
    f"AS bigint), {SPLIT_BUCKETS}) = 0"
)
_SPLIT_DUCK = (
    "('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT "
    f"% {SPLIT_BUCKETS} = 0"
)


def _split_leakage_oracle(exact_oracle: str) -> str:
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT da, db FROM ({exact_oracle})
),
s AS MATERIALIZED (
  SELECT doc_id, {_SPLIT_DUCK} AS hold FROM documents
),
f AS MATERIALIZED (
  SELECT p.da, p.db, sa.hold AS ha, sb.hold AS hb
  FROM pairs p
  JOIN s sa ON sa.doc_id = p.da
  JOIN s sb ON sb.doc_id = p.db
),
leaked AS (
  SELECT count(DISTINCT doc_id) AS n FROM (
    SELECT da AS doc_id FROM f WHERE ha AND NOT hb
    UNION ALL
    SELECT db AS doc_id FROM f WHERE hb AND NOT ha
  )
),
d AS (
  SELECT CAST(COALESCE(SUM(CASE WHEN hold THEN 0 ELSE 1 END), 0) AS BIGINT)
           AS n_train,
         CAST(COALESCE(SUM(CASE WHEN hold THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_holdout
  FROM s
),
pf AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(COALESCE(SUM(CASE WHEN ha <> hb THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_cross
  FROM f
)
SELECT d.n_train, d.n_holdout, pf.n_pairs, pf.n_cross,
       CAST(l.n AS BIGINT) AS n_leaked_holdout,
       round(l.n::DOUBLE / d.n_holdout, 4) AS leak_rate
FROM d CROSS JOIN pf CROSS JOIN leaked l
"""


@query(
    "curate_split_leakage",
    oracle=None,  # assigned below: composes the exact detector's oracle
    tags=("pipeline", "dedup", "eval"),
)
def curate_split_leakage(spark, sf_dir):
    """Train/holdout split LEAKAGE AUDIT — the decontamination check a
    training pipeline runs before trusting its eval numbers: with a
    deterministic 10% hash holdout (stable under re-runs and appends,
    like every production split), count the exact near-dup pairs
    (shingle-Jaccard >= 0.5, the dedup_ngram_jaccard ground truth) that
    CROSS the split, and the distinct holdout documents contaminated by
    a train-side twin. A holdout doc with a near-duplicate in train
    inflates eval scores without any literal overlap tooling noticing —
    this is the Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better") eval-leakage measurement as one oracle-
    gated row.

    Columns: n_train / n_holdout (split sizes), n_pairs (all near-dup
    pairs), n_cross (pairs straddling the split — E[2·p·(1-p)·n_pairs]
    under independence, so a clustered corpus shows up as an excess),
    n_leaked_holdout (distinct contaminated eval docs — the actionable
    set), leak_rate (fraction of the holdout that is contaminated).

    Scale shape: the detector's own blocked plan + two broadcast-sized
    flag joins on the pair list + one scalar aggregate row; the split
    flag is a row-local md5 bucket, never a shuffle key."""
    from doc2dataset_spark.queries.dedup import dedup_ngram_jaccard

    d = load_table(spark, sf_dir, "documents")
    s = d.select("doc_id", F.expr(_SPLIT_SPARK).alias("hold"))
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("da", "db")
    f = (
        pairs.join(
            s.select(F.col("doc_id").alias("da"), F.col("hold").alias("ha")),
            "da",
        )
        .join(
            s.select(F.col("doc_id").alias("db"), F.col("hold").alias("hb")),
            "db",
        )
        .localCheckpoint()
    )
    leaked = (
        f.filter(F.col("ha") & ~F.col("hb"))
        .select(F.col("da").alias("doc_id"))
        .unionAll(
            f.filter(F.col("hb") & ~F.col("ha")).select(
                F.col("db").alias("doc_id")
            )
        )
        .agg(F.countDistinct("doc_id").alias("n"))
    )
    dcounts = s.agg(
        F.sum(F.when(F.col("hold"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_train"),
        F.sum(F.when(F.col("hold"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_holdout"),
    )
    pcounts = f.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.coalesce(
            F.sum((F.col("ha") != F.col("hb")).cast("int")), F.lit(0)
        )
        .cast("bigint")
        .alias("n_cross"),
    )
    return (
        dcounts.crossJoin(F.broadcast(pcounts))
        .crossJoin(F.broadcast(leaked))
        .select(
            "n_train",
            "n_holdout",
            "n_pairs",
            "n_cross",
            F.col("n").cast("bigint").alias("n_leaked_holdout"),
            F.round(
                F.col("n").cast("double") / F.col("n_holdout"), 4
            ).alias("leak_rate"),
        )
    )


REGISTRY["curate_split_leakage"].oracle = _split_leakage_oracle(
    REGISTRY["dedup_ngram_jaccard"].oracle
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
    # localCheckpoint, not cache: CacheManager entries are keyed per
    # plan and never GC'd — repeated calls in a long-lived session would
    # pin blocks forever (the exact hazard pairs_from_postings' own df
    # prune avoids the same way); checkpoint blocks are freed when the
    # frame becomes unreachable
    return pairs_from_postings(
        read_postings(spark, idx).localCheckpoint()
    )
