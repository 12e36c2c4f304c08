"""Dataset-maintenance operators: CDC merge-apply and algebraic
materialized-view maintenance — the two batch-maintenance primitives a
continuously-updated 100 TB corpus needs beyond append-only writes.

- ``merge_cdc_apply``        apply a changelog (upserts + deletes) to a
                             base table: MERGE INTO semantics as pure
                             DataFrame algebra (anti-join + union), no
                             table format required.
- ``rollup_incremental_merge`` refresh a daily revenue rollup from a
                             delta WITHOUT rescanning history: merge
                             unrounded decimal partials (sum-of-sums /
                             sum-of-counts), bit-equal to the full
                             recompute — the algebraic-aggregate MV
                             maintenance identity, driver-hash-proven
                             against the full-recompute oracle.

Both changelogs are synthesized DETERMINISTICALLY from the shipped
tables (doc_id arithmetic) so the DuckDB oracle reconstructs the exact
same change set — no fixture files, no randomness.

Reference basis: the reference's only maintenance story is
overwrite-and-rerun (reference main.py incremental=skip_existing,
SURVEY §2.1 P4); these are the Spark-first upgrades a user switching
from it gains.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from doc2dataset_spark.queries.core import query, sql_dsum
from doc2dataset_spark.session import load_table

# deterministic synthetic changelog over documents:
#   deletes:  doc_id % 17 == 0
#   updates:  doc_id % 10 == 3  -> text upper-cased, n_chars recomputed
#   inserts:  doc_id % 13 == 7  -> new doc_id = doc_id + INSERT_OFFSET
INSERT_OFFSET = 10_000_000
MV_SPLIT = "1999-01-01"  # history < split, delta >= split


@query(
    "merge_cdc_apply",
    oracle=f"""
    WITH dels AS (
      SELECT doc_id FROM documents WHERE doc_id % 17 = 0
    ), upd AS (
      SELECT doc_id, upper(text) AS text, lang, source,
             length(upper(text))::BIGINT AS n_chars
      FROM documents WHERE doc_id % 10 = 3
    ), ins AS (
      SELECT doc_id + {INSERT_OFFSET} AS doc_id, text, lang,
             'cdc_insert' AS source, n_chars
      FROM documents WHERE doc_id % 13 = 7
    )
    SELECT b.doc_id, b.text, b.lang, b.source, b.n_chars
    FROM documents b
    WHERE b.doc_id NOT IN (SELECT doc_id FROM dels)
      AND b.doc_id NOT IN (SELECT doc_id FROM upd)
    UNION ALL
    SELECT * FROM upd
    WHERE doc_id NOT IN (SELECT doc_id FROM dels)
    UNION ALL
    SELECT * FROM ins
    """,
    tags=("maintenance", "documents", "cdc"),
)
def merge_cdc_apply(spark, sf_dir):
    """MERGE INTO semantics as DataFrame algebra: apply a changelog of
    deletes, updates, and inserts to a base table in one pass —
    ``base ANTI-JOIN touched_keys ∪ surviving_upserts`` — without
    requiring a transactional table format.

    The changelog here is derived deterministically from the base table
    (doc_id arithmetic) so the oracle replays the identical change set;
    in production the changes frame is whatever CDC feed lands.

    Scale shape: one LEFT ANTI hash join on the key (the touched-key
    side is |changes|, typically ≪ |base|, AQE broadcast-eligible) plus
    a union — no window, no sort, no full-table shuffle of the base
    beyond the anti-join probe. Deletes win over updates (a row both
    updated and deleted stays deleted), the MERGE precedence contract."""
    base = load_table(spark, sf_dir, "documents")
    dels = base.filter(F.col("doc_id") % 17 == 0).select("doc_id")
    upd = (
        base.filter(F.col("doc_id") % 10 == 3)
        .filter((F.col("doc_id") % 17) != 0)  # delete wins over update
        .select(
            "doc_id",
            F.upper("text").alias("text"),
            "lang",
            "source",
            F.length(F.upper("text")).cast("bigint").alias("n_chars"),
        )
    )
    ins = base.filter(F.col("doc_id") % 13 == 7).select(
        (F.col("doc_id") + INSERT_OFFSET).alias("doc_id"),
        "text",
        "lang",
        F.lit("cdc_insert").alias("source"),
        "n_chars",
    )
    touched = dels.union(
        base.filter(F.col("doc_id") % 10 == 3).select("doc_id")
    )
    survivors = base.join(touched, "doc_id", "left_anti").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    return survivors.unionByName(upd).unionByName(ins)


def mv_partial(df):
    """One input slice → its UNROUNDED daily partials (decimal revenue
    sum + count). Shared by the batch MV refresh below and the streaming
    refresh (streaming/rollup.py) so the two can never drift."""
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    return df.groupBy(
        F.date_format(F.date_trunc("day", "l_shipdate"), "yyyy-MM-dd").alias(
            "day"
        )
    ).agg(
        F.sum(vol).alias("rev_part"),
        F.count(F.lit(1)).cast("bigint").alias("cnt_part"),
    )


def mv_merge_partials(parts):
    """Merge any union of partials by key; round ONLY here. Exact
    decimal addition makes this bit-equal to the one-pass aggregate
    regardless of how the input was sliced."""
    return parts.groupBy("day").agg(
        F.round(F.sum("rev_part"), 4).cast("double").alias("revenue"),
        F.sum("cnt_part").cast("bigint").alias("n_items"),
    )


@query(
    "rollup_incremental_merge",
    oracle=f"""
    SELECT strftime(date_trunc('day', l_shipdate), '%Y-%m-%d') AS day,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
           count(*)::BIGINT AS n_items
    FROM lineitem
    GROUP BY date_trunc('day', l_shipdate)
    """,
    tags=("maintenance", "aggregation", "mv"),
)
def rollup_incremental_merge(spark, sf_dir):
    """Algebraic materialized-view maintenance: the daily revenue rollup
    refreshed from a delta without rescanning history. History
    (< MV_SPLIT) is pre-aggregated into UNROUNDED decimal partials (the
    stored MV); the delta (>= MV_SPLIT) aggregates separately; the
    refresh merges partials by key (sum-of-sums, sum-of-counts) and only
    THEN rounds. Because decimal addition is associative and exact, the
    merged result is bit-identical to the full recompute — which is
    exactly what the oracle computes, so the driver's hash equality IS
    the MV-maintenance correctness proof.

    The rounding discipline is the load-bearing detail: rounding the
    stored partials (tempting for display) would break the identity;
    production MVs must store the raw accumulator, not the presented
    value.

    Scale shape: at 100 TB the history partials are a tiny keyed table
    (≤ days × sources rows) read back instead of the raw facts —
    refresh cost is O(delta + |MV|), not O(history). Both partial aggs
    map-side combine; the merge is one small shuffle on the day key."""
    li = load_table(spark, sf_dir, "lineitem")
    hist = mv_partial(li.filter(F.col("l_shipdate") < MV_SPLIT))
    delta = mv_partial(li.filter(F.col("l_shipdate") >= MV_SPLIT))
    return mv_merge_partials(hist.unionByName(delta))
