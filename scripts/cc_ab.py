#!/usr/bin/env python
"""Interleaved A/B for the connected-components propagation rewrite.

HEAD: min-label propagation with 2-hop pointer jumping (queries/dedup.py
cc_labels_from_pairs — copied here verbatim plus a round counter).
Candidate: alternating large-star/small-star (Kiveris et al., SOCC 2014)
with an exact min-star-forest convergence test.

Runs both on the full dedup_cluster_cc input (simhash pairs) at the given
SF dir, interleaved N times, reports walls + round counts, and compares
canonicalized result hashes (exact integers — any mismatch is a bug).

Usage: python scripts/cc_ab.py [SF_DIR] [--reps 3] [--impl both|old|star|stargj]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from doc2dataset_spark.queries.dedup import dedup_simhash_pairs  # noqa: E402
from doc2dataset_spark.session import get_spark  # noqa: E402


def cc_old(pairs, stats):
    """HEAD implementation (dedup.py cc_labels_from_pairs) + round count."""
    edges = pairs.union(
        pairs.select(F.col("db").alias("da"), F.col("da").alias("db"))
    ).toDF("src", "dst").localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    rounds = 0
    for _ in range(1, 21):
        rounds += 1
        nbr = edges.join(labels, edges.src == labels.node).select(
            F.col("dst").alias("node"), "label"
        )
        jump = (
            labels.alias("x")
            .join(labels.alias("y"), F.col("x.label") == F.col("y.node"))
            .join(labels.alias("z"), F.col("y.label") == F.col("z.node"))
            .select(F.col("x.node").alias("node"), F.col("z.label").alias("label"))
        )
        prop = (
            nbr.union(labels)
            .union(jump)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        label_sum = prop.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).collect()[0][0]
        labels = prop
        if label_sum == prev_sum:
            break
        prev_sum = label_sum
    stats["rounds"] = rounds
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def _min_star_forest(edges):
    """Exact convergence test: edges (src > dst) form a min-rooted star
    forest iff every src has exactly one edge and no src appears as a
    dst. Sufficient for correctness: both star ops preserve the
    component partition, so stars == original components and each
    center (< all its leaves by orientation) is the component min.
    One aggregate job: per node, count src-side and dst-side roles."""
    row = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("src").alias("node"),
                        F.lit(1).alias("s"),
                        F.lit(0).alias("d"),
                    ),
                    F.struct(
                        F.col("dst").alias("node"),
                        F.lit(0).alias("s"),
                        F.lit(1).alias("d"),
                    ),
                )
            ).alias("e")
        )
        .select("e.*")
        .groupBy("node")
        .agg(F.sum("s").alias("ns"), F.sum("d").alias("nd"))
        .agg(
            F.max("ns").alias("mx"),
            F.max(
                F.when((F.col("ns") > 0) & (F.col("nd") > 0), 1).otherwise(0)
            ).alias("ov"),
        )
        .collect()[0]
    )
    return row["mx"] is None or (row["mx"] <= 1 and row["ov"] == 0)


def cc_star(pairs, stats, use_window=True):
    """Alternating large-star/small-star CC."""
    ini = pairs.select(
        F.greatest("da", "db").alias("src"), F.least("da", "db").alias("dst")
    ).localCheckpoint(eager=True)
    edges = ini.filter(F.col("src") != F.col("dst"))
    prev = None
    converged = False
    rounds = 0
    for _ in range(50):
        rounds += 1
        sym = edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        if use_window:
            w = Window.partitionBy("src")
            ls = (
                sym.withColumn(
                    "mn", F.least(F.min("dst").over(w), F.col("src"))
                )
                .where(F.col("dst") > F.col("src"))
                .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
            )
            ssb = ls.withColumn("mn", F.min("dst").over(w))
        else:
            mins = sym.groupBy("src").agg(F.min("dst").alias("gmn"))
            ls = (
                sym.join(mins, "src")
                .where(F.col("dst") > F.col("src"))
                .select(
                    F.col("dst").alias("src"),
                    F.least("gmn", F.col("src")).alias("dst"),
                )
            )
            smins = ls.groupBy("src").agg(F.min("dst").alias("mn"))
            ssb = ls.join(smins, "src")
        ss = (
            ssb.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("dst").alias("src"), F.col("mn").alias("dst")
                        ),
                        F.struct(
                            F.col("src").alias("src"), F.col("mn").alias("dst")
                        ),
                    )
                ).alias("e")
            )
            .select("e.src", "e.dst")
            .where(F.col("src") != F.col("dst"))
        )
        edges = ss.distinct().localCheckpoint(eager=True)
        if _min_star_forest(edges):
            converged = True
            break
    stats["rounds"] = rounds
    if not converged:
        raise RuntimeError("large/small-star did not converge in 50 rounds")
    nodes = (
        ini.select(F.col("src").alias("node"))
        .union(ini.select(F.col("dst").alias("node")))
        .distinct()
    )
    lab = edges.select(F.col("src").alias("node"), F.col("dst").alias("label"))
    return nodes.join(lab, "node", "left").select(
        F.col("node").alias("doc_id"),
        F.coalesce("label", "node").alias("cluster_id"),
    )


IMPLS = {
    "old": cc_old,
    "star": lambda p, s: cc_star(p, s, use_window=True),
    "stargj": lambda p, s: cc_star(p, s, use_window=False),
}


def result_hash(df):
    rows = sorted(tuple(r) for r in df.collect())
    return hashlib.md5(repr(rows).encode()).hexdigest()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--impls", default="old,star,stargj")
    args = ap.parse_args()

    spark = get_spark(app_name="cc_ab")
    names = args.impls.split(",")

    # hash check once per impl
    hashes = {}
    for n in names:
        pairs = dedup_simhash_pairs(spark, args.sf).select("da", "db")
        st = {}
        df = IMPLS[n](pairs, st)
        hashes[n] = (result_hash(df), st["rounds"])
        print(f"hash {n}: {hashes[n][0]}  rounds={st['rounds']}", flush=True)
    if len({h for h, _ in hashes.values()}) != 1:
        print("HASH MISMATCH", flush=True)
        sys.exit(1)
    print("hashes identical", flush=True)

    walls = {n: [] for n in names}
    for rep in range(args.reps):
        order = names if rep % 2 == 0 else list(reversed(names))
        for n in order:
            spark.sparkContext.setJobDescription(f"cc_ab:{n}")
            t0 = time.time()
            pairs = dedup_simhash_pairs(spark, args.sf).select("da", "db")
            st = {}
            IMPLS[n](pairs, st).count()
            w = time.time() - t0
            walls[n].append(round(w, 2))
            print(f"rep{rep} {n}: {w:.2f}s rounds={st['rounds']}", flush=True)
    for n in names:
        print(f"{n}: min={min(walls[n])} walls={walls[n]}", flush=True)


if __name__ == "__main__":
    main()
