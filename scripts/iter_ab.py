#!/usr/bin/env python
"""Interleaved in-session A/B for the iterative-family candidates
(round-16: graph_kcore peel loop, quality_classifier_lr GD loop).

Each candidate is a full copy of the query body with ONE lever changed,
so walls and full-precision result hashes compare in the same session:

  python scripts/iter_ab.py kcore [SF_DIR] --reps 3
  python scripts/iter_ab.py lr    [SF_DIR] --reps 3
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from doc2dataset_spark.queries.graph_extras import (  # noqa: E402
    KCORE_K,
    _kcore_edges_nodes,
    dedup_simhash_pairs,
    kcore_of,
)
from doc2dataset_spark.queries.round7g_extras import (  # noqa: E402
    LR_ETA,
    LR_ITERS,
    LR_TOPK,
    _lr_score,
    lr_train_score,
)
from doc2dataset_spark.session import get_spark  # noqa: E402

# ---------------------------------------------------------------- kcore


def kcore_head(spark, sf_dir):
    p = (
        dedup_simhash_pairs(spark, sf_dir)
        .select("da", "db")
        .localCheckpoint(eager=True)
    )
    return kcore_of(p)


def kcore_shrink(spark, sf_dir):
    """Shrinking-edge peel: degrees from the LIVE edge frame (one
    map-side-combinable groupBy), then the edge frame itself is
    filtered to survivors on both endpoints and checkpointed — later
    rounds work on ever-smaller frames instead of re-joining the full
    edge set against the alive list twice per round."""
    p = (
        dedup_simhash_pairs(spark, sf_dir)
        .select("da", "db")
        .localCheckpoint(eager=True)
    )
    e, nodes = _kcore_edges_nodes(p)
    live = e.localCheckpoint(eager=True)
    prev_n = None
    while True:
        deg = live.groupBy("s").agg(F.count("*").alias("deg"))
        cur = (
            deg.filter(F.col("deg") >= KCORE_K)
            .select(F.col("s").alias("node"))
            .localCheckpoint(eager=True)
        )
        n = cur.count()
        if n == prev_n or n == 0:
            core = cur.withColumnRenamed("node", "cnode")
            return nodes.join(
                core, nodes["node"] == core["cnode"], "left"
            ).select(
                F.col("node").alias("doc_id"),
                F.col("cnode").isNotNull().alias("in_core"),
            )
        prev_n = n
        live = (
            live.join(cur.withColumnRenamed("node", "s"), "s", "left_semi")
            .join(cur.withColumnRenamed("node", "d"), "d", "left_semi")
            .localCheckpoint(eager=True)
        )


# ---------------------------------------------------------------- lr


def lr_head(spark, sf_dir):
    out = lr_train_score(spark, sf_dir).select(
        "doc_id",
        "source",
        F.col("y").cast("bigint").alias("label"),
        F.col("p").alias("score"),
    )
    return out.orderBy(F.desc("score"), "doc_id").limit(LR_TOPK)


def _lr_train_score_cached(spark, sf_dir):
    """lr_train_score with the two loop-invariant corpus frames kept as
    partitioned in-memory caches instead of localCheckpoints: an
    InMemoryRelation preserves its child's outputPartitioning (the
    checkpointed RDD scan reports UnknownPartitioning), so each GD
    round's per-doc aggregate and docn join reuse the doc_id
    partitioning instead of re-exchanging the corpus frames."""
    from doc2dataset_spark.queries.round7f_extras import _bigram_frame
    from doc2dataset_spark.queries.round7g_extras import (
        LR_BUCKETS,
        LR_TARGET,
    )
    from doc2dataset_spark.session import load_table

    d = load_table(spark, sf_dir, "documents")
    feat = _bigram_frame(d).select(
        "doc_id",
        "source",
        F.pmod(
            F.expr(
                "cast(conv(substring(md5(concat(w1, ' ', w2)), 1, 12), "
                "16, 10) AS bigint)"
            ),
            F.lit(LR_BUCKETS),
        ).alias("bucket"),
    )
    dfc = (
        feat.groupBy("doc_id", "source", "bucket")
        .agg(F.count("*").alias("c"))
        .localCheckpoint()
    )
    docn = (
        dfc.groupBy("doc_id", "source")
        .agg(F.sum("c").alias("n"))
        .select(
            "doc_id",
            "source",
            "n",
            F.when(F.col("source").isin(*LR_TARGET), F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("y"),
        )
        .repartition("doc_id")
        .persist()
    )
    dfcx = (
        dfc.join(docn.select("doc_id", "n"), "doc_id")
        .select(
            "doc_id",
            "bucket",
            (F.col("c").cast("double") / F.col("n")).alias("x"),
        )
        .persist()
    )
    nd = float(docn.count())
    dfcx.count()
    w = dfc.select("bucket").distinct().select(
        "bucket", F.lit(0.0).alias("w")
    )
    b = spark.range(1).select(F.lit(0.0).alias("b"))
    gterm = F.round((F.col("p") - F.col("y")) * F.col("x"), 8).cast(
        "decimal(38,10)"
    )
    bterm = F.round(F.col("p") - F.col("y"), 8).cast("decimal(38,10)")
    for _ in range(LR_ITERS):
        p = _lr_score(docn, dfcx, w, b).localCheckpoint()
        g = (
            dfcx.join(p.select("doc_id", "p", "y"), "doc_id")
            .groupBy("bucket")
            .agg(
                F.round(F.sum(gterm).cast("double") / nd, 8).alias("grad")
            )
        )
        w = (
            w.join(g, "bucket")
            .select(
                "bucket",
                F.round(
                    F.col("w") - F.lit(LR_ETA) * F.col("grad"), 8
                ).alias("w"),
            )
            .localCheckpoint()
        )
        gb = p.agg(
            F.round(F.sum(bterm).cast("double") / nd, 8).alias("grad")
        )
        b = (
            b.crossJoin(gb)
            .select(
                F.round(
                    F.col("b") - F.lit(LR_ETA) * F.col("grad"), 8
                ).alias("b")
            )
            .localCheckpoint()
        )
    out = _lr_score(docn, dfcx, w, b)
    return out, [docn, dfcx]


def lr_cached(spark, sf_dir):
    out, caches = _lr_train_score_cached(spark, sf_dir)
    res = out.select(
        "doc_id",
        "source",
        F.col("y").cast("bigint").alias("label"),
        F.col("p").alias("score"),
    ).orderBy(F.desc("score"), "doc_id").limit(LR_TOPK)
    res = res.localCheckpoint(eager=True)
    for c in caches:
        c.unpersist()
    return res


FAMILIES = {
    "kcore": {"head": kcore_head, "shrink": kcore_shrink},
    "lr": {"head": lr_head, "cached": lr_cached},
}


def canon_hash(df):
    def c(v):
        return v.hex() if isinstance(v, float) else v

    rows = sorted(tuple(c(v) for v in r) for r in df.collect())
    return hashlib.md5(repr(rows).encode()).hexdigest(), len(rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("family", choices=sorted(FAMILIES))
    ap.add_argument("sf", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(app_name=f"iter_ab_{args.family}")
    impls = FAMILIES[args.family]

    hashes = {}
    for n, fn in impls.items():
        h, rows = canon_hash(fn(spark, args.sf))
        hashes[n] = h
        print(f"hash {n}: {h} rows={rows}", flush=True)
    if len(set(hashes.values())) != 1:
        print("HASH MISMATCH", flush=True)
        sys.exit(1)
    print("hashes identical", flush=True)

    walls = {n: [] for n in impls}
    names = list(impls)
    for rep in range(args.reps):
        seq = names if rep % 2 == 0 else list(reversed(names))
        for n in seq:
            spark.sparkContext.setJobDescription(f"iter_ab:{n}")
            t0 = time.time()
            impls[n](spark, args.sf).count()
            w = time.time() - t0
            walls[n].append(round(w, 2))
            print(f"rep{rep} {n}: {w:.2f}s", flush=True)
    for n in names:
        print(f"{n}: min={min(walls[n])} walls={walls[n]}", flush=True)


if __name__ == "__main__":
    main()
