"""Round-7 session-6 extras: the three classic model-driven curation
primitives a training-data pipeline runs between dedup and sampling.

- ``text_lm_perplexity``   CCNet-style quality scoring: train a bigram
                           language model ON the corpus itself (one
                           aggregation cascade), score every document's
                           average negative log-likelihood under it, and
                           surface the 20 most "surprising" documents —
                           the gibberish/boilerplate outlier report.
                           (Wenzek et al., CCNet, LREC 2020 §4.3 filter
                           by LM perplexity; here the LM is in-engine
                           instead of an external KenLM binary.)
- ``text_bpe_pairs``       the BPE tokenizer-training inner loop: most
                           frequent adjacent character pair, weighted by
                           word frequency, computed over DISTINCT word
                           types (Sennrich et al., ACL 2016 §3.2 — the
                           dictionary-of-word-types trick is exactly
                           what makes the count tractable at corpus
                           scale).
- ``quality_dsir_weights`` DSIR importance weights (Xie et al., NeurIPS
                           2023): hashed-bigram bag-of-features unigram
                           models for a curated TARGET slice vs the RAW
                           pool; each document's log importance weight
                           log p_target(x)/p_raw(x) ranks how target-
                           like it is. The feature space is hash-bounded
                           (DSIR_BUCKETS), so both "models" are tiny
                           broadcastable tables no matter the corpus
                           size.

Cross-engine exactness: probabilities are (int + 0.5)/(int + 0.5·B)
doubles (identical in both engines), ln on identical doubles, round-8
per term, exact DECIMAL(38,10) summation, final round-4 — the proven
quality_psi_drift / text_tfidf_topk recipe (order-independent and
bit-stable). Feature hashing is the shuffle_deterministic md5 recipe
(first 12 hex digits as a bigint), identical expressions both engines.

Scale shape (shared by all three): ONE explode linear in corpus tokens,
then map-side-combinable aggregation cascades. The LM / feature tables
are derived by RE-AGGREGATING the per-doc counts (never a second corpus
scan); the DSIR model is parameter-bounded (≤ DSIR_BUCKETS rows →
broadcast joins); every top-k is orderBy().limit() →
TakeOrderedAndProject. No windows, no UDFs, no driver loops.

Reference basis: the reference pipeline has no LM scoring, tokenizer
training, or importance sampling (its quality gates are the word-count
filters, reference filters.py); all three are public-literature
training-data operators.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from doc2dataset_spark.queries.core import query
from doc2dataset_spark.queries.dedup import _DTOKS, _TOKS
from doc2dataset_spark.session import load_table

LM_TOPK = 20
BPE_TOPK = 30
DSIR_BUCKETS = 256
DSIR_TOPK = 20
# the declared "curated" target slice for DSIR (any predicate works; the
# contract is the math, and the weight is a pure function of text)
DSIR_TARGET = ("src0", "src1", "src2")


def _bigram_frame(d):
    """(doc_id, source, w1, w2) — one row per adjacent token pair.

    Built with two aligned slices zipped row-locally (pure codegen);
    docs with fewer than two tokens contribute nothing, identically to
    the oracle's len(w) >= 2 guard."""
    base = d.select(
        "doc_id", "source", F.expr(_TOKS).alias("t")
    ).filter(F.size("t") >= 2)
    return base.select(
        "doc_id",
        "source",
        F.explode(
            F.arrays_zip(
                F.expr("slice(t, 1, size(t) - 1)"),
                F.expr("slice(t, 2, size(t) - 1)"),
            )
        ).alias("p"),
    ).select(
        "doc_id",
        "source",
        F.col("p")["0"].alias("w1"),
        F.col("p")["1"].alias("w2"),
    )


# DuckDB twin of _bigram_frame: two PARALLEL unnests of equal-length
# slices are zipped positionally (the engine's documented behavior)
_DUCK_BG = f"""
    ws AS (SELECT doc_id, source, {_DTOKS} AS w FROM documents),
    bg AS (
      SELECT doc_id, source,
             unnest(w[1:len(w) - 1]) AS w1,
             unnest(w[2:len(w)]) AS w2
      FROM ws WHERE len(w) >= 2
    )
"""


# ---------------------------------------------------------------------------
# bigram-LM negative log-likelihood (CCNet-style quality outliers)
# ---------------------------------------------------------------------------
@query(
    "text_lm_perplexity",
    oracle=f"""
    WITH {_DUCK_BG},
    dc AS (
      SELECT doc_id, source, w1, w2, count(*) AS c
      FROM bg GROUP BY doc_id, source, w1, w2
    ),
    lm AS (SELECT w1, w2, SUM(c) AS c12 FROM dc GROUP BY w1, w2),
    pre AS (SELECT w1, SUM(c12) AS c1 FROM lm GROUP BY w1),
    voc AS (SELECT COUNT(DISTINCT w2) AS v FROM lm),
    terms AS (
      SELECT dc.doc_id, dc.source, dc.c,
             CAST(round(dc.c * ln((lm.c12 + 0.5) / (pre.c1 + 0.5 * voc.v)), 8)
                  AS DECIMAL(38,10)) AS term
      FROM dc
      JOIN lm USING (w1, w2)
      JOIN pre USING (w1)
      CROSS JOIN voc
    ),
    agg AS (
      SELECT doc_id, source,
             CAST(SUM(c) AS BIGINT) AS n_bigrams,
             round(SUM(term), 4)::DOUBLE AS lp_tot
      FROM terms GROUP BY doc_id, source
    )
    SELECT doc_id, source, n_bigrams,
           round(-lp_tot / n_bigrams, 4) AS nll
    FROM agg
    ORDER BY nll DESC, doc_id
    LIMIT {LM_TOPK}
    """,
    tags=("text", "quality", "lm"),
)
def text_lm_perplexity(spark, sf_dir):
    """Bigram-LM quality scoring: P(w2|w1) with add-0.5 smoothing is
    estimated from the corpus itself, every document gets its average
    negative log-likelihood per bigram (monotone with perplexity =
    exp(nll); nll is reported because exp() carries no cross-engine
    correctly-rounded guarantee while ln-round-8-decimal-sum does), and
    the LM_TOPK most surprising documents come back — formulaic text
    scores low, token soup scores high. The in-engine twin of CCNet's
    KenLM perplexity gate.

    Scale shape: the per-doc bigram counts ``dc`` are aggregated ONCE
    from the single explode; the LM (``lm``), its prefix marginals
    (``pre``), and the vocab scalar are all re-aggregations of ``dc``
    (map-side-combinable, shuffle keys are (w1,w2)/(w1) — uniform
    language statistics, no skew beyond stopword heads that partial agg
    absorbs). Scoring joins dc back to lm/pre on term keys (equi-joins;
    at 100 TB these shuffle vocab²-bounded tables, never raw text) and
    the final cut is TakeOrderedAndProject."""
    d = load_table(spark, sf_dir, "documents")
    dc = (
        _bigram_frame(d)
        .groupBy("doc_id", "source", "w1", "w2")
        .agg(F.count("*").alias("c"))
    )
    lm = dc.groupBy("w1", "w2").agg(F.sum("c").alias("c12"))
    pre = lm.groupBy("w1").agg(F.sum("c12").alias("c1"))
    voc = lm.agg(F.count_distinct("w2").alias("v"))
    p = (F.col("c12") + 0.5) / (F.col("c1") + 0.5 * F.col("v"))
    term = F.round(F.col("c") * F.log(p), 8).cast("decimal(38,10)")
    agg = (
        dc.join(lm, ["w1", "w2"])
        .join(pre, "w1")
        .crossJoin(F.broadcast(voc))
        .groupBy("doc_id", "source")
        .agg(
            F.sum("c").cast("bigint").alias("n_bigrams"),
            F.round(F.sum(term), 4).cast("double").alias("lp_tot"),
        )
    )
    out = agg.select(
        "doc_id",
        "source",
        "n_bigrams",
        F.round(-F.col("lp_tot") / F.col("n_bigrams"), 4).alias("nll"),
    )
    return out.orderBy(F.desc("nll"), "doc_id").limit(LM_TOPK)


# ---------------------------------------------------------------------------
# BPE pair statistics over distinct word types
# ---------------------------------------------------------------------------
@query(
    "text_bpe_pairs",
    oracle=f"""
    WITH tok AS (SELECT unnest({_DTOKS}) AS tok FROM documents),
    tf AS (SELECT tok, count(*) AS f FROM tok GROUP BY tok),
    pairs AS (
      SELECT f,
             unnest(list_transform(range(1, length(tok)),
                                   i -> tok[i:i+1])) AS pair
      FROM tf WHERE length(tok) >= 2
    )
    SELECT pair, CAST(SUM(f) AS BIGINT) AS cnt
    FROM pairs GROUP BY pair
    ORDER BY cnt DESC, pair
    LIMIT {BPE_TOPK}
    """,
    tags=("text", "tokenizer"),
)
def text_bpe_pairs(spark, sf_dir):
    """The first BPE merge decision: corpus-frequency-weighted counts of
    adjacent character pairs, top BPE_TOPK. Computed the way real BPE
    trainers do it — aggregate word-type frequencies FIRST, then expand
    only DISTINCT word types into their character pairs — so the pair
    fan-out is bounded by vocabulary size × word length, not corpus
    length (Sennrich et al. ACL 2016 §3.2's dictionary representation).

    Scale shape: explode (linear in tokens) → (token) partial-agg count
    → row-local pair expansion over the (much smaller) type table →
    (pair) partial-agg → TakeOrderedAndProject. At 100 TB the only
    corpus-scale shuffle is the word-type count, whose keys are the
    Zipf-distributed vocabulary — exactly the partial-agg-absorbable
    shape. No windows, no UDFs."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.expr(_TOKS)).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("f"))
    )
    pairs = tf.filter(F.length("tok") >= 2).select(
        "f",
        F.explode(
            F.expr("transform(sequence(1, length(tok) - 1), "
                   "i -> substring(tok, i, 2))")
        ).alias("pair"),
    )
    out = pairs.groupBy("pair").agg(F.sum("f").cast("bigint").alias("cnt"))
    return out.orderBy(F.desc("cnt"), "pair").limit(BPE_TOPK)


# ---------------------------------------------------------------------------
# DSIR importance weights (hashed-bigram feature models)
# ---------------------------------------------------------------------------
_TGT_SQL = "(" + ", ".join(f"'{s}'" for s in DSIR_TARGET) + ")"


@query(
    "quality_dsir_weights",
    oracle=f"""
    WITH {_DUCK_BG},
    feat AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(w1 || ' ' || w2), 1, 12))::BIGINT
               % {DSIR_BUCKETS} AS bucket
      FROM bg
    ),
    dfc AS (
      SELECT doc_id, source, bucket, count(*) AS c
      FROM feat GROUP BY doc_id, source, bucket
    ),
    tc AS (
      SELECT bucket, SUM(c) AS ct FROM dfc
      WHERE source IN {_TGT_SQL} GROUP BY bucket
    ),
    rc AS (SELECT bucket, SUM(c) AS cr FROM dfc GROUP BY bucket),
    tot AS (
      SELECT (SELECT SUM(c) FROM dfc WHERE source IN {_TGT_SQL}) AS nt,
             (SELECT SUM(c) FROM dfc) AS nr
    ),
    terms AS (
      SELECT dfc.doc_id, dfc.source, dfc.c,
             CAST(round(dfc.c * ln(
               ((COALESCE(tc.ct, 0) + 0.5) / (tot.nt + 0.5 * {DSIR_BUCKETS}))
               / ((rc.cr + 0.5) / (tot.nr + 0.5 * {DSIR_BUCKETS}))
             ), 8) AS DECIMAL(38,10)) AS term
      FROM dfc
      LEFT JOIN tc USING (bucket)
      JOIN rc USING (bucket)
      CROSS JOIN tot
    )
    SELECT doc_id, source,
           CAST(SUM(c) AS BIGINT) AS n_feats,
           round(SUM(term), 4)::DOUBLE AS log_weight
    FROM terms GROUP BY doc_id, source
    ORDER BY log_weight DESC, doc_id
    LIMIT {DSIR_TOPK}
    """,
    tags=("quality", "sampling", "dsir"),
)
def quality_dsir_weights(spark, sf_dir):
    """DSIR log importance weights: hashed-bigram unigram models for the
    curated TARGET slice (sources in DSIR_TARGET) and the RAW pool;
    log w(x) = Σ_f c_f(x)·ln(p_target(f)/p_raw(f)) ranks documents by
    how target-like their feature profile is — the data-selection score
    of Xie et al. (NeurIPS 2023). Top DSIR_TOPK most target-like
    documents come back; the weight is a pure function of the text, so
    raw-pool documents that read like the target rank alongside it.

    Scale shape: the hash bounds the feature space at DSIR_BUCKETS, so
    both model tables are ≤ DSIR_BUCKETS rows — re-aggregated from the
    per-doc counts and BROADCAST back (the scoring join shuffles
    nothing but the per-doc feature counts, themselves ≤ BUCKETS rows
    per doc). Smoothing is add-0.5 over the hashed vocabulary; the md5
    bucket is the shuffle_deterministic recipe, identical both
    engines."""
    d = load_table(spark, sf_dir, "documents")
    feat = _bigram_frame(d).select(
        "doc_id",
        "source",
        F.pmod(
            F.expr(
                "cast(conv(substring(md5(concat(w1, ' ', w2)), 1, 12), "
                "16, 10) AS bigint)"
            ),
            F.lit(DSIR_BUCKETS),
        ).alias("bucket"),
    )
    dfc = feat.groupBy("doc_id", "source", "bucket").agg(
        F.count("*").alias("c")
    )
    is_tgt = F.col("source").isin(*DSIR_TARGET)
    tc = dfc.filter(is_tgt).groupBy("bucket").agg(F.sum("c").alias("ct"))
    rc = dfc.groupBy("bucket").agg(F.sum("c").alias("cr"))
    tot = dfc.agg(
        F.sum(F.when(is_tgt, F.col("c")).otherwise(F.lit(0))).alias("nt"),
        F.sum("c").alias("nr"),
    )
    pt = (F.coalesce(F.col("ct"), F.lit(0)) + 0.5) / (
        F.col("nt") + 0.5 * DSIR_BUCKETS
    )
    pr = (F.col("cr") + 0.5) / (F.col("nr") + 0.5 * DSIR_BUCKETS)
    term = F.round(F.col("c") * F.log(pt / pr), 8).cast("decimal(38,10)")
    scored = (
        dfc.join(F.broadcast(tc), "bucket", "left")
        .join(F.broadcast(rc), "bucket")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "source")
        .agg(
            F.sum("c").cast("bigint").alias("n_feats"),
            F.round(F.sum(term), 4).cast("double").alias("log_weight"),
        )
    )
    return scored.orderBy(F.desc("log_weight"), "doc_id").limit(DSIR_TOPK)
