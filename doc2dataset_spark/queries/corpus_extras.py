"""Corpus-rewrite + compressed-ANN extras (round-5 third session),
registered AFTER the frozen driver gate, oracle-checked locally like
everything else.

- ``dedup_substring_rewrite``  global substring-level dedup WITH document
                               rewriting: every 16-token chunk that occurs
                               anywhere else in the corpus keeps only its
                               globally-first copy, and documents are
                               reconstructed from their surviving chunks —
                               the chunk-granular form of the Lee et al.
                               2021 "Deduplicating Training Data" rewrite
                               (the prior span ops only *flag*; this one
                               produces the cleaned corpus).
- ``sim_ann_pq``               product-quantization ANN (the IVF-PQ ADC
                               recipe): 64-dim vectors encoded as 8
                               sub-space codes against per-sub-space
                               codebooks trained with an exact-integer
                               Lloyd pass (oracle-unrolled), queries
                               scored against a broadcast lookup table of
                               partial dot products — search cost
                               independent of vector dimensionality.
- ``ann_pq_recall``            recall@5 of the PQ search vs the exact
                               brute-force top-5, per query — compression
                               quality measured inside the engine, same
                               discipline as ann_recall_eval (IVF).
- ``sim_ann_ivfpq``            the composed FAISS-style IVF-PQ: coarse
                               cells bound the scan, PQ codes bound the
                               memory — both quantizers in one
                               oracle-exact plan.
- ``q36_grouped_agg_udf``      the one Python-UDF flavor q36 still
                               lacked: GROUPED_AGG pandas_udf (vectorized
                               UDAF) — per-group Arrow batch in, scalar
                               out.

Reference scope note: the reference (doc2dataset) has no dedup/ANN stage;
these are the north-star training-data operators the task brief lists,
built on the shared tables + oracle discipline.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from doc2dataset_spark.queries.core import query
from doc2dataset_spark.queries.dedup import (
    NORM_EMB_DUCK,
    normalized_embeddings,
    spark_dot,
)
from doc2dataset_spark.queries.ml import _QUANT_DUCK, _quantized
from doc2dataset_spark.queries.ml import SCALE as ML_SCALE
from doc2dataset_spark.queries.textops import _DTOKS, _TOKS
from doc2dataset_spark.session import load_table

# ---------------------------------------------------------------------------
# substring-level dedup with document rewriting
# ---------------------------------------------------------------------------
SUB_W = 16  # chunk width (tokens); trailing partial chunks are kept
# ci fits far below this at any sane doc length, so (doc_id, ci) packs
# into one bigint and "first occurrence" is a single MIN — map-side
# combinable, no window over a possibly-hot chunk key.
_CI_PACK = 1 << 20


def _packed_key(doc=None, ci=None):
    """``doc_id * 2^20 + ci`` with the packing assumption ENFORCED
    (ADVICE r5): a document beyond 2^20 chunks (~16.7M tokens) or a
    doc_id >= 2^43 (bigint overflow) would silently mis-order the
    first-occurrence MIN — raise loudly per violating row instead."""
    doc = F.col("doc_id") if doc is None else doc
    ci = F.col("ci") if ci is None else ci
    ok = (ci >= 0) & (ci < _CI_PACK) & (doc >= 0) & (doc < (1 << 43))
    return F.when(ok, doc * _CI_PACK + ci).otherwise(
        F.raise_error(
            F.lit(
                "(doc_id, ci) packing overflow: needs 0 <= ci < 2^20 "
                "and 0 <= doc_id < 2^43"
            )
        )
    )

# chunk array WITH the trailing partial chunk (reconstruction must
# preserve every token of a duplicate-free document)
_SUBCHUNKS = (
    f"transform(sequence(0, (size({_TOKS}) + {SUB_W} - 1) DIV {SUB_W} - 1), "
    f"j -> array_join(slice({_TOKS}, j * {SUB_W} + 1, {SUB_W}), ' '))"
)


@query(
    "dedup_substring_rewrite",
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, {_DTOKS} AS w FROM documents WHERE len({_DTOKS}) > 0
    ), ch0 AS (
      SELECT doc_id, unnest(range((len(w) + {SUB_W} - 1) // {SUB_W})) AS ci,
             w
      FROM ws
    ), ch AS (
      SELECT doc_id, ci,
             array_to_string(
               w[ci * {SUB_W} + 1 : ci * {SUB_W} + {SUB_W}], ' ') AS chunk
      FROM ch0
    ), fs AS (
      SELECT chunk, min(doc_id * {_CI_PACK} + ci) AS first_key
      FROM ch GROUP BY chunk
    ), kept AS (
      SELECT c.doc_id, c.ci, c.chunk
      FROM ch c JOIN fs ON c.chunk = fs.chunk
       AND c.doc_id * {_CI_PACK} + c.ci = fs.first_key
    ), tot AS (
      SELECT doc_id, count(*)::BIGINT AS n_chunks FROM ch GROUP BY doc_id
    ), reb AS (
      SELECT doc_id, count(*)::BIGINT AS n_kept,
             string_agg(chunk, ' ' ORDER BY ci) AS clean_text
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_chunks, coalesce(r.n_kept, 0) AS n_kept,
           coalesce(r.clean_text, '') AS clean_text
    FROM tot t LEFT JOIN reb r USING (doc_id)
    """,
    tags=("dedup", "documents", "rewrite"),
)
def dedup_substring_rewrite(spark, sf_dir):
    """Substring-level dedup that REWRITES the corpus (Lee et al. 2021,
    at 16-token chunk granularity): a chunk seen anywhere before — earlier
    doc, or earlier position in the same doc — is deleted; only the
    globally-first copy (min (doc_id, position)) survives, and each
    document's cleaned text is re-assembled from its surviving chunks in
    order. Emits (doc_id, n_chunks, n_kept, clean_text); a fully-duplicate
    document comes back with n_kept=0 and empty text rather than
    disappearing.

    Scale shape: one linear chunk explode; "first occurrence" is a
    map-side-combinable MIN over a packed (doc_id, position) bigint — no
    window sorts a hot chunk's copies. The join back to chunks is an
    equi-join on the chunk key where one side is 1 row per key (AQE
    handles the skewed probe side), and reconstruction is a per-doc
    hash agg whose collect_list is bounded by document length. The chunk
    string itself is the key here for oracle exactness; at 100 TB you'd
    key by a 128-bit chunk hash to shrink shuffle bytes (collision odds
    ~n²/2¹²⁸), which changes no other part of the plan.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.size(F.expr(_TOKS)) > 0
    )
    ch = d.select(
        "doc_id", F.posexplode(F.expr(_SUBCHUNKS)).alias("ci", "chunk")
    )
    key = _packed_key()
    fs = ch.groupBy("chunk").agg(F.min(_packed_key()).alias("first_key"))
    kept = ch.join(fs, "chunk").filter(key == F.col("first_key"))
    tot = ch.groupBy("doc_id").agg(F.count("*").alias("n_chunks"))
    reb = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ci", "chunk"))),
                lambda x: x["chunk"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return tot.join(reb, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# product-quantization ANN (ADC scoring)
# ---------------------------------------------------------------------------
PQ_M = 8  # sub-spaces
PQ_DSUB = 8  # dims per sub-space (8 × 8 = the 64-dim embedding)
PQ_K = 16  # codes per sub-space codebook (sub-vectors of vec_id < PQ_K)
PQ_NQ = 50  # query vectors (vec_id < PQ_NQ)
PQ_TOPK = 5
# training sample: the Lloyd refinement reads only these vectors (the
# production recipe — codebooks are trained on a sample, the full corpus
# is only ENCODED; also what keeps the training pass off the 100 TB path)
PQ_TRAIN = 1500

# Codebooks are TRAINED: seeded from the first PQ_K sub-vectors, then one
# exact-integer Lloyd refinement per sub-space (the ml.py k-means recipe
# applied per (m, code) cell: 1e-9-quantized inputs, bigint per-dim sums,
# so refined centroids are bit-identical across engines and the oracle
# can unroll the training in SQL).
def _pq_assign_sql(cb_cte: str, src: str = "psub") -> str:
    """One PQ code-assignment pass: per (vector, sub-space) argmin-L2
    over that sub-space's codebook. The s·s term is constant per
    (vector, sub-space) row so it cannot change the argmin — both
    engines rank by the reduced form −2·(s·c) + c·c (identical
    expression, identical rounding, identical ties)."""
    return f"""
      SELECT vec_id, m, sv, code FROM (
        SELECT s.vec_id, s.m, s.sv, c.code,
               row_number() OVER (
                 PARTITION BY s.vec_id, s.m
                 ORDER BY -2 * list_dot_product(s.sv, c.cv)
                          + list_dot_product(c.cv, c.cv),
                          c.code
               ) AS rn
        FROM {src} s JOIN {cb_cte} c USING (m)
      ) WHERE rn = 1
    """


# exact bigint per-dim sums -> double sub-centroid means (ml.py recipe,
# keyed by (m, code) instead of cell)
def _pq_recompute_sql(assign_cte: str) -> str:
    return f"""
      SELECT m, code, list(mu ORDER BY pos) AS cv FROM (
        SELECT m, code, pos,
               CAST(sum(q) AS BIGINT)::DOUBLE / count(*) / {ML_SCALE}.0
                 AS mu
        FROM (
          SELECT a.m, a.code,
                 generate_subscripts(a.sv, 1) AS pos,
                 round(unnest(a.sv) * {ML_SCALE})::BIGINT AS q
          FROM {assign_cte} a
        )
        GROUP BY m, code, pos
      ) GROUP BY m, code
    """


# shared relational spine: quantized sub-vectors, trained codebook,
# per-(vector, sub-space) code assignment, query-side LUT — identical in
# both engines. Parameterized by the ADC cut so the rerank query can
# retrieve a wider candidate set from the same spine.
def _pq_duck_cte(topk: int = PQ_TOPK) -> str:
    return f"""
    WITH qv AS ({_QUANT_DUCK}),
    ps0 AS (SELECT vec_id, unnest(range({PQ_M})) AS m, qd FROM qv),
    psub AS (
      SELECT vec_id, m,
             qd[m * {PQ_DSUB} + 1 : m * {PQ_DSUB} + {PQ_DSUB}] AS sv
      FROM ps0
    ),
    pcb0 AS (SELECT m, vec_id AS code, sv AS cv FROM psub
             WHERE vec_id < {PQ_K}),
    ptrain AS (SELECT * FROM psub WHERE vec_id < {PQ_TRAIN}),
    pa1 AS ({_pq_assign_sql("pcb0", "ptrain")}),
    pcb1 AS ({_pq_recompute_sql("pa1")}),
    pa2 AS ({_pq_assign_sql("pcb1")}),
    codes AS (SELECT vec_id, m, code FROM pa2),
    lut AS (
      SELECT s.vec_id AS qid, s.m, c.code,
             list_dot_product(s.sv, c.cv) AS w
      FROM psub s JOIN pcb1 c USING (m)
      WHERE s.vec_id < {PQ_NQ}
    ),
    pq_top AS (
      SELECT qid, cid, score_pq, rk FROM (
        SELECT qid, cid, score_pq,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY score_pq DESC, cid)::INT AS rk
        FROM (
          -- exact integer accumulation: each partial weight is already a
          -- driver-quantized LUT entry; summing 1e-9-quantized bigints is
          -- order-independent like the decimal idiom but integer-fast
          SELECT l.qid, co.vec_id AS cid,
                 round(CAST(sum(round(l.w * {ML_SCALE})::BIGINT) AS DOUBLE)
                       / {ML_SCALE}.0, 4) AS score_pq
          FROM codes co JOIN lut l ON l.m = co.m AND l.code = co.code
          WHERE l.qid <> co.vec_id
          GROUP BY l.qid, co.vec_id
        )
      ) WHERE rk <= {topk}
    )
"""


_PQ_DUCK_CTE = _pq_duck_cte()


def _pq_subvectors(spark, sf_dir):
    """(vec_id, m, sv): 1e-9-quantized sub-vectors — slices of the same
    quantized frame the k-means ops use, so all distance arithmetic
    starts from identical values in both engines."""
    return (
        _quantized(spark, sf_dir)
        .select(
            "vec_id",
            F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("m"),
            "qd",
        )
        .select(
            "vec_id",
            "m",
            F.expr(f"slice(qd, m * {PQ_DSUB} + 1, {PQ_DSUB})").alias("sv"),
        )
    )


def _cc(cv: list[float]) -> float:
    """Sequential-fold c·c on the driver — same accumulation order as
    list_dot_product / spark_dot, so the double is bit-identical to what
    either engine would compute from the same centroid."""
    acc = 0.0
    for v in cv:
        acc += v * v
    return acc


def _pq_cb_frame(spark, books: dict[int, list[tuple[int, list[float]]]]):
    """Codebook as a LOCAL-RELATION DataFrame (m, code, cv, cc): the
    centroids travel as Arrow data, not as plan literals — a
    1000-literal expression tree was measured to cost ~2 s of DRIVER
    plan analysis per encode at any data size, swamping the actual
    arithmetic. c·c is precomputed per centroid (driver fold, bit-equal
    to the engines' folds) so assignment costs one 8-dim fold per
    candidate instead of three."""
    rows = [
        (m, int(code), list(cv), _cc(cv))
        for m in sorted(books)
        for code, cv in books[m]
    ]
    return spark.createDataFrame(
        rows, "m int, code int, cv array<double>, cc double"
    )


def _pq_encode(sub, cb):
    """argmin-L2 code per (vector, sub-space): broadcast-join the
    codebook frame on the sub-space key, rank by the reduced distance
    −2·(s·c) + c·c (the s·s term is row-constant so the argmin is
    unchanged — the oracle ranks by the identical expression), and take
    the minimum (dist, code) struct with a map-side-combinable hash agg
    — no window sort, partials collapse before the exchange, ties break
    to the lowest code exactly like the oracle's row_number."""
    dist = -2 * spark_dot(F.col("sv"), F.col("cv")) + F.col("cc")
    return (
        sub.join(F.broadcast(cb), "m")
        .groupBy("vec_id", "m", "sv")
        .agg(
            F.min(
                F.struct(dist.alias("d"), F.col("code").alias("c"))
            ).alias("b")
        )
        .select("vec_id", "m", "sv", F.col("b.c").alias("code"))
    )


# (applicationId, sf_dir) -> (codes, lut): sim_ann_pq, ann_pq_recall and
# sim_ann_ivfpq all enter _pq_parts; without the memo each re-ran training
# and re-cached the same sub-vector plan ("Asked to cache already cached
# data" warnings in BENCH_r05, ADVICE r5) while pinning executor memory
_PQ_PARTS_MEMO: dict[tuple[str, str], tuple] = {}


def _pq_parts(spark, sf_dir):
    """(codes, lut): trained-codebook PQ code assignments and the
    query-side partial-dot-product lookup table — the Spark twin of
    ``_PQ_DUCK_CTE``'s spine, shared by sim_ann_pq and ann_pq_recall.

    Training mirrors ml.kmeans_assign per sub-space: seed codebook =
    first 16 sub-vectors, one assignment pass over a deterministic
    1500-vector SAMPLE (train-on-sample, encode-the-corpus — the recipe
    that keeps training off the 100 TB path), one exact-bigint centroid
    recompute (only M×K×DSUB integer sums cross the driver), final
    corpus-wide assignment against the refined codebook.

    Memoized per (session, sf_dir): repeated query runs deliberately
    share one cached sub-vector frame and one trained codebook instead of
    re-caching the same plan on every entry."""
    memo_key = (spark.sparkContext.applicationId, sf_dir)
    hit = _PQ_PARTS_MEMO.get(memo_key)
    if hit is not None:
        return hit
    # cache, not localCheckpoint: the frame is reused by four consumers
    # (seed collect, training pass, final encode, LUT) but recomputing it
    # is row-local and deterministic, so the cheap memory cache is enough
    # — measured 2.9 s (checkpoint) vs 1.3 s (cache) at sf0.1 for the
    # materialization alone
    sub = _pq_subvectors(spark, sf_dir).cache()
    # seed codebook: first PQ_K sub-vectors, collected (PQ_M×PQ_K×PQ_DSUB
    # doubles — the same driver-size budget as the kmeans centroid pull)
    books0: dict[int, list[tuple[int, list[float]]]] = {
        m: [] for m in range(PQ_M)
    }
    for r in (
        sub.filter(F.col("vec_id") < PQ_K)
        .orderBy("m", "vec_id")
        .collect()
    ):
        books0[r["m"]].append((int(r["vec_id"]), list(r["sv"])))
    a1 = _pq_encode(
        sub.filter(F.col("vec_id") < PQ_TRAIN),
        _pq_cb_frame(spark, books0),
    )
    # refined sub-centroids: exact integer per-dim sums (M×K×DSUB scalars)
    sums = (
        a1.select(
            "m",
            "code",
            F.posexplode(
                F.transform(
                    "sv", lambda x: F.round(x * ML_SCALE).cast("bigint")
                )
            ).alias("pos", "q"),
        )
        .groupBy("m", "code", "pos")
        .agg(F.sum("q").alias("s"), F.count("*").alias("n"))
        .collect()
    )
    cents: dict[tuple[int, int], list[float]] = {}
    for r in sums:
        cents.setdefault((r["m"], r["code"]), [0.0] * PQ_DSUB)
        cents[(r["m"], r["code"])][r["pos"]] = (
            float(r["s"]) / r["n"] / ML_SCALE
        )
    books1: dict[int, list[tuple[int, list[float]]]] = {
        m: [] for m in range(PQ_M)
    }
    for (m, code), cv in sorted(cents.items()):
        books1[m].append((code, cv))
    cb1 = _pq_cb_frame(spark, books1)
    codes = _pq_encode(sub, cb1).select("vec_id", "m", "code")
    lut = (
        sub.filter(F.col("vec_id") < PQ_NQ)
        .join(F.broadcast(cb1), "m")
        .select(
            F.col("vec_id").alias("qid"),
            "m",
            "code",
            spark_dot(F.col("sv"), F.col("cv")).alias("w"),
        )
    )
    _PQ_PARTS_MEMO[memo_key] = (codes, lut)
    return codes, lut


def _pq_top(spark, sf_dir, k: int = PQ_TOPK):
    """PQ ADC top-k frame (qid, cid, score_pq, rk) — Spark twin of the
    oracle's pq_top CTE (k = the ADC cut; the rerank query widens it)."""
    codes, lut = _pq_parts(spark, sf_dir)
    scored = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("qid") != F.col("vec_id"))
        .groupBy("qid", F.col("vec_id").alias("cid"))
        .agg(
            F.round(
                F.sum(F.round(F.col("w") * ML_SCALE).cast("bigint")).cast(
                    "double"
                )
                / float(ML_SCALE),
                4,
            ).alias("score_pq")
        )
    )
    return scored.withColumn(
        "rk",
        F.row_number()
        .over(W.partitionBy("qid").orderBy(F.desc("score_pq"), "cid"))
        .cast("int"),
    ).filter(F.col("rk") <= k)


@query(
    "sim_ann_pq",
    oracle=f"""
    {_PQ_DUCK_CTE}
    SELECT qid, cid, score_pq, rk FROM pq_top
    """,
    tags=("similarity", "embeddings", "scale"),
)
def sim_ann_pq(spark, sf_dir):
    """Product-quantization ANN with asymmetric-distance (ADC) scoring —
    the compressed half of the IVF-PQ recipe (Jégou et al. 2011) as pure
    relational algebra. Each 64-dim vector is encoded as 8 sub-space
    codes (argmin-L2 against a TRAINED 16-entry per-sub-space codebook —
    seeded from the first 16 sub-vectors, refined with one exact-integer
    Lloyd pass exactly like ml_kmeans_lite, oracle-unrolled); a query
    never touches corpus vectors — its 8×16 partial dot products form a
    lookup table, and a candidate's approximate cosine is the SUM of 8
    table entries keyed by its codes.

    Scale shape: training collects only 8×16×8 integer sums; encoding is
    a broadcast join against a 128-row codebook + a window whose
    partitions are exactly 16 rows; search is a broadcast LUT equi-join +
    map-side-combinable hash agg + bounded per-query top-k window. The
    corpus side stores 8 4-bit codes per vector (32 bits vs 64×64 bits
    raw — a 128× memory compression), which is what makes billion-vector
    serving fit in RAM; ann_pq_recall reports what that compression costs
    in recall on THIS corpus (near-random synthetic vectors are the
    pessimal case for PQ — the measurement, not a constant, is the
    deliverable).
    """
    return _pq_top(spark, sf_dir)


@query(
    "ann_pq_recall",
    oracle=f"""
    {_PQ_DUCK_CTE},
    nn AS ({NORM_EMB_DUCK}),
    exact_top AS (
      SELECT qid, cid FROM (
        SELECT q.vec_id AS qid, c.vec_id AS cid,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_dot_product(q.ne, c.ne) DESC, c.vec_id
               ) AS rk
        FROM nn q JOIN nn c ON q.vec_id < {PQ_NQ}
         AND c.vec_id <> q.vec_id
      ) WHERE rk <= {PQ_TOPK}
    )
    SELECT e.qid,
           count(p.cid)::BIGINT AS n_hits,
           round(count(p.cid)::DOUBLE / {PQ_TOPK}, 4) AS recall
    FROM exact_top e
    LEFT JOIN pq_top p ON p.qid = e.qid AND p.cid = e.cid
    GROUP BY e.qid
    """,
    tags=("similarity", "embeddings", "eval"),
)
def ann_pq_recall(spark, sf_dir):
    """recall@5 of the PQ ADC search against the exact brute-force
    top-5, per query — the compression-quality number a PQ deployment is
    judged by, computed inside the engine (same discipline as
    ann_recall_eval for the IVF coarse quantizer). On this synthetic
    near-random corpus 32-bit codes buy ~0.22 mean recall@5 — the honest
    price of 128× compression here; clustered production embeddings sit
    far higher, and the query measures whichever is true.

    Scale shape: the exact side caps the query set at 50 and broadcasts
    it (linear in corpus size, same shape as sim_cosine_topk); both
    top-k frames are ≤ 50×5 rows, so the recall join is trivially small.
    """
    n = normalized_embeddings(spark, sf_dir)
    q = n.filter(F.col("vec_id") < PQ_NQ).select(
        F.col("vec_id").alias("qid"), F.col("ne").alias("qne")
    )
    exact = (
        n.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("cid"),
            spark_dot(F.col("qne"), F.col("ne")).alias("cos"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("qid").orderBy(F.desc("cos"), "cid")
            ),
        )
        .filter(F.col("rk") <= PQ_TOPK)
        .select("qid", "cid")
    )
    pq = _pq_top(spark, sf_dir).select(
        F.col("qid").alias("pqid"), F.col("cid").alias("pq_cid")
    )
    hits = exact.join(
        pq,
        (F.col("qid") == F.col("pqid")) & (F.col("cid") == F.col("pq_cid")),
        "left",
    )
    return hits.groupBy("qid").agg(
        F.count("pq_cid").alias("n_hits"),
        F.round(F.count("pq_cid").cast("double") / PQ_TOPK, 4).alias(
            "recall"
        ),
    )


# ---------------------------------------------------------------------------
# GROUPED_AGG pandas UDF (vectorized UDAF)
# ---------------------------------------------------------------------------


@query(
    "q36_grouped_agg_udf",
    oracle="""
    SELECT l_returnflag,
           SUM(l_quantity::BIGINT)::BIGINT AS sum_qty,
           median(l_quantity::BIGINT) AS median_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("udf", "agg"),
)
def q36_grouped_agg_udf(spark, sf_dir):
    """GROUPED_AGG pandas_udf — the vectorized-UDAF flavor of the q36
    Python surface: each group's column arrives as ONE Arrow batch and the
    UDF returns a scalar (here: exact integer sum + interpolated median,
    both order-insensitive so the oracle comparison is exact). Completes
    the q36 API matrix (scalar, grouped-map, map-batches, UDTF, arrow-map,
    grouped-agg).

    Scale shape: partial aggregation does NOT apply to a grouped-agg UDF
    (the whole group must reach one task) — fine at 3 bounded groups, but
    the reason built-in aggregates are preferred in hot paths; this query
    exists to prove the plumbing, like the rest of q36.
    """

    @F.pandas_udf("bigint")
    def qty_sum(v: pd.Series) -> int:
        return int(v.sum())

    @F.pandas_udf("double")
    def qty_median(v: pd.Series) -> float:
        return float(v.median())

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("bigint").alias("q")
    )
    return li.groupBy("l_returnflag").agg(
        qty_sum("q").alias("sum_qty"), qty_median("q").alias("median_qty")
    )


# ---------------------------------------------------------------------------
# IVF-PQ: coarse cell blocking + PQ ADC scoring (the full FAISS recipe)
# ---------------------------------------------------------------------------
IVFPQ_CELLS = 16  # coarse quantizer size (cells = first 16 quantized vecs)

_IVFPQ_CELL_CTE = f"""
    icents AS (SELECT vec_id AS cell, qd AS ce FROM qv
               WHERE vec_id < {IVFPQ_CELLS}),
    iassign AS (
      SELECT vec_id, cell FROM (
        SELECT v.vec_id, c.cell,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY list_dot_product(v.qd, c.ce) DESC, c.cell
               ) AS rn
        FROM qv v CROSS JOIN icents c
      ) WHERE rn = 1
    ),
    icand AS (
      SELECT q.vec_id AS qid, c.vec_id AS cid
      FROM iassign q JOIN iassign c
        ON q.cell = c.cell AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {PQ_NQ}
    )
"""


@query(
    "sim_ann_ivfpq",
    oracle=f"""
    {_PQ_DUCK_CTE},
    {_IVFPQ_CELL_CTE}
    SELECT qid, cid, score_pq, rk FROM (
      SELECT qid, cid, score_pq,
             row_number() OVER (PARTITION BY qid
                                ORDER BY score_pq DESC, cid)::INT AS rk
      FROM (
        SELECT ca.qid, ca.cid,
               round(CAST(sum(round(l.w * {ML_SCALE})::BIGINT) AS DOUBLE)
                     / {ML_SCALE}.0, 4) AS score_pq
        FROM icand ca
        JOIN codes co ON co.vec_id = ca.cid
        JOIN lut l ON l.qid = ca.qid AND l.m = co.m AND l.code = co.code
        GROUP BY ca.qid, ca.cid
      )
    ) WHERE rk <= {PQ_TOPK}
    """,
    tags=("similarity", "embeddings", "scale"),
)
def sim_ann_ivfpq(spark, sf_dir):
    """IVF-PQ — the full production ANN recipe (FAISS IVFx,PQy; Jégou et
    al. 2011) composed from the two quantizers this registry already
    proves separately: the coarse IVF quantizer prunes the candidate set
    to the query's cell (an equi-join on cell id — search touches ~n/16
    of the corpus), and within the cell candidates are scored by PQ
    asymmetric distance (broadcast LUT join over 8 codes per candidate —
    never the raw vectors). At billion-vector scale this is the shape
    that serves: cells bound the scan, codes bound the memory (32 bits a
    vector), and neither bound touches vector dimensionality.

    Scale shape: cell assignment is a broadcast of 16 centroid rows +
    map-side-combinable argmax (no window over the corpus); the cell
    self-join's fan-out is bounded by cell population; ADC scoring joins
    a broadcast LUT and aggregates exactly-quantized integers. Every
    stage is the already-plan-asserted shape of sim_ann_ivf or sim_ann_pq
    — composition adds no new shuffle pattern.
    """
    codes, lut = _pq_parts(spark, sf_dir)
    qv = _quantized(spark, sf_dir)
    cents = qv.filter(F.col("vec_id") < IVFPQ_CELLS).select(
        F.col("vec_id").alias("cell"), F.col("qd").alias("ce")
    )
    scored_cells = qv.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cell",
        spark_dot(F.col("qd"), F.col("ce")).alias("sim"),
    )
    # argmax via max(struct): (sim DESC, cell ASC) exactly like the
    # oracle's row_number, as a map-side-combinable hash agg
    assign = (
        scored_cells.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    F.col("sim"),
                    (-F.col("cell")).alias("neg_cell"),
                    F.col("cell"),
                )
            ).alias("b")
        )
        .select("vec_id", F.col("b.cell").alias("cell"))
    )
    q = assign.alias("q")
    c = assign.alias("c")
    cand = q.join(
        c,
        (F.col("q.cell") == F.col("c.cell"))
        & (F.col("c.vec_id") != F.col("q.vec_id")),
    ).select(
        F.col("q.vec_id").alias("qid"), F.col("c.vec_id").alias("cid")
    ).filter(F.col("qid") < PQ_NQ)
    scored = (
        cand.join(codes, F.col("cid") == F.col("vec_id"))
        .join(F.broadcast(lut.withColumnRenamed("qid", "lqid")), ["m", "code"])
        .filter(F.col("lqid") == F.col("qid"))
        .groupBy("qid", "cid")
        .agg(
            F.round(
                F.sum(F.round(F.col("w") * ML_SCALE).cast("bigint")).cast(
                    "double"
                )
                / float(ML_SCALE),
                4,
            ).alias("score_pq")
        )
    )
    return scored.withColumn(
        "rk",
        F.row_number()
        .over(W.partitionBy("qid").orderBy(F.desc("score_pq"), "cid"))
        .cast("int"),
    ).filter(F.col("rk") <= PQ_TOPK)


# ---------------------------------------------------------------------------
# PageRank-lite over the near-dup graph (iterative, exact across engines)
# ---------------------------------------------------------------------------
PR_ITERS = 3
PR_DAMP = 0.85

# 3 unrolled damped iterations; contributions quantized to 1e-9 bigints
# before summing so accumulation is order-independent (the kmeans/CC
# exactness recipe applied to rank mass).
_PR_ITER_DUCK = """
  SELECT e.dst AS node,
         round(0.15 / (SELECT n FROM n1)
               + {damp} * (sum(round(r.r / dg.d * {scale})::BIGINT)::DOUBLE
                           / {scale}.0), 9) AS r
  FROM edges e
  JOIN {prev} r ON r.node = e.src
  JOIN deg dg ON dg.src = e.src
  GROUP BY e.dst
"""


def _pr_oracle() -> str:
    from doc2dataset_spark.queries.dedup import _SIMHASH_CTE

    it = "r0"
    chain = ""
    for i in range(1, PR_ITERS + 1):
        chain += f", it{i} AS ({_PR_ITER_DUCK.format(prev=it, damp=PR_DAMP, scale=ML_SCALE)})"
        it = f"it{i}"
    return (
        _SIMHASH_CTE
        + """
, bands AS (
  SELECT doc_id, simhash, k, (simhash >> (k * 8)) & 255 AS bandval
  FROM fp, (SELECT unnest(range(4)) AS k)
), pairs AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM bands a JOIN bands b
    ON a.k = b.k AND a.bandval = b.bandval AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
), edges AS (
  SELECT da AS src, db AS dst FROM pairs
  UNION ALL SELECT db, da FROM pairs
), nodes AS (
  SELECT DISTINCT src AS node FROM edges
), deg AS (
  SELECT src, count(*)::BIGINT AS d FROM edges GROUP BY src
), n1 AS (SELECT count(*)::BIGINT AS n FROM nodes),
r0 AS (
  SELECT node, round(1.0 / (SELECT n FROM n1), 9) AS r FROM nodes
)"""
        + chain
        + f"""
SELECT node AS doc_id, r AS pagerank FROM it{PR_ITERS}
"""
    )


@query("graph_pagerank", oracle=_pr_oracle(), tags=("graph", "documents", "scale"))
def graph_pagerank(spark, sf_dir):
    """PageRank (3 damped iterations) over the SimHash near-dup graph —
    rank mass concentrates on documents with many near-duplicates, the
    standard centrality signal for picking cluster canonicals or spotting
    template hubs. Second iterative-graph operator after connected
    components, same driver-loop discipline: per round one distributed
    join + aggregate, only the iteration COUNTER on the driver.

    Exactness across engines: per-edge contributions r/deg are quantized
    to 1e-9 bigints before the in-neighbor sum (order-independent integer
    accumulation), and each new rank is re-rounded to 9 dp — the oracle
    unrolls the identical three iterations in SQL.

    Scale shape: the edge list is localCheckpointed once (the
    triangle-enumeration treatment — the candidate pipeline must not
    re-execute per round); each iteration is an equi-join on src +
    map-side-combinable integer sum keyed by dst; rank state is one row
    per node. Degrees and node count are computed once. At 100 TB the
    per-round shuffle is bounded by edge count, exactly like CC.
    """
    from doc2dataset_spark.queries.dedup import dedup_simhash_pairs

    pairs = dedup_simhash_pairs(spark, sf_dir).select("da", "db")
    edges = (
        pairs.union(pairs.select(F.col("db"), F.col("da")))
        .toDF("src", "dst")
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n = nodes.count()
    ranks = nodes.select(
        "node", F.round(F.lit(1.0) / F.lit(n), 9).alias("r")
    )
    base = F.lit(0.15) / F.lit(n)
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(ranks, F.col("src") == F.col("node"))
            .join(deg, "src")
            .select(
                "dst",
                F.round(F.col("r") / F.col("d") * ML_SCALE)
                .cast("bigint")
                .alias("c"),
            )
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("sc"))
            .select(
                F.col("dst").alias("node"),
                F.round(
                    base
                    + F.lit(PR_DAMP)
                    * (F.col("sc").cast("double") / float(ML_SCALE)),
                    9,
                ).alias("r"),
            )
        )
    return ranks.select("node", "r").toDF("doc_id", "pagerank")


# ---------------------------------------------------------------------------
# per-cluster canonical selection: CC labels × quality → keep/drop
# ---------------------------------------------------------------------------


@query(
    "dedup_cc_canonical",
    oracle=None,  # assigned below — needs the CC CTE chain from dedup.py
    tags=("dedup", "documents", "graph", "curation"),
)
def dedup_cc_canonical(spark, sf_dir):
    """The decision step the dedup stack exists for: each near-dup
    cluster (connected components over SimHash pairs) keeps exactly ONE
    document — the member with the richest vocabulary (max distinct-token
    count, doc_id tiebreak) — and every other member is marked for drop.
    Emits (doc_id, cluster_id, n_members, canonical_id, keep); a corpus
    rewrite is then a semi-join on keep=true.

    Scale shape: the cluster frame is the dedup_cluster_cc output (its
    per-round shuffles are the cost; this adds ONE more); the quality
    scalar is a row-local expression on documents joined by doc_id, and
    canonical selection is a map-side-combinable max(struct) per cluster
    broadcast back — no window over raw documents, no new pairwise work.
    """
    from doc2dataset_spark.queries.dedup import dedup_cluster_cc

    cc = dedup_cluster_cc(spark, sf_dir)
    quality = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.array_distinct(F.expr(_TOKS))).alias("n_distinct"),
    )
    members = cc.join(quality, "doc_id")
    best = members.groupBy("cluster_id").agg(
        F.count("*").alias("n_members"),
        F.max(
            F.struct(
                F.col("n_distinct"),
                (-F.col("doc_id")).alias("neg_id"),
                F.col("doc_id"),
            )
        ).alias("b"),
    ).select(
        "cluster_id", "n_members", F.col("b.doc_id").alias("canonical_id")
    )
    return members.join(F.broadcast(best), "cluster_id").select(
        "doc_id",
        "cluster_id",
        "n_members",
        "canonical_id",
        (F.col("doc_id") == F.col("canonical_id")).alias("keep"),
    )


def _cc_canonical_oracle() -> str:
    from doc2dataset_spark.queries.dedup import _CC_CTE_CHAIN

    return (
        _CC_CTE_CHAIN
        + f"""
, quality AS (
  SELECT doc_id, len(list_distinct({_DTOKS})) AS n_distinct
  FROM documents
), members AS (
  SELECT c.doc_id, c.cluster_id, q.n_distinct
  FROM cc c JOIN quality q USING (doc_id)
), best AS (
  SELECT cluster_id, count(*)::BIGINT AS n_members,
         (max({{'nd': n_distinct, 'ni': -doc_id, 'id': doc_id}})).id
           AS canonical_id
  FROM members GROUP BY cluster_id
)
SELECT m.doc_id, m.cluster_id, b.n_members, b.canonical_id,
       m.doc_id = b.canonical_id AS keep
FROM members m JOIN best b USING (cluster_id)
"""
    )


# attach the oracle after definition (the CTE chain import would be
# circular at module top)
from doc2dataset_spark.queries.core import REGISTRY as _REG  # noqa: E402

_REG["dedup_cc_canonical"].oracle = _cc_canonical_oracle()


# ---------------------------------------------------------------------------
# PQ retrieve-then-rerank: the production search pattern
# ---------------------------------------------------------------------------
PQ_RERANK_CAND = 32  # ADC candidate cut before exact re-ranking


def _pq_rerank_top(spark, sf_dir):
    """(qid, cid, cos, rk): PQ ADC retrieves PQ_RERANK_CAND candidates,
    exact cosine re-ranks them to PQ_TOPK — shared by the search query
    and its recall eval."""
    cand = _pq_top(spark, sf_dir, k=PQ_RERANK_CAND).select("qid", "cid")
    n = normalized_embeddings(spark, sf_dir)
    # candidates are ≤ NQ×CAND rows — broadcast them and stream the
    # (possibly 100 TB) vector table through two equi-joins
    rr = (
        n.join(
            F.broadcast(cand), F.col("vec_id") == F.col("qid")
        )
        .select("qid", "cid", F.col("ne").alias("qne"))
        .join(
            n.select(F.col("vec_id").alias("cid2"), F.col("ne").alias("cne")),
            F.col("cid") == F.col("cid2"),
        )
        .select(
            "qid", "cid", spark_dot(F.col("qne"), F.col("cne")).alias("cos")
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos"), "cid")
    return (
        rr.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= PQ_TOPK)
    )


_PQ_RERANK_DUCK = f"""
    {_pq_duck_cte(PQ_RERANK_CAND)},
    nn AS ({NORM_EMB_DUCK}),
    rr AS (
      SELECT p.qid, p.cid, list_dot_product(q.ne, c.ne) AS cos
      FROM pq_top p
      JOIN nn q ON q.vec_id = p.qid
      JOIN nn c ON c.vec_id = p.cid
    ),
    rr_top AS (
      SELECT qid, cid, cos, rk FROM (
        SELECT qid, cid, cos,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY cos DESC, cid)::INT AS rk
        FROM rr
      ) WHERE rk <= {PQ_TOPK}
    )
"""


@query(
    "sim_ann_pq_rerank",
    oracle=f"""
    {_PQ_RERANK_DUCK}
    SELECT qid, cid, cos, rk FROM rr_top
    """,
    tags=("similarity", "embeddings", "scale"),
)
def sim_ann_pq_rerank(spark, sf_dir):
    """PQ retrieve-then-rerank — the production pattern the round-6
    clustered-recall characterization (BASELINE.md) motivates: 32-bit ADC
    codes separate clusters but not within-cluster fine structure (ADC
    recall@5 measured 0.09–0.23), so ADC's job is CANDIDATE RETRIEVAL
    (top-PQ_RERANK_CAND by compressed score) and a full-precision cosine
    pass over just those candidates produces the final top-PQ_TOPK.

    Scale shape: the ADC stage is sim_ann_pq's (broadcast LUT, integer
    partial-dot aggregation); the rerank touches only |Q|×CAND candidate
    rows, broadcast against the vector table's two equi-join probes —
    full-precision vectors are read for candidates only, never pairwise.
    The rerank window sorts ≤ CAND rows per query."""
    return _pq_rerank_top(spark, sf_dir)


@query(
    "ann_pq_rerank_recall",
    oracle=f"""
    {_PQ_RERANK_DUCK},
    exact_top AS (
      SELECT qid, cid FROM (
        SELECT q.vec_id AS qid, c.vec_id AS cid,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_dot_product(q.ne, c.ne) DESC, c.vec_id
               ) AS rk
        FROM nn q JOIN nn c ON q.vec_id < {PQ_NQ}
         AND c.vec_id <> q.vec_id
      ) WHERE rk <= {PQ_TOPK}
    )
    SELECT e.qid,
           count(p.cid)::BIGINT AS n_hits,
           round(count(p.cid)::DOUBLE / {PQ_TOPK}, 4) AS recall
    FROM exact_top e
    LEFT JOIN rr_top p ON p.qid = e.qid AND p.cid = e.cid
    GROUP BY e.qid
    """,
    tags=("similarity", "embeddings", "eval"),
)
def ann_pq_rerank_recall(spark, sf_dir):
    """recall@5 of retrieve-then-rerank vs exact brute force, per query —
    quantifies how much recall the exact re-rank buys back over raw ADC
    (ann_pq_recall): every exact top-5 neighbor that survives the
    CAND-wide ADC cut is recovered by the full-precision pass, so the
    residual loss is purely ADC's candidate-retrieval miss rate.

    Scale shape: exact side = the capped broadcast-query brute force of
    ann_pq_recall; rerank side is top-k-bounded; the comparison joins two
    ≤|Q|×k frames."""
    n = normalized_embeddings(spark, sf_dir)
    q = n.filter(F.col("vec_id") < PQ_NQ).select(
        F.col("vec_id").alias("qid"), F.col("ne").alias("qne")
    )
    exact = (
        n.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("cid"),
            spark_dot(F.col("qne"), F.col("ne")).alias("cos"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("qid").orderBy(F.desc("cos"), "cid")
            ),
        )
        .filter(F.col("rk") <= PQ_TOPK)
        .select("qid", "cid")
    )
    rr = _pq_rerank_top(spark, sf_dir).select(
        F.col("qid").alias("rqid"), F.col("cid").alias("rcid")
    )
    hits = exact.join(
        rr,
        (F.col("qid") == F.col("rqid")) & (F.col("cid") == F.col("rcid")),
        "left",
    )
    return hits.groupBy("qid").agg(
        F.count("rcid").alias("n_hits"),
        F.round(F.count("rcid").cast("double") / PQ_TOPK, 4).alias("recall"),
    )


# ---------------------------------------------------------------------------
# bloom-prefiltered decontamination (round 6) — registered post-gate
# ---------------------------------------------------------------------------
from doc2dataset_spark.queries.dedup import (  # noqa: E402
    _CONTAIN_ORACLE,
    _H48_SPARK,
    _doc_shingles,
    CONTAIN_THRESHOLD,
    N_TEST_DOCS,
)

BLOOM_PREFILTER_W = 1 << 20  # sketch width: the broadcast's hard cap


@query(
    "dedup_decontam_bloom",
    oracle=_CONTAIN_ORACLE,
    tags=("dedup", "documents", "decontamination", "scale"),
)
def dedup_decontam_bloom(spark, sf_dir):
    """test-set decontamination with a BLOOM pre-filter — same exact
    semantics as dedup_ngram_containment (the oracle is literally the
    same SQL; rewrite equality IS the test, the q12b discipline), but
    the corpus shingle stream is first screened against a relational
    bloom bit-set built over the test side's shingles: one shared-hash
    bit position per shingle modulo BLOOM_PREFILTER_W, distinct test
    bits broadcast (≤ W rows — a PARAMETER bound, however large the
    held-out suite), corpus shingles pre-filtered by a left-semi join
    on their bit before the exact containment join pays any shuffle.

    Why this variant exists: the broadcast-test-side join of
    dedup_ngram_containment assumes the test shingle frame fits in
    executor memory. The bit-set caps phase 1's broadcast at the sketch
    width; false positives are removed by the exact join, false
    negatives don't exist (every true match shares its bit), so
    exactness is preserved by construction. (Spark's internal
    bloom_filter_agg/might_contain pair is not exposed as a public SQL
    routine in 4.1 — the relational formulation is the same mechanism
    with an inspectable plan, the agg_bloom_filter approach.)"""
    from pyspark.sql import Window as W

    sd = _doc_shingles(spark, sf_dir)
    test = (
        sd.filter(F.col("doc_id") < N_TEST_DOCS)
        .withColumn("n", F.count("*").over(W.partitionBy("doc_id")))
        .select(
            F.col("doc_id").alias("test_id"), F.col("sh").alias("tsh"), "n"
        )
    )
    tbits = test.select(
        (F.expr(_H48_SPARK.format(s="tsh")) % BLOOM_PREFILTER_W).alias("bit")
    ).distinct()
    corpus = (
        sd.withColumn(
            "bit", F.expr(_H48_SPARK.format(s="sh")) % BLOOM_PREFILTER_W
        )
        .join(F.broadcast(tbits), "bit", "left_semi")
        .select("doc_id", "sh")
    )
    shared = (
        F.broadcast(test)
        .join(
            corpus,
            (F.col("tsh") == F.col("sh"))
            & (F.col("test_id") != F.col("doc_id")),
        )
        .groupBy("test_id", F.col("doc_id").alias("corpus_id"), "n")
        .agg(F.count("*").alias("sh_n"))
    )
    contain = F.col("sh_n").cast("double") / F.col("n")
    return shared.filter(contain >= CONTAIN_THRESHOLD).select(
        "test_id", "corpus_id", F.round(contain, 4).alias("containment")
    )
