"""Round-7 coverage extras: two more canonical TPC-H plans and three
corpus-curation accounting ops a training-data run needs, each with an
exact DuckDB oracle.

- ``q48_tpch_q10``           returned-item revenue report: 4-way join,
                             grouped decimal sum, global top-20.
- ``q49_tpch_q18``           large-volume orders: aggregate-HAVING
                             derived table joined back to orders —
                             the classic "semi-join on an agg" plan.
- ``curriculum_length_buckets`` decile bucketing by EXACT percentile
                             cutoffs computed once and broadcast — the
                             scale-safe replacement for ntile()'s
                             global-sort window (which the registry
                             plan gate bans).
- ``corpus_source_overlap``  source×source shared-head-fingerprint
                             contamination matrix — which sources
                             duplicate each other, the planning input
                             for cross-source dedup priorities.
- ``text_lang_fertility``    per-language tokenizer fertility
                             (chars/token) and volume accounting.

Scale notes in each docstring; no global sorts, no unpartitioned
windows, every join either broadcast-dim or bounded-key equi-join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from doc2dataset_spark.queries.core import dsum, query, sql_dsum
from doc2dataset_spark.queries.pipeline_extras import HEAD_WORDS
from doc2dataset_spark.queries.textops import _DTOKS, _TOKS
from doc2dataset_spark.session import load_table

Q48_START = "1995-07-01"
Q48_END = "1995-10-01"
Q48_TOPK = 20
Q49_MIN_QTY = 150
N_BUCKETS = 10
_PCTS = [i / N_BUCKETS for i in range(1, N_BUCKETS)]  # 0.1 .. 0.9
_PCTS_SQL = ", ".join(str(p) for p in _PCTS)


@query(
    "q48_tpch_q10",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
           round(c.c_acctbal, 2) AS c_acctbal
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '{Q48_START}'
      AND o.o_orderdate < TIMESTAMP '{Q48_END}'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT {Q48_TOPK}
    """,
    tags=("sql", "tpch"),
)
def q48_tpch_q10(spark, sf_dir):
    """TPC-H Q10 (returned-item reporting, adapted to the shipped
    columns): top-20 customers by revenue on returned lineitems in a
    quarter. The canonical fact⋈fact⋈dim⋈dim report plan.

    Scale shape: the date window prunes orders and the returnflag
    literal prunes lineitem AT THE SCAN; the l⋈o join shuffles on
    orderkey, customer/nation broadcast after filtering; the grouped sum
    is decimal-exact (order-independent) and the top-20 is
    TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= Q48_START)
        & (F.col("o_orderdate") < Q48_END)
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            )
        )
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(Q48_TOPK)
    )


@query(
    "q49_tpch_q18",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity)::BIGINT AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > {Q49_MIN_QTY}
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
           round(o.o_totalprice, 2) AS o_totalprice,
           b.total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    tags=("sql", "tpch"),
)
def q49_tpch_q18(spark, sf_dir):
    """TPC-H Q18 (large-volume customers): orders whose lineitems total
    more than Q49_MIN_QTY units, joined back to order and customer
    detail — the aggregate-derived-table semi-join plan (GROUP BY +
    HAVING feeding a join, not a correlated subquery per row).

    Scale shape: the quantity aggregate is map-side combinable on the
    natural lineitem key (l_orderkey — bounded rows per key), its
    HAVING output is a tiny fraction of orders (AQE broadcast-eligible),
    and both detail joins are key-equi. l_quantity is integral in the
    data, so the BIGINT total is exact on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("total_qty"))
        .filter(F.col("total_qty") > Q49_MIN_QTY)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias(
                "o_orderdate"
            ),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )


@query(
    "curriculum_length_buckets",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, len({_DTOKS})::BIGINT AS n_tokens FROM documents
      WHERE len({_DTOKS}) > 0
    ), cuts AS (
      SELECT quantile_cont(n_tokens, [{_PCTS_SQL}]) AS cs FROM t
    )
    SELECT doc_id, n_tokens,
           (len(list_filter(cuts.cs, c -> n_tokens > c)) + 1)::INT
             AS bucket
    FROM t CROSS JOIN cuts
    """,
    tags=("curation", "documents", "sampling"),
)
def curriculum_length_buckets(spark, sf_dir):
    """Curriculum / length-stratified bucketing: every document assigned
    to one of N_BUCKETS deciles of the token-length distribution — the
    stratification key behind length-curriculum schedules and
    bucket-balanced batch sampling.

    The naive spelling is ``ntile(10) OVER (ORDER BY n_tokens)`` — a
    global-sort single-partition window, exactly what the registry plan
    gate bans. The scale-safe plan computes the 9 exact interpolated
    percentile cutoffs ONCE (scalar aggregate, partial-merged), then
    assigns buckets row-locally against the broadcast 1-row cutoff
    array: zero global sort, one tiny shuffle for the cutoff agg, one
    codegen stage for assignment. (Semantics differ from ntile only on
    ties/equal-count guarantees — cutoff-bucketing is the one that's
    actually wanted for curricula, since equal VALUES land in equal
    buckets.) Spark `percentile` == DuckDB `quantile_cont` (both
    interpolate at rank (n-1)p — the agg_percentiles precedent)."""
    t = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(F.expr(_TOKS)).cast("bigint").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
    )
    pcts = ", ".join(str(p) for p in _PCTS)
    cuts = t.agg(
        F.expr(f"percentile(n_tokens, array({pcts}))").alias("cs")
    )
    return t.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "n_tokens",
        (
            F.size(F.expr("filter(cs, c -> n_tokens > c)")) + 1
        ).cast("int").alias("bucket"),
    )


@query(
    "corpus_source_overlap",
    oracle=f"""
    WITH fp AS (
      SELECT DISTINCT
             md5(array_to_string({_DTOKS}[1:{HEAD_WORDS}], ' ')) AS fp,
             source
      FROM documents WHERE len({_DTOKS}) > 0
    )
    SELECT a.source AS source_a, b.source AS source_b,
           count(*)::BIGINT AS shared_heads
    FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
    GROUP BY a.source, b.source
    """,
    tags=("dedup", "documents", "accounting"),
)
def corpus_source_overlap(spark, sf_dir):
    """Cross-source contamination matrix: for every source pair, how
    many distinct head-fingerprints they share — the measurement that
    decides cross-source dedup priorities (dedup_cross_source) and
    flags a source as a re-crawl of another.

    Scale shape: fingerprints are row-local md5s; the distinct
    (fp, source) frame is corpus-bounded; the pair join is an equi-join
    on fp whose per-key fan-out is bounded by the source count (≤ S rows
    per fingerprint after distinct), so worst-case join output is
    S²/2 per fingerprint — a parameter, not data."""
    fp = (
        load_table(spark, sf_dir, "documents")
        .filter(F.size(F.expr(_TOKS)) > 0)
        .select(
            F.md5(
                F.expr(f"array_join(slice({_TOKS}, 1, {HEAD_WORDS}), ' ')")
            ).alias("fp"),
            "source",
        )
        .distinct()
    )
    a = fp.alias("a")
    b = fp.select(
        F.col("fp").alias("fp_b"), F.col("source").alias("source_b")
    )
    return (
        a.join(
            b,
            (F.col("fp") == F.col("fp_b"))
            & (F.col("source") < F.col("source_b")),
        )
        .groupBy(F.col("source").alias("source_a"), "source_b")
        .agg(F.count("*").alias("shared_heads"))
    )


@query(
    "text_lang_fertility",
    oracle=f"""
    SELECT lang,
           count(*)::BIGINT AS n_docs,
           sum(len({_DTOKS}))::BIGINT AS n_tokens,
           sum(n_chars)::BIGINT AS total_chars,
           round(sum(n_chars)::DOUBLE
                 / greatest(sum(len({_DTOKS})), 1), 4) AS chars_per_token
    FROM documents
    GROUP BY lang
    """,
    tags=("text", "documents", "accounting"),
)
def text_lang_fertility(spark, sf_dir):
    """Per-language tokenizer-fertility accounting: docs, tokens, chars,
    and chars/token per language — the table that calibrates per-language
    token budgets (fertility differences are why 'equal bytes' is not
    'equal tokens' across languages).

    Scale shape: one map-side-combinable aggregate keyed by lang (all
    inputs integral, ratio derived post-agg from exact sums — bit-equal
    on both engines)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.expr(_TOKS))).cast("bigint").alias("n_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.round(
            F.sum("n_chars").cast("double")
            / F.greatest(F.sum(F.size(F.expr(_TOKS))), F.lit(1)),
            4,
        ).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------------
# cluster-balanced diversity sampling
# ---------------------------------------------------------------------------
CLUSTER_CAP = 25  # max docs kept per embedding cell


@query(
    "sample_cluster_balanced",
    oracle=None,  # set below (needs the shared _IVF_ASSIGN_DUCK import)
    tags=("sampling", "embeddings", "documents", "curation"),
)
def sample_cluster_balanced(spark, sf_dir):
    """Diversity sampling: cap the corpus at CLUSTER_CAP documents per
    embedding cell, keeping the highest-quality docs (distinct-token
    fraction in ppm — integer, engine-exact) with doc_id tiebreak. The
    SemDeDup-adjacent recipe for flattening over-represented semantic
    modes without dropping rare ones.

    Scale shape: cell assignment is the shared 16-row-broadcast argmax
    (dedup.cell_assignments). A naive per-cell rank is a window over
    cent_id — K=16 partitions means corpus/16 rows through ONE task's
    sort at 100 TB. This plan is the exact TWO-PHASE top-k instead:
    a local top-CAP per (cell, input partition) — any global winner is
    necessarily a local winner — then the final per-cell rank sees at
    most P×CAP rows per cell. Both windows are bounded; no
    corpus-scale sort anywhere."""
    from doc2dataset_spark.queries.dedup import cell_assignments
    from pyspark.sql import Window as W

    # integer DIV end-to-end: the oracle uses exact // and a float
    # intermediate can shift the ppm by 1 via double rounding (the
    # sample_mixture_rebalance lesson from the round-6 advisory)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            f"CAST(1000000 * size(array_distinct({_TOKS})) AS BIGINT)"
            f" DIV size({_TOKS})"
        ).alias("quality_ppm"),
    ).filter(F.size(F.expr(_TOKS)) > 0)
    assigned = (
        cell_assignments(spark, sf_dir)
        .select(F.col("vec_id").alias("doc_id"), "cent_id")
        .join(d, "doc_id")
    )
    part = assigned.withColumn("pid", F.spark_partition_id())
    w_local = W.partitionBy("cent_id", "pid").orderBy(
        F.desc("quality_ppm"), "doc_id"
    )
    local = (
        part.withColumn("rn", F.row_number().over(w_local))
        .filter(F.col("rn") <= CLUSTER_CAP)
        .drop("rn", "pid")
    )
    w_final = W.partitionBy("cent_id").orderBy(
        F.desc("quality_ppm"), "doc_id"
    )
    return (
        local.withColumn("rk", F.row_number().over(w_final))
        .filter(F.col("rk") <= CLUSTER_CAP)
        .select("doc_id", "cent_id", "quality_ppm", F.col("rk").cast("int").alias("rk"))
    )


def _set_cluster_balanced_oracle() -> None:
    from doc2dataset_spark.queries.core import REGISTRY as _reg
    from doc2dataset_spark.queries.dedup import _IVF_ASSIGN_DUCK

    _reg["sample_cluster_balanced"].oracle = f"""
    WITH {_IVF_ASSIGN_DUCK},
    d AS (
      SELECT doc_id,
             (1000000 * len(list_distinct({_DTOKS})))
               // len({_DTOKS}) AS quality_ppm
      FROM documents WHERE len({_DTOKS}) > 0
    ),
    j AS (
      SELECT a.vec_id AS doc_id, a.cent_id, d.quality_ppm
      FROM assign a JOIN d ON d.doc_id = a.vec_id
    )
    SELECT doc_id, cent_id, quality_ppm, rk FROM (
      SELECT doc_id, cent_id, quality_ppm,
             row_number() OVER (
               PARTITION BY cent_id
               ORDER BY quality_ppm DESC, doc_id
             )::INT AS rk
      FROM j
    ) WHERE rk <= {CLUSTER_CAP}
    """


_set_cluster_balanced_oracle()


# ---------------------------------------------------------------------------
# index-served IVF ANN: the persisted-vector-index serve path, driver-hashed
# ---------------------------------------------------------------------------
@query(
    "sim_ann_ivf_indexed",
    oracle=None,  # set below: identical to sim_ann_ivf by design
    tags=("similarity", "embeddings", "index"),
)
def sim_ann_ivf_indexed(spark, sf_dir):
    """sim_ann_ivf served from the PERSISTED IVF index
    (operators/vector_index.py): centroids + cell-partitioned postings
    are read from parquet written once at build time; each query reads
    only its probed cells' partitions. Identical oracle — the
    quantization rule and scoring math are shared — so the driver
    hash-verifies index-served == in-query ANN (the search_bm25_indexed
    discipline applied to vectors). Reuses curate_corpus_indexed's
    mtime-keyed cached index (same artifact)."""
    from doc2dataset_spark.fsio import ensure_local_cache_dir
    from doc2dataset_spark.operators.vector_index import (
        build_ivf_index,
        probe_ivf_index,
    )
    from doc2dataset_spark.queries.dedup import normalized_embeddings
    from doc2dataset_spark.queries.pipeline_extras import _cached_index_dir
    from doc2dataset_spark.queries.scale import IVF_TOP_K

    idx = ensure_local_cache_dir(
        _cached_index_dir(sf_dir),
        "centroids",
        lambda tmp: build_ivf_index(spark, sf_dir, tmp),
    )
    queries_df = normalized_embeddings(spark, sf_dir).select(
        F.col("vec_id").alias("qid"), F.col("ne").alias("qne")
    )
    return probe_ivf_index(spark, idx, queries_df, nprobe=1, topk=IVF_TOP_K)


def _set_ivf_indexed_oracle() -> None:
    from doc2dataset_spark.queries.core import REGISTRY as _reg

    _reg["sim_ann_ivf_indexed"].oracle = _reg["sim_ann_ivf"].oracle


_set_ivf_indexed_oracle()


# ---------------------------------------------------------------------------
# salted replicated join: the skewed-key JOIN twin of agg_salted_two_phase
# ---------------------------------------------------------------------------
JOIN_SALT = 8


@query(
    "join_salted_replicated",
    oracle=f"""
    WITH dim AS (
      SELECT source, count(*)::BIGINT AS src_docs,
             sum(n_chars)::BIGINT AS src_chars
      FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source, m.src_docs,
           (d.n_chars * 1000000 // m.src_chars)::BIGINT AS char_share_ppm
    FROM documents d JOIN dim m USING (source)
    """,
    tags=("relational", "scale", "skew"),
)
def join_salted_replicated(spark, sf_dir):
    """Skew-mitigated equi-join by SALT REPLICATION: the fact side's hot
    join key (source — a handful of values owning the whole corpus, the
    canonical skew shape) is extended with salt = xxhash64(doc_id) % S,
    and the dim side is exploded into S replicas, so each hot key's rows
    spread across S reducer partitions instead of ONE straggler task.
    agg_salted_two_phase covers the aggregation flavor; this is the join
    flavor — the other half of the skew playbook (used when the dim is
    too big to broadcast; AQE's skew-join split is the automatic cousin,
    this is the declarative form that also works pre-AQE and for
    deliberate partitioning).

    The oracle is the PLAIN join — rewrite equality IS the test (the
    q12b discipline). Integer share math keeps both engines bit-equal.
    Plan-asserted: the salted join is a shuffle join on (source, salt),
    never a broadcast (which would mask the pattern)."""
    d = load_table(spark, sf_dir, "documents")
    dim = d.groupBy("source").agg(
        F.count("*").alias("src_docs"),
        F.sum("n_chars").cast("bigint").alias("src_chars"),
    )
    salted_dim = dim.select(
        "*", F.explode(F.array(*[F.lit(i) for i in range(JOIN_SALT)])).alias("salt")
    )
    fact = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.pmod(F.xxhash64("doc_id"), F.lit(JOIN_SALT)).alias("salt"),
    )
    return (
        fact.hint("SHUFFLE_HASH")
        .join(salted_dim, ["source", "salt"])
        .select(
            "doc_id",
            "source",
            "src_docs",
            F.expr("CAST(n_chars * 1000000 DIV src_chars AS BIGINT)").alias(
                "char_share_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# hybrid retrieval: BM25 + vector-cosine reciprocal-rank fusion
# ---------------------------------------------------------------------------
RRF_K = 60
RRF_TOPK = 10
HYBRID_QVEC = 0  # query vector id (doc ids and vec ids share the key space)


@query(
    "search_hybrid_rrf",
    oracle=None,  # set below (reuses the BM25 oracle text + NORM_EMB_DUCK)
    tags=("search", "similarity", "documents", "embeddings"),
)
def search_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval with reciprocal-rank fusion: the BM25 ranking
    for QUERY_TERMS and the exact-cosine ranking for query vector
    HYBRID_QVEC are fused as sum(1/(RRF_K + rank)) — the standard
    score-scale-free way to combine lexical and semantic retrieval.
    Ranks (not scores) make the fusion deterministic: both rank lists
    carry doc_id tiebreaks, and the fused score is a sum of two exact
    rationals rounded to 6 (identical on both engines).

    Scale shape: each side is its own already-scale-audited plan (BM25:
    pruned postings, no global window; cosine: brute-force against ONE
    query vector — corpus-linear, map-side top-k). Each side's top-200
    cut is a TakeOrderedAndProject (distributed partial top-k); the rank
    windows then run AFTER the limit, over ≤200 rows already sitting in
    the limit's single partition — parameter-bounded by construction,
    whitelisted as such in the registry plan gate. The fusion is a tiny
    outer join on doc_id. At serve time both sides read the persisted
    indexes instead (search_bm25_indexed / sim_ann_ivf_indexed paths)."""
    from pyspark.sql import Window as W

    from doc2dataset_spark.queries.dedup import normalized_embeddings, spark_dot
    from doc2dataset_spark.queries.search_extras import _bm25_scored

    PER_SIDE = 200  # candidate cut per retriever before fusion

    # lexical side: the full BM25 scored frame (not the top-20 query),
    # top-PER_SIDE via TakeOrdered, then rank within the bounded cut
    bm = (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.desc("score"), "doc_id")
        .limit(PER_SIDE)
    )
    w_bm = W.orderBy(F.desc("score"), "doc_id")
    lex = bm.withColumn(
        "r_lex", F.row_number().over(w_bm)
    ).select("doc_id", "r_lex")

    n = normalized_embeddings(spark, sf_dir)
    qv = n.filter(F.col("vec_id") == HYBRID_QVEC).select(
        F.col("ne").alias("qne")
    )
    cos = (
        n.filter(F.col("vec_id") != HYBRID_QVEC)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            spark_dot(F.col("ne"), F.col("qne")).alias("cos"),
        )
        .orderBy(F.desc("cos"), "doc_id")
        .limit(PER_SIDE)
    )
    w_cos = W.orderBy(F.desc("cos"), "doc_id")
    sem = cos.withColumn("r_sem", F.row_number().over(w_cos)).select(
        "doc_id", "r_sem"
    )

    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("r_lex", F.lit(0)).cast("int").alias("r_lex"),
            F.coalesce("r_sem", F.lit(0)).cast("int").alias("r_sem"),
            F.round(
                F.when(
                    F.col("r_lex").isNotNull(),
                    1.0 / (RRF_K + F.col("r_lex")),
                ).otherwise(0.0)
                + F.when(
                    F.col("r_sem").isNotNull(),
                    1.0 / (RRF_K + F.col("r_sem")),
                ).otherwise(0.0),
                6,
            ).alias("rrf"),
        )
    )
    return fused.orderBy(F.desc("rrf"), "doc_id").limit(RRF_TOPK)


def _set_hybrid_oracle() -> None:
    from doc2dataset_spark.queries.core import REGISTRY as _reg
    from doc2dataset_spark.queries.dedup import NORM_EMB_DUCK
    from doc2dataset_spark.queries.search_extras import (
        BM25_B,
        BM25_K1,
        _TERMS_SQL,
    )

    _reg["search_hybrid_rrf"].oracle = f"""
    WITH tok AS (
      SELECT doc_id, unnest({_DTOKS}) AS term FROM documents
    ), dl AS (
      SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY doc_id
    ), stats AS (
      SELECT count(*)::BIGINT AS n,
             (SELECT sum(dl)::DOUBLE / count(*) FROM dl) AS avgdl
      FROM dl
    ), tf AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok
      WHERE term IN ({_TERMS_SQL}) GROUP BY doc_id, term
    ), dfx AS (
      SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tf GROUP BY term
    ), scored AS (
      SELECT tf.doc_id,
             round(sum(
               ln((s.n - dfx.df + 0.5) / (dfx.df + 0.5) + 1.0)
               * (tf.tf * ({BM25_K1} + 1.0))
               / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                  + {BM25_B} * dl.dl / s.avgdl))
             ), 4) AS score
      FROM tf
      JOIN dfx USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats s
      GROUP BY tf.doc_id
    ), lex AS (
      SELECT doc_id, rn AS r_lex FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY score DESC, doc_id) AS rn
        FROM scored
      ) WHERE rn <= 200
    ), nv AS ({NORM_EMB_DUCK}),
    qv AS (SELECT ne AS qne FROM nv WHERE vec_id = {HYBRID_QVEC}),
    cosd AS (
      SELECT nv.vec_id AS doc_id,
             list_dot_product(nv.ne, qv.qne) AS cos
      FROM nv CROSS JOIN qv WHERE nv.vec_id <> {HYBRID_QVEC}
    ), sem AS (
      SELECT doc_id, rn AS r_sem FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY cos DESC, doc_id) AS rn
        FROM cosd
      ) WHERE rn <= 200
    ), fused AS (
      SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
             coalesce(l.r_lex, 0)::INT AS r_lex,
             coalesce(s.r_sem, 0)::INT AS r_sem,
             round(
               coalesce(1.0 / ({RRF_K} + l.r_lex), 0.0)
               + coalesce(1.0 / ({RRF_K} + s.r_sem), 0.0), 6) AS rrf
      FROM lex l FULL OUTER JOIN sem s USING (doc_id)
    )
    SELECT doc_id, r_lex, r_sem, rrf FROM (
      SELECT doc_id, r_lex, r_sem, rrf,
             row_number() OVER (ORDER BY rrf DESC, doc_id) AS rn
      FROM fused
    ) WHERE rn <= {RRF_TOPK}
    """


_set_hybrid_oracle()


# ---------------------------------------------------------------------------
# one-pass column profiling (the SUMMARIZE / data-profiling workload)
# ---------------------------------------------------------------------------
_PROFILE_COLS = ["doc_id", "lang", "source", "n_chars"]


@query(
    "profile_documents",
    oracle="\n    UNION ALL\n".join(
        f"""
    SELECT '{c}' AS col_name,
           count(*)::BIGINT AS n_rows,
           (count(*) - count({c}))::BIGINT AS n_null,
           count(DISTINCT {c})::BIGINT AS n_distinct,
           min({c})::VARCHAR AS min_str,
           max({c})::VARCHAR AS max_str
    FROM documents"""
        for c in _PROFILE_COLS
    ),
    tags=("quality", "documents", "profiling"),
)
def profile_documents(spark, sf_dir):
    """Column profiling in ONE scan: per-column row/null/exact-distinct
    counts and min/max (stringified for a uniform schema) — the
    SUMMARIZE / data-contract baseline a quality dashboard reads.

    Scale shape: a single wide aggregate computes every column's
    profile in one pass (Catalyst plans the multiple exact DISTINCTs via
    one Expand — one shuffle, rows×|cols| expanded but map-side
    combined), then a literal-keyed stack reshapes the 1-row result into
    one row per column — no per-column re-scan, no second pass over the
    data. text is profiled via the quality/fertility queries instead
    (distinct-count on a long text column is a hash of the whole corpus
    — wasteful next to the fingerprint ops that already exist)."""
    d = load_table(spark, sf_dir, "documents")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count("*").alias(f"{c}__n"),
            (F.count("*") - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__dist"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = d.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(f"{c}__n").alias("n_rows"),
                        F.col(f"{c}__null").alias("n_null"),
                        F.col(f"{c}__dist").alias("n_distinct"),
                        F.col(f"{c}__min").alias("min_str"),
                        F.col(f"{c}__max").alias("max_str"),
                    )
                    for c in _PROFILE_COLS
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.*")


# ---------------------------------------------------------------------------
# TPC-H Q6 + event path mining
# ---------------------------------------------------------------------------
Q50_START = "1996-01-01"
Q50_END = "1997-01-01"
PATH_N = 3  # event-type n-gram width
PATH_TOPK = 20


@query(
    "q50_tpch_q6",
    oracle=f"""
    SELECT {sql_dsum("l_extendedprice * l_discount", "revenue")},
           count(*)::BIGINT AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q50_START}'
      AND l_shipdate < TIMESTAMP '{Q50_END}'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("sql", "tpch"),
)
def q50_tpch_q6(spark, sf_dir):
    """TPC-H Q6 (forecasting revenue change): pure scan-filter-aggregate
    — the query that measures pushdown + codegen with zero joins. All
    three predicates reach the parquet scan; the sum is decimal-exact.

    Scale shape: no shuffle except the 1-row final aggregate merge;
    at 100 TB this is bounded by scan bandwidth alone."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= Q50_START)
            & (F.col("l_shipdate") < Q50_END)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "events_top_paths",
    oracle=f"""
    WITH seq AS (
      SELECT user_id,
             list(event_type ORDER BY ts, event_id) AS evs
      FROM events GROUP BY user_id
    ), grams AS (
      SELECT unnest(list_transform(
               range(1, len(evs) - {PATH_N} + 2),
               i -> array_to_string(evs[i:i + {PATH_N} - 1], '>')
             )) AS path
      FROM seq WHERE len(evs) >= {PATH_N}
    )
    SELECT path, count(*)::BIGINT AS n FROM grams
    GROUP BY path
    ORDER BY n DESC, path
    LIMIT {PATH_TOPK}
    """,
    tags=("events", "analytics", "paths"),
)
def events_top_paths(spark, sf_dir):
    """User-journey path mining: the PATH_TOPK most common length-PATH_N
    event-type sequences across per-user ordered streams — the
    "what do users do before X" table behind funnel design.

    Scale shape: per-user state is bounded by that user's event count
    (collect_list keyed by user_id — same bound every sessionization
    op carries); n-grams explode row-locally from the collected array;
    the count is map-side combinable on the path string (≤ |types|^N
    distinct keys — a parameter); the top-k is TakeOrderedAndProject.
    Ordering inside a user is (ts, event_id) — a total order, so both
    engines build identical sequences."""
    ev = load_table(spark, sf_dir, "events")
    seq = (
        ev.groupBy("user_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(ts, event_id,"
                " event_type))), s -> s.event_type)"
            ).alias("evs")
        )
        .filter(F.size("evs") >= PATH_N)
    )
    grams = seq.select(
        F.explode(
            F.expr(
                f"transform(sequence(0, size(evs) - {PATH_N}),"
                f" i -> array_join(slice(evs, i + 1, {PATH_N}), '>'))"
            )
        ).alias("path")
    )
    return (
        grams.groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(PATH_TOPK)
    )


# ---------------------------------------------------------------------------
# prefix-filtered set-similarity join (AllPairs/PPJoin blocking)
# ---------------------------------------------------------------------------
PF_TAU = 0.9  # Jaccard threshold — the synthetic corpus shares a
# heavy common vocabulary (tau=0.6 matches 57% of ALL pairs, which
# would make the op an all-pairs join semantically); 0.9 keeps the
# output the near-dup tail (~9k pairs at sf0.01) and the prefix
# short (|set|/10 + 1 tokens), i.e. the regime the algorithm is for


@query(
    "dedup_prefix_filter",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, list_distinct({_DTOKS}) AS toks FROM documents
      WHERE len({_DTOKS}) > 0
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.toks, b.toks))::DOUBLE
               / len(list_distinct(list_concat(a.toks, b.toks))) AS jac
      FROM s a JOIN s b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, round(jac, 6) AS jaccard
    FROM pairs WHERE jac >= {PF_TAU}
    """,
    tags=("dedup", "documents", "similarity"),
)
def dedup_prefix_filter(spark, sf_dir):
    """Set-similarity self-join at Jaccard ≥ PF_TAU via PREFIX FILTERING
    (the AllPairs/PPJoin family, Bayardo et al. 2007): order each
    document's distinct tokens by GLOBAL frequency (rarest first,
    token-string tiebreak), keep only the first
    ⌊(1−τ)·|set|⌋+1 tokens as the "prefix" — two sets with Jaccard ≥ τ
    MUST share at least one prefix token — and equi-join on prefix
    tokens before the exact Jaccard verify. A third rigorously-derived
    blocking scheme alongside shared-shingle (dedup_ngram_jaccard) and
    MinHash banding (dedup_minhash_lsh), with a different cost profile:
    no hashing, candidate volume driven by RARE-token collisions, which
    is why production set-joins prefer it when frequency skew is high.

    The oracle is the NAIVE all-pairs Jaccard — completeness of the
    prefix filter IS the test (the q12b discipline).

    Scale shape: global token frequencies are one map-side-combinable
    aggregate; the frequency join back to postings is key-equi; the
    candidate join is an equi-join on prefix tokens whose per-token
    fan-out is the token's document frequency — and prefix tokens are
    by construction the RAREST in each document, so fan-out is driven
    by the small-df tail, not stopwords. Exact verify runs only on
    candidates. No all-pairs anywhere. Measured honesty note: this
    synthetic corpus is near-dup DENSE (at sf0.1, ~965k of 12.5M
    possible pairs genuinely exceed tau=0.9 — that's the corpus, built
    to exercise dedup), so the verified OUTPUT dominates the runtime
    (~35 s at sf0.1); on a real corpus the tau=0.9 pair density is
    orders of magnitude lower and the prefix filter's candidate
    pruning, not the output, is the operative cost."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents").filter(
        F.size(F.expr(_TOKS)) > 0
    )
    toks = d.select(
        "doc_id",
        F.array_distinct(F.expr(_TOKS)).alias("toks"),
    )
    post = toks.select(
        "doc_id", F.size("toks").alias("sz"), F.explode("toks").alias("t")
    )
    freq = post.groupBy("t").agg(F.count("*").alias("df"))
    # rank tokens within each doc by (global df ASC, token ASC); the
    # per-doc window partition is the document's own token set — bounded
    ranked = post.join(freq, "t").withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("doc_id").orderBy("df", "t")
        ),
    )
    prefix = ranked.filter(
        F.col("rk") <= F.floor((1.0 - PF_TAU) * F.col("sz")) + 1
    ).select("doc_id", "sz", "t")
    a = prefix.select(
        F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"), "t"
    )
    b = prefix.select(
        F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"), "t"
    )
    cand = (
        a.join(b, "t")
        .filter(F.col("id_a") < F.col("id_b"))
        # size filter: |A∩B| ≤ min(|A|,|B|), so Jaccard ≥ τ requires
        # τ·|A| ≤ |B| ≤ |A|/τ — prunes size-mismatched candidates free
        .filter(
            (F.col("sz_b") >= PF_TAU * F.col("sz_a"))
            & (F.col("sz_a") >= PF_TAU * F.col("sz_b"))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    ta = toks.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("toks_a"))
    tb = toks.select(F.col("doc_id").alias("id_b"), F.col("toks").alias("toks_b"))
    verified = (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
                / F.size(F.array_union("toks_a", "toks_b"))
            ).alias("jac"),
        )
        .filter(F.col("jac") >= PF_TAU)
    )
    return verified.select(
        "id_a", "id_b", F.round("jac", 6).alias("jaccard")
    )


# ---------------------------------------------------------------------------
# deterministic weighted sampling without replacement (Efraimidis-Spirakis)
# ---------------------------------------------------------------------------
WS_K = 100


@query(
    "sample_weighted_topk",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             len({_DTOKS})::BIGINT AS w,
             -- u in (0,1]: 12 md5 hex chars -> uniform integer + 1
             (('0x' || substr(md5('ws' || doc_id::VARCHAR), 1, 12))::BIGINT
               + 1) / 281474976710656.0 AS u
      FROM documents WHERE len({_DTOKS}) > 0
    ), keyed AS (
      SELECT doc_id, w, round(-ln(u) / w, 12) AS k FROM t
    )
    SELECT doc_id, w, k FROM (
      SELECT doc_id, w, k,
             row_number() OVER (ORDER BY k, doc_id) AS rn
      FROM keyed
    ) WHERE rn <= {WS_K}
    """,
    tags=("sampling", "documents"),
)
def sample_weighted_topk(spark, sf_dir):
    """Weighted sampling WITHOUT replacement, k=WS_K, weight = token
    count — the Efraimidis-Spirakis A-ES algorithm: each row draws
    key = −ln(u)/w (u uniform) and the k SMALLEST keys are an exact
    weighted sample. The distributed-sampling workhorse: key assignment
    is row-local, selection is a top-k — no sequential pass, no global
    RNG state. Here u is derandomized from md5(doc_id) (the
    sample_deterministic discipline), so the sample is reproducible on
    any engine, any partitioning, any run — and DuckDB can oracle it
    bit-exactly (ln on identical doubles, round-12 on the key).

    Scale shape: one row-local projection + TakeOrderedAndProject;
    zero shuffle beyond the top-k merge."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.size(F.expr(_TOKS)) > 0
    )
    u = (
        F.expr(
            "cast(conv(substring(md5(concat('ws', cast(doc_id AS string))),"
            " 1, 12), 16, 10) AS bigint)"
        )
        + 1
    ) / F.lit(281474976710656.0)  # 16^12
    keyed = d.select(
        "doc_id",
        F.size(F.expr(_TOKS)).cast("bigint").alias("w"),
        F.round(-F.log(u) / F.size(F.expr(_TOKS)), 12).alias("k"),
    )
    return keyed.orderBy("k", "doc_id").limit(WS_K)


# ---------------------------------------------------------------------------
# per-group IQR outlier flagging (Tukey fences)
# ---------------------------------------------------------------------------
@query(
    "quality_iqr_outliers",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, len({_DTOKS})::BIGINT AS n_tokens
      FROM documents WHERE len({_DTOKS}) > 0
    ), q AS (
      SELECT source,
             quantile_cont(n_tokens, 0.25) AS q1,
             quantile_cont(n_tokens, 0.75) AS q3
      FROM t GROUP BY source
    )
    SELECT t.doc_id, t.source, t.n_tokens,
           round(q.q1 - 1.5 * (q.q3 - q.q1), 4) AS lo,
           round(q.q3 + 1.5 * (q.q3 - q.q1), 4) AS hi,
           (t.n_tokens < q.q1 - 1.5 * (q.q3 - q.q1)
            OR t.n_tokens > q.q3 + 1.5 * (q.q3 - q.q1)) AS is_outlier
    FROM t JOIN q USING (source)
    """,
    tags=("quality", "documents", "curation"),
)
def quality_iqr_outliers(spark, sf_dir):
    """Tukey-fence outlier flagging per source: documents whose token
    count falls outside [Q1 − 1.5·IQR, Q3 + 1.5·IQR] of their OWN
    source's length distribution — the per-stratum anomaly screen that
    catches a broken extractor flooding one source with stubs or
    megadocs without punishing legitimately different sources.

    Scale shape: per-source exact quartiles are ONE grouped aggregate
    (|sources| output rows — broadcast-sized), joined back broadcast;
    flagging is row-local. The same percentile-cutoff-then-broadcast
    recipe as curriculum_length_buckets — never a per-group sort window
    over data rows. Fence comparison uses the UNROUNDED quantiles on
    both engines (rounding only the displayed fence columns), so the
    boolean is bit-stable."""
    t = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.size(F.expr(_TOKS)).cast("bigint").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
    )
    q = t.groupBy("source").agg(
        F.expr("percentile(n_tokens, 0.25)").alias("q1"),
        F.expr("percentile(n_tokens, 0.75)").alias("q3"),
    )
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return t.join(F.broadcast(q), "source").select(
        "doc_id",
        "source",
        "n_tokens",
        F.round(lo, 4).alias("lo"),
        F.round(hi, 4).alias("hi"),
        ((F.col("n_tokens") < lo) | (F.col("n_tokens") > hi)).alias(
            "is_outlier"
        ),
    )


# ---------------------------------------------------------------------------
# lateral column aliases (Spark 3.4+ dialect surface)
# ---------------------------------------------------------------------------
@query(
    "q51_lateral_alias",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS disc_price,
           round(disc_price * (1 + l_tax), 4) AS charge,
           round(charge - disc_price, 4) AS tax_amount
    FROM lineitem WHERE l_orderkey < 100
    """,
    tags=("sql", "dialect"),
)
def q51_lateral_alias(spark, sf_dir):
    """Lateral column aliases: later SELECT expressions reference
    earlier aliases in the same list (disc_price → charge →
    tax_amount) — the Spark 3.4+ dialect feature that kills the
    nested-subquery boilerplate for derived-metric chains. DuckDB
    supports the same referencing, so the oracle is the identical
    statement. Catalyst inlines the chain into one projection — the
    plan is a single codegen stage over the pruned scan, alias depth
    has no runtime cost."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_v"
    )
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice * (1 - l_discount), 4) AS disc_price,
               round(disc_price * (1 + l_tax), 4) AS charge,
               round(charge - disc_price, 4) AS tax_amount
        FROM lineitem_v WHERE l_orderkey < 100
        """
    )


# ---------------------------------------------------------------------------
# LSH s-curve measurement: MinHash banding recall vs exact Jaccard
# ---------------------------------------------------------------------------
@query(
    "dedup_lsh_scurve",
    oracle=None,  # assembled below from the shared dedup oracle pieces
    tags=("dedup", "documents", "evaluation"),
)
def dedup_lsh_scurve(spark, sf_dir):
    """The LSH quality knob MEASURED: for every exact shingle-Jaccard
    pair ≥ 0.5, was it caught by the 4×4 MinHash banding? Bucketed by
    Jaccard decile this is the empirical s-curve (theory: P(caught) =
    1−(1−s⁴)⁴ — ~0.2 at s=0.5, ~0.9 at s=0.8) — the dedup analog of
    ann_recall_eval, turning the banding parameters into an
    oracle-gated number instead of a design-doc claim.

    Scale shape: the truth side is the blocked exact-Jaccard join
    (shared-shingle candidates, never all-pairs); the candidate side is
    the banding equi-join; the comparison is a pair-keyed left join +
    one tiny bucketed aggregate.

    Measured on this corpus: every exact 3-gram-Jaccard pair ≥ 0.5 sits
    in the 0.8-1.0 deciles (shingle Jaccard is strict — token-level
    near-dups score far lower on 3-grams) and banding catches 100% of
    them, consistent with the theory curve's ≥ 0.9 at s ≥ 0.8. The
    low-s region is empirically empty here; the query exists so any
    corpus/parameter change that bends the curve shows up as a value
    diff, not a silent quality drift."""
    from doc2dataset_spark.queries.dedup import (
        bands_of,
        dedup_ngram_jaccard,
    )

    truth = dedup_ngram_jaccard(spark, sf_dir)  # (da, db, jaccard >= .5)
    d = load_table(spark, sf_dir, "documents")
    bands = bands_of(d.select("doc_id", "text"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
        )
        .distinct()
        .withColumn("caught", F.lit(1))
    )
    joined = truth.join(cand, ["da", "db"], "left")
    return (
        joined.groupBy(
            (F.floor(F.col("jaccard") * 10) / 10).alias("jac_bucket")
        )
        .agg(
            F.count("*").alias("n_true"),
            F.sum(F.coalesce("caught", F.lit(0))).alias("n_caught"),
            F.round(
                F.sum(F.coalesce("caught", F.lit(0)))
                / F.count("*").cast("double"),
                4,
            ).alias("recall"),
        )
    )


def _set_scurve_oracle() -> None:
    from doc2dataset_spark.queries.core import REGISTRY as _reg
    from doc2dataset_spark.queries.dedup import (
        _DSHINGLES,
        _H48_DUCK,
        _MINHASH_BANDS_SQL,
        _MINHASH_SIG_SQL,
        P,
    )

    _reg["dedup_lsh_scurve"].oracle = f"""
    WITH sd AS (
      SELECT doc_id, unnest({_DSHINGLES}) AS sh FROM documents
    ), cnt AS (
      SELECT doc_id, count(*) AS n FROM sd GROUP BY doc_id
    ), shared AS (
      SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS sh_n
      FROM sd a JOIN sd b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), truth AS (
      SELECT da, db,
             round(sh_n::DOUBLE / (ca.n + cb.n - sh_n), 4) AS jaccard
      FROM shared
      JOIN cnt ca ON ca.doc_id = da
      JOIN cnt cb ON cb.doc_id = db
      WHERE sh_n::DOUBLE / (ca.n + cb.n - sh_n) >= 0.5
    ), hx AS (
      SELECT doc_id, {_H48_DUCK.format(s="sh")} % {P} AS x FROM sd
    ), sig AS (
      SELECT doc_id, {_MINHASH_SIG_SQL} FROM hx GROUP BY doc_id
    ), bands AS (
    {_MINHASH_BANDS_SQL}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS da, b.doc_id AS db, 1 AS caught
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    )
    SELECT floor(t.jaccard * 10) / 10 AS jac_bucket,
           count(*)::BIGINT AS n_true,
           sum(coalesce(c.caught, 0))::BIGINT AS n_caught,
           round(sum(coalesce(c.caught, 0))
                 / count(*)::DOUBLE, 4) AS recall
    FROM truth t LEFT JOIN cand c ON c.da = t.da AND c.db = t.db
    GROUP BY 1
    """


_set_scurve_oracle()


# ---------------------------------------------------------------------------
# null-semantics battery
# ---------------------------------------------------------------------------
@query(
    "q52_null_semantics",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_orderpriority END AS prio,
             CASE WHEN o_orderkey % 11 = 0 THEN NULL
                  ELSE o_totalprice END AS price
      FROM orders WHERE o_orderkey < 2000
    )
    SELECT coalesce(prio, '<null>') AS prio,
           count(*)::BIGINT AS n_rows,
           count(price)::BIGINT AS n_price,          -- count skips nulls
           count(*) FILTER (WHERE price IS NULL)::BIGINT AS n_null_price,
           round(sum(price), 2) AS sum_price,        -- sum skips nulls
           sum(CASE WHEN price IS NOT DISTINCT FROM NULL
                    THEN 1 ELSE 0 END)::BIGINT AS n_nsafe
    FROM t
    GROUP BY prio
    """,
    tags=("sql", "semantics"),
)
def q52_null_semantics(spark, sf_dir):
    """Null-semantics battery on one grouped aggregate: NULL group keys
    form their OWN group (surfaced via coalesce so both engines label it
    identically), COUNT(col)/SUM skip nulls while COUNT(*) does not,
    FILTER counts them explicitly, and null-safe comparison
    (Spark ``<=>`` == SQL ``IS NOT DISTINCT FROM``) treats NULL=NULL as
    true. The contract every downstream aggregate silently depends on —
    locked as an oracle hash so an engine upgrade that shifts null
    grouping or null-safe-eq behavior fails loudly.

    Scale shape: one pruned scan + one map-side-combinable aggregate."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    t = o.select(
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_orderpriority"))
        .alias("prio"),
        F.when(F.col("o_orderkey") % 11 == 0, None)
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
    )
    return t.groupBy(
        F.coalesce("prio", F.lit("<null>")).alias("prio")
    ).agg(
        F.count("*").alias("n_rows"),
        F.count("price").alias("n_price"),
        F.count_if(F.col("price").isNull()).alias("n_null_price"),
        F.round(F.sum("price"), 2).alias("sum_price"),
        F.sum(
            F.when(F.col("price").eqNullSafe(F.lit(None)), 1).otherwise(0)
        ).alias("n_nsafe"),
    )


# ---------------------------------------------------------------------------
# ORDER BY ALL dialect + deterministic full ordering
# ---------------------------------------------------------------------------
@query(
    "q53_order_by_all",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, count(*)::BIGINT AS n
    FROM orders GROUP BY o_orderpriority, o_orderstatus
    ORDER BY ALL
    """,
    tags=("sql", "dialect"),
)
def q53_order_by_all(spark, sf_dir):
    """ORDER BY ALL (Spark 4 / DuckDB dialect): order by every select
    column left-to-right — the deterministic-output shorthand for small
    grouped reports. The result set here is |priorities|×|statuses|
    rows, so the global sort is over a parameter-bounded frame (the
    driver compare is order-insensitive anyway; this query exists for
    dialect parity, and the aggregate beneath is the scalable part)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, count(*) AS n
        FROM orders_v GROUP BY o_orderpriority, o_orderstatus
        ORDER BY ALL
        """
    )


# ---------------------------------------------------------------------------
# overlapping-window chunking (the RAG / context-window splitter)
# ---------------------------------------------------------------------------
CHUNK_W = 64  # tokens per chunk
CHUNK_S = 48  # stride (CHUNK_W - CHUNK_S = 16 tokens of overlap)


@query(
    "text_chunk_windows",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_DTOKS} AS w FROM documents WHERE len({_DTOKS}) > 0
    )
    SELECT doc_id, k AS chunk_no,
           len(w[k * {CHUNK_S} + 1 : k * {CHUNK_S} + {CHUNK_W}])::INT
             AS n_tokens,
           md5(array_to_string(
             w[k * {CHUNK_S} + 1 : k * {CHUNK_S} + {CHUNK_W}], ' '
           )) AS chunk_digest
    FROM t, unnest(range(0,
        greatest((len(w) - {CHUNK_W} + {CHUNK_S} - 1) // {CHUNK_S}, 0) + 1
    )) AS u(k)
    """,
    tags=("text", "documents", "chunking"),
)
def text_chunk_windows(spark, sf_dir):
    """Overlapping-window chunking: each document split into CHUNK_W-token
    windows at stride CHUNK_S (16-token overlap) — the context-window
    splitter behind RAG ingestion and fixed-length pretraining examples.
    Emits (doc_id, chunk_no, n_tokens, md5-of-chunk) — the digest is what
    a chunk-level dedup or an embedding pipeline keys on.

    Chunk count per doc = ceil((len - W) / S) + 1 (minimum 1, so short
    docs yield one short chunk); the last chunk may be partial — both
    engines share the identical slice arithmetic.

    Scale shape: entirely row-local — a sequence() explode per document
    (fan-out bounded by len/S) and slice/digest expressions in one
    codegen stage; zero shuffle."""
    t = load_table(spark, sf_dir, "documents").filter(
        F.size(F.expr(_TOKS)) > 0
    ).select("doc_id", F.expr(_TOKS).alias("w"))
    return (
        t.select(
            "doc_id",
            "w",
            F.explode(F.expr(
                f"sequence(0, greatest(CAST(ceil((size(w) - {CHUNK_W}) /"
                f" {CHUNK_S}.0) AS INT), 0))"
            )).alias("chunk_no"),
        )
        .select(
            "doc_id",
            "chunk_no",
            F.expr(
                f"size(slice(w, chunk_no * {CHUNK_S} + 1, {CHUNK_W}))"
            ).cast("int").alias("n_tokens"),
            F.md5(
                F.expr(
                    f"array_join(slice(w, chunk_no * {CHUNK_S} + 1,"
                    f" {CHUNK_W}), ' ')"
                )
            ).alias("chunk_digest"),
        )
    )


# ---------------------------------------------------------------------------
# chunk-level cross-document contamination (composes text_chunk_windows)
# ---------------------------------------------------------------------------
@query(
    "dedup_chunk_crossdoc",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_DTOKS} AS w FROM documents WHERE len({_DTOKS}) > 0
    ), chunks AS (
      SELECT doc_id,
             md5(array_to_string(
               w[k * {CHUNK_S} + 1 : k * {CHUNK_S} + {CHUNK_W}], ' '
             )) AS chunk_digest
      FROM t, unnest(range(0,
          greatest((len(w) - {CHUNK_W} + {CHUNK_S} - 1) // {CHUNK_S}, 0) + 1
      )) AS u(k)
    ), shared AS (
      SELECT chunk_digest FROM chunks
      GROUP BY chunk_digest HAVING count(DISTINCT doc_id) >= 2
    )
    SELECT c.doc_id,
           count(*)::BIGINT AS n_chunks,
           count(s.chunk_digest)::BIGINT AS n_shared,
           round(count(s.chunk_digest)::DOUBLE / count(*), 4)
             AS shared_frac
    FROM chunks c LEFT JOIN shared s USING (chunk_digest)
    GROUP BY c.doc_id
    HAVING count(s.chunk_digest) > 0
    """,
    tags=("dedup", "documents", "chunking"),
)
def dedup_chunk_crossdoc(spark, sf_dir):
    """Chunk-level cross-document contamination: which documents share
    64-token windows with OTHER documents, and what fraction of their
    chunks is shared — the doc-level score a span-removal or doc-drop
    policy thresholds on. Composes text_chunk_windows' digests: shared =
    digests appearing in ≥2 distinct docs (exact, hash-grouped).

    Scale shape: chunking is row-local; the shared-digest set is one
    map-side-combinable aggregate keyed by a uniform 128-bit hash; the
    flag-back join is digest-equi with fan-out = digest multiplicity.
    Same skeleton as dedup_boilerplate_spans, at window (not fixed-span)
    granularity with overlap."""
    t = load_table(spark, sf_dir, "documents").filter(
        F.size(F.expr(_TOKS)) > 0
    ).select("doc_id", F.expr(_TOKS).alias("w"))
    chunks = t.select(
        "doc_id",
        F.explode(F.expr(
            f"sequence(0, greatest(CAST(ceil((size(w) - {CHUNK_W}) /"
            f" {CHUNK_S}.0) AS INT), 0))"
        )).alias("k"),
        "w",
    ).select(
        "doc_id",
        F.md5(
            F.expr(
                f"array_join(slice(w, k * {CHUNK_S} + 1, {CHUNK_W}), ' ')"
            )
        ).alias("chunk_digest"),
    )
    shared = (
        chunks.groupBy("chunk_digest")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("chunk_digest", F.lit(1).alias("is_shared"))
    )
    return (
        chunks.join(shared, "chunk_digest", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.count("is_shared").alias("n_shared"),
            F.round(
                F.count("is_shared") / F.count("*").cast("double"), 4
            ).alias("shared_frac"),
        )
        .filter(F.col("n_shared") > 0)
    )


# ---------------------------------------------------------------------------
# NOT IN null trap vs NOT EXISTS
# ---------------------------------------------------------------------------
@query(
    "q70_not_in_null_trap",
    oracle="""
    WITH probe AS (
      SELECT o_custkey FROM orders WHERE o_orderkey < 1000
    ), dirty AS (
      SELECT CASE WHEN c_custkey % 50 = 0 THEN NULL
             ELSE c_custkey END AS k
      FROM customer WHERE c_custkey < 200
    ), clean AS (
      SELECT k FROM dirty WHERE k IS NOT NULL
    )
    SELECT
      (SELECT count(*) FROM probe
        WHERE o_custkey NOT IN (SELECT k FROM clean))::BIGINT
        AS n_not_in_clean,
      (SELECT count(*) FROM probe
        WHERE o_custkey NOT IN (SELECT k FROM dirty))::BIGINT
        AS n_not_in_poisoned,
      (SELECT count(*) FROM probe p
        WHERE NOT EXISTS (SELECT 1 FROM dirty d
                          WHERE d.k = p.o_custkey))::BIGINT
        AS n_not_exists
    """,
    tags=("sql", "dialect", "nulls"),
)
def q70_not_in_null_trap(spark, sf_dir):
    """The NOT IN null trap, pinned as an oracle contract: with a NULL
    in the subquery, ``x NOT IN (…)`` is never TRUE (three-valued logic:
    x <> NULL is UNKNOWN, so the conjunction can't reach TRUE) and the
    poisoned count is 0 — while NOT EXISTS with an equality correlate is
    null-immune and returns the real complement. Both engines implement
    ANSI semantics; the hash locks that the engine's NOT IN stays a
    null-aware anti-join (Spark plans exactly that) and that the two
    spellings diverge in the documented way. The third count equals the
    first: NOT EXISTS over the dirty set == NOT IN over the cleaned set.

    Scale shape: three bounded-probe anti-join counts joined as scalar
    1-row frames; the null-aware anti-join (NOT IN) is the expensive
    spelling at scale (it must broadcast-and-null-check), which is WHY
    production code should write NOT EXISTS — this query is the
    documented receipt."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    o.filter(F.col("o_orderkey") < 1000).select("o_custkey").createOrReplaceTempView(
        "q70_probe"
    )
    c.filter(F.col("c_custkey") < 200).select(
        F.when(F.col("c_custkey") % 50 == 0, None)
        .otherwise(F.col("c_custkey"))
        .alias("k")
    ).createOrReplaceTempView("q70_dirty")
    return spark.sql(
        """
        SELECT
          (SELECT count(*) FROM q70_probe
            WHERE o_custkey NOT IN (SELECT k FROM q70_dirty
                                    WHERE k IS NOT NULL))
            AS n_not_in_clean,
          (SELECT count(*) FROM q70_probe
            WHERE o_custkey NOT IN (SELECT k FROM q70_dirty))
            AS n_not_in_poisoned,
          (SELECT count(*) FROM q70_probe p
            WHERE NOT EXISTS (SELECT 1 FROM q70_dirty d
                              WHERE d.k = p.o_custkey))
            AS n_not_exists
        """
    ).select(
        F.col("n_not_in_clean").cast("bigint").alias("n_not_in_clean"),
        F.col("n_not_in_poisoned").cast("bigint").alias("n_not_in_poisoned"),
        F.col("n_not_exists").cast("bigint").alias("n_not_exists"),
    )


@query(
    "q71_intdiv_mod_contract",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             (o_orderkey % 100) - 50 AS a,
             CASE WHEN o_orderkey % 3 = 0 THEN -7 ELSE 7 END AS b
      FROM orders WHERE o_orderkey < 500
    )
    SELECT a, b,
           (a // b)::BIGINT AS int_div,
           (a % b)::BIGINT AS mod_c,
           (((a % b) + b) % b)::BIGINT AS mod_floored,
           count(*)::BIGINT AS n
    FROM t GROUP BY a, b
    """,
    tags=("sql", "dialect"),
)
def q71_intdiv_mod_contract(spark, sf_dir):
    """Integer division/modulo sign contract over negative operands:
    both engines truncate integer division toward zero (``DIV`` ==
    DuckDB ``//`` for integers) and give ``%`` the DIVIDEND's sign
    (C semantics) — and the floored ("python-style", always
    b-signed) modulo is recoverable as ``((a % b) + b) % b`` (Spark's
    ``pmod`` for positive b). Locked as an oracle hash because silent
    sign disagreement here corrupts every hash-bucketing and
    salting expression built on %.

    Scale shape: scan-filter + a ≤200-group aggregate."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    t = o.select(
        ((F.col("o_orderkey") % 100) - 50).alias("a"),
        F.when(F.col("o_orderkey") % 3 == 0, -7).otherwise(7).alias("b"),
    )
    return t.groupBy("a", "b").agg(
        F.expr("a DIV b").cast("bigint").alias("int_div"),
        (F.col("a") % F.col("b")).cast("bigint").alias("mod_c"),
        (((F.col("a") % F.col("b")) + F.col("b")) % F.col("b"))
        .cast("bigint")
        .alias("mod_floored"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


@query(
    "q72_datetime_contract",
    oracle="""
    SELECT strftime(date_trunc('week', o_orderdate), '%Y-%m-%d')
             AS week_start,
           isodow(min(o_orderdate))::INT AS iso_dow_first,
           quarter(min(o_orderdate))::INT AS q_first,
           epoch(min(o_orderdate))::BIGINT AS epoch_first,
           count(*)::BIGINT AS n
    FROM orders
    WHERE o_orderkey < 2000
    GROUP BY date_trunc('week', o_orderdate)
    """,
    tags=("sql", "dialect", "datetime"),
)
def q72_datetime_contract(spark, sf_dir):
    """Datetime cross-engine contract: the PORTABLE spellings for the
    calendar primitives where the engines' native functions disagree —
    Spark ``dayofweek`` is 1=Sunday while DuckDB ``dayofweek`` is
    0=Sunday, so the ISO day (1=Mon..7=Sun) must be spelled
    ``((dayofweek(ts)+5)%7)+1`` on Spark vs ``isodow`` on DuckDB; both
    engines truncate ``date_trunc('week')`` to Monday and agree on
    quarter and epoch seconds (UTC session pinned by load_table). A
    weekly roll-up locks all four at once.

    Scale shape: pruned scan, map-side-combinable weekly aggregate."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return (
        o.groupBy(
            F.date_format(
                F.date_trunc("week", "o_orderdate"), "yyyy-MM-dd"
            ).alias("week_start")
        )
        .agg(
            (((F.dayofweek(F.min("o_orderdate")) + 5) % 7) + 1)
            .cast("int")
            .alias("iso_dow_first"),
            F.quarter(F.min("o_orderdate")).cast("int").alias("q_first"),
            F.unix_timestamp(F.min("o_orderdate"))
            .cast("bigint")
            .alias("epoch_first"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )


@query(
    "q73_string_contract",
    oracle="""
    SELECT c_custkey,
           substr(c_name, 10, 5) AS sub_1based,
           strpos(c_name, '#')::INT AS instr_1based,
           lpad(c_custkey::VARCHAR, 8, '0') AS key_padded,
           split_part(c_name, '#', 2) AS after_hash,
           length(c_name)::INT AS n_chars,
           upper(substr(c_name, 1, 3)) AS up3
    FROM customer WHERE c_custkey < 100
    """,
    tags=("sql", "dialect", "strings"),
)
def q73_string_contract(spark, sf_dir):
    """String-function cross-engine contract: 1-based substring and
    instr/strpos, lpad zero-padding, split_part field extraction,
    character (not byte) length, ASCII case mapping — pinned as hashes
    because every key-formatting expression in the pipeline
    (operators/sharding.py's shard keys, the text index's terms) assumes
    these exact conventions.

    Scale shape: row-local projection, pruned scan, no shuffle."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    return c.select(
        "c_custkey",
        F.substring("c_name", 10, 5).alias("sub_1based"),
        F.instr(F.col("c_name"), "#").cast("int").alias("instr_1based"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias(
            "key_padded"
        ),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias(
            "after_hash"
        ),
        F.length("c_name").cast("int").alias("n_chars"),
        F.upper(F.substring("c_name", 1, 3)).alias("up3"),
    )


@query(
    "corpus_health_report",
    oracle="""
    WITH d AS (
      SELECT doc_id, source, lang, n_chars, md5(text) AS digest
      FROM documents
    ), top_lang AS (
      SELECT lang, count(*) AS n FROM d GROUP BY lang
      ORDER BY n DESC, lang LIMIT 1
    )
    SELECT count(*)::BIGINT AS n_docs,
           count(DISTINCT source)::BIGINT AS n_sources,
           count(DISTINCT lang)::BIGINT AS n_langs,
           round(1.0 - count(DISTINCT digest)::DOUBLE / count(*), 6)
             AS exact_dup_rate,
           round(SUM(CAST(n_chars AS DECIMAL(38,6)))::DOUBLE / count(*), 2)
             AS mean_chars,
           (SELECT lang FROM top_lang) AS top_lang,
           round((SELECT n FROM top_lang)::DOUBLE / count(*), 4)
             AS top_lang_share
    FROM d
    """,
    tags=("curation", "documents", "reporting"),
)
def corpus_health_report(spark, sf_dir):
    """The one-row corpus dashboard: volume, source/language breadth,
    exact-digest duplicate rate, mean document length, dominant
    language and its share — the numbers a curation run prints first,
    composed from the registry's own primitives into a single pass plus
    one tiny top-1 aggregate.

    Scale shape: one scan feeds a global aggregate whose distinct
    counts are exact (shuffle on each distinct key, partial-aggregated);
    the top-language pick is a 1-row TakeOrdered over |langs| rows with
    a name tiebreak, broadcast back. All ratios divide exact
    counts/decimal sums in double (retention precedent)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars", F.md5("text").alias("digest")
    )
    top = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "lang")
        .limit(1)
        .select(
            F.col("lang").alias("top_lang"), F.col("n").alias("top_n")
        )
    )
    return (
        d.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.round(
                1.0
                - F.countDistinct("digest").cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("exact_dup_rate"),
            F.round(
                F.sum(F.col("n_chars").cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1)),
                2,
            ).alias("mean_chars"),
        )
        .crossJoin(F.broadcast(top))
        .select(
            "n_docs",
            "n_sources",
            "n_langs",
            "exact_dup_rate",
            "mean_chars",
            "top_lang",
            F.round(
                F.col("top_n").cast("double") / F.col("n_docs"), 4
            ).alias("top_lang_share"),
        )
    )
