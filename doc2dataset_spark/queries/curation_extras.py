"""Corpus-curation extras (round 5b), registered AFTER the frozen driver
gate and oracle-checked locally like everything else.

The batch covers the remaining table-stakes operations of a training-data
pipeline that had no first-class query yet:

- ``split_train_val_test``   deterministic hash split (80/10/10) — the
                             reproducible train/val/test assignment every
                             corpus release needs.
- ``sample_cap_per_key``     per-source document cap (the per-domain cap
                             CommonCrawl-scale pipelines apply so one host
                             cannot dominate the corpus).
- ``text_heavy_hitters``     frequent tokens via per-partition Misra-Gries
                             summaries + exact candidate verification —
                             the heavy-hitter pattern that never shuffles
                             the full token multiset.
- ``text_char_entropy``      per-document character-level Shannon entropy
                             (low entropy = boilerplate/repetition, high =
                             binary soup; a standard cheap quality signal).
- ``chunk_sliding_windows``  overlapping token-window chunking — the
                             context-window preparation step between
                             curation and tokenization.
- ``pii_scrub``              regex PII redaction (emails, phone numbers)
                             with per-document match counts. The corpus
                             has no natural PII, so the query first
                             *injects* a deterministic contact string into
                             2/3 of the documents — the redaction path is
                             then exercised for real on both engines.
- ``knn_graph_topk``         exact k-NN graph over ALL embeddings via the
                             tile-partitioned pair join + hierarchical
                             (per-tile, then global) top-k — no full-pair
                             re-shuffle after the tile join.
- ``ann_recall_eval``        recall@k of the IVF ANN against that exact
                             graph, per query — ANN quality measurement as
                             a first-class, oracle-checked query.

Reference scope note: the reference pipeline (doc2dataset) stops at
extraction/filtering; these operators are the north-star additions the
task brief lists (dedup/similarity/quality at 100 TB), built on the same
tables and oracle discipline as the rest of the registry.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from doc2dataset_spark.queries.core import query
from doc2dataset_spark.queries.dedup import (
    N_EMB_BLOCKS,
    NORM_EMB_DUCK,
    normalized_embeddings,
    spark_dot,
)
from doc2dataset_spark.queries.scale import IVF_TOP_K, N_CENTROIDS
from doc2dataset_spark.queries.scale import sim_ann_ivf as _sim_ann_ivf
from doc2dataset_spark.queries.textops import _DTOKS, _TOKS
from doc2dataset_spark.session import load_table

# ---------------------------------------------------------------------------
# deterministic hash split
# ---------------------------------------------------------------------------

# md5-derived bucket in [0, 100): the same idiom sample_deterministic uses —
# first 48 bits of md5(key) are uniform and identical on both engines.
_BUCKET_SPARK = (
    "cast(conv(substring(md5(cast(doc_id AS string)), 1, 12), 16, 10)"
    " AS bigint) % 100"
)
_BUCKET_DUCK = "('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT % 100"

TRAIN_PCT, VAL_PCT = 80, 10  # remainder = test


@query(
    "split_train_val_test",
    oracle=f"""
    SELECT doc_id,
           ({_BUCKET_DUCK}) AS bucket,
           CASE WHEN ({_BUCKET_DUCK}) < {TRAIN_PCT} THEN 'train'
                WHEN ({_BUCKET_DUCK}) < {TRAIN_PCT + VAL_PCT} THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    tags=("curation", "documents", "sampling"),
)
def split_train_val_test(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment from a hash of the
    stable document key — rerunning on a grown corpus never moves an old
    document between splits (the property random splits lack). Map-side
    only: no shuffle, no RNG, no state; at 100 TB this is a free column.
    """
    d = load_table(spark, sf_dir, "documents")
    bucket = F.expr(_BUCKET_SPARK)
    return d.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < TRAIN_PCT, F.lit("train"))
        .when(bucket < TRAIN_PCT + VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# per-key cap
# ---------------------------------------------------------------------------
CAP_PER_SOURCE = 30


@query(
    "sample_cap_per_key",
    oracle=f"""
    SELECT doc_id, source, rk FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(doc_id::VARCHAR), doc_id
             )::INT AS rk
      FROM documents
    ) WHERE rk <= {CAP_PER_SOURCE}
    """,
    tags=("curation", "documents", "sampling"),
)
def sample_cap_per_key(spark, sf_dir):
    """Cap documents per source at {CAP}: rank within each source by a
    hash of the document key (a deterministic uniform shuffle, so the
    kept subset is an unbiased sample, not 'first 30 by id') and keep the
    top {CAP}. The per-domain cap every web-scale corpus applies so a
    single host cannot dominate training data.

    Scale shape: one hash-partitioned window keyed by source; per-group
    state is a counter. Severely hot keys would call for the salted
    two-phase variant (agg_salted_two_phase shows the pattern).
    """
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= CAP_PER_SOURCE)
    )


# ---------------------------------------------------------------------------
# heavy hitters: Misra-Gries candidates + exact verification
# ---------------------------------------------------------------------------
MG_CAPACITY = 128  # per-partition summary size; must exceed SUPPORT_DEN
SUPPORT_DEN = 100  # heavy := freq * 100 >= total tokens (1% support)


def _mg_partition(batches):
    """Per-partition Misra-Gries summary over the token stream.

    Emits the partition's surviving candidate tokens (token, NULL) plus
    one summary row (NULL, n_tokens_in_partition). Guarantee: MG with
    capacity k keeps any item with local frequency > n_p/(k+1); a token
    with global support ≥ 1/SUPPORT_DEN has local support ≥ 1/SUPPORT_DEN
    in at least one partition (weighted pigeonhole), and 1/100 > 1/129,
    so with CAPACITY=128 > SUPPORT_DEN the candidate set is a superset of
    every ≥1%-support token."""
    import pandas as pd

    counters: dict[str, int] = {}
    n = 0
    for pdf in batches:
        for tok in pdf["token"]:
            n += 1
            if tok in counters:
                counters[tok] += 1
            elif len(counters) < MG_CAPACITY:
                counters[tok] = 1
            else:
                counters = {t: c - 1 for t, c in counters.items() if c > 1}
    yield pd.DataFrame(
        {
            "token": list(counters) + [None],
            "pcount": [None] * len(counters) + [n],
        }
    )


@query(
    "text_heavy_hitters",
    oracle=f"""
    WITH t AS (SELECT unnest({_DTOKS}) AS token FROM documents),
    tot AS (SELECT count(*) AS total FROM t)
    SELECT token, count(*)::BIGINT AS n
    FROM t, tot
    GROUP BY token, tot.total
    HAVING count(*) * {SUPPORT_DEN} >= tot.total
    """,
    tags=("curation", "text", "sketch"),
)
def text_heavy_hitters(spark, sf_dir):
    """Tokens with ≥1% corpus support, computed the way a 100 TB corpus
    must: per-partition Misra-Gries summaries (bounded MG_CAPACITY=64
    entries each, one Python pass) produce a small candidate set, and only
    rows matching a candidate are exactly counted. The full token multiset
    is never shuffled — the exact groupBy runs on the candidate-filtered
    stream, and the corpus total comes from per-partition counts emitted
    by the same MG pass (map-side sum, no second tokenize).

    Soundness: a token with global frequency ≥ N/100 has local frequency
    > n_p/64 in at least one partition (else total < N/64 ≤ N/100 would
    fail — pigeonhole over partitions with 64 > 100·(N_p/N) slack), so the
    candidate set is a superset of the answer; the exact count then makes
    the result identical to the naive full aggregation the oracle runs."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.expr(_TOKS)).alias("token"))
    summary = tok.mapInPandas(_mg_partition, "token string, pcount long")
    cands = summary.filter(F.col("token").isNotNull()).select("token").distinct()
    total = summary.filter(F.col("token").isNull()).agg(
        F.sum("pcount").alias("total")
    )
    return (
        tok.join(F.broadcast(cands), "token")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n") * SUPPORT_DEN >= F.col("total"))
        .select("token", "n")
    )


# ---------------------------------------------------------------------------
# character-level Shannon entropy
# ---------------------------------------------------------------------------
_CHARS_SPARK = "regexp_extract_all(lower(text), '.', 0)"
_CHARS_DUCK = "regexp_extract_all(lower(text), '.')"


@query(
    "text_char_entropy",
    oracle=f"""
    WITH c AS (
      SELECT doc_id,
             len({_CHARS_DUCK}) AS n,
             unnest({_CHARS_DUCK}) AS ch
      FROM documents
    ),
    g AS (
      SELECT doc_id, n, ch, count(*) AS cnt FROM c GROUP BY doc_id, n, ch
    )
    SELECT doc_id,
           n AS n_chars,
           round(-(SUM(round((cnt::DOUBLE / n) * ln(cnt::DOUBLE / n),
                            12)::DECIMAL(38,18)))::DOUBLE, 4) AS entropy
    FROM g GROUP BY doc_id, n
    """,
    tags=("curation", "text", "quality"),
)
def text_char_entropy(spark, sf_dir):
    """Per-document character-distribution Shannon entropy (nats): low
    values flag repetition/boilerplate, implausibly high values flag
    non-text payloads — the cheap statistical quality gate next to
    text_quality_score's rule-based one.

    Determinism: each -p·ln p term is rounded to 12 dp and accumulated as
    exact DECIMAL(38,18) (the text_logprob_quality discipline), so the
    per-doc sum is order-independent and bit-identical across engines.
    Scale shape: explode → two map-side-combinable aggregations keyed by
    (doc_id, ch) then doc_id; per-doc alphabet is bounded (~dozens of
    distinct chars), so combiners collapse the explode before the
    shuffle."""
    d = load_table(spark, sf_dir, "documents")
    arr = F.expr(_CHARS_SPARK)
    c = d.select(
        "doc_id",
        F.size(arr).cast("bigint").alias("n"),
        F.explode(arr).alias("ch"),
    )
    g = c.groupBy("doc_id", "n", "ch").agg(F.count("*").alias("cnt"))
    p = F.col("cnt").cast("double") / F.col("n")
    term = F.round(p * F.log(p), 12).cast("decimal(38,18)")
    return g.groupBy("doc_id", "n").agg(
        F.round(-F.sum(term).cast("double"), 4).alias("entropy")
    ).select("doc_id", F.col("n").alias("n_chars"), "entropy")


# ---------------------------------------------------------------------------
# sliding-window chunking
# ---------------------------------------------------------------------------
CHUNK_W, CHUNK_S = 32, 24  # window size, stride (25% overlap)


@query(
    "chunk_sliding_windows",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_DTOKS} AS toks, len({_DTOKS}) AS n FROM documents
    ),
    st AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, n - 1, {CHUNK_S})) AS s
      FROM t WHERE n > 0
    )
    SELECT doc_id,
           (s // {CHUNK_S})::INT AS chunk_id,
           len(list_slice(toks, s + 1, s + {CHUNK_W}))::INT AS n_toks,
           array_to_string(list_slice(toks, s + 1, s + {CHUNK_W}), ' ')
             AS chunk_text
    FROM st
    """,
    tags=("curation", "text", "chunking"),
)
def chunk_sliding_windows(spark, sf_dir):
    """Overlapping token-window chunking (W=32, stride 24): the step that
    turns curated documents into model-context-sized pieces, keeping 25%
    overlap so no boundary sentence is lost. Emits (doc_id, chunk_id,
    n_toks, chunk_text); the trailing partial chunk is kept.

    Scale shape: per-row explode of a start-offset sequence — narrow,
    no shuffle at all; chunk count per doc is n/stride so output size is
    predictable (≈ 1.33× input tokens at this overlap)."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.expr(_TOKS).alias("toks")).withColumn(
        "n", F.size("toks")
    ).filter(F.col("n") > 0)
    t = t.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(CHUNK_S))
        ).alias("s"),
    )
    chunk = F.slice(F.col("toks"), F.col("s") + 1, F.lit(CHUNK_W))
    return t.select(
        "doc_id",
        (F.col("s") / CHUNK_S).cast("int").alias("chunk_id"),
        F.size(chunk).alias("n_toks"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------
_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"\b555-[0-9]{4}\b"


@query(
    "pii_scrub",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 <> 0
                  THEN text || ' contact user' || doc_id::VARCHAR
                       || '@example.com or 555-'
                       || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                  ELSE text END AS t
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '{_EMAIL_RE}'))::INT AS n_emails,
           len(regexp_extract_all(t, '{_PHONE_RE}'))::INT AS n_phones,
           regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS clean_text
    FROM aug
    """,
    tags=("curation", "text", "pii"),
)
def pii_scrub(spark, sf_dir):
    """Regex PII redaction: emails and (toy North-American test-prefix)
    phone numbers are counted, then replaced with typed placeholder
    tokens. The synthetic corpus contains no natural PII, so the query
    deterministically injects a contact string into documents with
    doc_id % 3 != 0 first — both engines then exercise the real match +
    replace path, and the 1/3 of untouched documents pin the no-op branch.

    Patterns are RE2-and-Java-compatible (no lookaround), so the same
    strings run JVM-side in Spark (whole-stage codegen, no UDF) and in
    DuckDB. Scale shape: map-side only."""
    d = load_table(spark, sf_dir, "documents")
    aug = F.when(
        F.col("doc_id") % 3 != 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.col("text"))
    t = d.select("doc_id", aug.alias("t"))
    return t.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.col("t"), F.lit(_EMAIL_RE), F.lit(0))
        ).alias("n_emails"),
        F.size(
            F.regexp_extract_all(F.col("t"), F.lit(_PHONE_RE), F.lit(0))
        ).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# exact k-NN graph via tiled pair join + hierarchical top-k
# ---------------------------------------------------------------------------
KNN_K = IVF_TOP_K  # 3 — shared with the ANN so recall@k compares like-for-like

_KNN_DUCK = f"""
  SELECT qid, cid, cos FROM (
    SELECT q.vec_id AS qid, c.vec_id AS cid,
           list_dot_product(q.ne, c.ne) AS cos,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_dot_product(q.ne, c.ne) DESC, c.vec_id
           ) AS rn
    FROM n q JOIN n c ON c.vec_id <> q.vec_id
  ) WHERE rn <= {KNN_K}
"""


def _knn_graph(spark, sf_dir):
    """Exact top-K neighbor edges for EVERY vector (the corpus-default
    instantiation of knn_edges_from)."""
    return knn_edges_from(spark, normalized_embeddings(spark, sf_dir))


def knn_edges_from(spark, n, k: int = KNN_K):
    """Exact top-k neighbor edges for EVERY vector of a (vec_id, ne)
    unit-normalized frame.

    Same tile decomposition as dedup_embedding_cosine (each task holds
    two n/B blocks, never a full side), with a hierarchical top-k: the
    per-(tile, qid) top-k runs INSIDE the vectorized tile kernel
    (functions/vecmath.topk_edges_blocked — selection order identical to
    the old row_number window's ``cos DESC, cid``, on bit-identical cos
    doubles), so the O(n²) pair stream dies inside the tile tasks and
    only ≤ k·B candidates per query enter the final per-qid window.
    Versus the prior shape (SHUFFLE_HASH pair join + interpreted HOF
    fold + explode + per-tile window sort) this also removes the 2×-pair
    window sort; measured ~37% faster at sf0.1, bit-identical output
    (OPTIMIZATION_r15.md). Parameterized on the input frame so variant
    embeddings (dimension-truncated, quantized) reuse the exact shape
    (round11_extras.embedding_mrl_recall)."""
    from doc2dataset_spark.functions.vecmath import topk_edges_blocked

    partial = topk_edges_blocked(n, k, N_EMB_BLOCKS)
    w_final = W.partitionBy("qid").orderBy(F.desc("cos"), "cid")
    return (
        partial.withColumn("rn", F.row_number().over(w_final))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


@query(
    "knn_graph_topk",
    oracle=f"""
    WITH n AS ({NORM_EMB_DUCK})
    {_KNN_DUCK}
    """,
    tags=("similarity", "embeddings", "graph"),
)
def knn_graph_topk(spark, sf_dir):
    """Exact cosine k-NN graph (k=3) over every embedding — the ground
    truth the ANN variants are measured against, and the input graph for
    semantic clustering. See _knn_graph for the tiled hierarchical top-k
    shape that keeps it distributable."""
    return _knn_graph(spark, sf_dir)


# ---------------------------------------------------------------------------
# ANN recall evaluation
# ---------------------------------------------------------------------------

# DuckDB twin of sim_ann_ivf (scale.py) — seed centroids = first 16 vectors
_IVF_DUCK = f"""
  cents AS (SELECT vec_id AS cent_id, ne AS ce FROM n
            WHERE vec_id < {N_CENTROIDS}),
  assign AS (
    SELECT vec_id, ne, cent_id FROM (
      SELECT v.vec_id, v.ne, c.cent_id,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY list_dot_product(v.ne, c.ce) DESC, c.cent_id
             ) AS rn
      FROM n v CROSS JOIN cents c
    ) WHERE rn = 1
  ),
  ann AS (
    SELECT qid, cid FROM (
      SELECT q.vec_id AS qid, c.vec_id AS cid,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_dot_product(q.ne, c.ne) DESC, c.vec_id
             ) AS rn
      FROM assign q JOIN assign c
        ON q.cent_id = c.cent_id AND c.vec_id <> q.vec_id
    ) WHERE rn <= {IVF_TOP_K}
  )
"""


@query(
    "ann_recall_eval",
    oracle=f"""
    WITH n AS ({NORM_EMB_DUCK}),
    {_IVF_DUCK},
    truth AS ({_KNN_DUCK})
    SELECT t.qid,
           count(a.cid)::INT AS n_hits,
           round(count(a.cid) / {KNN_K}.0, 4) AS recall
    FROM truth t LEFT JOIN ann a ON a.qid = t.qid AND a.cid = t.cid
    GROUP BY t.qid
    """,
    tags=("similarity", "embeddings", "evaluation"),
)
def ann_recall_eval(spark, sf_dir):
    """Recall@3 of the IVF ANN against the exact k-NN graph, per query
    vector — ANN quality as a first-class query instead of an offline
    script, so an index change that tanks recall fails the same gate a
    correctness bug would. Both sides are deterministic (cosine ties
    broken by vec_id), so the recall values are exactly reproducible.

    Scale shape: both inputs are top-k-bounded (≤ k rows per query); the
    comparison is an equi-join on (qid, cid) + a per-qid count."""
    truth = _knn_graph(spark, sf_dir).select("qid", "cid")
    ann = _sim_ann_ivf(spark, sf_dir).select(
        "qid", F.col("cid").alias("acid")
    )
    joined = truth.join(
        ann,
        (truth["qid"] == ann["qid"]) & (truth["cid"] == ann["acid"]),
        "left",
    ).select(truth["qid"].alias("qid"), ann["acid"].alias("hit"))
    return joined.groupBy("qid").agg(
        F.count("hit").cast("int").alias("n_hits"),
        F.round(F.count("hit") / float(KNN_K), 4).alias("recall"),
    )


# ---------------------------------------------------------------------------
# Gopher-style composite quality rules (round 6)
# ---------------------------------------------------------------------------
GOPHER_MIN_WORDS = 30
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MWL = 3.0  # mean word length bounds (Rae et al. 2021 §A1.1)
GOPHER_MAX_MWL = 10.0
GOPHER_MIN_ALPHA_FRAC = 0.8  # >=80% of words contain an alphabetic char
GOPHER_STOPWORDS = ("the", "a", "of", "to", "and", "in")
GOPHER_MIN_STOPWORDS = 2  # distinct stopwords present


@query(
    "text_gopher_rules",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_DTOKS} AS w FROM documents
    ), m AS (
      SELECT doc_id,
             len(w)::BIGINT AS n_words,
             round(CAST(sum(strlen(x)) AS BIGINT)::DOUBLE
                   / greatest(len(w), 1), 4) AS mean_word_len,
             round(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
                     ::DOUBLE / greatest(len(w), 1), 4) AS alpha_frac,
             len(list_intersect(list_distinct(w),
                 ['the','a','of','to','and','in']))::BIGINT AS n_stopwords
      FROM (SELECT doc_id, w, unnest(w) AS x FROM t)
      GROUP BY doc_id, w
    )
    SELECT doc_id, n_words, mean_word_len, alpha_frac, n_stopwords,
           n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
             AS ok_words,
           mean_word_len BETWEEN {GOPHER_MIN_MWL} AND {GOPHER_MAX_MWL}
             AS ok_mwl,
           alpha_frac >= {GOPHER_MIN_ALPHA_FRAC} AS ok_alpha,
           n_stopwords >= {GOPHER_MIN_STOPWORDS} AS ok_stop,
           (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
             AND (mean_word_len BETWEEN {GOPHER_MIN_MWL} AND {GOPHER_MAX_MWL})
             AND alpha_frac >= {GOPHER_MIN_ALPHA_FRAC}
             AND n_stopwords >= {GOPHER_MIN_STOPWORDS} AS keep
    FROM m
    """,
    tags=("quality", "documents", "pipeline"),
)
def text_gopher_rules(spark, sf_dir):
    """Composite Gopher-style document-quality rules (Rae et al. 2021
    §A1.1, the public DeepMind filter family): word-count bounds, mean
    word length bounds, alphabetic-word fraction, and a minimum count of
    distinct common stopwords — each rule surfaced as its own flag plus
    the conjunctive ``keep``, so a pipeline can audit WHICH rule dropped
    a document (the difference between a filter and a black box). The
    line/bullet-shaped Gopher rules need newline structure this corpus
    lacks; the word-statistics family implemented here is the portable
    core.

    Scale shape: entirely row-local — one higher-order-function pass per
    document (no explode, no shuffle at all beyond the scan); every
    metric is computed inside whole-stage codegen and the flags are
    plain column algebra. The filter a 100 TB pipeline runs FIRST,
    before anything that shuffles."""
    return gopher_flags(load_table(spark, sf_dir, "documents"))


def gopher_flags(d):
    """Frame-parameterized Gopher rule evaluation over a (doc_id, text)
    frame — shared by the batch query above and the streaming curate
    stage (streaming/curate.py), so batch and stream can never drift."""
    toks = F.expr(_TOKS)
    n_words = F.size("w")
    safe_n = F.greatest(n_words, F.lit(1))
    mean_wl = F.round(
        F.aggregate(
            "w", F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        ).cast("double")
        / safe_n,
        4,
    )
    alpha_frac = F.round(
        F.size(F.filter("w", lambda x: x.rlike("[a-z]"))).cast("double")
        / safe_n,
        4,
    )
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct("w"),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    ).cast("bigint")
    m = d.select("doc_id", toks.alias("w")).select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
        n_stop.alias("n_stopwords"),
    )
    ok_words = F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    ok_mwl = F.col("mean_word_len").between(GOPHER_MIN_MWL, GOPHER_MAX_MWL)
    ok_alpha = F.col("alpha_frac") >= GOPHER_MIN_ALPHA_FRAC
    ok_stop = F.col("n_stopwords") >= GOPHER_MIN_STOPWORDS
    return m.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "alpha_frac",
        "n_stopwords",
        ok_words.alias("ok_words"),
        ok_mwl.alias("ok_mwl"),
        ok_alpha.alias("ok_alpha"),
        ok_stop.alias("ok_stop"),
        (ok_words & ok_mwl & ok_alpha & ok_stop).alias("keep"),
    )


# ---------------------------------------------------------------------------
# invisible-character scrubbing (round 6)
# ---------------------------------------------------------------------------
# the classic web-text contaminants: zero-width space/non-joiner, BOM,
# soft hyphen — invisible to the eye, poison to tokenizers and dedup
_INVIS = ["​", "‌", "﻿", "­"]


def _inject_sql(engine: str) -> str:
    """Deterministically contaminate documents in-query (the pii_scrub
    precedent: the corpus has no natural invisibles, so plant them and
    exercise the scrubber for real). doc_id%3==0 gets a ZWSP+BOM pair
    after the first 8 chars; doc_id%5==0 additionally a soft hyphen +
    ZWNJ at position 3."""
    if engine == "spark":
        sub = "substring"
        cat = "concat"
    else:
        sub = "substr"
        cat = "concat"
    zw, zwnj, bom, shy = _INVIS
    base = (
        f"CASE WHEN doc_id % 3 = 0 THEN "
        f"{cat}({sub}(text, 1, 8), '{zw}{bom}', {sub}(text, 9)) "
        f"ELSE text END"
    )
    return (
        f"CASE WHEN doc_id % 5 = 0 THEN "
        f"{cat}({sub}({base}, 1, 3), '{shy}{zwnj}', {sub}({base}, 4)) "
        f"ELSE {base} END"
    )


def _strip_chain(expr: str) -> str:
    """Nested literal replace() — identical byte semantics in both
    engines (no regex dialect in play)."""
    for ch in _INVIS:
        expr = f"replace({expr}, '{ch}', '')"
    return expr


@query(
    "text_clean_invisible",
    oracle=f"""
    WITH dirty AS (
      SELECT doc_id, {_inject_sql('duck')} AS raw FROM documents
    )
    SELECT doc_id,
           length(raw)::BIGINT - length({_strip_chain('raw')})::BIGINT
             AS n_removed,
           length({_strip_chain('raw')})::BIGINT AS clean_len,
           md5({_strip_chain('raw')}) AS clean_md5
    FROM dirty
    """,
    tags=("text", "cleaning", "documents"),
)
def text_clean_invisible(spark, sf_dir):
    """Invisible-character scrubbing: strip zero-width space/non-joiner,
    BOM and soft hyphen — the characters that make two visually
    identical documents hash differently and smuggle extra tokens past
    length filters. The corpus is deterministically contaminated
    in-query first (doc_id%3 / doc_id%5 plant rules), so the scrubber is
    exercised on real occurrences in BOTH engines; the md5 of the
    cleaned text proves content equality, not just counts.

    Scale shape: entirely row-local — a literal replace() chain (no
    regex dialect divergence) inside whole-stage codegen; zero
    shuffle."""
    d = load_table(spark, sf_dir, "documents")
    raw = F.expr(_inject_sql("spark"))
    dirty = d.select("doc_id", raw.alias("raw"))
    clean = F.expr(_strip_chain("raw"))
    return dirty.select(
        "doc_id",
        (F.length("raw") - F.length(clean)).cast("bigint").alias("n_removed"),
        F.length(clean).cast("bigint").alias("clean_len"),
        F.md5(clean).alias("clean_md5"),
    )
