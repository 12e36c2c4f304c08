"""Round-7 session-7 extras: in-engine model TRAINING loops — the two
classic "train a small model on the corpus, then apply it" curation
stages, both executed as bounded unrolled iterations of aggregation
cascades (the dedup_cluster_cc / graph_kcore iterative discipline).

- ``quality_classifier_lr``  the fastText-style quality classifier of
                             LLaMA/CCNet-era pipelines: a logistic
                             regression over hashed-bigram features is
                             trained by LR_ITERS full-batch gradient
                             steps to separate curated TARGET sources
                             from the pool, then every document is
                             scored and the most target-like come back.
                             Where quality_dsir_weights is the closed-
                             form generative twin (Naive-Bayes ratio),
                             this is the discriminative one — actual
                             iterative training in-engine.
- ``text_bpe_merges``        BPE tokenizer TRAINING (Sennrich et al.,
                             ACL 2016): BPE_MERGES greedy merge rounds
                             over distinct word types; each round
                             counts frequency-weighted adjacent symbol
                             pairs, picks the argmax, and rewrites
                             every word's symbol array with greedy
                             non-overlapping left-to-right merges. The
                             merge table that comes back IS the trained
                             tokenizer. Follow-up to text_bpe_pairs
                             (which is round 1's count only).

Cross-engine exactness: all transcendentals go through the proven
round-8 → DECIMAL(38,10) order-independent summation recipe (ln
precedent: text_tfidf_topk; exp is new here — Java Math.exp and libm
exp were measured 1-ulp apart on some arguments, which round-8 absorbs
identically to the ln case). Float multiply/divide on identical doubles
are IEEE correctly-rounded, hence bit-equal; every cross-engine sum is
decimal. The greedy-merge rewrite is a closed-form row-local array
expression (match runs → odd-position merges), identical lambdas in
both engines — no sequential fold, no UDF.

Scale shape: quality_classifier_lr's per-doc feature frame is computed
ONCE and localCheckpointed (at 100 TB: a persisted feature table); each
gradient step is two broadcast joins (weights ≤ LR_BUCKETS rows) + one
map-side-combinable aggregate — the weight table never exceeds
LR_BUCKETS rows no matter the corpus. text_bpe_merges aggregates over
DISTINCT word types (vocabulary-bounded, Zipf-absorbable), each round
one pair-count aggregate + a 1-row broadcast argmax + a row-local
rewrite. Every top-k is orderBy().limit() → TakeOrderedAndProject.

Reference basis: the reference has no trainable scoring or tokenizer
(filters.py word-count gates only); both are public-literature
training-data operators.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from doc2dataset_spark.queries.core import query
from doc2dataset_spark.queries.dedup import _DTOKS, _TOKS
from doc2dataset_spark.queries.round7f_extras import _DUCK_BG, _bigram_frame
from doc2dataset_spark.session import load_table

LR_BUCKETS = 64
LR_ITERS = 3
LR_ETA = 1.0
LR_TOPK = 20
LR_TARGET = ("src0", "src1", "src2")
_LR_TGT_SQL = "(" + ", ".join(f"'{s}'" for s in LR_TARGET) + ")"

BPE_MERGES = 3
BPE_MAX_WORD = 16  # declared cap: longer word types are tokenizer noise


# ---------------------------------------------------------------------------
# logistic-regression quality classifier (full-batch GD, unrolled)
# ---------------------------------------------------------------------------
def _lr_scored_ctes() -> str:
    """The full training-and-scoring CTE chain (everything after WITH,
    ending in a ``scored`` CTE with one row per featured document:
    doc_id, source, label, score).

    Exactness note (round 9): full-corpus per-document score equality
    across engines is NOT achievable with this float/exp formulation —
    Java Math.exp vs libm differ by 1 ulp on some inputs, the divergence
    feeds back through the GD rounds, and double-space round(x, 8)
    additionally breaks exact 8-dp boundary products (x = c/n with a
    power-of-2 n makes w*x land exactly on 8-dp decimals whose double
    sits a hair to one side; the two engines' round() implementations
    then disagree — measured 13-19/500 logits off by 1e-8). The top-k
    cut quality_classifier_lr takes is robust to that; consumers that
    need full-corpus equality use the FIXED-POINT trainer in
    round9_extras (integer 1e-8 units, rational link, no floats in the
    loop) instead."""
    p_expr = "round(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + exp(-z)), 8)"
    rounds = []
    for r in range(1, LR_ITERS + 1):
        p = r - 1
        rounds.append(f"""
    z{r} AS MATERIALIZED (
      SELECT d.doc_id, d.source, d.y,
             round(CAST(b.b AS DECIMAL(38,10))
                   + COALESCE(s.t, CAST(0 AS DECIMAL(38,10))), 8)::DOUBLE
               AS z
      FROM docn d
      CROSS JOIN b{p} b
      LEFT JOIN (
        SELECT x.doc_id,
               SUM(CAST(round(w.w * x.x, 8) AS DECIMAL(38,10))) AS t
        FROM dfcx x JOIN w{p} w USING (bucket)
        GROUP BY x.doc_id
      ) s ON s.doc_id = d.doc_id
    ),
    p{r} AS MATERIALIZED (
      SELECT doc_id, source, y,
             {p_expr} AS p
      FROM z{r}
    ),
    g{r} AS MATERIALIZED (
      SELECT x.bucket,
             round(CAST(SUM(CAST(round((p.p - p.y) * x.x, 8)
                                 AS DECIMAL(38,10))) AS DOUBLE)
                   / (SELECT nd FROM ndocs), 8) AS grad
      FROM dfcx x JOIN p{r} p USING (doc_id)
      GROUP BY x.bucket
    ),
    w{r} AS MATERIALIZED (
      SELECT w.bucket,
             round(w.w - CAST({LR_ETA} AS DOUBLE) * g.grad, 8) AS w
      FROM w{p} w JOIN g{r} g USING (bucket)
    ),
    b{r} AS MATERIALIZED (
      SELECT round(b.b - CAST({LR_ETA} AS DOUBLE) * gb.grad, 8) AS b
      FROM b{p} b CROSS JOIN (
        SELECT round(CAST(SUM(CAST(round(p - y, 8) AS DECIMAL(38,10)))
                          AS DOUBLE)
                     / (SELECT nd FROM ndocs), 8) AS grad
        FROM p{r}
      ) gb
    )""")
    n = LR_ITERS
    return f"""{_DUCK_BG},
    feat AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(w1 || ' ' || w2), 1, 12))::BIGINT
               % {LR_BUCKETS} AS bucket
      FROM bg
    ),
    dfc AS MATERIALIZED (
      SELECT doc_id, source, bucket, count(*) AS c
      FROM feat GROUP BY doc_id, source, bucket
    ),
    docn AS MATERIALIZED (
      SELECT doc_id, source, SUM(c) AS n,
             CASE WHEN source IN {_LR_TGT_SQL}
                  THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS y
      FROM dfc GROUP BY doc_id, source
    ),
    dfcx AS MATERIALIZED (
      SELECT f.doc_id, f.bucket,
             CAST(f.c AS DOUBLE) / d.n AS x
      FROM dfc f JOIN docn d USING (doc_id)
    ),
    ndocs AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM docn),
    w0 AS (SELECT DISTINCT bucket, CAST(0 AS DOUBLE) AS w FROM dfc),
    b0 AS (SELECT CAST(0 AS DOUBLE) AS b),
    {",".join(rounds)},
    zf AS MATERIALIZED (
      SELECT d.doc_id, d.source, d.y,
             round(CAST(b.b AS DECIMAL(38,10))
                   + COALESCE(s.t, CAST(0 AS DECIMAL(38,10))), 8)::DOUBLE
               AS z
      FROM docn d
      CROSS JOIN b{n} b
      LEFT JOIN (
        SELECT x.doc_id,
               SUM(CAST(round(w.w * x.x, 8) AS DECIMAL(38,10))) AS t
        FROM dfcx x JOIN w{n} w USING (bucket)
        GROUP BY x.doc_id
      ) s ON s.doc_id = d.doc_id
    ),
    scored AS MATERIALIZED (
      SELECT doc_id, source, CAST(y AS BIGINT) AS label,
             {p_expr} AS score
      FROM zf
    )"""


def _lr_oracle() -> str:
    """Unrolled-iteration DuckDB twin; same CTE per round, w0 = 0."""
    return f"""
    WITH {_lr_scored_ctes()}
    SELECT doc_id, source, label, score
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT {LR_TOPK}
    """


def _lr_score(docn, dfcx, w, b):
    """z/p per doc under weight frame ``w`` (bucket, w) + 1-row bias
    ``b`` (b): the decimal-exact dot product + round-8 sigmoid."""
    term = F.round(F.col("w") * F.col("x"), 8).cast("decimal(38,10)")
    # z stays in DECIMAL space through the rounding: b (an 8-dp value
    # stored as double) + the 10-dp decimal dot-product sum has exact
    # 10-dp ties at the 8-dp rounding boundary (~1% of docs per scoring
    # pass), and double-space round() breaks those ties by binary noise
    # — measured 13-19/500 cross-engine 1e-8 logit flips. Decimal round
    # is exact and half-away-from-zero in BOTH engines (tie rule
    # verified), then one cast back to double.
    s = (
        dfcx.join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(term).alias("t"))
    )
    zero_dec = F.lit(0).cast("decimal(38,10)")
    z = (
        docn.crossJoin(F.broadcast(b))
        .join(s, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "y",
            F.round(
                F.col("b").cast("decimal(38,10)")
                + F.coalesce(F.col("t"), zero_dec),
                8,
            )
            .cast("double")
            .alias("z"),
        )
    )
    return z.select(
        "doc_id",
        "source",
        "y",
        "z",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))), 8)
        .alias("p"),
    )


@query(
    "quality_classifier_lr",
    oracle=_lr_oracle(),
    tags=("quality", "ml", "classifier"),
)
def quality_classifier_lr(spark, sf_dir):
    """Train-and-apply quality classifier: logistic regression over
    LR_BUCKETS hashed-bigram relative-frequency features, LR_ITERS
    full-batch gradient-descent steps (w0 = 0 → p = 0.5 exactly on step
    one), labels = "document comes from a curated TARGET source"; every
    document is then scored by the trained model and the LR_TOPK most
    target-like come back (score is a pure function of text, so pool
    documents that read like the target outrank off-profile ones).
    The discriminative sibling of quality_dsir_weights — the
    "quality classifier" stage of LLaMA/RedPajama-era pipelines,
    trained in-engine instead of by an external fastText binary.

    Scale shape: the per-doc feature frame (≤ LR_BUCKETS rows/doc) is
    computed once and localCheckpointed — the only corpus-scale
    aggregates. Each GD step is: broadcast-join the ≤ LR_BUCKETS-row
    weight table onto the feature frame, one (doc) partial agg for z,
    one (bucket) partial agg for the gradient — weight state is
    parameter-bounded forever, and the per-round localCheckpoint keeps
    lineage O(1) like dedup_cluster_cc. Final cut is
    TakeOrderedAndProject. Exactness: round-8 terms, DECIMAL(38,10)
    sums, round-8 sigmoid (absorbing the measured 1-ulp Math.exp vs
    libm divergence), IEEE-exact float mul/div elsewhere."""
    out = lr_train_score(spark, sf_dir).select(
        "doc_id",
        "source",
        F.col("y").cast("bigint").alias("label"),
        F.col("p").alias("score"),
    )
    return out.orderBy(F.desc("score"), "doc_id").limit(LR_TOPK)


def lr_train_score(spark, sf_dir):
    """Train the LR quality model (LR_ITERS full-batch GD rounds, w0=0)
    and score EVERY featured document: returns (doc_id, source, y, z, p).
    Float/sigmoid formulation — exact for quality_classifier_lr's top-k
    cut; see _lr_scored_ctes for why full-corpus score equality needs
    round9_extras' fixed-point trainer instead."""
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
        .localCheckpoint()
    )
    dfcx = (
        dfc.join(docn.select("doc_id", "n"), "doc_id")
        .select(
            "doc_id",
            "bucket",
            (F.col("c").cast("double") / F.col("n")).alias("x"),
        )
        .localCheckpoint()
    )
    nd = float(docn.count())
    w = dfc.select("bucket").distinct().select(
        "bucket", F.lit(0.0).alias("w")
    )
    b = spark.range(1).select(F.lit(0.0).alias("b"))
    gterm = F.round((F.col("p") - F.col("y")) * F.col("x"), 8).cast(
        "decimal(38,10)"
    )
    bterm = F.round(F.col("p") - F.col("y"), 8).cast("decimal(38,10)")
    for _ in range(LR_ITERS):
        # one materialization per round: p feeds BOTH the per-bucket
        # gradient join and the bias aggregate — left lazy, the whole
        # dot-product scoring subtree re-executes once per consumer
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
    return _lr_score(docn, dfcx, w, b)


# ---------------------------------------------------------------------------
# BPE tokenizer training: unrolled greedy merge rounds
# ---------------------------------------------------------------------------
def _bpe_training_rounds_sql() -> list[str]:
    """The unrolled-round CTE chain (pr{r}/pc{r}/m{r}/s{r}) shared by the
    training oracle here and the encode oracle in round9_extras: both
    must derive the SAME merge table or the encode side silently trains
    a different tokenizer than the one it claims to apply."""
    rounds = []
    for r in range(1, BPE_MERGES + 1):
        p = r - 1
        rounds.append(f"""
    pr{r} AS MATERIALIZED (
      SELECT f, unnest(list_transform(range(1, len(s)),
                       i -> struct_pack(p1 := s[i], p2 := s[i+1]))) AS u
      FROM s{p}
    ),
    pc{r} AS MATERIALIZED (
      SELECT u.p1 AS p1, u.p2 AS p2, SUM(f) AS cnt
      FROM pr{r} GROUP BY 1, 2
    ),
    m{r} AS MATERIALIZED (SELECT p1, p2, cnt FROM pc{r}
             ORDER BY cnt DESC, p1, p2 LIMIT 1),
    s{r} AS MATERIALIZED (
      SELECT flatten(list_transform(range(1, len(s) + 1), i ->
               CASE WHEN i < len(s) AND g[i] THEN [s[i] || s[i + 1]]
                    WHEN i >= 2 AND g[i - 1] THEN []
                    ELSE [s[i]] END)) AS s,
             f
      FROM (
        SELECT s, f,
               list_transform(range(1, len(s)), i ->
                 (s[i] = m.p1 AND s[i + 1] = m.p2)
                 AND ((i - COALESCE(list_max(list_filter(range(1, i + 1),
                        j -> NOT (s[j] = m.p1 AND s[j + 1] = m.p2))), 0))
                      % 2 = 1)) AS g
        FROM s{p} CROSS JOIN m{r} m
      )
    )""")
    return rounds


def _bpe_oracle() -> str:
    """Unrolled-round DuckDB twin of the greedy merge loop."""
    rounds = _bpe_training_rounds_sql()
    sel = "\n    UNION ALL ".join(
        f"SELECT {r} AS merge_round, p1, p2, CAST(cnt AS BIGINT) AS cnt "
        f"FROM m{r}"
        for r in range(1, BPE_MERGES + 1)
    )
    return f"""
    WITH tok AS (SELECT unnest({_DTOKS}) AS tok FROM documents),
    tf AS MATERIALIZED (SELECT tok, count(*) AS f FROM tok GROUP BY tok),
    s0 AS MATERIALIZED (
      SELECT list_transform(range(1, length(tok) + 1), i -> tok[i:i]) AS s,
             f
      FROM tf WHERE length(tok) BETWEEN 2 AND {BPE_MAX_WORD}
    ),
    {",".join(rounds)}
    {sel}
    ORDER BY merge_round
    """


# Spark twins of the row-local rewrite lambdas (ANSI-safe: every
# element_at is index-guarded by the surrounding CASE structure, and
# sequence() is never called with start > stop — Spark's sequence runs
# DESCENDING there, unlike DuckDB's empty range)
_SP_PAIRS = """
    CASE WHEN size(s) >= 2
         THEN transform(sequence(1, size(s) - 1),
                        i -> struct(element_at(s, i) AS p1,
                                    element_at(s, i + 1) AS p2))
         ELSE array() END
"""
_SP_G = """
    CASE WHEN size(s) >= 2
         THEN transform(sequence(1, size(s) - 1), i ->
                (element_at(s, i) = mp1 AND element_at(s, i + 1) = mp2)
                AND ((i - coalesce(array_max(filter(sequence(1, i),
                       j -> NOT (element_at(s, j) = mp1
                                 AND element_at(s, j + 1) = mp2))), 0))
                     % 2 = 1))
         ELSE array() END
"""
_SP_REWRITE = """
    flatten(transform(sequence(1, size(s)), i ->
      CASE WHEN i < size(s) THEN
        CASE WHEN element_at(g, i)
               THEN array(concat(element_at(s, i), element_at(s, i + 1)))
             WHEN i = 1 THEN array(element_at(s, 1))
             WHEN element_at(g, i - 1) THEN array()
             ELSE array(element_at(s, i)) END
      ELSE
        CASE WHEN i = 1 THEN array(element_at(s, 1))
             WHEN element_at(g, i - 1) THEN array()
             ELSE array(element_at(s, i)) END
      END))
"""


@query(
    "text_bpe_merges",
    oracle=_bpe_oracle(),
    tags=("text", "tokenizer", "iterative"),
)
def text_bpe_merges(spark, sf_dir):
    """BPE tokenizer training, BPE_MERGES greedy rounds: each round
    counts frequency-weighted adjacent symbol pairs over the distinct-
    word-type dictionary, picks the most frequent pair (cnt desc, then
    lexicographic — the deterministic tiebreak), and rewrites every
    word's symbol array with greedy non-overlapping left-to-right
    merges of that pair. Returns the merge table (merge_round, p1, p2,
    cnt) — i.e. the trained tokenizer itself, exactly what a BPE
    vocabulary file stores (Sennrich et al. ACL 2016, the dictionary-
    of-word-types formulation of §3.2).

    The greedy rewrite is CLOSED-FORM, not a sequential fold: within
    each maximal run of consecutive overlapping matches, exactly the
    odd offsets merge (position i merges iff it matches and the match
    run ending at i has odd length) — a pure row-local array lambda,
    word-length-bounded (≤ BPE_MAX_WORD), identical in both engines.

    Scale shape: corpus text is touched ONCE (the word-type count,
    Zipf-keyed and partial-agg absorbable); every round thereafter
    aggregates the vocabulary-bounded type dictionary (pair partial
    agg → 1-row TakeOrdered argmax → broadcast → row-local rewrite),
    with a per-round localCheckpoint pinning the rewritten dictionary
    like dedup_cluster_cc pins labels. Merge state is 1 row/round."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.expr(_TOKS)).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("f"))
    )
    merges = bpe_train_merges(tf)
    out = merges[0]
    for mdf in merges[1:]:
        out = out.unionAll(mdf)
    return out.orderBy("merge_round")


def bpe_train_merges(tf):
    """Run the BPE_MERGES greedy training rounds over a (tok, f)
    word-type frame; returns one checkpointed 1-row frame
    (merge_round, p1, p2, cnt) per round, in merge order — the trained
    merge table, consumed both by text_bpe_merges (training output) and
    round9_extras.text_bpe_encode (application to the corpus)."""
    syms = (
        tf.filter(F.length("tok").between(2, BPE_MAX_WORD))
        .select(
            F.expr(
                "transform(sequence(1, length(tok)), "
                "i -> substring(tok, i, 1))"
            ).alias("s"),
            "f",
        )
        .localCheckpoint()
    )
    merges = []
    for r in range(1, BPE_MERGES + 1):
        pc = (
            syms.select("f", F.explode(F.expr(_SP_PAIRS)).alias("u"))
            .groupBy(F.col("u")["p1"].alias("p1"), F.col("u")["p2"].alias("p2"))
            .agg(F.sum("f").alias("cnt"))
        )
        m = (
            pc.orderBy(F.desc("cnt"), "p1", "p2")
            .limit(1)
            .localCheckpoint()
        )
        merges.append(
            m.select(
                F.lit(r).alias("merge_round"),
                "p1",
                "p2",
                F.col("cnt").cast("bigint").alias("cnt"),
            )
        )
        if r < BPE_MERGES:
            syms = (
                syms.crossJoin(
                    F.broadcast(
                        m.select(
                            F.col("p1").alias("mp1"),
                            F.col("p2").alias("mp2"),
                        )
                    )
                )
                .select("s", "f", F.expr(_SP_G).alias("g"))
                .select(F.expr(_SP_REWRITE).alias("s"), "f")
                .localCheckpoint()
            )
    return merges
