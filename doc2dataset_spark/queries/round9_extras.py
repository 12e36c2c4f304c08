"""Round-9 queries: close the tokenizer-training loop and wire the
trained quality models into curation (round-8 verdict, Next round #6/#7).

- ``text_bpe_encode``   apply the text_bpe_merges-trained merge table to
                        the corpus: encode every word type with the
                        learned merges, then per-document token counts +
                        fertility (tokens/word) — the number a tokenizer
                        is actually judged by. Train-then-apply is the
                        full BPE lifecycle (Sennrich et al. ACL 2016 §3.2
                        applies the learned operations to new text).
- ``curate_corpus_scored``  the train-the-filter-then-filter lifecycle
                        real pipelines run (CCNet / LLaMA-style): gate
                        the curation chain on an in-engine-trained
                        quality classifier's scores, with a stage-audit
                        flag per document like the Gopher stage emits.
                        The trainer is FIXED-POINT (integer 1e-8 units,
                        rational Elliott link) so per-document scores
                        are bit-identical across engines by
                        construction — see the fixed-point note below.

Both are oracle-exact DuckDB twins (the encode oracle REUSES the
training oracle's unrolled CTE chain, so the applied merge table is
provably the trained one). Reference parity: the reference pipeline has
no tokenizer or model-driven curation (its scope ends at extraction —
/root/reference/doc2dataset/extractor.py); these extend the
training-data-pipeline surface the same way the round-7e/7f/7g waves do.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from doc2dataset_spark.queries.core import REGISTRY, query
from doc2dataset_spark.queries.dedup import (
    _DTOKS,
    _IVF_ASSIGN_DUCK,
    _TOKS,
    CELL_THRESHOLD,
    cell_assignments,
    spark_dot,
)
from doc2dataset_spark.queries.pipeline_extras import (
    _BIGRAMS,
    HEAD_WORDS,
    REP_FLAG,
)
from doc2dataset_spark.queries.round7f_extras import _DUCK_BG, _bigram_frame
from doc2dataset_spark.queries.round7g_extras import (
    _LR_TGT_SQL,
    _SP_G,
    _SP_REWRITE,
    BPE_MERGES,
    LR_BUCKETS,
    LR_ITERS,
    LR_TARGET,
    _bpe_training_rounds_sql,
    bpe_train_merges,
)
from doc2dataset_spark.session import load_table


# ---------------------------------------------------------------------------
# BPE encode: apply the trained merge table to the corpus
# ---------------------------------------------------------------------------
def _bpe_encode_rounds_sql() -> list[str]:
    """e{r} CTEs: the SAME greedy non-overlapping rewrite as the training
    chain's s{r}, applied to the UNFILTERED type dictionary (e0), keyed
    by tok so documents can join back. m{r} comes verbatim from
    _bpe_training_rounds_sql — one merge table, two consumers."""
    rounds = []
    for r in range(1, BPE_MERGES + 1):
        p = r - 1
        rounds.append(f"""
    e{r} AS MATERIALIZED (
      SELECT tok, flatten(list_transform(range(1, len(s) + 1), i ->
               CASE WHEN i < len(s) AND g[i] THEN [s[i] || s[i + 1]]
                    WHEN i >= 2 AND g[i - 1] THEN []
                    ELSE [s[i]] END)) AS s
      FROM (
        SELECT tok, s,
               list_transform(range(1, len(s)), i ->
                 (s[i] = m.p1 AND s[i + 1] = m.p2)
                 AND ((i - COALESCE(list_max(list_filter(range(1, i + 1),
                        j -> NOT (s[j] = m.p1 AND s[j + 1] = m.p2))), 0))
                      % 2 = 1)) AS g
        FROM e{p} CROSS JOIN m{r} m
      )
    )""")
    return rounds


def _bpe_encode_oracle() -> str:
    from doc2dataset_spark.queries.round7g_extras import BPE_MAX_WORD

    train = ",".join(_bpe_training_rounds_sql())
    enc = ",".join(_bpe_encode_rounds_sql())
    return f"""
    WITH tok AS (SELECT unnest({_DTOKS}) AS tok FROM documents),
    tf AS MATERIALIZED (SELECT tok, count(*) AS f FROM tok GROUP BY tok),
    s0 AS (
      SELECT list_transform(range(1, length(tok) + 1), i -> tok[i:i]) AS s,
             f
      FROM tf WHERE length(tok) BETWEEN 2 AND {BPE_MAX_WORD}
    ),
    {train},
    e0 AS MATERIALIZED (
      SELECT tok,
             list_transform(range(1, length(tok) + 1), i -> tok[i:i]) AS s
      FROM tf
    ),
    {enc},
    dt AS (SELECT doc_id, unnest({_DTOKS}) AS tok FROM documents)
    SELECT doc_id,
           count(*) AS n_words,
           CAST(SUM(len(e.s)) AS BIGINT) AS n_tokens,
           round(SUM(len(e.s))::DOUBLE / count(*), 4) AS fertility
    FROM dt JOIN e{BPE_MERGES} e USING (tok)
    GROUP BY doc_id
    """


def bpe_encode_types(tf):
    """Encode a (tok, f) word-type frame with the merge table trained on
    it: returns (tok, s) where s is the token's symbol array after all
    BPE_MERGES learned merges, applied in merge order with the same
    closed-form greedy rewrite the trainer uses. Conservation (concat of
    s == tok) is pytest-pinned for every type at the fixtures."""
    merges = bpe_train_merges(tf)
    enc = tf.select(
        "tok",
        F.expr(
            "transform(sequence(1, length(tok)), i -> substring(tok, i, 1))"
        ).alias("s"),
    )
    for m in merges:
        enc = (
            enc.crossJoin(
                F.broadcast(
                    m.select(
                        F.col("p1").alias("mp1"), F.col("p2").alias("mp2")
                    )
                )
            )
            .select("tok", "s", F.expr(_SP_G).alias("g"))
            .select("tok", F.expr(_SP_REWRITE).alias("s"))
        )
    return enc


@query(
    "text_bpe_encode",
    oracle=_bpe_encode_oracle(),
    tags=("text", "tokenizer", "iterative"),
)
def text_bpe_encode(spark, sf_dir):
    """Apply the trained BPE merge table to the corpus: per document,
    the word count, the encoded token count, and fertility
    (tokens per word — the standard tokenizer-quality metric; lower is
    better on in-domain text).

    The merge table is TRAINED IN THE SAME QUERY (bpe_train_merges over
    the word-type counts), then applied to the distinct-type dictionary
    — never to token occurrences: the corpus is touched exactly twice
    (once to count types, once to join the per-type token length back
    onto occurrences), and the 3-round rewrite runs over the
    vocabulary-bounded dictionary only. The occurrence join is a
    classic Zipf-skewed fact-to-dim equi-join (hot types like 'the'
    dominate); the dim side is one row per type, so AQE's skew split
    handles the hot keys and nothing is ever driver-side. Encoding per
    type is the same closed-form odd-offset greedy rewrite the trainer
    uses (word-length-bounded row-local lambda, no UDF).

    Oracle: the encode chain reuses the training oracle's unrolled
    m{r} CTEs verbatim, so Spark and DuckDB provably apply the same
    learned tokenizer. Fertility follows the shared double-division
    recipe (identical IEEE operands and order both sides)."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.expr(_TOKS)).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("f"))
        .localCheckpoint()
    )
    enc = bpe_encode_types(tf)
    dt = d.select("doc_id", F.explode(F.expr(_TOKS)).alias("tok"))
    return dt.join(enc.select("tok", F.size("s").alias("n_sym")), "tok").groupBy(
        "doc_id"
    ).agg(
        F.count("*").alias("n_words"),
        F.sum("n_sym").cast("bigint").alias("n_tokens"),
        F.round(
            F.sum("n_sym").cast("double") / F.count("*"), 4
        ).alias("fertility"),
    )


# ---------------------------------------------------------------------------
# model-scored curation: train the filter, then filter (fixed-point GD)
# ---------------------------------------------------------------------------
# Why fixed point: the float LR trainer (round7g_extras) cannot give
# full-corpus per-document score equality across engines — Math.exp vs
# libm is 1-ulp divergent, and double-space round(x, 8) disagrees between
# Spark (exact BigDecimal) and DuckDB (scaled multiply) precisely on the
# exact-8-dp boundary products that x = c/n features with power-of-2 n
# produce constantly (measured: 13-19/500 logits off by 1e-8, stable
# across reformulations). This trainer removes floats from the loop
# entirely: every quantity is an integer count of 1e-8 units (bigint /
# DECIMAL(38,0) on Spark, BIGINT / HUGEINT on DuckDB), every division is
# an explicit round-half-away-from-zero integer formula
#   rha(a, b) = sign(a) * ((2*|a| + b) DIV (2*b))
# (floor-div == truncating-div on the positive operands it is applied
# to), and the link is the rational fast sigmoid p = (N*U) / D with
# N = (U+|z|)+z, D = 2*(U+|z|) (Elliott 1993 — same monotone S-shape,
# range (0,1), p(0)=0.5, no transcendental). Identical integers in, the
# same integers out, on ANY engine at ANY scale — determinism by
# construction, not by fixture luck. The float sigmoid twin remains
# quality_classifier_lr (its top-k output is robust to ulp noise).

FX_U = 100_000_000  # 1.0 in fixed-point units (8 decimal places)


def _rha_spark(a: str, b: str) -> str:
    """Spark SQL round-half-away-from-zero of a/b (b > 0), integer-exact.
    DIV truncates toward zero == floor on the positive operands used."""
    return (
        f"(CASE WHEN ({a}) >= 0 THEN (2*({a}) + ({b})) DIV (2*({b})) "
        f"ELSE -((-2*({a}) + ({b})) DIV (2*({b}))) END)"
    )


def _rha_duck(a: str, b: str) -> str:
    """DuckDB twin of _rha_spark; operands must already be HUGEINT
    (DuckDB's // on DECIMAL degrades to float division — HUGEINT // is
    the exact integer path)."""
    return (
        f"(CASE WHEN ({a}) >= 0 THEN (2*({a}) + ({b})) // (2*({b})) "
        f"ELSE -((-2*({a}) + ({b})) // (2*({b}))) END)"
    )


def _fx_p8_duck(z8: str) -> str:
    """p8 = rha(N*U / D) with N=(U+|z|)+z >= 0, D=2*(U+|z|) — positive
    operands, so the plain (2*N*U + D) // (2*D) floor formula IS rha."""
    return (
        f"(2*(({FX_U} + abs({z8})) + {z8})*{FX_U} + 2*({FX_U} + abs({z8})))"
        f" // (2*(2*({FX_U} + abs({z8}))))"
    )


def _fx_oracle_ctes() -> str:
    """The fixed-point train-and-score chain for DuckDB, ending in a
    ``scored`` CTE: (doc_id, source, y, p8, score). Structure mirrors
    the float chain in round7g_extras._lr_scored_ctes; arithmetic is
    HUGEINT throughout."""
    rounds = []
    for r in range(1, LR_ITERS + 1):
        p = r - 1
        z16 = f"CAST(b.b8 AS HUGEINT)*{FX_U} + COALESCE(s.t16, CAST(0 AS HUGEINT))"
        rounds.append(f"""
    zr{r} AS MATERIALIZED (
      SELECT d.doc_id, d.y, {_rha_duck(z16, f'CAST({FX_U} AS HUGEINT)')} AS z8
      FROM docn d
      CROSS JOIN b{p} b
      LEFT JOIN (
        SELECT x.doc_id, SUM(CAST(w.w8 AS HUGEINT) * x.x8) AS t16
        FROM dfx x JOIN w{p} w USING (bucket)
        GROUP BY x.doc_id
      ) s ON s.doc_id = d.doc_id
    ),
    pr{r} AS MATERIALIZED (
      SELECT doc_id, y, {_fx_p8_duck('z8')} AS p8 FROM zr{r}
    ),
    g{r} AS MATERIALIZED (
      SELECT x.bucket, SUM((p.p8 - p.y*{FX_U}) * x.x8) AS S
      FROM dfx x JOIN pr{r} p USING (doc_id)
      GROUP BY x.bucket
    ),
    w{r} AS MATERIALIZED (
      SELECT w.bucket,
             w.w8 - {_rha_duck('g.S', f'CAST(nd AS HUGEINT)*{FX_U}')} AS w8
      FROM w{p} w JOIN g{r} g USING (bucket) CROSS JOIN ndocs
    ),
    b{r} AS MATERIALIZED (
      SELECT b.b8 - {_rha_duck('gb.S', 'CAST(nd AS HUGEINT)')} AS b8
      FROM b{p} b
      CROSS JOIN (SELECT SUM(p8 - y*{FX_U}) AS S FROM pr{r}) gb
      CROSS JOIN ndocs
    )""")
    n = LR_ITERS
    zf16 = f"CAST(b.b8 AS HUGEINT)*{FX_U} + COALESCE(s.t16, CAST(0 AS HUGEINT))"
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
                  THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y
      FROM dfc GROUP BY doc_id, source
    ),
    dfx AS MATERIALIZED (
      SELECT f.doc_id, f.bucket,
             CAST((2*f.c*{FX_U} + d.n) // (2*d.n) AS HUGEINT) AS x8
      FROM dfc f JOIN docn d USING (doc_id)
    ),
    ndocs AS (SELECT COUNT(*) AS nd FROM docn),
    w0 AS (SELECT DISTINCT bucket, CAST(0 AS HUGEINT) AS w8 FROM dfc),
    b0 AS (SELECT CAST(0 AS HUGEINT) AS b8),
    {",".join(rounds)},
    zf AS MATERIALIZED (
      SELECT d.doc_id, d.source, d.y,
             {_rha_duck(zf16, f'CAST({FX_U} AS HUGEINT)')} AS z8
      FROM docn d
      CROSS JOIN b{n} b
      LEFT JOIN (
        SELECT x.doc_id, SUM(CAST(w.w8 AS HUGEINT) * x.x8) AS t16
        FROM dfx x JOIN w{n} w USING (bucket)
        GROUP BY x.doc_id
      ) s ON s.doc_id = d.doc_id
    ),
    scored AS MATERIALIZED (
      SELECT doc_id, source, y, {_fx_p8_duck('z8')} AS p8,
             CAST({_fx_p8_duck('z8')} AS DOUBLE) / {FX_U} AS score
      FROM zf
    )"""


def _fx_features(spark, sf_dir):
    """(docn, dfx, buckets, nd) over the documents table — see
    fx_features_of."""
    docn, dfx, buckets = fx_features_of(load_table(spark, sf_dir, "documents"))
    return docn, dfx, buckets, docn.count()


def fx_features_of(d):
    """(docn, dfx, buckets): the fixed-point feature frames for ANY
    (doc_id, source, text) frame — per-doc labels and the integer
    x8 = rha(c*U/n) relative-frequency features, checkpointed once
    (at 100 TB: a persisted feature table). Every feature is a pure
    per-document function, so scores computed batch-by-batch (the
    streaming scored gate) are bit-identical to corpus-wide scoring."""
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
            F.when(F.col("source").isin(*LR_TARGET), F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("y"),
        )
        .localCheckpoint()
    )
    dfx = (
        dfc.join(docn.select("doc_id", "n"), "doc_id")
        .selectExpr(
            "doc_id",
            "bucket",
            f"CAST((2*c*{FX_U} + n) DIV (2*n) AS DECIMAL(38,0)) AS x8",
        )
        .localCheckpoint()
    )
    buckets = dfc.select("bucket").distinct().localCheckpoint()
    return docn, dfx, buckets


def _fx_score(docn, dfx, w, b):
    """(doc_id, source, y, p8, score) under weight frame ``w``
    (bucket, w8 DECIMAL(38,0)) + 1-row bias ``b`` (b8): the integer
    dot-product sum, rha logit, and rational-link probability."""
    t = (
        dfx.join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("w8") * F.col("x8")).alias("t16"))
    )
    z = (
        docn.crossJoin(F.broadcast(b))
        .join(t, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "source",
            "y",
            f"b8*{FX_U} + COALESCE(t16, CAST(0 AS DECIMAL(38,0))) AS z16",
        )
        .selectExpr(
            "doc_id",
            "source",
            "y",
            _rha_spark("z16", str(FX_U)) + " AS z8",
        )
    )
    p8 = (
        f"(2*CAST(({FX_U} + abs(z8)) + z8 AS DECIMAL(38,0))*{FX_U}"
        f" + 2*({FX_U} + abs(z8)))"
        f" DIV (2*CAST(2*({FX_U} + abs(z8)) AS DECIMAL(38,0)))"
    )
    return z.selectExpr(
        "doc_id",
        "source",
        "y",
        p8 + " AS p8",
    ).selectExpr(
        "doc_id",
        "source",
        "y",
        "p8",
        f"CAST(p8 AS DOUBLE) / {FX_U} AS score",
    )


def fx_train(spark, sf_dir):
    """Run the LR_ITERS fixed-point GD rounds; returns the trained
    (w, b) frames plus the feature frames they were trained on. The
    train-once seam: save_fx_model persists (w, b); fx_score_from
    reloads them and scores without re-training."""
    docn, dfx, buckets, nd = _fx_features(spark, sf_dir)
    w = buckets.selectExpr("bucket", "CAST(0 AS DECIMAL(38,0)) AS w8")
    b = docn.sparkSession.range(1).selectExpr(
        "CAST(0 AS DECIMAL(38,0)) AS b8"
    )
    for _ in range(LR_ITERS):
        # one materialization per round: p feeds BOTH the per-bucket
        # gradient join and the bias aggregate — left lazy, the whole
        # dot-product scoring subtree re-executes once per consumer
        p = _fx_score(docn, dfx, w, b).localCheckpoint()
        g = (
            dfx.join(p.select("doc_id", "p8", "y"), "doc_id")
            .groupBy("bucket")
            .agg(
                F.sum(
                    F.expr(f"CAST(p8 - y*{FX_U} AS DECIMAL(38,0)) * x8")
                ).alias("S")
            )
        )
        w = (
            w.join(g, "bucket")
            .selectExpr(
                "bucket",
                "CAST(w8 - "
                + _rha_spark("S", f"CAST({nd} AS DECIMAL(38,0))*{FX_U}")
                + " AS DECIMAL(38,0)) AS w8",
            )
            .localCheckpoint()
        )
        sb = p.agg(
            F.sum(F.expr(f"CAST(p8 - y*{FX_U} AS DECIMAL(38,0))")).alias("S")
        )
        b = (
            b.crossJoin(sb)
            .selectExpr(
                "CAST(b8 - "
                + _rha_spark("S", str(nd))
                + " AS DECIMAL(38,0)) AS b8"
            )
            .localCheckpoint()
        )
    return w, b, docn, dfx


def fx_train_score(spark, sf_dir):
    """Fixed-point LR training over hashed-bigram features, returning
    (doc_id, source, y, p8, score) for every featured document. Same
    feature hashing, target labels, and round/iteration structure as
    quality_classifier_lr — only the number system differs (see the
    fixed-point note above). State per round: the <= LR_BUCKETS-row
    weight table + a 1-row bias, both broadcast; the feature frame is
    computed once and checkpointed; the only scalar pulled to the
    driver is the document count."""
    w, b, docn, dfx = fx_train(spark, sf_dir)
    return _fx_score(docn, dfx, w, b)


def _scored_curation_oracle() -> str:
    # CTE namespace note: _fx_oracle_ctes defines ws (doc_id, source, w)
    # and bg (aligned bigram pairs) via _DUCK_BG — the curation stages
    # below reuse both, so the model's features and the repetition rule
    # provably read the same tokens. _IVF_ASSIGN_DUCK's CTE names
    # (n, cents, assign) are disjoint from the training chain's.
    return f"""
    WITH {_fx_oracle_ctes()},
    med AS (SELECT quantile_cont(p8, 0.5) AS m FROM scored),
    bgc AS (
      SELECT doc_id, w1 || ' ' || w2 AS b2, count(*) AS c
      FROM bg GROUP BY doc_id, b2
    ),
    repf AS (
      SELECT doc_id, max(c)::DOUBLE / sum(c) > {REP_FLAG} AS is_rep
      FROM bgc GROUP BY doc_id
    ),
    base AS (
      SELECT s.doc_id, s.source, s.score,
             CAST(s.p8 AS DOUBLE) >= m.m AS pass_model,
             COALESCE(r.is_rep, FALSE) AS flag_rep
      FROM scored s CROSS JOIN med m
      LEFT JOIN repf r ON r.doc_id = s.doc_id
    ),
    fpin AS (
      SELECT b.doc_id,
             md5(array_to_string(w.w[1:{HEAD_WORDS}], ' ')) AS fingerprint,
             CAST(substr(b.source, 4) AS INT) AS prio
      FROM base b JOIN ws w USING (doc_id)
      WHERE b.pass_model AND NOT b.flag_rep
    ),
    fpk AS (
      SELECT doc_id,
             row_number() OVER (
               PARTITION BY fingerprint ORDER BY prio, doc_id
             ) = 1 AS kept_fp
      FROM fpin
    ),
    {_IVF_ASSIGN_DUCK},
    svec AS (
      SELECT f.doc_id, a.ne, a.cent_id
      FROM fpk f JOIN assign a ON a.vec_id = f.doc_id
      WHERE f.kept_fp
    ),
    semdrop AS (
      SELECT DISTINCT y.doc_id
      FROM svec x JOIN svec y
        ON x.cent_id = y.cent_id AND x.doc_id < y.doc_id
      WHERE list_dot_product(x.ne, y.ne) >= {CELL_THRESHOLD}
    )
    SELECT b.doc_id, b.source, b.score, b.pass_model, b.flag_rep,
           COALESCE(f.kept_fp, FALSE) AS kept_fp,
           COALESCE(f.kept_fp, FALSE)
             AND b.doc_id NOT IN (SELECT doc_id FROM semdrop) AS kept
    FROM base b LEFT JOIN fpk f USING (doc_id)
    """


@query(
    "curate_corpus_scored",
    oracle=_scored_curation_oracle(),
    tags=("pipeline", "quality", "ml", "composition"),
)
def curate_corpus_scored(spark, sf_dir):
    """The train-the-filter-then-filter lifecycle (CCNet/LLaMA-style):
    train the in-engine quality classifier, gate the curation chain on
    its scores, and emit a per-document STAGE AUDIT — one row per
    scoreable document with every stage's verdict, the shape the Gopher
    stage (text_gopher_rules) uses for explainable filtering:

      pass_model  model score >= the corpus median score ("keep the
                  more target-like half" — rank semantics without a
                  global window: Spark percentile == DuckDB
                  quantile_cont, the agg_percentiles-proven pair, on
                  INTEGER fixed-point scores so the interpolated median
                  is exact in both engines; broadcast as a 1-row scalar)
      flag_rep    top-bigram fraction > REP_FLAG (the curate_corpus
                  repetition rule, over the SAME bigram frame the model
                  features come from)
      kept_fp     survived cross-source head-fingerprint dedup among
                  model+repetition survivors (priority: lowest source
                  number, doc_id tiebreak)
      kept        kept_fp AND survived cell-blocked SemDeDup (docs
                  without an embedding row pass through, as in
                  curate_corpus)

    The model is the FIXED-POINT GD trainer (fx_train_score): integer
    1e-8 units end to end, rational Elliott link, explicit
    round-half-away divisions — per-document scores are bit-identical
    across engines by construction (the float/sigmoid twin,
    quality_classifier_lr, is 1e-8-divergent on ~4% of docs and only
    safe for top-k cuts; see the fixed-point note above).

    Scale shape: identical stage plans to curate_corpus plus the
    trainer (parameter-bounded state: <= LR_BUCKETS-row weights + 1-row
    bias per round, broadcast; feature frame checkpointed once); the
    median is one scalar aggregate broadcast back (the blessed bounded
    crossJoin), never a global sort/window; every stage join is keyed
    (doc_id, fingerprint, cent_id) with bounded skew. Universe note:
    rows = documents with >= 1 bigram (unscoreable docs cannot pass a
    model gate; every fixture doc qualifies)."""
    scored = fx_train_score(spark, sf_dir).localCheckpoint()
    return _scored_curation_plan(
        spark, sf_dir, scored, cell_assignments(spark, sf_dir)
    )


def _scored_curation_plan(spark, sf_dir, scored, assign):
    """The scored-curation stage chain, parameterized by the scored
    frame (cold: fx_train_score; warm: fx_score_from a persisted model)
    and the embedding cell assignment (cold: cell_assignments; warm:
    the persisted IVF index postings) — both serve hash-identical
    results by construction, so curate_corpus_scored and
    curate_corpus_scored_indexed share one oracle."""
    med = scored.agg(F.expr("percentile(p8, 0.5)").alias("m"))
    d = load_table(spark, sf_dir, "documents")
    bgc = (
        d.select("doc_id", F.explode(F.expr(_BIGRAMS)).alias("b2"))
        .groupBy("doc_id", "b2")
        .agg(F.count("*").alias("c"))
    )
    repf = bgc.groupBy("doc_id").agg(
        ((F.max("c") / F.sum("c")) > REP_FLAG).alias("is_rep")
    )
    base = (
        scored.crossJoin(F.broadcast(med))
        .join(repf, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "score",
            (F.col("p8").cast("double") >= F.col("m")).alias("pass_model"),
            F.coalesce("is_rep", F.lit(False)).alias("flag_rep"),
        )
        .localCheckpoint()
    )
    meta = d.select(
        "doc_id",
        F.md5(
            F.expr(f"array_join(slice({_TOKS}, 1, {HEAD_WORDS}), ' ')")
        ).alias("fingerprint"),
    )
    fpin = (
        base.filter(F.col("pass_model") & ~F.col("flag_rep"))
        .select(
            "doc_id",
            F.expr("CAST(substring(source, 4, 10) AS int)").alias("prio"),
        )
        .join(meta, "doc_id")
    )
    wdup = W.partitionBy("fingerprint").orderBy("prio", "doc_id")
    fpk = fpin.select(
        "doc_id", (F.row_number().over(wdup) == 1).alias("kept_fp")
    )
    svec = (
        fpk.filter("kept_fp")
        .select(F.col("doc_id").alias("vec_id"))
        .join(assign, "vec_id")
    )
    # within-cell pair scan as the vectorized per-cell NumPy kernel —
    # same swap as dedup_embedding_cell (vecmath.cell_pairs_blocked):
    # bit-identical cos doubles, so the >= comparison keeps the same set
    from doc2dataset_spark.functions.vecmath import cell_pairs_blocked

    semdrop = (
        cell_pairs_blocked(svec, CELL_THRESHOLD)
        .select(F.col("vb").alias("doc_id"))
        .distinct()
        .withColumn("semdropped", F.lit(True))
    )
    return (
        base.join(fpk, "doc_id", "left")
        .join(semdrop, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "score",
            "pass_model",
            "flag_rep",
            F.coalesce("kept_fp", F.lit(False)).alias("kept_fp"),
            (
                F.coalesce("kept_fp", F.lit(False))
                & F.col("semdropped").isNull()
            ).alias("kept"),
        )
    )

# ---------------------------------------------------------------------------
# warm serving paths: persisted model + persisted indexes
# ---------------------------------------------------------------------------
def save_fx_model(spark, sf_dir, model_dir: str) -> None:
    """Train once, persist the model: the <= LR_BUCKETS-row fixed-point
    weight table and the 1-row bias, as plain parquet. DECIMAL(38,0)
    round-trips parquet exactly, and the trainer is deterministic, so a
    reloaded model scores bit-identically to a fresh training run."""
    import posixpath

    w, b, docn, dfx = fx_train(spark, sf_dir)
    # calibrate the serving threshold ON THE TRAINING CORPUS (the
    # median-score gate curate_corpus_scored applies) and freeze it with
    # the model: at ingest time there is no "corpus median" — the
    # threshold is a model parameter, chosen at training time, exactly
    # like a production quality filter ships its cutoff
    thr = _fx_score(docn, dfx, w, b).agg(
        F.expr("percentile(p8, 0.5)").alias("thr")
    )
    w.write.mode("overwrite").parquet(posixpath.join(model_dir, "weights"))
    b.write.mode("overwrite").parquet(posixpath.join(model_dir, "bias"))
    thr.write.mode("overwrite").parquet(
        posixpath.join(model_dir, "threshold")
    )


def fx_score_from(spark, sf_dir, model_dir: str):
    """Score the corpus under a persisted fixed-point model — the
    train-once-score-many production path (training is the expensive
    corpus-wide iteration; scoring is one broadcast join + one
    aggregate pass)."""
    import posixpath

    w = spark.read.parquet(posixpath.join(model_dir, "weights"))
    b = spark.read.parquet(posixpath.join(model_dir, "bias"))
    docn, dfx, _, _ = _fx_features(spark, sf_dir)
    return _fx_score(docn, dfx, w, b)


def _artifact_cache_dir(sf_dir: str, kind: str, table: str) -> str:
    """Deterministic per-corpus cache location — the shared
    fsio.artifact_cache_dir (size + mtime_ns key, one helper for every
    persisted artifact kind)."""
    from doc2dataset_spark.fsio import artifact_cache_dir

    return artifact_cache_dir(sf_dir, kind, table)


@query(
    "dedup_minhash_indexed",
    oracle=REGISTRY["dedup_minhash_lsh"].oracle,
    tags=("dedup", "documents", "index"),
)
def dedup_minhash_indexed(spark, sf_dir):
    """dedup_minhash_lsh served from the PERSISTED band-postings index
    (operators/minhash_index.py — the third persisted-index lifecycle,
    next to the IVF vector index and the inverted text index): candidate
    pairs come from a (band, bh) self-join over the index files alone;
    the corpus is touched only to verify the surviving candidates (the
    shared minhash_verify stage, semi-joined to the candidate doc set).
    First call per corpus builds the index into an mtime-keyed temp
    cache (what a deployment does at ingest); subsequent calls never
    recompute a signature. batch_id partitioning is the incremental
    seam: new-batch dedup appends one partition and joins across
    batches instead of rebuilding. Identical oracle — band hashes are
    the exact bands_of expressions, so index-served output is
    hash-identical to the in-query path."""
    from doc2dataset_spark.fsio import ensure_local_cache_dir
    from doc2dataset_spark.operators.minhash_index import (
        build_minhash_index,
        candidates_from_index,
    )
    from doc2dataset_spark.queries.dedup import minhash_verify

    idx = ensure_local_cache_dir(
        _artifact_cache_dir(sf_dir, "mh", "documents"),
        "bands",
        lambda tmp: build_minhash_index(spark, sf_dir, tmp),
    )
    cand = candidates_from_index(spark, idx).cache()
    return minhash_verify(spark, sf_dir, cand)


@query(
    "curate_corpus_scored_indexed",
    oracle=REGISTRY["curate_corpus_scored"].oracle,
    tags=("pipeline", "quality", "ml", "composition", "index"),
)
def curate_corpus_scored_indexed(spark, sf_dir):
    """curate_corpus_scored on the WARM path: the quality model is
    trained once and persisted (save_fx_model — deterministic
    fixed-point weights, exact parquet round-trip), and the SemDeDup
    stage reads the persisted IVF index postings instead of
    re-quantizing the corpus (the curate_corpus_indexed discipline).
    Identical oracle: both artifacts serve bit-identical frames by
    construction, locked by the shared _scored_curation_plan. This is
    the lifecycle a production pipeline actually runs — train the
    filter at corpus build time, apply it to every batch thereafter."""
    from doc2dataset_spark.fsio import ensure_local_cache_dir
    from doc2dataset_spark.operators.vector_index import (
        _postings_path,
        build_ivf_index,
    )
    from doc2dataset_spark.queries.pipeline_extras import _cached_index_dir

    ividx = ensure_local_cache_dir(
        _cached_index_dir(sf_dir),
        "centroids",
        lambda tmp: build_ivf_index(spark, sf_dir, tmp),
    )
    midx = ensure_local_cache_dir(
        _artifact_cache_dir(sf_dir, "fxlr", "documents"),
        "weights",
        lambda tmp: save_fx_model(spark, sf_dir, tmp),
    )
    scored = fx_score_from(spark, sf_dir, midx).localCheckpoint()
    assign = spark.read.parquet(_postings_path(ividx)).select(
        "vec_id", "ne", "cent_id"
    )
    return _scored_curation_plan(spark, sf_dir, scored, assign)

# ---------------------------------------------------------------------------
# winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — MOSS)
# ---------------------------------------------------------------------------
# The guaranteed-detection, reduced-density alternative to indexing every
# shingle: hash the ORDERED 3-token shingles, slide a window of W hashes,
# keep each window's minimum — any shared token run spanning >= W + 2
# shingle positions shares a fingerprint (the winnowing guarantee), while
# the expected fingerprint density is 2/(W+1) of the shingle count, so
# the posting index is ~(W+1)/2 x smaller than the full shingle index at
# the same detection floor. Used by MOSS and code-clone detection at
# scale; here over word shingles for document near-dup candidates.
WINNOW_W = 4
WINNOW_THRESHOLD = 0.5
# Hub-fingerprint cap: window-MIN selection is biased toward globally
# LOW hash values, so a common shingle that happens to hash low is
# selected by every document containing it — on the sf1 stress corpus
# the unpruned fingerprint self-join produced 34M candidate groups
# (vs 250k true pairs) with one hub fp fanning out quadratically in one
# shuffle partition. Natural-language winnowing therefore prunes
# high-document-frequency fingerprints from the match sets — the MOSS
# analog of excluding template/baseline code shared by many
# submissions. df <= 64 keeps every twin-cluster fingerprint (df ~ the
# duplication factor) and drops only the non-discriminative head.
WINNOW_MAXDF = 64

_WINNOW_FPS_SPARK = f"""
CASE WHEN size(h) >= {WINNOW_W} THEN
  array_distinct(transform(sequence(1, size(h) - {WINNOW_W} + 1),
    i -> array_min(slice(h, i, {WINNOW_W}))))
WHEN size(h) >= 1 THEN array(array_min(h))
ELSE cast(array() AS array<bigint>) END
"""

_WINNOW_CTE_DUCK = f"""
WITH ws AS (SELECT doc_id, {_DTOKS} AS w FROM documents),
shl AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3
              THEN list_transform(range(1, len(w) - 1),
                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
              ELSE [] END AS shl
  FROM ws
),
hs AS (
  SELECT doc_id,
         list_transform(shl,
           s -> ('0x' || substr(md5(s), 1, 12))::BIGINT) AS h
  FROM shl
),
fps AS (
  SELECT doc_id,
         CASE WHEN len(h) >= {WINNOW_W} THEN
                list_distinct(list_transform(
                  range(1, len(h) - {WINNOW_W} + 2),
                  i -> list_min(h[i:i+{WINNOW_W}-1])))
              WHEN len(h) >= 1 THEN [list_min(h)]
              ELSE [] END AS fps
  FROM hs
),
fpx AS (SELECT doc_id, unnest(fps) AS fp FROM fps),
fpc AS (SELECT doc_id, count(*) AS n FROM fpx GROUP BY doc_id)
"""

_WINNOW_ORACLE = _WINNOW_CTE_DUCK + f""",
fpdf AS (SELECT fp, count(*) AS df FROM fpx GROUP BY fp),
fpk AS MATERIALIZED (
  SELECT x.doc_id, x.fp
  FROM fpx x JOIN fpdf USING (fp) WHERE df <= {WINNOW_MAXDF}
),
fkc AS (SELECT doc_id, count(*) AS n FROM fpk GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS shared
  FROM fpk a JOIN fpk b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT da, db, shared,
       round(shared::DOUBLE / (ca.n + cb.n - shared), 4) AS jacc
FROM shared
JOIN fkc ca ON ca.doc_id = da
JOIN fkc cb ON cb.doc_id = db
WHERE shared::DOUBLE / (ca.n + cb.n - shared) >= {WINNOW_THRESHOLD}
"""


def winnow_fingerprints(docs):
    """(doc_id, fp) exploded winnowed fingerprints of a (doc_id, text)
    frame — ordered shingles, hash, window-min, distinct. Row-local
    array lambdas end to end; docs shorter than 3 tokens have no
    shingles and drop out (same universe rule as the shingle family)."""
    toks = docs.select("doc_id", F.expr(_TOKS).alias("toks"))
    shl = toks.select(
        "doc_id",
        F.expr(
            "CASE WHEN size(toks) >= 3 THEN "
            "transform(sequence(1, size(toks) - 2), "
            "i -> concat(element_at(toks, i), ' ', "
            "element_at(toks, i + 1), ' ', element_at(toks, i + 2))) "
            "ELSE cast(array() AS array<string>) END"
        ).alias("shl"),
    )
    hs = shl.select(
        "doc_id",
        F.expr(
            "transform(shl, s -> "
            "cast(conv(substring(md5(s), 1, 12), 16, 10) AS bigint))"
        ).alias("h"),
    )
    return hs.select(
        "doc_id", F.explode(F.expr(_WINNOW_FPS_SPARK)).alias("fp")
    )


@query(
    "dedup_winnow",
    oracle=_WINNOW_ORACLE,
    tags=("dedup", "documents", "scale"),
)
def dedup_winnow(spark, sf_dir):
    """Near-dup pairs by winnowing fingerprints: docs sharing winnowed
    window-min shingle hashes, scored by fingerprint-set Jaccard >=
    WINNOW_THRESHOLD. The blocking key is the fingerprint value — the
    same equi-join shape as the shingle-blocked family but over a
    2/(W+1)-density fingerprint set (the winnowing guarantee keeps every
    shared run of >= W+2 shingle positions detectable), so at 100 TB the
    posting index and the candidate join input are ~2.5x smaller than
    dedup_ngram_jaccard's at the same floor. Pure row-local lambdas +
    one blocked equi-join + map-side-combined counts; the Jaccard is the
    shared round-4 double-division recipe."""
    # deferred import: operators.winnow_index imports this module's
    # fingerprint expressions at its top level
    from doc2dataset_spark.operators.winnow_index import pairs_from_postings

    d = load_table(spark, sf_dir, "documents")
    # cache: the per-shingle md5 + window-min lambda pipeline has three
    # consumers (df prune, count frame, self-join) and would otherwise
    # re-execute per consumer (measured 61 s -> join-bound at sf1)
    raw = winnow_fingerprints(d).cache()
    # scoring (df prune + fp-blocked join + Jaccard) is the single
    # definition shared with the index-served path
    return pairs_from_postings(raw)


_WINNOW_STATS_ORACLE = _WINNOW_CTE_DUCK + """
SELECT count(*) AS n_docs,
       CAST(SUM(len(shl.shl)) AS BIGINT) AS n_shingles,
       CAST(SUM(len(f.fps)) AS BIGINT) AS n_fps,
       round(SUM(len(f.fps))::DOUBLE / SUM(len(shl.shl)), 4) AS density
FROM shl JOIN fps f USING (doc_id)
WHERE len(shl.shl) > 0
"""


@query(
    "dedup_winnow_stats",
    oracle=_WINNOW_STATS_ORACLE,
    tags=("dedup", "documents", "contract"),
)
def dedup_winnow_stats(spark, sf_dir):
    """One-row contract of the winnowing density claim: distinct
    fingerprints per shingle position must sit near the theoretical
    2/(W+1) expectation (0.4 at W=4) — the measured index-size reduction
    dedup_winnow's 100 TB story rests on, oracle-exact so the driver
    hash-checks the actual density every round."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.expr(_TOKS).alias("toks"))
    frame = toks.select(
        "doc_id",
        F.expr(
            "CASE WHEN size(toks) >= 3 THEN "
            "transform(sequence(1, size(toks) - 2), "
            "i -> concat(element_at(toks, i), ' ', "
            "element_at(toks, i + 1), ' ', element_at(toks, i + 2))) "
            "ELSE cast(array() AS array<string>) END"
        ).alias("shl"),
    ).select(
        "doc_id",
        F.size("shl").alias("n_sh"),
        F.expr(
            "transform(shl, s -> "
            "cast(conv(substring(md5(s), 1, 12), 16, 10) AS bigint))"
        ).alias("h"),
    ).select(
        "doc_id", "n_sh", F.size(F.expr(_WINNOW_FPS_SPARK)).alias("n_fp")
    ).filter(F.col("n_sh") > 0)
    return frame.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_sh").cast("bigint").alias("n_shingles"),
        F.sum("n_fp").cast("bigint").alias("n_fps"),
        F.round(
            F.sum("n_fp").cast("double") / F.sum("n_sh"), 4
        ).alias("density"),
    )

_WINNOW_RECALL_ORACLE = f"""
WITH wq AS MATERIALIZED (
  SELECT da, db FROM ({_WINNOW_ORACLE})
),
eq AS MATERIALIZED (
  SELECT da, db FROM ({{exact_oracle}})
),
j AS (
  SELECT COALESCE(w.da, e.da) AS da, COALESCE(w.db, e.db) AS db,
         w.da IS NOT NULL AS in_w, e.da IS NOT NULL AS in_e
  FROM wq w FULL JOIN eq e ON w.da = e.da AND w.db = e.db
)
SELECT CAST(SUM(CASE WHEN in_w THEN 1 ELSE 0 END) AS BIGINT) AS n_winnow,
       CAST(SUM(CASE WHEN in_e THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN in_w AND in_e THEN 1 ELSE 0 END) AS BIGINT)
         AS n_both,
       round(SUM(CASE WHEN in_w AND in_e THEN 1 ELSE 0 END)::DOUBLE
             / SUM(CASE WHEN in_w THEN 1 ELSE 0 END), 4) AS precision,
       round(SUM(CASE WHEN in_w AND in_e THEN 1 ELSE 0 END)::DOUBLE
             / SUM(CASE WHEN in_e THEN 1 ELSE 0 END), 4) AS recall
FROM j
"""


@query(
    "dedup_winnow_recall",
    oracle=None,  # assigned below: composes dedup_ngram_jaccard's oracle
    tags=("dedup", "documents", "eval"),
)
def dedup_winnow_recall(spark, sf_dir):
    """One-row detector evaluation: winnowing's pair set judged against
    the exact shingle-Jaccard >= 0.5 ground truth (dedup_ngram_jaccard)
    — precision (reported pairs that are true near-dups) and recall
    (true near-dups the 2/(W+1)-density fingerprint index still catches).
    The ann_recall_eval discipline applied to the dedup family: every
    approximate detector ships with an oracle-gated quality row, so a
    parameter change that silently costs recall fails the driver hash,
    not a human review. Composition-only plan: both detectors' full
    plans + one (da, db) full outer join + one aggregate row."""
    from doc2dataset_spark.queries.dedup import dedup_ngram_jaccard

    wq = dedup_winnow(spark, sf_dir).select("da", "db")
    eq = dedup_ngram_jaccard(spark, sf_dir).select("da", "db")
    j = wq.withColumn("in_w", F.lit(True)).join(
        eq.withColumn("in_e", F.lit(True)),
        ["da", "db"],
        "full",
    ).select(
        F.coalesce("in_w", F.lit(False)).alias("in_w"),
        F.coalesce("in_e", F.lit(False)).alias("in_e"),
    )
    return j.agg(
        F.sum(F.col("in_w").cast("int")).cast("bigint").alias("n_winnow"),
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


# late oracle assignment: dedup_ngram_jaccard's oracle text is composed
# as a derived-table subquery (its WITH nests legally inside FROM (...));
# assigned post-registration because the exact oracle is a registry
# attribute, not a module constant
REGISTRY["dedup_winnow_recall"].oracle = _WINNOW_RECALL_ORACLE.format(
    exact_oracle=REGISTRY["dedup_ngram_jaccard"].oracle
)


@query(
    "dedup_minhash_recall",
    oracle=None,  # assigned below: composes both detectors' own oracles
    tags=("dedup", "documents", "eval"),
)
def dedup_minhash_recall(spark, sf_dir):
    """The dedup_winnow_recall discipline for the MinHash-LSH detector:
    its verified pair set judged against the exact shingle-Jaccard
    ground truth. LSH can MISS pairs (band collisions are probabilistic
    — the s-curve's false-negative side, curve-level-evaluated by
    dedup_lsh_scurve); this row pins the realized set-level precision
    and recall at the shipped 4x4 banding so a banding change that
    silently costs recall fails the driver hash. Precision is 1.0 by
    construction (candidates are exact-verified before output)."""
    from doc2dataset_spark.queries.dedup import (
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
    )

    wq = dedup_minhash_lsh(spark, sf_dir).select("da", "db")
    eq = dedup_ngram_jaccard(spark, sf_dir).select("da", "db")
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


def _detector_recall_oracle(detector_oracle: str, exact_oracle: str) -> str:
    """The winnow-recall oracle shape parameterized by the detector's
    own oracle in the wq slot — the subquery projects (da, db) only, so
    detectors with extra output columns (jaccard etc.) compose
    unchanged."""
    return f"""
WITH wq AS MATERIALIZED (
  SELECT da, db FROM ({detector_oracle})
),
eq AS MATERIALIZED (
  SELECT da, db FROM ({exact_oracle})
),
j AS (
  SELECT COALESCE(w.da, e.da) AS da, COALESCE(w.db, e.db) AS db,
         w.da IS NOT NULL AS in_w, e.da IS NOT NULL AS in_e
  FROM wq w FULL JOIN eq e ON w.da = e.da AND w.db = e.db
)
SELECT CAST(SUM(CASE WHEN in_w THEN 1 ELSE 0 END) AS BIGINT)
         AS n_detector,
       CAST(SUM(CASE WHEN in_e THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN in_w AND in_e THEN 1 ELSE 0 END) AS BIGINT)
         AS n_both,
       round(SUM(CASE WHEN in_w AND in_e THEN 1 ELSE 0 END)::DOUBLE
             / SUM(CASE WHEN in_w THEN 1 ELSE 0 END), 4) AS precision,
       round(SUM(CASE WHEN in_w AND in_e THEN 1 ELSE 0 END)::DOUBLE
             / SUM(CASE WHEN in_e THEN 1 ELSE 0 END), 4) AS recall
FROM j
"""


REGISTRY["dedup_minhash_recall"].oracle = _detector_recall_oracle(
    REGISTRY["dedup_minhash_lsh"].oracle,
    REGISTRY["dedup_ngram_jaccard"].oracle,
)
