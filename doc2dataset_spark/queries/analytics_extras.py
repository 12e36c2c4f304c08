"""Event-analytics and corpus-quality extras, registered AFTER the frozen
driver gate (queries/__init__.py) and locally oracle-checked like
everything else.

- ``events_funnel``          ordered view → click → purchase funnel per
                             user: each stage must strictly follow the
                             previous user's stage timestamp — the
                             sequential-pattern query every product
                             analytics engine ships.
- ``retention_cohorts``      weekly cohort retention: users grouped by
                             first-seen week, counted in every week they
                             return — the classic triangle table.
- ``text_logprob_quality``   unigram log-probability quality proxy (the
                             cheap stand-in for a KenLM perplexity
                             filter): mean -ln p(token) per document
                             under the corpus unigram distribution.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from doc2dataset_spark.queries.core import query
from doc2dataset_spark.queries.textops import _DTOKS, _TOKS
from doc2dataset_spark.session import load_table

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


# ---------------------------------------------------------------------------
# ordered funnel
# ---------------------------------------------------------------------------
@query(
    "events_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS c_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.v_ts
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
      GROUP BY e.user_id
    )
    SELECT v.user_id,
           strftime(v.v_ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
           strftime(c.c_ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           strftime(p.p_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           (1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
              + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END)::INT
             AS stages_reached
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON c.user_id = p.user_id
    """,
    tags=("analytics", "events", "funnel"),
)
def events_funnel(spark, sf_dir):
    """Ordered funnel: the first view, the first click strictly AFTER
    that view, the first purchase strictly after that click — per user.
    Sequencing (not mere existence) is the semantics: a purchase before
    any click does not count, which is what separates a funnel from
    three independent counts.

    Scale shape: each stage is one filtered aggregation keyed by
    user_id plus an equi-join carrying a single timestamp per user —
    state per user is one row per stage, never the user's event list.
    The same chain extends to any stage count; no window over raw
    events, no self-join of the full table."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.date_format("v_ts", _TS_FMT).alias("view_ts"),
            F.date_format("c_ts", _TS_FMT).alias("click_ts"),
            F.date_format("p_ts", _TS_FMT).alias("purchase_ts"),
            (
                F.lit(1)
                + F.when(F.col("c_ts").isNull(), 0).otherwise(1)
                + F.when(F.col("p_ts").isNull(), 0).otherwise(1)
            )
            .cast("int")
            .alias("stages_reached"),
        )
    )


# ---------------------------------------------------------------------------
# weekly retention cohorts
# ---------------------------------------------------------------------------
@query(
    "retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ), sizes AS (
      SELECT cohort_week, count(*) AS cohort_n FROM firsts GROUP BY 1
    ), act AS (
      SELECT f.cohort_week, date_trunc('week', e.ts) AS active_week,
             count(DISTINCT e.user_id) AS n_active
      FROM events e JOIN firsts f ON e.user_id = f.user_id
      GROUP BY 1, 2
    )
    SELECT strftime(a.cohort_week, '%Y-%m-%d') AS cohort_week,
           strftime(a.active_week, '%Y-%m-%d') AS active_week,
           a.n_active::BIGINT AS n_active,
           round(a.n_active::DOUBLE / s.cohort_n, 4) AS retention
    FROM act a JOIN sizes s ON a.cohort_week = s.cohort_week
    """,
    tags=("analytics", "events", "retention"),
)
def retention_cohorts(spark, sf_dir):
    """Weekly cohort retention triangle: users bucketed by their
    first-seen ISO week, counted (distinct) in every week they are
    active, with the share of the cohort still active — the table
    behind every retention curve.

    Scale shape: one per-user min aggregation, one equi-join to carry
    the cohort label, one (cohort, week)-keyed count-distinct (two-level
    hash agg). No window, no self-join of events to events; the
    count(DISTINCT) shuffle key is (cohort, week, user) — uniform."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    sizes = firsts.groupBy("cohort_week").agg(F.count("*").alias("cohort_n"))
    act = (
        ev.join(firsts, "user_id")
        .groupBy(
            "cohort_week", F.date_trunc("week", F.col("ts")).alias("active_week")
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    return act.join(sizes, "cohort_week").select(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        F.date_format("active_week", "yyyy-MM-dd").alias("active_week"),
        F.col("n_active").cast("bigint").alias("n_active"),
        F.round(
            F.col("n_active").cast("double") / F.col("cohort_n"), 4
        ).alias("retention"),
    )


# ---------------------------------------------------------------------------
# unigram log-probability quality proxy
# ---------------------------------------------------------------------------
@query(
    "text_logprob_quality",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_DTOKS}) AS token FROM documents
    ), freq AS (
      SELECT token, count(*) AS cnt FROM tok GROUP BY token
    ), n AS (
      SELECT sum(cnt) AS total FROM freq
    ), scored AS (
      SELECT t.doc_id,
             round(-ln(f.cnt::DOUBLE / n.total), 12) AS nll
      FROM tok t JOIN freq f ON t.token = f.token CROSS JOIN n
    )
    SELECT doc_id,
           count(*)::BIGINT AS n_tokens,
           round((sum(nll::DECIMAL(38,18)) / count(*))::DOUBLE, 4)
             AS mean_nll
    FROM scored GROUP BY doc_id
    """,
    tags=("analytics", "text", "quality"),
)
def text_logprob_quality(spark, sf_dir):
    """Unigram log-probability quality proxy — the cheap stand-in for a
    KenLM perplexity filter: mean -ln p(token) per document under the
    corpus's own unigram distribution. Rare-token soup scores high
    (suspicious), common fluent text scores low; thresholding this is
    the first LM-based quality gate most corpus pipelines apply.

    Determinism: each token's -ln p is rounded to 12 dp and accumulated
    as exact DECIMAL(38,18) — the per-doc sum is then order-independent,
    the same discipline every dsum() aggregate here uses (ln itself is
    bit-identical across engines on identical doubles, the
    text_tfidf_topk precedent). Scale shape: the frequency table is one
    token-keyed aggregation; the probability join is token-keyed (AQE
    chooses broadcast when the vocabulary is small — never forced, the
    text_tfidf_topk rule); per-doc reduction is map-side combinable."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.expr(_TOKS)).alias("token"))
    freq = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    # total tokens from the freq aggregate — not a third tokenize scan
    n = freq.agg(F.sum("cnt").alias("total"))
    scored = (
        tok.join(freq, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.round(
                -F.log(F.col("cnt").cast("double") / F.col("total")), 12
            ).alias("nll"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.round(
            (
                F.sum(F.col("nll").cast("decimal(38,18)")) / F.count("*")
            ).cast("double"),
            4,
        ).alias("mean_nll"),
    )


# ---------------------------------------------------------------------------
# triangle counting over the near-dup graph
# ---------------------------------------------------------------------------
from doc2dataset_spark.queries.dedup import (  # noqa: E402
    _SIMHASH_PAIRS_ORACLE,
    dedup_simhash_pairs,
)


@query(
    "graph_triangles",
    oracle=f"""
    WITH pr AS ({_SIMHASH_PAIRS_ORACLE})
    SELECT a.da AS x, a.db AS y, b.db AS z
    FROM pr a JOIN pr b ON a.db = b.da
              JOIN pr c ON c.da = a.da AND c.db = b.db
    """,
    tags=("analytics", "graph", "documents"),
)
def graph_triangles(spark, sf_dir):
    """Triangle enumeration over the SimHash near-dup graph: each
    triangle (x < y < z) is three documents that are pairwise near-dups
    — the density signal that separates a true duplicate CLUSTER from a
    chain of borderline pairs (clustering coefficient, community
    strength; the standard graph-quality diagnostic next to connected
    components).

    Scale shape: the canonical two-join triangle enumeration over an
    ordered edge list (da < db everywhere, so each triangle is produced
    exactly once): first join keyed on the shared vertex, closing join
    keyed on BOTH endpoints — equi-joins only, never a cartesian. Edge
    lists are near-dup output (sparse by construction), and the ordered
    orientation bounds each vertex's join fan-out by its out-degree."""
    p = dedup_simhash_pairs(spark, sf_dir).select("da", "db")
    a = p.alias("a")
    b = p.alias("b")
    c = p.alias("c")
    return (
        a.join(b, F.col("a.db") == F.col("b.da"))
        .join(
            c,
            (F.col("c.da") == F.col("a.da")) & (F.col("c.db") == F.col("b.db")),
        )
        .select(
            F.col("a.da").alias("x"),
            F.col("a.db").alias("y"),
            F.col("b.db").alias("z"),
        )
    )
