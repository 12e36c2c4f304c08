"""Declared queries Q20-Q32 (SURVEY §2.3): window functions, set operations,
subqueries, nested/JSON data, pivot, time bucketing, sessionization, as-of.

Determinism: every window ORDER BY carries a unique-key tiebreaker; running
sums accumulate in DECIMAL so frame-evaluation order (incremental vs segment
tree) cannot produce ulp drift between engines.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from doc2dataset_spark.queries.core import dsum, query, sql_dsum
from doc2dataset_spark.session import load_table, register_views


# ---------------------------------------------------------------------------
# Q20 — ranking windows
# ---------------------------------------------------------------------------
@query(
    "q20_ranking_windows",
    oracle="""
    SELECT o_orderkey,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS rn,
           rank()       OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS rnk,
           dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS drnk,
           ntile(4)     OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS nt
    FROM orders
    """,
    tags=("relational", "window"),
)
def q20(spark, sf_dir):
    """row_number/rank/dense_rank/ntile per customer by order date."""
    o = load_table(spark, sf_dir, "orders")
    w_tie = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_date = W.partitionBy("o_custkey").orderBy("o_orderdate")
    return o.select(
        "o_orderkey",
        F.row_number().over(w_tie).alias("rn"),
        F.rank().over(w_date).alias("rnk"),
        F.dense_rank().over(w_date).alias("drnk"),
        F.ntile(4).over(w_tie).alias("nt"),
    )


# ---------------------------------------------------------------------------
# Q21 — analytic windows (lag/lead/first/last)
# ---------------------------------------------------------------------------
@query(
    "q21_analytic_windows",
    oracle="""
    SELECT event_id, user_id,
           lag(value)  OVER w AS prev_val,
           lead(value) OVER w AS next_val,
           first_value(event_type) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_type,
           last_value(event_type) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("relational", "window"),
)
def q21(spark, sf_dir):
    """lag/lead/first/last over per-user event streams."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_val"),
        F.lead("value").over(w).alias("next_val"),
        F.first("event_type").over(w_full).alias("first_type"),
        F.last("event_type").over(w_full).alias("last_type"),
    )


# ---------------------------------------------------------------------------
# Q22 — frame-spec windows (running sum, sliding average)
# ---------------------------------------------------------------------------
@query(
    "q22_frame_windows",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(SUM(CAST(l_quantity AS DECIMAL(38,6))) OVER
             (PARTITION BY l_suppkey
              ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)::DOUBLE
             AS running_qty,
           round(SUM(CAST(l_quantity AS DECIMAL(38,6))) OVER w3 ::DOUBLE
                 / COUNT(*) OVER w3, 4) AS slide_avg
    FROM lineitem
    WINDOW w3 AS (PARTITION BY l_suppkey
                  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    tags=("relational", "window"),
)
def q22(spark, sf_dir):
    """running sum (unbounded→current) + sliding 3-row average.

    The synthetic lineitem is NOT (orderkey, linenumber)-unique (sf0.1 has
    one full ordering-tuple collision), so l_quantity joins the ORDER BY:
    rows still tied after that are interchangeable for a quantity running
    sum, making the frame deterministic without a unique key."""
    li = load_table(spark, sf_dir, "lineitem")
    order = ["l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"]
    w_run = (
        W.partitionBy("l_suppkey").orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    )
    w3 = W.partitionBy("l_suppkey").orderBy(*order).rowsBetween(-2, 0)
    qdec = F.col("l_quantity").cast("decimal(38,6)")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum(qdec).over(w_run), 4).cast("double").alias("running_qty"),
        F.round(
            F.sum(qdec).over(w3).cast("double") / F.count(F.lit(1)).over(w3), 4
        ).alias("slide_avg"),
    )


# ---------------------------------------------------------------------------
# Q23 — set operations
# ---------------------------------------------------------------------------
@query(
    "q23_set_ops",
    oracle="""
    WITH with_orders AS (SELECT DISTINCT o_custkey AS k FROM orders),
         rich        AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 1000)
    SELECT 'union' AS tag, k FROM (SELECT k FROM with_orders UNION SELECT k FROM rich)
    UNION ALL
    SELECT 'intersect' AS tag, k
      FROM (SELECT k FROM with_orders INTERSECT SELECT k FROM rich)
    UNION ALL
    SELECT 'except' AS tag, k
      FROM (SELECT k FROM rich EXCEPT SELECT k FROM with_orders)
    """,
    tags=("relational", "setop"),
)
def q23(spark, sf_dir):
    """union / intersect / except over customer key sets."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    with_orders = o.select(F.col("o_custkey").alias("k")).distinct()
    rich = c.filter(F.col("c_acctbal") > 1000).select(F.col("c_custkey").alias("k"))
    tag = lambda df, t: df.select(F.lit(t).alias("tag"), "k")  # noqa: E731
    return (
        tag(with_orders.union(rich).distinct(), "union")
        .unionAll(tag(with_orders.intersect(rich), "intersect"))
        .unionAll(tag(rich.exceptAll(with_orders).distinct(), "except"))
    )


# ---------------------------------------------------------------------------
# Q24 — correlated scalar subquery (orders above the customer's average)
# decimal×count trick: `price*n > sum` avoids cross-engine AVG precision drift
# ---------------------------------------------------------------------------
_Q24_SQL = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
          (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        > (SELECT SUM(CAST(o2.o_totalprice AS DECIMAL(18,2)))
           FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
"""


@query("q24_correlated_subquery", oracle=_Q24_SQL, tags=("relational", "subquery"))
def q24(spark, sf_dir):
    """correlated scalar subquery, hand-decorrelated as the join-rewrite
    Catalyst itself performs: per-customer (count, decimal sum) aggregate,
    equi-joined back on o_custkey, then `price·n > sum` — an independent
    DataFrame formulation of the oracle's correlated-subquery SQL, so the
    gate compares two genuinely different plans. Decimal×count keeps the
    comparison exact (no AVG precision drift across engines)."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count("*").alias("_n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_sum"),
    )
    return (
        o.join(per_cust, "o_custkey")
        .filter(
            F.col("o_totalprice").cast("decimal(18,2)") * F.col("_n")
            > F.col("_sum")
        )
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Q25 — anti-join / NOT EXISTS (the reference's incremental-resume pattern,
#       `main.py:138-151`: planned shards minus done shards)
# ---------------------------------------------------------------------------
@query(
    "q25_not_exists",
    oracle="""
    SELECT n_nationkey, n_name FROM nation
    WHERE NOT EXISTS (SELECT 1 FROM supplier
                      WHERE s_nationkey = n_nationkey AND s_acctbal > 8000)
    """,
    tags=("relational", "subquery"),
)
def q25(spark, sf_dir):
    """nations with no high-balance supplier (= resume anti-join shape;
    the acctbal filter keeps the result non-empty at every SF)."""
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 8000)
    return n.join(s, n.n_nationkey == s.s_nationkey, "left_anti").select(
        "n_nationkey", "n_name"
    )


# ---------------------------------------------------------------------------
# Q26 — explode / lateral (the pipeline's page-explode T2 relocated)
# ---------------------------------------------------------------------------
@query(
    "q26_explode",
    oracle="""
    SELECT vec_id,
           unnest(range(len(embedding))) AS pos,
           unnest(embedding) AS val
    FROM embeddings WHERE vec_id < 20
    """,
    tags=("relational", "nested"),
)
def q26(spark, sf_dir):
    """posexplode of embedding arrays (flatMap/UDTF shape)."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.filter(F.col("vec_id") < 20).select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    )


# ---------------------------------------------------------------------------
# Q27 — array functions
# ---------------------------------------------------------------------------
@query(
    "q27_array_fns",
    oracle="""
    SELECT vec_id,
           len(embedding)                    AS dim,
           embedding[1]                      AS first_val,
           list_max(embedding)               AS mx,
           list_min(embedding)               AS mn,
           len(embedding[1:4])               AS len4
    FROM embeddings
    """,
    tags=("relational", "nested"),
)
def q27(spark, sf_dir):
    """size/element_at/array_max/array_min/slice on embeddings."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_val"),
        F.array_max("embedding").alias("mx"),
        F.array_min("embedding").alias("mn"),
        F.size(F.slice("embedding", 1, 4)).alias("len4"),
    )


# ---------------------------------------------------------------------------
# Q28 — JSON functions on events.props
# ---------------------------------------------------------------------------
@query(
    "q28_json_fns",
    oracle="""
    SELECT event_id, user_id,
           json_extract_string(props, '$.k') AS k_str,
           json_extract_string(props, '$.k')::INT AS k
    FROM events
    """,
    tags=("relational", "nested"),
)
def q28(spark, sf_dir):
    """get_json_object extraction from the props JSON column."""
    ev = load_table(spark, sf_dir, "events")
    k_str = F.get_json_object(F.col("props"), "$.k")
    return ev.select(
        "event_id", "user_id", k_str.alias("k_str"), k_str.cast("int").alias("k")
    )


# ---------------------------------------------------------------------------
# Q29 — pivot
# ---------------------------------------------------------------------------
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "q29_pivot",
    oracle="""
    SELECT user_id,
           count(*) FILTER (event_type = 'click')    AS click,
           count(*) FILTER (event_type = 'error')    AS error,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup')   AS signup,
           count(*) FILTER (event_type = 'view')     AS view
    FROM events GROUP BY user_id
    """,
    tags=("relational", "pivot"),
)
def q29(spark, sf_dir):
    """event_type counts per user, pivoted to columns."""
    ev = load_table(spark, sf_dir, "events")
    piv = ev.groupBy("user_id").pivot("event_type", EVENT_TYPES).count()
    return piv.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES]
    )


# ---------------------------------------------------------------------------
# Q30 — time bucketing (batch analog of a tumbling window)
# ---------------------------------------------------------------------------
@query(
    "q30_time_bucket",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           event_type,
           count(*) AS n,
           {sql_dsum('value', 'total_value')}
    FROM events GROUP BY 1, 2
    """,
    tags=("relational", "time"),
)
def q30(spark, sf_dir):
    """1-hour tumbling window counts (F.window == date_trunc for 1h)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value", "total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "event_type",
            "n",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Q31 — sessionization (gap > 30 min starts a new session)
# ---------------------------------------------------------------------------
@query(
    "q31_sessionize",
    oracle="""
    SELECT event_id, user_id,
           SUM(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
                    THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts_us, event_id)::BIGINT
             AS session_id
    FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                 lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                         ORDER BY epoch_us(ts), event_id) AS prev_us
          FROM events)
    """,
    tags=("relational", "time"),
)
def q31(spark, sf_dir):
    """lag + cumulative sum sessionization (stateful-streaming batch analog)."""
    ev = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros("ts")
    w = W.partitionBy("user_id").orderBy(ts_us, "event_id")
    gapped = ev.select(
        "event_id",
        "user_id",
        ts_us.alias("ts_us"),
        F.lag(ts_us).over(w).alias("prev_us"),
    )
    is_new = F.when(
        F.col("prev_us").isNull()
        | ((F.col("ts_us") - F.col("prev_us")) > 1_800_000_000),
        1,
    ).otherwise(0)
    w2 = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    return gapped.select(
        "event_id", "user_id", F.sum(is_new).over(w2).alias("session_id")
    )


# ---------------------------------------------------------------------------
# Q32 — as-of join: latest preceding click for each purchase, per user
# ---------------------------------------------------------------------------
@query(
    "q32_asof_join",
    oracle="""
    SELECT p_event_id, c_event_id, c_ts FROM (
      SELECT p.event_id AS p_event_id, c.event_id AS c_event_id,
             strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS c_ts,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts DESC, c.event_id DESC) AS rn
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON c.user_id = p.user_id AND c.ts <= p.ts
    ) WHERE rn = 1
    """,
    tags=("relational", "join", "time"),
)
def q32(spark, sf_dir):
    """as-of (latest-event-≤-t) join via range join + row_number=1."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").alias("p")
    c = ev.filter(F.col("event_type") == "click").alias("c")
    joined = p.join(
        c,
        (F.col("c.user_id") == F.col("p.user_id")) & (F.col("c.ts") <= F.col("p.ts")),
    )
    w = W.partitionBy("p.event_id").orderBy(
        F.col("c.ts").desc(), F.col("c.event_id").desc()
    )
    return (
        joined.select(
            F.col("p.event_id").alias("p_event_id"),
            F.col("c.event_id").alias("c_event_id"),
            F.date_format("c.ts", "yyyy-MM-dd HH:mm:ss").alias("c_ts"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
