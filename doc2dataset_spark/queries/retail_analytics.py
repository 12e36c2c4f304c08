"""Retail-analytics classics over the star schema: RFM segmentation and
market-basket association — the two standard customer/product analyses
the query surface lacked.

- ``customer_rfm_segments``  recency/frequency/monetary quartile
                             segmentation: per-customer metrics, exact
                             quartile cutoffs computed once and
                             broadcast (the curriculum-buckets pattern —
                             NO ntile window), 3-digit segment label.
- ``basket_pair_lift``       co-purchased part pairs with support and
                             lift: pairs generated per order (bounded
                             fan-out — lineitems per order is small and
                             data-independent of corpus size), never an
                             all-pairs join.

Determinism: counts are exact; ratios are double divisions of exact
integers (retention precedent); quartile cutoffs are Spark
``percentile`` == DuckDB ``quantile_cont`` (agg_percentiles precedent);
pair keys are canonically ordered (a < b) on both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from doc2dataset_spark.queries.core import dsum, query, sql_dsum
from doc2dataset_spark.session import load_table

RFM_ASOF = "2001-09-01"  # anchor for recency (max order date is 2001-08)
LIFT_MIN_PAIR = 2  # pairs must co-occur at least twice
LIFT_TOPK = 50


@query(
    "customer_rfm_segments",
    oracle=f"""
    WITH m AS (
      SELECT o_custkey AS custkey,
             date_diff('day', max(o_orderdate),
                       TIMESTAMP '{RFM_ASOF}')::BIGINT AS recency_days,
             count(*)::BIGINT AS frequency,
             {sql_dsum("o_totalprice", "monetary")}
      FROM orders GROUP BY o_custkey
    ), cuts AS (
      SELECT quantile_cont(recency_days, [0.25, 0.5, 0.75]) AS r_cuts,
             quantile_cont(frequency,    [0.25, 0.5, 0.75]) AS f_cuts,
             quantile_cont(monetary,     [0.25, 0.5, 0.75]) AS m_cuts
      FROM m
    )
    SELECT custkey, recency_days, frequency, monetary,
           (len(list_filter(r_cuts, c -> recency_days > c)) + 1)::INT
             AS r_quartile,
           (len(list_filter(f_cuts, c -> frequency > c)) + 1)::INT
             AS f_quartile,
           (len(list_filter(m_cuts, c -> monetary > c)) + 1)::INT
             AS m_quartile
    FROM m CROSS JOIN cuts
    """,
    tags=("analytics", "segmentation"),
)
def customer_rfm_segments(spark, sf_dir):
    """RFM segmentation: per-customer recency (days from last order to
    the anchor), frequency (order count), monetary (exact decimal
    spend), each quartile-labeled against EXACT interpolated cutoffs
    computed once over all customers — the classic CRM segmentation,
    spelled scale-safe: the naive ntile(4) is a global-sort window (the
    plan gate bans it); here the 9 cutoffs broadcast as one row and the
    labeling is row-local codegen.

    Scale shape: one grouped aggregate on custkey (map-side combine),
    one scalar quartile aggregate, one broadcast cross join. Note the
    quartile convention: value > cutoff moves you up, so quartile 1 is
    the LOW end of each metric (for recency, 1 = most recent buyers)."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(F.lit(RFM_ASOF).cast("date"), F.max("o_orderdate"))
        .cast("bigint")
        .alias("recency_days"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        dsum("o_totalprice", "monetary"),
    )
    cuts = m.agg(
        F.expr("percentile(recency_days, array(0.25, 0.5, 0.75))").alias(
            "r_cuts"
        ),
        F.expr("percentile(frequency, array(0.25, 0.5, 0.75))").alias(
            "f_cuts"
        ),
        F.expr("percentile(monetary, array(0.25, 0.5, 0.75))").alias(
            "m_cuts"
        ),
    )
    q = (
        lambda cs, v: (
            F.size(F.expr(f"filter({cs}, c -> {v} > c)")) + 1
        ).cast("int")
    )
    return m.crossJoin(F.broadcast(cuts)).select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        q("r_cuts", "recency_days").alias("r_quartile"),
        q("f_cuts", "frequency").alias("f_quartile"),
        q("m_cuts", "monetary").alias("m_quartile"),
    )


@query(
    "basket_pair_lift",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n AS (
      SELECT count(DISTINCT l_orderkey)::BIGINT AS n_orders FROM items
    ), pf AS (
      SELECT l_partkey, count(*)::BIGINT AS part_orders FROM items
      GROUP BY l_partkey
    ), pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*)::BIGINT AS pair_orders
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING count(*) >= {LIFT_MIN_PAIR}
    )
    SELECT part_a, part_b, pair_orders,
           round(pair_orders::DOUBLE / n.n_orders, 6) AS support,
           round(pair_orders::DOUBLE * n.n_orders
                 / (fa.part_orders * fb.part_orders), 4) AS lift
    FROM pairs
    JOIN pf fa ON fa.l_partkey = pairs.part_a
    JOIN pf fb ON fb.l_partkey = pairs.part_b
    CROSS JOIN n
    ORDER BY pair_orders DESC, part_a, part_b
    LIMIT {LIFT_TOPK}
    """,
    tags=("analytics", "association"),
)
def basket_pair_lift(spark, sf_dir):
    """Market-basket association: top co-purchased part pairs with
    support (fraction of orders containing both) and lift
    (P(a,b)/(P(a)·P(b)) — >1 means the parts co-occur more than chance).

    Scale shape: the pair generation is the ONLY self-join, and it is
    blocked on l_orderkey — fan-out per order is C(items-in-order, 2),
    bounded by basket size (data-model constant, ~7 lineitems), never
    corpus-driven; the canonical a<b ordering halves it and makes the
    pair key deterministic. Part frequencies and the order count are
    broadcast-sized aggregates; the top-k is TakeOrderedAndProject with
    a full tiebreak."""
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n = items.agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("n_orders")
    )
    pf = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("part_orders")
    )
    a = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(
            b,
            (F.col("ok") == F.col("ok2"))
            & (F.col("part_a") < F.col("part_b")),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_orders"))
        .filter(F.col("pair_orders") >= LIFT_MIN_PAIR)
    )
    fa = pf.select(
        F.col("l_partkey").alias("pa"), F.col("part_orders").alias("fa_n")
    )
    fb = pf.select(
        F.col("l_partkey").alias("pb"), F.col("part_orders").alias("fb_n")
    )
    return (
        pairs.join(fa, F.col("pa") == F.col("part_a"))
        .join(fb, F.col("pb") == F.col("part_b"))
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "pair_orders",
            F.round(
                F.col("pair_orders").cast("double") / F.col("n_orders"), 6
            ).alias("support"),
            F.round(
                F.col("pair_orders").cast("double")
                * F.col("n_orders")
                / (F.col("fa_n") * F.col("fb_n")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("pair_orders"), "part_a", "part_b")
        .limit(LIFT_TOPK)
    )
