"""TPC-H completion to 22/22: the four queries that need the unshipped
``partsupp`` table (Q2, Q11, Q16, Q20), run over a DERIVED partsupp —
a deterministic pure-function of the shipped tables, built by the same
expressions in Spark and in the DuckDB oracle (the synthetic-changelog
precedent of queries/maintenance_ops.py), so the driver's hash gate
verifies the plan shapes end-to-end.

The derivation (``derived_partsupp`` / ``PS_SQL``): every part gets 4
suppliers ``(p_partkey*4 + j) % |supplier|`` for j in 0..3 (keys are
dense 0..N-1 at every shipped SF, so modulo lands on real suppliers),
with availqty/supplycost as integer-arithmetic functions of
(partkey, j). The supplier count enters as a scalar subquery / 1-row
broadcast — no driver-side collect, SF-independent.

The four plan shapes gained:

- ``q64_tpch_q2``   min-cost supplier: correlated MIN decorrelated into
                    a per-part aggregate joined back on (part, cost).
- ``q65_tpch_q11``  important stock: grouped sum filtered against a
                    scalar fraction-of-global-sum subquery.
- ``q66_tpch_q16``  supplier relationship: COUNT(DISTINCT) per attrs
                    with a NOT-IN (anti-join) supplier exclusion.
- ``q67_tpch_q20``  excess stock: nested semi-join chain — suppliers
                    whose availqty beats half their own shipped volume
                    for the target part class.

Determinism: supplycost is ``(int arithmetic)/100.0 + 1.0`` rounded to
2dp — identical IEEE doubles on both engines; every aggregate follows
the registry decimal rules (queries/core.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from doc2dataset_spark.queries.core import dsum, query, sql_dsum
from doc2dataset_spark.session import load_table

PS_SQL = """ps AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey * 4 + j) % (SELECT count(*) FROM supplier)
           AS ps_suppkey,
         ((p_partkey * 7 + j * 3) % 1000 + 1)::INT AS ps_availqty,
         round(((p_partkey * 31 + j * 17) % 10000) / 100.0 + 1.0, 2)
           AS ps_supplycost
  FROM part CROSS JOIN (VALUES (0),(1),(2),(3)) AS t(j))"""

Q2_REGION, Q2_TYPE = "EUROPE", "PROMO"
Q11_NATION, Q11_FRACTION = "NATION_5", 0.002
Q16_EXCL_BRAND, Q16_SIZES = "Brand#1", (1, 5, 9, 13)
Q20_NATION, Q20_TYPE = "NATION_7", "SMALL"
Q20_START, Q20_END = "1996-01-01", "1997-01-01"


def derived_partsupp(spark, sf_dir: str):
    """The derived partsupp as a DataFrame — the exact Spark twin of
    PS_SQL (4 rows per part, supplier-count modulo via 1-row
    broadcast)."""
    part = load_table(spark, sf_dir, "part")
    n_supp = load_table(spark, sf_dir, "supplier").agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    return (
        part.select(
            "p_partkey",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("j"),
        )
        .crossJoin(F.broadcast(n_supp))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") * 4 + F.col("j")) % F.col("n_supp")).alias(
                "ps_suppkey"
            ),
            ((F.col("p_partkey") * 7 + F.col("j") * 3) % 1000 + 1)
            .cast("int")
            .alias("ps_availqty"),
            F.round(
                ((F.col("p_partkey") * 31 + F.col("j") * 17) % 10000)
                / 100.0
                + 1.0,
                2,
            ).alias("ps_supplycost"),
        )
    )


@query(
    "q64_tpch_q2",
    oracle=f"""
    WITH {PS_SQL},
    eu AS (
      SELECT ps_partkey, ps_suppkey, ps_supplycost, s.s_name, n.n_name
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = '{Q2_REGION}'
    ),
    mn AS (
      SELECT ps_partkey, min(ps_supplycost) AS min_cost
      FROM eu GROUP BY ps_partkey
    )
    SELECT p.p_partkey, p.p_type, p.p_size, eu.ps_suppkey,
           eu.s_name, eu.n_name, eu.ps_supplycost
    FROM part p
    JOIN eu ON eu.ps_partkey = p.p_partkey
    JOIN mn ON mn.ps_partkey = p.p_partkey
    WHERE p.p_size % 10 = 5 AND p.p_type = '{Q2_TYPE}'
      AND eu.ps_supplycost = mn.min_cost
    """,
    tags=("sql", "tpch", "partsupp"),
)
def q64_tpch_q2(spark, sf_dir):
    """TPC-H Q2 (minimum-cost supplier): for each in-class part, the
    region's supplier(s) offering the MINIMUM supplycost — the correlated
    MIN subquery decorrelated into a per-part aggregate joined back on
    (partkey, cost). Ties surface every min-cost supplier on both
    engines (cost equality is exact: both compute the same double).

    Scale shape: region/nation/supplier prune then broadcast; the
    per-part MIN is map-side combinable on ps_partkey; the join back is
    key-equi. No windows, no correlated re-execution."""
    ps = derived_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == Q2_REGION
    )
    eu = (
        ps.join(s, F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("ps_partkey", "ps_suppkey", "ps_supplycost", "s_name", "n_name")
    )
    mn = eu.groupBy(F.col("ps_partkey").alias("mn_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") % 10 == 5) & (F.col("p_type") == Q2_TYPE)
    )
    return (
        p.join(eu, F.col("ps_partkey") == F.col("p_partkey"))
        .join(mn, F.col("mn_partkey") == F.col("p_partkey"))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            "p_partkey",
            "p_type",
            "p_size",
            "ps_suppkey",
            "s_name",
            "n_name",
            "ps_supplycost",
        )
    )


@query(
    "q65_tpch_q11",
    oracle=f"""
    WITH {PS_SQL},
    nps AS (
      SELECT ps_partkey,
             CAST(ps_supplycost * ps_availqty AS DECIMAL(38,6)) AS val
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = '{Q11_NATION}'
    )
    SELECT ps_partkey,
           round(SUM(val), 4)::DOUBLE AS stock_value
    FROM nps
    GROUP BY ps_partkey
    HAVING SUM(val)::DOUBLE >
           (SELECT SUM(val)::DOUBLE * {Q11_FRACTION} FROM nps)
    """,
    tags=("sql", "tpch", "partsupp"),
)
def q65_tpch_q11(spark, sf_dir):
    """TPC-H Q11 (important stock identification): parts whose stock
    value inside one nation exceeds a FRACTION OF THE GLOBAL stock value
    — a grouped sum filtered against a scalar aggregate over the same
    derived input (computed once, broadcast; Spark materializes the CTE
    twice in the static plan, which AQE dedups via exchange reuse).

    Scale shape: the nation filter prunes suppliers to a broadcast; the
    per-part sum map-side combines; the global threshold is one scalar
    row cross-joined in. Exact decimal sums on both sides of the
    comparison."""
    ps = derived_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == Q11_NATION
    )
    nps = (
        ps.join(s, F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.col("ps_availqty"))
            .cast("decimal(38,6)")
            .alias("val"),
        )
    )
    per_part = nps.groupBy("ps_partkey").agg(F.sum("val").alias("val_sum"))
    total = nps.agg(
        (F.sum("val").cast("double") * Q11_FRACTION).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("val_sum").cast("double") > F.col("threshold"))
        .select(
            "ps_partkey",
            F.round("val_sum", 4).cast("double").alias("stock_value"),
        )
    )


@query(
    "q66_tpch_q16",
    oracle=f"""
    WITH {PS_SQL}
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT ps.ps_suppkey)::BIGINT AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> '{Q16_EXCL_BRAND}'
      AND p.p_size IN ({", ".join(str(x) for x in Q16_SIZES)})
      AND ps.ps_suppkey NOT IN
            (SELECT s_suppkey FROM supplier WHERE s_suppkey % 10 = 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    tags=("sql", "tpch", "partsupp"),
)
def q66_tpch_q16(spark, sf_dir):
    """TPC-H Q16 (parts/supplier relationship), adapted: distinct
    supplier count per (brand, type, size) class, excluding a supplier
    blocklist (the reference's complaints-comment LIKE isn't shipped —
    a deterministic ``s_suppkey % 10 = 0`` set plays the role). The
    NOT-IN becomes a LEFT ANTI join; the exact COUNT(DISTINCT) expands
    per class.

    Scale shape: part filter prunes to a broadcast; the anti-join's
    build side is |supplier|/10 keys (broadcast); distinct-count
    shuffles once on the class key with partial distinct upstream."""
    ps = derived_partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != Q16_EXCL_BRAND)
        & F.col("p_size").isin(*Q16_SIZES)
    )
    excl = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 10 == 0)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(p), F.col("p_partkey") == F.col("ps_partkey"))
        .join(excl, F.col("s_suppkey") == F.col("ps_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.countDistinct("ps_suppkey").cast("bigint").alias(
                "supplier_cnt"
            )
        )
    )


@query(
    "q67_tpch_q20",
    oracle=f"""
    WITH {PS_SQL},
    agg AS (
      SELECT l_partkey, l_suppkey,
             0.5 * SUM(CAST(l_quantity AS DECIMAL(38,6)))::DOUBLE
               AS half_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{Q20_START}'
        AND l_shipdate < TIMESTAMP '{Q20_END}'
      GROUP BY l_partkey, l_suppkey
    ),
    cand AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM ps
      JOIN agg ON agg.l_partkey = ps.ps_partkey
              AND agg.l_suppkey = ps.ps_suppkey
      WHERE ps.ps_partkey IN
              (SELECT p_partkey FROM part WHERE p_type = '{Q20_TYPE}')
        AND ps.ps_availqty > agg.half_qty
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = '{Q20_NATION}'
      AND s.s_suppkey IN (SELECT ps_suppkey FROM cand)
    """,
    tags=("sql", "tpch", "partsupp"),
)
def q67_tpch_q20(spark, sf_dir):
    """TPC-H Q20 (potential part promotion): suppliers in one nation
    whose available quantity of the target part class exceeds HALF of
    what they themselves shipped in a year — the nested semi-join chain
    (IN of IN with a correlated aggregate), fully decorrelated: the
    year's shipped volume aggregates once per (part, supplier), the
    availqty comparison is a join residual, and both IN's become
    semi-joins.

    Scale shape: the year prunes lineitem at the scan; the (part,
    supplier) aggregate map-side combines on a bounded-fan-in key; the
    part-class IN is a broadcast semi-join; the final supplier pick is
    a semi-join against the distinct candidate suppliers."""
    ps = derived_partsupp(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q20_START) & (F.col("l_shipdate") < Q20_END)
    )
    agg = li.groupBy("l_partkey", "l_suppkey").agg(
        (
            F.lit(0.5)
            * F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double")
        ).alias("half_qty")
    )
    small = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == Q20_TYPE)
        .select("p_partkey")
    )
    cand = (
        ps.join(
            F.broadcast(small), F.col("p_partkey") == F.col("ps_partkey"), "left_semi"
        )
        .join(
            agg,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .filter(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == Q20_NATION
    )
    return (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(cand, F.col("ps_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )
