"""Declared relational queries Q1-Q19 (SURVEY §2.3): scans, scalar functions,
joins, aggregations — each a Spark DataFrame builder + a DuckDB oracle.

These are the query-engine surface the north-star adds on top of the
reference's fixed ETL dataflow; the scalar-function rows (Q2-Q7) relocate the
reference's per-row transforms (hashing `downloader.py:423-425`, regex word
count `extractor.py:28-31`) onto the relational surface as JVM-side built-ins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from doc2dataset_spark.queries.core import (
    davg,
    dsum,
    query,
    sql_davg,
    sql_dsum,
)
from doc2dataset_spark.session import load_table


# ---------------------------------------------------------------------------
# Q1 — projection + filter (pushed to the parquet scan by Catalyst)
# ---------------------------------------------------------------------------
@query(
    "q01_project_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_date
    FROM lineitem
    WHERE l_quantity < 24 AND l_shipdate >= TIMESTAMP '1996-01-01'
    """,
    tags=("relational", "scan"),
)
def q01(spark, sf_dir):
    """σ/π on lineitem; filter + projection reach the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_quantity") < 24) & (F.col("l_shipdate") >= "1996-01-01"))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_quantity",
            "l_extendedprice",
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        )
    )


# ---------------------------------------------------------------------------
# Q2 — scalar string functions
# ---------------------------------------------------------------------------
@query(
    "q02_string_fns",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                       AS uname,
           lower(c_mktsegment)                 AS lseg,
           substring(c_name, 1, 10)            AS name_pref,
           c_name || '#' || c_mktsegment       AS name_seg,
           length(c_name)                      AS name_len,
           trim(c_mktsegment)                  AS seg_trim,
           (c_name LIKE '%1%')                 AS has_one
    FROM customer
    """,
    tags=("relational", "scalar"),
)
def q02(spark, sf_dir):
    """upper/lower/substring/concat/trim/length/like on customer."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.substring("c_name", 1, 10).alias("name_pref"),
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_mktsegment")).alias("name_seg"),
        F.length("c_name").alias("name_len"),
        F.trim(F.col("c_mktsegment")).alias("seg_trim"),
        F.col("c_name").like("%1%").alias("has_one"),
    )


# ---------------------------------------------------------------------------
# Q3 — scalar date functions
# ---------------------------------------------------------------------------
@query(
    "q03_date_fns",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(year FROM o_orderdate)::INT    AS y,
           EXTRACT(month FROM o_orderdate)::INT   AS m,
           EXTRACT(day FROM o_orderdate)::INT     AS d,
           EXTRACT(quarter FROM o_orderdate)::INT AS q,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           datediff('day', DATE '1995-01-01', o_orderdate)::INT   AS days_since,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30
    FROM orders
    """,
    tags=("relational", "scalar"),
)
def q03(spark, sf_dir):
    """year/month/day/quarter/date_trunc/datediff/date_add on orders."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).alias("days_since"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias(
            "plus30"
        ),
    )


# ---------------------------------------------------------------------------
# Q4 — scalar math functions
# ---------------------------------------------------------------------------
@query(
    "q04_math_fns",
    oracle="""
    SELECT p_partkey,
           round(p_retailprice, 0)          AS rp,
           abs(p_size - 25)                 AS ab,
           floor(p_retailprice)::BIGINT     AS fl,
           ceil(p_retailprice)::BIGINT      AS ce,
           pow(p_size, 2)                   AS p2,
           p_size % 7                       AS md,
           sqrt(p_size)                     AS sq
    FROM part
    """,
    tags=("relational", "scalar"),
)
def q04(spark, sf_dir):
    """round/abs/floor/ceil/pow/mod/sqrt on part."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round("p_retailprice", 0).alias("rp"),
        F.abs(F.col("p_size") - 25).alias("ab"),
        F.floor("p_retailprice").alias("fl"),
        F.ceil("p_retailprice").alias("ce"),
        F.pow("p_size", F.lit(2)).alias("p2"),
        (F.col("p_size") % 7).alias("md"),
        F.sqrt("p_size").alias("sq"),
    )


# ---------------------------------------------------------------------------
# Q5 — CASE / conditional bucketing
# ---------------------------------------------------------------------------
@query(
    "q05_case_bucket",
    oracle=f"""
    SELECT CASE WHEN o_totalprice < 50000  THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS bucket,
           count(*) AS n,
           {sql_dsum('o_totalprice', 'total')}
    FROM orders
    GROUP BY 1
    """,
    tags=("relational", "scalar"),
)
def q05(spark, sf_dir):
    """when/otherwise bucketing of o_totalprice + per-bucket agg."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
        .alias("bucket")
    )
    return o.groupBy(bucket).agg(
        F.count("*").alias("n"), dsum("o_totalprice", "total")
    )


# ---------------------------------------------------------------------------
# Q6 — hash functions (reference F4/F5 `downloader.py:352-381,423-425`
#      relocated to the query surface as JVM built-ins — no UDF)
# ---------------------------------------------------------------------------
@query(
    "q06_hash_fns",
    oracle="""
    SELECT doc_id, md5(text) AS md5h, sha256(text) AS sha256h
    FROM documents
    """,
    tags=("relational", "scalar", "documents"),
)
def q06(spark, sf_dir):
    """md5 / sha2-256 of documents.text (= reference hash compute/verify)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("md5h"),
        F.sha2(F.col("text"), 256).alias("sha256h"),
    )


# ---------------------------------------------------------------------------
# Q7 — regex functions (reference T6 word count `extractor.py:28-31`
#      with the exact ALL_TAGS / ANY_WORD regexes `extractor.py:13-15`)
# ---------------------------------------------------------------------------
@query(
    "q07_regex_fns",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(
                 regexp_replace(text, '(?is)<.*?>', chr(10), 'g'),
                 '[^\]\[\s,<>]+'))                       AS total_words,
           regexp_extract(text, '([a-z]+)', 1)           AS first_word,
           substring(regexp_replace(text, '[.\d]+', '', 'g'), 1, 40) AS no_digits
    FROM documents
    """,
    tags=("relational", "scalar", "documents"),
)
def q07(spark, sf_dir):
    """regexp_extract/_replace/_extract_all word count of documents.text."""
    d = load_table(spark, sf_dir, "documents")
    stripped = F.regexp_replace(F.col("text"), r"(?is)<.*?>", "\n")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(stripped, F.lit(r"[^\]\[\s,<>]+"), 0)).alias(
            "total_words"
        ),
        F.regexp_extract(F.col("text"), r"([a-z]+)", 1).alias("first_word"),
        F.substring(F.regexp_replace(F.col("text"), r"[.\d]+", ""), 1, 40).alias(
            "no_digits"
        ),
    )


# ---------------------------------------------------------------------------
# Q8 — inner equi-join chain (shuffle join; AQE picks strategy)
# ---------------------------------------------------------------------------
@query(
    "q08_join_chain",
    oracle=f"""
    SELECT c_mktsegment,
           count(*) AS n_items,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("relational", "join"),
)
def q08(spark, sf_dir):
    """lineitem ⋈ orders ⋈ customer → revenue per market segment."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_items"), dsum(rev, "revenue"))
    )


# ---------------------------------------------------------------------------
# Q9 — broadcast join (tiny dims: plan-level assertion in tests)
# ---------------------------------------------------------------------------
@query(
    "q09_broadcast_join",
    oracle="""
    SELECT n_nationkey, n_name, r_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
    tags=("relational", "join"),
)
def q09(spark, sf_dir):
    """nation ⋈ broadcast(region) — small-dim broadcast, no shuffle."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


# ---------------------------------------------------------------------------
# Q10 — outer joins
# ---------------------------------------------------------------------------
@query(
    "q10_left_join",
    oracle="""
    SELECT o_orderkey, l_linenumber, l_quantity
    FROM orders LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity > 45) li
      ON o_orderkey = l_orderkey
    """,
    tags=("relational", "join"),
)
def q10(spark, sf_dir):
    """orders ⟕ (high-quantity lineitem) — null-extension behavior."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return o.join(li, o.o_orderkey == li.l_orderkey, "left").select(
        "o_orderkey", "l_linenumber", "l_quantity"
    )


@query(
    "q10b_full_outer",
    oracle="""
    SELECT n_key, n_cust, n_supp FROM
      (SELECT c_nationkey AS n_key, count(*) AS n_cust
       FROM customer WHERE c_acctbal < 0 GROUP BY 1) c
    FULL JOIN
      (SELECT s_nationkey AS n_key, count(*) AS n_supp
       FROM supplier WHERE s_acctbal > 5000 GROUP BY 1) s
    USING (n_key)
    """,
    tags=("relational", "join"),
)
def q10b(spark, sf_dir):
    """full outer join of two asymmetric aggregates on nationkey."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .groupBy(F.col("c_nationkey").alias("n_key"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .groupBy(F.col("s_nationkey").alias("n_key"))
        .agg(F.count("*").alias("n_supp"))
    )
    return c.join(s, ["n_key"], "full").select("n_key", "n_cust", "n_supp")


# ---------------------------------------------------------------------------
# Q11 — semi / anti joins
# ---------------------------------------------------------------------------
@query(
    "q11_semi_anti",
    oracle="""
    SELECT 'big_spender' AS tag, c_custkey FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    UNION ALL
    SELECT 'no_orders' AS tag, c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("relational", "join"),
)
def q11(spark, sf_dir):
    """left_semi (EXISTS) + left_anti (NOT EXISTS) on customer/orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 400000)
    semi = c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        F.lit("big_spender").alias("tag"), "c_custkey"
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.lit("no_orders").alias("tag"), "c_custkey"
    )
    return semi.unionAll(anti)


# ---------------------------------------------------------------------------
# Q12 — non-equi range join (clicks within 1h after a purchase)
# ---------------------------------------------------------------------------
@query(
    "q12_range_join",
    oracle="""
    SELECT p.user_id AS user_id, count(*) AS n_pairs
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 1 HOUR
    GROUP BY p.user_id
    """,
    tags=("relational", "join"),
)
def q12(spark, sf_dir):
    """theta/range join: equi on user + time-range predicate."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").alias("p")
    c = ev.filter(F.col("event_type") == "click").alias("c")
    cond = (
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("c.ts") >= F.col("p.ts"))
        & (F.col("c.ts") <= F.col("p.ts") + F.expr("INTERVAL 1 HOUR"))
    )
    return (
        p.join(c, cond)
        .groupBy(F.col("p.user_id").alias("user_id"))
        .agg(F.count("*").alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# Q13 — cross join
# ---------------------------------------------------------------------------
@query(
    "q13_cross_join",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
    tags=("relational", "join"),
)
def q13(spark, sf_dir):
    """region × nation (bounded cartesian)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


# ---------------------------------------------------------------------------
# Q14 — hash aggregate, TPC-H Q1 shape (the flagship query)
# ---------------------------------------------------------------------------
Q14_ORACLE = f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc')},
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
"""


@query("q14_tpch_q1", oracle=Q14_ORACLE, tags=("relational", "agg", "flagship"))
def q14(spark, sf_dir):
    """TPC-H Q1: pricing summary report (8 aggregates, 2 group keys)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "2000-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Q15 — distinct (the CC example's dropDuplicates,
#      `examples/get_pdf_links_from_cc.py:126`)
# ---------------------------------------------------------------------------
@query(
    "q15_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    tags=("relational", "agg"),
)
def q15(spark, sf_dir):
    """select distinct on lineitem status flags."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# Q16 — count distinct (exact) + approx (rows-only check)
# ---------------------------------------------------------------------------
@query(
    "q16_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_cust,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("relational", "agg"),
)
def q16(spark, sf_dir):
    """exact countDistinct per order priority."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust"), F.count("*").alias("n")
    )


@query("q16b_approx_count_distinct", oracle=None, tags=("relational", "agg", "approx"))
def q16b(spark, sf_dir):
    """approx_count_distinct (HLL++): rows-only check — sketches are not
    oracle-comparable across engines; tested against exact ±5% in pytest."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_cust")
    )


# ---------------------------------------------------------------------------
# Q17 — rollup / grouping sets
# ---------------------------------------------------------------------------
@query(
    "q17_rollup",
    oracle=f"""
    SELECT n_name, GROUPING(n_name)::INT AS g,
           count(*) AS n_cust,
           {sql_dsum('c_acctbal', 'acct_total')}
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP(n_name)
    """,
    tags=("relational", "agg"),
)
def q17(spark, sf_dir):
    """rollup(n_name) over customer ⋈ nation with grouping indicator."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name")
        .agg(
            F.grouping("n_name").cast("int").alias("g"),
            F.count("*").alias("n_cust"),
            dsum("c_acctbal", "acct_total"),
        )
        .select("n_name", "g", "n_cust", "acct_total")
    )


# ---------------------------------------------------------------------------
# Q18 — HAVING (post-aggregation filter)
# ---------------------------------------------------------------------------
@query(
    "q18_having",
    oracle=f"""
    SELECT o_custkey, count(*) AS n_orders,
           {sql_dsum('o_totalprice', 'spend')}
    FROM orders GROUP BY o_custkey HAVING count(*) >= 8
    """,
    tags=("relational", "agg"),
)
def q18(spark, sf_dir):
    """customers with ≥8 orders (agg + post-filter)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "spend"))
        .filter(F.col("n_orders") >= 8)
    )


# ---------------------------------------------------------------------------
# Q19 — sort + limit (top-k with deterministic tiebreak)
# ---------------------------------------------------------------------------
@query(
    "q19_topk",
    oracle=f"""
    SELECT o_custkey, {sql_dsum('o_totalprice', 'revenue')}
    FROM orders GROUP BY o_custkey
    ORDER BY revenue DESC, o_custkey LIMIT 10
    """,
    tags=("relational", "sort"),
)
def q19(spark, sf_dir):
    """top-10 customers by revenue (TakeOrderedAndProject physical op)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(dsum("o_totalprice", "revenue"))
        .orderBy(F.desc("revenue"), "o_custkey")
        .limit(10)
    )
