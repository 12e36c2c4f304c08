"""Cost-based-optimization lifecycle tests: ANALYZE statistics reach the
catalog, and with CBO on they rebuild the adversarial syntax-order join
into dimension-first — the plan claim `queries/cbo_join.py` makes.
Value equality is oracle-gated (driver mirror); these pin the PLAN."""

from __future__ import annotations

import re

import pytest

from doc2dataset_spark.queries.cbo_join import (
    _cbo_sql,
    stats_table,
)


@pytest.fixture()
def cbo_tables(spark, sf_dir):
    names = {
        t: stats_table(spark, sf_dir, t)
        for t in ("lineitem", "orders", "customer")
    }
    before = (
        spark.conf.get("spark.sql.cbo.enabled", "false"),
        spark.conf.get("spark.sql.cbo.joinReorder.enabled", "false"),
    )
    yield names
    spark.conf.set("spark.sql.cbo.enabled", before[0])
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", before[1])


def _optimized(spark, sql: str) -> str:
    return spark.sql(sql)._jdf.queryExecution().optimizedPlan().toString()


def test_analyze_stats_reach_the_planner(spark, sf_dir, cbo_tables):
    t = cbo_tables["orders"]
    n = spark.table(t).count()
    # catalog stats are held whether or not CBO is on…
    described = {
        r.col_name: r.data_type
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {t}").collect()
    }
    assert f"{n} rows" in described.get("Statistics", ""), described
    # …but the PLANNER only consumes rowCount with CBO enabled
    spark.conf.set("spark.sql.cbo.enabled", "true")
    cost = spark.sql(f"EXPLAIN COST SELECT * FROM {t}").collect()[0][0]
    m = re.search(r"rowCount=([\d.E+]+)", cost)
    assert m, cost[:500]
    assert float(m.group(1)) == float(n)


def test_cbo_reorders_adversarial_join(spark, sf_dir, cbo_tables):
    sql = _cbo_sql(
        cbo_tables["lineitem"], cbo_tables["orders"], cbo_tables["customer"]
    )
    li_name, cu_name = cbo_tables["lineitem"], cbo_tables["customer"]

    spark.conf.set("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    off = _optimized(spark, sql)
    # syntax order: the fact⋈fact join is planned first, customer last
    assert off.index(li_name) < off.index(cu_name)

    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    on = _optimized(spark, sql)
    # cost-based order: selective customer joins orders BELOW lineitem
    assert on.index(cu_name) < on.index(li_name), on[:1200]
    # the dimension filter survived into the reordered plan
    assert "c_mktsegment" in on


def test_cbo_answer_is_plan_invariant(spark, sf_dir, cbo_tables):
    from doc2dataset_spark.queries import REGISTRY
    from doc2dataset_spark.session import register_views

    got = {
        r.o_orderpriority: (r.n, r.revenue)
        for r in REGISTRY["join_cbo_reordered"].builder(spark, sf_dir).collect()
    }
    register_views(spark, sf_dir)
    plain_sql = _cbo_sql("lineitem", "orders", "customer")
    spark.conf.set("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    want = {
        r.o_orderpriority: (r.n, r.revenue)
        for r in spark.sql(plain_sql).collect()
    }
    assert got == want and len(got) >= 1
