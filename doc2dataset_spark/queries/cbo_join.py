"""Cost-based optimization lifecycle: catalog statistics driving join
reorder — the "let Catalyst optimize" engine surface made observable.

At 100 TB the difference between joining ``(lineitem ⋈ orders) ⋈ σcustomer``
and ``(σcustomer ⋈ orders) ⋈ lineitem`` is the job: the first shuffles the
fact table into a fact⋈fact join before the selective dimension ever
prunes anything. Spark's CBO (`spark.sql.cbo.enabled` +
`spark.sql.cbo.joinReorder.enabled`, SPARK-16026) makes that choice from
ANALYZE TABLE statistics instead of syntax order — but ONLY for catalog
tables that actually carry stats, which is an operational lifecycle this
module ships:

- ``stats_table``          register a testdata table in the session
                           catalog (external, LOCATION over the shipped
                           parquet — no copy) and ``ANALYZE … COMPUTE
                           STATISTICS FOR ALL COLUMNS`` once per
                           session; names are keyed by corpus path +
                           mtime so a regenerated corpus never serves
                           stale statistics.
- ``join_cbo_reordered``   the demonstration query, WRITTEN in the
                           adversarial syntax order (lineitem first,
                           selective customer last). With stats + CBO
                           the optimizer rebuilds the join tree as
                           ``(σ(customer) ⋈ orders) ⋈ lineitem`` —
                           tests/test_cbo.py asserts the reorder
                           happens with CBO on and does NOT happen with
                           it off, and that EXPLAIN COST carries the
                           ANALYZE rowCounts that drove it.

The query leaves the two CBO confs enabled in the session afterwards —
deliberate and documented: join reorder only fires for catalog tables
with full stats, which in this engine is exactly the tables this module
registers; every other registry query reads parquet paths directly
(size-only stats) and plans identically either way.

The DuckDB oracle runs the same logical query (DuckDB always plans
cost-based); hash equality shows CBO changed the plan, not the answer.

Reference basis: the reference engine has no optimizer at all (its whole
pipeline is a fixed operator chain, reference main.py:66-104); this is
public Spark surface (ANALYZE TABLE, SPARK-16026 CBO).
"""

from __future__ import annotations

import hashlib
import os
import posixpath

from doc2dataset_spark.queries.core import query, sql_dsum
from doc2dataset_spark.session import load_table


def _stats_name(sf_dir: str, table: str) -> str:
    src = os.path.join(sf_dir, f"{table}.parquet")
    mtime = int(os.path.getmtime(src)) if os.path.exists(src) else 0
    key = hashlib.sha256(
        f"{posixpath.abspath(sf_dir)}|{table}|{mtime}|cbo-v1".encode()
    ).hexdigest()[:8]
    return f"cbo_{table}_{key}"


def stats_table(spark, sf_dir: str, table: str) -> str:
    """Catalog name for ``table`` with full column statistics, creating
    and analyzing it on first use in this session.

    External table over the shipped parquet (no data copy); ANALYZE
    scans once per session per corpus — the price of admission for
    cost-based planning, linear and embarrassingly parallel at scale."""
    tname = _stats_name(sf_dir, table)
    if not spark.catalog.tableExists(tname):
        # load_table pins session confs (timezone, nanos handling)
        load_table(spark, sf_dir, table)
        path = os.path.join(posixpath.abspath(sf_dir), f"{table}.parquet")
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {tname} USING parquet "
            f"LOCATION '{path}'"
        )
        spark.sql(
            f"ANALYZE TABLE {tname} COMPUTE STATISTICS FOR ALL COLUMNS"
        )
    return tname


CBO_SEGMENT = "BUILDING"


def _cbo_sql(li: str, o: str, c: str) -> str:
    """The demonstration join, in deliberately adversarial syntax order:
    the fact⋈fact join is written first, the selective dimension last."""
    return f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM {li} l
    JOIN {o} o ON l.l_orderkey = o.o_orderkey
    JOIN {c} c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = '{CBO_SEGMENT}'
    GROUP BY o.o_orderpriority
    """


@query(
    "join_cbo_reordered",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = '{CBO_SEGMENT}'
    GROUP BY o.o_orderpriority
    """,
    tags=("relational", "join", "cbo", "catalog"),
)
def join_cbo_reordered(spark, sf_dir):
    """Revenue and line count per order priority for one market segment,
    written fact-join-first — the plan the CBO must rescue. With ANALYZE
    stats and `spark.sql.cbo.{enabled,joinReorder.enabled}` on, Catalyst
    rebuilds the tree as (σ(customer) ⋈ orders) ⋈ lineitem, so the
    selective dimension prunes orders BEFORE the fact table is touched
    (plan-asserted in tests/test_cbo.py; this function's result is
    driver-hashed against the cost-based DuckDB oracle — same answer,
    better plan).

    Scale shape: with the reorder the big join's build side is
    |orders|/segments instead of |lineitem ⋈ orders|; both remaining
    joins are key-partitioned equi-joins. ANALYZE is a once-per-dataset
    linear scan — amortized across every query that plans against the
    stats."""
    li = stats_table(spark, sf_dir, "lineitem")
    o = stats_table(spark, sf_dir, "orders")
    c = stats_table(spark, sf_dir, "customer")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    return spark.sql(_cbo_sql(li, o, c))
