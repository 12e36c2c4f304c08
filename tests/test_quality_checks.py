"""Single-pass data-quality checker: all rules in one aggregate job,
violation counts exact, plan shape pinned (one scan, no joins)."""

from __future__ import annotations

from pyspark.sql import functions as F

from doc2dataset_spark.operators.quality_checks import (
    in_range,
    matches,
    min_rows,
    not_null,
    one_of,
    run_checks,
    satisfies,
    unique,
)
from doc2dataset_spark.session import load_table


def test_clean_table_passes(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    report = run_checks(
        docs,
        [
            not_null("doc_id"),
            unique("doc_id"),
            in_range("n_chars", 0, 10_000_000),
            one_of("lang", langs),
            matches("source", r"^src\d+$"),
            min_rows(10),
            satisfies("chars_match_text", F.length("text") == F.col("n_chars")),
        ],
    )
    assert report.ok, report.failures
    assert report.total_rows == docs.count()


def test_violations_are_counted_exactly(spark):
    df = spark.createDataFrame(
        [
            (1, "en", 5),
            (1, "en", -2),      # dup id, out-of-range
            (2, None, 7),       # null lang
            (3, "xx", 1_000_001),  # bad lang, out-of-range
        ],
        "id long, lang string, n long",
    )
    report = run_checks(
        df,
        [
            not_null("lang"),
            unique("id"),
            in_range("n", 0, 1_000_000),
            one_of("lang", ["en", "de"]),
            min_rows(10),
        ],
    )
    got = {r.name: r.violations for r in report.results}
    assert got["not_null(lang)"] == 1
    assert got["unique(id)"] == 1
    assert got["in_range(n,0,1000000)"] == 2
    assert got["one_of(lang)"] == 1
    assert got["min_rows(10)"] == 6  # shortfall 10-4
    assert not report.ok and len(report.failures) == 5


def test_all_rules_compile_to_one_job(spark, sf_dir):
    """The point of the design: N rules != N scans. The compiled plan is
    a single aggregate over one relation — no joins, one scan node."""
    docs = load_table(spark, sf_dir, "documents")
    checks = [
        not_null("doc_id"),
        unique("doc_id"),
        in_range("n_chars", 0, 10_000_000),
        min_rows(1),
    ]
    from doc2dataset_spark.operators.quality_checks import Check  # noqa: F401

    aggs = [F.count(F.lit(1)).alias("_total")] + [
        c.violations().cast("bigint").alias(f"_c{i}")
        for i, c in enumerate(checks)
    ]
    plan = (
        docs.agg(*aggs)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("Relation") == 1
