"""Declarative data-quality checks compiled to ONE aggregate pass
(the Deequ/Great-Expectations shape, engine-native).

A 100 TB pipeline output needs machine-checkable contracts — key
uniqueness, non-null columns, value ranges, set membership, row-count
floors — and the naive implementation (one job per rule) re-scans the
corpus once per rule. Here every rule compiles to an aggregate
EXPRESSION and all of them run in a single map-side-combinable
``agg(...)``: one scan, one shuffle-less reduction, regardless of how
many rules are attached.

    report = run_checks(df, [
        not_null("doc_id"), unique("doc_id"),
        in_range("n_chars", 1, 10_000_000),
        one_of("lang", ["en", "de", "fr"]),
        min_rows(1000),
    ])
    report.ok           -> bool
    report.failures     -> [CheckResult(...), ...]

``unique`` is the one rule that cannot be a plain aggregate expression
(distinct-count needs its own shuffle); it is computed exactly via
count_distinct in the SAME agg call — Spark plans the mixed
distinct/non-distinct aggregate as the standard two-phase expand, still
one job.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    # aggregate expression producing the VIOLATION COUNT (bigint)
    violations: Callable[[], Column]


@dataclass(frozen=True)
class CheckResult:
    name: str
    violations: int
    ok: bool


@dataclass(frozen=True)
class Report:
    total_rows: int
    results: list[CheckResult]

    @property
    def ok(self) -> bool:
        return all(r.ok for r in self.results)

    @property
    def failures(self) -> list[CheckResult]:
        return [r for r in self.results if not r.ok]


def not_null(col: str) -> Check:
    return Check(
        f"not_null({col})",
        lambda: F.count_if(F.col(col).isNull()),
    )


def unique(col: str) -> Check:
    """violations = rows - distinct values (0 when the column is a key).
    NULLs are not counted by count_distinct, so a nullable key should
    also carry not_null()."""
    return Check(
        f"unique({col})",
        lambda: F.count(col) - F.count_distinct(F.col(col)),
    )


def in_range(col: str, lo, hi) -> Check:
    return Check(
        f"in_range({col},{lo},{hi})",
        lambda: F.count_if(~F.col(col).between(lo, hi)),
    )


def one_of(col: str, allowed: list) -> Check:
    return Check(
        f"one_of({col})",
        lambda: F.count_if(
            F.col(col).isNotNull() & ~F.col(col).isin(allowed)
        ),
    )


def matches(col: str, regex: str) -> Check:
    return Check(
        f"matches({col},{regex})",
        lambda: F.count_if(
            F.col(col).isNotNull() & ~F.col(col).rlike(regex)
        ),
    )


def satisfies(name: str, predicate: Column) -> Check:
    """Escape hatch: violation = rows where the predicate is NOT true."""
    return Check(
        f"satisfies({name})",
        lambda: F.count_if(~F.coalesce(predicate, F.lit(False))),
    )


def min_rows(n: int) -> Check:
    """Row-count floor: violations = shortfall below n."""
    return Check(
        f"min_rows({n})",
        lambda: F.greatest(F.lit(0).cast("bigint"), n - F.count(F.lit(1))),
    )


def run_checks(df: DataFrame, checks: list[Check]) -> Report:
    """Evaluate every rule in ONE aggregate pass over ``df``."""
    aggs = [F.count(F.lit(1)).alias("_total")] + [
        c.violations().cast("bigint").alias(f"_c{i}")
        for i, c in enumerate(checks)
    ]
    row = df.agg(*aggs).collect()[0]
    results = [
        CheckResult(c.name, int(row[f"_c{i}"]), int(row[f"_c{i}"]) == 0)
        for i, c in enumerate(checks)
    ]
    return Report(int(row["_total"]), results)
