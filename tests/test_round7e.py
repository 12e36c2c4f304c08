"""Temperature-mix sampler invariants (the oracle hash pins the values;
these pin the math that must hold for ANY corpus)."""

from __future__ import annotations

from pyspark.sql import functions as F

from doc2dataset_spark.queries import REGISTRY
from doc2dataset_spark.session import load_table


def _rates(spark, sf_dir, name):
    rows = REGISTRY[name].builder(spark, sf_dir).select("source", "rate_ppm").distinct().collect()
    return {r.source: r.rate_ppm for r in rows}


def test_temperature_rates_monotone_and_bounded(spark, sf_dir):
    tm = _rates(spark, sf_dir, "sample_temperature_mix")
    d = load_table(spark, sf_dir, "documents").select(
        "source", F.size(F.expr("filter(split(lower(text), '\\\\s+'), t -> t <> '')")).alias("n")
    )
    tokens = {
        r.source: r.t
        for r in d.groupBy("source").agg(F.sum("n").alias("t")).collect()
    }
    assert tm and set(tm) <= set(tokens)
    for s, r in tm.items():
        assert 0 < r <= 1_000_000, (s, r)
    # rate is monotone non-increasing in source token mass (sqrt-flattened
    # budget: bigger sources are thinned harder, never the reverse)
    by_size = sorted(tm, key=lambda s: tokens[s])
    for small, big in zip(by_size, by_size[1:]):
        assert tm[small] >= tm[big], (small, big)


def test_temperature_gentler_than_uniform_on_largest_source(spark, sf_dir):
    """α=1/2 flattening keeps strictly more of an over-represented
    source than the uniform-target rebalance (its sqrt-share budget
    exceeds its uniform-share budget)."""
    tm = _rates(spark, sf_dir, "sample_temperature_mix")
    un = _rates(spark, sf_dir, "sample_mixture_rebalance")
    d = load_table(spark, sf_dir, "documents").select(
        "source", F.size(F.expr("filter(split(lower(text), '\\\\s+'), t -> t <> '')")).alias("n")
    )
    tokens = {
        r.source: r.t
        for r in d.groupBy("source").agg(F.sum("n").alias("t")).collect()
    }
    largest = max(tokens, key=tokens.get)
    assert tm[largest] >= un[largest]
