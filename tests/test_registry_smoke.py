"""Every registered query must build and execute at the smoke SF — the
local early-warning for the driver's gate (schema drift, missing columns,
bad SQL in a builder all surface here as one parametrized failure)."""

from __future__ import annotations

import pytest

from doc2dataset_spark.queries import REGISTRY, all_oracles

# the iterative/heavy queries have their own dedicated oracle checks; keep
# the smoke loop fast by running them only via scripts/check_oracle.py
_SKIP_SLOW = {"dedup_cluster_cc", "ml_kmeans_lite"}


@pytest.mark.parametrize("name", sorted(n for n in REGISTRY if n not in _SKIP_SLOW))
def test_query_builds_and_runs(spark, sf_dir, name):
    df = REGISTRY[name].builder(spark, sf_dir)
    assert df.count() >= 0
    assert df.columns  # non-empty schema with stable names


def test_every_oracle_names_match_registry():
    oracles = all_oracles()
    assert set(oracles) <= set(REGISTRY)
    # every oracle is non-empty SQL
    assert all(isinstance(s, str) and s.strip() for s in oracles.values())


def test_docstrings_present():
    """The registry doubles as operator documentation for parity checking —
    every query carries a docstring."""
    missing = [n for n, s in REGISTRY.items() if not (s.doc or "").strip()]
    assert not missing, missing
