"""PSI drift monitor + higher-order-function battery invariants.

Hash-level correctness is driver/mirror territory (both queries carry
exact DuckDB oracles); these tests pin the mathematical invariants that
hold for ANY corpus, so a generator change can't silently turn the
queries vacuous.
"""

from __future__ import annotations

from doc2dataset_spark.queries import REGISTRY
from doc2dataset_spark.session import load_table


def test_psi_nonnegative_and_complete(spark, sf_dir):
    rows = REGISTRY["quality_psi_drift"].builder(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    # every source appears exactly once and doc counts partition the corpus
    assert len(rows) == docs.select("source").distinct().count()
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        # each PSI term (p-q)·ln(p/q) is ≥ 0, so the sum must be too
        assert r.psi >= 0.0, r
        assert r.drifted == (r.psi > 0.2), r


def test_hof_battery_invariants(spark, sf_dir):
    rows = REGISTRY["q74_higher_order_fns"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows[:200]:
        assert 0 <= r.n_pos <= r.dim
        # HOF_BIG > 0, so any element above it is also counted in n_pos
        assert (not r.has_big) or r.n_pos > 0
        assert r.l1 >= 0.0 and r.sq_sum >= 0.0
        # (Σ|x|)² ≥ Σx² — Cauchy-Schwarz sanity between the two folds
        assert r.l1 * r.l1 >= r.sq_sum - 1e-6, r
