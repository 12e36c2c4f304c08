"""curate_corpus_scored invariants: the stage-audit flags must form a
funnel (each stage's True implies every upstream stage passed), the
median gate must keep 50-100% minus exactly the sub-median half, and the
fixed-point scores must be valid probabilities. The oracle hash (gate +
degated-parity sweep) pins exact values; these pin the laws."""

from __future__ import annotations

from doc2dataset_spark.queries import REGISTRY


def test_stage_audit_funnel(spark, sf_dir):
    rows = REGISTRY["curate_corpus_scored"].builder(spark, sf_dir).collect()
    assert rows
    n = len(rows)
    kept = sum(r.kept for r in rows)
    assert 0 < kept < n
    for r in rows:
        assert 0.0 <= r.score <= 1.0
        # funnel: kept => kept_fp => (pass_model and not flag_rep)
        if r.kept:
            assert r.kept_fp
        if r.kept_fp:
            assert r.pass_model and not r.flag_rep
    # the median gate keeps at least half (>= median includes the median)
    passed = sum(r.pass_model for r in rows)
    assert passed >= n // 2
    assert passed < n  # and drops someone: scores are not all equal


def test_fixed_point_rha_division():
    """the round-half-away integer division both engines unroll: check
    the formula against Python's exact rational arithmetic, including
    the negative-numerator branch and exact .5 ties (the cases double
    round() got wrong cross-engine)."""
    from fractions import Fraction

    def rha(a: int, b: int) -> int:
        assert b > 0
        if a >= 0:
            return (2 * a + b) // (2 * b)
        return -((-2 * a + b) // (2 * b))

    import math

    for a in range(-1000, 1001):
        for b in (1, 2, 3, 7, 8, 100):
            f = Fraction(a, b)
            # round-half-away-from-zero == sign(f) * floor(|f| + 1/2),
            # computed exactly in rationals
            want = (1 if a >= 0 else -1) * math.floor(abs(f) + Fraction(1, 2))
            assert rha(a, b) == want, (a, b)
