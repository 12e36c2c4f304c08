"""Freeze the driver-gate query set.

The round driver snapshots only the FIRST 50 registered queries into
CORRECTNESS_r{N}.json. Round 2 learned the hard way that an innocent
mid-module addition silently displaces a scale-critical query from that
gate (dedup_embedding_cell pushed sim_ann_hyperplane out). This test
makes the gate set an explicit contract: changing it requires editing
the frozen list here, in the same diff, on purpose.

New queries belong AFTER the gate (late module in queries/__init__.py or
late registration within a module); promoting one into the gate means
choosing which current member it evicts.
"""

import pytest

from doc2dataset_spark.oracle import run_compare
from doc2dataset_spark.queries import REGISTRY
from doc2dataset_spark.queries.gate import DRIVER_GATE_SIZE, FROZEN_GATE


def test_driver_gate_set_is_frozen():
    got = list(REGISTRY)[:DRIVER_GATE_SIZE]
    assert got == FROZEN_GATE, (
        "the first 50 registered queries changed — a new registration "
        "displaced a gate member. Register new queries after the gate, "
        "or update FROZEN_GATE deliberately in the same commit.\n"
        f"evicted: {sorted(set(FROZEN_GATE) - set(got))}\n"
        f"intruded: {sorted(set(got) - set(FROZEN_GATE))}"
    )


def test_gate_members_are_oracle_backed():
    """Every gated query must carry a DuckDB oracle (hash-compared by the
    driver). Round 6 swapped the two rows-only sketches out of the gate
    (queries/__init__.py gate_swap), so no exemptions remain: a clean
    50/50 CORRECTNESS file is the contract."""
    for name in list(REGISTRY)[:DRIVER_GATE_SIZE]:
        spec = REGISTRY[name]
        assert spec.oracle, f"gated query {name} has no oracle SQL"


def _degated_oracle_names() -> list[str]:
    return [
        name
        for name in list(REGISTRY)[DRIVER_GATE_SIZE:]
        if REGISTRY[name].oracle
    ]


@pytest.mark.parametrize("name", _degated_oracle_names())
def test_degated_queries_keep_oracle_parity(spark, sf_dir, name):
    """Queries registered PAST the 50-row driver snapshot (the q01-q19
    relational surface and late additions) lose external verification —
    the driver's CORRECTNESS file never sees them again. This keeps them
    under an automated oracle gate: every de-gated oracle-backed query is
    hash-compared against DuckDB at smoke scale on each test run."""
    res = run_compare(spark, sf_dir, name)
    assert res.ok, f"{name}: {res}"
