"""Oracle parity for every registered query (mirrors the driver's t2 gate).

Runs at sf0.001 for speed; ``scripts/check_parity.py`` runs the same
comparison at sf0.01 (the driver's scale).
"""

from __future__ import annotations

import pytest

from bigdatacw1_spark.queries import REGISTRY
from tests.conftest import SF_SMALL
from tests.oracle import compare

ORACLE_CASES = sorted(name for name, spec in REGISTRY.items() if spec.oracle)
ROWS_ONLY_CASES = sorted(name for name, spec in REGISTRY.items() if not spec.oracle)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_parity(spark, name):
    spec = REGISTRY[name]
    compare(spec.fn(spark, SF_SMALL), spec.oracle, SF_SMALL)


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_SMALL)
    assert df.count() >= 0
    assert df.schema is not None


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_driver_window_and_staged_rotations():
    """The live driver window (first 50 registry entries) must be exactly
    the 5 ref_* anchors + 45 oracle-bearing first-time entries, and the
    staged ROUND13 window plus everything already driver-checked in
    rounds 1-11 (CORRECTNESS_r*.json) plus the live ROUND12 window must
    cover the ENTIRE registry with no duplicates — so future rotations
    are one-line swaps and a rename here fails CI, not the driver."""
    import json
    import pathlib

    from bigdatacw1_spark.queries import (
        REGISTRY,
        ROUND7_WINDOW,
        ROUND8_WINDOW,
        ROUND9_WINDOW,
        ROUND10_WINDOW,
        ROUND11_WINDOW,
        ROUND12_WINDOW,
        ROUND13_WINDOW,
        _ANCHORS,
        _DRIVER_WINDOW,
    )

    assert len(_DRIVER_WINDOW) == 50
    assert len(set(_DRIVER_WINDOW)) == 50
    assert _DRIVER_WINDOW[:5] == _ANCHORS
    assert list(REGISTRY)[:50] == _DRIVER_WINDOW
    for name in _DRIVER_WINDOW:
        assert REGISTRY[name].oracle is not None, name

    # ROUND13 is the LIVE window this round (optimization round 2): the
    # 10 staged round-11/12 additions drain here, the four round-12
    # plan-changed queries get their driver verdict (r12 verdict item 1),
    # and the rest re-verifies consumers of the operator paths round 13
    # touched. The staged backlog is now EMPTY — ROUND7-12 were
    # driver-checked → covered via CORRECTNESS_r07-r12.
    assert _DRIVER_WINDOW == _ANCHORS + ROUND13_WINDOW
    assert "ext_kmv_ndv" in ROUND13_WINDOW, "staged backlog must drain this round"
    assert "tpch_q18_large_orders" in ROUND13_WINDOW, (
        "r12 plan-changed queries must carry a driver verdict (verdict item 1)"
    )
    staged: list[str] = []  # backlog drained; additions stopped at round 12
    for w in (ROUND7_WINDOW, ROUND8_WINDOW, ROUND9_WINDOW, ROUND10_WINDOW, ROUND11_WINDOW, ROUND12_WINDOW, ROUND13_WINDOW):
        assert len(w) <= 45, "staged window exceeds the driver's 45-entry cap"
    for name in staged:
        assert name in REGISTRY, name
        assert name not in _DRIVER_WINDOW, f"{name} staged but already live"

    # Past driver verdicts + the live window + staged windows must cover
    # every registry entry — no silent coverage gap.
    checked: set[str] = set()
    repo = pathlib.Path(__file__).resolve().parents[1]
    for f in sorted(repo.glob("CORRECTNESS_r*.json")):
        checked |= set(json.loads(f.read_text()).keys())
    covered = checked | set(_DRIVER_WINDOW) | set(staged)
    missing = [n for n in REGISTRY if n not in covered]
    assert not missing, f"registry entries in no window: {missing}"


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_no_hugeint(name):
    """Registry-wide oracle-type lint (r8 verdict ask #2): binding every
    oracle in DuckDB must yield no HUGEINT/UHUGEINT output column — those
    materialize via .df() as float64 while the Spark side stays int64, so
    the driver's value hash fails even when every value is numerically
    equal (the wh_rfm_segments r8 red). Lazy binding only — runs in
    milliseconds per oracle."""
    from tests.oracle import assert_oracle_types_hashable

    bad = assert_oracle_types_hashable(REGISTRY[name].oracle, SF_SMALL)
    assert not bad, f"oracle output column(s) bind to HUGEINT: {bad} — add CAST(... AS BIGINT)"
