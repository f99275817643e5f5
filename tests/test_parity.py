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


def test_round5_window_is_valid_and_novel():
    """The staged round-5 rotation list must (a) name only real registry
    entries, (b) be oracle-bearing (driver hash checks, not rows-only),
    (c) contain no entry already covered by the round-4 window, and
    (d) fill exactly the 45 non-anchor slots."""
    import json

    from bigdatacw1_spark.queries import REGISTRY, ROUND5_WINDOW

    assert len(ROUND5_WINDOW) == 45
    assert len(set(ROUND5_WINDOW)) == 45
    r4_window = set(list(REGISTRY)[:50])
    for name in ROUND5_WINDOW:
        assert name in REGISTRY, name
        assert REGISTRY[name].oracle is not None, name
        assert name not in r4_window, name
