"""No-Spark unit tests for bench.py's attempt-selection policy.

The policy guards the round-over-round trend line: a clean-sentinel
attempt only wins if it is also within 15% of the global min (a clean
attempt 1.3-1.5x slower than a flagged one is the process-level slow
pathology wearing a clean sentinel), and when nothing qualifies the
caller runs a tie-breaker attempt.
"""

from __future__ import annotations

import importlib.util
import pathlib

_spec = importlib.util.spec_from_file_location(
    "bench", pathlib.Path(__file__).resolve().parents[1] / "bench.py"
)
_bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_bench)


def _r(value: float, contended: bool) -> dict:
    return {"value": value, "sentinel": {"contended": contended}}


def test_fastest_clean_near_min_wins():
    got = _bench._pick_best([_r(10.0, False), _r(9.5, True), _r(10.4, False)])
    assert got is not None and got["value"] == 10.0


def test_clean_but_pathological_attempt_does_not_win():
    # The live case that motivated the policy: clean 13.0 vs contended 10.5.
    assert _bench._pick_best([_r(13.0, False), _r(10.5, True)]) is None


def test_all_contended_yields_none():
    assert _bench._pick_best([_r(9.0, True), _r(9.1, True)]) is None


def test_single_clean_attempt_wins():
    got = _bench._pick_best([_r(9.0, False)])
    assert got is not None and got["value"] == 9.0


def test_load_threshold_scales_with_cpus():
    t = _bench._load_threshold()
    import os

    assert t == max(1.5, 0.05 * (os.cpu_count() or 8))
