"""Bench-regression gate over the COMMITTED artifacts: the current
``bench_full.json`` must not show any per-query time >1.5x (and >+1s)
its entry in the previous round's frozen ``bench_full_r*.json``. The
same comparison ``tools/check_bench_regression.py`` runs standalone —
this test makes a regressed bench un-committable, the way
plan_budgets.json makes a regressed plan shape un-committable.

The gate logic itself is unit-tested below against synthetic maps
(red on an injected slowdown, green on noise inside the slack).
"""

import json
import os

from tools.check_bench_regression import (
    ABS_SLACK_SEC,
    REGRESSION_FACTOR,
    find_regressions,
    latest_baseline,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_committed_bench_within_budget():
    new = json.load(open(os.path.join(ROOT, "bench_full.json")))["queries"]
    base = json.load(open(latest_baseline()))["queries"]
    regs = find_regressions(new, base)
    assert not regs, "bench regressions vs committed baseline: " + ", ".join(
        f"{n} {b:.2f}s->{t:.2f}s" for n, b, t in regs
    )


def test_gate_red_on_injected_slowdown():
    base = {"q": 2.0}
    slow = {"q": 2.0 * REGRESSION_FACTOR + ABS_SLACK_SEC + 0.01}
    assert find_regressions(slow, base) == [("q", 2.0, slow["q"])]


def test_gate_green_on_noise_and_new_entries():
    base = {"fast": 0.2, "slow": 4.0}
    # +0.4s on a 0.2s entry is 3x but inside the absolute slack;
    # 1.4x on a 4s entry is inside the factor; new entries skip
    new = {"fast": 0.6, "slow": 5.6, "brand_new": 9.9}
    assert find_regressions(new, base) == []
