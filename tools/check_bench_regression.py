"""Per-query bench regression gate: compare a fresh ``bench_full.json``
against the previous round's committed artifact and fail on any entry
that got more than REGRESSION_FACTOR slower (with an absolute slack so
scheduler/GC noise can't trip the gate — the bench keeps the min of
two cold-cache passes, but single-machine runs on a 1-3s entry still
jitter by up to ~1s run-over-run, observed on identical code).

This is the runtime counterpart of tests/plan_budgets.json: the plan
budget catches a silently-added shuffle before it runs; this catches a
slowdown the plan shape can't see (a regressed UDF, a lost broadcast
that AQE used to recover, a cache that stopped helping).

Usage:
    python tools/check_bench_regression.py [new_json] [baseline_json]

Defaults: bench_full.json vs the newest committed bench_full_r*.json.
tests/test_bench_regression.py runs the same comparison on the two
COMMITTED artifacts, so a regressed bench cannot be committed green.
"""

from __future__ import annotations

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REGRESSION_FACTOR = 1.5
ABS_SLACK_SEC = 1.0


def find_regressions(
    new: dict[str, float], base: dict[str, float]
) -> list[tuple[str, float, float]]:
    """Entries slower than max(factor * base, base + slack). Entries in
    only one map are skipped (new entries have no baseline; retired
    ones no current number)."""
    out = []
    for name, t_new in sorted(new.items()):
        t_base = base.get(name)
        if t_base is None:
            continue
        cap = max(REGRESSION_FACTOR * t_base, t_base + ABS_SLACK_SEC)
        if t_new > cap:
            out.append((name, t_base, t_new))
    return out


def latest_baseline() -> str:
    cands = sorted(glob.glob(os.path.join(ROOT, "bench_full_r*.json")))
    if not cands:
        raise SystemExit("no committed bench_full_r*.json baseline found")
    return cands[-1]


def main() -> int:
    new_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "bench_full.json"
    )
    base_path = sys.argv[2] if len(sys.argv) > 2 else latest_baseline()
    new = json.load(open(new_path))["queries"]
    base = json.load(open(base_path))["queries"]
    regs = find_regressions(new, base)
    common = len(set(new) & set(base))
    for name, t_base, t_new in regs:
        print(
            f"REGRESSED  {name}: {t_base:.3f}s -> {t_new:.3f}s "
            f"({t_new / t_base:.2f}x)"
        )
    print(
        f"{len(regs)} regressions over {common} common entries "
        f"({os.path.basename(new_path)} vs {os.path.basename(base_path)}; "
        f"gate: >{REGRESSION_FACTOR}x and >+{ABS_SLACK_SEC}s)"
    )
    return 1 if regs else 0


if __name__ == "__main__":
    raise SystemExit(main())
