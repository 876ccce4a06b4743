"""Runtime-stage regression guard for iterative/checkpointed entries.

The static plan-budget test (test_plan_budgets.py) reads the FINAL
physical plan, which localCheckpoint truncates — an iterative operator
could grow a per-round shuffle and the frozen 0-exchange budget would
never notice. This guard counts what actually RAN: each entry executes
end-to-end under a dedicated job group and the status tracker reports
every job/stage the group scheduled, checkpointed rounds included.
``shuffle_stages`` (distinct stages minus jobs, i.e. executed
shuffle-map stages) is the regression metric. Regenerate the budgets
deliberately with ``python tools/gen_runtime_budgets.py`` when an
intentional change lands.
"""

import json
import os

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"
BUDGETS = json.load(
    open(os.path.join(os.path.dirname(__file__), "runtime_stage_budgets.json"))
)


def _measure(spark, name, attempt):
    sc = spark.sparkContext
    spark.catalog.clearCache()
    group = f"pytest-budget-{name}-{attempt}"
    sc.setJobGroup(group, name)
    try:
        df = entry_mod.queries()[name](spark, SF)
        df.write.format("noop").mode("overwrite").save()
    finally:
        sc.setJobGroup("pytest-budget-idle", "idle")
    st = sc.statusTracker()
    jobs = st.getJobIdsForGroup(group)
    stages = set()
    for j in jobs:
        info = st.getJobInfo(j)
        if info is not None:
            stages.update(info.stageIds)
    return max(0, len(stages) - len(jobs)), len(jobs), len(stages)


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_runtime_stages_within_budget(spark, name):
    # +4 slack, and one re-measure on failure: AQE materializes query
    # stages in a run-order-dependent way on tiny inputs (broadcast
    # decisions flip, exchanges get reused) — after hundreds of prior
    # queries in the same session a reading can sit a few stages above
    # the cold-session budget. A real per-round shuffle regression in
    # an iterative operator costs O(rounds) ~ 10+ extra stages on EVERY
    # run and still trips both measurements.
    cap = BUDGETS[name]["shuffle_stages"] + 4
    got, jobs, stages = _measure(spark, name, 1)
    if got > cap:
        got, jobs, stages = _measure(spark, name, 2)
    assert got <= cap, (
        f"{name}: executed shuffle-map stages regressed {cap} -> {got} "
        f"({jobs} jobs, {stages} stages)"
    )
