"""Unit tests for the round-6 operators against hand-computable
fixtures (the sf-level oracle checks live in tools/check_correctness.py)."""

import math

import pytest
from pyspark.sql import functions as F

from avro_sql_spark.operators.profile import (
    bh_fdr_report,
    jackknife_ratio_ci,
    poisson_bootstrap_ci,
    psi_drift_report,
    salt_plan_report,
)
from avro_sql_spark.operators.text import chao1_richness


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id LONG, text STRING, source STRING"
    )


def test_chao1_no_singletons_is_saturated(spark):
    # every type seen twice: f1=0 -> chao1 == vocab, coverage == 1
    df = _docs(spark, [(1, "aa bb aa bb", "s")])
    row = chao1_richness(df).collect()[0]
    assert row["vocab_size"] == 2
    assert row["n_tokens"] == 4
    assert row["f1"] == 0 and row["f2"] == 2
    assert row["chao1_estimate"] == pytest.approx(2.0)
    assert row["coverage"] == pytest.approx(1.0)


def test_chao1_bias_corrected_formula(spark):
    # counts: aa x1, bb x1, cc x2 -> V=3, f1=2, f2=1
    # chao1 = 3 + 2*1/(2*(1+1)) = 3.5; coverage = 1 - 2/4 = 0.5
    df = _docs(spark, [(1, "aa bb cc cc", "s")])
    row = chao1_richness(df).collect()[0]
    assert row["chao1_estimate"] == pytest.approx(3.5)
    assert row["coverage"] == pytest.approx(0.5)


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, "
        "event_type STRING, value DOUBLE",
    )


def test_poisson_bootstrap_interval_brackets_point(spark):
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1 + i % 5), i % 7, "view", float(i % 13))
        for i in range(400)
    ]
    out = poisson_bootstrap_ci(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_events"] == 400
    # deterministic resampling: interval exists and brackets the mean
    assert r["boot_lo"] <= r["point_mean"] <= r["boot_hi"]
    assert r["boot_lo"] < r["boot_hi"]
    # rerun is bit-identical (pure function of ids)
    again = poisson_bootstrap_ci(_events(spark, rows)).collect()[0]
    assert (r["boot_lo"], r["boot_hi"]) == (again["boot_lo"], again["boot_hi"])


def test_bh_fdr_null_data_rejects_nothing(spark):
    import datetime as dt

    # identical value distribution in both arms (value depends only on
    # event_id, arms split users) -> no type should be rejected
    rows = [
        (i, dt.datetime(2024, 1, 1), i, f"t{i % 4}", float(i % 10))
        for i in range(800)
    ]
    out = bh_fdr_report(_events(spark, rows)).collect()
    assert len(out) == 4
    assert [r["p_rank"] for r in out] == [1, 2, 3, 4]
    assert not any(r["rejected"] for r in out)


def test_psi_zero_for_identical_halves(spark):
    import datetime as dt

    # same value multiset in each half -> every decile splits evenly,
    # every term 0, total 0
    rows = []
    for i in range(200):
        rows.append((i, dt.datetime(2024, 1, 1), 1, "a", float(i % 20)))
        rows.append(
            (1000 + i, dt.datetime(2024, 1, 9), 1, "a", float(i % 20))
        )
    out = psi_drift_report(_events(spark, rows)).collect()
    assert len(out) == 10
    assert all(r["n_h1"] == r["n_h2"] == 20 for r in out)
    assert all(r["psi_term"] == 0.0 for r in out)
    assert out[0]["psi_total"] == 0.0


def test_psi_detects_shift(spark):
    import datetime as dt

    # overlapping but shifted halves (h2 = h1 + 5): the shared deciles
    # carry unbalanced shares -> positive PSI. (A TOTAL separation puts
    # every decile in one half only; those terms are NULL under the
    # epsilon-free convention and are excluded — so the fixture must
    # overlap to exercise the nonzero path.)
    rows = [
        (i, dt.datetime(2024, 1, 1), 1, "a", float(i % 20))
        for i in range(200)
    ] + [
        (1000 + i, dt.datetime(2024, 1, 9), 1, "a", 5.0 + i % 20)
        for i in range(200)
    ]
    out = psi_drift_report(_events(spark, rows)).collect()
    assert out[0]["psi_total"] > 0.05


def test_salt_plan_caps_and_ceils(spark):
    import datetime as dt

    # one whale key (900 rows), many tiny; total=1000, target=ceil(1000/32)=32
    rows = [(i, dt.datetime(2024, 1, 1), 1, "a", 0.0) for i in range(900)]
    rows += [
        (1000 + i, dt.datetime(2024, 1, 1), 10 + i, "a", 0.0)
        for i in range(100)
    ]
    out = salt_plan_report(_events(spark, rows)).collect()
    whale = out[0]
    assert whale["key"] == 1 and whale["n_rows"] == 900
    assert whale["target_rows"] == 32
    # ceil(900/32)=29 > max_salt -> capped at 16; after = ceil(900/16)
    assert whale["salt_n"] == 16
    assert whale["rows_per_task_after"] == math.ceil(900 / 16)
    assert all(r["salt_n"] == 1 for r in out[1:])


def test_jackknife_zero_variance_when_days_identical(spark):
    import datetime as dt

    # identical (e, p) every day -> every leave-one-out ratio equals
    # the overall ratio -> SE exactly 0
    rows = []
    for d in range(10):
        for i in range(20):
            et = "purchase" if i < 5 else "view"
            rows.append(
                (d * 100 + i, dt.datetime(2024, 1, 1 + d), 1, et, 0.0)
            )
    r = jackknife_ratio_ci(_events(spark, rows)).collect()[0]
    assert r["n_days"] == 10
    assert r["ratio"] == pytest.approx(0.25)
    assert r["jk_se"] == 0.0
    assert r["ci_lo"] == r["ratio"] == r["ci_hi"]


def test_jackknife_se_positive_on_heterogeneous_days(spark):
    import datetime as dt

    rows = []
    for d in range(8):
        n_conv = 2 + (d % 3) * 4
        for i in range(20):
            et = "purchase" if i < n_conv else "view"
            rows.append(
                (d * 100 + i, dt.datetime(2024, 1, 1 + d), 1, et, 0.0)
            )
    r = jackknife_ratio_ci(_events(spark, rows)).collect()[0]
    assert r["jk_se"] > 0
    assert r["ci_lo"] < r["ratio"] < r["ci_hi"]
