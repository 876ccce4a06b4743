"""Whole-inventory guard: every queries() entry must analyze cleanly at
sf0.001 and plan without a CartesianProduct (the one join shape that can
never ship at 100 TB). Streaming entries are excluded — they execute a
replay when invoked, and have their own stream==batch tests."""

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def test_all_entries_plan_without_cartesian(spark):
    failures = []
    for name, fn in entry_mod.queries().items():
        if name.startswith("streaming_"):
            continue
        try:
            df = fn(spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:120]}")
            continue
        if "CartesianProduct" in plan:
            failures.append(f"{name}: CartesianProduct in plan")
    assert not failures, "\n".join(failures)


def test_every_oracle_has_a_query():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    orphans = set(oracles) - set(qs)
    assert not orphans, f"oracles without queries: {sorted(orphans)}"


def test_all_oracles_parse_and_bind_in_duckdb():
    """EXPLAIN every oracle against the sf0.001 views: catches SQL
    typos, unknown functions, and column/type binding errors without
    paying execution — the cheap pre-flight for the driver gate."""
    import duckdb

    from avro_sql_spark.session import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    failures = []
    for name, sql in entry_mod.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {str(e)[:160]}")
    assert not failures, "\n".join(failures)
