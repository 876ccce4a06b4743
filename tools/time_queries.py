"""Targeted per-query timing harness for optimization work: bench.py's
exact methodology (noop sink, cache clear, warmup + 2 timed passes, min)
restricted to the names given on the command line, so a single entry can
be measured in seconds instead of re-running the full 340-entry bench.

Usage:
    python tools/time_queries.py [--explain] [--passes N] name [name ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
(default 32) — identical to bench.py. --explain additionally writes
plans/r09/<name>_current.txt with the formatted plan.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from avro_sql_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    explain = "--explain" in args
    if explain:
        args.remove("--explain")
    passes = 2
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        del args[i : i + 2]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("avro-sql-spark-timeq", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    for name in names:
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        if explain:
            os.makedirs(os.path.join(ROOT, "plans", "r09"), exist_ok=True)
            with open(
                os.path.join(ROOT, "plans", "r09", f"{name}_current.txt"), "w"
            ) as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))

    timings: dict[str, float] = {}
    from bench import sweep_persisted_rdds

    for _ in range(passes):
        for name in names:
            spark.catalog.clearCache()
            sweep_persisted_rdds(spark)
            spark.sparkContext.setJobDescription(f"timed:{name}")
            start = time.perf_counter()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            elapsed = round(time.perf_counter() - start, 3)
            timings[name] = min(timings.get(name, elapsed), elapsed)
    print(json.dumps(timings, indent=1))


if __name__ == "__main__":
    main()
