"""Dump `.explain("formatted")` for named queries() entries to
plans/r09/<name>_<tag>.txt — the optimization round's before/after plan
evidence. Planning only (no job execution) except where an entry's
construction itself runs jobs (iterative operators).

Usage:
    python tools/dump_explain.py <tag> name [name ...]
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from avro_sql_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("avro-sql-spark-explain", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    out_dir = os.path.join(ROOT, "plans", "r09")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spark.catalog.clearCache()
        df = queries[name](spark, sf_dir)
        txt = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
