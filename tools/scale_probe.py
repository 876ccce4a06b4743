"""Scale probe: measure how the slowest entries actually scale with
data volume, turning the plan-shape argument ("edge-linear", "bounded
frame") into a measured exponent.

The driver testdata stops at sf0.1, so the probe builds a synthetic
sf1.0-equivalent under ``$SPARK_GRAFT_PROBE_DIR`` (default
/tmp/sfprobe10) by unioning ``FACTOR`` copies of every sf0.1 table with
each replica's keys shifted into a disjoint range (orderkey, partkey,
suppkey, custkey, event/user/doc/vec ids all offset by i*OFFSET; dims
region/nation copied once). That preserves every join relationship and
gives FACTOR disjoint copies of the copurchase graph / user universe —
the right shape for probing shuffle- and frontier-bound entries.

Caveat recorded in the output: ``documents.text`` is replicated
verbatim, so dedup-family entries see an inflated duplicate rate (every
doc gains FACTOR-1 exact twins). For those entries the probe measures
the duplicate-heavy worst case, which upper-bounds the honest cost.

Usage:
    python tools/scale_probe.py [entry ...]

Defaults to the slowest-10 of the committed bench_full.json. Writes
bench_scale_probe.json: per-entry sf0.1 time, sf1.0 time, ratio, and
the log-log scaling exponent alpha (t ~ data^alpha; alpha <= ~1.1 is
linear within noise, 0 is fixed-overhead-bound).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

FACTOR = 10
OFFSET = 100_000_000

# key columns shifted per replica (disjoint key ranges, joins preserved)
SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONCE = ["region", "nation"]


def build_probe_data(src: str, dst: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for t in COPY_ONCE:
        pq.write_table(
            pq.read_table(f"{src}/{t}.parquet"), f"{dst}/{t}.parquet"
        )
    for t, keys in SHIFTS.items():
        base = pq.read_table(f"{src}/{t}.parquet")
        chunks = []
        for i in range(FACTOR):
            rep = base
            for k in keys:
                idx = rep.schema.get_field_index(k)
                col = rep.column(k)
                shifted = pa.compute.add(
                    pa.compute.cast(col, pa.int64()), i * OFFSET
                ).cast(rep.schema.field(k).type)
                rep = rep.set_column(idx, rep.schema.field(k), shifted)
            chunks.append(rep)
        out = pa.concat_tables(chunks)
        pq.write_table(out, f"{dst}/{t}.parquet", row_group_size=1 << 20)
        print(f"  {t}: {base.num_rows} -> {out.num_rows} rows", flush=True)


def time_entry(spark, queries, name: str, sf_dir: str) -> float:
    best = math.inf
    for _ in range(2):
        spark.catalog.clearCache()
        start = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.perf_counter() - start)
    return round(best, 3)


def main() -> None:
    src = "/root/testdata/sf0.1"
    dst = os.environ.get("SPARK_GRAFT_PROBE_DIR", "/tmp/sfprobe10")
    if sys.argv[1:]:
        names = sys.argv[1:]
    else:
        full = json.load(open(os.path.join(ROOT, "bench_full.json")))
        names = [
            n
            for n, _ in sorted(
                full["queries"].items(), key=lambda kv: -kv[1]
            )[:10]
        ]
    if not os.path.exists(os.path.join(dst, "lineitem.parquet")):
        print(f"building {FACTOR}x probe data at {dst}", flush=True)
        build_probe_data(src, dst)

    from avro_sql_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("scale-probe", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    results = {}
    for name in names:
        # warmup at small scale (JIT/codegen), then timed at both scales
        queries[name](spark, src).write.format("noop").mode(
            "overwrite"
        ).save()
        t_small = time_entry(spark, queries, name, src)
        t_big = time_entry(spark, queries, name, dst)
        ratio = round(t_big / t_small, 3) if t_small > 0 else None
        alpha = (
            round(math.log(t_big / t_small) / math.log(FACTOR), 3)
            if t_small > 0 and t_big > 0
            else None
        )
        results[name] = {
            "sf0.1_sec": t_small,
            f"sf1.0_sec": t_big,
            "ratio": ratio,
            "alpha": alpha,
        }
        print(
            f"{name}: {t_small:.2f}s -> {t_big:.2f}s "
            f"(x{ratio}, alpha={alpha})",
            flush=True,
        )
    out = {
        "factor": FACTOR,
        "note": (
            "sf1.0 data = 10 disjoint key-shifted copies of sf0.1 "
            "(joins/graphs preserved; documents.text replicated verbatim, "
            "so dedup-family entries measure the duplicate-heavy worst "
            "case). alpha = log(t_ratio)/log(10): ~1 linear, <1 "
            "overhead-bound, >1 super-linear."
        ),
        "entries": results,
    }
    with open(os.path.join(ROOT, "bench_scale_probe.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({"probe_entries": len(results)}))


if __name__ == "__main__":
    main()
