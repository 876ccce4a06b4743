"""Storage-level hygiene of the iterative loops: superseded
per-round localCheckpoint frames must be unpersisted once the next
round's action materializes (dedup.py's materialize-then-unpersist
ordering), so pinned executor storage stays ~2 rounds deep instead of
growing with round count — the r8-verdict item 1 contract."""

import pytest


def _sweep(spark) -> int:
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import sweep_persisted_rdds

    return sweep_persisted_rdds(spark)


def _n_persisted(spark) -> int:
    return len(spark.sparkContext._jsc.getPersistentRDDs().keys())


def test_bfs_pinned_blocks_bounded(spark):
    """A long-chain BFS (8 rounds) must not retain one dist + one
    frontier checkpoint per round: after the terminal action at most
    the final ~2 rounds' frames (plus the edge input) stay pinned."""
    from avro_sql_spark.operators.graph import bfs_distances

    _sweep(spark)
    edges = [(i, i + 1) for i in range(1, 9)]
    und = edges + [(b, a) for a, b in edges]
    e = spark.createDataFrame(und, "src LONG, dst LONG")
    seeds = spark.createDataFrame([(1,)], "node LONG")
    out = {r["node"]: r["dist"] for r in bfs_distances(e, seeds, max_hops=8).collect()}
    assert out == {i: i - 1 for i in range(1, 10)}  # unchanged result
    # without the unpersist port this is ~2 frames x 8 rounds (>= 16)
    assert _n_persisted(spark) <= 5
    _sweep(spark)


def test_scc_pinned_blocks_bounded(spark):
    from avro_sql_spark.operators.graph import scc_labels

    _sweep(spark)
    # 6-cycle: closure needs 3 doubling rounds; one component
    edges = [(i, (i + 1) % 6) for i in range(6)]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    labels = {r["node"]: r["scc_id"] for r in scc_labels(df, rounds=4).collect()}
    assert set(labels.values()) == {0}
    assert _n_persisted(spark) <= 4
    _sweep(spark)


def test_bpe_pinned_blocks_bounded(spark):
    from avro_sql_spark.operators.bpe import train_bpe_state

    _sweep(spark)
    docs = spark.createDataFrame(
        [("the cat sat on the mat the cat",)] * 3, "text STRING"
    )
    merges, words = train_bpe_state(docs, n_merges=6)
    words.collect()  # materialize the final (returned-lazy) table
    assert len(merges) >= 3
    # without the port: one vocabulary frame pinned per merge round
    assert _n_persisted(spark) <= 4
    _sweep(spark)


def test_star_cc_pinned_blocks_bounded_and_correct(spark):
    from avro_sql_spark.operators.graph import connected_components_star

    _sweep(spark)
    # two components: a 7-chain (multi-round convergence) + a pair
    edges = [(i, i + 1) for i in range(1, 7)] + [(20, 21)]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    out = {r["id"]: r["cluster_id"] for r in connected_components_star(df).collect()}
    assert out == {**{i: 1 for i in range(1, 8)}, 20: 20, 21: 20}
    assert _n_persisted(spark) <= 5
    _sweep(spark)


def test_kcore_zero_rounds_empty_frame(spark):
    """rounds < 1 returns an empty frame with the documented schema
    (was: AttributeError on None.orderBy) — ADVICE r8 item."""
    from avro_sql_spark.operators.graph import kcore_peel

    df = spark.createDataFrame([(1, 2)], "src LONG, dst LONG")
    out = kcore_peel(df, k=2, rounds=0)
    assert [f.name for f in out.schema.fields] == ["round", "n_nodes", "n_edges"]
    assert out.count() == 0
