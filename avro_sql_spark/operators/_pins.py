"""RDD-level unpersist for localCheckpoint-ed frames.

``DataFrame.unpersist()`` only removes CACHE-MANAGER entries (plans
registered via ``.cache()``/``.persist()``); a ``localCheckpoint``'s
blocks live on a persisted RDD referenced by a ``LogicalRDD`` leaf, so
``unpersist()`` on the checkpointed frame is a silent no-op and the
blocks stay pinned until Python GC + ContextCleaner get around to
them. The iterative loops here (BFS, path-doubling SCC, star-CC, BPE,
PageRank's eager mode, CC label propagation) retire one superseded
round frame per round; dropping those blocks deterministically bounds
executor storage at ~2 rounds instead of growing with round count.

CONTRACT: call this only on a frame that (a) came straight from
``localCheckpoint()`` (its analyzed plan is the LogicalRDD — no
operators on top), and (b) has NO remaining consumer: a locally
checkpointed RDD's lineage is truncated, so its blocks are
unrecoverable after unpersisting (Spark logs exactly that warning).
The safe ordering is dedup.py's materialize-then-unpersist: the
action that materializes round N's checkpoint is the last read of
round N-1's frame, THEN round N-1 is retired.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def unpersist_checkpoint(df: DataFrame, blocking: bool = False) -> None:
    """Unpersist the RDD behind a localCheckpoint-ed ``df``.

    STRICT on purpose: acts only when the frame's analyzed plan IS the
    LogicalRDD a localCheckpoint call returned. Walking to arbitrary
    LogicalRDD *leaves* would also unpersist UPSTREAM checkpoints a
    caller passed in and still owns (found the hard way in r9:
    corpus_funnel hands checkpoint-backed inputs to
    connected_components, whose round-1 retiree is a plain .cache()
    frame built ON those inputs — a leaf walk killed the caller's
    blocks mid-query). On any other frame this is a no-op; cached
    frames are DataFrame.unpersist()'s job."""
    plan = df._jdf.queryExecution().analyzed()
    if plan.getClass().getSimpleName() == "LogicalRDD":
        plan.rdd().unpersist(blocking)
