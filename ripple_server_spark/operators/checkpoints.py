"""Storage management for iterative/stateful operators.

``DataFrame.localCheckpoint()`` truncates lineage by caching the
materialized rows as an RDD — but nothing ever frees that cache:
``DataFrame.unpersist()`` is a no-op on it (the caching lives at the
RDD level, not the plan-cache level), so an operator that checkpoints
per round/epoch (iterative connected components, the incremental
set-similarity join) accumulates one dead cached RDD per step for the
life of the session, evicting useful cache and eventually spilling.

:func:`free_local_checkpoint` releases a superseded checkpoint's
storage explicitly: a localCheckpointed DataFrame's analyzed plan is a
``LogicalRDD`` wrapping exactly the cached RDD, so unpersisting that
RDD drops its blocks. Best-effort by design — on any non-checkpointed
input (or an internals change) it silently does nothing, and the
ContextCleaner remains the backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def free_local_checkpoint(df: DataFrame | None) -> None:
    """Release the cached blocks behind a ``localCheckpoint()``-ed
    DataFrame. Call ONLY once every consumer of ``df`` has been
    materialized (typically: after the next round's checkpoint, which
    copies the data forward, exists)."""
    if df is None:
        return
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass  # best-effort: ContextCleaner is the backstop
