"""Session-scoped registry for operator-internal persisted DataFrames.

Several operators persist an intermediate that their (lazy) result plan
consumes more than once — e.g. the token arrays in
``operators/setjoin.py::setsim_join`` are read three times (prefix
explode, verify-a, verify-b). The operator cannot unpersist before
returning: the caller has not run the consuming action yet. But leaving
the cache live forever is an unbounded leak across a long session that
builds hundreds of query plans (bench.py runs ~200).

The discipline:

* operators call :func:`persist_tracked` instead of ``df.persist()`` for
  any cache whose lifetime they cannot scope themselves;
* harness loops (bench.py, tools/oracle_check.py, test fixtures) call
  :func:`release_caches` after each query's consuming action completes.

``MEMORY_AND_DISK`` means an unreleased cache degrades (evicts/spills)
rather than OOMs, so forgetting to release is safe-but-wasteful — the
registry turns "wasteful forever" into "released per query".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LIVE: list[DataFrame] = []


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """Persist ``df`` and register it for later :func:`release_caches`."""
    df.persist(level)
    _LIVE.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked DataFrame; returns how many were released.

    ``blocking=False``: eviction proceeds asynchronously so the harness
    loop never stalls on executor cleanup.
    """
    n = len(_LIVE)
    for df in _LIVE:
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped — nothing to release
    _LIVE.clear()
    return n


def live_count() -> int:
    """Number of currently tracked (not yet released) caches."""
    return len(_LIVE)


def iterative_checkpoint(df: DataFrame) -> DataFrame:
    """``localCheckpoint`` at MEMORY_AND_DISK_SER — the storage level for
    ROUND-TRANSIENT state in iterative loops (star-CC rounds, k-core
    survivor sets, BFS frontiers, HITS scores).

    Rationale (r11 deep-iteration probe, SCALING.md): the default
    deserialized level stores row OBJECTS (~3-6x the on-wire bytes);
    deep-chain star contraction holds two generations of a transiently
    EXPANDED edge set, which blew a 16 GiB single-JVM heap at 32M edges
    while the serialized footprint fits comfortably. Round state is
    written once and read once (next round + convergence check), so the
    per-round serialize/deserialize cost is one pass — measured ~neutral
    wall at 8M edges against an OOM→finish upgrade at 32M. Hot
    multi-consumer checkpoints (global_rank's sorted layout) deliberately
    stay deserialized."""
    from pyspark.storagelevel import StorageLevel

    # PySpark naming: MEMORY_AND_DISK is the SERIALIZED level (the
    # Scala deserialized default is MEMORY_AND_DISK_DESER)
    return df.localCheckpoint(
        eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
    )


def release_local_checkpoint(df: DataFrame) -> bool:
    """Free the storage blocks behind a ``localCheckpoint()``-ed frame.

    Iterative operators (alternating-star CC, BFS frontiers, HITS,
    k-core peeling, k-means/coreset rounds) re-checkpoint per round;
    ``localCheckpoint`` pins each round's blocks in the BlockManager and
    driver-side GC releases them far too lazily through py4j finalizers
    — measured: a 16M-edge alternating-star run OOMed an 8 GiB heap on
    accumulated dead rounds (r10 scale probe). Calling this on the
    PREVIOUS round after the next round's (eager) checkpoint has
    materialized bounds live storage to one round.

    DANGER: a localCheckpoint's blocks ARE its data (lineage is
    truncated) — releasing a frame that still feeds a future action
    makes that action FAIL LOUDLY with missing blocks (never silently
    wrong). Only call on frames with no remaining consumers.

    Returns True if blocks were found and released. Uses the analyzed
    plan's ``LogicalRDD`` handle; quietly no-ops on anything else.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() != "LogicalRDD":
            return False
        plan.rdd().unpersist(False)
        return True
    except Exception:
        return False
