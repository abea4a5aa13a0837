"""Bounded sharing cache for probe-internal persisted DataFrames.

Several operators persist a shared intermediate (x2a's shingle pass,
x6's curated snapshot, x2h's centroids) that two plan branches consume.
A bare ``.persist()`` leaks: the probe returns a lazy DataFrame, so
there is no safe point inside the operator to unpersist, and across an
80-probe bench session sharing one SparkSession the cached blocks pile
up until the JVM's ContextCleaner happens to collect them.

``shared_persist`` keeps at most the CURRENT operator invocation's
caches alive: persisting a new DataFrame first unpersists every cache
registered by earlier invocations. Unpersisting is always
semantics-preserving in Spark (a consumer of an unpersisted plan simply
recomputes), so the only assumption is the harness's actual access
pattern — each probe's result is consumed before the next probe runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def shared_persist(df: DataFrame, evict_previous: bool = True) -> DataFrame:
    """Persist ``df`` for intra-operator reuse. With the default
    ``evict_previous=True`` every cache registered by EARLIER calls is
    unpersisted first — correct for operators that persist exactly one
    intermediate (all current callers). An operator persisting several
    intermediates must pass ``evict_previous=False`` from its second
    call on, or it would evict its own first cache mid-build (silent
    recompute, never a wrong result)."""
    if evict_previous:
        for old in _LIVE:
            try:
                old.unpersist(blocking=False)
            except Exception:  # session may be gone in teardown paths
                pass
        _LIVE.clear()
    df = df.persist()
    _LIVE.append(df)
    return df
