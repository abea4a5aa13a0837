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

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

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


_MEMO: dict[tuple, DataFrame] = {}
_MEMO_CAPACITY = 4


def memo_persist(
    spark: SparkSession, key: tuple, builder: Callable[[], DataFrame]
) -> DataFrame:
    """CROSS-probe keyed cache for derived frames several probes share
    (the word-shingle pass feeding x2a AND x2b; the simhash fingerprint
    pass feeding x2d AND x2i). ``shared_persist`` cannot express this —
    its caches die at the next operator's persist — while these frames
    are deterministic functions of (table files, derivation), so reuse
    across probes is semantics-free and saves the suite a full
    re-derivation each time (the round-5 suite spent ~23 % of wall in
    the similarity family, most of it duplicated shingling/hashing).

    Keys are namespaced by the Spark application so a cache from a
    stopped session is never served. FIFO-bounded at
    ``_MEMO_CAPACITY`` entries; eviction only unpersists (consumers of
    an evicted frame recompute, never err). This is a probe-harness
    amortization: the operators themselves still accept arbitrary
    DataFrames, and at corpus scale the same sharing is done by writing
    the derived table once (SURVEY §6 layout step)."""
    full_key = (spark.sparkContext.applicationId, *key)
    df = _MEMO.get(full_key)
    if df is not None:
        return df
    while len(_MEMO) >= _MEMO_CAPACITY:
        old = _MEMO.pop(next(iter(_MEMO)))  # FIFO: oldest entry first
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass
    df = builder().persist()
    _MEMO[full_key] = df
    return df
