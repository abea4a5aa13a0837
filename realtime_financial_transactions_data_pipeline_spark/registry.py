"""Probe-query registry.

Each operator from SURVEY.md §2 registers a named probe: a builder
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the ANSI-SQL
oracle string DuckDB runs on the same parquet tables. ``__spark_entry__``
exposes the aggregate registry to the driver.

Column-name discipline: every computed/aggregate column is aliased
identically in the Spark builder and the oracle SQL — the driver's
comparator sorts columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Probe:
    name: str
    fn: QueryFn
    oracle: str | None  # None => driver does a rows-only check
    doc: str = ""


_REGISTRY: dict[str, Probe] = {}


def probe(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a probe query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate probe {name!r}")
        _REGISTRY[name] = Probe(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_probes() -> dict[str, Probe]:
    # Import side-effect modules that register probes.
    from realtime_financial_transactions_data_pipeline_spark.operators import (  # noqa: F401
        relational,
        dedup,
        similarity,
        text,
        sketches,
        tokenization,
        multimodal,
        scale,
        curation,
    )
    from realtime_financial_transactions_data_pipeline_spark.sources import (  # noqa: F401
        batch,
        datagen,
    )
    from realtime_financial_transactions_data_pipeline_spark.streaming import (  # noqa: F401
        joins,
        pipeline,
        stateful,
        windows,
    )

    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: p.fn for name, p in all_probes().items()}


def oracle_sql() -> dict[str, str]:
    return {name: p.oracle for name, p in all_probes().items() if p.oracle is not None}
