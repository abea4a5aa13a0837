"""Declarative Pipelines (Spark 4.1 ``pyspark.pipelines``) on classic
Spark: a local interpreter for the OFFICIAL definition API.

``pyspark.pipelines`` ships the open-sourced Delta-Live-Tables-style
decorators (``@materialized_view``, ``@temporary_view``, ``@table``,
``append_flow``) — but its bundled runtime executes only through Spark
Connect (grpc, absent in this environment). The definition layer is
runtime-agnostic by design: decorators register ``Output``/``Flow``
dataclasses against whatever ``GraphElementRegistry`` is active. So
this module supplies the missing half locally:

* :class:`LocalGraphElementRegistry` — collects the declared outputs
  and flows (the same objects the Connect backend would receive);
* :func:`run_pipeline` — a dependency-ordered executor: materialized
  views write parquet under a base dir and re-register as temp views
  (so downstream queries use ``spark.table(name)`` exactly as they
  would under the official runtime), temporary views register
  directly. Dependencies are resolved by iterating to a fixed point —
  a flow whose upstream tables are not yet registered is retried after
  the others — so declaration order does not matter, matching the
  official semantics.

At 100 TB nothing here changes: each materialized view is an ordinary
DataFrame write, and the graph is metadata. The official runtime adds
incremental refresh & flow-level retries; swap it in by running the
same decorated module under ``spark-pipelines`` once Connect exists.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.pipelines.flow import Flow
from pyspark.pipelines.graph_element_registry import (
    GraphElementRegistry,
    graph_element_registration_context,
)
from pyspark.pipelines.output import MaterializedView, Output, TemporaryView
from pyspark.sql import DataFrame, SparkSession


class LocalGraphElementRegistry(GraphElementRegistry):
    """Collects the dataflow graph the official decorators declare."""

    def __init__(self) -> None:
        self.outputs: list[Output] = []
        self.flows: list[Flow] = []
        self.sql: list[str] = []

    def register_output(self, output: Output) -> None:
        self.outputs.append(output)

    def register_flow(self, flow: Flow) -> None:
        self.flows.append(flow)

    def register_sql(self, sql_text: str, file_path) -> None:
        self.sql.append(sql_text)


def run_pipeline(
    spark: SparkSession, define, base_dir: str
) -> dict[str, DataFrame]:
    """Execute a decorated pipeline definition locally.

    ``define`` is a zero-arg callable whose body declares the pipeline
    with the official ``pyspark.pipelines`` decorators. Returns
    {output_name: DataFrame} for every materialized dataset.
    """
    registry = LocalGraphElementRegistry()
    with graph_element_registration_context(registry):
        define()
    by_target = {o.name: o for o in registry.outputs}
    pending = list(registry.flows)
    done: dict[str, DataFrame] = {}
    while pending:
        progressed = False
        deferred: list[Flow] = []
        for flow in pending:
            try:
                df = flow.func()
            except AnalysisException:
                # upstream table not registered yet — retry next round
                deferred.append(flow)
                continue
            out = by_target[flow.target]
            if isinstance(out, MaterializedView):
                path = f"{base_dir}/{out.name}"
                df.write.mode("overwrite").parquet(path)
                materialized = spark.read.parquet(path)
                materialized.createOrReplaceTempView(out.name)
                done[out.name] = materialized
            elif isinstance(out, TemporaryView):
                df.createOrReplaceTempView(out.name)
                done[out.name] = spark.table(out.name)
            else:
                raise NotImplementedError(
                    f"local executor does not run {type(out).__name__} "
                    "outputs (streaming tables need the official runtime)"
                )
            progressed = True
        if not progressed:
            names = [f.name for f in deferred]
            raise RuntimeError(
                f"pipeline has unresolvable dependencies (cycle or "
                f"missing upstream): {names}"
            )
        pending = deferred
    return done
