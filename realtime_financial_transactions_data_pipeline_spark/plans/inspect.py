"""Physical-plan inspection helpers (SURVEY §4): assert the plans we
ship are the plans we want — broadcast joins for dims, filters pushed to
the parquet scan, no Python row-at-a-time UDFs in relational paths.

Used by tests/test_plans.py as plan-regression guards: a refactor that
silently turns a broadcast join into a sort-merge join, or lifts a
filter off the scan, fails the suite even though results stay correct —
at sf0.01 nothing would notice; at 100 TB it's the difference between a
minute and an afternoon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in formatted_plan(df)


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters lines of every scan in the plan."""
    return "\n".join(
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "PushedFilters" in line
    )


def scan_read_schema(df: DataFrame) -> str:
    """The ReadSchema lines — what columns actually leave the scan."""
    return "\n".join(
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "ReadSchema" in line
    )


def partition_filters(df: DataFrame) -> str:
    """The PartitionFilters lines of every scan — predicates that prune
    whole hive partitions before any file is opened."""
    return "\n".join(
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "PartitionFilters" in line
    )


def has_wholestage_codegen(df: DataFrame) -> bool:
    """Whether any WholeStageCodegen subtree compiles for this plan
    (zero subtrees means nothing is codegen'd — a red flag for a
    relational plan). Uses the "codegen" explain mode, which reports
    `Found N WholeStageCodegen subtrees.` Under AQE the physical plan
    only finalizes on execution, so trigger one first."""
    df.collect()
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    return not plan.startswith("Found 0 WholeStageCodegen")


def has_python_row_udf(df: DataFrame) -> bool:
    """True if a row-at-a-time Python UDF (BatchEvalPython) is in the
    plan. Arrow-batched pandas UDFs show as ArrowEvalPython instead."""
    return "BatchEvalPython" in formatted_plan(df)


def global_windows(df: DataFrame) -> list[str]:
    """Arguments lines of every Window node with NO partition spec —
    the `OVER (ORDER BY …)` / `OVER ()` SinglePartition collapse that
    funnels the whole relation through one task (the a24/x27 hazard
    VERDICT r15 flagged). In formatted-plan detail a Window node's
    Arguments hold top-level bracket groups:
      [exprs], [partition], [order]  — partitioned (3 groups)
      [exprs], [partition]           — partitioned, unordered
      [exprs], [order]               — GLOBAL ordered
      [exprs]                        — GLOBAL unordered (OVER ())
    The 2-group cases disambiguate by the second group's content: an
    order spec carries ASC/DESC markers, a partition spec never does.
    WindowGroupLimit nodes are intentionally NOT matched — they are
    per-partition top-k pruning, and every one rides a partitioned
    Window above it. Returns the offending lines (empty = clean)."""
    import re

    out = []
    plan = formatted_plan(df)
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if not re.fullmatch(r"\(\d+\) Window", line.strip()):
            continue
        for detail in lines[i + 1 : i + 6]:
            if not detail.startswith("Arguments: "):
                continue
            depth, groups, spans, start = 0, 0, [], 0
            for j, ch in enumerate(detail):
                if ch == "[":
                    if depth == 0:
                        groups += 1
                        start = j
                    depth += 1
                elif ch == "]":
                    depth -= 1
                    if depth == 0:
                        spans.append(detail[start : j + 1])
            is_global = groups == 1 or (
                groups == 2
                and re.search(r"\b(ASC|DESC)\b", spans[1]) is not None
            )
            if is_global:
                out.append(detail[:200])
            break
    return out
