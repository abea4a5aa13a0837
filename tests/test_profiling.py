"""Table-profiler tests: one-scan plan, null accounting, value
correctness on a hand-built frame."""

from __future__ import annotations

from realtime_financial_transactions_data_pipeline_spark.operators.profiling import (
    profile_table,
)
from realtime_financial_transactions_data_pipeline_spark.plans import inspect
from realtime_financial_transactions_data_pipeline_spark.tables import load_table


def test_profile_values_and_null_accounting(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "c"), (2, "a")],
        "k long, s string",
    )
    out = {r.col_name: r for r in profile_table(df, ["k"], ["s"], []).collect()}
    k, s = out["k"], out["s"]
    assert (k.n_nonnull, k.n_distinct, k.min_num, k.max_num) == (3, 2, 1.0, 2.0)
    assert k.min_str is None and k.max_str is None
    assert (s.n_nonnull, s.n_distinct, s.min_str, s.max_str) == (3, 2, "a", "c")
    assert s.min_num is None


def test_profile_is_single_scan(spark, sf_dir):
    """All six columns' statistics come from ONE pass: the plan holds
    exactly one parquet scan (the oracle needs six)."""
    o = load_table(spark, sf_dir, "orders")
    prof = profile_table(
        o,
        num_cols=["o_orderkey", "o_custkey", "o_totalprice"],
        str_cols=["o_orderstatus", "o_orderpriority"],
        date_cols=["o_orderdate"],
    )
    plan = inspect.formatted_plan(prof)
    # The formatted output names each node once in the tree and once in
    # the detail section — count detail headers ("(n) Scan parquet").
    import re

    scans = re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.M)
    assert len(scans) == 1, plan
    assert prof.count() == 6
