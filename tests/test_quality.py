"""Expectation-gate tests: metric accounting, null-as-failure,
valid/quarantine split consistency, failed_rules annotation."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_financial_transactions_data_pipeline_spark.operators.quality import (
    expectation_metrics,
    split_by_expectations,
)

def _rules():
    return {
        "pos": F.col("v") > 0,
        "named": F.col("name").isNotNull(),
    }


def _df(spark):
    return spark.createDataFrame(
        [(1, "a"), (-2, "b"), (3, None), (None, "d")],
        "v long, name string",
    )


def test_metrics_count_null_as_fail(spark):
    out = {r.rule_name: r for r in expectation_metrics(_df(spark), _rules()).collect()}
    # v > 0 is null for the null v — conservative gate counts it failed.
    assert (out["pos"].n_pass, out["pos"].n_fail) == (2, 2)
    assert (out["named"].n_pass, out["named"].n_fail) == (3, 1)


def test_split_partitions_rows_exactly(spark):
    df = _df(spark)
    valid, quarantine = split_by_expectations(df, _rules())
    assert valid.count() + quarantine.count() == df.count()
    assert [r.v for r in valid.collect()] == [1]


def test_quarantine_names_each_failed_rule(spark):
    _, quarantine = split_by_expectations(_df(spark), _rules())
    got = {r.v: list(r.failed_rules) for r in quarantine.collect()}
    assert got[-2] == ["pos"]
    assert got[3] == ["named"]
    assert got[None] == ["pos"]


def test_metrics_single_scan(spark):
    import re

    from realtime_financial_transactions_data_pipeline_spark.plans import inspect
    from realtime_financial_transactions_data_pipeline_spark.operators.quality import (
        dq1_expectation_metrics,
        event_rules,
    )
    from realtime_financial_transactions_data_pipeline_spark.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "events")
    plan = inspect.formatted_plan(expectation_metrics(e, event_rules()))
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.M)) == 1


def test_referential_audit_finds_planted_orphans(spark):
    from realtime_financial_transactions_data_pipeline_spark.operators.quality import (
        referential_audit,
    )

    child = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 999)], "id long, fk long"
    )
    parent = spark.createDataFrame([(100,)], "pk long")
    out = referential_audit({"child->parent": (child, "fk", parent, "pk")}).collect()
    r = out[0]
    assert (r.fk, r.n_rows, r.n_fk_values, r.n_orphans) == ("child->parent", 3, 2, 1)


def test_k_anonymity_flags_small_classes(spark):
    from realtime_financial_transactions_data_pipeline_spark.operators.tokenization import (
        _K_ANON,
    )
    from pyspark.sql import functions as F

    rows = [("A", 1)] * 6 + [("B", 2)] * 2  # class B is under k=5
    df = spark.createDataFrame(rows, "c_mktsegment string, c_nationkey long")
    out = {
        (r.c_mktsegment, r.c_nationkey): (r.n, r.suppress)
        for r in df.groupBy("c_mktsegment", "c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("suppress", F.col("n") < _K_ANON)
        .collect()
    }
    assert out[("A", 1)] == (6, False)
    assert out[("B", 2)] == (2, True)


def test_gdpr_erasure_accounting_balances(spark, sf_dir):
    from realtime_financial_transactions_data_pipeline_spark.operators.tokenization import (
        u4_gdpr_erasure,
    )

    rows = {r.table_name: r for r in u4_gdpr_erasure(spark, sf_dir).collect()}
    for name, r in rows.items():
        assert r.rows_before == r.rows_after + r.rows_erased, name
    assert rows["events"].rows_erased > 0  # the request set is non-empty
