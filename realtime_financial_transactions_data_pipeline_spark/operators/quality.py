"""Declarative data-quality expectations — the Delta Live Tables /
Great Expectations pattern, generalizing the reference's binary
validation routing (P4, `dataflow_pipeline/pipeline.py:108-139`: one
hard-coded predicate, two branches) into a rule SET with per-rule
accounting.

One pass produces three things from a dict of named boolean rules:

* **metrics** — per-rule pass/fail counts via conditional aggregation
  (one `agg` of `sum(when(...))` pairs → long form through a 1-row
  explode, the same shape as the profiler). No shuffle beyond the
  single global aggregate; every term is partial-aggregable.
* **valid rows** — `filter(AND of all rules)`: stays a scan-level
  predicate, pushes down like any other filter.
* **quarantine rows** — the complement, annotated with a
  `failed_rules` array naming exactly which expectations each row
  violated (the triage column a dead-letter consumer needs) — built
  from the same rule expressions with `array_compact`, all codegen.

At 100 TB: rules are ordinary boolean columns, so the whole gate is
scan + filter + one global agg; nothing is per-rule passes. The
valid/quarantine split reuses the P4/K2 dual-sink routing downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_financial_transactions_data_pipeline_spark.registry import probe
from realtime_financial_transactions_data_pipeline_spark.tables import load_table


def expectation_metrics(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Per-rule accounting in ONE aggregate: (rule_name, n_pass,
    n_fail, fail_pct). A null rule result counts as a failure (the
    conservative gate — unknown is not valid)."""
    aggs = []
    for name, cond in rules.items():
        ok = F.coalesce(cond.cast("boolean"), F.lit(False))
        aggs += [
            F.sum(ok.cast("long")).alias(f"p_{name}"),
            F.sum((~ok).cast("long")).alias(f"f_{name}"),
        ]
    onerow = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(name).alias("rule_name"),
            F.col(f"p_{name}").alias("n_pass"),
            F.col(f"f_{name}").alias("n_fail"),
        )
        for name in rules
    ]
    return onerow.select(F.explode(F.array(*structs)).alias("m")).select("m.*")


def split_by_expectations(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantine): valid rows satisfy every rule; quarantine
    rows carry a `failed_rules` array naming each violated rule in
    declaration order. Null rule results quarantine."""
    oks = {
        name: F.coalesce(cond.cast("boolean"), F.lit(False))
        for name, cond in rules.items()
    }
    all_ok = F.lit(True)
    for ok in oks.values():
        all_ok = all_ok & ok
    valid = df.filter(all_ok)
    failed = F.array_compact(
        F.array(
            *[F.when(~ok, F.lit(name)) for name, ok in oks.items()]
        )
    )
    quarantine = df.filter(~all_ok).withColumn("failed_rules", failed)
    return valid, quarantine


def event_rules() -> dict[str, Column]:
    """The probe's rule set over `events` — shared by the probe and its
    tests so the two can't drift."""
    return {
        "value_non_negative": F.col("value") >= 0,
        "user_id_present": F.col("user_id").isNotNull(),
        "known_event_type": F.col("event_type").isin(
            "click", "view", "purchase", "signup"
        ),
        "ts_in_2024": F.year("ts") == 2024,
    }


@probe(
    "dq1_expectation_metrics",
    oracle="""
    SELECT 'value_non_negative' AS rule_name,
           CAST(sum(CASE WHEN value >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(sum(CASE WHEN value >= 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_fail
    FROM events
    UNION ALL
    SELECT 'user_id_present',
           CAST(sum(CASE WHEN user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN user_id IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'known_event_type',
           CAST(sum(CASE WHEN event_type IN ('click','view','purchase','signup')
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN event_type IN ('click','view','purchase','signup')
                         THEN 0 ELSE 1 END) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'ts_in_2024',
           CAST(sum(CASE WHEN EXTRACT(year FROM ts) = 2024 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN EXTRACT(year FROM ts) = 2024 THEN 0 ELSE 1 END) AS BIGINT)
    FROM events
    """,
)
def dq1_expectation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-suite accounting over `events`: four declarative
    rules, per-rule pass/fail counts from one scan + one aggregate
    (the oracle needs four scans)."""
    e = load_table(spark, sf_dir, "events")
    return expectation_metrics(e, event_rules())
