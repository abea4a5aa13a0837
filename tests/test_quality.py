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


def test_psi_drift_smoothing_and_empty_bins(spark):
    """psi_drift edges: a bin present on only one side survives the
    full-outer join with a zero count, +1 smoothing keeps its PSI term
    finite, and an identical distribution yields PSI ~ 0."""
    import math

    from pyspark.sql import functions as F

    from realtime_financial_transactions_data_pipeline_spark.operators.quality import (
        psi_drift,
    )

    old = spark.createDataFrame([(b,) for b in [0] * 6 + [1] * 4], "v long")
    new = spark.createDataFrame([(b,) for b in [0] * 5 + [2] * 5], "v long")
    rows = {
        r.bin: r
        for r in psi_drift(old, new, F.col("v"), "bin").collect()
    }
    assert set(rows) == {0, 1, 2}
    assert (rows[1].n_old, rows[1].n_new) == (4, 0)   # one-sided bins kept
    assert (rows[2].n_old, rows[2].n_new) == (0, 5)
    for r in rows.values():
        assert math.isfinite(r._psi)                   # smoothing: no inf/nan
    # shares: (n + 1) / (total + 1)
    assert abs(rows[0]._sa - 7 / 11) < 1e-12
    assert abs(rows[0]._sb - 6 / 11) < 1e-12
    # drifted-away bin contributes positive PSI
    assert rows[1]._psi > 0 and rows[2]._psi > 0

    same = psi_drift(old, old, F.col("v"), "bin").agg(
        F.sum("_psi").alias("s")
    ).first().s
    assert abs(same) < 1e-12


def test_schema_drift_report_removed_column(spark, tmp_path):
    """dq4's probe only exercises 'added'; pin 'removed' and the
    presence accounting for a column that disappears in gen1."""
    from realtime_financial_transactions_data_pipeline_spark.operators.quality import (
        schema_drift_report,
    )

    g0 = str(tmp_path / "g0")
    g1 = str(tmp_path / "g1")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id long, name string, legacy double"
    ).write.parquet(g0)
    spark.createDataFrame([(3, "c"), (4, "d")], "id long, name string").write.parquet(g1)
    rows = {r.column: r for r in schema_drift_report(spark, g0, g1).collect()}
    leg = rows["legacy"]
    assert leg.status == "removed" and leg.in_gen0 and not leg.in_gen1
    assert leg.type_gen0 == "double" and leg.type_gen1 is None
    # 2 gen0 rows carry it; 2 gen1 rows read it as null under the merge
    assert leg.n_rows_present == 2 and leg.n_rows_missing == 2
    assert rows["id"].status == "stable" and rows["id"].n_rows_missing == 0


def test_schema_drift_survives_incompatible_type_change(spark, tmp_path):
    """ADVICE r13: int→string drift makes the mergeSchema read refuse
    ('Failed to merge fields') — the audit must still emit the metadata
    diff with a type_changed status and per-generation row accounting,
    not crash on exactly the drift class it exists to surface."""
    from realtime_financial_transactions_data_pipeline_spark.operators.quality import (
        schema_drift_report,
    )

    g0 = str(tmp_path / "g0")
    g1 = str(tmp_path / "g1")
    spark.createDataFrame(
        [(1, 10), (2, None)], "id long, code int"
    ).write.parquet(g0)
    spark.createDataFrame(
        [(3, "X"), (4, "Y"), (5, None)], "id long, code string"
    ).write.parquet(g1)
    rows = {r.column: r for r in schema_drift_report(spark, g0, g1).collect()}
    code = rows["code"]
    assert code.status == "type_changed"
    assert code.type_gen0 == "int" and code.type_gen1 == "string"
    # per-generation accounting: 1 non-null in g0 + 2 non-null in g1
    assert code.n_rows_present == 3 and code.n_rows_missing == 2
    assert rows["id"].status == "stable" and rows["id"].n_rows_present == 5


def test_schema_drift_compatible_type_change_still_merges(spark, tmp_path):
    """int→long upcasts merge fine; status still reports the drift but
    accounting comes from the real merged scan."""
    from realtime_financial_transactions_data_pipeline_spark.operators.quality import (
        schema_drift_report,
    )

    g0 = str(tmp_path / "g0")
    g1 = str(tmp_path / "g1")
    spark.createDataFrame([(1,)], "n int").write.parquet(g0)
    spark.createDataFrame([(2,), (3,)], "n long").write.parquet(g1)
    rows = {r.column: r for r in schema_drift_report(spark, g0, g1).collect()}
    assert rows["n"].status == "type_changed"
    assert rows["n"].n_rows_present == 3 and rows["n"].n_rows_missing == 0


def test_u7_l_diversity_flags_homogeneous_class(spark):
    """A (segment, nation) class whose members all fall in one balance
    band is k-anonymous at n=4 yet fails l-diversity at l=3."""
    import tempfile

    from realtime_financial_transactions_data_pipeline_spark.operators.tokenization import (
        u7_l_diversity_audit,
    )

    rows = (
        # homogeneous: 4 members, all in band 1 (1000-1999)
        [(i, f"c{i}", 1, 1000.0 + i, "AUTOMOBILE") for i in range(4)]
        # diverse: 4 members across bands 0,1,2,3
        + [(10 + i, f"c{10+i}", 2, i * 1000.0 + 10.0, "AUTOMOBILE") for i in range(4)]
    )
    c = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    with tempfile.TemporaryDirectory() as d:
        c.write.parquet(f"{d}/customer.parquet")
        out = {r.c_nationkey: r for r in u7_l_diversity_audit(spark, d).collect()}
    assert out[1].n == 4 and out[1].l_distinct == 1 and not out[1].diverse
    assert out[2].n == 4 and out[2].l_distinct == 4 and out[2].diverse


def test_dq5_freshness_matches_pandas(spark):
    """Gap/coverage arithmetic recomputed independently in pandas."""
    import pandas as pd

    from realtime_financial_transactions_data_pipeline_spark.operators.quality import (
        dq5_freshness_audit,
    )

    sf = "/root/testdata/sf0.001"
    pdf = pd.read_parquet(sf + "/events.parquet")
    pdf["day"] = pdf["ts"].dt.normalize()
    got = {r.event_type: r for r in dq5_freshness_audit(spark, sf).collect()}
    for et, grp in pdf.groupby("event_type"):
        days = sorted(grp.day.unique())
        g = got[et]
        assert g.n_active_days == len(days)
        assert g.n_rows == len(grp)
        span = (days[-1] - days[0]).days + 1
        assert g.span_days == span
        gaps = [(b - a).days for a, b in zip(days, days[1:])]
        assert g.max_gap_days == (max(gaps) if gaps else 0)
        assert abs(g.completeness - round(len(days) / span, 4)) < 1e-9
        assert g.freshness_ok == (g.max_gap_days <= 2)



def test_u9_erasure_cascade_two_hops(spark, monkeypatch):
    """The cascade must reach lineitem THROUGH orders (lineitem has no
    customer key): plant a cohort customer whose order owns 3 line
    items plus a non-cohort customer, and verify counts per table —
    including the stranded-residue case the two-hop join prevents."""
    from realtime_financial_transactions_data_pipeline_spark.operators import (
        tokenization,
    )
    from realtime_financial_transactions_data_pipeline_spark.tables import (
        load_table as real_load,
    )

    frames = {
        "customer": spark.createDataFrame(
            [(97,), (98,), (194,)], "c_custkey long"
        ),  # 97 and 194 are cohort (x % 97 == 0)
        "orders": spark.createDataFrame(
            [(1, 97), (2, 98), (3, 194)], "o_orderkey long, o_custkey long"
        ),
        "lineitem": spark.createDataFrame(
            [(1,), (1,), (1,), (2,), (3,)], "l_orderkey long"
        ),
    }
    monkeypatch.setattr(
        tokenization, "load_table", lambda s, d, t: frames.get(t) or real_load(s, d, t)
    )
    got = {
        r.table_name: (r.rows_before, r.rows_erased, r.rows_after)
        for r in tokenization.u9_erasure_cascade(spark, "unused").collect()
    }
    assert got == {
        "customer": (3, 2, 1),
        "orders": (3, 2, 1),
        "lineitem": (5, 4, 1),  # 3 items of order 1 + 1 item of order 3
    }


def test_dq6_fd_audit_brute_force(spark):
    """dq6 parity against a pandas recompute at sf0.001, plus the
    boundary semantics: the derived-bucket FD must HOLD over multi-row
    determinant groups, and both natural candidates must fail with the
    exact violating-key counts."""
    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.quality import (
        dq6_functional_dependency_audit,
    )

    sf = "/root/testdata/sf0.001"
    cust = duckdb.sql(
        f"SELECT c_nationkey, c_mktsegment FROM read_parquet('{sf}/customer.parquet')"
    ).df()
    orders = duckdb.sql(
        f"SELECT o_custkey, o_orderpriority FROM read_parquet('{sf}/orders.parquet')"
    ).df()

    def audit(df, det, dep):
        nd = df.groupby(det)[dep].nunique()
        return (len(nd), int((nd > 1).sum()), int(nd.max()))

    orders["bucket"] = orders["o_custkey"] % 5
    expect = {
        "o_custkey->custkey_bucket": audit(orders, "o_custkey", "bucket"),
        "c_nationkey->c_mktsegment": audit(cust, "c_nationkey", "c_mktsegment"),
        "o_custkey->o_orderpriority": audit(
            orders, "o_custkey", "o_orderpriority"
        ),
    }
    rows = dq6_functional_dependency_audit(spark, sf).collect()
    assert len(rows) == 3
    for r in rows:
        n_keys, n_viol, max_nd = expect[r.fd]
        assert (r.n_keys, r.n_violating_keys, r.max_distinct_dependents) == (
            n_keys, n_viol, max_nd
        ), r.fd
        assert r.holds == (n_viol == 0)
    by = {r.fd: r for r in rows}
    assert by["o_custkey->custkey_bucket"].holds
    # multi-row groups: more orders than distinct customers
    assert len(orders) > by["o_custkey->custkey_bucket"].n_keys
    assert not by["c_nationkey->c_mktsegment"].holds
    assert not by["o_custkey->o_orderpriority"].holds


def test_dq7_benford_brute_force(spark):
    """dq7 parity against a from-scratch Python first-digit count at
    sf0.001: exact counts, the literal Benford probabilities, and the
    chi-square terms."""
    import math

    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.quality import (
        dq7_benford_audit,
    )

    sf = "/root/testdata/sf0.001"
    expected: dict[tuple[str, int], int] = {}
    totals: dict[str, int] = {}
    for table, col in (("orders", "o_totalprice"), ("lineitem", "l_extendedprice")):
        vals = duckdb.sql(
            f"SELECT {col} FROM read_parquet('{sf}/{table}.parquet')"
        ).fetchall()
        for (v,) in vals:
            d = int(str(int(round(v * 100)))[0])
            expected[(col, d)] = expected.get((col, d), 0) + 1
            totals[col] = totals.get(col, 0) + 1
    rows = dq7_benford_audit(spark, sf).collect()
    assert len(rows) == len(expected)
    for r in rows:
        n = expected[(r.measure, r.digit)]
        assert r.n_obs == n, (r.measure, r.digit)
        assert r.n_total == totals[r.measure]
        p = math.log10(1 + 1 / r.digit)
        assert abs(r.benford_p - p) < 1e-15
        exp_n = r.n_total * p
        assert abs(r.chi2_term - round((n - exp_n) ** 2 / exp_n, 6)) < 1e-5


def test_dq8_reconciliation_boundary(spark):
    """dq8 classification on a planted fixture covering all three
    classes: exact match, off-by-one-cent (inside tolerance),
    off-by-two-cents (mismatch), and an orphan header."""
    from realtime_financial_transactions_data_pipeline_spark.operators import quality
    from realtime_financial_transactions_data_pipeline_spark.operators.quality import (
        dq8_order_reconciliation,
    )
    import realtime_financial_transactions_data_pipeline_spark.tables as tables

    orders = spark.createDataFrame(
        [
            (1, "O", 100.00),  # exact
            (2, "O", 100.01),  # +1 cent -> reconciled (tolerance)
            (3, "O", 100.02),  # +2 cents -> mismatch
            (4, "O", 50.00),   # orphan: no lines
        ],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    # two lines of 50 with zero tax/discount -> 100.00 recomputed
    lines = spark.createDataFrame(
        [(k, 50.0, 0.0, 0.0) for k in (1, 2, 3) for _ in range(2)],
        "l_orderkey long, l_extendedprice double, l_tax double,"
        " l_discount double",
    )
    real_load = tables.load_table
    fake = {"orders": orders, "lineitem": lines}

    def load(spark_, sf_dir, name):
        return fake.get(name) or real_load(spark_, sf_dir, name)

    orig = quality.load_table
    quality.load_table = load
    try:
        (r,) = dq8_order_reconciliation(spark, "ignored").collect()
    finally:
        quality.load_table = orig
    assert r.n_orders == 4 and r.n_with_lines == 3
    assert r.n_orphan_headers == 1
    assert r.n_reconciled == 2  # exact + 1-cent
    assert r.n_mismatched == 1  # 2-cent
    assert r.max_abs_diff_micros == 20_000


def test_dq9_observation_matches_recompute(spark):
    """The Observation API's counters on a crafted frame equal exact
    recomputation — including the negative-count edge and zero-row
    robustness of the divergence guard."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, -2.0), (2, 3.5), (1, 0.0)], "user_id long, value double"
    )
    obs = Observation("t")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("value") < 0, 1)).alias("neg"),
        F.sum(F.round(F.col("value") * 1000, 0).cast("long")).alias("vm"),
    )
    observed.write.mode("overwrite").format("noop").save()
    got = obs.get
    assert got["n"] == 3 and got["neg"] == 1 and got["vm"] == 1500


def test_dq11_ks_matches_scipyless_reference_and_plan(spark):
    """The distributed two-phase ECDF equals a pure-Python KS on the
    same slices at sf0.001 (including tie handling via the pooled
    right-continuous ECDF), and the plan has no SinglePartition —
    the whole point of the two-phase form."""
    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.quality import (
        _DQ11_C_ALPHA,
        dq11_ks_drift,
    )
    from realtime_financial_transactions_data_pipeline_spark.plans import inspect

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"""SELECT CAST(round(o_totalprice * 100) AS BIGINT) v,
                   CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 2 END s
            FROM read_parquet('{sf}/orders.parquet')
            WHERE year(o_orderdate) IN (1996, 1997)"""
    ).fetchall()
    s1 = sorted(v for v, s in rows if s == 1)
    s2 = sorted(v for v, s in rows if s == 2)
    n1, n2 = len(s1), len(s2)
    xs = sorted(set(s1) | set(s2))
    import bisect

    d = max(
        abs(
            bisect.bisect_right(s1, x) / n1
            - bisect.bisect_right(s2, x) / n2
        )
        for x in xs
    )
    df = dq11_ks_drift(spark, sf)
    r = df.collect()[0]
    assert (r.n1, r.n2) == (n1, n2)
    assert abs(r.ks_d - round(d, 4)) < 1e-9
    crit = _DQ11_C_ALPHA * ((n1 + n2) / (n1 * n2)) ** 0.5
    assert r.drift_flag == (1 if d > crit else 0)
    # The ECDF window must run per range-partition (hashpartitioning
    # on _pid), never over one global sort. The only SinglePartition
    # allowed is the final 1-row max collapse, so assert the window's
    # exchange key rather than blanket-banning the string.
    plan = inspect.formatted_plan(df)
    assert "Window" in plan and "hashpartitioning(_pid" in plan
