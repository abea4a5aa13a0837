"""Sketch accuracy tests (X5): HLL++ distinct and GK percentiles must
land within documented error bounds of their exact twins. Cited from
operators/sketches.py docstrings."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_financial_transactions_data_pipeline_spark.tables import load_table


def test_approx_count_distinct_within_bound(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    row = e.agg(
        F.approx_count_distinct("user_id").alias("approx"),
        F.countDistinct("user_id").alias("exact"),
    ).collect()[0]
    # default rsd = 5%; allow 3 sigma
    assert abs(row.approx - row.exact) <= max(0.15 * row.exact, 5)


def test_percentile_approx_within_tolerance(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    row = e.agg(
        F.percentile_approx("value", 0.5).alias("approx"),
        F.percentile("value", 0.5).alias("exact"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    ).collect()[0]
    span = row.hi - row.lo
    assert abs(row.approx - row.exact) <= 0.05 * span


def test_sketches_per_group_shapes(spark, sf_dir):
    from realtime_financial_transactions_data_pipeline_spark.operators.sketches import (
        x5_approx_sketches,
    )

    out = x5_approx_sketches(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    assert set(out.columns) == {"event_type", "approx_users", "p50_approx", "p90_approx"}
    assert all(r.approx_users > 0 for r in rows)


def test_portable_hll_accuracy(spark, sf_dir):
    """The 64-register portable HLL must land within a loose 3-sigma
    band of the exact distinct (sigma ~ 1.04/sqrt(64) ~ 13 %)."""
    from realtime_financial_transactions_data_pipeline_spark.operators.sketches import (
        x5d_hll_distinct,
    )

    r = x5d_hll_distinct(spark, sf_dir).collect()[0]
    assert r.exact_users > 0
    assert abs(r.hll_users - r.exact_users) / r.exact_users < 0.4


def test_x5e_countmin_one_sided_and_replay(spark, sf_dir):
    """x5e Count-Min: the estimate NEVER undercounts (the CM guarantee —
    min over rows of a sum that always includes the item's own mass),
    and every estimate matches a from-scratch Python sketch built from
    the same md5 bucket law over the same token stream."""
    import hashlib
    import re
    from collections import Counter

    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.sketches import (
        _X5E_D,
        _X5E_TOPK,
        _X5E_W,
        x5e_countmin_freq,
    )

    rows = x5e_countmin_freq(spark, sf_dir).collect()
    assert len(rows) == _X5E_TOPK
    assert all(r.overestimate >= 0 for r in rows)
    assert all(r.cm_est == r.true_freq + r.overestimate for r in rows)

    texts = duckdb.sql(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    freq = Counter()
    for (t,) in texts:
        freq.update(re.findall(r"[a-zA-Z0-9]+", t.lower()))

    def bucket(r: int, term: str) -> int:
        return (
            int(hashlib.md5(f"{r}-{term}".encode()).hexdigest()[:8], 16)
            % _X5E_W
        )

    cells = Counter()
    for term, f in freq.items():
        for r in range(_X5E_D):
            cells[(r, bucket(r, term))] += f
    for row in rows:
        assert freq[row.term] == row.true_freq, row.term
        est = min(cells[(r, bucket(r, row.term))] for r in range(_X5E_D))
        assert est == row.cm_est, row.term


def test_x5f_quantile_sketch_accuracy_and_merge(spark, sf_dir):
    """The log-histogram quantile sketch (r17): (a) every estimate
    lands within the 1/G relative-error bound of the numpy-exact
    discrete quantile; (b) the sketch is MERGEABLE — bucket counts
    built on two disjoint halves, summed, walk to the same estimates
    as one pass over the whole (the union-resum law that makes the
    sketch shard/day-combinable at 100 TB)."""
    import numpy as np

    from pyspark.sql import functions as F

    from realtime_financial_transactions_data_pipeline_spark.operators.sketches import (
        _X5F_G,
        _X5F_QS,
        quantile_histogram,
        x5f_quantile_histogram,
    )
    from realtime_financial_transactions_data_pipeline_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents")
    )
    vals = np.sort(np.array([r.cents for r in li.collect()], dtype=np.int64))
    ests = {
        r.q_permille: r.est_cents
        for r in x5f_quantile_histogram(spark, sf_dir).collect()
    }
    assert set(ests) == set(_X5F_QS)
    for q in _X5F_QS:
        r = -(-q * len(vals) // 1000)  # ceil
        exact = int(vals[r - 1])
        rel = abs(ests[q] - exact) / exact
        assert rel <= 1.0 / _X5F_G + 1e-12, (q, ests[q], exact, rel)

    # (b) mergeability: two half-sketches re-summed == one full sketch
    h1 = quantile_histogram(li.filter(F.col("cents") % 2 == 0), "cents")
    h2 = quantile_histogram(li.filter(F.col("cents") % 2 == 1), "cents")
    merged = sorted(
        (r.k, r.sub, r.cnt)
        for r in h1.unionByName(h2)
        .groupBy("k", "sub")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    whole = sorted((r.k, r.sub, r.cnt) for r in quantile_histogram(li, "cents").collect())
    assert merged == whole
