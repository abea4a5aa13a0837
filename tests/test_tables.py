"""Testdata-drift guards: the driver regenerates /root/testdata between
rounds and has already changed physical schemas once (events.ts went
TIMESTAMP(NANOS) → TIMESTAMP(MICROS) in round 4, breaking 8 probes).
These tests pin the loader contract — every table loads, and the
normalized events shape is stable regardless of the file's physical
timestamp type — so drift surfaces as a named unit-test failure instead
of 8 opaque correctness-harness errors."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from realtime_financial_transactions_data_pipeline_spark.tables import (
    TABLE_NAMES,
    load_table,
)


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_every_table_loads(spark, sf_dir, name):
    df = load_table(spark, sf_dir, name)
    assert len(df.columns) > 0
    df.limit(1).collect()  # force a real scan, not just footer metadata


#: Pinned physical Arrow schemas for every testdata table (VERDICT r05
#: #2): the round-4 testdata regeneration silently changed events.ts
#: from TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and cost 8 driver probes.
#: Columns whose physical type is allowed to vary across known
#: driver generations list every accepted spelling.
_EXPECTED_ARROW = {
    "region": {"r_regionkey": {"int32"}, "r_name": {"string", "large_string"}},
    "nation": {
        "n_nationkey": {"int32"},
        "n_name": {"string", "large_string"},
        "n_regionkey": {"int32"},
    },
    "customer": {
        "c_custkey": {"int64"},
        "c_name": {"string", "large_string"},
        "c_nationkey": {"int32"},
        "c_acctbal": {"double"},
        "c_mktsegment": {"string", "large_string"},
    },
    "supplier": {
        "s_suppkey": {"int64"},
        "s_name": {"string", "large_string"},
        "s_nationkey": {"int32"},
        "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": {"int64"},
        "p_name": {"string", "large_string"},
        "p_brand": {"string", "large_string"},
        "p_type": {"string", "large_string"},
        "p_size": {"int32"},
        "p_retailprice": {"double"},
    },
    "orders": {
        "o_orderkey": {"int64"},
        "o_custkey": {"int64"},
        "o_orderstatus": {"string", "large_string"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp[us]", "timestamp[ns]"},
        "o_orderpriority": {"string", "large_string"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_partkey": {"int64"},
        "l_suppkey": {"int64"},
        "l_linenumber": {"int32"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string", "large_string"},
        "l_linestatus": {"string", "large_string"},
        "l_shipdate": {"timestamp[us]", "timestamp[ns]"},
    },
    "events": {
        "event_id": {"int64"},
        # Both generations observed so far; tables._load_events
        # normalizes either to a μs ts + bigint ts_ns.
        "ts": {"timestamp[us]", "timestamp[ns]"},
        "user_id": {"int64"},
        "event_type": {"string", "large_string"},
        "value": {"double"},
        "props": {"string", "large_string"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string", "large_string"},
        "lang": {"string", "large_string"},
        "source": {"string", "large_string"},
        "n_chars": {"int64"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {"list<element: float>", "list<item: float>"},
        "label": {"int32"},
    },
}


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_physical_arrow_schema_pinned(sf_dir, name):
    """Drift in ANY column's physical parquet type fails here, by table
    name, before it can error out half the driver's probe window."""
    import pyarrow.parquet as pq

    actual = {
        f.name: str(f.type)
        for f in pq.read_schema(f"{sf_dir}/{name}.parquet")
    }
    expected = _EXPECTED_ARROW[name]
    assert set(actual) == set(expected), (
        f"{name}: column set drifted: {sorted(actual)} != {sorted(expected)}"
    )
    for col, accepted in expected.items():
        assert actual[col] in accepted, (
            f"{name}.{col}: physical type {actual[col]!r} not in the "
            f"accepted set {sorted(accepted)} — the driver regenerated "
            "testdata with a new schema; re-check every loader and probe "
            "that reads this column (see tables.py normalization)"
        )


def test_events_normalized_shape(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    s = {f.name: f.dataType for f in e.schema.fields}
    assert isinstance(s["ts"], T.TimestampType)
    assert isinstance(s["ts_ns"], T.LongType)
    # Valid under BOTH physical schemas: ts is always the microsecond
    # truncation of ts_ns (exact micros when the file stores micros).
    row = e.selectExpr(
        "min(ts = timestamp_micros(ts_ns div 1000)) as ns_consistent"
    ).collect()[0]
    assert row.ns_consistent is True
