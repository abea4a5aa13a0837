"""S8 schema-translator tests: reference-shaped BigQuery-JSON and Avro
schema documents must translate to the expected StructTypes, including
the Avro-union wire encoding. Cited from schemas.py docstrings."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from realtime_financial_transactions_data_pipeline_spark import schemas as sch


def test_bigquery_json_basic():
    st = sch.bigquery_json_to_struct(
        [
            {"name": "transaction_id", "type": "STRING", "mode": "REQUIRED"},
            {"name": "amount", "type": "FLOAT64", "mode": "REQUIRED"},
            {"name": "merchant_id", "type": "INT64"},
            {"name": "is_recurring", "type": "BOOLEAN", "mode": "NULLABLE"},
            {"name": "signup_date", "type": "DATE"},
        ]
    )
    assert st["transaction_id"].dataType == T.StringType()
    assert st["transaction_id"].nullable is False
    assert st["amount"].dataType == T.DoubleType()
    assert st["merchant_id"].dataType == T.LongType()
    assert st["merchant_id"].nullable is True
    assert st["signup_date"].dataType == T.DateType()


def test_bigquery_json_wrapped_and_string_forms():
    """pipeline.py:138-140 wraps bare lists in {"fields": ...}; both the
    wrapped dict and a JSON string must parse identically."""
    fields = [{"name": "a", "type": "STRING"}]
    assert (
        sch.bigquery_json_to_struct(fields)
        == sch.bigquery_json_to_struct({"fields": fields})
        == sch.bigquery_json_to_struct(json.dumps(fields))
    )


def test_bigquery_repeated_and_record():
    st = sch.bigquery_json_to_struct(
        [
            {"name": "tags", "type": "STRING", "mode": "REPEATED"},
            {
                "name": "addr",
                "type": "RECORD",
                "fields": [{"name": "city", "type": "STRING"}],
            },
        ]
    )
    assert st["tags"].dataType == T.ArrayType(T.StringType())
    assert isinstance(st["addr"].dataType, T.StructType)


def test_avro_record_with_unions():
    st = sch.avro_to_struct(sch.RAW_TXN_AVRO)
    assert st["transaction_id"].dataType == T.StringType()
    assert st["transaction_id"].nullable is False
    assert st["merchant_id"].dataType == T.IntegerType()
    assert st["card_number"].dataType == T.StringType()
    assert st["card_number"].nullable is True
    assert st["risk_score"].dataType == T.DoubleType()


def test_avro_logical_date():
    st = sch.avro_to_struct(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "d", "type": {"type": "string", "logicalType": "date"}},
            ],
        }
    )
    assert st["d"].dataType == T.DateType()


def test_avro_rejects_non_record():
    with pytest.raises(ValueError):
        sch.avro_to_struct({"type": "enum", "name": "x", "symbols": ["A"]})


def test_wire_struct_wraps_unions_only():
    wire = sch.avro_union_wire_struct(sch.RAW_TXN_AVRO)
    # non-union fields stay flat
    assert wire["transaction_id"].dataType == T.StringType()
    # union fields become single-branch wrapper structs
    cn = wire["card_number"].dataType
    assert isinstance(cn, T.StructType) and cn.fieldNames() == ["string"]
    pg = wire["payment_gateway_id"].dataType
    assert isinstance(pg, T.StructType) and pg.fieldNames() == ["int"]


def test_unwrap_round_trip(spark):
    """JSON wire messages with {"string"/"int": v} wrappers unwrap to the
    flat values; explicit null and absent both land as SQL null
    (pipeline.py:101-104 treats them identically)."""
    from pyspark.sql import functions as F

    from realtime_financial_transactions_data_pipeline_spark.streaming.pipeline import (
        parse_stream,
    )

    msgs = [
        '{"transaction_id": "t1", "customer_id": 1, "account_id": 10, "merchant_id": 2,'
        ' "merchant_category_code_id": 3, "is_recurring": false,'
        ' "transaction_datetime": "2024-01-01T00:00:00", "amount": 1.0, "tax_amount": 0.1,'
        ' "discount_amount": 0.0, "total_amount": 1.1, "transaction_channel": "POS",'
        ' "card_number": {"string": "4000123412341234"}, "card_bin": null,'
        ' "card_provider": {"string": "VISA"}, "cardholder_name": null,'
        ' "card_expiry_date": null, "payment_gateway_id": {"int": 7},'
        ' "device_type_id": null, "ip_address": null, "risk_score": 0.5}',
        # card_number absent entirely
        '{"transaction_id": "t2", "customer_id": 2, "account_id": 20, "merchant_id": 2,'
        ' "merchant_category_code_id": 3, "is_recurring": true,'
        ' "transaction_datetime": "2024-01-02T00:00:00", "amount": 2.0, "tax_amount": 0.2,'
        ' "discount_amount": 0.0, "total_amount": 2.2, "transaction_channel": "UPI",'
        ' "risk_score": 0.7}',
    ]
    raw = spark.createDataFrame([(m,) for m in msgs], ["value"])
    out = {r.transaction_id: r for r in parse_stream(raw).collect()}
    assert out["t1"].card_number == "4000123412341234"
    assert out["t1"].payment_gateway_id == 7
    assert out["t1"].card_bin is None
    assert out["t2"].card_number is None
    assert out["t2"].payment_gateway_id is None
    assert out["t1"]._raw == msgs[0]


def test_fact_schema_has_no_pan_column():
    """P2 — card_number must never appear in the sink schema."""
    assert "card_number" not in sch.FACT_TRANSACTIONS.fieldNames()
    assert "masked_card_number" in sch.FACT_TRANSACTIONS.fieldNames()
