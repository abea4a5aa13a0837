"""Schema system: declared, externally loaded, never inferred (SURVEY §1.3).

The reference maintains two schema dialects per entity and loads them at
runtime rather than inferring:

- BigQuery JSON schemas (``*_bigquery.json``: list of
  ``{"name","type","mode"}`` dicts, optionally wrapped in ``{"fields": …}``
  — wrapping behavior mirrors ``dataflow_pipeline/pipeline.py:135-141``).
- Avro schemas (``*.avsc``: record with fields whose types may be
  primitive names, ``{"type": …, "logicalType": …}`` dicts, or nullable
  unions ``["null", T]`` — per ``fact_transactions_pub-sub.avsc``).

This module translates both dialects into ``StructType`` (operator S8),
plus ships the concrete star-schema StructTypes from FIXTURES.md so the
engine can create/enforce them without any file I/O.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# BigQuery-JSON dialect  (reference: update_dim_tables_cloud_function/main.py:50-58)
# ---------------------------------------------------------------------------

_BQ_TYPE_MAP: dict[str, T.DataType] = {
    "STRING": T.StringType(),
    "INT64": T.LongType(),
    "INTEGER": T.LongType(),
    "FLOAT64": T.DoubleType(),
    "FLOAT": T.DoubleType(),
    "NUMERIC": T.DecimalType(38, 9),
    "BOOLEAN": T.BooleanType(),
    "BOOL": T.BooleanType(),
    "DATE": T.DateType(),
    "DATETIME": T.TimestampNTZType(),
    "TIMESTAMP": T.TimestampType(),
    "BYTES": T.BinaryType(),
    "TIME": T.StringType(),
}


def bigquery_json_to_struct(schema: list | dict | str) -> T.StructType:
    """BigQuery JSON table schema -> StructType.

    Accepts a parsed list of field dicts, a ``{"fields": [...]}`` wrapper
    (bare lists are wrapped, mirroring pipeline.py:138-140), or a JSON
    string of either.
    """
    if isinstance(schema, str):
        schema = json.loads(schema)
    if isinstance(schema, list):
        schema = {"fields": schema}
    fields = []
    for f in schema["fields"]:
        bq_type = f["type"].upper()
        mode = f.get("mode", "NULLABLE").upper()
        if bq_type == "RECORD":
            dtype: T.DataType = bigquery_json_to_struct(f["fields"])
        else:
            dtype = _BQ_TYPE_MAP[bq_type]
        if mode == "REPEATED":
            dtype = T.ArrayType(dtype)
        fields.append(T.StructField(f["name"], dtype, nullable=(mode != "REQUIRED")))
    return T.StructType(fields)


# ---------------------------------------------------------------------------
# Avro dialect  (reference: fact_table_ingestion/schemas/*.avsc)
# ---------------------------------------------------------------------------

_AVRO_PRIMITIVES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "long": T.LongType(),
    "int": T.IntegerType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "bytes": T.BinaryType(),
    "null": T.NullType(),
}


def _avro_type_to_spark(t: Any) -> tuple[T.DataType, bool]:
    """Return (dtype, nullable) for an Avro type node."""
    if isinstance(t, str):
        return _AVRO_PRIMITIVES[t], False
    if isinstance(t, list):  # union — nullable iff "null" is a member
        non_null = [x for x in t if x != "null"]
        nullable = len(non_null) != len(t)
        if len(non_null) != 1:
            raise ValueError(f"unsupported non-trivial Avro union: {t}")
        dtype, _ = _avro_type_to_spark(non_null[0])
        return dtype, nullable
    if isinstance(t, dict):
        logical = t.get("logicalType")
        base = t["type"]
        if logical == "date":
            return T.DateType(), False
        if logical in ("timestamp-millis", "timestamp-micros"):
            return T.TimestampType(), False
        if base == "record":
            fields = []
            for f in t["fields"]:
                dtype, nullable = _avro_type_to_spark(f["type"])
                fields.append(T.StructField(f["name"], dtype, nullable))
            return T.StructType(fields), False
        if base == "array":
            item, _ = _avro_type_to_spark(t["items"])
            return T.ArrayType(item), False
        if base == "map":
            val, _ = _avro_type_to_spark(t["values"])
            return T.MapType(T.StringType(), val), False
        return _avro_type_to_spark(base)
    raise ValueError(f"unsupported Avro type node: {t!r}")


def avro_to_struct(schema: dict | str) -> T.StructType:
    """Avro record schema -> StructType (nullable via ["null", T] unions)."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    if schema.get("type") != "record":
        raise ValueError("top-level Avro schema must be a record")
    dtype, _ = _avro_type_to_spark(schema)
    return dtype  # type: ignore[return-value]


def avro_union_wire_struct(schema: dict | str) -> T.StructType:
    """StructType matching the Avro-union JSON *wire* encoding.

    Pub/Sub's Avro-JSON encoding wraps nullable values in single-key
    objects ``{"string": v}`` / ``{"int": v}`` / ``{"float": v}``
    (producer: generate_fact_transactions_data.py:215-220; consumer
    unwrap: pipeline.py:57-69). For those fields the wire schema is a
    one-level struct with one field per possible branch type;
    ``streaming.pipeline.unwrap_avro_union`` coalesces them.
    """
    if isinstance(schema, str):
        schema = json.loads(schema)
    fields = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list) and "null" in t:
            branches = [x for x in t if x != "null"]
            wrapper = T.StructType(
                [
                    T.StructField(b if isinstance(b, str) else b.get("type", "string"),
                                  _avro_type_to_spark(b)[0], True)
                    for b in branches
                ]
            )
            fields.append(T.StructField(f["name"], wrapper, True))
        else:
            dtype, nullable = _avro_type_to_spark(t)
            fields.append(T.StructField(f["name"], dtype, nullable))
    return T.StructType(fields)


# ---------------------------------------------------------------------------
# Concrete star-schema StructTypes (FIXTURES.md §A; reference schema files)
# ---------------------------------------------------------------------------

#: fact_transactions_bigquery.json:1-112 — 22 output columns in pipeline
#: order (pipeline.py:106-129). Money is DOUBLE (not decimal) and
#: transaction_datetime is an ISO-8601 STRING, both for reference fidelity.
FACT_TRANSACTIONS = bigquery_json_to_struct(
    [
        {"name": "transaction_id", "type": "STRING", "mode": "REQUIRED"},
        {"name": "customer_id", "type": "INT64", "mode": "REQUIRED"},
        {"name": "account_id", "type": "INT64", "mode": "REQUIRED"},
        {"name": "merchant_id", "type": "INT64", "mode": "REQUIRED"},
        {"name": "merchant_category_code_id", "type": "INT64", "mode": "REQUIRED"},
        {"name": "is_recurring", "type": "BOOLEAN", "mode": "REQUIRED"},
        {"name": "transaction_datetime", "type": "STRING", "mode": "REQUIRED"},
        {"name": "amount", "type": "FLOAT64", "mode": "REQUIRED"},
        {"name": "tax_amount", "type": "FLOAT64", "mode": "REQUIRED"},
        {"name": "discount_amount", "type": "FLOAT64", "mode": "REQUIRED"},
        {"name": "total_amount", "type": "FLOAT64", "mode": "REQUIRED"},
        {"name": "transaction_channel", "type": "STRING", "mode": "REQUIRED"},
        {"name": "masked_card_number", "type": "STRING", "mode": "NULLABLE"},
        {"name": "card_token", "type": "STRING", "mode": "NULLABLE"},
        {"name": "card_bin", "type": "STRING", "mode": "NULLABLE"},
        {"name": "card_provider", "type": "STRING", "mode": "NULLABLE"},
        {"name": "cardholder_name", "type": "STRING", "mode": "NULLABLE"},
        {"name": "card_expiry_date", "type": "STRING", "mode": "NULLABLE"},
        {"name": "payment_gateway_id", "type": "INT64", "mode": "NULLABLE"},
        {"name": "device_type_id", "type": "INT64", "mode": "NULLABLE"},
        {"name": "ip_address", "type": "STRING", "mode": "NULLABLE"},
        {"name": "risk_score", "type": "FLOAT64", "mode": "REQUIRED"},
    ]
)

#: Dead-letter schema, inline in pipeline.py:190-197.
FACT_TRANSACTIONS_ERRORS = bigquery_json_to_struct(
    [
        {"name": "transaction_id", "type": "STRING"},
        {"name": "timestamp", "type": "STRING"},
        {"name": "raw_message", "type": "STRING"},
        {"name": "error", "type": "STRING"},
    ]
)

#: dim_customer_bigquery.json:1-59
DIM_CUSTOMER = bigquery_json_to_struct(
    [
        {"name": "customer_id", "type": "INT64", "mode": "REQUIRED"},
        {"name": "first_name", "type": "STRING"},
        {"name": "last_name", "type": "STRING"},
        {"name": "email", "type": "STRING"},
        {"name": "phone", "type": "STRING"},
        {"name": "date_of_birth", "type": "DATE"},
        {"name": "signup_date_id", "type": "INT64"},
        {"name": "customer_status", "type": "STRING"},
        {"name": "customer_segment", "type": "STRING"},
        {"name": "address_line_1", "type": "STRING"},
        {"name": "address_line_2", "type": "STRING"},
        {"name": "city", "type": "STRING"},
        {"name": "state", "type": "STRING"},
        {"name": "pincode", "type": "STRING"},
    ]
)

#: dim_account_bigquery.json:1-38
DIM_ACCOUNT = bigquery_json_to_struct(
    [
        {"name": "account_id", "type": "INT64", "mode": "REQUIRED"},
        {"name": "customer_id", "type": "INT64", "mode": "REQUIRED"},
        {"name": "account_type", "type": "STRING"},
        {"name": "open_date_id", "type": "INT64"},
        {"name": "close_date_id", "type": "INT64"},
        {"name": "account_status", "type": "STRING"},
    ]
)

#: other_tables_schemas/*.json static dims
DIM_MERCHANTS = bigquery_json_to_struct(
    [
        {"name": "merchant_id", "type": "INT64", "mode": "REQUIRED"},
        {"name": "name", "type": "STRING"},
    ]
)
DIM_MCC_CODES = bigquery_json_to_struct(
    [
        {"name": "merchant_category_id", "type": "INT64", "mode": "REQUIRED"},
        {"name": "mcc_description", "type": "STRING"},
        {"name": "is_recurring", "type": "BOOLEAN"},
    ]
)
DIM_PAYMENT_GATEWAY = bigquery_json_to_struct(
    [
        {"name": "payment_gateway_id", "type": "INT64", "mode": "REQUIRED"},
        {"name": "payment_gateway_name", "type": "STRING"},
    ]
)
DIM_DEVICE_TYPE = bigquery_json_to_struct(
    [
        {"name": "device_type_id", "type": "INT64", "mode": "REQUIRED"},
        {"name": "device_type_name", "type": "STRING"},
    ]
)

#: Raw wire-format message (pre-pipeline), FIXTURES.md "Streaming-input
#: fixture": nullable card fields arrive Avro-union-wrapped.
RAW_TXN_AVRO = {
    "type": "record",
    "name": "fact_transactions",
    "fields": [
        {"name": "transaction_id", "type": "string"},
        {"name": "customer_id", "type": "long"},
        {"name": "account_id", "type": "long"},
        {"name": "merchant_id", "type": "int"},
        {"name": "merchant_category_code_id", "type": "int"},
        {"name": "is_recurring", "type": "boolean"},
        {"name": "transaction_datetime", "type": "string"},
        {"name": "amount", "type": "double"},
        {"name": "tax_amount", "type": "double"},
        {"name": "discount_amount", "type": "double"},
        {"name": "total_amount", "type": "double"},
        {"name": "transaction_channel", "type": "string"},
        {"name": "card_number", "type": ["null", "string"], "default": None},
        {"name": "card_bin", "type": ["null", "string"], "default": None},
        {"name": "card_provider", "type": ["null", "string"], "default": None},
        {"name": "cardholder_name", "type": ["null", "string"], "default": None},
        {"name": "card_expiry_date", "type": ["null", "string"], "default": None},
        {"name": "payment_gateway_id", "type": ["null", "int"], "default": None},
        {"name": "device_type_id", "type": ["null", "int"], "default": None},
        {"name": "ip_address", "type": ["null", "string"], "default": None},
        {"name": "risk_score", "type": "double"},
    ],
}
