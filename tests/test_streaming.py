"""Streaming pipeline tests (S1-S4, P4, K1/K2, T1/T6, J3): routing
semantics, idempotent dual-sink replay, and the refreshed lookup
actually refreshing between micro-batches."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from realtime_financial_transactions_data_pipeline_spark.functions.fpe import TEST_KEY
from realtime_financial_transactions_data_pipeline_spark.streaming import pipeline as sp

ROOT = "/tmp/spark_graft_tests/streaming"


def _msg(txn_id: str, pan: str | None) -> str:
    wrapped = f'{{"string": "{pan}"}}' if pan is not None else "null"
    return (
        f'{{"transaction_id": "{txn_id}", "customer_id": 1, "account_id": 10,'
        f' "merchant_id": 2, "merchant_category_code_id": 3, "is_recurring": false,'
        f' "transaction_datetime": "2024-01-01T00:00:00", "amount": 1.0,'
        f' "tax_amount": 0.1, "discount_amount": 0.0, "total_amount": 1.1,'
        f' "transaction_channel": "POS", "card_number": {wrapped}, "card_bin": null,'
        f' "card_provider": null, "cardholder_name": null, "card_expiry_date": null,'
        f' "payment_gateway_id": null, "device_type_id": null, "ip_address": null,'
        f' "risk_score": 0.5}}'
    )


@pytest.fixture()
def fresh_root(request):
    path = f"{ROOT}/{request.node.name}"
    shutil.rmtree(path, ignore_errors=True)
    return path


def test_routing_semantics(spark, fresh_root):
    """Valid PAN → tokenized row; null PAN → valid row with null card
    columns (pipeline.py:101-104); bad-length PAN → dead-letter with the
    raw message preserved (pipeline.py:76-87)."""
    msgs = [
        _msg("ok", "4000123412341234"),
        _msg("nopan", None),
        _msg("short", "4111"),  # 4 digits: present but invalid
    ]
    spark.createDataFrame([(m,) for m in msgs], ["value"]).coalesce(1).write.mode(
        "overwrite"
    ).text(f"{fresh_root}/in")
    valid_dir, errors_dir = sp.run_pipeline(
        spark, f"{fresh_root}/in", f"{fresh_root}/out", key=TEST_KEY
    )
    valid = {r.transaction_id: r for r in spark.read.parquet(valid_dir).collect()}
    errors = spark.read.parquet(errors_dir).collect()

    assert set(valid) == {"ok", "nopan"}
    assert valid["ok"].card_token is not None and valid["ok"].card_token.isdigit()
    assert valid["ok"].masked_card_number == "400012******1234"
    assert valid["nopan"].card_token is None
    assert valid["nopan"].masked_card_number is None
    assert "card_number" not in spark.read.parquet(valid_dir).columns  # P2

    assert len(errors) == 1
    assert errors[0].transaction_id == "short"
    assert '"4111"' in errors[0].raw_message  # raw preserved for replay
    assert errors[0].error == "invalid card number length"


def test_dual_sink_epoch_idempotence(spark, fresh_root):
    """Re-running the identical input over a kept checkpoint must not
    duplicate sink rows (T1: per-epoch overwrite dirs + checkpoint)."""
    msgs = [_msg(f"t{i}", "4000123412341234") for i in range(10)]
    spark.createDataFrame([(m,) for m in msgs], ["value"]).coalesce(1).write.mode(
        "overwrite"
    ).text(f"{fresh_root}/in")
    valid_dir, _ = sp.run_pipeline(spark, f"{fresh_root}/in", f"{fresh_root}/out", key=TEST_KEY)
    first = spark.read.parquet(valid_dir).count()
    # second run: checkpoint remembers the files; no new epochs, no dupes
    valid_dir, _ = sp.run_pipeline(spark, f"{fresh_root}/in", f"{fresh_root}/out", key=TEST_KEY)
    assert spark.read.parquet(valid_dir).count() == first == 10


def test_j3_lookup_refreshes_between_batches(spark, fresh_root):
    """The static side is re-read each micro-batch: after updating the
    dimension between two runs, new output rows see the new attribute."""
    lookup_dir = f"{fresh_root}/dim"
    spark.createDataFrame([(1, "SEG_OLD")], ["customer_id", "segment"]).write.mode(
        "overwrite"
    ).parquet(lookup_dir)
    spark.createDataFrame([(_msg("a", None),)], ["value"]).coalesce(1).write.mode(
        "overwrite"
    ).text(f"{fresh_root}/in")
    valid_dir, _ = sp.run_pipeline(
        spark, f"{fresh_root}/in", f"{fresh_root}/out", lookup_dir=lookup_dir, key=TEST_KEY
    )
    assert spark.read.parquet(valid_dir).collect()[0].segment == "SEG_OLD"

    # dimension changes; a NEW file arrives; the next micro-batch joins fresh
    spark.createDataFrame([(1, "SEG_NEW")], ["customer_id", "segment"]).write.mode(
        "overwrite"
    ).parquet(lookup_dir)
    spark.createDataFrame([(_msg("b", None),)], ["value"]).coalesce(1).write.mode(
        "append"
    ).text(f"{fresh_root}/in")
    valid_dir, _ = sp.run_pipeline(
        spark, f"{fresh_root}/in", f"{fresh_root}/out", lookup_dir=lookup_dir, key=TEST_KEY
    )
    rows = {r.transaction_id: r.segment for r in spark.read.parquet(valid_dir).collect()}
    assert rows["a"] == "SEG_OLD"
    assert rows["b"] == "SEG_NEW"


def test_passthrough_stream_schema_enforced(spark, fresh_root):
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    spark.createDataFrame([(1, "a"), (2, "b")], schema).coalesce(1).write.mode(
        "overwrite"
    ).json(f"{fresh_root}/in")
    sp.run_passthrough_stream(
        spark, f"{fresh_root}/in", f"{fresh_root}/out", f"{fresh_root}/_cp", schema
    )
    out = spark.read.parquet(f"{fresh_root}/out")
    assert out.count() == 2
    assert out.schema == schema
