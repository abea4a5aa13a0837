"""Scalar column-function library (SURVEY §2.4, F1-F15).

All JVM-side built-ins — no Python in the hot path. Each helper returns a
Column so it composes inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Day-offset surrogate-key epoch (generate_fact_transactions_data.py:35).
BASE_DATE = "2023-01-01"
#: PAN validity bounds (pipeline.py:78).
PAN_MIN_LEN, PAN_MAX_LEN = 13, 19
#: Dashboard high-risk threshold = generator band boundary
#: (generate_fact_transactions_data.py:196-199; README.md:87).
HIGH_RISK_THRESHOLD = 0.6


def mask_pan(pan: Column) -> Column:
    """First-6 + six stars + last-4 (pipeline.py:89-90). Null-safe: null
    PAN yields null mask (pipeline.py:101-104)."""
    return F.concat(F.substring(pan, 1, 6), F.lit("******"), F.substring(pan, -4, 4))


def pan_is_valid(pan: Column) -> Column:
    """Length-domain validation (pipeline.py:76-78): present and 13..19."""
    return pan.isNotNull() & F.length(pan).between(PAN_MIN_LEN, PAN_MAX_LEN)


def card_bin(pan: Column) -> Column:
    """First 6 digits (generate_fact_transactions_data.py:153)."""
    return F.substring(pan, 1, 6)


def date_from_id(date_id: Column) -> Column:
    """Surrogate date key → date: BASE_DATE + id days
    (generate_fact_transactions_data.py:66-67)."""
    return F.date_add(F.lit(BASE_DATE).cast("date"), date_id.cast("int"))


def id_from_date(d: Column) -> Column:
    """date → surrogate key: days since BASE_DATE
    (generate_dim_cust_data.py:82)."""
    return F.datediff(d.cast("date"), F.lit(BASE_DATE).cast("date"))


def period_am_pm(ts: Column) -> Column:
    """time_dim 'period' attribute (README.md:49)."""
    return F.when(F.hour(ts) < 12, "AM").otherwise("PM")


def is_high_risk(risk: Column) -> Column:
    return risk >= HIGH_RISK_THRESHOLD


def total_amount(amount: Column, tax: Column, discount: Column) -> Column:
    """total = amount + tax − discount, 2 dp
    (generate_fact_transactions_data.py:143)."""
    return F.round(amount + tax - discount, 2)
