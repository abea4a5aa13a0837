"""Curation-pipeline semantics on planted documents: the exact dup, the
low-quality doc, and the near-dup must each be dropped by their stage;
the clean survivors must pass through untouched."""

from __future__ import annotations

from realtime_financial_transactions_data_pipeline_spark.operators import curation

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden trees "
    "as morning light spreads slowly across the quiet village square"
)


def _docs(spark):
    rows = [
        (1, "en", BASE),                                   # canonical survivor
        (2, "en", BASE),                                   # exact dup of 1 -> dropped (stage 1)
        (3, "en", BASE.replace("lazy", "sleepy")),         # near-dup of 1 -> dropped (stage 3)
        (4, "en", "!!!???...;;;:::!!!???...;;;:::"),       # all punctuation -> dropped (stage 2)
        (5, "en", "completely different text about ships " * 8 + "sailing the winter sea"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


def test_each_stage_drops_its_target(spark):
    survivors = {r.doc_id for r in curation.curate(_docs(spark)).collect()}
    assert survivors == {1, 5}


def test_exact_dedup_keeps_lowest_id(spark):
    kept = {r.doc_id for r in curation.exact_dedup_keep_first(_docs(spark)).collect()}
    assert 1 in kept and 2 not in kept
    assert {3, 4, 5} <= kept  # non-identical docs untouched


def test_near_dup_drop_keeps_canonical(spark):
    docs = _docs(spark).filter("doc_id in (1, 3, 5)")
    kept = {r.doc_id for r in curation.drop_near_duplicates(docs).collect()}
    assert kept == {1, 5}
