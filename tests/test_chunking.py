"""Chunking (x14) and chunk-granularity dedup (x15) semantics tests:
window/stride coverage math, short-final-window behavior, overlap
content, exact reconstruction, and first-occurrence-wins dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_financial_transactions_data_pipeline_spark.operators.chunking import (
    chunk_documents,
    dedup_chunks_rebuild,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _text(words):
    return " ".join(words)


def test_chunk_count_and_coverage(spark):
    """10 tokens, window 4, stride 3 -> chunks at offsets 0,3,6 cover
    tokens 0..9; ceil((10-4)/3)+1 = 3 chunks, last is full here."""
    words = [f"w{i}" for i in range(10)]
    d = _docs(spark, [(1, _text(words))])
    out = (
        chunk_documents(d, window=4, stride=3)
        .orderBy("chunk_id")
        .collect()
    )
    assert [(r.chunk_id, r.chunk_text, r.n_tokens) for r in out] == [
        (0, "w0 w1 w2 w3", 4),
        (1, "w3 w4 w5 w6", 4),
        (2, "w6 w7 w8 w9", 4),
    ]


def test_final_window_short_not_padded(spark):
    """9 tokens, window 4, stride 4: final chunk holds the 1 leftover
    token."""
    words = [f"w{i}" for i in range(9)]
    d = _docs(spark, [(1, _text(words))])
    out = chunk_documents(d, window=4, stride=4).orderBy("chunk_id").collect()
    assert [r.n_tokens for r in out] == [4, 4, 1]
    assert out[-1].chunk_text == "w8"


def test_short_doc_single_chunk(spark):
    d = _docs(spark, [(1, "a b"), (2, "")])
    out = {
        r.doc_id: (r.chunk_id, r.chunk_text)
        for r in chunk_documents(d, window=4, stride=3).collect()
    }
    assert out[1] == (0, "a b")
    # Empty text still yields one (empty) chunk — split('') == [''].
    assert out[2] == (0, "")


def test_dedup_rebuild_keeps_first_occurrence(spark):
    """Two docs share a 2-token span; the later doc loses it and
    rebuilds without it."""
    d = _docs(spark, [(1, "a b c d"), (2, "a b x y")])
    out = {
        r.doc_id: (r.kept_text, r.n_chunks_total, r.n_chunks_kept)
        for r in dedup_chunks_rebuild(d, window=2).collect()
    }
    assert out[1] == ("a b c d", 2, 2)
    assert out[2] == ("x y", 2, 1)


def test_dedup_rebuild_total_loss_yields_empty(spark):
    d = _docs(spark, [(1, "a b"), (2, "a b")])
    out = {
        r.doc_id: (r.kept_text, r.n_chunks_kept)
        for r in dedup_chunks_rebuild(d, window=2).collect()
    }
    assert out[1] == ("a b", 1)
    assert out[2] == ("", 0)


def test_dedup_rebuild_order_preserved(spark):
    """Surviving chunks re-join in original chunk order even when the
    duplicate is in the middle."""
    d = _docs(spark, [(1, "d u p q"), (2, "a b d u p q e f")])
    out = {
        r.doc_id: r.kept_text
        for r in dedup_chunks_rebuild(d, window=2).collect()
    }
    assert out[1] == "d u p q"
    assert out[2] == "a b e f"


def test_chunking_plan_is_python_free(spark):
    """The chunk fan-out is all JVM array lambdas — no Python eval in
    the plan."""
    d = _docs(spark, [(1, "a b c")])
    plan = chunk_documents(d)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_x21_content_defined_chunks_are_shift_robust(spark, monkeypatch):
    """THE property content-defined chunking exists for: prepending one
    word re-chunks only the prefix before the first surviving boundary
    — every later chunk digest is unchanged — whereas x14-style fixed
    windows shift EVERY chunk. Verified on a 400-word deterministic
    doc: the original and shifted chunk-digest multisets must share all
    but a handful of leading chunks."""
    from realtime_financial_transactions_data_pipeline_spark.operators import chunking

    words = ["w%02d" % (i * 7919 % 97) for i in range(400)]
    base = " ".join(words)
    shifted = "zzz " + base
    docs = spark.createDataFrame(
        [(1, base), (2, shifted)], ["doc_id", "text"]
    )
    monkeypatch.setattr(chunking, "load_table", lambda s, d, t: docs)
    rows = chunking.x21_content_defined_chunking(spark, "unused").collect()
    by_doc = {1: [], 2: []}
    for r in rows:
        by_doc[r.doc_id].append((r.chunk_id, r.n_words, r.chunk_digest))
    for v in by_doc.values():
        v.sort()
    d1 = [c[2] for c in by_doc[1]]
    d2 = [c[2] for c in by_doc[2]]
    # All chunks after the first boundary must realign: the tail of the
    # shifted doc's digest list equals the tail of the original's.
    n_common = 0
    while n_common < min(len(d1), len(d2)) and d1[-1 - n_common] == d2[-1 - n_common]:
        n_common += 1
    assert n_common >= len(d1) - 2, (len(d1), len(d2), n_common)
    # Word conservation: chunks partition each doc exactly.
    assert sum(c[1] for c in by_doc[1]) == 400
    assert sum(c[1] for c in by_doc[2]) == 401
    # And the boundary rule actually fires (more than one chunk).
    assert len(d1) > 5
