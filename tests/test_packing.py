"""Sequence-packing (X10) and repetition-metric (x3h) semantics tests:
boundary decisions of the greedy fold, shard isolation, mega-doc
clamping, and the bigram repetition math on hand-built documents."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_financial_transactions_data_pipeline_spark.operators.packing import (
    _SEQ_LEN,
    pack_sequences,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _text(n_tokens: int) -> str:
    return " ".join(["tok"] * n_tokens)


def test_greedy_boundary_respected(spark):
    """Docs of 100+100+100 tokens at seq_len 256: the third doc would
    overflow (300 > 256), so it starts sequence 1 — no doc crosses a
    boundary."""
    d = _docs(
        spark,
        [(1, "en", _text(100)), (2, "en", _text(100)), (3, "en", _text(100))],
    )
    out = pack_sequences(d).orderBy("seq_id").collect()
    assert [(r.seq_id, r.n_docs, r.seq_tokens) for r in out] == [
        (0, 2, 200),
        (1, 1, 100),
    ]


def test_exact_fit_shares_sequence(spark):
    d = _docs(spark, [(1, "en", _text(156)), (2, "en", _text(100))])
    out = pack_sequences(d).collect()
    assert len(out) == 1 and out[0].seq_tokens == _SEQ_LEN


def test_mega_doc_clamped_to_seq_len(spark):
    """A document longer than seq_len occupies one full sequence
    instead of wedging the fold."""
    d = _docs(spark, [(1, "en", _text(400)), (2, "en", _text(10))])
    out = pack_sequences(d).orderBy("seq_id").collect()
    assert [(r.seq_id, r.seq_tokens) for r in out] == [(0, _SEQ_LEN), (1, 10)]


def test_groups_pack_independently(spark):
    """Different languages never share a sequence."""
    d = _docs(spark, [(1, "en", _text(10)), (2, "fr", _text(10))])
    out = pack_sequences(d).collect()
    assert len(out) == 2
    assert {r.lang for r in out} == {"en", "fr"}


def test_shard_budget_bounds_group_size(spark):
    """With a small shard budget the same language splits into multiple
    (shard, seq) groups — the property that bounds per-executor state at
    corpus scale."""
    rows = [(i, "en", _text(100)) for i in range(10)]
    out = pack_sequences(_docs(spark, rows), shard_budget=300).collect()
    assert {r.shard_id for r in out} == {0, 1, 2, 3}
    # Every doc accounted for exactly once.
    assert sum(r.n_docs for r in out) == 10
    assert sum(r.seq_tokens for r in out) == 1000


def test_repetition_metrics_flags_repeated_doc(spark, tmp_path):
    """A doc that is one bigram repeated has dup_frac ≈ 1; a doc of all
    distinct words has dup_frac 0. The probe reads the documents table,
    so build a tiny parquet standing in for it."""
    from realtime_financial_transactions_data_pipeline_spark.operators.text import (
        x3h_repetition_metrics,
    )

    sf = str(tmp_path)
    spark.createDataFrame(
        [
            (1, "en", "spam spam spam spam spam spam"),
            (2, "fr", "one two three four five six"),
        ],
        "doc_id long, lang string, text string",
    ).write.parquet(f"{sf}/documents.parquet")
    rows = {r.lang: r for r in x3h_repetition_metrics(spark, sf).collect()}
    # 5 bigrams, all identical -> 4 duplicates -> dup_frac 0.8, top 1.0
    assert rows["en"].avg_dup_frac == 0.8
    assert rows["en"].avg_top_frac == 1.0
    assert rows["en"].n_flagged == 1
    assert rows["fr"].avg_dup_frac == 0.0
    assert rows["fr"].n_flagged == 0


def test_x10_plan_shape(spark, sf_dir):
    """The packing plan must do its Python work in ONE Arrow-grouped
    operator (FlatMapGroupsInPandas) — never row-at-a-time — and the
    scan must read only the three columns the layout needs."""
    from realtime_financial_transactions_data_pipeline_spark.operators.packing import (
        x10_sequence_packing,
    )
    from realtime_financial_transactions_data_pipeline_spark.plans import inspect

    df = x10_sequence_packing(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    assert "FlatMapGroupsInPandas" in plan
    assert not inspect.has_python_row_udf(df)
    schema = inspect.scan_read_schema(df)
    assert "text" in schema and "title" not in schema


def test_x3h_partial_aggregation(spark, sf_dir):
    """The bigram explode feeds map-side (partial) aggregation before
    any exchange — at corpus scale the shuffle carries (doc_id, gram)
    partial counts, not raw bigram rows."""
    from realtime_financial_transactions_data_pipeline_spark.operators.text import (
        x3h_repetition_metrics,
    )
    from realtime_financial_transactions_data_pipeline_spark.plans import inspect

    df = x3h_repetition_metrics(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    assert "partial_count" in plan or "partial" in plan.lower()
    assert not inspect.has_python_row_udf(df)


def test_pack_sequences_honors_seq_len_and_group_col(spark):
    """seq_len/group_col thread through to the fold (round-5 ADVICE:
    they were silently ignored, packing at 256 whatever the caller
    asked for). Six 300-token docs at seq_len=1000 must pack 3-per-
    sequence under a custom group column."""
    from realtime_financial_transactions_data_pipeline_spark.operators.packing import (
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [(i, "tok " * 300, "g1") for i in range(6)],
        ["doc_id", "text", "bucket"],
    )
    out = pack_sequences(
        docs, seq_len=1000, shard_budget=10_000, group_col="bucket"
    ).collect()
    assert {r.bucket for r in out} == {"g1"}
    assert sorted((r.seq_id, r.n_docs, r.seq_tokens) for r in out) == [
        (0, 3, 900),
        (1, 3, 900),
    ]
