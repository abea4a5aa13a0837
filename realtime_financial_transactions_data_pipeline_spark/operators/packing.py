"""X10 — sequence packing: the layout step that turns a curated corpus
into fixed-length training sequences.

Training pipelines pack documents into sequences of exactly ``seq_len``
tokens; a document that does not fit the remainder of the current
sequence starts a new one (boundary-respecting greedy packing — the
standard "no document crosses a sequence boundary unless longer than
the sequence" rule). The interesting output is the padding waste: the
fraction of slots a packer pads out, which data teams track because it
is pure lost compute at training time.

Scale shape: the greedy fold is inherently sequential *within* an
ordered run of documents, so the corpus is first laid out into
fixed-token-budget shards (the X9 assignment — one window shuffle keyed
by language), and each (lang, shard) packs independently inside one
``applyInPandas`` group. Shard budget bounds per-group state to a few
thousand rows regardless of corpus size, so at 100 TB the packing stage
is embarrassingly parallel across ~corpus_tokens/budget groups and no
executor ever holds more than one shard. Python-side work is a single
vectorized-ish fold over token counts (ints, not text) — the documents
themselves never enter Python.

Reference parity: the reference pipeline has no packing stage (it is a
row-level financial ETL); this operator is part of the
training-data toolchain the build plan adds on top (SURVEY.md §6).
"""

from __future__ import annotations

import functools

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from realtime_financial_transactions_data_pipeline_spark.functions.compat import dround
from realtime_financial_transactions_data_pipeline_spark.registry import probe
from realtime_financial_transactions_data_pipeline_spark.tables import load_table

_TOKEN_RE = "[a-zA-Z0-9]+"
_SEQ_LEN = 256
#: Shard budget for the packing probe — smaller than X9's layout budget
#: so the probe exercises multiple groups per language even at sf0.01.
_PACK_SHARD_BUDGET = 5_000

def _pack_schema(group_col: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(group_col, T.StringType()),
            T.StructField("shard_id", T.LongType()),
            T.StructField("seq_id", T.LongType()),
            T.StructField("n_docs", T.LongType()),
            T.StructField("seq_tokens", T.LongType()),
        ]
    )


def _pack_group(
    pdf: pd.DataFrame, *, seq_len: int, id_col: str, group_col: str
) -> pd.DataFrame:
    """Greedy boundary-respecting fold over one (group, shard) group,
    in id order. Pure-integer loop over token counts — group sizes
    are bounded by the shard budget, so this is O(budget/avg_doc_len)
    rows per invocation."""
    pdf = pdf.sort_values(id_col)
    group = pdf[group_col].iloc[0]
    shard = int(pdf["shard_id"].iloc[0])
    out: list[tuple[str, int, int, int, int]] = []
    seq_id, fill, n_docs = 0, 0, 0
    for n_tok in pdf["n_tok"].to_numpy():
        n_tok = int(n_tok)
        if n_docs > 0 and fill + n_tok > seq_len:
            out.append((group, shard, seq_id, n_docs, fill))
            seq_id, fill, n_docs = seq_id + 1, 0, 0
        fill += n_tok
        n_docs += 1
    if n_docs > 0:
        out.append((group, shard, seq_id, n_docs, fill))
    return pd.DataFrame(
        out, columns=[group_col, "shard_id", "seq_id", "n_docs", "seq_tokens"]
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = _SEQ_LEN,
    shard_budget: int = _PACK_SHARD_BUDGET,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Per-(group, shard, sequence) packing table. Token counts are
    clamped to ``seq_len`` so a pathological mega-document occupies one
    full sequence instead of wedging the fold."""
    n_tok = F.least(
        F.size(F.regexp_extract_all(text_col, F.lit(_TOKEN_RE), 0)), F.lit(seq_len)
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    laid_out = (
        docs.select(id_col, group_col, n_tok.alias("n_tok"))
        .withColumn("_cum", F.sum("n_tok").over(w))
        .withColumn(
            "shard_id",
            F.floor((F.col("_cum") - F.col("n_tok")) / float(shard_budget)).cast(
                "long"
            ),
        )
        .drop("_cum")
    )
    fold = functools.partial(
        _pack_group, seq_len=seq_len, id_col=id_col, group_col=group_col
    )
    return laid_out.groupBy(group_col, "shard_id").applyInPandas(
        fold, schema=_pack_schema(group_col)
    )


@probe(
    "x10_sequence_packing",
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT doc_id, lang,
             least(len(regexp_extract_all(text, '{_TOKEN_RE}')), {_SEQ_LEN}) AS n_tok
      FROM documents),
    c AS (
      SELECT doc_id, lang, n_tok,
             sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM d),
    o AS (
      SELECT doc_id, lang, n_tok,
             CAST(floor((cum - n_tok) / {_PACK_SHARD_BUDGET}.0) AS BIGINT) AS shard_id,
             row_number() OVER (PARTITION BY lang,
                                CAST(floor((cum - n_tok) / {_PACK_SHARD_BUDGET}.0) AS BIGINT)
                                ORDER BY doc_id) AS rn
      FROM c),
    walk(lang, shard_id, rn, seq_id, fill) AS (
      SELECT lang, shard_id, rn, CAST(0 AS BIGINT), n_tok FROM o WHERE rn = 1
      UNION ALL
      SELECT o.lang, o.shard_id, o.rn,
             CASE WHEN w.fill + o.n_tok <= {_SEQ_LEN} THEN w.seq_id
                  ELSE w.seq_id + 1 END,
             CASE WHEN w.fill + o.n_tok <= {_SEQ_LEN} THEN w.fill + o.n_tok
                  ELSE o.n_tok END
      FROM walk w
      JOIN o ON o.lang = w.lang AND o.shard_id = w.shard_id AND o.rn = w.rn + 1),
    seqs AS (
      SELECT lang, shard_id, seq_id, count(*) AS n_docs, max(fill) AS seq_tokens
      FROM walk GROUP BY lang, shard_id, seq_id)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_seqs,
           CAST(sum(seq_tokens) AS BIGINT) AS packed_tokens,
           round(1.0 - sum(seq_tokens) / (count(*) * {_SEQ_LEN}.0), 4) AS pad_frac
    FROM seqs GROUP BY lang
    """,
)
def x10_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 — pack documents into 256-token training sequences within
    fixed-budget shards; report per-language sequence counts and padding
    waste. Hash-checked: DuckDB replays the identical greedy fold as a
    recursive CTE (the ``max(fill)`` per sequence equals the fold's
    final fill because fill is monotone within a sequence), so the
    oracle certifies every boundary decision, not just totals."""
    d = load_table(spark, sf_dir, "documents")
    seqs = pack_sequences(d)
    return seqs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum("seq_tokens").cast("long").alias("packed_tokens"),
        dround(
            F.lit(1.0)
            - F.sum("seq_tokens") / (F.count(F.lit(1)) * float(_SEQ_LEN)),
            4,
        ).alias("pad_frac"),
    )
