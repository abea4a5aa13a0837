"""Document chunking and sub-document dedup (north-star X-family).

Two operators a pretraining/RAG data pipeline runs between curation and
packing:

* **Sliding-window chunking** (x14): split each document into
  fixed-size token windows with overlap — the standard layout for
  retrieval corpora and for long-doc pretraining where attention spans
  are bounded. Entirely JVM array lambdas (`split` → `sequence` →
  `transform` → `slice` → `explode`): no Python on the hot path, the
  chunk fan-out happens after the scan so the plan is map-only.
* **Chunk-granularity exact dedup with reconstruction** (x1d sibling,
  x15): the Dolma/RefinedWeb "paragraph dedup" pattern — dedup at
  sub-document granularity (here: non-overlapping token windows, since
  the synthetic corpus has no newlines), keep the first occurrence
  corpus-wide, then rebuild each document from its surviving chunks.
  Shuffle keys are 16-byte md5 digests; the rebuild is one
  digest-window pass plus a per-doc sort_array fold — both
  partial-aggregable.

At 100 TB: chunking is embarrassingly parallel (map-only, no
exchange). Chunk dedup shuffles one digest row per chunk (W tokens →
16 bytes, a ~100× reduction vs shuffling text) and the reconstruction
groupBy carries only surviving chunk text partitioned by doc_id — the
same scale behavior as the proven exact-dedup digest pattern
(dedup.py X1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtime_financial_transactions_data_pipeline_spark.registry import probe
from realtime_financial_transactions_data_pipeline_spark.tables import load_table

#: Retrieval-style window: 64 whitespace tokens, stride 48 (16-token
#: overlap between consecutive chunks).
_CHUNK_W = 64
_CHUNK_S = 48
#: Dedup granularity: non-overlapping 32-token windows, so documents
#: reconstruct exactly from their surviving chunks.
_DEDUP_W = 32


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = _CHUNK_W,
    stride: int = _CHUNK_S,
) -> DataFrame:
    """Explode each document into token windows of ``window`` tokens
    every ``stride`` tokens (the final window is short rather than
    padded). Returns (id, chunk_id, chunk_text, n_tokens).

    A document of n tokens yields 1 chunk when n <= window, else
    ceil((n - window) / stride) + 1 — every token is covered and the
    last window starts at the smallest multiple of ``stride`` that
    still reaches the end.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    if stride > window:
        raise ValueError(
            "stride > window would skip tokens; use stride <= window "
            "(== window for contiguous, < window for overlap)"
        )
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        F.ceil((n - window) / F.lit(float(stride))).cast("long") + 1
    )
    chunk = F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
        "chunk_id"
    )
    out = docs.select(F.col(id_col), toks.alias("_toks"), chunk)
    return out.select(
        id_col,
        "chunk_id",
        F.array_join(
            F.slice("_toks", F.col("chunk_id").cast("int") * stride + 1, window),
            " ",
        ).alias("chunk_text"),
        F.size(
            F.slice("_toks", F.col("chunk_id").cast("int") * stride + 1, window)
        ).cast("long").alias("n_tokens"),
    )


def dedup_chunks_rebuild(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = _DEDUP_W,
) -> DataFrame:
    """Sub-document exact dedup: chunk into non-overlapping ``window``
    token spans, keep the corpus-wide first occurrence of each distinct
    span (lowest (doc_id, chunk_id)), and rebuild each document from
    its surviving spans in order. Returns
    (id, kept_text, n_chunks_total, n_chunks_kept).

    Documents that lose every chunk still appear (kept_text = '') —
    the caller decides whether to drop empties, mirroring Dolma's
    paragraph-dedup step which leaves empty docs for a later gate.
    """
    chunks = chunk_documents(
        docs, id_col=id_col, text_col=text_col, window=window, stride=window
    )
    w = Window.partitionBy(F.md5("chunk_text")).orderBy(id_col, "chunk_id")
    ranked = chunks.withColumn("_rn", F.row_number().over(w))
    kept = ranked.filter(F.col("_rn") == 1)
    totals = chunks.groupBy(id_col).agg(
        F.count("*").alias("n_chunks_total")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("chunk_id", "chunk_text"))
                ),
                lambda s: s.chunk_text,
            ),
            " ",
        ).alias("kept_text"),
        F.count("*").alias("n_chunks_kept"),
    )
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("kept_text", F.lit("")).alias("kept_text"),
            "n_chunks_total",
            F.coalesce("n_chunks_kept", F.lit(0)).alias("n_chunks_kept"),
        )
    )


@probe(
    "x14_doc_chunking",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 200),
    c AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) <= {_CHUNK_W} THEN 1
                  ELSE CAST(ceil((len(toks) - {_CHUNK_W}) / {_CHUNK_S}.0) AS BIGINT) + 1
             END AS n_chunks
      FROM t),
    e AS (
      SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_id FROM c)
    SELECT doc_id, chunk_id,
           array_to_string(
             toks[CAST(chunk_id * {_CHUNK_S} + 1 AS INTEGER)
                  : CAST(chunk_id * {_CHUNK_S} + {_CHUNK_W} AS INTEGER)], ' ')
             AS chunk_text,
           len(toks[CAST(chunk_id * {_CHUNK_S} + 1 AS INTEGER)
                    : CAST(chunk_id * {_CHUNK_S} + {_CHUNK_W} AS INTEGER)])
             AS n_tokens
    FROM e
    """,
)
def x14_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking of `documents` (64-token windows, stride
    48) — the retrieval-corpus layout. Doc subset keeps the probe's
    row count bounded at larger SFs; the operator itself is map-only
    and SF-invariant per row."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return chunk_documents(docs)


@probe(
    "x15_chunk_dedup_rebuild",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    c AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) <= {_DEDUP_W} THEN 1
                  ELSE CAST(ceil((len(toks) - {_DEDUP_W}) / {_DEDUP_W}.0) AS BIGINT) + 1
             END AS n_chunks
      FROM t),
    e AS (
      SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_id FROM c),
    ch AS (
      SELECT doc_id, chunk_id,
             array_to_string(
               toks[CAST(chunk_id * {_DEDUP_W} + 1 AS INTEGER)
                    : CAST(chunk_id * {_DEDUP_W} + {_DEDUP_W} AS INTEGER)], ' ')
               AS chunk_text
      FROM e),
    ranked AS (
      SELECT doc_id, chunk_id, chunk_text,
             row_number() OVER (PARTITION BY md5(chunk_text)
                                ORDER BY doc_id, chunk_id) AS rn
      FROM ch),
    totals AS (SELECT doc_id, count(*) AS n_chunks_total FROM ch GROUP BY doc_id),
    rebuilt AS (
      SELECT doc_id,
             string_agg(chunk_text, ' ' ORDER BY chunk_id) AS kept_text,
             count(*) AS n_chunks_kept
      FROM ranked WHERE rn = 1 GROUP BY doc_id)
    SELECT t.doc_id,
           coalesce(r.kept_text, '') AS kept_text,
           t.n_chunks_total,
           coalesce(r.n_chunks_kept, 0) AS n_chunks_kept
    FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
    """,
)
def x15_chunk_dedup_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (chunk-granularity) exact dedup over the whole
    `documents` table with per-doc reconstruction — the Dolma-style
    paragraph-dedup pattern re-expressed for a newline-free corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup_chunks_rebuild(docs)
