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


# ---------------------------------------------------------------------------
# X21 — CONTENT-DEFINED chunking (the rolling-hash boundary pattern of
# rsync/LBFS/FastCDC, word-granular): a position ends a chunk when the
# hash of its trailing 3-word window hits a divisor condition. Unlike
# x14's fixed windows, boundaries are SHIFT-ROBUST — inserting one word
# at the front of a document re-chunks only the prefix up to the first
# surviving boundary, so chunk-level dedup still matches everything
# after it (the property storage dedup and incremental-sync systems
# exist for; unit-pinned). Engine-portable hashing: the boundary hash
# is md5-derived (the x2d portable construction), so DuckDB replays
# boundaries, chunk ids, digests, and word counts bit-for-bit.
#
# Scale shape: posexplode → two window passes per doc (trailing-gram
# boundary flag, then a running boundary count as the chunk id) → one
# groupBy (doc, chunk) with a sorted-struct fold for the chunk text.
# Everything partitions on doc_id; no Python anywhere.
# ---------------------------------------------------------------------------

#: Boundary divisor: expected chunk length = _X21_DIV words (plus the
#: 2-word warmup in which no full trailing gram exists).
_X21_DIV = 8


@probe(
    "x21_content_defined_chunking",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, tok.tok AS word,
             CAST(tok.pos AS INTEGER) AS pos
      FROM (SELECT doc_id,
                   unnest(list_transform(string_split(lower(text), ' '),
                          (x, i) -> {{'tok': x, 'pos': i - 1}})) AS tok
            FROM documents)),
    g AS (SELECT doc_id, word, pos,
                 CASE WHEN pos >= 2 AND
                      CAST(('0x' || substr(md5(
                        lag(word, 2) OVER d || ' ' ||
                        lag(word, 1) OVER d || ' ' || word), 1, 8))
                        AS BIGINT) % {_X21_DIV} = 0
                      THEN 1 ELSE 0 END AS is_boundary
          FROM w WINDOW d AS (PARTITION BY doc_id ORDER BY pos)),
    c AS (SELECT doc_id, word, pos,
                 sum(is_boundary) OVER (PARTITION BY doc_id ORDER BY pos
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW)
                   - is_boundary AS chunk_id
          FROM g)
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(count(*) AS BIGINT) AS n_words,
           md5(string_agg(word, ' ' ORDER BY pos)) AS chunk_digest
    FROM c GROUP BY doc_id, chunk_id
    """,
)
def x21_content_defined_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X21 — rolling-hash content-defined chunks of every document
    (block comment above): a word ENDS a chunk when its trailing
    3-word gram's md5-derived hash ≡ 0 (mod {_X21_DIV}); the next word
    starts the next chunk. Output is one row per chunk with its word
    count and md5 digest — the dedup-able unit. The oracle replays the
    identical lag-window boundary rule, running-count chunk ids, and
    ordered digest fold."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "word"),
    )
    d = Window.partitionBy("doc_id").orderBy("pos")
    gram = F.concat_ws(
        " ", F.lag("word", 2).over(d), F.lag("word", 1).over(d), F.col("word")
    )
    # Portable hash: first 8 hex chars of md5 as an integer (the x2d
    # construction) — engine-identical, no xxhash dependency in the
    # oracle.
    hash8 = F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
    g = w.withColumn(
        "is_boundary",
        F.when(
            (F.col("pos") >= 2) & (F.pmod(hash8, F.lit(_X21_DIV)) == 0), 1
        ).otherwise(0),
    )
    c = g.withColumn(
        "chunk_id",
        (
            F.sum("is_boundary").over(
                d.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - F.col("is_boundary")
        ).cast("long"),
    )
    return (
        c.groupBy("doc_id", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "word"))
                        ),
                        lambda s: s["word"],
                    ),
                )
            ).alias("chunk_digest"),
        )
    )
