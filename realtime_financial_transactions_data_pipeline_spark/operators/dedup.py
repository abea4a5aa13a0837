"""Deduplication operators (north-star X1/X2): exact, MinHash+LSH,
SimHash, n-gram Jaccard.

Scale design notes:
- Exact dedup hashes the content column and groups on the digest — one
  shuffle keyed by digest; at 100 TB use the digest as the shuffle key so
  payloads never co-locate, only 16-byte hashes.
- MinHash+LSH never materializes the O(n²) pair space: band signatures
  bucket candidates, and only same-bucket pairs are joined. All hashing is
  JVM-side (`xxhash64`) inside whole-stage codegen — no Python.
- n-gram Jaccard uses blocking (same lang + length band) so the self-join
  is bounded per block.
- SimHash is the one pandas-UDF op (bit-majority over token hashes), kept
  Arrow-batched.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from realtime_financial_transactions_data_pipeline_spark.functions.compat import dround
from realtime_financial_transactions_data_pipeline_spark.registry import probe
from realtime_financial_transactions_data_pipeline_spark.tables import load_table

# ---------------------------------------------------------------------------
# X1 — exact dedup
# ---------------------------------------------------------------------------


@probe(
    "x1_dedup_exact",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
           CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_dup_rows
    FROM documents
    """,
)
def x1_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup via digest (hash-groupBy). The digest — not the
    payload — is the shuffle key, so 100 TB of text shuffles 16-byte keys."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("h").alias("n_unique"),
        (F.count(F.lit(1)) - F.countDistinct("h")).alias("n_dup_rows"),
    )


@probe(
    "x1b_dedup_dropduplicates",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_distinct_pairs FROM
      (SELECT DISTINCT user_id, event_type FROM events)
    """,
)
def x1b_dedup_dropduplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a key subset (the reference's seen-ids set,
    generate_dim_account_data.py:69-70). Count is deterministic even
    though the representative row is not."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.dropDuplicates(["user_id", "event_type"])
        .agg(F.count(F.lit(1)).alias("n_distinct_pairs"))
    )


# ---------------------------------------------------------------------------
# X2 — near-duplicate detection
# ---------------------------------------------------------------------------

_SHINGLE_WIDTH = 3  # character shingles
_N_HASHES = 16
_BAND_SIZE = 4  # 4 bands × 4 rows


def _char_shingles(col: str) -> F.Column:
    """Distinct character n-grams as an array column, JVM-side:
    transform(sequence(1, len-2), i -> substring(text, i, 3))."""
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({col}) - {_SHINGLE_WIDTH - 1}, 1)),"
            f" i -> substring({col}, i, {_SHINGLE_WIDTH}))"
        )
    )


def minhash_signature(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append `sig` (array<bigint>, length _N_HASHES): per-seed min of
    xxhash64 over the shingle set. Pure built-ins → codegen'd."""
    shingled = df.withColumn("_shingles", _char_shingles(text_col))
    mins = [
        F.array_min(
            F.expr(f"transform(_shingles, s -> xxhash64(s, {seed}))")
        ).alias(f"_h{seed}")
        for seed in range(_N_HASHES)
    ]
    return (
        shingled.select("*", *mins)
        .withColumn("sig", F.array(*[f"_h{s}" for s in range(_N_HASHES)]))
        .drop("_shingles", *[f"_h{s}" for s in range(_N_HASHES)])
    )


def lsh_candidate_pairs(sigs: DataFrame, id_col: str) -> DataFrame:
    """Band the signature and self-join per (band_id, band_hash) bucket.
    Returns distinct candidate (id_a, id_b) with id_a < id_b. The join is
    an equi-join on the bucket key — no cross product."""
    n_bands = _N_HASHES // _BAND_SIZE
    banded = sigs.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.hash(F.slice("sig", b * _BAND_SIZE + 1, _BAND_SIZE)).alias("band_hash"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("_id", "band.band_id", "band.band_hash")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )


@probe("x2a_minhash_lsh_neardup", oracle=None)
def x2a_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pipeline: shingle → 16 minhashes → 4-band
    bucketing → candidate equi-join → exact Jaccard verify ≥ 0.5.
    Rows-only check (xxhash64 has no DuckDB twin); semantics unit-tested
    with planted near-duplicates in tests/test_dedup.py."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = minhash_signature(d)
    cands = lsh_candidate_pairs(sigs, "doc_id")
    docs_a = d.select(F.col("doc_id").alias("id_a"), _char_shingles("text").alias("sh_a"))
    docs_b = d.select(F.col("doc_id").alias("id_b"), _char_shingles("text").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b") - F.size(F.array_intersect("sh_a", "sh_b"))).cast(
        "double"
    )
    return (
        cands.join(docs_a, "id_a")
        .join(docs_b, "id_b")
        .withColumn("jaccard", dround(inter / union, 4))
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard")
    )


@probe(
    "x2b_ngram_jaccard",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, lang, n_chars,
             list_distinct(list_transform(
               range(1, greatest(length(text) - {_SHINGLE_WIDTH - 2}, 2)),
               i -> substring(text, CAST(i AS INTEGER), {_SHINGLE_WIDTH}))) AS grams
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 4)
             AS jaccard
    FROM sh a JOIN sh b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
     AND b.n_chars BETWEEN CAST(floor(a.n_chars * 0.5) AS BIGINT)
                       AND CAST(floor(a.n_chars * 2.0) AS BIGINT)
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
          / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.28
    """,
)
def x2b_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup with blocking (same lang + length
    band) so the self-join is bounded per block — the blocking key is
    what keeps this feasible at scale."""
    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", "lang", "n_chars", _char_shingles("text").alias("grams")
    )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect("a.grams", "b.grams")).cast("double")
    union = (
        F.size("a.grams") + F.size("b.grams") - F.size(F.array_intersect("a.grams", "b.grams"))
    ).cast("double")
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & F.col("b.n_chars").between(
                F.floor(F.col("a.n_chars") * 0.5).cast("long"),
                F.floor(F.col("a.n_chars") * 2.0).cast("long"),
            ),
        )
        .withColumn("jaccard_raw", inter / union)
        .filter(F.col("jaccard_raw") >= 0.28)
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            dround("jaccard_raw", 4).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash (pandas-UDF path — the Arrow-batched custom-operator pattern)
# ---------------------------------------------------------------------------


def _simhash64(tokens: list[str]) -> int:
    """Bit-majority SimHash over 64-bit token hashes (Charikar 2002)."""
    import hashlib as _hl

    acc = [0] * 64
    for tok in tokens:
        h = int.from_bytes(_hl.blake2b(tok.encode(), digest_size=8).digest(), "big")
        for bit in range(64):
            acc[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if acc[bit] > 0:
            out |= 1 << bit
    return out


@F.pandas_udf(T.LongType())
def simhash_udf(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for batch in texts:
        yield batch.map(
            lambda t: None
            if t is None
            else _simhash64(t.lower().split()) - (1 << 63)  # shift into signed int64
        )


@probe("x2d_simhash", oracle=None)
def x2d_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprint per document + near-dup pairs at Hamming
    distance ≤ 6, blocked by the top-16-bit prefix so the self-join stays
    bucketed. Rows-only (hash function has no SQL twin); unit-tested with
    planted near-dups."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    fp = d.select("doc_id", simhash_udf("text").alias("simhash"))
    a = fp.select(
        F.col("doc_id").alias("id_a"),
        F.col("simhash").alias("sh_a"),
        F.shiftrightunsigned("simhash", 48).alias("prefix"),
    )
    b = fp.select(
        F.col("doc_id").alias("id_b"),
        F.col("simhash").alias("sh_b"),
        F.shiftrightunsigned("simhash", 48).alias("prefix"),
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, ["prefix"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= 6)
        .select("id_a", "id_b", "hamming")
    )
