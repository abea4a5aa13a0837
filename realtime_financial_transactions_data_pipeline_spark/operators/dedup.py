"""Deduplication operators (north-star X1/X2): exact, MinHash+LSH,
SimHash, n-gram Jaccard.

Scale design notes (each operator's shuffle is keyed so no partition
grows with corpus size squared):

- Exact dedup hashes the content column and groups on the digest — one
  shuffle keyed by digest; at 100 TB the 16-byte hashes shuffle, never
  the payloads.
- n-gram Jaccard (x2b) is an **inverted-index similarity join** (the
  sparse exact algorithm behind AllPairs, Bayardo et al., WWW 2007):
  explode word shingles → self-join keyed by the shingle → count common
  shingles per pair → Jaccard from set sizes. Work is Σ_g df(g)², which
  stays linear as long as shingle document-frequency is bounded — word
  3-grams keep max df tiny (25 at sf0.1, 1.3 M pair-occurrences vs the
  12.5 M all-pairs space), and a df cap drops degenerate stop-shingles
  at bigger scale. No O(N²) block self-join anywhere.
- MinHash+LSH (x2a, Broder 1997 + banding) buckets 48 minhashes into
  12 bands of 4; only same-bucket pairs join, buckets over a hard size
  cap are dropped (hot-bucket guard), and candidates are verified with
  exact Jaccard. All hashing is JVM-side ``xxhash64`` inside
  whole-stage codegen — no Python.
- SimHash (x2d, Charikar, STOC 2002) hashes tokens JVM-side and only
  does the bit-majority in an Arrow-batched pandas UDF (numpy,
  vectorized over the whole batch). Near-dup blocking uses all eight
  8-bit bands, so any pair within Hamming distance 7 is guaranteed to
  share a band (pigeonhole) — full recall for the distance-6 predicate.

Word-level 3-gram shingles (not char 3-grams) are used for both x2a and
x2b: on natural text char-trigrams are near-universal and bucket half
the corpus together, while word shingles separate true near-duplicates
(Jaccard ≥ 0.9 for the planted pairs) from unrelated docs (< 0.3).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
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

_SHINGLE_WORDS = 3  # word shingles
_N_HASHES = 48
_BAND_ROWS = 4  # 12 bands × 4 rows: P(cand | J=0.9) ≈ 1 - 3e-6
_BUCKET_CAP = 200  # hot-bucket guard: drop LSH buckets larger than this
_NEARDUP_T = 0.6  # verify threshold; planted dups sit at J ≥ 0.9

#: DuckDB-side twin of :func:`word_shingles` (same slicing/clamping
#: semantics as Spark's ``slice``; both clamp short tails).
_ORACLE_SHINGLES = """
      SELECT doc_id, list_distinct(list_transform(
               range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
               i -> array_to_string(
                      string_split(text, ' ')[CAST(i AS INTEGER):CAST(i + 2 AS INTEGER)],
                      ' '))) AS grams
      FROM documents
"""

#: Exact all-pairs near-dup oracle — DuckDB only runs this at sf0.01
#: (~500 docs); the Spark plans below compute the same result without
#: ever materializing the quadratic pair space.
_ORACLE_NEARDUP = f"""
    WITH sh AS ({_ORACLE_SHINGLES})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 4)
             AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
          / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
          >= {_NEARDUP_T}
"""


def word_shingles(col: str, k: int = _SHINGLE_WORDS) -> F.Column:
    """Distinct word k-grams as an array column, JVM-side. Docs shorter
    than k words yield their whole text as a single shingle."""
    words = f"split({col}, ' ')"
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(size({words}) - {k - 1}, 1)),"
            f" i -> concat_ws(' ', slice({words}, i, {k})))"
        )
    )


def jaccard_pairs_exact(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = _NEARDUP_T,
    max_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard similarity join via an inverted index (AllPairs
    family). One shuffle keyed by shingle, one by pair; per-shingle work
    is df(g)², so feed ``max_df`` at open-web scale to drop degenerate
    stop-shingles (exact for every pair that shares at least one
    sub-cap shingle; pairs built *only* from stop-shingles can't reach
    a meaningful threshold anyway)."""
    sized = docs.select(
        F.col(id_col).alias("_id"), word_shingles(text_col).alias("grams")
    ).withColumn("n", F.size("grams"))
    posting = sized.select("_id", "n", F.explode("grams").alias("gram"))
    by_gram = posting.groupBy("gram").agg(
        F.array_sort(F.collect_list(F.struct("_id", "n"))).alias("ids")
    )
    # One shuffle keyed by shingle; pairs are generated *inside* each
    # posting list, so shingles with df=1 (the vast majority of word
    # 3-grams) never reach a join at all, and there is no second
    # shuffle of the full posting table.
    cap = F.lit(max_df) if max_df is not None else F.size("ids")
    bounded = by_gram.filter((F.size("ids") >= 2) & (F.size("ids") <= cap))
    pair_gen = (
        "flatten(transform(ids, (a, i) -> "
        "transform(slice(ids, i + 2, size(ids)), b -> "
        "struct(a._id AS id_a, b._id AS id_b, a.n AS n_a, b.n AS n_b))))"
    )
    inter = (
        bounded.select(F.explode(F.expr(pair_gen)).alias("p"))
        .select("p.*")
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    jac = F.col("c").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("c")).cast("double")
    return (
        inter.withColumn("jaccard_raw", jac)
        .filter(F.col("jaccard_raw") >= threshold)
        .select("id_a", "id_b", dround("jaccard_raw", 4).alias("jaccard"))
    )


@probe("x2b_ngram_jaccard", oracle=_ORACLE_NEARDUP)
def x2b_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup join over the whole corpus —
    inverted-index algorithm, identical output to the all-pairs oracle
    with no quadratic join anywhere."""
    d = load_table(spark, sf_dir, "documents")
    return jaccard_pairs_exact(d)


def minhash_signature(
    df: DataFrame, text_col: str = "text", grams_col: str | None = None
) -> DataFrame:
    """Append `sig` (array<bigint>, length _N_HASHES): per-seed min of
    xxhash64 over the word-shingle set. Pure built-ins → codegen'd.
    Pass ``grams_col`` when the shingle array is already materialized
    (x2a shares one persisted shingling pass between the signature and
    the exact-Jaccard verify instead of re-shingling per consumer)."""
    if grams_col is None:
        df = df.withColumn("_shingles", word_shingles(text_col))
        src = "_shingles"
    else:
        src = grams_col
    # Hash each shingle STRING once; the per-seed family re-hashes the
    # resulting 8-byte long (fixed-width input), so the 48 passes cost
    # 48 × |grams| long-hashes instead of 48 full string scans.
    df = df.withColumn("_hg", F.expr(f"transform({src}, s -> xxhash64(s))"))
    mins = [
        F.array_min(
            F.expr(f"transform(_hg, v -> xxhash64(v, {seed}))")
        ).alias(f"_h{seed}")
        for seed in range(_N_HASHES)
    ]
    tmp = ["_hg"] if grams_col is not None else ["_hg", "_shingles"]
    return (
        df.select("*", *mins)
        .withColumn("sig", F.array(*[f"_h{s}" for s in range(_N_HASHES)]))
        .drop(*tmp, *[f"_h{s}" for s in range(_N_HASHES)])
    )


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str, bucket_cap: int = _BUCKET_CAP
) -> DataFrame:
    """Band the signature and pair up ids *within* each (band_id,
    band_hash) bucket. Returns distinct candidate (id_a, id_b) with
    id_a < id_b. One shuffle (groupBy the bucket key) — singleton
    buckets vanish in the aggregate, and buckets larger than
    ``bucket_cap`` are dropped outright so one hot bucket can never go
    quadratic (near-dup clusters are small; a mega-bucket is a
    hash-collision pathology, not signal)."""
    n_bands = _N_HASHES // _BAND_ROWS
    banded = sigs.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.hash(F.slice("sig", b * _BAND_ROWS + 1, _BAND_ROWS)).alias("band_hash"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("_id", "band.band_id", "band.band_hash")
    buckets = (
        banded.groupBy("band_id", "band_hash")
        .agg(F.array_sort(F.collect_list("_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= bucket_cap))
    )
    pair_gen = (
        "flatten(transform(ids, (a, i) -> "
        "transform(slice(ids, i + 2, size(ids)), b -> "
        "struct(a AS id_a, b AS id_b))))"
    )
    return (
        buckets.select(F.explode(F.expr(pair_gen)).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


@probe("x2a_minhash_lsh_neardup", oracle=_ORACLE_NEARDUP)
def x2a_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pipeline: word shingles → 48 minhashes →
    12-band bucketing (+ hot-bucket cap) → candidate equi-join → exact
    Jaccard verify ≥ 0.6. The exact verify makes false positives
    impossible, and at the verify threshold the banding's recall is
    ≈ 1 - 4e-8 for J ≥ 0.9 near-dups — so the output matches the exact
    all-pairs oracle while only ever joining same-bucket candidates.
    Properties (planted near-dups found, parity with x2b) are
    unit-tested in tests/test_dedup.py."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    grams = (
        d.select("doc_id", word_shingles("text").alias("grams"))
        .withColumn("n", F.size("grams"))
        .persist()
    )
    sigs = minhash_signature(grams, grams_col="grams").select("doc_id", "sig")
    cands = lsh_candidate_pairs(sigs, "doc_id")
    docs_a = grams.select(
        F.col("doc_id").alias("id_a"), F.col("grams").alias("sh_a"), F.col("n").alias("n_a")
    )
    docs_b = grams.select(
        F.col("doc_id").alias("id_b"), F.col("grams").alias("sh_b"), F.col("n").alias("n_b")
    )
    return (
        cands.join(docs_a, "id_a")
        .join(docs_b, "id_b")
        .withColumn("c", F.size(F.array_intersect("sh_a", "sh_b")).cast("double"))
        .withColumn(
            "jaccard_raw",
            F.col("c") / (F.col("n_a") + F.col("n_b") - F.col("c")).cast("double"),
        )
        .filter(F.col("jaccard_raw") >= _NEARDUP_T)
        .select("id_a", "id_b", dround("jaccard_raw", 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash (pandas-UDF path — the Arrow-batched custom-operator pattern)
# ---------------------------------------------------------------------------

_SIMHASH_BANDS = 8  # 8 bands × 8 bits: Hamming ≤ 7 pairs must share a band


@F.pandas_udf(T.LongType())
def simhash_from_hashes(token_hashes: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Bit-majority SimHash over pre-hashed tokens. Token hashing runs
    JVM-side (xxhash64 in codegen); Python only does the bit-majority,
    vectorized with numpy per Arrow batch — no per-token Python loop."""
    shifts = np.arange(64, dtype=np.uint64)

    def one(hashes: object) -> object:
        if hashes is None:
            return None
        h = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
        if h.size == 0:
            return 0
        ones = ((h[:, None] >> shifts) & np.uint64(1)).sum(axis=0)
        bits = (ones * 2 > h.size).astype(np.uint64)
        out = np.uint64(0)
        for i in range(64):
            out |= bits[i] << shifts[i]
        return int(out.astype(np.uint64).view(np.int64))

    for batch in token_hashes:
        yield batch.map(one)


def simhash_col(text_col: str) -> F.Column:
    """SimHash fingerprint of whitespace-lowered tokens (int64 carrying
    the raw 64-bit pattern two's-complement-reinterpreted)."""
    hashed = F.expr(f"transform(split(lower({text_col}), ' '), t -> xxhash64(t))")
    return simhash_from_hashes(hashed)


@probe("x2d_simhash", oracle=None)
def x2d_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at Hamming distance ≤ 6. Blocking joins on
    all eight 8-bit bands of the fingerprint: any pair within distance 7
    shares at least one band (pigeonhole), so recall is exact for the
    ≤ 6 predicate; band equi-join keeps the search bucketed. Rows-only
    (hash function has no SQL twin); planted near-dups and the band
    recall guarantee are unit-tested in tests/test_dedup.py."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    fp = d.select("doc_id", simhash_col("text").alias("simhash"))
    banded = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftrightunsigned("simhash", 8 * b)
                        .bitwiseAND(F.lit(255))
                        .alias("band_val"),
                    )
                    for b in range(_SIMHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_id", "band.band_val")
    # Unlike lsh_candidate_pairs (whose minhash-band buckets are tiny),
    # 8-bit simhash bands have only 256 values, so buckets are FAT —
    # the codegen'd shuffle hash join beats interpreted in-bucket pair
    # generation here. At larger corpora, widen the bands (more tables,
    # Manku et al. WWW'07 block combinations) so bucket size stays
    # bounded; width 8 is sized for the pigeonhole guarantee below.
    a = banded.alias("a")
    b = banded.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    # Hamming-filter BEFORE the distinct: the predicate runs inside the
    # join's codegen stage, so the dedup shuffle only ever sees the few
    # surviving near-dup pairs, not every raw band collision.
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= 6)
        .distinct()
    )
