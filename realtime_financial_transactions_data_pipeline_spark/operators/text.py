"""Text-analysis operators for training-data pipelines (north-star X3):
token stats, language ID, quality scoring, document fingerprinting.

Everything here is built-in expression work (regexp / array / hash
functions) — fully codegen'd, no Python per row. Regexes are kept to
ASCII classes so Java-regex (Spark) and RE2 (DuckDB oracle) agree
byte-for-byte on UTF-8 text.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_financial_transactions_data_pipeline_spark.functions.compat import dround
from realtime_financial_transactions_data_pipeline_spark.registry import probe
from realtime_financial_transactions_data_pipeline_spark.tables import load_table

_TOKEN_RE = "[a-zA-Z0-9]+"
_WORD_RE = "[a-z]+"

#: GPT-2-ish pre-tokenizer: contraction suffixes, space-prefixed letter
#: runs, digit runs, punctuation runs (lookaheads dropped so the same
#: pattern runs on Java regex (Spark) and RE2 (DuckDB)).
_BPE_RE = "'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s']+"
_BPE_RE_SQL = _BPE_RE.replace("'", "''")

#: Tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic. Deliberately short — the heuristic, not the lexicon, is the
#: operator under test.
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por", "con", "para"],
    "fr": ["le", "les", "des", "une", "est", "dans", "pour", "que", "qui", "pas"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"],
}


@probe(
    "x3a_token_stats",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             regexp_extract_all(text, '{_TOKEN_RE}') AS tokens,
             length(text) AS n_chars_calc
      FROM documents
    )
    SELECT doc_id, lang,
           CAST(len(tokens) AS BIGINT) AS n_tokens,
           CAST(n_chars_calc AS BIGINT) AS n_chars_calc,
           CASE WHEN len(tokens) = 0 THEN NULL
                ELSE round(CAST(list_sum(list_transform(tokens, t -> length(t))) AS DOUBLE)
                           / len(tokens), 4) END AS avg_token_len
    FROM tok
    """,
)
def x3a_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace/alnum segmentation): token count, char
    count, mean token length per document."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "lang",
        F.regexp_extract_all("text", F.lit(_TOKEN_RE), 0).alias("tokens"),
        F.length("text").cast("long").alias("n_chars_calc"),
    )
    n = F.size("tokens")
    tot_len = F.expr("aggregate(transform(tokens, t -> length(t)), 0, (s, v) -> s + v)")
    return tok.select(
        "doc_id",
        "lang",
        n.cast("long").alias("n_tokens"),
        "n_chars_calc",
        F.when(n == 0, F.lit(None)).otherwise(
            dround(tot_len.cast("double") / n, 4)
        ).alias("avg_token_len"),
    )


@probe(
    "x3ade_doc_profile",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             regexp_extract_all(text, '{_TOKEN_RE}') AS tokens,
             regexp_extract_all(text, '{_BPE_RE_SQL}') AS btoks,
             md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint,
             length(text) AS n_chars_calc
      FROM documents
    )
    SELECT doc_id, lang,
           CAST(len(tokens) AS BIGINT) AS n_tokens,
           CAST(n_chars_calc AS BIGINT) AS n_chars_calc,
           CASE WHEN len(tokens) = 0 THEN NULL
                ELSE round(CAST(list_sum(list_transform(tokens, t -> length(t))) AS DOUBLE)
                           / len(tokens), 4) END AS avg_token_len,
           fingerprint,
           CAST(count(*) OVER (PARTITION BY fingerprint) AS BIGINT) AS group_size,
           CAST(len(btoks) AS BIGINT) AS n_bpe_tokens
    FROM tok
    """,
)
def x3ade_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 per-document profile in ONE scan — driver-window
    representative of the x3a_token_stats / x3d_fingerprint /
    x3e_bpe_pretokenize twins: token stats + canonical md5 fingerprint
    (with duplicate-group size) + BPE pre-token count."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "lang",
        F.regexp_extract_all("text", F.lit(_TOKEN_RE), 0).alias("tokens"),
        F.regexp_extract_all("text", F.lit(_BPE_RE), 0).alias("btoks"),
        F.md5(
            F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "))
        ).alias("fingerprint"),
        F.length("text").cast("long").alias("n_chars_calc"),
    )
    n = F.size("tokens")
    tot_len = F.expr("aggregate(transform(tokens, t -> length(t)), 0, (s, v) -> s + v)")
    return tok.select(
        "doc_id",
        "lang",
        n.cast("long").alias("n_tokens"),
        "n_chars_calc",
        F.when(n == 0, F.lit(None)).otherwise(
            dround(tot_len.cast("double") / n, 4)
        ).alias("avg_token_len"),
        "fingerprint",
        F.count(F.lit(1))
        .over(Window.partitionBy("fingerprint"))
        .cast("long")
        .alias("group_size"),
        F.size("btoks").cast("long").alias("n_bpe_tokens"),
    )


def _lang_scores_spark(tokens_col: str):
    return {
        lang: F.size(
            F.array_intersect(F.col(tokens_col), F.array(*[F.lit(w) for w in words]))
        )
        for lang, words in _STOPWORDS.items()
    }


@probe(
    "x3b_language_id",
    oracle=f"""
    WITH scored AS (
      SELECT lang,
             CASE
               WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
               ELSE (
                 WITH t AS (SELECT list_distinct(regexp_extract_all(lower(text), '{_WORD_RE}')) AS toks)
                 SELECT CASE
                   WHEN len(list_intersect(toks, {_STOPWORDS['en']!r})) = 0
                    AND len(list_intersect(toks, {_STOPWORDS['es']!r})) = 0
                    AND len(list_intersect(toks, {_STOPWORDS['fr']!r})) = 0
                    AND len(list_intersect(toks, {_STOPWORDS['de']!r})) = 0 THEN 'other'
                   WHEN len(list_intersect(toks, {_STOPWORDS['en']!r})) >= greatest(
                        len(list_intersect(toks, {_STOPWORDS['es']!r})),
                        len(list_intersect(toks, {_STOPWORDS['fr']!r})),
                        len(list_intersect(toks, {_STOPWORDS['de']!r}))) THEN 'en'
                   WHEN len(list_intersect(toks, {_STOPWORDS['es']!r})) >= greatest(
                        len(list_intersect(toks, {_STOPWORDS['fr']!r})),
                        len(list_intersect(toks, {_STOPWORDS['de']!r}))) THEN 'es'
                   WHEN len(list_intersect(toks, {_STOPWORDS['fr']!r})) >=
                        len(list_intersect(toks, {_STOPWORDS['de']!r})) THEN 'fr'
                   ELSE 'de' END
                 FROM t)
             END AS predicted
      FROM documents
    )
    SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n
    FROM scored GROUP BY lang, predicted
    """,
)
def x3b_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: CJK charset detection + stopword-hit argmax
    with a fixed tie-break order (en > es > fr > de). Output is the
    confusion matrix against the labeled lang column."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(F.regexp_extract_all(F.lower(F.col("text")), F.lit(_WORD_RE), 0))
    scored = d.withColumn("toks", toks)
    s = _lang_scores_spark("toks")
    no_hits = (s["en"] == 0) & (s["es"] == 0) & (s["fr"] == 0) & (s["de"] == 0)
    predicted = (
        F.when(F.col("text").rlike("[一-鿿]"), "zh")
        .when(no_hits, "other")
        .when(s["en"] >= F.greatest(s["es"], s["fr"], s["de"]), "en")
        .when(s["es"] >= F.greatest(s["fr"], s["de"]), "es")
        .when(s["fr"] >= s["de"], "fr")
        .otherwise("de")
    )
    return (
        scored.select("lang", predicted.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@probe(
    "x3bcf_doc_quality",
    oracle=f"""
    WITH pred AS (
      SELECT doc_id,
             CASE
               WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
               ELSE (
                 WITH t AS (SELECT list_distinct(regexp_extract_all(lower(text), '{_WORD_RE}')) AS toks)
                 SELECT CASE
                   WHEN len(list_intersect(toks, {_STOPWORDS['en']!r})) = 0
                    AND len(list_intersect(toks, {_STOPWORDS['es']!r})) = 0
                    AND len(list_intersect(toks, {_STOPWORDS['fr']!r})) = 0
                    AND len(list_intersect(toks, {_STOPWORDS['de']!r})) = 0 THEN 'other'
                   WHEN len(list_intersect(toks, {_STOPWORDS['en']!r})) >= greatest(
                        len(list_intersect(toks, {_STOPWORDS['es']!r})),
                        len(list_intersect(toks, {_STOPWORDS['fr']!r})),
                        len(list_intersect(toks, {_STOPWORDS['de']!r}))) THEN 'en'
                   WHEN len(list_intersect(toks, {_STOPWORDS['es']!r})) >= greatest(
                        len(list_intersect(toks, {_STOPWORDS['fr']!r})),
                        len(list_intersect(toks, {_STOPWORDS['de']!r}))) THEN 'es'
                   WHEN len(list_intersect(toks, {_STOPWORDS['fr']!r})) >=
                        len(list_intersect(toks, {_STOPWORDS['de']!r})) THEN 'fr'
                   ELSE 'de' END
                 FROM t)
             END AS predicted
      FROM documents),
    m AS (
      SELECT doc_id, lang,
             CAST(length(text) AS DOUBLE) AS n,
             CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
               AS n_punct,
             CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
               AS n_digit
      FROM documents),
    tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_WORD_RE}')) AS w
      FROM documents),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS nw FROM tok),
    cnt AS (SELECT w, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY w),
    xent AS (
      SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n_word_tokens,
             round(avg(-log2(c / nw)), 4) AS unigram_xent
      FROM tok t JOIN cnt USING (w) CROSS JOIN tot
      GROUP BY t.doc_id)
    SELECT m.doc_id, m.lang, pred.predicted,
           round(n_punct / n, 4) AS punct_ratio,
           round(n_digit / n, 4) AS digit_ratio,
           round(least(n / 500.0, 1.0) * (1 - n_punct / n) * (1 - n_digit / n), 4)
             AS quality,
           xent.n_word_tokens, xent.unigram_xent
    FROM m JOIN pred USING (doc_id) LEFT JOIN xent USING (doc_id)
    WHERE n > 0
    """,
)
def x3bcf_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 per-document quality view — driver-window representative of
    the x3b_language_id / x3c_quality_score / x3f_unigram_xentropy
    twins: predicted language (per doc, stronger than x3b's aggregated
    confusion matrix), surface-statistics quality, and corpus-model
    unigram cross-entropy (null for docs with no word tokens)."""
    from realtime_financial_transactions_data_pipeline_spark.tables import widen_scan

    d = widen_scan(load_table(spark, sf_dir, "documents"))  # r18: parallel scoring
    toks = F.array_distinct(F.regexp_extract_all(F.lower(F.col("text")), F.lit(_WORD_RE), 0))
    scored = d.withColumn("toks", toks)
    s = _lang_scores_spark("toks")
    no_hits = (s["en"] == 0) & (s["es"] == 0) & (s["fr"] == 0) & (s["de"] == 0)
    predicted = (
        F.when(F.col("text").rlike("[一-鿿]"), "zh")
        .when(no_hits, "other")
        .when(s["en"] >= F.greatest(s["es"], s["fr"], s["de"]), "en")
        .when(s["es"] >= F.greatest(s["fr"], s["de"]), "es")
        .when(s["fr"] >= s["de"], "fr")
        .otherwise("de")
    )
    n = F.length("text").cast("double")

    def ratio(pattern: str) -> F.Column:
        return (n - F.length(F.regexp_replace("text", pattern, ""))) / n

    punct, digit = ratio("[.,;:!?]"), ratio("[0-9]")
    quality = F.least(n / 500.0, F.lit(1.0)) * (1 - punct) * (1 - digit)
    base = scored.filter(n > 0).select(
        "doc_id",
        "lang",
        predicted.alias("predicted"),
        dround(punct, 4).alias("punct_ratio"),
        dround(digit, 4).alias("digit_ratio"),
        dround(quality, 4).alias("quality"),
    )
    tok = d.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.lower(F.col("text")), F.lit(_WORD_RE), 0)).alias("w"),
    )
    cnt = tok.groupBy("w").agg(F.count(F.lit(1)).cast("double").alias("c"))
    tot = tok.agg(F.count(F.lit(1)).cast("double").alias("nw"))
    xent = (
        tok.join(cnt, "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_word_tokens"),
            dround(F.avg(-F.log2(F.col("c") / F.col("nw"))), 4).alias("unigram_xent"),
        )
    )
    return base.join(xent, "doc_id", "left")


@probe(
    "x3c_quality_score",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CAST(length(text) AS DOUBLE) AS n,
             CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
               AS n_punct,
             CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
               AS n_digit,
             CAST(length(text) - length(regexp_replace(text, '[ ]', '', 'g')) AS DOUBLE)
               AS n_space
      FROM documents
    )
    SELECT doc_id,
           round(n_punct / n, 4) AS punct_ratio,
           round(n_digit / n, 4) AS digit_ratio,
           round(n_space / n, 4) AS space_ratio,
           round(least(n / 500.0, 1.0) * (1 - n_punct / n) * (1 - n_digit / n), 4)
             AS quality
    FROM m WHERE n > 0
    """,
)
def x3c_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring from surface statistics (length band, punctuation /
    digit / whitespace ratios) — the cheap pre-filter stage of a training
    -data pipeline."""
    d = load_table(spark, sf_dir, "documents")
    n = F.length("text").cast("double")

    def ratio(pattern: str) -> F.Column:
        return (n - F.length(F.regexp_replace("text", pattern, ""))) / n

    punct, digit, space = ratio("[.,;:!?]"), ratio("[0-9]"), ratio("[ ]")
    quality = F.least(n / 500.0, F.lit(1.0)) * (1 - punct) * (1 - digit)
    return d.filter(n > 0).select(
        "doc_id",
        dround(punct, 4).alias("punct_ratio"),
        dround(digit, 4).alias("digit_ratio"),
        dround(space, 4).alias("space_ratio"),
        dround(quality, 4).alias("quality"),
    )


@probe(
    "x3d_fingerprint",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint
      FROM documents
    )
    SELECT doc_id, fingerprint,
           CAST(count(*) OVER (PARTITION BY fingerprint) AS BIGINT) AS group_size
    FROM fp
    """,
)
def x3d_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical document fingerprint: lowercase, collapse non-alnum runs,
    md5 — duplicate groups surface as group_size > 1."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    canon = F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "))
    fp = d.select("doc_id", F.md5(canon).alias("fingerprint"))
    return fp.withColumn(
        "group_size", F.count(F.lit(1)).over(Window.partitionBy("fingerprint")).cast("long")
    )


@probe(
    "x3f_unigram_xentropy",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_WORD_RE}')) AS w
      FROM documents),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tok),
    cnt AS (SELECT w, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY w)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(-log2(c / n)), 4) AS unigram_xent
    FROM tok t JOIN cnt USING (w) CROSS JOIN tot
    GROUP BY t.doc_id
    """,
)
def x3f_unigram_xentropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram cross-entropy per document — the language-model
    perplexity filter of a training-data pipeline, with the corpus
    itself as the model: train unigram MLE counts in one aggregation,
    score each doc as mean −log2 P(w). Outlier docs (gibberish, wrong
    domain) surface with high entropy. Two shuffles (vocab count, per-doc
    mean); at open-web scale the vocab side is Zipf-small → broadcast."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.lower(F.col("text")), F.lit(_WORD_RE), 0)).alias("w"),
    )
    cnt = tok.groupBy("w").agg(F.count(F.lit(1)).cast("double").alias("c"))
    tot = tok.agg(F.count(F.lit(1)).cast("double").alias("n"))
    return (
        tok.join(cnt, "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            dround(F.avg(-F.log2(F.col("c") / F.col("n"))), 4).alias("unigram_xent"),
        )
    )


# ---------------------------------------------------------------------------
# X3e — BPE-style pre-tokenization (the GPT-2 pretokenizer family)
# ---------------------------------------------------------------------------


@probe(
    "x3e_bpe_pretokenize",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             regexp_extract_all(text, '{_BPE_RE.replace("'", "''")}') AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_bpe_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
           CASE WHEN len(toks) = 0 THEN NULL
                ELSE round(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                           / len(toks), 4) END AS avg_bpe_len
    FROM tok
    """,
)
def x3e_bpe_pretokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: the GPT-2 pre-tokenizer regex segments
    text into contraction/letter/digit/punctuation runs — the unit a
    byte-pair tokenizer would merge within. Counting these (instead of
    whitespace words, x3a) approximates LLM token budgets for corpus
    sizing. All JVM-side regexp work."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.regexp_extract_all("text", F.lit(_BPE_RE), 0).alias("toks")
    )
    n = F.size("toks")
    tot = F.expr("aggregate(transform(toks, t -> length(t)), 0, (s, v) -> s + v)")
    return tok.select(
        "doc_id",
        n.cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct_tokens"),
        F.when(n == 0, F.lit(None)).otherwise(dround(tot.cast("double") / n, 4)).alias(
            "avg_bpe_len"
        ),
    )


# ---------------------------------------------------------------------------
# PII scrubbing (x3g) — the text-side twin of the streaming pipeline's
# PAN masking (F1/U1): a training corpus must shed emails, phone
# numbers, and card numbers before anything trains on it. Pure
# regexp_replace chains — JVM-side, codegen'd, zero Python per row.
# Patterns stay inside the Java-regex ∩ RE2 dialect so the DuckDB twin
# is byte-identical.
# ---------------------------------------------------------------------------

_PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_PHONE_RE = "\\+1-[0-9]{3}-[0-9]{4}"
_PII_PAN_RE = "\\b4[0-9]{12,18}\\b"


def redact_pii(text_col: str = "text") -> F.Column:
    """Replace emails, +1 phone numbers, and 13-19-digit Visa-style
    PANs with typed placeholder tags, in one fixed order (email first:
    the PAN pattern is digit-anchored and can't overlap it, but a fixed
    order keeps the output deterministic regardless)."""
    c = F.regexp_replace(text_col, _PII_EMAIL_RE, "[EMAIL]")
    c = F.regexp_replace(c, _PII_PHONE_RE, "[PHONE]")
    return F.regexp_replace(c, _PII_PAN_RE, "[PAN]")


@probe(
    "x3g_pii_redaction",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' Contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || '; card 4' || lpad(CAST(doc_id AS VARCHAR), 12, '0')
                  || ' on file.' AS text
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
               '{_PII_EMAIL_RE}', '[EMAIL]', 'g'),
               '{_PII_PHONE_RE}', '[PHONE]', 'g'),
               '{_PII_PAN_RE}', '[PAN]', 'g') AS redacted,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL_RE}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PII_PHONE_RE}')) AS INTEGER) AS n_phones,
           CAST(len(regexp_extract_all(text, '{_PII_PAN_RE}')) AS INTEGER) AS n_pans
    FROM aug
    """,
)
def x3g_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over the corpus: PII is planted deterministically
    (an email, a phone, a PAN derived from doc_id — the synthetic
    documents carry none of their own), then redacted and counted. The
    value hash covers the full redacted text, so the oracle certifies
    every replacement site, not just the counts."""
    d = load_table(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" Contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit("; card 4"),
            F.lpad(F.col("doc_id").cast("string"), 12, "0"),
            F.lit(" on file."),
        ).alias("text"),
    )
    return aug.select(
        "doc_id",
        redact_pii("text").alias("redacted"),
        F.size(F.regexp_extract_all("text", F.lit(_PII_EMAIL_RE), 0))
        .cast("int").alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_PII_PHONE_RE), 0))
        .cast("int").alias("n_phones"),
        F.size(F.regexp_extract_all("text", F.lit(_PII_PAN_RE), 0))
        .cast("int").alias("n_pans"),
    )


# ---------------------------------------------------------------------------
# Intra-document repetition metrics (x3h) — the Gopher-style repetition
# filters every corpus pipeline applies: documents dominated by repeated
# n-grams (boilerplate, scraped menus, keyword stuffing) are down-weighted
# or dropped before training. Plain explode→groupBy relational plan:
# partial aggregation combines map-side, the shuffle key is (doc_id,
# bigram-hash)-sized, and nothing holds whole documents after the
# explode — the shape that survives a 100 TB corpus.
# ---------------------------------------------------------------------------

_REP_FLAG_T = 0.2  # duplicate-bigram fraction above which a doc is flagged


@probe(
    "x3h_repetition_metrics",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang, string_split(text, ' ') AS words
      FROM documents WHERE len(string_split(text, ' ')) >= 2),
    bg AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, len(words)),
                    i -> words[CAST(i AS INTEGER)] || ' ' || words[CAST(i + 1 AS INTEGER)])) AS gram
      FROM w),
    per_gram AS (
      SELECT doc_id, lang, gram, count(*) AS c FROM bg GROUP BY doc_id, lang, gram),
    per_doc AS (
      SELECT doc_id, lang,
             sum(c) AS n2, count(*) AS n_distinct, max(c) AS top_c
      FROM per_gram GROUP BY doc_id, lang)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(1.0 - n_distinct / CAST(n2 AS DOUBLE)), 4) AS avg_dup_frac,
           round(avg(top_c / CAST(n2 AS DOUBLE)), 4) AS avg_top_frac,
           CAST(sum(CASE WHEN 1.0 - n_distinct / CAST(n2 AS DOUBLE) > {_REP_FLAG_T}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
    FROM per_doc GROUP BY lang
    """,
)
def x3h_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3h — Gopher-style intra-document repetition: per doc, the
    fraction of word bigrams that are duplicates and the share of the
    single most frequent bigram; aggregated per language with a count
    of docs whose duplicate fraction crosses the flag threshold.
    Exploding bigrams into rows (instead of array-side distinct math)
    keeps every step a partial-aggregable groupBy."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    words = F.split("text", " ")
    docs = d.select("doc_id", "lang", words.alias("w")).filter(F.size("w") >= 2)
    grams = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1),"
                " i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"
            )
        ).alias("gram"),
    )
    per_gram = grams.groupBy("doc_id", "lang", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_doc = per_gram.groupBy("doc_id", "lang").agg(
        F.sum("c").alias("n2"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    dup_frac = F.lit(1.0) - F.col("n_distinct") / F.col("n2").cast("double")
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        dround(F.avg(dup_frac), 4).alias("avg_dup_frac"),
        dround(F.avg(F.col("top_c") / F.col("n2").cast("double")), 4).alias(
            "avg_top_frac"
        ),
        F.sum(F.when(dup_frac > _REP_FLAG_T, 1).otherwise(0))
        .cast("long")
        .alias("n_flagged"),
    )


# ---------------------------------------------------------------------------
# X3i — BM25 relevance scoring (Robertson/Spärck Jones; the ranking
# function behind quality-by-query corpus filtering and retrieval-based
# data selection). Extension beyond the reference surface.
# ---------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ["join", "window", "spark"]


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    id_cols: list[str],
    text_col: str = "text",
    k1: float = _BM25_K1,
    b: float = _BM25_B,
) -> DataFrame:
    """Per-document BM25 score for a fixed query-term list, shuffle-free
    on the corpus side:

    * per-doc term frequencies come from JVM ``filter(tokens, t -> ...)``
      lambdas over the token array — no explode, no (doc, term) shuffle;
    * the corpus statistics (N, avgdl, per-term document frequencies)
      are ONE tiny aggregate broadcast back via crossJoin;
    * the score itself is a single codegen'd expression whose per-term
      summands add in fixed list order, so an independent engine
      replaying the same expression gets bit-comparable doubles.

    At 100 TB this is a map-only pass over the corpus plus a scalar
    aggregate — the same shape as x3f's cross-entropy scorer."""
    def _matches(term: str):
        # Single-arg lambda: F.filter dispatches on arity, and a
        # two-parameter signature would receive the array INDEX as the
        # second argument.
        return lambda t: t == F.lit(term)

    toked = docs.select(
        *id_cols,
        F.regexp_extract_all(text_col, F.lit(_TOKEN_RE), 0).alias("tokens"),
    ).select(
        *id_cols,
        F.size("tokens").cast("double").alias("dl"),
        *[
            F.size(F.filter("tokens", _matches(term)))
            .cast("double")
            .alias(f"tf_{i}")
            for i, term in enumerate(terms)
        ],
    )
    # toked feeds BOTH the stats aggregate and the scored projection;
    # without pinning it, the expensive regexp tokenize pass runs twice
    # end-to-end (VERDICT r07 #5). What materializes is only the
    # projected (ids, dl, tf_*) frame — a handful of numeric columns,
    # never the token arrays or the corpus text.
    toked = toked.localCheckpoint(eager=False)
    stats = toked.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0))
            .cast("double")
            .alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = toked.crossJoin(F.broadcast(stats))
    summands = [
        F.log(
            (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
            + 1.0
        )
        * (
            (F.col(f"tf_{i}") * (k1 + 1.0))
            / (
                F.col(f"tf_{i}")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            )
        )
        for i in range(len(terms))
    ]
    score = summands[0]
    for s in summands[1:]:
        score = score + s
    return scored.select(*id_cols, score.alias("bm25_raw"))


def _bm25_oracle_sql(terms: list[str], k1: float, b: float) -> str:
    tf_cols = ",\n             ".join(
        f"CAST(len(list_filter(tokens, t -> t = '{t}')) AS DOUBLE) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_{i}"
        for i in range(len(terms))
    )
    summands = " + ".join(
        f"(ln((s.n_docs - s.df_{i} + 0.5) / (s.df_{i} + 0.5) + 1.0)"
        f" * ((t.tf_{i} * ({k1} + 1.0))"
        f" / (t.tf_{i} + {k1} * (1.0 - {b} + {b} * t.dl / s.avgdl))))"
        for i in range(len(terms))
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, lang,
             CAST(len(regexp_extract_all(text, '{_TOKEN_RE}')) AS DOUBLE) AS dl,
             {tf_cols}
      FROM (SELECT doc_id, lang, text,
                   regexp_extract_all(text, '{_TOKEN_RE}') AS tokens
            FROM documents)
    ),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl, {df_cols}
      FROM tok
    )
    SELECT t.doc_id, t.lang, round({summands}, 4) AS bm25
    FROM tok t CROSS JOIN s
    WHERE {" + ".join(f"t.tf_{i}" for i in range(len(terms)))} > 0
    """


@probe(
    "x3i_bm25",
    oracle=_bm25_oracle_sql(_BM25_TERMS, _BM25_K1, _BM25_B),
)
def x3i_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3i — BM25 score of every document against the fixed query
    {join, window, spark} (k1=1.2, b=0.75), keeping docs that match at
    least one term. Hash-checked: DuckDB replays the identical
    tokenization, tf/df/avgdl statistics, and fixed-order summation."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    scored = bm25_scores(d, _BM25_TERMS, id_cols=["doc_id", "lang"])
    return scored.filter(F.col("bm25_raw") > 0).select(
        "doc_id", "lang", dround("bm25_raw", 4).alias("bm25")
    )


# ---------------------------------------------------------------------------
# x3j — bigram LM perplexity (CCNet-style quality filter, corpus as model)
# ---------------------------------------------------------------------------

_ADD_K = 0.5


def bigram_xentropy(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", add_k: float = _ADD_K
) -> DataFrame:
    """Per-document bigram cross-entropy under an add-k-smoothed bigram
    model trained on the corpus itself (the CCNet recipe, one order up
    from x3f's unigram twin): score(d) = mean over d's bigrams of
    −log2 P(w2|w1), P(w2|w1) = (c(w1,w2)+k) / (c(w1,·)+k·V).

    Bigrams are built ARRAY-NATIVELY — ``zip_with(slice(toks, 1, n-1),
    slice(toks, 2, n-1))`` inside each row — so pairing needs no window
    sort and no shuffle; docs with < 2 word tokens score null.

    Scale: two count aggregates (bigram types, left-context types — both
    Zipf-bounded by vocab, not corpus size), one equi-join of the
    exploded bigram stream to the bigram counts, left-context counts and
    the scalar V broadcast. The corpus shuffles once, keyed on the
    bigram (fixed-width hash at scale if tokens are long).
    """
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_WORD_RE), 0)
    d = docs.select(id_col, toks.alias("ts"))
    big = d.select(
        id_col,
        F.explode(
            F.zip_with(
                F.expr("slice(ts, 1, size(ts) - 1)"),
                F.expr("slice(ts, 2, size(ts) - 1)"),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg"),
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("double").alias("c2"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).cast("double").alias("c1"))
    vocab = d.select(F.explode("ts").alias("w")).agg(
        F.countDistinct("w").cast("double").alias("v")
    )
    p = (F.col("c2") + F.lit(add_k)) / (F.col("c1") + F.lit(add_k) * F.col("v"))
    return (
        big.join(c2, ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            dround(F.avg(-F.log2(p)), 4).alias("bigram_xent"),
        )
    )


@probe(
    "x3j_bigram_xentropy",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, regexp_extract_all(lower(text), '{_WORD_RE}') AS ts
      FROM documents),
    big AS (
      SELECT doc_id, unnest(ts[1:len(ts)-1]) AS w1, unnest(ts[2:len(ts)]) AS w2
      FROM t WHERE len(ts) >= 2),
    c2 AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c2 FROM big GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(count(*) AS DOUBLE) AS c1 FROM big GROUP BY 1),
    v AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v
          FROM (SELECT unnest(ts) AS w FROM t))
    SELECT big.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(-log2((c2.c2 + {_ADD_K}) / (c1.c1 + {_ADD_K} * v.v))), 4)
             AS bigram_xent
    FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
    GROUP BY big.doc_id
    """,
)
def x3j_bigram_xentropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3j: bigram-LM perplexity scoring with the corpus as its own
    model (add-0.5 smoothing) — the quality filter one order above
    x3f's unigram cross-entropy. High-entropy docs are gibberish or
    out-of-domain; the add-k floor keeps unseen bigrams finite."""
    return bigram_xentropy(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# x3k — text normalization (NFC + casefold + whitespace collapse)
# ---------------------------------------------------------------------------


def normalize_text_col(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``norm`` — the canonical form of ``text_col``: Unicode NFC
    → lowercase → whitespace runs collapsed to single spaces → trimmed.
    The first stop of any dedup/hashing pipeline (exact-dup digests are
    meaningless if 'é' composed and 'é' decomposed hash apart).

    NFC runs in an Arrow-batched pandas UDF (`unicodedata.normalize`,
    stdlib — Spark exposes no normalizer builtin); case/whitespace stay
    JVM-side. The UDF is a pure map over one string column: no shuffle,
    vectorized batches, scale-neutral.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    return df.withColumn(
        "norm",
        F.trim(
            F.regexp_replace(F.lower(_nfc(F.col(text_col))), r"\s+", " ")
        ),
    )


@probe(
    "x3k_normalize",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(
                 lower(nfc_normalize(text || ' E' || chr(769) || '  x')),
                 '\\s+', ' ', 'g'))) AS norm_digest,
           CAST(length(trim(regexp_replace(
                 lower(nfc_normalize(text || ' E' || chr(769) || '  x')),
                 '\\s+', ' ', 'g'))) AS BIGINT) AS norm_len
    FROM documents
    """,
)
def x3k_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3k: canonical text normalization, digest-certified. The corpus
    is ASCII, so the probe appends a DECOMPOSED 'E' + combining acute
    (U+0301) plus ragged spaces inside the query — NFC must compose it
    to é (U+00E9) and the collapse must eat the double space, or the
    md5 diverges; the oracle replays with DuckDB's native
    nfc_normalize, an independent NFC implementation."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "text", F.concat(F.col("text"), F.lit(" É  x"))
    )
    out = normalize_text_col(d)
    return out.select(
        "doc_id",
        F.md5("norm").alias("norm_digest"),
        F.length("norm").cast("long").alias("norm_len"),
    )


# ---------------------------------------------------------------------------
# Checksum-validated PII detection (x3l) — the precision layer regex
# alone cannot give: a 16-digit pattern is only a card number if its
# Luhn checksum holds, and scrubbing every digit run that LOOKS like a
# card destroys order ids, ISBNs, and tracking numbers. x3g handles the
# pattern-only sweep; this operator extracts card-shaped candidates and
# keeps/masks only those whose mod-10 checksum verifies — entirely with
# nested higher-order functions (regexp_extract_all -> transform ->
# aggregate -> filter -> aggregate/replace), JVM-side, codegen'd,
# map-only. The DuckDB oracle replays the identical candidate walk and
# checksum arithmetic, so the hash certifies the digit math — not just
# the regex — across engines.
# ---------------------------------------------------------------------------

#: Card-shaped candidate: four groups of four digits, uniformly spaced,
#: dashed, or contiguous. Java-regex ∩ RE2 dialect.
PII_CARD_CANDIDATE_RE = r"\b(?:\d{4} ){3}\d{4}\b|\b(?:\d{4}-){3}\d{4}\b|\b\d{16}\b"

#: Per-candidate Luhn verdict over a struct ``s`` with field ``d`` (the
#: candidate's digits): double every second digit from the RIGHT,
#: subtract 9 when the doubled digit exceeds 9 (2d - 9·[d>4]), sum,
#: check mod 10. Pure SparkSQL higher-order functions.
_LUHN_OK = """
    aggregate(
      transform(sequence(0, length(s.d) - 1),
        i -> named_struct(
          'dig', ascii(substr(s.d, length(s.d) - i, 1)) - 48,
          'dbl', i % 2 = 1)),
      0,
      (acc, t) -> acc + CASE WHEN t.dbl
                             THEN 2 * t.dig - IF(t.dig > 4, 9, 0)
                             ELSE t.dig END
    ) % 10 = 0
"""


def luhn_card_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``n_card_candidates`` (card-shaped matches), ``n_cards_valid``
    (candidates whose Luhn checksum verifies), and ``text_clean`` (the
    text with ONLY the checksum-valid candidates replaced by <CARD> —
    checksum-failing lookalikes are preserved verbatim). One projection
    over the corpus scan; no Python, no shuffle, no UDF."""
    # Spark SQL string literals consume one level of backslash escaping
    # (unless escapedStringLiterals is on), so the pattern doubles its
    # backslashes on the way into expr(); DuckDB's standard strings do
    # not escape, so the oracle uses the pattern verbatim.
    sql_re = PII_CARD_CANDIDATE_RE.replace("\\", "\\\\")
    cands = f"regexp_extract_all({text_col}, '{sql_re}', 0)"
    structs = (
        f"transform({cands}, x -> named_struct("
        f"'raw', x, 'd', regexp_replace(x, '[^0-9]', '')))"
    )
    valid_raw = f"transform(filter({structs}, s -> {_LUHN_OK}), s -> s.raw)"
    return df.withColumns(
        {
            "n_card_candidates": F.expr(f"size({cands})"),
            "n_cards_valid": F.expr(f"size({valid_raw})"),
            "text_clean": F.expr(
                f"aggregate({valid_raw}, {text_col}, "
                f"(acc, x) -> replace(acc, x, '<CARD>'))"
            ),
        }
    )


#: DuckDB twin of ``_LUHN_OK`` (1-based string indexing, struct_pack).
_LUHN_OK_DUCK = """
    list_sum(list_transform(range(0, length(s.d)),
      i -> CASE WHEN i % 2 = 1
                THEN 2 * CAST(s.d[length(s.d) - i] AS INTEGER)
                     - CASE WHEN CAST(s.d[length(s.d) - i] AS INTEGER) > 4
                            THEN 9 ELSE 0 END
                ELSE CAST(s.d[length(s.d) - i] AS INTEGER) END)) % 10 = 0
"""


@probe(
    "x3l_luhn_card_scrub",
    oracle=rf"""
    WITH inj AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 7 = 0
                     THEN ' card 4111 1111 1111 1111 ok' ELSE '' END
             || CASE WHEN doc_id % 11 = 0
                     THEN ' bad 4111 1111 1111 1112 no' ELSE '' END
             || CASE WHEN doc_id % 13 = 0
                     THEN ' alt 5500-0000-0000-0004 x' ELSE '' END
             AS text
      FROM documents),
    c AS (
      SELECT doc_id, text,
             list_transform(
               regexp_extract_all(text,
                 '\b(?:\d{{4}} ){{3}}\d{{4}}\b|\b(?:\d{{4}}-){{3}}\d{{4}}\b|\b\d{{16}}\b'),
               x -> struct_pack(raw := x,
                                d := regexp_replace(x, '[^0-9]', '', 'g')))
               AS structs
      FROM inj),
    v AS (
      SELECT doc_id, text, structs,
             list_transform(list_filter(structs, s -> {_LUHN_OK_DUCK}),
                            s -> s.raw) AS valid
      FROM c)
    SELECT doc_id,
           CAST(len(structs) AS INTEGER) AS n_card_candidates,
           CAST(len(valid) AS INTEGER) AS n_cards_valid,
           CAST(length(list_reduce(list_prepend(text, valid),
                (acc, x) -> replace(acc, x, '<CARD>'))) AS BIGINT) AS clean_len,
           md5(list_reduce(list_prepend(text, valid),
                (acc, x) -> replace(acc, x, '<CARD>'))) AS clean_hash
    FROM v
    """,
)
def x3l_luhn_card_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3l — checksum-validated card scrubbing end-to-end: docs are
    injected with a Luhn-VALID spaced card (doc_id % 7), a Luhn-INVALID
    lookalike differing in one digit (doc_id % 11), and a valid dashed
    card (doc_id % 13); the operator must count all candidates, keep
    only the checksum-valid ones, and scrub exactly those. The value
    hash covers the scrubbed text's md5, so a single mis-doubled digit,
    a wrong direction (left-to-right instead of right-to-left), or a
    scrubbed lookalike changes the answer — both engines replay the
    full candidate walk + mod-10 arithmetic independently."""
    d = load_table(spark, sf_dir, "documents")
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0, F.lit(" card 4111 1111 1111 1111 ok")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0, F.lit(" bad 4111 1111 1111 1112 no")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 13 == 0, F.lit(" alt 5500-0000-0000-0004 x")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return luhn_card_scrub(injected).select(
        "doc_id",
        "n_card_candidates",
        "n_cards_valid",
        F.length("text_clean").alias("clean_len"),
        F.md5(F.col("text_clean")).alias("clean_hash"),
    )


# ---------------------------------------------------------------------------
# x3m — corpus vocabulary statistics (Zipf/Heaps panel): the
# corpus-linguistics card every training-data report carries — total
# tokens, vocabulary size, hapax-legomena fraction (the Heaps-law
# signal: a high hapax share means vocabulary is still growing with
# corpus size), the modal term, and the fitted Zipf slope (log-log
# least squares over the top-100 ranks; natural text sits near -1).
# One exact term-frequency aggregation over the corpus — the identical
# shuffle x3f/x3i already pay — then everything else is arithmetic
# over a 100-row frame: at 100 TB the vocab aggregation is the only
# data-sized pass and it is map-side combinable.
# ---------------------------------------------------------------------------

_X3M_TOP = 100


@probe(
    "x3m_vocab_zipf",
    oracle=f"""
    WITH terms AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents),
    vocab AS (SELECT term, count(*) AS freq FROM terms GROUP BY 1),
    s AS (SELECT CAST(sum(freq) AS BIGINT) AS total_tokens,
                 CAST(count(*) AS BIGINT) AS vocab_size,
                 CAST(count(*) FILTER (WHERE freq = 1) AS BIGINT)
                   AS hapax_count
          FROM vocab),
    top AS (SELECT term, freq,
                   row_number() OVER (ORDER BY freq DESC, term) AS rank
            FROM vocab QUALIFY rank <= {_X3M_TOP}),
    reg AS (SELECT count(*) AS n, sum(ln(rank)) AS sx, sum(ln(freq)) AS sy,
                   sum(ln(rank) * ln(freq)) AS sxy,
                   sum(ln(rank) * ln(rank)) AS sxx
            FROM top),
    t1 AS (SELECT term AS top1_term, CAST(freq AS BIGINT) AS top1_freq
           FROM top WHERE rank = 1)
    SELECT total_tokens, vocab_size, hapax_count,
           round(hapax_count / CAST(vocab_size AS DOUBLE), 4) AS hapax_frac,
           top1_term, top1_freq,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS zipf_slope
    FROM s, t1, reg
    """,
)
def x3m_vocab_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x3m — one-row corpus vocabulary card (block comment above).
    Token segmentation is the engine's standard alnum regex over
    lowered text (identical literal in both engines); the Zipf slope
    is closed-form least squares ((nΣxy − ΣxΣy)/(nΣx² − (Σx)²)) over
    ln(rank), ln(freq) of the top-{_X3M_TOP} terms — deterministic
    tie-break (freq DESC, term ASC), so the whole panel hash-replays."""
    d = load_table(spark, sf_dir, "documents")
    terms = d.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
        ).alias("term")
    )
    vocab = terms.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    s = vocab.agg(
        F.sum("freq").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
        F.count(F.when(F.col("freq") == 1, F.lit(1))).alias("hapax_count"),
    )
    from pyspark.sql import Window

    top = vocab.orderBy(F.desc("freq"), F.asc("term")).limit(_X3M_TOP)
    wr = Window.partitionBy().orderBy(F.desc("freq"), F.asc("term"))
    ranked = top.withColumn("rank", F.row_number().over(wr)).select(
        "term",
        "freq",
        "rank",
        F.log(F.col("rank").cast("double")).alias("lx"),
        F.log(F.col("freq").cast("double")).alias("ly"),
    )
    reg = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
    )
    t1 = ranked.filter(F.col("rank") == 1).select(
        F.col("term").alias("top1_term"), F.col("freq").alias("top1_freq")
    )
    return (
        s.crossJoin(F.broadcast(t1))
        .crossJoin(F.broadcast(reg))
        .select(
            "total_tokens",
            "vocab_size",
            "hapax_count",
            dround(
                F.col("hapax_count") / F.col("vocab_size").cast("double"), 4
            ).alias("hapax_frac"),
            "top1_term",
            "top1_freq",
            dround(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
                4,
            ).alias("zipf_slope"),
        )
    )


# ---------------------------------------------------------------------------
# x3n — boilerplate n-gram scrub accounting: the CCNet/RefinedWeb-style
# pass that measures how much of each document is made of word
# n-grams repeated across the corpus (navigation chrome, license
# headers, templated spam — the text that exact and MinHash dedup both
# miss because the HOST documents differ). Counting is the honest
# first stage: the removal decision is a thresholded filter over
# exactly these columns.
# ---------------------------------------------------------------------------

_X3N_N = 5  # words per gram
_X3N_DF = 2  # a gram in >= this many distinct docs is boilerplate


@probe(
    "x3n_boilerplate_ngram_scrub",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    g AS (
      SELECT doc_id, array_to_string(ws[i:i + {_X3N_N - 1}], ' ') AS gram
      FROM w, LATERAL unnest(range(1, len(ws) - {_X3N_N - 2})) AS t(i)),
    df AS (
      SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY 1),
    j AS (
      SELECT g.doc_id, df.df FROM g JOIN df USING (gram))
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(*) FILTER (WHERE df >= {_X3N_DF}) AS BIGINT)
             AS n_boilerplate,
           round(count(*) FILTER (WHERE df >= {_X3N_DF})
                 / CAST(count(*) AS DOUBLE), 4) AS boilerplate_ratio
    FROM j GROUP BY doc_id
    """,
)
def x3n_boilerplate_ngram_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x3n — per-document boilerplate accounting over {_X3N_N}-word
    grams: a gram occurring in >= {_X3N_DF} distinct documents is
    corpus boilerplate; each doc reports its gram count, boilerplate
    positions, and ratio. Two shuffles, both key-bounded: the
    doc-frequency groupBy (partial-aggregated — dup grams combine
    map-side) and the flag-back join. At 100 TB the flag-back side is
    the DISTINCT boilerplate-gram set, which the frequency threshold
    keeps orders of magnitude smaller than the corpus (templated text
    concentrates); it broadcasts here, and when a pathological corpus
    outgrows the broadcast the same plan degrades to a shuffle join on
    the gram hash — never an all-pairs structure. The test corpus
    exercises the threshold from both sides (docs with repeated grams
    and fully-unique docs), so the hash certifies the windowing
    arithmetic and the threshold boundary at once."""
    from realtime_financial_transactions_data_pipeline_spark.functions.compat import dround
    from realtime_financial_transactions_data_pipeline_spark.tables import widen_scan

    # widen_scan (r18): the gram transform+explode is the probe's
    # dominant compute and the single-file scan feeds it (twice — the
    # df aggregate and the flag-back join re-derive it) on one task.
    d = widen_scan(load_table(spark, sf_dir, "documents")).select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    grams = d.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("ws") >= _X3N_N,
                F.expr(
                    f"transform(sequence(0, size(ws) - {_X3N_N}),"
                    f" i -> array_join(slice(ws, i + 1, {_X3N_N}), ' '))"
                ),
            ).otherwise(F.expr("array()"))
        ).alias("gram"),
    )
    df = grams.groupBy("gram").agg(
        F.countDistinct("doc_id").alias("df")
    )
    bp = df.filter(F.col("df") >= _X3N_DF).select(
        "gram", F.lit(True).alias("_bp")
    )
    return (
        grams.join(F.broadcast(bp), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_bp").alias("n_boilerplate"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_boilerplate",
            dround(
                F.col("n_boilerplate") / F.col("n_grams").cast("double"), 4
            ).alias("boilerplate_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# X27 — vocabulary coverage curve (tokenizer sizing): for a frequency-
# ranked vocabulary, the minimal vocab size whose cumulative frequency
# covers 90 / 95 / 99 % of all token occurrences, plus the coverage a
# fixed budget (top-1000) buys. THE sizing analytic for tokenizer and
# embedding-table design — x3m fits the Zipf slope, this answers the
# decision question the slope implies. One term-count shuffle, then the
# rank + running-sum ride the two-phase range-partitioned pattern
# (scale.pinned_range_layout): per-partition row_number and freq-cumsum
# plus driver prefix-summed offsets from ONE bounded #partitions-row
# collect — no `OVER (ORDER BY …)` SinglePartition collapse anywhere.
# The vocab relation is "only unique terms", but open-web corpora are
# hapax-heavy (10⁸–10⁹ terms at 100 TB), so the global window the r15
# form used is exactly the shape that dies at scale. Ties in frequency
# rank by term so both engines walk the identical cumulative order.
# ---------------------------------------------------------------------------


@probe(
    "x27_vocab_coverage",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(regexp_extract_all(lower(text), '{_TOKEN_RE}')) AS term
      FROM documents),
    tc AS (SELECT term, count(*) AS freq FROM tok GROUP BY term),
    ranked AS (
      SELECT term, freq,
             row_number() OVER (ORDER BY freq DESC, term) AS rnk,
             sum(freq) OVER (ORDER BY freq DESC, term
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum
      FROM tc),
    tot AS (SELECT sum(freq) AS total FROM tc)
    SELECT CAST(tot.total AS BIGINT) AS total_tokens,
           CAST((SELECT count(*) FROM tc) AS BIGINT) AS vocab_size,
           CAST(min(CASE WHEN cum >= 0.90 * tot.total THEN rnk END)
                AS BIGINT) AS v90,
           CAST(min(CASE WHEN cum >= 0.95 * tot.total THEN rnk END)
                AS BIGINT) AS v95,
           CAST(min(CASE WHEN cum >= 0.99 * tot.total THEN rnk END)
                AS BIGINT) AS v99,
           round(max(CASE WHEN rnk <= 1000 THEN cum ELSE 0 END)
                 / CAST(tot.total AS DOUBLE), 4) AS top1000_coverage
    FROM ranked, tot GROUP BY tot.total
    """,
)
def x27_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X27 — vocabulary coverage curve (block comment above). The
    rank + cumulative-frequency walk runs as the two-phase
    range-partitioned pattern (in-partition windows keyed by _pid plus
    driver prefix-summed offsets), so no task ever holds more than one
    range partition of the vocab — hapax-heavy corpora make the vocab
    relation corpus-scale, and the r15 global window collapsed it to
    one task."""
    from pyspark.sql import Window

    from realtime_financial_transactions_data_pipeline_spark.operators.scale import (
        pinned_range_layout,
    )

    tok = load_table(spark, sf_dir, "documents").select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(_TOKEN_RE), 0)
        ).alias("term")
    )
    tc = tok.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    order = [F.col("freq").desc(), F.col("term")]
    parted = pinned_range_layout(tc, order, 32)
    # ONE bounded collect (a row per partition, never per term) feeds
    # BOTH prefix maps: rows-before-partition (rank offsets) and
    # freq-before-partition (cumsum offsets) — plus the grand totals.
    stats = sorted(
        parted.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("freq").alias("s"))
        .collect(),
        key=lambda r: r._pid,
    )
    rank_off, cum_off, acc_n, acc_s = {}, {}, 0, 0
    for row in stats:
        rank_off[row._pid] = acc_n
        cum_off[row._pid] = acc_s
        acc_n += row.n
        acc_s += row.s
    rank_map = F.expr(
        "map(" + ",".join(f"{p}, {o}L" for p, o in rank_off.items()) + ")"
    )
    cum_map = F.expr(
        "map(" + ",".join(f"{p}, {o}L" for p, o in cum_off.items()) + ")"
    )
    w = Window.partitionBy("_pid").orderBy(*order)
    ranked = parted.select(
        "freq",
        (F.element_at(rank_map, F.col("_pid")) + F.row_number().over(w)).alias(
            "rnk"
        ),
        (
            F.element_at(cum_map, F.col("_pid"))
            + F.sum("freq").over(w.rowsBetween(Window.unboundedPreceding, 0))
        ).alias("cum"),
    )
    # Totals are the prefix-sum grand totals — already collected above;
    # grouping by the literal keeps the empty-corpus shape (0 rows) the
    # oracle's `FROM ranked, tot GROUP BY tot.total` produces.
    return (
        ranked.groupBy(F.lit(acc_s).cast("long").alias("total"))
        .agg(
            F.max(F.lit(acc_n)).cast("long").alias("vocab_size"),
            F.min(
                F.when(F.col("cum") >= 0.90 * F.lit(acc_s), F.col("rnk"))
            ).cast("long").alias("v90"),
            F.min(
                F.when(F.col("cum") >= 0.95 * F.lit(acc_s), F.col("rnk"))
            ).cast("long").alias("v95"),
            F.min(
                F.when(F.col("cum") >= 0.99 * F.lit(acc_s), F.col("rnk"))
            ).cast("long").alias("v99"),
            dround(
                F.max(
                    F.when(F.col("rnk") <= 1000, F.col("cum")).otherwise(0)
                ).cast("double")
                / F.lit(float(acc_s)),
                4,
            ).alias("top1000_coverage"),
        )
        .select(
            F.col("total").alias("total_tokens"),
            "vocab_size",
            "v90",
            "v95",
            "v99",
            "top1000_coverage",
        )
    )


# ---------------------------------------------------------------------------
# X3O — real BPE: train merges on the corpus, then ENCODE with them.
# x3e stops at pretokenization and every token-count operator in the
# family approximates by whitespace/alnum segmentation; this is the
# missing mechanism — learned subword merges (Sennrich et al. 2016,
# the algorithm behind GPT-2/RoBERTa vocabularies) — expressed
# Spark-first:
#   pass 1 (corpus-scale): ONE shuffle — the word histogram
#     (partial-aggregable groupBy over exploded alnum tokens).
#   training (vocab-scale): everything after the top-K cut runs on a
#     K-row frame. Each of the M merge rounds counts adjacent symbol
#     pairs weighted by word frequency (array ops, codegen'd), takes
#     the argmax with a deterministic (count DESC, pair ASC) tie-break
#     — a 1-row bounded collect, M scalars total, the k-means-probe
#     collect class — and applies the merge as a sentinel-delimited
#     string replace.
#   pass 2 (corpus-scale): tokens-per-word come from BROADCAST-joining
#     the K encoded words back onto the exploded corpus — the
#     distinct-word memoization trick that makes real-BPE token
#     counting affordable at 100 TB (encode K words once, never
#     re-encode per occurrence); out-of-vocab words fall back to
#     char count (the worst-case no-merges encoding), deterministic
#     in both engines.
# Segmentations live as '·'-SENTINELED strings ('·h·e·l·l·o·') so a
# merge is replace('·a·b·' -> '·ab·'): the sentinels make symbol
# boundaries unspoofable (no merge can span a multi-char symbol), and
# leftmost-nonoverlapping replace() semantics — identical in Spark
# and DuckDB — are exactly BPE's apply-everywhere merge step. The
# oracle unrolls all M training rounds as chained CTEs, so the hash
# certifies the learned merge TABLE (fingerprint column), the
# encoding, and both corpus passes end to end.
# ---------------------------------------------------------------------------

_X3O_SEP = "·"  # '·' (U+00B7); corpus words are alnum, can't collide
_X3O_VOCAB = 2000
_X3O_MERGES = 6


def bpe_train_merges(
    vocab: DataFrame, n_merges: int = _X3O_MERGES, sep: str = _X3O_SEP
) -> tuple[DataFrame, list[str]]:
    """Learn ``n_merges`` BPE merges over a (word, cnt) frame; returns
    (the frame with the final ``seg`` segmentation column, the ordered
    merge list as 'a·b' strings). Driver cost: n_merges 1-row
    collects; executor cost: n_merges passes over the K-row vocab."""
    v = vocab.withColumn(
        "seg",
        F.concat(
            F.lit(sep), F.array_join(F.split("word", ""), sep), F.lit(sep)
        ),
    ).localCheckpoint(eager=True)
    syms = f"split(btrim(seg, '{sep}'), '{sep}')"
    pair_expr = (
        f"CASE WHEN size({syms}) < 2 THEN array() "
        f"ELSE transform(sequence(1, size({syms}) - 1), "
        f"j -> concat(element_at({syms}, j), '{sep}', "
        f"element_at({syms}, j + 1))) END"
    )
    merges: list[str] = []
    for _ in range(n_merges):
        top = (
            v.select("cnt", F.explode(F.expr(pair_expr)).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), "pair")
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair = top[0].pair
        merges.append(pair)
        v = v.withColumn(
            "seg",
            F.replace(
                F.col("seg"),
                F.lit(sep + pair + sep),
                F.lit(sep + pair.replace(sep, "") + sep),
            ),
        )
    return v, merges


def _x3o_oracle() -> str:
    # Stage shape tuned for DuckDB 1.0 (r17 battery-wall trim, 36.9 s
    # -> see test log): each w{i} is MATERIALIZED (it feeds both the
    # next pair count and the next rewrite — unhinted, the inliner
    # duplicates the whole prefix chain per reference, exponential in
    # stages), and the symbol split is computed ONCE per row in s{i}
    # instead of three times inside the pair lambda.
    s = "chr(183)"
    pair_list = (
        "CASE WHEN len(sy) < 2 THEN [] "
        "ELSE list_transform(range(1, len(sy)), "
        f"j -> sy[j] || {s} || sy[j+1]) END"
    )
    stages = []
    for i in range(1, _X3O_MERGES + 1):
        stages.append(
            f"""s{i} AS (
      SELECT cnt, string_split(trim(seg, {s}), {s}) AS sy FROM w{i - 1}),
    p{i} AS (
      SELECT pair, sum(cnt) AS c FROM (
        SELECT cnt, unnest({pair_list}) AS pair FROM s{i}) GROUP BY pair),
    m{i} AS (SELECT pair FROM p{i} ORDER BY c DESC, pair LIMIT 1),
    w{i} AS MATERIALIZED (
      SELECT word, cnt,
             replace(seg, {s} || (SELECT pair FROM m{i}) || {s},
                     {s} || replace((SELECT pair FROM m{i}), {s}, '') || {s})
               AS seg
      FROM w{i - 1})"""
        )
    fp = " || ',' || ".join(
        f"(SELECT pair FROM m{i})" for i in range(1, _X3O_MERGES + 1)
    )
    stage_sql = ",\n    ".join(stages)
    return f"""
    WITH wall AS (
      SELECT word, count(*) AS cnt FROM (
        SELECT unnest(regexp_extract_all(lower(text), '{_TOKEN_RE}')) AS word
        FROM documents)
      GROUP BY word),
    vocab AS (SELECT word, cnt FROM wall ORDER BY cnt DESC, word
              LIMIT {_X3O_VOCAB}),
    w0 AS (
      SELECT word, cnt,
             {s} || array_to_string(string_split(word, ''), {s}) || {s} AS seg
      FROM vocab),
    {stage_sql},
    enc AS (SELECT word,
                   len(string_split(trim(seg, {s}), {s})) AS toks
            FROM w{_X3O_MERGES}),
    docw AS (
      SELECT doc_id, lang,
             unnest(regexp_extract_all(lower(text), '{_TOKEN_RE}')) AS word
      FROM documents),
    joined AS (
      SELECT d.lang, coalesce(e.toks, length(d.word)) AS toks,
             length(d.word) AS chars
      FROM docw d LEFT JOIN enc e USING (word)),
    panel AS (
      SELECT lang, count(*) AS n_word_instances,
             sum(toks) AS bpe_tokens, sum(chars) AS char_tokens
      FROM joined GROUP BY lang),
    nd AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang)
    SELECT nd.lang,
           CAST(nd.n_docs AS BIGINT) AS n_docs,
           CAST(coalesce(p.n_word_instances, 0) AS BIGINT)
             AS n_word_instances,
           CAST(coalesce(p.bpe_tokens, 0) AS BIGINT) AS bpe_tokens,
           CAST(coalesce(p.char_tokens, 0) AS BIGINT) AS char_tokens,
           md5({fp}) AS merges_fp
    FROM nd LEFT JOIN panel p USING (lang)
    """


@probe("x3o_bpe_encode", oracle=_x3o_oracle())
def x3o_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3O — train 6 BPE merges on the top-2000 word vocabulary, then
    count real BPE tokens per language via the broadcast encoded-vocab
    join (block comment above). The merges_fp column pins the learned
    merge table itself — a single different merge anywhere fails the
    hash."""
    import hashlib

    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(_TOKEN_RE), 0)
        ).alias("word")
    )
    hist = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = hist.orderBy(F.col("cnt").desc(), "word").limit(_X3O_VOCAB)
    v, merges = bpe_train_merges(vocab)
    sep = _X3O_SEP
    enc = v.select(
        "word",
        F.size(F.split(F.expr(f"btrim(seg, '{sep}')"), sep)).alias("toks"),
    )
    fp = hashlib.md5(",".join(merges).encode("utf-8")).hexdigest()
    docw = d.select(
        "lang",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(_TOKEN_RE), 0)
        ).alias("word"),
    )
    joined = docw.join(F.broadcast(enc), "word", "left").select(
        "lang",
        F.coalesce(F.col("toks"), F.length("word")).alias("toks"),
        F.length("word").alias("chars"),
    )
    panel = joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_word_instances"),
        F.sum("toks").cast("long").alias("bpe_tokens"),
        F.sum("chars").cast("long").alias("char_tokens"),
    )
    nd = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    return nd.join(panel, "lang", "left").select(
        "lang",
        "n_docs",
        F.coalesce("n_word_instances", F.lit(0)).alias("n_word_instances"),
        F.coalesce("bpe_tokens", F.lit(0)).alias("bpe_tokens"),
        F.coalesce("char_tokens", F.lit(0)).alias("char_tokens"),
        F.lit(fp).alias("merges_fp"),
    )


