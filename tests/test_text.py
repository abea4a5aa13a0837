"""X3i BM25: hand-computed scores and the shuffle-free plan."""

from __future__ import annotations


def test_bm25_matches_hand_computation(spark):
    """Three tiny docs, one query term - verify the exact BM25 value."""
    import math

    from realtime_financial_transactions_data_pipeline_spark.operators.text import (
        bm25_scores,
    )

    docs = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "dog dog dog"), (3, "cat bird fish bird")],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r.bm25_raw
        for r in bm25_scores(docs, ["cat"], id_cols=["doc_id"]).collect()
    }
    n_docs, avgdl, df = 3.0, (3 + 3 + 4) / 3.0, 2.0
    idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def score(tf, dl):
        return idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))

    assert abs(out[1] - score(2, 3)) < 1e-12
    assert abs(out[2] - score(0, 3)) < 1e-12  # no match -> 0
    assert abs(out[3] - score(1, 4)) < 1e-12


def test_bm25_plan_is_map_only_plus_scalar_agg(spark, sf_dir):
    """The corpus side must never shuffle: no exchange other than the
    single-row stats aggregate, tf via array lambdas (no Generate/
    explode), stats broadcast back."""
    from realtime_financial_transactions_data_pipeline_spark.operators.text import (
        x3i_bm25,
    )
    from realtime_financial_transactions_data_pipeline_spark.plans import inspect

    df = x3i_bm25(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    assert "Generate" not in plan  # tf computed array-side, not exploded
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert not inspect.has_python_row_udf(df)


def test_bigram_xentropy_hand_case(spark):
    import math

    from realtime_financial_transactions_data_pipeline_spark.operators.text import (
        bigram_xentropy,
    )

    # Corpus: d1 = "a b a b" (bigrams ab, ba, ab), d2 = "a" (no bigrams).
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in bigram_xentropy(docs, add_k=0.5).collect()}
    # V = 2 (a, b); c(a,b)=2, c(b,a)=1; c(a,.)=2, c(b,.)=1.
    p_ab = (2 + 0.5) / (2 + 0.5 * 2)
    p_ba = (1 + 0.5) / (1 + 0.5 * 2)
    want = -(2 * math.log2(p_ab) + math.log2(p_ba)) / 3
    assert out[1].n_bigrams == 3
    assert abs(out[1].bigram_xent - round(want, 4)) < 1e-9
    assert 2 not in out  # <2 tokens -> no bigrams -> absent


def test_normalize_text_col_nfc_and_whitespace(spark):
    from realtime_financial_transactions_data_pipeline_spark.operators.text import (
        normalize_text_col,
    )

    composed = "café"            # é as U+00E9
    decomposed = "café"         # e + combining acute
    docs = spark.createDataFrame(
        [(1, f"  {composed}   BAR "), (2, f"{decomposed} bar"), (3, None)],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.norm for r in normalize_text_col(docs).collect()}
    assert out[1] == out[2] == "café bar"  # NFC unified + collapsed
    assert out[3] is None


def test_luhn_card_scrub_validates_checksum(spark):
    """Candidates are counted by shape, kept by checksum: a one-digit
    perturbation of a valid card must survive scrubbing untouched."""
    from realtime_financial_transactions_data_pipeline_spark.operators.text import (
        luhn_card_scrub,
    )

    rows = [
        (1, "pay 4111 1111 1111 1111 now"),            # valid (spaced)
        (2, "pay 4111 1111 1111 1112 now"),            # invalid lookalike
        (3, "a 5500-0000-0000-0004 b 4111111111111111 c"),  # 2 valid formats
        (4, "order 1234 5678 9012 3456 is not a card"),     # invalid
        (5, "no digits here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in luhn_card_scrub(df).collect()}
    assert (got[1].n_card_candidates, got[1].n_cards_valid) == (1, 1)
    assert got[1].text_clean == "pay <CARD> now"
    assert (got[2].n_card_candidates, got[2].n_cards_valid) == (1, 0)
    assert got[2].text_clean == rows[1][1]  # lookalike preserved verbatim
    assert (got[3].n_card_candidates, got[3].n_cards_valid) == (2, 2)
    assert got[3].text_clean == "a <CARD> b <CARD> c"
    assert (got[4].n_card_candidates, got[4].n_cards_valid) == (1, 0)
    assert (got[5].n_card_candidates, got[5].n_cards_valid) == (0, 0)


def test_x3m_vocab_panel_matches_python(spark):
    """Vocabulary card recomputed independently: exact counts via
    collections.Counter over the same regex tokens, slope via the
    closed-form least squares in pure Python."""
    import math
    import re
    from collections import Counter

    import pandas as pd

    from realtime_financial_transactions_data_pipeline_spark.operators.text import (
        x3m_vocab_zipf,
    )

    sf = "/root/testdata/sf0.001"
    texts = pd.read_parquet(sf + "/documents.parquet")["text"]
    c = Counter()
    for t in texts:
        c.update(re.findall(r"[a-z0-9]+", t.lower()))
    row = x3m_vocab_zipf(spark, sf).collect()[0]
    assert row.total_tokens == sum(c.values())
    assert row.vocab_size == len(c)
    hapax = sum(1 for v in c.values() if v == 1)
    assert row.hapax_count == hapax
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    assert (row.top1_term, row.top1_freq) == top[0]
    xs = [math.log(i + 1) for i in range(len(top))]
    ys = [math.log(f) for _, f in top]
    n = float(len(top))
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(row.zipf_slope - slope) < 1e-3, (row.zipf_slope, slope)


def test_x3n_boilerplate_brute_force(spark):
    """x3n parity against a from-scratch Python recompute at sf0.001:
    5-gram windows, doc-frequency >= 2 flags, per-doc counts and
    4-dp ratio — plus the planted-structure sanity that near-dup pairs
    (every 13th doc copies its predecessor) sit at ratio ~1.0."""
    from collections import Counter, defaultdict

    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.text import (
        _X3N_DF,
        _X3N_N,
        x3n_boilerplate_ngram_scrub,
    )

    sf = "/root/testdata/sf0.001"
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    df_count: Counter = Counter()
    per_doc: dict[int, list[str]] = {}
    for doc_id, text in docs:
        ws = text.split(" ")
        grams = [
            " ".join(ws[i : i + _X3N_N]) for i in range(len(ws) - _X3N_N + 1)
        ]
        per_doc[doc_id] = grams
        for g in set(grams):
            df_count[g] += 1
    bp = {g for g, c in df_count.items() if c >= _X3N_DF}
    expect = {}
    for doc_id, grams in per_doc.items():
        n = len(grams)
        nb = sum(1 for g in grams if g in bp)
        expect[doc_id] = (n, nb, round(nb / n, 4))
    got = {
        r.doc_id: (r.n_grams, r.n_boilerplate, r.boilerplate_ratio)
        for r in x3n_boilerplate_ngram_scrub(spark, sf).collect()
    }
    assert got == expect
    # non-degeneracy: the threshold boundary is exercised from BOTH
    # sides on this fixture (some docs carry repeated grams, some are
    # fully unique) — otherwise the hash couldn't certify the flag.
    ratios = [v[2] for v in got.values()]
    assert any(r > 0 for r in ratios) and any(r == 0 for r in ratios)


def test_x27_coverage_monotone_and_bruteforce(spark):
    """v90 <= v95 <= v99 <= vocab_size, and every number equals a
    pure-Python frequency-rank replay at sf0.001."""
    import re
    from collections import Counter

    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.text import (
        x27_vocab_coverage,
    )

    sf = "/root/testdata/sf0.001"
    docs = duckdb.sql(
        f"SELECT text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    freq = Counter()
    for (t,) in docs:
        freq.update(re.findall(r"[a-zA-Z0-9]+", t.lower()))
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(freq.values())
    cum, v, cov1000 = 0, {}, 0.0
    for i, (term, f) in enumerate(ranked, 1):
        cum += f
        for q in (0.90, 0.95, 0.99):
            if q not in v and cum >= q * total:
                v[q] = i
        if i <= 1000:
            cov1000 = cum / total
    r = x27_vocab_coverage(spark, sf).collect()[0]
    assert (r.total_tokens, r.vocab_size) == (total, len(ranked))
    assert (r.v90, r.v95, r.v99) == (v[0.90], v[0.95], v[0.99])
    assert abs(r.top1000_coverage - round(cov1000, 4)) < 1e-9
    assert r.v90 <= r.v95 <= r.v99 <= r.vocab_size
