"""Curation-pipeline semantics on planted documents: the exact dup, the
low-quality doc, and the near-dup must each be dropped by their stage;
the clean survivors must pass through untouched."""

from __future__ import annotations

from pyspark.sql import functions as F

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


def test_contamination_flags_shared_ngrams(spark):
    """A training doc sharing a 5-gram with a benchmark doc is flagged;
    unrelated docs are not."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, "en", base),                       # benchmark (id % 97 == 0)
        (1, "en", "PREFIX " + base),           # shares 5-grams -> contaminated
        (2, "en", "one two three four five six seven"),  # clean
    ]
    d = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = {r.lang: r for r in curation.contamination_check(
        d, F.col("doc_id") % 97 == 0).collect()}
    assert out["en"].n_train_docs == 2
    assert out["en"].n_contaminated == 1


def test_stratified_sample_deterministic_and_rate_shaped(spark, sf_dir):
    a = {(r.lang): (r.n_sampled, r.n_tokens)
         for r in curation.x8_stratified_sample(spark, sf_dir).collect()}
    b = {(r.lang): (r.n_sampled, r.n_tokens)
         for r in curation.x8_stratified_sample(spark, sf_dir).collect()}
    assert a == b  # counter-based draws: identical across runs
    # en keeps ~5x the default-rate languages (0.5 vs 0.1)
    assert a["en"][0] > 2 * a["fr"][0]


def test_token_sharding_respects_budget_and_preserves_docs(spark, sf_dir):
    out = curation.x9_token_sharding(spark, sf_dir).collect()
    total_docs = sum(r.n_docs for r in out)
    from realtime_financial_transactions_data_pipeline_spark.tables import load_table

    assert total_docs == load_table(spark, sf_dir, "documents").count()
    # every non-final shard starts below budget and only the doc that
    # crosses the boundary may push it over: shard_tokens < budget + max doc
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, shards in by_lang.items():
        shards.sort(key=lambda r: r.shard_id)
        for s in shards[:-1]:
            assert s.shard_tokens > 0
        # shard ids are dense from 0
        assert [s.shard_id for s in shards] == list(range(len(shards)))


def test_cap_per_domain_deterministic_and_capped(spark):
    from realtime_financial_transactions_data_pipeline_spark.operators.curation import (
        cap_per_domain,
    )

    docs = spark.createDataFrame(
        [(i, f"d{i % 3}", "t") for i in range(30)], ["doc_id", "source", "text"]
    )
    kept = cap_per_domain(docs, cap=4, seed=9)
    per = {
        r.source: r.n
        for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per == {"d0": 4, "d1": 4, "d2": 4}
    # Deterministic across invocations and independent of input order
    ids1 = sorted(r.doc_id for r in kept.collect())
    shuffled = docs.orderBy(F.rand(123))
    ids2 = sorted(
        r.doc_id for r in cap_per_domain(shuffled, cap=4, seed=9).collect()
    )
    assert ids1 == ids2
    # A different seed keeps a different subset (caps still hold)
    ids3 = sorted(r.doc_id for r in cap_per_domain(docs, cap=4, seed=10).collect())
    assert ids1 != ids3 and len(ids3) == 12


def test_x23_pps_inclusion_rule(spark):
    """x23 parity against a from-scratch Python replay of the PPS
    rule (md5 counter uniform < w/max_w) at sf0.001: per-source kept
    counts, kept mass, and the id checksum."""
    import hashlib

    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.curation import (
        _PPS_SEED,
        x23_pps_sample,
    )

    sf = "/root/testdata/sf0.001"
    docs = duckdb.sql(
        f"SELECT source, doc_id, n_chars"
        f" FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    mw = max(n for _, _, n in docs)
    agg: dict[str, list[int]] = {}
    for src, doc_id, n in docs:
        u = (
            int(
                hashlib.md5(f"{_PPS_SEED}-{doc_id}".encode()).hexdigest()[:8],
                16,
            )
            / 4294967296.0
        )
        a = agg.setdefault(src, [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += n
        if u < n / mw:
            a[2] += 1
            a[3] += n
            a[4] += doc_id
    rows = {r.source: r for r in x23_pps_sample(spark, sf).collect()}
    assert set(rows) == set(agg)
    for src, (nd, sc, ns, scs, ck) in agg.items():
        r = rows[src]
        assert (r.n_docs, r.sum_chars, r.n_sampled) == (nd, sc, ns), src
        assert (r.sum_chars_sampled, r.id_checksum) == (scs, ck), src
        assert abs(r.expected_sampled - round(sc / mw, 4)) < 1e-9


def test_x26_span_decontamination_brute_force(spark):
    """Cleaned text equals a pure-Python replay at sf0.001 — benchmark
    gram set, interval-union span merge, and character-exact
    reassembly — and the planted dups guarantee real removals."""
    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.curation import (
        _X26_BENCH_MOD,
        x26_span_decontamination,
    )
    from realtime_financial_transactions_data_pipeline_spark.operators.dedup import (
        _SPAN_K,
    )

    sf = "/root/testdata/sf0.001"
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    bench_grams = set()
    for did, text in docs:
        if did % _X26_BENCH_MOD == 0:
            w = text.split(" ")
            for i in range(len(w) - _SPAN_K + 1):
                bench_grams.add(" ".join(w[i : i + _SPAN_K]))
    want = {}
    for did, text in docs:
        if did % _X26_BENCH_MOD == 0:
            continue
        w = text.split(" ")
        hits = [
            i
            for i in range(len(w) - _SPAN_K + 1)
            if " ".join(w[i : i + _SPAN_K]) in bench_grams
        ]
        spans = []
        for p in hits:
            e = p + _SPAN_K - 1
            if spans and p <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], e)
            else:
                spans.append([p, e])
        covered = {i for s, e in spans for i in range(s, e + 1)}
        clean = " ".join(t for i, t in enumerate(w) if i not in covered)
        want[did] = (len(w), len(spans), len(covered), clean)
    rows = x26_span_decontamination(spark, sf).collect()
    assert len(rows) == len(want)
    for r in rows:
        dt, ns, rm, clean = want[r.doc_id]
        assert (r.doc_tokens, r.n_spans, r.removed_tokens) == (dt, ns, rm)
        assert r.clean_text == clean, r.doc_id
    assert any(r.removed_tokens > 0 for r in rows), "planted dups must hit"


def test_x36_priority_sample_replay(spark):
    """x36 parity against a from-scratch Python replay of DLT priority
    sampling at sf0.001: priorities w/u from the md5 counter uniform,
    top-k membership (via the per-source id checksum), τ as the
    (k+1)-th priority in integer millis, and the max(w, τ) estimator."""
    import hashlib
    import math

    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.curation import (
        _X36_K,
        _X36_SEED,
        x36_priority_sample,
    )

    sf = "/root/testdata/sf0.001"
    docs = duckdb.sql(
        f"SELECT source, doc_id, n_chars"
        f" FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    pri = []
    for src, doc_id, n in docs:
        u = (
            int(
                hashlib.md5(f"{_X36_SEED}-{doc_id}".encode()).hexdigest()[:8],
                16,
            )
            / 4294967296.0
        )
        pri.append((n / u, doc_id, src, n))
    pri.sort(key=lambda t: (-t[0], t[1]))
    top = pri[: _X36_K + 1]
    tau_millis = math.floor(min(p for p, *_ in top) * 1000 + 0.5)
    samp = top[:_X36_K]
    agg: dict[str, list[int]] = {}
    for p, doc_id, src, n in samp:
        a = agg.setdefault(src, [0, 0, 0, 0])
        a[0] += 1
        a[1] += n
        a[2] += doc_id
        a[3] += max(n * 1000, tau_millis)
    rows = {r.source: r for r in x36_priority_sample(spark, sf).collect()}
    total = {}
    for src, _, n in docs:
        t = total.setdefault(src, [0, 0])
        t[0] += 1
        t[1] += n
    assert set(rows) == set(total)
    for src, r in rows.items():
        assert (r.n_docs, r.sum_chars) == tuple(total[src]), src
        ns, scs, ck, est = agg.get(src, [0, 0, 0, 0])
        assert (r.n_sampled, r.sum_chars_sampled) == (ns, scs), src
        assert (r.id_checksum, r.est_mass_millis) == (ck, est), src
    # exactly k docs sampled overall, estimator one-sided vs kept mass
    assert sum(r.n_sampled for r in rows.values()) == _X36_K
    assert all(
        r.est_mass_millis >= r.sum_chars_sampled * 1000 for r in rows.values()
    )


def test_x37_url_canonical_collapses_exact_triples(spark):
    """x37's synthesized corpus has a closed-form answer: each doc_id
    triple {3k, 3k+1, 3k+2} shares path and id and differs ONLY in the
    stripped utm/fragment junk, so canonicalization collapses exactly
    the triples — n_canonical = ceil(N/3), max_group <= 3, every
    removable count = N - n_canonical, keepers are the 3k doc ids."""
    from realtime_financial_transactions_data_pipeline_spark.operators.curation import (
        x37_url_canonical_dedup,
    )
    from realtime_financial_transactions_data_pipeline_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    n = load_table(spark, sf, "documents").count()
    r = x37_url_canonical_dedup(spark, sf).collect()[0]
    n_canon = (n + 2) // 3
    assert r.n_urls == n
    assert r.n_canonical == n_canon
    assert r.max_group <= 3
    assert r.n_removable == n - n_canon
    # keepers are exactly the multiples of 3 below n
    assert r.keeper_checksum == sum(range(0, n, 3))


def test_x38_hrw_minimal_movement_property(spark):
    """The property x38 exists for: under HRW a doc moves on the 8->9
    expansion IFF the NEW shard's weight beats all eight old ones — so
    every moved doc lands on shard 8 (verified by Python replay of the
    md5 weights), and the moved fraction concentrates near 1/9 (wide
    binomial tolerance at sf0.001's 500 docs)."""
    import hashlib

    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.curation import (
        _X38_K,
        x38_rendezvous_sharding,
    )

    sf = "/root/testdata/sf0.001"
    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{sf}/documents.parquet')"
        ).fetchall()
    ]

    def wt(s: int, doc: int) -> int:
        return int(hashlib.md5(f"{s}-{doc}".encode()).hexdigest()[:8], 16)

    n_moved = 0
    per_shard = {}
    for doc in ids:
        ws = [(wt(s, doc), s) for s in range(_X38_K + 1)]
        a8 = max(ws[:_X38_K])[1]
        a9 = max(ws)[1]
        if a9 != a8:
            # HRW minimality: the only possible new home is the new shard
            assert a9 == _X38_K, (doc, a8, a9)
            n_moved += 1
        st = per_shard.setdefault(a8, [0, 0])
        st[0] += 1
        st[1] += a9 != a8
    rows = {r.shard8: r for r in x38_rendezvous_sharding(spark, sf).collect()}
    assert set(rows) == set(per_shard)
    for sh, (nd, nm) in per_shard.items():
        assert (rows[sh].n_docs, rows[sh].n_moved) == (nd, nm), sh
    frac = n_moved / len(ids)
    # E[frac] = 1/9 ~ 0.111; sd ~ sqrt(p(1-p)/500) ~ 0.014 -> +/- 5 sd
    assert 0.04 < frac < 0.19, frac
