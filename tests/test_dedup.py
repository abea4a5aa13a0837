"""Dedup operator tests (X1/X2): planted near-duplicates must be found
by every near-dup path (exact Jaccard, MinHash-LSH, SimHash), and the
LSH candidate set must agree with the exact join at the verify
threshold. Cited from operators/dedup.py docstrings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_financial_transactions_data_pipeline_spark.operators import dedup


BASE = (
    "spark shuffles the sorted partitions while the broadcast join keeps "
    "dimension tables resident in executor memory for the star schema scan"
)
NEAR_DUP = BASE.replace("resident", "cached")  # one word changed
UNRELATED = (
    "completely different text about cooking pasta with garlic and olive "
    "oil on a slow stove while the sauce reduces quietly"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(0, BASE), (1, NEAR_DUP), (2, UNRELATED), (3, "short doc"), (4, BASE)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_jaccard_finds_planted_pair(docs):
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.jaccard_pairs_exact(docs, threshold=0.5).collect()
    }
    assert (0, 4) in got and got[(0, 4)] == 1.0  # identical docs
    assert (0, 1) in got and 0.5 <= got[(0, 1)] < 1.0  # one-word edit
    assert (1, 4) in got
    assert not any(2 in pair or 3 in pair for pair in got)  # no false positives


def test_exact_jaccard_matches_bruteforce(docs):
    """Inverted-index join == brute-force all-pairs on the same shingles."""
    grams = docs.select("doc_id", dedup.word_shingles("text").alias("g"))
    a, b = grams.alias("a"), grams.alias("b")
    inter = F.size(F.array_intersect("a.g", "b.g")).cast("double")
    union = (F.size("a.g") + F.size("b.g") - F.size(F.array_intersect("a.g", "b.g"))).cast("double")
    brute = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn("j", inter / union)
        .filter(F.col("j") >= 0.5)
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    left = {(r.id_a, r.id_b) for r in dedup.jaccard_pairs_exact(docs, threshold=0.5).collect()}
    right = {(r.id_a, r.id_b) for r in brute.collect()}
    assert left == right


def test_max_df_cap_still_finds_dups(docs):
    got = {
        (r.id_a, r.id_b)
        for r in dedup.jaccard_pairs_exact(docs, threshold=0.9, max_df=10).collect()
    }
    assert (0, 4) in got


def test_lsh_candidates_cover_planted_pairs(docs):
    sigs = dedup.minhash_signature(docs)
    cands = {(r.id_a, r.id_b) for r in dedup.lsh_candidate_pairs(sigs, "doc_id").collect()}
    assert {(0, 1), (0, 4), (1, 4)} <= cands


def test_lsh_bucket_cap_drops_megabuckets(spark):
    """100 identical docs: every band bucket has size 100; with a cap of
    10 the candidate set must be empty (hot-bucket guard engages)."""
    clones = spark.createDataFrame([(i, BASE) for i in range(100)], ["doc_id", "text"])
    sigs = dedup.minhash_signature(clones)
    assert dedup.lsh_candidate_pairs(sigs, "doc_id", bucket_cap=10).count() == 0
    assert dedup.lsh_candidate_pairs(sigs, "doc_id", bucket_cap=200).count() > 0


def test_simhash_near_dups(spark, docs):
    """SimHash fingerprints: identical docs → identical hash; one-word
    edit → small Hamming distance; unrelated → large distance."""
    fp = {r.doc_id: r.h for r in docs.select("doc_id", dedup.simhash_col("text").alias("h")).collect()}
    assert fp[0] == fp[4]
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert ham(fp[0], fp[1]) <= 6
    assert ham(fp[0], fp[2]) > 6


def test_simhash_block_pair_recall_guarantee(spark):
    """Manku block-combination pigeonhole: a pair within Hamming
    distance 6 flips bits in at most 6 of the 8 blocks, so at least one
    block PAIR (i<j) is jointly identical. Adversarial worst case: 6
    flipped bits spread over 6 DIFFERENT blocks — exactly two blocks
    survive, and only their combination matches."""
    a = 0x0123456789ABCDEF
    b = a ^ 0b1 ^ (1 << 9) ^ (1 << 18) ^ (1 << 27) ^ (1 << 36) ^ (1 << 45)
    blk = lambda v, i: (v >> (8 * i)) & 255  # noqa: E731
    shared_pairs = [
        (i, j)
        for i in range(8)
        for j in range(i + 1, 8)
        if blk(a, i) == blk(b, i) and blk(a, j) == blk(b, j)
    ]
    assert shared_pairs == [(6, 7)]  # bits 0..47 each hit blocks 0..5


def test_simhash_pairs_finds_planted_near_dups(spark, docs):
    """End-to-end simhash_pairs over the planted fixture: the identical
    pair (0,4) must surface at Hamming 0 and the one-word edit (0,1)
    within the ≤6 predicate; the unrelated doc 2 must not pair with 0."""
    fp = docs.select("doc_id", dedup.simhash_col("text").alias("simhash"))
    got = {(r.id_a, r.id_b): r.hamming for r in dedup.simhash_pairs(fp).collect()}
    assert got.get((0, 4)) == 0
    assert (0, 1) in got
    assert (0, 2) not in got and (2, 4) not in got


def test_simhash_pairs_bucket_cap(spark):
    """Identical-fingerprint clusters bypass the cap entirely (exact
    groupBy path), so a duplicate cluster of any size loses no pairs;
    the cap bounds DISTINCT fingerprints per compound-key bucket."""
    clones = spark.createDataFrame(
        [(i, 0x0123456789ABCDEF) for i in range(50)], ["doc_id", "simhash"]
    )
    assert dedup.simhash_pairs(clones, bucket_cap=10).count() == 50 * 49 // 2
    # 50 DISTINCT fingerprints differing only inside block 0 (6 low
    # bits): pairwise Hamming <= 6, and every shared block-pair bucket
    # holds all 50 — over cap they drop, under cap all pairs surface.
    base = 0x0123456789ABCD00
    distinct = spark.createDataFrame(
        [(i, base | i) for i in range(50)], ["doc_id", "simhash"]
    )
    assert dedup.simhash_pairs(distinct, bucket_cap=10).count() == 0
    assert dedup.simhash_pairs(distinct, bucket_cap=2000).count() == 50 * 49 // 2


def test_exact_dedup_counts(spark, sf_dir):
    out = dedup.x1_dedup_exact(spark, sf_dir).collect()[0]
    assert out.n_docs == out.n_unique + out.n_dup_rows
    assert out.n_docs > 0


def test_connected_components_chain_and_clusters(spark):
    """A 4-node chain (0-1, 1-2, 2-3) must collapse to one component
    with canonical 0 even though (0,3) is never an edge — the transitive
    closure pairwise drop misses; plus a separate 2-cluster and an
    isolated pair keep their own minima."""
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11), (20, 21), (11, 10)],
        ["id_a", "id_b"],
    )
    got = {r.doc_id: r.canonical_id
           for r in dedup.connected_components(pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_long_chain_converges(spark):
    """A 30-node path is the worst case for min-label propagation
    (diameter rounds); it must still converge inside the iteration cap
    and label every node with the chain head."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], ["id_a", "id_b"]
    )
    got = {r.doc_id: r.canonical_id
           for r in dedup.connected_components(pairs, max_iters=40).collect()}
    assert got == {i: 0 for i in range(31)}


def test_connected_components_default_is_distributed(spark, monkeypatch):
    """VERDICT r13 weak #1: the DEFAULT path must never drive-side
    collect the label frame — at corpus scale the old pin=True default
    silently materialized every vertex label on the driver. Spied
    directly: DataFrame.collect must not run during the default call
    (the loop's convergence check is a count, metadata-sized), and the
    returned frame is a checkpoint-backed LogicalRDD, not a local
    relation. pin=True (probe opt-in) is the collecting path."""
    # Patch the CONCRETE class: in Spark 4 pyspark.sql.DataFrame is a
    # dispatch base whose classic subclass overrides collect.
    from pyspark.sql.classic.dataframe import DataFrame

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], ["id_a", "id_b"]
    )
    calls = []
    real_collect = DataFrame.collect
    monkeypatch.setattr(
        DataFrame, "collect", lambda self: calls.append(1) or real_collect(self)
    )
    dist = dedup.connected_components(pairs)
    assert calls == [], "default path must not collect"
    pinned = dedup.connected_components(pairs, pin=True)
    assert calls == [1], "pin=True path collects exactly once"
    monkeypatch.undo()
    plan = dist._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" not in plan and "LogicalRDD" in plan, plan
    assert sorted(map(tuple, dist.collect())) == sorted(
        map(tuple, pinned.collect())
    )


def test_crossdoc_dup_fraction_counts_shared_grams(spark):
    """Two docs sharing exactly one 3-gram ('a b c'); a third disjoint
    doc scores zero."""
    from realtime_financial_transactions_data_pipeline_spark.operators.dedup import (
        word_shingles,
    )
    from pyspark.sql import functions as F

    d = spark.createDataFrame(
        [(1, "a b c d"), (2, "z a b c"), (3, "p q r s")],
        "doc_id long, text string",
    )
    grams = d.select("doc_id", word_shingles("text").alias("grams"))
    eg = grams.select("doc_id", F.explode("grams").alias("gram"))
    dfreq = eg.groupBy("gram").agg(F.count("*").alias("n_docs"))
    out = {
        r.doc_id: (r.n_grams, r.n_shared)
        for r in eg.join(dfreq, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("n_docs") >= 2).cast("long")).alias("n_shared"),
        )
        .collect()
    }
    # doc1 grams: 'a b c', 'b c d'; doc2: 'z a b', 'a b c'; doc3: 2 unique
    assert out[1] == (2, 1)
    assert out[2] == (2, 1)
    assert out[3] == (2, 0)


def test_x1e_ingest_layout_is_batch_keyed(spark, sf_dir):
    """Exactly-once guard (ADVICE r06): the streaming ingest writes
    each micro-batch's accepted rows to its own batch_id-keyed
    subdirectory in OVERWRITE mode, so a retried batch rewrites rather
    than double-appends. Pin the layout (one batch=N dir per
    micro-batch) and that the final result is duplicate-free."""
    import os

    from realtime_financial_transactions_data_pipeline_spark.registry import all_probes

    out = all_probes()["x1e_stream_dedup_ingest"].fn(spark, sf_dir)
    accepted = "/tmp/spark_graft_streaming/x1e/accepted"
    batch_dirs = sorted(
        d for d in os.listdir(accepted) if d.startswith("batch=")
    )
    assert batch_dirs == [f"batch={i}" for i in range(4)]
    rows = out.collect()
    assert len(rows) == len({r.doc_id for r in rows})  # no double-append


def test_bloom_prefilter_no_false_negatives(spark, sf_dir):
    """The Bloom guarantee: every truly-seen doc must be flagged
    maybe-seen (n_maybe >= n_truly per group, and overall n_maybe =
    n_truly + n_false_positive); a definitely-new verdict is final."""
    from realtime_financial_transactions_data_pipeline_spark.operators.dedup import (
        x1d_bloom_prefilter,
    )

    rows = x1d_bloom_prefilter(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_maybe_seen == r.n_truly_seen + r.n_false_positive
        assert r.n_maybe_seen >= r.n_truly_seen
        assert r.n_batch > 0


def test_bloom_bitmap_equivalence(spark, sf_dir):
    """The packed long[] bitmap (x1db) must flag EXACTLY the docs the
    position-relation filter (x1d) flags — same bit law, same
    collisions, same false-positive set — checked per document, not
    just in aggregate."""
    from pyspark.sql import functions as F

    from realtime_financial_transactions_data_pipeline_spark.operators.dedup import (
        _BLOOM_K,
        _BLOOM_M,
        _bloom_positions,
        bloom_bitmap_longs,
        bloom_maybe_seen,
    )
    from realtime_financial_transactions_data_pipeline_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    prior = (
        d.filter(F.col("doc_id") % 4 == 0).select(F.md5("text").alias("h")).distinct()
    )
    batch = d.filter(F.col("doc_id") % 4 != 0).select(
        "doc_id", F.md5("text").alias("h")
    )

    bmp = bloom_bitmap_longs(prior)
    assert len(bmp) == _BLOOM_M // 64
    via_bitmap = {
        r.doc_id
        for r in batch.filter(bloom_maybe_seen(bmp, "h")).collect()
    }

    bits = prior.select(F.explode(_bloom_positions("h")).alias("pos")).distinct()
    via_relation = {
        r.doc_id
        for r in (
            batch.withColumn("pos", F.explode(_bloom_positions("h")))
            .join(F.broadcast(bits.withColumn("_hit", F.lit(1))), "pos", "left")
            .groupBy("doc_id")
            .agg(F.count("_hit").alias("nhit"))
            .filter(F.col("nhit") == _BLOOM_K)
        ).collect()
    }
    assert via_bitmap == via_relation
    # Zero false negatives: every PRIOR digest re-probed against the
    # bitmap must flag (the Bloom guarantee, and a non-trivial firing
    # check even when the sf0.001 batch happens to contain no dups).
    prior_probe = d.filter(F.col("doc_id") % 4 == 0).select(
        "doc_id", F.md5("text").alias("h")
    )
    assert prior_probe.filter(~bloom_maybe_seen(bmp, "h")).count() == 0
    assert prior_probe.count() > 0


def test_neardup_admit_classification_edges(spark):
    """Pin the x2n admission semantics the synthetic corpus cannot
    force: (1) a batch doc near-dup of an INDEX doc is cross-rejected;
    (2) within-batch smaller-id-wins; (3) the chain edge — a
    within-batch pair whose smaller side was itself cross-rejected
    does NOT reject the larger side."""
    from pyspark.sql import functions as F

    from realtime_financial_transactions_data_pipeline_spark.operators.dedup import (
        minhash_signature,
        neardup_admit,
        word_shingles,
    )

    base = ["w%02d" % i for i in range(120)]

    def text(changed):
        words = list(base)
        for pos, repl in changed:
            words[pos] = repl
        return " ".join(words)

    # s (index) ~ x (J≈0.95); y ~ x (J≈0.9) but y !~ s (disjoint edits
    # push J(y, s) lower while staying near x); z !~ anything.
    rows_state = [(100, text([]))]
    rows_batch = [
        (201, text([(5, "AA")])),                       # ~ s -> cross-reject
        (202, text([(5, "AA"), (40, "BB"), (41, "BC")])),  # ~ 201, farther from s
        (203, "completely different words " + " ".join("q%d" % i for i in range(80))),
        (204, text([(5, "AA"), (40, "BB"), (41, "BC")])),  # duplicate of 202
    ]

    def prep(rows):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return minhash_signature(
            df.withColumn("grams", word_shingles("text")), grams_col="grams"
        ).select("doc_id", F.lit("en").alias("lang"), "grams", "sig")

    state, batch = prep(rows_state), prep(rows_batch)

    # sanity: the crafted Jaccards actually realize the intended edges
    import itertools

    grams = {r.doc_id: set(r.grams) for r in
             state.unionByName(batch).select("doc_id", "grams").collect()}
    jac = {
        (a, b): len(grams[a] & grams[b]) / len(grams[a] | grams[b])
        for a, b in itertools.combinations(sorted(grams), 2)
    }
    assert jac[(100, 201)] >= 0.9          # cross edge exists
    assert jac[(201, 202)] >= 0.9          # within chain edge exists
    assert jac[(100, 202)] < 0.9           # 202 is NOT near the index doc
    assert jac[(202, 204)] == 1.0          # exact within-batch duplicate

    admitted = sorted(r.doc_id for r in neardup_admit(state, batch).collect())
    # 201 cross-rejected; 202 SURVIVES (its only smaller near-dup, 201,
    # was cross-rejected); 203 clean; 204 rejected by 202 (202 is not
    # cross-rejected, so smaller-id-wins applies).
    assert admitted == [202, 203]


def _write_x2n_state(spark, root, state, n_groups):
    """Persist an x2n index in the probe's band-partitioned layout:
    doc-state under state/batch=0/dg=G, band index under
    bands/batch=0/bg=G."""
    from pyspark.sql import functions as F

    from realtime_financial_transactions_data_pipeline_spark.operators.dedup import (
        banded_keys,
    )

    state.withColumn(
        "dg", F.pmod(F.hash("doc_id"), F.lit(n_groups))
    ).write.partitionBy("dg").parquet(f"{root}/state/batch=0")
    banded_keys(state, "doc_id").select(
        F.col("_id").alias("doc_id"),
        "band_id",
        "band_hash",
        F.pmod(F.hash("band_id", "band_hash"), F.lit(n_groups)).alias("bg"),
    ).write.partitionBy("bg").parquet(f"{root}/bands/batch=0")


def test_pruned_index_state_equivalence(spark, tmp_path):
    """The band-partitioned probe path (VERDICT r10 #2) must admit
    exactly what the full-state probe admits: pruning retrieves every
    index doc sharing an LSH bucket with the batch, and no candidate
    pair can exist outside a shared bucket. Uses a multi-doc index so
    the pruned frame is a strict subset (some index docs share no
    bucket with the batch)."""
    from pyspark.sql import functions as F

    from realtime_financial_transactions_data_pipeline_spark.operators.dedup import (
        _X2N_STATE_GROUPS,
        minhash_signature,
        neardup_admit,
        pruned_index_state,
        word_shingles,
    )

    base = ["w%02d" % i for i in range(120)]

    def text(changed, alphabet=None):
        words = list(alphabet or base)
        for pos, repl in changed:
            words[pos] = repl
        return " ".join(words)

    far = ["z%02d" % i for i in range(120)]
    rows_state = [
        (100, text([])),
        (101, text([], far)),            # unrelated index doc
        (102, " ".join("p%d" % i for i in range(90))),  # unrelated index doc
    ]
    rows_batch = [
        (201, text([(5, "AA")])),        # near-dup of index doc 100
        (203, "completely different words " + " ".join("q%d" % i for i in range(80))),
    ]

    def prep(rows):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return minhash_signature(
            df.withColumn("grams", word_shingles("text")), grams_col="grams"
        ).select("doc_id", F.lit("en").alias("lang"), "grams", "sig")

    state, batch = prep(rows_state), prep(rows_batch)
    root = str(tmp_path / "x2n")
    _write_x2n_state(spark, root, state, _X2N_STATE_GROUPS)

    from realtime_financial_transactions_data_pipeline_spark.operators.dedup import (
        banded_keys,
    )

    pruned = pruned_index_state(
        spark, f"{root}/state", f"{root}/bands", banded_keys(batch, "doc_id")
    )
    pruned_ids = sorted(r.doc_id for r in pruned.select("doc_id").collect())
    # Doc 100 shares buckets with batch doc 201 and must be retrieved;
    # the unrelated index docs share no bucket and must be pruned away.
    assert 100 in pruned_ids
    assert len(pruned_ids) < 3

    full = sorted(r.doc_id for r in neardup_admit(state, batch).collect())
    via_pruned = sorted(r.doc_id for r in neardup_admit(pruned, batch).collect())
    assert via_pruned == full == [203]


def test_pruned_index_state_prunes_partitions(spark, tmp_path):
    """The probe's state reads must carry PartitionFilters on the
    group keys (bg for the band index, dg for the doc state) — pruned
    before any file opens, the s10/l1b assert pattern — and a 1-doc
    batch must actually open fewer band-group directories than exist
    on disk."""
    import os

    from pyspark.sql import functions as F

    from realtime_financial_transactions_data_pipeline_spark.operators.dedup import (
        _X2N_STATE_GROUPS,
        banded_keys,
        minhash_signature,
        pruned_index_state,
        word_shingles,
    )
    from realtime_financial_transactions_data_pipeline_spark.plans import inspect

    # Enough index docs that every bg group exists on disk.
    rows = [(i, " ".join("d%d_%d" % (i, j) for j in range(60))) for i in range(64)]

    def prep(rs):
        df = spark.createDataFrame(rs, "doc_id long, text string")
        return minhash_signature(
            df.withColumn("grams", word_shingles("text")), grams_col="grams"
        ).select("doc_id", F.lit("en").alias("lang"), "grams", "sig")

    state = prep(rows)
    root = str(tmp_path / "x2n")
    _write_x2n_state(spark, root, state, _X2N_STATE_GROUPS)
    on_disk = {d for d in os.listdir(f"{root}/bands/batch=0") if d.startswith("bg=")}
    assert len(on_disk) == _X2N_STATE_GROUPS  # all groups materialized

    # The batch doc is a near-dup of index doc 7 — candidates exist, so
    # the plan keeps both state scans (an unrelated batch folds the
    # whole probe to an empty LocalTableScan before any file is read,
    # which is pruning in the degenerate limit but pins nothing).
    words7 = ["d7_%d" % j for j in range(60)]
    words7[0] = "CHANGED"
    batch = prep([(999, " ".join(words7))])
    bb = banded_keys(batch, "doc_id")
    pruned = pruned_index_state(spark, f"{root}/state", f"{root}/bands", bb)
    assert {r.doc_id for r in pruned.select("doc_id").collect()} == {7}
    # The candidate stage is localCheckpoint-ed inside pruned_index_state
    # (one band-index scan per trigger shared by both consumers), which
    # truncates its lineage out of the returned plan — so assert the bg
    # partition filter on the pre-checkpoint candidate plan and the dg
    # filter on the returned state-scan plan.
    from realtime_financial_transactions_data_pipeline_spark.operators.dedup import (
        _candidate_ids,
        _group_values,
    )

    bb_g = bb.withColumn(
        "bg", F.pmod(F.hash("band_id", "band_hash"), F.lit(_X2N_STATE_GROUPS))
    )
    cand_plan = _candidate_ids(
        spark,
        f"{root}/bands",
        bb_g,
        _group_values(bb_g, "bg", _X2N_STATE_GROUPS),
        _X2N_STATE_GROUPS,
    )
    cpf = inspect.partition_filters(cand_plan)
    assert "bg" in cpf and "PartitionFilters: []" not in cpf
    pf = inspect.partition_filters(pruned)
    assert "dg" in pf and "PartitionFilters: []" not in pf
    # A single doc probes at most 12 band keys -> at most 12 of the 16
    # bg groups; the scan must not touch the rest.
    touched = {
        r.bg
        for r in bb.select(
            F.pmod(F.hash("band_id", "band_hash"), F.lit(_X2N_STATE_GROUPS)).alias("bg")
        ).distinct().collect()
    }
    assert len(touched) <= 12 < _X2N_STATE_GROUPS


def test_neardup_admit_digest_payload_equivalence(spark, sf_dir):
    """The fixed-width xxhash64 gram-digest verify payload (r17,
    VERDICT r16 #2) must admit EXACTLY what the gram-string payload
    admits: shingles are distinct, so elementwise xxhash64 preserves
    set cardinality and the Jaccard arithmetic is identical modulo
    64-bit collisions (absent at any test scale). Checked on (a) the
    crafted classification-edge corpus — every rule path: cross
    reject, within-batch smaller-id-wins, cross-reject immunity — and
    (b) a real documents slice, where the digest path must reproduce
    the string path's admissions over genuine near-dup structure."""
    from pyspark.sql import functions as F

    from realtime_financial_transactions_data_pipeline_spark.operators.dedup import (
        minhash_signature,
        neardup_admit,
        word_shingles,
    )
    from realtime_financial_transactions_data_pipeline_spark.tables import load_table

    def prep(df):
        # One pass yields BOTH payloads; each path then selects its own.
        return minhash_signature(
            df.withColumn("grams", word_shingles("text")),
            grams_col="grams",
            digest_col="gramsd",
        ).select("doc_id", F.lit("en").alias("lang"), "grams", "gramsd", "sig")

    base = ["w%02d" % i for i in range(120)]

    def text(changed):
        words = list(base)
        for pos, repl in changed:
            words[pos] = repl
        return " ".join(words)

    # Same crafted edges as test_neardup_admit_classification_edges:
    # 201 cross-rejected by 100; 202 near 201 but NOT near 100 (so it
    # survives via the cross-reject-immunity chain rule); 204 is 202's
    # exact duplicate (smaller-id-wins).
    state = prep(
        spark.createDataFrame([(100, text([]))], "doc_id long, text string")
    )
    batch = prep(
        spark.createDataFrame(
            [
                (201, text([(5, "AA")])),
                (202, text([(5, "AA"), (40, "BB"), (41, "BC")])),
                (203, "unrelated " + " ".join("q%d" % i for i in range(80))),
                (204, text([(5, "AA"), (40, "BB"), (41, "BC")])),
            ],
            "doc_id long, text string",
        )
    )
    via_strings = sorted(
        r.doc_id for r in neardup_admit(state, batch).collect()
    )
    via_digests = sorted(
        r.doc_id
        for r in neardup_admit(state, batch, grams_col="gramsd").collect()
    )
    assert via_digests == via_strings == [202, 203]

    docs = prep(
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .limit(400)
    ).localCheckpoint(eager=True)
    st = docs.filter(F.col("doc_id") % 2 == 0)
    ba = docs.filter(F.col("doc_id") % 2 == 1)
    s_adm = sorted(r.doc_id for r in neardup_admit(st, ba).collect())
    d_adm = sorted(
        r.doc_id for r in neardup_admit(st, ba, grams_col="gramsd").collect()
    )
    assert d_adm == s_adm and 0 < len(d_adm) <= ba.count()


def test_x2n_index_compaction_retention(spark, tmp_path):
    """The x2n index's append-only ``batch=N`` layout gets its
    retention half (r17, VERDICT r16 #5): drive 9 ingest steps with
    auto-compaction at the threshold and pin that (a) generation-dir
    counts stay FLAT at the threshold instead of growing linearly,
    (b) the pruned probe retrieves IDENTICAL state over the compacted
    layout as over the raw batch dirs, and (c) a compacted generation
    never collides with a stream batch id."""
    import os

    from pyspark.sql import functions as F

    from realtime_financial_transactions_data_pipeline_spark.operators.dedup import (
        _X2N_COMPACT_GEN_BASE,
        _X2N_COMPACT_THRESHOLD,
        _X2N_STATE_GROUPS,
        banded_keys,
        compact_x2n_index,
        minhash_signature,
        pruned_index_state,
        word_shingles,
    )

    root = str(tmp_path / "x2n")
    state_dir, bands_dir = f"{root}/state", f"{root}/bands"

    def prep(rows):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return minhash_signature(
            df.withColumn("grams", word_shingles("text")),
            grams_col="grams",
            digest_col="gramsd",
        ).select("doc_id", F.lit("en").alias("lang"), "gramsd", "sig")

    def write_batch(b, batch_id):
        b.withColumn(
            "dg", F.pmod(F.hash("doc_id"), F.lit(_X2N_STATE_GROUPS))
        ).repartition("dg").write.mode("overwrite").partitionBy(
            "dg"
        ).parquet(f"{state_dir}/batch={batch_id}")
        banded_keys(b, "doc_id").select(
            F.col("_id").alias("doc_id"),
            "band_id",
            "band_hash",
            F.pmod(
                F.hash("band_id", "band_hash"), F.lit(_X2N_STATE_GROUPS)
            ).alias("bg"),
        ).repartition("bg").write.mode("overwrite").partitionBy(
            "bg"
        ).parquet(f"{bands_dir}/batch={batch_id}")

    def gen_dirs(d):
        return sorted(
            n for n in os.listdir(d) if n.startswith("batch=")
        )

    max_dirs = 0
    for step in range(9):
        b = prep(
            [
                (step * 10 + j, " ".join("s%d_%d_%d" % (step, j, w) for w in range(50)))
                for j in range(4)
            ]
        )
        write_batch(b, step)
        compact_x2n_index(spark, state_dir, bands_dir)
        max_dirs = max(max_dirs, len(gen_dirs(state_dir)), len(gen_dirs(bands_dir)))

    # (a) flat: 9 appended generations never accumulate past the
    # threshold — compaction keeps folding them down.
    assert max_dirs <= _X2N_COMPACT_THRESHOLD
    assert len(gen_dirs(state_dir)) < 9 and len(gen_dirs(bands_dir)) < 9

    # (b) equivalence: force one more full fold, comparing the pruned
    # probe's retrieved state before vs after.
    probe_batch = prep([(999, " ".join("s3_1_%d" % w for w in range(50)))])
    bb = banded_keys(probe_batch, "doc_id")

    def retrieved():
        return sorted(
            r.doc_id
            for r in pruned_index_state(
                spark, state_dir, bands_dir, bb,
                grams_col="gramsd", grams_type="array<bigint>",
            ).select("doc_id").collect()
        )

    before = retrieved()
    assert compact_x2n_index(spark, state_dir, bands_dir, min_batch_dirs=1)
    after = retrieved()
    assert after == before and 31 in after  # doc (3,1) must match itself

    # (c) compacted generations live far above stream batch ids.
    for d in (state_dir, bands_dir):
        gens = [int(n.split("=", 1)[1]) for n in gen_dirs(d)]
        assert all(g >= _X2N_COMPACT_GEN_BASE for g in gens)


def test_er3_survivorship_rules(spark):
    """Each golden-record attribute must obey ITS rule, recomputed
    per-customer in pure Python from the raw parquet: completeness
    (longest name variant = the untruncated original), frequency
    (mode segment = the original, which two of three sources carry),
    source priority (nationkey from the lowest-src non-null variant,
    gated on (custkey+src) parity — the planted variant is
    c_nationkey + src, distinct per source, so the assertion can tell
    the src-ordered pick from 'any non-null'; ADVICE r13), extremum
    (max balance jitter)."""
    import pandas as pd

    from realtime_financial_transactions_data_pipeline_spark.operators.dedup import (
        er3_golden_record,
    )

    sf = "/root/testdata/sf0.001"
    raw = pd.read_parquet(sf + "/customer.parquet").set_index("c_custkey")
    got = {r.c_custkey: r for r in er3_golden_record(spark, sf).collect()}
    assert set(got) == set(raw.index)
    for k, row in raw.iterrows():
        g = got[k]
        assert g.name == row.c_name  # longest non-null beats truncated
        assert g.segment == row.c_mktsegment  # mode 2-1 over corrupted
        # The parity gate always passes for src=1 (k even) or src=2
        # (k odd), so a first source exists for every customer.
        first_src = min(s for s in (1, 2, 3) if (k + s) % 2 == 1)
        assert g.nationkey == row.c_nationkey + first_src, (k, g.nationkey)
        expect_bal = round(
            row.c_acctbal + max((k * s) % 7 for s in (1, 2, 3)), 2
        )
        assert abs(g.acctbal - expect_bal) < 1e-9, (k, g.acctbal, expect_bal)


def test_er4_blocking_metrics_semantics(spark):
    """The completeness invariant (substitution never alters length or
    the 2-prefix at the planted positions => exactly 1.0), and the
    reduction ratio recomputed from the row's own counts."""
    from realtime_financial_transactions_data_pipeline_spark.operators.dedup import (
        er4_blocking_quality,
    )

    row = er4_blocking_quality(spark, "/root/testdata/sf0.001").collect()[0]
    assert row.pair_completeness == 1.0
    assert row.n_truth_found == row.n_dirty > 0
    expect_rr = round(
        1 - row.n_candidates / (row.n_dirty * row.n_catalog), 6
    )
    assert abs(row.reduction_ratio - expect_rr) < 1e-9
    assert 0.9 < row.reduction_ratio < 1.0  # blocks prune >90% of pairs


def test_x2y_cluster_stats_accounting(spark):
    """Planted clusters: sizes {3, 2, 2} plus singletons (singletons
    never appear — only docs in a near-dup edge are clustered). The
    histogram, dup counts, and chars_saved must match hand arithmetic."""
    from realtime_financial_transactions_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], ["id_a", "id_b"]
    )
    docs = spark.createDataFrame(
        [(i, "x" * (i * 10)) for i in (1, 2, 3, 10, 11, 20, 21, 99)],
        ["doc_id", "text"],
    )
    comp = connected_components(pairs, pin=True)
    joined = comp.join(docs.select("doc_id", F.length("text").alias("_len")), "doc_id")
    clusters = joined.groupBy("canonical_id").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.sum(
            F.when(F.col("doc_id") != F.col("canonical_id"), F.col("_len")).otherwise(0)
        ).alias("chars_saved"),
    )
    hist = {
        r.cluster_size: (r.n_clusters, r.dup_docs, r.chars_saved)
        for r in clusters.groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum(F.col("cluster_size") - 1).alias("dup_docs"),
            F.sum("chars_saved").alias("chars_saved"),
        )
        .collect()
    }
    # size 3: {1,2,3} canonical 1, saves len(2)+len(3) = 20+30 = 50
    # size 2: {10,11} saves 110; {20,21} saves 210 -> total 320, 2 dups
    assert hist == {3: (1, 2, 50), 2: (2, 2, 320)}


def test_x22_cluster_safe_split_no_straddle(spark):
    """The point of x22 (vs x17's doc-id split): every near-dup
    cluster sits entirely on one side. At sf0.01, assert (a) no
    cluster_rep maps to two splits — structurally guaranteed, checked
    anyway as a regression tripwire; (b) the NAIVE doc-id split WOULD
    have straddled at least one multi-doc cluster on this corpus, so
    the op prevents real leakage here, not hypothetical; (c) split
    shares land near 90/5/5."""
    from collections import defaultdict

    from realtime_financial_transactions_data_pipeline_spark.operators.dedup import (
        _X22_SEED,
        x22_cluster_safe_split,
    )
    from realtime_financial_transactions_data_pipeline_spark.sources.datagen import (
        hash_uniform,
    )

    rows = x22_cluster_safe_split(spark, "/root/testdata/sf0.01").collect()
    by_rep = defaultdict(set)
    clusters = defaultdict(list)
    for r in rows:
        by_rep[r.cluster_rep].add(r.split)
        if r.is_clustered:
            clusters[r.cluster_rep].append(r.doc_id)
    assert all(len(s) == 1 for s in by_rep.values())
    multi = [docs for docs in clusters.values() if len(docs) >= 2]
    assert multi, "fixture has no multi-doc near-dup clusters"

    # naive doc-id split of the same seed: would it straddle a cluster?
    df = spark.createDataFrame([(d,) for c in multi for d in c], ["doc_id"])
    from pyspark.sql import functions as F

    u = hash_uniform(_X22_SEED, "doc_id")
    naive = {
        r.doc_id: r.s
        for r in df.select(
            "doc_id",
            F.when(u < 0.90, "train").when(u < 0.95, "val").otherwise("test").alias("s"),
        ).collect()
    }
    straddled = sum(
        1 for docs in multi if len({naive[d] for d in docs}) > 1
    )
    assert straddled >= 1, "corpus too small to demonstrate the leakage fix"

    n = len(rows)
    shares = defaultdict(int)
    for r in rows:
        shares[r.split] += 1
    assert 0.80 <= shares["train"] / n <= 0.97
    assert shares["val"] > 0 and shares["test"] > 0


def test_x24_containment_catches_subdocument_dup(spark):
    """A short doc quoted verbatim inside a much longer one: Jaccard
    sits far below the near-dup threshold (union dominated by the long
    doc) while containment is exactly 1.0 — the regime x24 exists
    for."""
    from realtime_financial_transactions_data_pipeline_spark.operators.dedup import (
        _CONTAIN_T,
        _NEARDUP_T,
        _pair_intersection_counts,
        jaccard_pairs_exact,
    )

    short = " ".join(f"w{i}" for i in range(10))
    long = short + " " + " ".join(f"z{i}" for i in range(200))
    docs = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id long, text string"
    )
    jac = jaccard_pairs_exact(docs, threshold=_NEARDUP_T).collect()
    assert jac == [], "Jaccard must miss the sub-document dup"
    inter = {
        (r.id_a, r.id_b): r for r in _pair_intersection_counts(docs).collect()
    }
    r = inter[(1, 2)]
    # every shingle of the short doc appears in the long one
    assert r.c == r.n_a
    ca, cb = r.c / r.n_a, r.c / r.n_b
    assert ca == 1.0 and cb < _CONTAIN_T


def test_x24_direction_and_threshold(spark):
    """Containment direction flags the contained doc; pairs under the
    threshold in both directions are dropped."""
    from realtime_financial_transactions_data_pipeline_spark.operators.dedup import (
        x24_containment_pairs,
    )
    from realtime_financial_transactions_data_pipeline_spark.operators import dedup

    # run the real probe at sf0.001 and cross-check every row's
    # arithmetic + direction from its own counts
    rows = x24_containment_pairs(spark, "/root/testdata/sf0.001").collect()
    assert rows, "planted near-dups guarantee pairs at sf0.001"
    for r in rows:
        ca, cb = r.n_common / r.n_a, r.n_common / r.n_b
        assert max(ca, cb) >= dedup._CONTAIN_T
        assert abs(r.containment_a_in_b - round(ca, 4)) < 1e-9
        assert abs(r.containment_b_in_a - round(cb, 4)) < 1e-9
        assert r.contained_doc == (r.id_a if ca >= cb else r.id_b)


def test_x25_spans_brute_force(spark):
    """The span panel equals a pure-Python replay at sf0.001: K-gram
    document frequencies, the df>=2 keep, and interval-union merging
    (touching-or-overlapping coverage fuses; a >=1-token clean gap
    splits)."""
    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.dedup import (
        _SPAN_K,
        x25_repeated_substring_spans,
    )

    sf = "/root/testdata/sf0.001"
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    gram_docs: dict[str, set] = {}
    per_doc: dict[int, list] = {}
    toks_by_doc: dict[int, int] = {}
    for did, text in docs:
        w = text.split(" ")
        toks_by_doc[did] = len(w)
        per_doc[did] = []
        for i in range(len(w) - _SPAN_K + 1):
            g = " ".join(w[i : i + _SPAN_K])
            gram_docs.setdefault(g, set()).add(did)
            per_doc[did].append((i, g))
    want = {}
    for did, grams in per_doc.items():
        hits = sorted(i for i, g in grams if len(gram_docs[g]) >= 2)
        spans = []
        for p in hits:
            e = p + _SPAN_K - 1
            if spans and p <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], e)
            else:
                spans.append([p, e])
        rep = sum(e - s + 1 for s, e in spans)
        want[did] = (toks_by_doc[did], len(spans), rep)
    rows = x25_repeated_substring_spans(spark, sf).collect()
    assert len(rows) == len(want)
    for r in rows:
        dt, ns, rep = want[r.doc_id]
        assert (r.doc_tokens, r.n_spans, r.repeated_tokens) == (dt, ns, rep), (
            r.doc_id
        )
        assert abs(r.repeated_frac - round(rep / dt, 4)) < 1e-9
    # the planted dups guarantee real spans, and the merge must have
    # produced at least one span longer than a single K-window
    assert any(r.n_spans >= 1 for r in rows)
    assert any(
        r.repeated_tokens > r.n_spans * _SPAN_K for r in rows if r.n_spans
    )


def test_x35_matrix_brute_force(spark):
    """The source-pair matrix equals a pure-Python replay of the
    word-set-fingerprint pair arithmetic at sf0.001, including the
    C(n,2) diagonal and n_a*n_b off-diagonal laws."""
    from collections import Counter, defaultdict

    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.dedup import (
        x35_cross_source_dup_matrix,
    )

    sf = "/root/testdata/sf0.001"
    docs = duckdb.sql(
        f"SELECT source, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    groups: dict[str, Counter] = defaultdict(Counter)
    for src, text in docs:
        key = " ".join(sorted(set(text.split(" "))))
        groups[key][src] += 1
    want: dict[tuple, int] = defaultdict(int)
    for cnt in groups.values():
        srcs = sorted(cnt)
        for i, sa in enumerate(srcs):
            na = cnt[sa]
            if na >= 2:
                want[(sa, sa)] += na * (na - 1) // 2
            for sb in srcs[i + 1 :]:
                want[(sa, sb)] += na * cnt[sb]
    got = {
        (r.src_a, r.src_b): r.n_dup_pairs
        for r in x35_cross_source_dup_matrix(spark, sf).collect()
    }
    assert got == dict(want)


def test_x2ac_calibration_statistics(spark, sf_dir):
    """x2ac sanity: estimates live on the k-grid in [0, 1], the error
    column is |est - J| exactly, and the estimator is calibrated —
    mean absolute error across pairs within a few binomial sd of
    sqrt(J(1-J)/k) (loose bound; the hash already pins exact values,
    this pins the STATISTICAL claim the probe exists to demonstrate)."""
    from realtime_financial_transactions_data_pipeline_spark.operators.dedup import (
        _X2AC_K,
        x2ac_minhash_calibration,
    )

    rows = x2ac_minhash_calibration(spark, sf_dir).collect()
    assert rows, "expected at least one exact near-dup pair to calibrate"
    for r in rows:
        assert 0 <= r.n_match <= _X2AC_K
        assert abs(r.est_jaccard - r.n_match / _X2AC_K) < 1e-9
        assert abs(r.abs_err - round(abs(r.est_jaccard - r.jaccard), 4)) < 1e-3
    mean_err = sum(r.abs_err for r in rows) / len(rows)
    # sd at J=0.5 is 0.125; planted dups sit higher (smaller sd) — a
    # mean |err| beyond 0.3 would mean the estimator is broken, not
    # noisy.
    assert mean_err < 0.3, mean_err
