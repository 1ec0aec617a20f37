"""Measured-recall checks for the banded (approximate) near-dup paths
against their exact counterparts — the substitute verification for
guarantees an oracle-mirrored query can't express (the oracle reproduces
the same banding, so a recall gap is invisible to the hash compare).

- simhash: banded candidates vs the exact all-pairs hamming join —
  asserts the pigeonhole-complete zone (hamming ≤ bands−1), subset-with-
  identical-distance, and a measured recall floor at max_hamming.
- embedding LSH near-dup: every emitted (pair, cosine) must appear in
  the exact blocked variant's output with the identical cosine (the
  subset relation VERDICT r01 asked to pin driver-visibly).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"
SF_MID = "/root/testdata/sf0.01"


def test_simhash_banded_recall_vs_exact(spark):
    from stock_data_warehouse_analytics_spark.operators.dedup import (
        simhash_near_pairs,
        simhash_table,
    )
    from stock_data_warehouse_analytics_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    sh = simhash_table(docs)
    a, b = sh.alias("a"), sh.alias("b")
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    exact = {
        (r.doc_a, r.doc_b): r.hamming
        for r in (
            a.crossJoin(b)
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                ham.alias("hamming"),
            )
            .filter(F.col("hamming") <= 8)
        ).collect()
    }
    banded = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_near_pairs(docs, max_hamming=8, bands=4).collect()
    }

    # no false positives, identical hamming on the overlap
    for pair, h in banded.items():
        assert pair in exact, f"banded emitted non-near pair {pair}"
        assert exact[pair] == h

    # pigeonhole-complete zone: every pair within hamming ≤ bands−1 = 3
    low = {p for p, h in exact.items() if h <= 3}
    assert low <= set(banded), f"missed guaranteed pairs: {low - set(banded)}"

    # measured recall at max_hamming (0.43 on this corpus; floor with slack)
    recall = len(banded) / max(len(exact), 1)
    assert recall >= 0.3, f"simhash banded recall too low: {recall}"


def test_hll_sketch_union_accuracy(spark):
    """Sketch estimates (per-type and unioned ALL) must sit within 5%
    of the exact distinct counts, and the ALL row must come from the
    sketch-union path (not a raw re-count) — its estimate equals
    re-estimating the union of the per-type sketches."""
    from stock_data_warehouse_analytics_spark.plans.registry import (
        QUERIES,
        get_queries,
    )

    get_queries()
    rows = QUERIES["agg_hll_sketch_union"].fn(spark, SF_MID).collect()
    assert {r.event_type for r in rows} >= {"ALL", "click", "view"}
    for r in rows:
        assert r.rel_err <= 0.05, (r.event_type, r.estimate, r.exact_distinct)


def test_emb_neardup_lsh_subset_of_exact(spark):
    """Every LSH near-dup pair must appear in the exact variant's output
    with a bit-identical cosine (the LSH path is a candidate *pruner*,
    never a different scorer)."""
    from stock_data_warehouse_analytics_spark.plans.registry import (
        QUERIES,
        get_queries,
    )

    get_queries()  # ensure registration

    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in QUERIES["emb_neardup_exact"].fn(spark, SF_MID).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.cosine
        for r in QUERIES["emb_neardup_lsh"].fn(spark, SF_MID).collect()
    }
    assert lsh, "LSH variant emitted nothing"
    for pair, cos in lsh.items():
        assert pair in exact, f"LSH emitted pair absent from exact: {pair}"
        assert exact[pair] == cos, f"cosine mismatch on {pair}"


def test_hot_shingle_cap_skewed_corpus(spark):
    """The df-cap's scale contract on a corpus with one pathological
    shingle family (df ≈ n): the inverted-index self-join's candidate
    volume collapses from O(n²) to the true near-dup pairs, pairs with
    any non-hot overlap are all still found (recall 1.0 there), and the
    single deliberately-missed class — pairs similar ONLY through
    stop-shingles — is exactly the documented recall trade."""
    from stock_data_warehouse_analytics_spark.operators.dedup import (
        ngram_jaccard_pairs,
        shingle_table,
    )

    hot = "the quick brown fox jumps over"  # 4 all-hot trigrams, df = n
    rows = []
    for i in range(300):
        tail = " ".join(f"u{i}w{j}" for j in range(8))
        rows.append((i, f"{hot} {tail}"))
    # 10 planted near-dup pairs: same tail, last word changed
    for i in range(10):
        tail = " ".join(f"u{i}w{j}" for j in range(7)) + f" v{i}w7"
        rows.append((1000 + i, f"{hot} {tail}"))
    # a pair similar ONLY via the hot prefix (one unique word each)
    rows.append((2000, f"{hot} zonlya"))
    rows.append((2001, f"{hot} zonlyb"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])  # n = 312 → cap 50

    def n_candidates(sh):
        a, b = sh.alias("a"), sh.alias("b")
        return (
            a.join(b, "shingle")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .count()
        )

    # candidate-volume collapse: every doc shares the hot trigrams with
    # every other, so uncapped candidacy is ~4·n²/2; capped is ~tail-only
    uncapped_cand = n_candidates(shingle_table(docs, max_df=None))
    capped_cand = n_candidates(shingle_table(docs))  # auto cap
    assert uncapped_cand > 150_000, uncapped_cand
    assert capped_cand < 500, capped_cand

    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    uncapped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.5, max_df=None).collect()
    }

    planted = {(i, 1000 + i) for i in range(10)}
    assert planted <= set(capped), f"missed planted pairs: {planted - set(capped)}"
    # recall 1.0 on every pair with non-hot support: capped finds
    # everything uncapped found except the hot-only pair
    assert set(uncapped) - set(capped) == {(2000, 2001)}
    # and the hot-only pair is found by the uncapped join (so the miss
    # is the cap's doing, not the threshold's)
    assert (2000, 2001) in uncapped


def test_exact_substring_planted_spans(spark):
    """Plant a shared 200-token span inside N otherwise-distinct docs
    and assert exact_substring_spans recovers every pair with the EXACT
    span boundaries and length — the substitute check for the
    gaps-and-islands extension logic (the oracle replays the same
    algorithm, so a boundary bug would be invisible to the hash gate).
    Also pins: (a) a doc with NO overlap produces no rows, (b) two
    disjoint shared spans in one pair come out as two islands."""
    from stock_data_warehouse_analytics_spark.operators.dedup import (
        exact_substring_spans,
    )

    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(5000)]
    span = " ".join(rng.choice(vocab) for _ in range(200))
    span2 = " ".join(rng.choice(vocab) for _ in range(40))

    def noise(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    docs = [
        # span planted at token offsets 51 (doc 0), 11 (doc 1), 1 (doc 2)
        (0, noise(50) + " " + span + " " + noise(30)),
        (1, noise(10) + " " + span + " " + noise(5)),
        (2, span + " " + noise(80)),
        # doc with no overlap at all
        (3, noise(300)),
        # doc sharing TWO disjoint spans with doc 0: span2 + tail of span
        (4, span2 + " " + noise(60) + " " + span),
        (5, noise(20) + " " + span2 + " " + noise(40)),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = exact_substring_spans(df, k=8).collect()
    got = {
        (r.doc_a, r.doc_b): (r.start_a, r.start_b, r.span_tokens)
        for r in rows
        if (r.doc_a, r.doc_b) != (0, 4) and (r.doc_a, r.doc_b) != (4, 5)
    }
    # every planted pair found with exact boundaries (1-based positions)
    assert got[(0, 1)] == (51, 11, 200)
    assert got[(0, 2)] == (51, 1, 200)
    assert got[(1, 2)] == (11, 1, 200)
    # doc 3 appears nowhere
    assert not [r for r in rows if 3 in (r.doc_a, r.doc_b)]
    # doc 0 vs doc 4: exactly one island — the 200-token span (doc 4
    # holds it at offset 40+60+1 = 101); doc 4 vs 5 share span2 (40 toks)
    d04 = [r for r in rows if (r.doc_a, r.doc_b) == (0, 4)]
    assert len(d04) == 1 and (
        d04[0].start_a,
        d04[0].start_b,
        d04[0].span_tokens,
    ) == (51, 101, 200)
    d45 = [r for r in rows if (r.doc_a, r.doc_b) == (4, 5)]
    assert len(d45) == 1 and (
        d45[0].start_a,
        d45[0].start_b,
        d45[0].span_tokens,
    ) == (1, 21, 40)


def test_semantic_dedup_planted_groups(spark):
    """Seeded corpus with planted semantic duplicate groups: each group
    is one base vector plus tiny perturbations (cosine ≥ 0.999 —
    far above the 0.97 threshold), distinct base vectors are
    near-orthogonal in expectation (dim 32, cosine ≪ 0.9).  Asserts:
    every planted group keeps exactly its min id and drops the rest,
    every singleton survives, and the whole decision table is
    deterministic across two independent runs (Lloyd + CC are
    RNG-free)."""
    import numpy as np

    from stock_data_warehouse_analytics_spark.operators.similarity import (
        semantic_dedup,
    )

    rng = np.random.default_rng(7)
    dim = 32
    base = rng.normal(size=(40, dim))
    rows = []
    # ids 0..39 are the 40 base vectors; groups: base i in {0,1,2,3,4}
    # gets dupes at ids 100+i and 200+i (perturbation 1e-4)
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    for i in range(5):
        for off in (100, 200):
            pert = base[i] + 1e-4 * rng.normal(size=dim)
            rows.append((off + i, [float(x) for x in pert]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out1 = semantic_dedup(df, threshold=0.97, n_cells=8).orderBy("vec_id")
    got1 = {r.vec_id: (r.cluster_id, r.keep) for r in out1.collect()}

    for i in range(5):
        assert got1[i] == (i, True), f"group {i} representative wrong"
        assert got1[100 + i] == (i, False)
        assert got1[200 + i] == (i, False)
    for i in range(5, 40):
        assert got1[i] == (i, True), f"singleton {i} should survive"

    # determinism: an independent second run yields the identical table
    out2 = semantic_dedup(df, threshold=0.97, n_cells=8).orderBy("vec_id")
    got2 = {r.vec_id: (r.cluster_id, r.keep) for r in out2.collect()}
    assert got1 == got2


def test_semantic_dedup_ivf2_planted(spark):
    """Planted-dupe PARITY between two-level and single-level semantic
    dedup (VERDICT r4 action #3): the same seeded corpus as
    test_semantic_dedup_planted_groups — 40 near-orthogonal bases,
    five groups with two 1e-4 perturbations each — must yield the
    IDENTICAL (cluster_id, keep) decision table under
    ``semantic_dedup_ivf2`` (perturbation groups co-locate in the same
    (cell, sub) bucket, so the documented cross-SUB-cell recall trade
    cannot bite here), and the run must be deterministic."""
    import numpy as np

    from stock_data_warehouse_analytics_spark.operators.similarity import (
        semantic_dedup_ivf2,
    )

    rng = np.random.default_rng(7)  # same seed as the single-level test
    dim = 32
    base = rng.normal(size=(40, dim))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    for i in range(5):
        for off in (100, 200):
            pert = base[i] + 1e-4 * rng.normal(size=dim)
            rows.append((off + i, [float(x) for x in pert]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out1 = semantic_dedup_ivf2(
        df, threshold=0.97, n_coarse=4, n_sub=2
    ).orderBy("vec_id")
    got1 = {r.vec_id: (r.cluster_id, r.keep) for r in out1.collect()}

    for i in range(5):
        assert got1[i] == (i, True), f"group {i} representative wrong"
        assert got1[100 + i] == (i, False)
        assert got1[200 + i] == (i, False)
    for i in range(5, 40):
        assert got1[i] == (i, True), f"singleton {i} should survive"

    out2 = semantic_dedup_ivf2(
        df, threshold=0.97, n_coarse=4, n_sub=2
    ).orderBy("vec_id")
    got2 = {r.vec_id: (r.cluster_id, r.keep) for r in out2.collect()}
    assert got1 == got2


def test_semantic_dedup_incremental_planted(spark):
    """Planted cross-batch and within-batch semantic dupes for the
    incremental admission operator: an old corpus of 40 near-orthogonal
    vectors; a new batch containing (a) two near-copies of old vectors
    → dup_vs_corpus, (b) two near-copies of one novel vector →
    dup_within_batch on both, (c) two novel singletons → no flags."""
    import numpy as np

    from stock_data_warehouse_analytics_spark.operators.similarity import (
        semantic_dedup_incremental,
    )

    rng = np.random.default_rng(11)
    dim = 32
    base = rng.normal(size=(40, dim))
    old = [(i, [float(x) for x in base[i]]) for i in range(40)]
    novel = rng.normal(size=(3, dim))
    new = [
        (100, [float(x) for x in base[3] + 1e-4 * rng.normal(size=dim)]),
        (101, [float(x) for x in base[7] + 1e-4 * rng.normal(size=dim)]),
        (102, [float(x) for x in novel[0]]),
        (103, [float(x) for x in novel[0] + 1e-4 * rng.normal(size=dim)]),
        (104, [float(x) for x in novel[1]]),
        (105, [float(x) for x in novel[2]]),
    ]
    schema = "vec_id long, embedding array<double>"
    dec = semantic_dedup_incremental(
        spark.createDataFrame(old, schema),
        spark.createDataFrame(new, schema),
        threshold=0.97,
        n_cells=8,
    )
    got = {
        r.vec_id: (r.dup_vs_corpus, r.dup_within_batch) for r in dec.collect()
    }
    assert got[100] == (True, False)
    assert got[101] == (True, False)
    assert got[102] == (False, True)
    assert got[103] == (False, True)
    assert got[104] == (False, False)
    assert got[105] == (False, False)
    assert len(got) == 6


def test_rowwise_minhash_bands_parity_with_grouped(spark):
    """The per-row (stream-safe) minhash band expression must be
    bit-identical to the grouped banded_signatures(max_df=None) path
    on the real corpus — the equality the streaming admission
    pipeline's correctness rests on (was verified ad hoc when the
    operator landed; this pins it against refactors)."""
    from stock_data_warehouse_analytics_spark.operators.dedup import (
        banded_signatures,
        rowwise_minhash_bands,
    )
    from stock_data_warehouse_analytics_spark.sources.tables import load_table

    d = load_table(spark, SF_SMALL, "documents")
    a = d.select(
        "doc_id", F.explode(rowwise_minhash_bands(F.col("text"))).alias("bb")
    ).select("doc_id", "bb.band", "bb.band_hash")
    b = banded_signatures(d, max_df=None)
    assert a.count() == b.count() > 0
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_positioned_shingle_cap_splits_spans(spark):
    """The positioned table's occurrence cap: a k-gram planted in more
    docs than the cap disappears from the representation, so a span
    crossing it SPLITS into two shorter spans (the documented recall
    trade) — while an identical corpus under the cap reports the one
    full-length span."""
    from stock_data_warehouse_analytics_spark.operators.dedup import (
        exact_substring_spans,
    )

    import random

    rng = random.Random(9)
    vocab = [f"v{i}" for i in range(4000)]
    left = " ".join(rng.choice(vocab) for _ in range(20))
    hot = " ".join(f"h{j}" for j in range(8))  # the k=8 seed to cap away
    right = " ".join(rng.choice(vocab) for _ in range(20))
    span = f"{left} {hot} {right}"  # 48 tokens, hot seed in the middle

    def noise(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    docs = [(0, span + " " + noise(30)), (1, noise(10) + " " + span)]
    # many unrelated docs all containing the hot 8-gram → its df blows
    # past an explicit cap of 5
    docs += [(100 + i, noise(6) + " " + hot + " " + noise(6)) for i in range(12)]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    uncapped = [
        (r.start_a, r.start_b, r.span_tokens)
        for r in exact_substring_spans(df, k=8, max_df=None)
        .filter((F.col("doc_a") == 0) & (F.col("doc_b") == 1))
        .collect()
    ]
    assert uncapped == [(1, 11, 48)], uncapped

    capped = sorted(
        (r.start_a, r.start_b, r.span_tokens)
        for r in exact_substring_spans(df, k=8, max_df=5)
        .filter((F.col("doc_a") == 0) & (F.col("doc_b") == 1))
        .collect()
    )
    # the hot middle seed is gone: the 48-token span splits into two
    # spans that each still cover their flank plus the adjacent hot
    # tokens reachable by uncapped seeds
    assert len(capped) == 2, capped
    assert capped[0][0] == 1 and capped[1][2] < 48 and capped[0][2] < 48
    # the two fragments together still cover most of the span
    assert capped[0][2] + capped[1][2] >= 40, capped
