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
