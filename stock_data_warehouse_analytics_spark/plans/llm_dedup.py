"""Deduplication queries over ``documents`` — exact, n-gram Jaccard,
MinHash-LSH, SimHash.  Oracle SQL is generated from the same constants
(``operators/dedup.py``) so signatures are bit-identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.graph import connected_components
from ..operators.dedup import (
    MAX_DF_FLOOR,
    MAX_DF_FRAC_DEN,
    MINHASH_PRIME,
    exact_dedup_groups,
    exact_substring_spans,
    minhash_candidate_pairs,
    minhash_params,
    minhash_signatures,
    ngram_jaccard_pairs,
    repeated_spans_within_doc,
    rowwise_minhash_bands,
    simhash_near_pairs,
    span_coverage,
)
from ..sources.tables import load_table
from ..operators.localrel import literal_df
from .registry import register

_SQL_TOKENS = r"string_split_regex(lower(trim(text)), '\s+')"

# Shingle CTE with the hot-shingle document-frequency cap (mirror of
# operators.dedup.shingle_table(max_df="auto"): a shingle kept iff its
# df <= max(MAX_DF_FLOOR, n_docs // MAX_DF_FRAC_DEN)).  Integer-only
# arithmetic so the boundary is bit-identical cross-engine.
_SQL_SHINGLES = f"""
toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
sh_all AS (
  SELECT doc_id, unnest(
    CASE WHEN len(t) >= 3 THEN list_distinct(
           list_transform(generate_series(1, len(t) - 2),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         ELSE [array_to_string(t, ' ')] END) AS shingle
  FROM toks
),
sh AS (
  SELECT doc_id, shingle FROM sh_all
  QUALIFY COUNT(*) OVER (PARTITION BY shingle)
          <= (SELECT GREATEST({MAX_DF_FLOOR}, COUNT(*) // {MAX_DF_FRAC_DEN})
              FROM documents)
)
"""

_SQL_H60 = "(('0x' || substr(md5(shingle), 1, 15))::BIGINT)"


@register(
    "dedup_exact",
    tags=("llm", "dedup", "exact"),
    oracle="""
SELECT
  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
  COUNT(*) AS n_docs,
  MIN(doc_id) AS survivor_doc_id
FROM documents
GROUP BY 1
ORDER BY fingerprint
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups (hash-groupBy on normalized content md5)."""
    d = load_table(spark, sf_dir, "documents")
    return exact_dedup_groups(d).orderBy("fingerprint")


@register(
    "dedup_ngram_jaccard",
    tags=("llm", "dedup", "jaccard"),
    oracle=f"""
WITH {_SQL_SHINGLES},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(c / (sa.n + sb.n - c), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE ROUND(c / (sa.n + sb.n - c), 6) >= 0.5
ORDER BY doc_a, doc_b
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard near-dup pairs (threshold 0.5) via the
    inverted-index shingle join, hot shingles (df > max(50, 1% of
    corpus)) removed from the representation before the self-join —
    the cap that keeps the join from going O(df²) on stop-shingles at
    100 TB (no-op on this corpus: max df ≪ cap; skew behavior pinned
    by tests/test_dedup_recall.py)."""
    from .dedup_store import staged_shingles

    return ngram_jaccard_pairs(
        None, threshold=0.5, sh=staged_shingles(spark, sf_dir)
    ).orderBy("doc_a", "doc_b")


def _sql_minhash_ctes(n_hashes: int = 16, bands: int = 4) -> str:
    """CTE chain ending in ``pairs(doc_a, doc_b)`` — shared by the
    pair query and the recursive connected-components oracle."""
    rows = n_hashes // bands
    sig_cols = ",\n    ".join(
        f"MIN(({a} * hm + {b}) % {MINHASH_PRIME}) AS mh{i}"
        for i, (a, b) in enumerate(minhash_params(n_hashes))
    )
    band_rows = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {b} AS band, md5({concat}) AS band_hash FROM sig".format(
            b=b,
            concat=" || ',' || ".join(
                f"mh{b * rows + r}::VARCHAR" for r in range(rows)
            ),
        )
        for b in range(bands)
    )
    return f"""{_SQL_SHINGLES},
hm AS (SELECT doc_id, ({_SQL_H60} % {MINHASH_PRIME}) AS hm FROM sh),
sig AS (SELECT doc_id, {sig_cols} FROM hm GROUP BY doc_id),
banded AS (
{band_rows}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b USING (band, band_hash)
  WHERE a.doc_id < b.doc_id
)"""


def _sql_minhash_pairs(n_hashes: int = 16, bands: int = 4) -> str:
    return f"""
WITH {_sql_minhash_ctes(n_hashes, bands)}
SELECT doc_a, doc_b FROM pairs
ORDER BY doc_a, doc_b
"""


@register(
    "dedup_minhash_lsh",
    tags=("llm", "dedup", "minhash"),
    oracle=_sql_minhash_pairs(),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16)+LSH(4 bands) candidate pairs — deterministic
    md5-derived permutation hashes, bucket join, no O(n²)."""
    from .dedup_store import staged_candidates

    return staged_candidates(spark, sf_dir).orderBy("doc_a", "doc_b")


# Per-session memo of the MinHash-CC cluster assignment per sf_dir —
# the (doc_id, cluster_id) table is consumed by three registered
# queries (cluster listing, keep/drop decision, training manifest); a
# production pipeline persists it once per crawl.  The table is
# ≤ one row per doc participating in a candidate pair (≪ corpus) and
# connected_components already localCheckpoints its iterations, so one
# more checkpoint pins the final assignment.  Entries die with their
# session (WeakKeyDictionary, same stance as _SPANS_CACHE below).
import weakref as _weakref

_CC_CACHE: "_weakref.WeakKeyDictionary[SparkSession, dict]" = (
    _weakref.WeakKeyDictionary()
)


def _cc_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id) from MinHash(16)+LSH(4) pairs closed by
    distributed connected components, memoized per (session, sf_dir).
    Staleness contract: see ``ab_testing.user_day_purchases`` — the
    memo is never invalidated; inputs are immutable per session."""
    per_session = _CC_CACHE.setdefault(spark, {})
    if sf_dir not in per_session:
        from .dedup_store import staged_candidates

        edges = staged_candidates(spark, sf_dir)
        per_session[sf_dir] = (
            connected_components(edges, src="doc_a", dst="doc_b")
            .select(
                F.col("node").alias("doc_id"),
                F.col("comp").alias("cluster_id"),
            )
            .localCheckpoint(eager=True)
        )
    return per_session[sf_dir]


@register(
    "dedup_clusters_cc",
    tags=("llm", "dedup", "graph", "connected-components"),
    oracle=f"""
WITH RECURSIVE {_sql_minhash_ctes()},
sym AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach(node, comp) AS (
  SELECT DISTINCT a, a FROM sym
  UNION
  SELECT s.a, r.comp FROM sym s JOIN reach r ON r.node = s.b
),
assign AS (
  SELECT node AS doc_id, MIN(comp) AS cluster_id FROM reach GROUP BY node
)
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       (doc_id = cluster_id) AS is_survivor
FROM assign
ORDER BY doc_id
""",
)
def dedup_clusters_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS from the MinHash-LSH pair graph via
    distributed connected components (min-label propagation,
    ``operators/graph.py``) — the step that turns pairwise candidates
    into keep-one-per-cluster decisions (survivor = min doc_id, the
    same canonical-representative rule as ``dedup_exact``).  The
    oracle replays the identical pair generation and closes it with a
    recursive CTE, so cluster assignments compare bit-for-bit."""
    w = Window.partitionBy("cluster_id")
    return (
        _cc_assignment(spark, sf_dir)
        .withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .withColumn("is_survivor", F.col("doc_id") == F.col("cluster_id"))
        .orderBy("doc_id")
    )


def _sql_simhash_pairs(bits: int = 60, bands: int = 4, max_hamming: int = 8) -> str:
    width = bits // bands
    mask = (1 << width) - 1
    bit_sums = ",\n    ".join(
        f"SUM(CASE WHEN (h & {1 << j}) != 0 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(bits)
    )
    assemble = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j}::BIGINT ELSE 0 END)" for j in range(bits)
    )
    band_rows = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, sh, {b} AS band, (sh >> {b * width}) & {mask} AS band_val FROM sim"
        for b in range(bands)
    )
    return f"""
WITH tok AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS t FROM documents),
th AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok),
bitsums AS (SELECT doc_id, {bit_sums} FROM th GROUP BY doc_id),
sim AS (SELECT doc_id, ({assemble}) AS sh FROM bitsums),
banded AS (
{band_rows}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.sh, b.sh)) AS hamming
FROM banded a JOIN banded b USING (band, band_val)
WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sh, b.sh)) <= {max_hamming}
ORDER BY doc_a, doc_b
"""


@register(
    "dedup_simhash",
    tags=("llm", "dedup", "simhash"),
    oracle=_sql_simhash_pairs(),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(60-bit) near-dup pairs, banded (15-bit × 4) candidate
    join, hamming ≤ 8.  Complete for hamming ≤ 3 (pigeonhole over 4
    bands); approximate-recall beyond — see
    ``operators.dedup.simhash_near_pairs`` and the recall test."""
    from .dedup_store import staged_simhash_pairs

    return staged_simhash_pairs(spark, sf_dir).orderBy("doc_a", "doc_b")


@register(
    "dedup_keep_representative",
    tags=("llm", "dedup", "end-to-end"),
    oracle=f"""
WITH RECURSIVE {_sql_minhash_ctes()},
sym AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach(node, comp) AS (
  SELECT DISTINCT a, a FROM sym
  UNION
  SELECT s.a, r.comp FROM sym s JOIN reach r ON r.node = s.b
),
assign AS (
  SELECT node AS doc_id, MIN(comp) AS cluster_id FROM reach GROUP BY node
),
decided AS (
  SELECT d.doc_id, d.lang, d.source,
         (a.doc_id IS NULL OR a.doc_id = a.cluster_id) AS keep
  FROM documents d LEFT JOIN assign a USING (doc_id)
)
SELECT lang, keep, COUNT(*) AS n_docs
FROM decided
GROUP BY lang, keep
ORDER BY lang, keep
""",
)
def dedup_keep_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end dedup DECISION: every document either survives
    (not near-duplicated, or the min-id representative of its cluster)
    or is dropped — pair generation → connected components → survivor
    join back to the corpus, summarized per (lang, keep).  This is the
    query a training-data pipeline actually runs; the pieces are
    individually oracle-checked upstream (dedup_minhash_lsh,
    dedup_clusters_cc)."""
    d = load_table(spark, sf_dir, "documents")
    comp = _cc_assignment(spark, sf_dir)
    decided = d.join(comp, "doc_id", "left").select(
        "lang",
        (
            F.col("cluster_id").isNull()
            | (F.col("doc_id") == F.col("cluster_id"))
        ).alias("keep"),
    )
    return (
        decided.groupBy("lang", "keep")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "keep")
    )


# ------------------------------------------------- exact substring dedup

_SUBSTR_K = 8  # seed width = minimum reportable span, in tokens

# CTE chain ending in ``spans(doc_a, doc_b, start_a, start_b,
# span_tokens, n_seed_matches)`` — the maximal-shared-span table,
# shared by the span query and the coverage rollup.
_SQL_SPANS = f"""
toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
ps_all AS (
  SELECT doc_id,
         unnest(generate_series(1, len(t) - {_SUBSTR_K - 1})) AS pos,
         unnest(list_transform(generate_series(1, len(t) - {_SUBSTR_K - 1}),
                i -> array_to_string(t[i:i+{_SUBSTR_K - 1}], ' '))) AS shingle
  FROM toks WHERE len(t) >= {_SUBSTR_K}
),
ps AS (
  SELECT doc_id, pos, shingle FROM ps_all
  QUALIFY COUNT(*) OVER (PARTITION BY shingle)
          <= (SELECT GREATEST({MAX_DF_FLOOR}, COUNT(*) // {MAX_DF_FRAC_DEN})
              FROM documents)
),
m AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.pos AS pos_a, a.pos - b.pos AS diag
  FROM ps a JOIN ps b USING (shingle)
  WHERE a.doc_id < b.doc_id
),
isl AS (
  SELECT doc_a, doc_b, diag, pos_a,
         pos_a - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, diag
                                    ORDER BY pos_a) AS grp
  FROM m
),
spans AS (
  SELECT doc_a, doc_b,
         CAST(MIN(pos_a) AS BIGINT) AS start_a,
         CAST(MIN(pos_a) - diag AS BIGINT) AS start_b,
         CAST(MAX(pos_a) - MIN(pos_a) + {_SUBSTR_K} AS BIGINT) AS span_tokens,
         COUNT(*) AS n_seed_matches
  FROM isl
  GROUP BY doc_a, doc_b, diag, grp
  HAVING MAX(pos_a) - MIN(pos_a) + {_SUBSTR_K} >= {_SUBSTR_K}
)"""


# Per-session memo of the (localCheckpoint-materialized) maximal-span
# table per sf_dir — two registered queries (the span list and the
# coverage rollup) consume the same spans; the table is ~shared-token
# volume, far smaller than the corpus, so materializing it once is the
# production shape (a pipeline would persist it).  Entries die with
# their session.
import weakref

_SPANS_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def _substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_session = _SPANS_CACHE.setdefault(spark, {})
    if sf_dir not in per_session:
        d = load_table(spark, sf_dir, "documents")
        per_session[sf_dir] = exact_substring_spans(
            d, k=_SUBSTR_K
        ).localCheckpoint(eager=True)
    return per_session[sf_dir]


@register(
    "dedup_exact_substring",
    tags=("llm", "dedup", "substring", "islands"),
    oracle=f"""
WITH {_SQL_SPANS}
SELECT doc_a, doc_b, start_a, start_b, span_tokens, n_seed_matches
FROM spans
ORDER BY doc_a, doc_b, start_a, start_b
""",
)
def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT SUBSTRING dedup — every maximal shared token span of
    ≥ 8 tokens between distinct documents, found relationally
    (positioned k-gram inverted index → diagonal gaps-and-islands)
    instead of the sequential suffix-array construction of Lee et al.
    2022.  Catches the licence-header / boilerplate-paragraph case that
    whole-doc dedup misses.  Oracle-exact: tokenization, seed matching
    and island extension are deterministic integer arithmetic on both
    engines.  Planted-span recall is pinned by
    ``tests/test_dedup_recall.py::test_exact_substring_planted_spans``.
    Scale: seed join is df-capped (hot boilerplate k-grams dropped —
    the O(occ²) guard); the window+group run over the seed-MATCH table
    (≈ shared-token volume, ≪ corpus)."""
    return _substring_spans(spark, sf_dir).orderBy(
        "doc_a", "doc_b", "start_a", "start_b"
    )


_WD_K = 3  # within-doc seed width (3-grams: repetition shows at small k)
_WD_MAX_OCC = 50


@register(
    "text_repeated_spans_within_doc",
    tags=("llm", "dedup", "repetition", "islands"),
    oracle=f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
ps_all AS (
  SELECT doc_id,
         unnest(generate_series(1, len(t) - {_WD_K - 1})) AS pos,
         unnest(list_transform(generate_series(1, len(t) - {_WD_K - 1}),
                i -> array_to_string(t[i:i+{_WD_K - 1}], ' '))) AS shingle
  FROM toks WHERE len(t) >= {_WD_K}
),
ps AS (
  SELECT doc_id, pos, shingle FROM ps_all
  QUALIFY COUNT(*) OVER (PARTITION BY doc_id, shingle) <= {_WD_MAX_OCC}
),
m AS (
  SELECT a.doc_id, a.pos AS pos_a, b.pos - a.pos AS diag
  FROM ps a JOIN ps b USING (doc_id, shingle)
  WHERE a.pos < b.pos
),
isl AS (
  SELECT doc_id, diag, pos_a,
         pos_a - ROW_NUMBER() OVER (PARTITION BY doc_id, diag
                                    ORDER BY pos_a) AS grp
  FROM m
)
SELECT doc_id,
       CAST(MIN(pos_a) AS BIGINT) AS start_first,
       CAST(MIN(pos_a) + diag AS BIGINT) AS start_second,
       CAST(MAX(pos_a) - MIN(pos_a) + {_WD_K} AS BIGINT) AS span_tokens,
       COUNT(*) AS n_seed_matches
FROM isl
GROUP BY doc_id, diag, grp
ORDER BY doc_id, start_first, start_second
""",
)
def text_repeated_spans_within_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-doc repeated spans (repetition removal's position-level
    view — where ``text_repetition_signals`` scores, this LOCATES):
    maximal token spans occurring twice in one document, via the
    doc-local diagonal gaps-and-islands over the positioned 3-gram
    table with a per-(doc, shingle) occurrence cap (the within-doc
    O(occ²) guard — ``operators/dedup.py``).  Join key (doc_id,
    shingle) is never globally hot.  Oracle-exact."""
    d = load_table(spark, sf_dir, "documents")
    return repeated_spans_within_doc(
        d, k=_WD_K, max_occ_per_doc=_WD_MAX_OCC
    ).orderBy("doc_id", "start_first", "start_second")


@register(
    "dedup_span_coverage",
    tags=("llm", "dedup", "substring", "coverage", "islands"),
    oracle=f"""
WITH {_SQL_SPANS},
iv AS (
  -- DISTINCT is load-bearing: duplicate (doc, s, e) twins make the
  -- (s, e) window order non-total, and the two island windows below
  -- may sort independently — swapped twins split across islands and
  -- bridge gaps (nondeterministic results; see union_intervals)
  SELECT DISTINCT doc_id, s, e FROM (
    SELECT doc_a AS doc_id, start_a AS s,
           start_a + span_tokens - 1 AS e FROM spans
    UNION ALL
    SELECT doc_b, start_b, start_b + span_tokens - 1 FROM spans
  )
),
marked AS (
  SELECT doc_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY doc_id
                ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS new_isl
  FROM iv
),
isl2 AS (
  SELECT doc_id, s, e,
         SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY s, e
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM marked
),
merged AS (
  SELECT doc_id, isl, MIN(s) AS ms, MAX(e) AS me
  FROM isl2 GROUP BY doc_id, isl
),
cov AS (
  SELECT doc_id, CAST(SUM(me - ms + 1) AS BIGINT) AS covered_tokens,
         COUNT(*) AS n_intervals
  FROM merged GROUP BY doc_id
)
SELECT c.doc_id,
       CAST(len(t.t) AS BIGINT) AS n_tokens,
       c.covered_tokens,
       c.n_intervals,
       ROUND(c.covered_tokens / CAST(len(t.t) AS BIGINT), 6) AS coverage,
       c.covered_tokens * 100 >= CAST(len(t.t) AS BIGINT) * 20 AS would_drop
FROM cov c JOIN toks t USING (doc_id)
ORDER BY doc_id
""",
)
def dedup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-dedup YIELD decision: per document, the fraction of
    tokens inside spans shared with ANY other document — the interval
    UNION of its ``dedup_exact_substring`` spans (a second
    gaps-and-islands, over intervals), with a ≥20%-coverage
    ``would_drop`` gate (integer-arithmetic boundary).  The operator a
    pipeline runs between span detection and corpus rewrite.
    Oracle-exact end-to-end — both islands stages replay identically
    in SQL."""
    d = load_table(spark, sf_dir, "documents")
    return span_coverage(
        d,
        k=_SUBSTR_K,
        drop_threshold_pct=20,
        spans=_substring_spans(spark, sf_dir),
    ).orderBy("doc_id")


_CONTAM_MIN_SPAN = 13  # GPT-3-style 13-gram contamination rule


@register(
    "contamination_span_level",
    tags=("llm", "dedup", "contamination", "eval", "islands"),
    oracle=f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
ps_all AS (
  SELECT doc_id,
         unnest(generate_series(1, len(t) - {_SUBSTR_K - 1})) AS pos,
         unnest(list_transform(generate_series(1, len(t) - {_SUBSTR_K - 1}),
                i -> array_to_string(t[i:i+{_SUBSTR_K - 1}], ' '))) AS shingle
  FROM toks WHERE len(t) >= {_SUBSTR_K}
),
ps AS (
  SELECT doc_id, pos, shingle FROM ps_all
  QUALIFY COUNT(*) OVER (PARTITION BY shingle)
          <= (SELECT GREATEST({MAX_DF_FLOOR}, COUNT(*) // {MAX_DF_FRAC_DEN})
              FROM documents)
),
m AS (
  SELECT a.doc_id AS test_doc, b.doc_id AS train_doc,
         a.pos AS pos_a, a.pos - b.pos AS diag
  FROM ps a JOIN ps b USING (shingle)
  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
),
isl AS (
  SELECT test_doc, train_doc, diag, pos_a,
         pos_a - ROW_NUMBER() OVER (PARTITION BY test_doc, train_doc, diag
                                    ORDER BY pos_a) AS grp
  FROM m
),
spans AS (
  SELECT test_doc, train_doc,
         CAST(MAX(pos_a) - MIN(pos_a) + {_SUBSTR_K} AS BIGINT) AS span_tokens
  FROM isl
  GROUP BY test_doc, train_doc, diag, grp
)
SELECT test_doc,
       COUNT(*) AS n_spans,
       CAST(MAX(span_tokens) AS BIGINT) AS max_span_tokens,
       CAST(COUNT(DISTINCT train_doc) AS BIGINT) AS n_train_partners,
       MAX(span_tokens) >= {_CONTAM_MIN_SPAN} AS contaminated
FROM spans
GROUP BY test_doc
ORDER BY test_doc
""",
)
def contamination_span_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPAN-LEVEL test-set contamination — the production eval-hygiene
    check (GPT-3's 13-gram rule): exact shared token spans between the
    held-out half (odd doc_id) and the train half (even doc_id), via
    the same positioned-diagonal islands as ``dedup_exact_substring``
    but with FIXED sides (test×train only — no within-split pairs).
    Per test doc: span count, longest span, distinct train partners,
    and the ≥13-token ``contaminated`` verdict.  Where
    ``text_contamination_overlap`` scores bag-of-ngrams overlap, this
    LOCATES verbatim leakage.  Oracle-exact; same df-capped seed join
    (one shuffle), islands over the match table ≪ corpus."""
    # Derived from the session-cached all-pairs span table: a
    # test×train span is exactly an all-pairs span whose endpoints have
    # opposite doc_id parity (relabel so the odd side is test_doc) —
    # no second positioned-index pass.  Island structure is identical:
    # side-filtering the seed matches and side-filtering the resulting
    # spans commute, because islands never merge across doc pairs.
    all_spans = _substring_spans(spark, sf_dir)
    a_test = all_spans.filter(
        (F.col("doc_a") % 2 == 1) & (F.col("doc_b") % 2 == 0)
    ).select(
        F.col("doc_a").alias("test_doc"),
        F.col("doc_b").alias("train_doc"),
        "span_tokens",
    )
    b_test = all_spans.filter(
        (F.col("doc_a") % 2 == 0) & (F.col("doc_b") % 2 == 1)
    ).select(
        F.col("doc_b").alias("test_doc"),
        F.col("doc_a").alias("train_doc"),
        "span_tokens",
    )
    spans = a_test.unionByName(b_test)
    return (
        spans.groupBy("test_doc")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.max("span_tokens").cast("long").alias("max_span_tokens"),
            F.countDistinct("train_doc").cast("long").alias("n_train_partners"),
            (F.max("span_tokens") >= _CONTAM_MIN_SPAN).alias("contaminated"),
        )
        .orderBy("test_doc")
    )


@register(
    "stream_dedup_admission",
    tags=("streaming", "llm", "dedup", "admission", "minhash"),
    oracle=f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
sh_all AS (
  SELECT doc_id, unnest(
    CASE WHEN len(t) >= 3 THEN list_distinct(
           list_transform(generate_series(1, len(t) - 2),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         ELSE [array_to_string(t, ' ')] END) AS shingle
  FROM toks
),
hm AS (SELECT doc_id, ({_SQL_H60} % {MINHASH_PRIME}) AS hm FROM sh_all),
sig AS (SELECT doc_id, {", ".join(f"MIN(({a} * hm + {b}) % {MINHASH_PRIME}) AS mh{i}" for i, (a, b) in enumerate(minhash_params(16)))} FROM hm GROUP BY doc_id),
banded AS (
{chr(10).join("  SELECT doc_id, %d AS band, md5(%s) AS band_hash FROM sig UNION ALL" % (b, " || ',' || ".join(f"mh{b * 4 + r}::VARCHAR" for r in range(4))) for b in range(3))}
  SELECT doc_id, 3 AS band, md5({" || ',' || ".join(f"mh{12 + r}::VARCHAR" for r in range(4))}) AS band_hash FROM sig
),
hits AS (
  SELECT n.doc_id, CAST(COUNT(DISTINCT o.doc_id) AS BIGINT) AS n_dup_partners
  FROM banded n JOIN banded o USING (band, band_hash)
  WHERE n.doc_id % 2 = 1 AND o.doc_id % 2 = 0
  GROUP BY n.doc_id
)
SELECT d.doc_id,
       COALESCE(h.n_dup_partners, 0) AS n_dup_partners,
       h.doc_id IS NOT NULL AS is_dup
FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
LEFT JOIN hits h USING (doc_id)
ORDER BY doc_id
""",
)
def stream_dedup_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the STREAMING dedup admission pipeline
    (``streaming/admission.py``): odd-doc_id documents play the
    arriving stream, even-doc_id the existing corpus.  Signatures are
    the PER-ROW map-side MinHash bands (``rowwise_minhash_bands`` —
    bit-identical to the grouped path, UNCAPPED on both sides because
    an arriving row can't see corpus df), probed against the broadcast
    static band index; the decision layer flags any-hit docs with their
    distinct-partner count.  Stream ≡ batch asserted in
    tests/test_streaming_multimodal.py::
    test_stream_dedup_admission_equals_batch.  The streaming hot path
    is STATELESS — no watermark, no state store — which is what makes
    this shape run at ingest rates."""
    from ..operators.dedup import banded_signatures

    d = load_table(spark, sf_dir, "documents")
    # batch twin computes BOTH sides with the grouped signature path
    # (banded_signatures, max_df=None) — bit-identical to the per-row
    # expression (parity proven in the stream==batch test, where the
    # arriving side really does run rowwise_minhash_bands) and ~8×
    # faster in batch: the grouped MIN is hash-aggregated, while the
    # per-row array fold is interpreted per element
    sigb = banded_signatures(d, max_df=None)
    static = sigb.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("corpus_doc_id"), "band", "band_hash"
    )
    newb = sigb.filter(F.col("doc_id") % 2 == 1)
    new = d.filter(F.col("doc_id") % 2 == 1)
    hits = (
        # no forced broadcast: the static band index is corpus-sized
        # (bucketed by (band, band_hash) at scale — admission_matches)
        newb.join(static, ["band", "band_hash"])
        .groupBy("doc_id")
        .agg(
            F.countDistinct("corpus_doc_id").cast("long").alias("n_dup_partners")
        )
    )
    return (
        new.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_dup_partners", F.lit(0)).cast("long").alias(
                "n_dup_partners"
            ),
            F.col("n_dup_partners").isNotNull().alias("is_dup"),
        )
        .orderBy("doc_id")
    )


@register(
    "dedup_detector_ensemble",
    tags=("llm", "dedup", "ensemble", "provenance"),
    oracle=f"""
WITH mh AS (
  SELECT doc_a, doc_b FROM (
    {_sql_minhash_pairs().replace("ORDER BY doc_a, doc_b", "")}
  )
),
sh2 AS (
  SELECT doc_a, doc_b FROM (
    {_sql_simhash_pairs().replace("ORDER BY doc_a, doc_b", "")}
  )
),
joined AS (
  SELECT COALESCE(m.doc_a, s.doc_a) AS doc_a,
         COALESCE(m.doc_b, s.doc_b) AS doc_b,
         m.doc_a IS NOT NULL AS in_minhash,
         s.doc_a IS NOT NULL AS in_simhash
  FROM mh m FULL OUTER JOIN sh2 s
    ON m.doc_a = s.doc_a AND m.doc_b = s.doc_b
)
SELECT in_minhash, in_simhash, COUNT(*) AS n_pairs
FROM joined
GROUP BY in_minhash, in_simhash
ORDER BY in_minhash, in_simhash
""",
)
def dedup_detector_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detector ENSEMBLE agreement — the report that decides which
    near-dup detectors a pipeline actually runs: the MinHash-LSH and
    SimHash candidate-pair sets full-outer-joined into an agreement
    matrix (both / minhash-only / simhash-only).  Production dedup
    unions several weak detectors before clustering; this quantifies
    each one's marginal contribution (a detector finding nothing
    unique is pure cost).  Both pair generators are the registered,
    oracle-mirrored ones — the ensemble adds one co-partitioned outer
    join on the pair key, tiny next to either generator.
    Oracle-exact."""
    from .dedup_store import staged_candidates, staged_simhash_pairs

    mh = staged_candidates(spark, sf_dir).withColumn("_mh", F.lit(True))
    sh = staged_simhash_pairs(spark, sf_dir).select(
        "doc_a", "doc_b"
    ).withColumn("_sh", F.lit(True))
    joined = mh.join(sh, ["doc_a", "doc_b"], "full_outer")
    return (
        joined.groupBy(
            F.col("_mh").isNotNull().alias("in_minhash"),
            F.col("_sh").isNotNull().alias("in_simhash"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("in_minhash", "in_simhash")
    )


@register(
    "dedup_rewrite_yield",
    tags=("llm", "dedup", "substring", "yield"),
    oracle=f"""
WITH {_SQL_SPANS},
iv AS (
  -- DISTINCT: same twin-splitting hazard as dedup_span_coverage
  SELECT DISTINCT doc_id, s, e FROM (
    SELECT doc_a AS doc_id, start_a AS s,
           start_a + span_tokens - 1 AS e FROM spans
    UNION ALL
    SELECT doc_b, start_b, start_b + span_tokens - 1 FROM spans
  )
),
marked AS (
  SELECT doc_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY doc_id
                ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS new_isl
  FROM iv
),
isl2 AS (
  SELECT doc_id, s, e,
         SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY s, e
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM marked
),
merged AS (
  SELECT doc_id, isl, MIN(s) AS ms, MAX(e) AS me
  FROM isl2 GROUP BY doc_id, isl
),
cov AS (
  SELECT doc_id, CAST(SUM(me - ms + 1) AS BIGINT) AS covered
  FROM merged GROUP BY doc_id
),
decided AS (
  SELECT d.source,
         CAST(len(t.t) AS BIGINT) AS n_tokens,
         COALESCE(c.covered, 0) AS covered,
         COALESCE(c.covered, 0) * 100 >= CAST(len(t.t) AS BIGINT) * 20
           AS dropped
  FROM documents d
  JOIN toks t USING (doc_id)
  LEFT JOIN cov c USING (doc_id)
)
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(*) FILTER (WHERE dropped) AS n_dropped,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_before,
       CAST(SUM(CASE WHEN dropped THEN 0 ELSE n_tokens - covered END)
            AS BIGINT) AS tokens_after,
       ROUND(SUM(CASE WHEN dropped THEN 0 ELSE n_tokens - covered END)::DOUBLE
             / SUM(n_tokens), 6) AS yield_ratio
FROM decided
GROUP BY source
ORDER BY source
""",
)
def dedup_rewrite_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The substring-dedup REWRITE yield — what the corpus looks like
    AFTER applying the policy (Lee et al. 2022 semantics: covered
    spans are removed from every member; docs over the 20%-coverage
    gate are dropped whole): per source, docs dropped, token volume
    before/after, and the surviving-token yield ratio.  The number a
    data lead actually asks for before approving a dedup run.  Pure
    composition: cached span table → interval union → one grouped
    report; integer arithmetic to the final ratio."""
    d = load_table(spark, sf_dir, "documents")
    cov = span_coverage(
        d,
        k=_SUBSTR_K,
        drop_threshold_pct=20,
        spans=_substring_spans(spark, sf_dir),
    ).select("doc_id", "covered_tokens", "would_drop")
    from ..functions.text import token_count

    base = d.select(
        "doc_id", "source", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    decided = base.join(cov, "doc_id", "left").select(
        "source",
        "n_tokens",
        F.coalesce("covered_tokens", F.lit(0)).alias("covered"),
        F.coalesce("would_drop", F.lit(False)).alias("dropped"),
    )
    after = F.when(F.col("dropped"), 0).otherwise(
        F.col("n_tokens") - F.col("covered")
    )
    return (
        decided.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("dropped"), 1)).alias("n_dropped"),
            F.sum("n_tokens").cast("long").alias("tokens_before"),
            F.sum(after).cast("long").alias("tokens_after"),
            F.round(
                F.sum(after).cast("double") / F.sum("n_tokens"), 6
            ).alias("yield_ratio"),
        )
        .orderBy("source")
    )


@register(
    "dedup_minhash_estimate_accuracy",
    tags=("llm", "dedup", "minhash", "sketch", "accuracy"),
    oracle=f"""
WITH {_sql_minhash_ctes()},
sig_pairs AS (
  SELECT p.doc_a, p.doc_b,
         ({' + '.join(f'CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END' for i in range(16))})
           AS n_agree
  FROM pairs p
  JOIN sig a ON a.doc_id = p.doc_a
  JOIN sig b ON b.doc_id = p.doc_b
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT s.doc_a, s.doc_b,
       CAST(s.n_agree AS BIGINT) AS n_agree,
       ROUND(s.n_agree / 16.0, 6) AS jaccard_est,
       ROUND(COALESCE(c.c, 0) / (sa.n + sb.n - COALESCE(c.c, 0)), 6)
         AS jaccard_exact,
       ROUND(ABS(s.n_agree / 16.0
                 - COALESCE(c.c, 0)
                   / (sa.n + sb.n - COALESCE(c.c, 0))), 6) AS abs_err
FROM sig_pairs s
LEFT JOIN common c ON c.doc_a = s.doc_a AND c.doc_b = s.doc_b
JOIN sizes sa ON sa.doc_id = s.doc_a
JOIN sizes sb ON sb.doc_id = s.doc_b
ORDER BY s.doc_a, s.doc_b
""",
)
def dedup_minhash_estimate_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKETCH-ESTIMATOR accuracy for MinHash: on every LSH candidate
    pair, the Jaccard ESTIMATE (signature agreement / 16 — the number
    a 100 TB pipeline scores with, because it needs only the 16-long
    signatures) against the EXACT shingle Jaccard, with absolute
    error — the report that justifies replacing the exact inverted-
    index score with the sketch at scale.  All three inputs (pairs,
    signatures, shingle sizes) come from the same capped representation
    so the comparison is apples-to-apples.  Oracle-exact."""
    from .dedup_store import (
        staged_candidates,
        staged_shingles,
        staged_signatures,
    )

    sig = staged_signatures(spark, sf_dir)
    pairs = staged_candidates(spark, sf_dir)
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(16)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(16)],
    )
    n_agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(16)
    )
    est = pairs.join(sa, "doc_a").join(sb, "doc_b").select(
        "doc_a", "doc_b", n_agree.cast("long").alias("n_agree")
    )
    sh = staged_shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a2, b2 = sh.alias("a"), sh.alias("b")
    common = (
        a2.join(b2, on="shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    jx = F.coalesce(F.col("c"), F.lit(0)) / (
        F.col("na") + F.col("nb") - F.coalesce(F.col("c"), F.lit(0))
    )
    je = F.col("n_agree") / 16.0
    return (
        est.join(common, ["doc_a", "doc_b"], "left")
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_agree",
            F.round(je, 6).alias("jaccard_est"),
            F.round(jx, 6).alias("jaccard_exact"),
            F.round(F.abs(je - jx), 6).alias("abs_err"),
        )
        .orderBy("doc_a", "doc_b")
    )


@register(
    "text_ngram_novelty",
    tags=("llm", "text", "novelty", "incremental"),
    oracle=f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
sh_all AS (
  SELECT doc_id, unnest(
    CASE WHEN len(t) >= 3 THEN list_distinct(
           list_transform(generate_series(1, len(t) - 2),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         ELSE [array_to_string(t, ' ')] END) AS shingle
  FROM toks
),
corpus_vocab AS (
  SELECT DISTINCT shingle FROM sh_all WHERE doc_id % 5 != 0
),
batch AS (SELECT doc_id, shingle FROM sh_all WHERE doc_id % 5 = 0),
flagged AS (
  SELECT b.doc_id,
         CASE WHEN v.shingle IS NULL THEN 1 ELSE 0 END AS novel
  FROM batch b LEFT JOIN corpus_vocab v USING (shingle)
)
SELECT doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(novel) AS BIGINT) AS n_novel,
       ROUND(SUM(novel)::DOUBLE / COUNT(*), 6) AS novelty
FROM flagged
GROUP BY doc_id
ORDER BY doc_id
""",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-GRAM NOVELTY of an incoming batch (every 5th doc) against the
    corpus: per batch doc, the fraction of its distinct 3-gram
    shingles NEVER seen in the corpus — the freshness metric a
    curation pipeline tracks per source/day (near-zero novelty =
    re-crawl; near-one = new domain or garbage).  Complements the
    admission DUPLICATE checks: novelty measures the other tail.
    One distinct pass for the corpus vocabulary + one anti-flagging
    hash join on the shingle key — both shuffle once.  Uncapped
    shingles on both sides (novelty needs the full vocabulary — a
    df-cap would delete exactly the common shingles that prove
    non-novelty).  Oracle-exact."""
    from ..operators.dedup import shingle_table

    d = load_table(spark, sf_dir, "documents")
    sh = shingle_table(d, "text", 3, max_df=None)
    vocab = (
        sh.filter(F.col("doc_id") % 5 != 0)
        .select("shingle")
        .distinct()
        .withColumn("_seen", F.lit(1))
    )
    batch = sh.filter(F.col("doc_id") % 5 == 0)
    flagged = batch.join(vocab, "shingle", "left").select(
        "doc_id",
        F.when(F.col("_seen").isNull(), 1).otherwise(0).alias("novel"),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum("novel").cast("long").alias("n_novel"),
            F.round(
                F.sum("novel").cast("double") / F.count(F.lit(1)), 6
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------------ LSH band-plan tuning

# (bands, rows) splits of the 16-permutation signature; the S-curve
# P(candidate | j) = 1 - (1 - j^r)^b is computed ONCE in Python at the
# jaccard-bin midpoints and embedded as integer NANO-probabilities in
# both engines' plans — neither engine evaluates pow(), so the
# planning table is bit-exact by construction (the discrete-Gaussian
# weight-table stance applied to LSH planning).
_BT_SPLITS = [(16, 1), (8, 2), (4, 4), (2, 8), (1, 16)]
_BT_THRESH_BIN = 5  # bins 5..9 (j >= 0.5) count as "should candidate"
_BT_GRID: list[tuple[int, int, int, int]] = []
for _bt_b, _bt_r in _BT_SPLITS:
    for _bt_bin in range(10):
        _bt_j = (_bt_bin + 0.5) / 10.0
        _bt_p = 1.0 - (1.0 - _bt_j**_bt_r) ** _bt_b
        _BT_GRID.append(
            (_bt_b, _bt_r, _bt_bin, round(_bt_p * 1_000_000_000))
        )
_BT_GRID_SQL = "\n  UNION ALL\n".join(
    f"  SELECT {b} AS bands, {r} AS rows_per_band, {bin_} AS bin,"
    f" {p}::BIGINT AS p_nano"
    for b, r, bin_, p in _BT_GRID
)


@register(
    "dedup_minhash_band_tuning",
    tags=("llm", "dedup", "minhash", "lsh", "tuning"),
    oracle=f"""
WITH {{shingles}},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT LEAST(CAST(FLOOR(ROUND(c / (sa.n + sb.n - c), 6) * 10)
               AS BIGINT), 9) AS bin
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
),
hist AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n FROM jac GROUP BY bin),
grid AS (
{_BT_GRID_SQL}
),
joined AS (
  SELECT g.bands, g.rows_per_band, g.bin, g.p_nano,
         COALESCE(h.n, 0) AS n
  FROM grid g LEFT JOIN hist h ON h.bin = g.bin
)
SELECT bands, rows_per_band,
       CAST(SUM(n) AS BIGINT) AS n_pairs,
       ROUND(CAST(SUM(n * p_nano) AS DOUBLE) / 1000000000.0, 6)
         AS exp_candidates,
       ROUND(CAST(SUM(CASE WHEN bin < {_BT_THRESH_BIN}
                           THEN n * p_nano ELSE 0 END) AS DOUBLE)
             / 1000000000.0, 6) AS exp_fp_below_t,
       ROUND(CAST(SUM(CASE WHEN bin >= {_BT_THRESH_BIN}
                           THEN n * (1000000000 - p_nano) ELSE 0 END)
                  AS DOUBLE) / 1000000000.0, 6) AS exp_fn_above_t
FROM joined
GROUP BY bands, rows_per_band
ORDER BY bands DESC
""".format(shingles=_SQL_SHINGLES),
)
def dedup_minhash_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH BAND-PLAN TUNING table — the decision artifact behind
    ``dedup_minhash_lsh``'s (bands=4, rows=4) choice: for every
    (b, r) split of the 16-permutation signature, the expected
    candidate volume and the expected errors AGAINST THIS CORPUS's
    observed pair-jaccard histogram (false positives = candidates the
    S-curve admits below the 0.5 dedup threshold, false negatives =
    true near-dups it misses above it).  A deployment reads this row
    set and picks the split whose FN budget it can afford — more bands
    (shorter rows) push the S-curve left: more recall, more junk
    candidates to verify.

    Exactness: the data side is the exact inverted-index pair-jaccard
    histogram (integer bins, the ``dedup_ngram_jaccard`` formulation
    sans threshold); the S-curve probabilities are Python-precomputed
    integer nano-probabilities embedded in both plans (no cross-engine
    pow), so every expected count is an exact Σ n·p_nano BIGINT sum
    with one final division.

    Scale shape: one capped shingle self-join (the dedup family's
    bounded candidate generation) → a 10-row histogram → joined to a
    50-row literal grid; everything after the histogram is
    constant-size."""
    from .dedup_store import staged_shingles

    sh = staged_shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, on="shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    jac = (
        common.join(
            sizes.select(
                F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")
            ),
            "doc_a",
        )
        .join(
            sizes.select(
                F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")
            ),
            "doc_b",
        )
        .select(
            F.least(
                F.floor(
                    F.round(
                        F.col("c")
                        / (F.col("n_a") + F.col("n_b") - F.col("c")),
                        6,
                    )
                    * 10
                ).cast("long"),
                F.lit(9),
            ).alias("bin")
        )
    )
    hist = jac.groupBy("bin").agg(F.count(F.lit(1)).cast("long").alias("n"))
    grid = literal_df(
        spark, _BT_GRID, "bands int, rows_per_band int, bin long, p_nano long"
    )
    joined = grid.join(F.broadcast(hist), "bin", "left").select(
        "bands",
        "rows_per_band",
        "bin",
        "p_nano",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
    )
    return (
        joined.groupBy("bands", "rows_per_band")
        .agg(
            F.sum("n").cast("long").alias("n_pairs"),
            F.round(
                F.sum(F.col("n") * F.col("p_nano")).cast("double")
                / 1_000_000_000.0,
                6,
            ).alias("exp_candidates"),
            F.round(
                F.sum(
                    F.when(
                        F.col("bin") < _BT_THRESH_BIN,
                        F.col("n") * F.col("p_nano"),
                    ).otherwise(F.lit(0))
                ).cast("double")
                / 1_000_000_000.0,
                6,
            ).alias("exp_fp_below_t"),
            F.round(
                F.sum(
                    F.when(
                        F.col("bin") >= _BT_THRESH_BIN,
                        F.col("n") * (F.lit(1_000_000_000) - F.col("p_nano")),
                    ).otherwise(F.lit(0))
                ).cast("double")
                / 1_000_000_000.0,
                6,
            ).alias("exp_fn_above_t"),
        )
        .orderBy(F.desc("bands"))
    )


# ------------------------------------------- edit-distance verify stage

_ED_SIM_THRESH = 0.8  # normalized similarity for a VERIFIED duplicate


@register(
    "dedup_edit_distance_verify",
    tags=("llm", "dedup", "levenshtein", "verify"),
    oracle=f"""
WITH {{ctes}},
txt AS (SELECT doc_id, text FROM documents),
scored AS (
  SELECT p.doc_a, p.doc_b,
         CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS lev_dist,
         GREATEST(LENGTH(ta.text), LENGTH(tb.text)) AS max_len
  FROM pairs p
  JOIN txt ta ON ta.doc_id = p.doc_a
  JOIN txt tb ON tb.doc_id = p.doc_b
)
SELECT doc_a, doc_b, lev_dist,
       ROUND(1.0 - CAST(lev_dist AS DOUBLE) / max_len, 6) AS edit_sim,
       (1.0 - CAST(lev_dist AS DOUBLE) / max_len) >= {_ED_SIM_THRESH}e0
         AS verified
FROM scored
ORDER BY doc_a, doc_b
""".format(ctes=_sql_minhash_ctes()),
)
def dedup_edit_distance_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDIT-DISTANCE VERIFICATION of the MinHash-LSH candidates — the
    verify stage a candidate-generate pipeline runs before acting on
    near-dups: every banded-LSH candidate pair gets its exact
    Levenshtein distance and the normalized similarity
    1 − dist/max(len); pairs at ≥ {thresh} are VERIFIED duplicates
    (character-level confirmation, orthogonal to the shingle-set
    evidence that generated the candidate — the two agree on true dups
    and disagree on coincidental shingle overlap).

    Exactness: Levenshtein is an integer DP identical in both engines;
    the similarity is one division rounded at 6 dp; the verified flag
    compares the UNROUNDED ratio against the exactly-representable
    0.8.

    Scale shape: the expensive O(len²) distance runs ONLY on candidate
    pairs (LSH-bounded, never corpus²) — the whole point of the
    generate-then-verify split; the two text lookups join at pair
    grain and stay UNHINTED (documents grows with SF — the planner
    sizes them; the round-7 broadcast guard bans forcing it)."""
    from .dedup_store import staged_candidates

    d = load_table(spark, sf_dir, "documents")
    pairs = staged_candidates(spark, sf_dir)
    txt = d.select("doc_id", "text")
    ta = txt.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("_ta"))
    tb = txt.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("_tb"))
    sim = F.lit(1.0) - F.col("lev_dist").cast("double") / F.col("max_len")
    return (
        pairs.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein(F.col("_ta"), F.col("_tb"))
            .cast("long")
            .alias("lev_dist"),
            F.greatest(F.length("_ta"), F.length("_tb")).alias("max_len"),
        )
        .select(
            "doc_a",
            "doc_b",
            "lev_dist",
            F.round(sim, 6).alias("edit_sim"),
            (sim >= _ED_SIM_THRESH).alias("verified"),
        )
        .orderBy("doc_a", "doc_b")
    )


dedup_edit_distance_verify.__doc__ = dedup_edit_distance_verify.__doc__.format(
    thresh=_ED_SIM_THRESH
)
