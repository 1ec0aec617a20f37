"""Streaming dedup ADMISSION — the real-time twin of
``dedup_incremental_new_batch``: documents arrive as a stream, each is
signatured per-row (``operators.dedup.rowwise_minhash_bands`` — a pure
map-side expression, NO aggregation state), and probed against the
static banded index of the existing corpus via a broadcast
stream-static join.

The streaming stage is deliberately STATELESS (map → explode →
broadcast join, append mode): it emits raw (doc_id, corpus_doc_id,
band) match events; the dedup DECISION (any-hit flag, partner count)
is a downstream batch/windowed aggregation — the same
split-signature/decide topology every production admission filter uses,
because it keeps the hot path free of state stores and watermarks.

Stream ≡ batch is asserted in
``tests/test_streaming_multimodal.py::test_stream_dedup_admission_equals_batch``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import rowwise_minhash_bands

__all__ = [
    "admission_matches",
    "streaming_dedup_admission",
    "chunk_admission_matches",
    "streaming_chunk_admission",
    "semantic_banded",
    "semantic_banded_fast",
    "semantic_admission_matches",
    "streaming_semantic_admission",
    "lm_score_columns",
    "streaming_lm_admission",
    "nb_langid_columns",
    "streaming_nb_admission",
]


def admission_matches(new_docs: DataFrame, static_banded: DataFrame) -> DataFrame:
    """(doc_id, corpus_doc_id, band) match events: per-row bands of the
    incoming docs, exploded, probed against the static index.  Works
    identically on a batch OR streaming ``new_docs`` frame — every
    operator here is stateless.  Join strategy is left to the
    optimizer: a CORPUS-sized band index must NOT be forced broadcast —
    at scale it is persisted bucketed by (band, band_hash) so each
    micro-batch joins bucket-locally, and only genuinely small indexes
    get auto-broadcast."""
    newb = new_docs.select(
        "doc_id", F.explode(rowwise_minhash_bands(F.col("text"))).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash"))
    return newb.join(
        static_banded, ["band", "band_hash"]
    ).select("doc_id", "corpus_doc_id", "band")


def streaming_dedup_admission(
    spark: SparkSession,
    source_dir: str,
    static_banded: DataFrame,
    *,
    checkpoint_dir: str,
    out_table: str = "stream_admission",
):
    """True readStream version: json doc stream → per-row signature →
    broadcast probe → memory sink (append, availableNow)."""
    stream = spark.readStream.schema("doc_id long, text string").json(
        source_dir
    )
    out = admission_matches(stream, static_banded)
    return (
        out.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _split_bands(base: DataFrame, *, n_planes: int, bands: int) -> DataFrame:
    """(vec_id, vn, _sig) → (vec_id, vn, band, band_val): split the
    packed signature long into ``bands`` equal bit-bands with pure
    integer expressions (shift + mask + explode)."""
    width = n_planes // bands
    mask = (1 << width) - 1
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("_sig"), b * width)
            .bitwiseAND(F.lit(mask))
            .alias("band_val"),
        )
        for b in range(bands)
    ]
    return base.select(
        "vec_id", "vn", F.explode(F.array(*band_structs)).alias("bb")
    ).select("vec_id", "vn", "bb.band", "bb.band_val")


def chunk_admission_matches(
    new_docs: DataFrame,
    static_chunk_index: DataFrame,
    *,
    chunk_tokens: int = 16,
    overlap: int = 4,
) -> DataFrame:
    """(doc_id, chunk_id, corpus_doc_id, corpus_chunk_id) CHUNK-grain
    dedup match events — the chunking twin of :func:`admission_matches`:
    arriving documents are chunked MAP-SIDE (``chunk_documents`` is
    tokenize → sequence → posexplode → slice, fully stateless, so it
    runs unchanged inside a stream), each chunk is md5-fingerprinted,
    and probed against the static corpus chunk index
    (chunk_md5 → (corpus_doc_id, corpus_chunk_id)).  Join strategy is
    left to the optimizer — at scale the index is persisted bucketed
    by chunk_md5 so each micro-batch joins bucket-locally.  Works
    identically on a batch or streaming ``new_docs`` frame."""
    from ..operators.chunking import chunk_documents

    newc = chunk_documents(
        new_docs, chunk_tokens=chunk_tokens, overlap=overlap, keep_text=True
    ).select("doc_id", "chunk_id", F.md5("chunk_text").alias("chunk_md5"))
    return newc.join(static_chunk_index, "chunk_md5").select(
        "doc_id", "chunk_id", "corpus_doc_id", "corpus_chunk_id"
    )


def streaming_chunk_admission(
    spark: SparkSession,
    source_dir: str,
    static_chunk_index: DataFrame,
    *,
    checkpoint_dir: str,
    out_table: str = "stream_chunk_admission",
):
    """True readStream version: json doc stream → map-side chunk +
    md5 → static index probe → memory sink (append, availableNow)."""
    stream = spark.readStream.schema("doc_id long, text string").json(
        source_dir
    )
    out = chunk_admission_matches(stream, static_chunk_index)
    return (
        out.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def semantic_banded(vecs: DataFrame, *, n_planes: int = 32, bands: int = 4, dim: int = 64) -> DataFrame:
    """(vec_id, vn, band, band_val) — per-row hyperplane signature
    split into ``bands`` equal bit-bands (default 4×8 bits: 256-value
    buckets — 4-bit bands measured 400k+ candidate pairs on a 2k
    corpus, 40% of all pairs, which defeats the banding).  Pure map-side expressions
    (``hyperplane_signature`` is a per-row fold), so it runs in a
    stream with no state — the semantic twin of the minhash band
    stage.  Batch callers should prefer :func:`semantic_banded_fast`
    (same output, ~10× cheaper) — this form exists for the true
    readStream hot path where pure expressions keep the stage
    stateless and codegen-resident."""
    from ..operators.similarity import hyperplane_signature, normalize

    sig = hyperplane_signature(F.col("embedding"), dim=dim, n_planes=n_planes)
    base = vecs.select(
        "vec_id",
        normalize(F.col("embedding")).alias("vn"),
        sig.alias("_sig"),
    )
    return _split_bands(base, n_planes=n_planes, bands=bands)


def semantic_banded_fast(
    vecs: DataFrame, *, n_planes: int = 32, bands: int = 4, dim: int = 64
) -> DataFrame:
    """Batch twin of :func:`semantic_banded` with the signature computed
    by the numpy Arrow-batch kernel (``hyperplane_signatures_fast`` —
    one ``X @ P.T`` matmul per batch instead of the interpreted
    n_planes×dim fold, ~50× on the signature stage).  Output contract
    is identical; bit-parity with the fold form is pinned by
    tests/test_streaming_multimodal.py::
    test_semantic_banded_fast_parity (matmul partial-sum order could
    in principle flip a sign bit only when |plane·v| ≲ 1e-14).  The
    normalized vector ``vn`` still uses the fold ``normalize`` so the
    downstream exact-cosine values are bit-identical to the streaming
    path and the DuckDB oracle."""
    from ..operators.similarity import hyperplane_signatures_fast, normalize

    with_sig = hyperplane_signatures_fast(
        vecs.select("vec_id", "embedding"),
        vec_col="embedding",
        sig_col="_sig",
        dim=dim,
        n_planes=n_planes,
    )
    base = with_sig.select(
        "vec_id", normalize(F.col("embedding")).alias("vn"), "_sig"
    )
    return _split_bands(base, n_planes=n_planes, bands=bands)


def semantic_admission_matches(
    new_vecs: DataFrame,
    static_banded: DataFrame,
    *,
    threshold: float = 0.35,
) -> DataFrame:
    """(vec_id, corpus_vec_id, cosine) match events at cosine ≥
    ``threshold``: per-row banded hyperplane signature of the arriving
    vectors, bucket-joined against the static banded corpus index, then
    the EXACT cosine verified map-side (both sides carry their
    normalized vectors) — still fully stateless, so a pair colliding in
    two bands is emitted twice; the downstream decision aggregation
    dedups.  At scale the static index is bucketed by (band, band_val)
    so each micro-batch joins bucket-locally."""
    from ..operators.similarity import dot

    newb = semantic_banded(new_vecs)
    joined = newb.join(
        static_banded.select(
            F.col("vec_id").alias("corpus_vec_id"),
            F.col("vn").alias("_cvn"),
            "band",
            "band_val",
        ),
        ["band", "band_val"],
    )
    return joined.select(
        "vec_id",
        "corpus_vec_id",
        F.round(dot(F.col("vn"), F.col("_cvn")), 6).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)


def streaming_semantic_admission(
    spark: SparkSession,
    source_dir: str,
    static_banded: DataFrame,
    *,
    checkpoint_dir: str,
    out_table: str = "stream_sem_admission",
):
    """True readStream version: json embedding stream → per-row
    signature bands → static bucket join → exact cosine → memory sink
    (append, availableNow)."""
    stream = spark.readStream.schema(
        "vec_id long, embedding array<double>"
    ).json(source_dir)
    out = semantic_admission_matches(stream, static_banded)
    return (
        out.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# --------------------------------------------- perplexity LM admission

# Past this many map entries the create_map literal tree stops being the
# right vehicle (two 65536-entry maps would put ~131k literal nodes in
# one plan — pathological analysis/codegen size, advisor r5 finding);
# the model then ships as a SparkContext BROADCAST consumed by an
# Arrow-batched pandas UDF — same stateless topology, bigger vehicle.
_LITERAL_SAFE_ENTRIES = 4096


def lm_score_columns(
    docs: DataFrame,
    c2: dict[str, int],
    c1: dict[str, int],
    v: int,
    *,
    text_col: str = "text",
    threshold: float = 30.0,
    force_path: str | None = None,
) -> DataFrame:
    """Per-row bigram-LM perplexity gate — completely STATELESS: the
    (pruned) LM travels INSIDE the expression as two map literals, so a
    streaming micro-batch needs no join, no state store, no watermark.
    This mirrors how production perplexity filters actually run (CCNet
    ships a pruned KenLM binary to every worker; the model is a
    worker-local artifact, not a join input).

    TWO vehicles, auto-selected on model size (``force_path`` pins one
    for testing): up to ``_LITERAL_SAFE_ENTRIES`` total entries the
    model travels as two ``create_map`` LITERALS inside the expression
    (zero Python in the hot path); past that the same model ships as a
    SparkContext BROADCAST consumed by an Arrow-batched pandas UDF that
    emits the per-bigram RAW log-probs — quantization and the per-row
    sum stay Spark-side expressions, so both paths share the exact same
    rounding semantics (differential: tests/test_admission_paths.py).

    Per-token log-probs are quantized to integer MICRO-units before the
    per-row sum (``cast(round(ln(...)·1e6) as bigint)``), so the score
    is order-independent and bit-exact against a SQL mirror that joins
    instead of map-looks-up.  Emits (doc_id, n_bigrams, ppl, admitted);
    rows with fewer than 2 tokens carry no bigram evidence and are
    dropped (documented contract shared with the oracle)."""
    from ..functions.text import tokens

    if not c2 or not c1:
        raise ValueError("empty LM: need non-empty bigram/context counts")
    n_entries = len(c2) + len(c1)
    path = force_path or (
        "literal" if n_entries <= _LITERAL_SAFE_ENTRIES else "broadcast"
    )
    tokenized = docs.withColumn("_t", tokens(F.col(text_col))).filter(
        F.size("_t") >= 2
    )
    if path == "literal":
        from ..operators.localrel import literal_map

        c2m = literal_map({k: int(x) for k, x in c2.items()})
        c1m = literal_map({k: int(x) for k, x in c1.items()})
        scored = (
            tokenized.withColumn("_c2m", c2m)
            .withColumn("_c1m", c1m)
            .withColumn(
                "_lpm",
                F.expr(
                    f"""
                    transform(slice(_t, 1, size(_t) - 1), (w, i) ->
                      cast(round(ln(
                        cast(coalesce(element_at(_c2m, w || ' ' || _t[i + 1]), 0)
                             + 1 as double)
                        / cast(coalesce(element_at(_c1m, w), 0) + {int(v)}
                               as double)) * 1000000, 0) as bigint))
                    """
                ),
            )
        )
    else:
        import math

        bc = docs.sparkSession.sparkContext.broadcast(
            (dict(c2), dict(c1), int(v))
        )

        @F.pandas_udf("array<double>")
        def _lp_raw(tok: pd.Series) -> pd.Series:
            c2d, c1d, vv = bc.value
            out = []
            for t in tok:
                ws = list(t)
                out.append(
                    [
                        math.log(
                            (c2d.get(ws[i] + " " + ws[i + 1], 0) + 1)
                            / (c1d.get(ws[i], 0) + vv)
                        )
                        for i in range(len(ws) - 1)
                    ]
                )
            return pd.Series(out)

        # quantization stays a Spark expression — IDENTICAL rounding
        # on both paths (only the ln producer differs)
        scored = tokenized.withColumn(
            "_lpraw", _lp_raw(F.col("_t"))
        ).withColumn(
            "_lpm",
            F.expr(
                "transform(_lpraw, x ->"
                " cast(round(x * 1000000, 0) as bigint))"
            ),
        )
    ppl = F.round(
        F.exp(
            -(
                F.aggregate(
                    "_lpm", F.lit(0).cast("long"), lambda a, x: a + x
                ).cast("double")
                / 1e6
            )
            / F.size("_lpm")
        ),
        6,
    )
    return scored.select(
        "doc_id",
        F.size("_lpm").cast("long").alias("n_bigrams"),
        ppl.alias("ppl"),
        (ppl <= F.lit(threshold)).alias("admitted"),
    )


def streaming_lm_admission(
    spark: SparkSession,
    source_dir: str,
    c2: dict[str, int],
    c1: dict[str, int],
    v: int,
    *,
    checkpoint_dir: str,
    threshold: float = 30.0,
    out_table: str = "stream_lm_admission",
):
    """True readStream version: json doc stream → per-row map-side LM
    scoring (no join at all) → memory sink (append, availableNow)."""
    stream = spark.readStream.schema("doc_id long, text string").json(
        source_dir
    )
    out = lm_score_columns(stream, c2, c1, v, threshold=threshold)
    return (
        out.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ----------------------------------------- Naive-Bayes langid admission

def nb_langid_columns(
    docs: DataFrame,
    clt: dict[str, int],
    cl: dict[str, int],
    prior_lpm: dict[str, int],
    v: int,
    *,
    text_col: str = "text",
    admit_lang: str = "en",
    force_path: str | None = None,
) -> DataFrame:
    """Per-row Naive-Bayes LANGUAGE-ID gate — completely STATELESS,
    the ``lm_score_columns`` stance: the trained classifier travels
    INSIDE the expression as map literals ((lang|token) → count,
    lang → token total, lang → quantized log-prior), so a streaming
    micro-batch needs no join, no state store, no watermark — exactly
    how production langid filters run (fastText ships a model file to
    every worker; the model is a worker-local artifact, not a join
    input).  TWO vehicles, auto-selected on model size like
    ``lm_score_columns`` (``force_path`` pins one for testing): map
    LITERALS up to ``_LITERAL_SAFE_ENTRIES`` entries, else a broadcast
    consumed by an Arrow-batched pandas UDF that emits the per-(lang,
    token) RAW log-likelihoods — quantization, the per-class BIGINT
    sum, and the argmax stay Spark-side expressions shared verbatim by
    both paths (the lang-count-bounded prior map stays literal on
    both).

    Per-token log-likelihoods quantize to integer MICRO-units in-row,
    per-class scores are BIGINT sums + the quantized prior, and the
    argmax picks via ``array_min`` over (−score, lang) structs —
    (score DESC, lang ASC), bit-exact against a SQL mirror that joins
    the count tables instead of map-looking-them-up.  Emits
    (doc_id, n_tokens, predicted, score_micro, admitted)."""
    from ..functions.text import tokens

    if not clt or not cl or not prior_lpm:
        raise ValueError("empty NB model: need non-empty count maps")
    langs = sorted(prior_lpm)
    n_entries = len(clt) + len(cl)
    path = force_path or (
        "literal" if n_entries <= _LITERAL_SAFE_ENTRIES else "broadcast"
    )
    prm = F.create_map(
        *[F.lit(x) for lang in langs for x in (lang, int(prior_lpm[lang]))]
    )
    langs_arr = F.array(*[F.lit(lang) for lang in langs])
    base = (
        docs.withColumn("_t", tokens(F.col(text_col)))
        .withColumn("_prm", prm)
        .withColumn("_langs", langs_arr)
    )
    if path == "literal":
        from ..operators.localrel import literal_map

        cltm = literal_map({k: int(x) for k, x in clt.items()})
        clm = literal_map({k: int(x) for k, x in cl.items()})
        scored = (
            base.withColumn("_cltm", cltm)
            .withColumn("_clm", clm)
            .withColumn(
                "_pick",
                F.expr(
                    f"""
                    array_min(transform(_langs, L -> struct(
                      -(element_at(_prm, L)
                        + aggregate(_t, cast(0 as bigint), (a, w) -> a +
                            cast(round(ln(
                              cast(coalesce(element_at(_cltm, L || '|' || w), 0)
                                   + 1 as double)
                              / cast(element_at(_clm, L) + {int(v)} as double))
                              * 1000000, 0) as bigint))) AS negs,
                      L AS lang)))
                    """
                ),
            )
        )
    else:
        import math

        bc = docs.sparkSession.sparkContext.broadcast(
            (dict(clt), dict(cl), [str(x) for x in langs], int(v))
        )

        @F.pandas_udf("array<array<double>>")
        def _ll_raw(tok: pd.Series) -> pd.Series:
            cltd, cld, lgs, vv = bc.value
            out = []
            for t in tok:
                ws = list(t)
                out.append(
                    [
                        [
                            math.log(
                                (cltd.get(lg + "|" + w, 0) + 1)
                                / (cld[lg] + vv)
                            )
                            for w in ws
                        ]
                        for lg in lgs
                    ]
                )
            return pd.Series(out)

        # quantization + per-class sum + argmax stay Spark expressions
        # — IDENTICAL semantics to the literal path (0-based [] index:
        # _lls[li] is lang li's per-token array)
        scored = base.withColumn(
            "_lls", _ll_raw(F.col("_t"))
        ).withColumn(
            "_pick",
            F.expr(
                """
                array_min(transform(_langs, (L, li) -> struct(
                  -(element_at(_prm, L)
                    + aggregate(_lls[li], cast(0 as bigint), (a, x) -> a +
                        cast(round(x * 1000000, 0) as bigint))) AS negs,
                  L AS lang)))
                """
            ),
        )
    return scored.select(
        "doc_id",
        F.size("_t").cast("long").alias("n_tokens"),
        F.col("_pick.lang").alias("predicted"),
        (-F.col("_pick.negs")).alias("score_micro"),
        (F.col("_pick.lang") == F.lit(admit_lang)).alias("admitted"),
    )


def streaming_nb_admission(
    spark: SparkSession,
    source_dir: str,
    clt: dict[str, int],
    cl: dict[str, int],
    prior_lpm: dict[str, int],
    v: int,
    *,
    checkpoint_dir: str,
    admit_lang: str = "en",
    out_table: str = "stream_langid_admission",
):
    """True readStream version: json doc stream → per-row map-side NB
    langid scoring (no join at all) → memory sink (append,
    availableNow)."""
    stream = spark.readStream.schema("doc_id long, text string").json(
        source_dir
    )
    out = nb_langid_columns(
        stream, clt, cl, prior_lpm, v, admit_lang=admit_lang
    )
    return (
        out.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def jpeg_meta_gate_columns(docs):
    """Shared column-builder for the MULTIMODAL metadata admission gate
    (batch twin + readStream run the same plan): synthesize each doc's
    JPEG header stream, walk the marker segments
    (operators/multimodal.parse_jpeg_meta — real bytes, not doc_id
    shortcuts), and apply the ingest rule a multimodal pipeline runs
    BEFORE any codec: quarantine corrupt headers, reject grayscale
    (n_components != 3), progressive scans (no incremental decode in
    the training loader) and under-resolution images
    (declared pixels < 24 000).  Completely stateless — no state
    store, no watermark, no join: header parse is an Arrow-batched
    map, the rule is row-local codegen."""
    from ..operators.multimodal import parse_jpeg_meta, synth_jpeg_header_blobs

    meta = parse_jpeg_meta(synth_jpeg_header_blobs(docs))
    px = F.col("width").cast("long") * F.col("height")
    admitted = (
        F.col("ok")
        & (F.col("n_components") == 3)
        & ~F.col("progressive")
        & (px >= 24_000)
    )
    reason = (
        F.when(~F.col("ok"), "corrupt")
        .when(F.col("n_components") != 3, "grayscale")
        .when(F.col("progressive"), "progressive")
        .when(px < 24_000, "too_small")
    )
    return meta.select(
        "doc_id",
        "ok",
        "width",
        "height",
        "n_components",
        "progressive",
        admitted.alias("admitted"),
        reason.alias("reason"),
    )


def streaming_jpeg_meta_gate(
    spark: SparkSession,
    source_dir: str,
    *,
    checkpoint_dir: str,
    out_table: str = "stream_multimodal_meta_gate",
):
    """True readStream version of the multimodal metadata gate: json
    doc stream → header synth + marker-segment parse (stateless
    mapInPandas) → admission rule → memory sink (append,
    availableNow)."""
    stream = spark.readStream.schema("doc_id long, text string").json(
        source_dir
    )
    out = jpeg_meta_gate_columns(stream)
    return (
        out.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
