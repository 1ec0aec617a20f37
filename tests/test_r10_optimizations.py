"""Equivalence pins for the round-10 optimizations.

Each test pins an optimization that changed an operator's internals to
the exact behavior of the path it replaced:

- BPE driver-side small-vocabulary training == the relational loop
  (same merges, same final vocab, row for row);
- topk_lsh's cand_sigs/query_sigs overrides == the two-Arrow-pass fast
  path (the chunk_ann_lsh_topk rewiring);
- literal_df's r10 hardening routes out-of-range ints and non-str
  strings to the legacy per-cell-literal path with identical frames;
- literal_map rejects non-string keys loudly.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def test_bpe_driver_path_matches_relational(spark):
    from stock_data_warehouse_analytics_spark.operators.text_ml import (
        bpe_train_merges,
    )

    docs = spark.createDataFrame(
        [
            (1, "low lower lowest low low"),
            (2, "new newer newest new lower"),
            (3, "wide wider widest low newer"),
        ],
        "doc_id long, text string",
    )
    old = os.environ.get("SPARK_GRAFT_BPE_SMALL_BYTES")
    try:
        os.environ["SPARK_GRAFT_BPE_SMALL_BYTES"] = "0"  # force relational
        m_rel, v_rel = bpe_train_merges(docs, rounds=6)
        os.environ["SPARK_GRAFT_BPE_SMALL_BYTES"] = str(1 << 40)  # force driver
        m_drv, v_drv = bpe_train_merges(docs, rounds=6)
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_BPE_SMALL_BYTES", None)
        else:
            os.environ["SPARK_GRAFT_BPE_SMALL_BYTES"] = old
    assert _rows(m_rel) == _rows(m_drv)
    assert _rows(v_rel) == _rows(v_drv)


def test_topk_lsh_sig_overrides_match_two_pass(spark):
    from stock_data_warehouse_analytics_spark.operators.similarity import (
        _hyperplane_sigs_norms,
        topk_lsh,
    )

    dim = 8
    vecs = spark.createDataFrame(
        [
            (i, [float(((i * 7 + j * 3) % 11) - 5) for j in range(dim)])
            for i in range(40)
        ],
        "vec_id long, embedding array<double>",
    ).localCheckpoint(eager=True)
    queries = vecs.filter(F.col("vec_id") < 5)
    base = topk_lsh(
        vecs, queries, k=3, dim=dim, n_planes=8, max_hamming=3, fast=True
    )
    sigs = _hyperplane_sigs_norms(
        vecs.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        vec_col="embedding",
        vn_col="_cn",
        sig_col="_csig",
        dim=dim,
        n_planes=8,
    ).localCheckpoint(eager=True)
    qsigs = sigs.filter(F.col("neighbor_id") < 5).select(
        F.col("neighbor_id").alias("query_id"),
        F.col("_cn").alias("_qn"),
        F.col("_csig").alias("_qsig"),
    )
    override = topk_lsh(
        None,
        None,
        k=3,
        dim=dim,
        n_planes=8,
        max_hamming=3,
        fast=True,
        cand_sigs=sigs,
        query_sigs=qsigs,
    )
    assert _rows(base) == _rows(override)


def test_literal_df_range_check_falls_back_identically(spark):
    from stock_data_warehouse_analytics_spark.operators.localrel import (
        literal_df,
    )

    # int overflowing the declared int32 field: must NOT null the row
    # (the from_json PERMISSIVE failure mode) — the legacy path wraps
    # exactly like F.lit().cast("int")
    rows = [(2**31 + 5, "a"), (7, "b")]
    df = literal_df(spark, rows, "x int, s string")
    got = {r.s: r.x for r in df.collect()}
    assert got["b"] == 7
    assert got["a"] == ((2**31 + 5 + 2**31) % 2**32) - 2**31  # int32 wrap
    # non-str into a string field: legacy cast semantics (true, not True)
    df2 = literal_df(spark, [(True,)], "s string")
    assert df2.collect()[0].s == "true"


@pytest.mark.parametrize("as_string", [False, True])
def test_connected_components_driver_path_matches_loop(spark, as_string):
    from stock_data_warehouse_analytics_spark.operators.graph import (
        connected_components,
    )

    edges = [(1, 2), (2, 3), (5, 4), (7, 7), (10, 11), (11, 10), (4, 12)]
    if as_string:
        edges = [(f"n{a:02d}", f"n{b:02d}") for a, b in edges]
        schema = "src string, dst string"
    else:
        schema = "src long, dst long"
    df = spark.createDataFrame(edges, schema)
    old = os.environ.get("SPARK_GRAFT_CC_SMALL_BYTES")
    try:
        os.environ["SPARK_GRAFT_CC_SMALL_BYTES"] = "0"  # force the loop
        loop = _rows(connected_components(df))
        os.environ["SPARK_GRAFT_CC_SMALL_BYTES"] = str(1 << 40)  # force driver
        drv = _rows(connected_components(df))
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_CC_SMALL_BYTES", None)
        else:
            os.environ["SPARK_GRAFT_CC_SMALL_BYTES"] = old
    assert loop == drv


def test_literal_map_rejects_non_string_keys():
    from stock_data_warehouse_analytics_spark.operators.localrel import (
        literal_map,
    )

    with pytest.raises(TypeError):
        literal_map({1: 2, "a": 3})
