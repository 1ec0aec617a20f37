"""Round-9 optimization equivalence pins.

Each optimization in this round changed HOW something is computed,
never WHAT — these tests pin the equivalences directly:

- grouped_exact_quantiles: small-input fast path (zero cuts, whole-
  group window) ≡ the bucketed path, bit for bit;
- _bucket_of: the compact higher-order bucket expression ≡ the
  chained when-sum it replaced;
- literal_df: the from_json encoding ≡ the per-cell-literal encoding
  (values, types, None handling, float bits);
- literal_map ≡ create_map literals;
- hyperplane_signature: the folded 2-D-constant form ≡ the chained
  per-plane literal fold it replaced;
- dedup_store staged frames ≡ the direct operator outputs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_data_warehouse_analytics_spark.operators import ranking as R

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from stock_data_warehouse_analytics_spark.session import get_spark

    s = get_spark("test-r09-opt", shuffle_partitions=4)
    yield s


def _mixed_frame(spark, n=5000):
    return spark.range(n).select(
        (F.col("id") % 7).cast("string").alias("grp"),
        # heavy ties + a null + spread: the interpolation edge cases
        F.when(F.col("id") % 97 == 0, None)
        .otherwise((F.col("id") * 37 % 1001).cast("double"))
        .alias("v"),
    )


def test_small_path_matches_bucketed_path(spark, monkeypatch):
    df = _mixed_frame(spark)
    qs = [("q05", 0.05), ("q50", 0.5), ("q95", 0.95)]
    small = R.grouped_exact_quantiles(df, "grp", "v", qs).collect()
    # force the bucketed path by zeroing the small-input threshold
    monkeypatch.setattr(R, "_QUANTILE_SMALL_BYTES", 0)
    big = R.grouped_exact_quantiles(df, "grp", "v", qs).collect()
    key = lambda r: r["grp"]  # noqa: E731
    assert sorted(map(tuple, small), key=lambda t: t[0]) == sorted(
        map(tuple, big), key=lambda t: t[0]
    )


def test_bucket_of_matches_chained_when(spark):
    df = _mixed_frame(spark, 3000)
    cuts = [10.0, 250.0, 500.0, 750.5, 990.0]
    lead = F.col("v").cast("double")
    chained = F.lit(0)
    for c in cuts:
        chained = chained + F.when(lead > F.lit(c), 1).otherwise(0)
    got = df.select(
        R._bucket_of(lead, cuts).alias("a"), chained.alias("b")
    ).collect()
    assert all(r.a == r.b for r in got)


def test_literal_df_json_equals_legacy(spark):
    from stock_data_warehouse_analytics_spark.operators.localrel import (
        _to_json_value,
        literal_df,
    )
    from pyspark.sql.types import _parse_datatype_string

    schema = "k int, s string, x double, arr array<double>, b boolean"
    rows = [
        (1, "a", 0.1 + 0.2, [1.5, -2.25e-300], True),
        (2, None, None, None, False),
        (3, "naïve ✓ \"quoted\"", 5, [0.0], None),  # int 5 into double
    ]
    json_df = literal_df(spark, rows, schema)
    # force the legacy path by making coercion fail via a date sentinel,
    # then rebuild legacy frame manually (same construction literal_df
    # falls back to)
    st = _parse_datatype_string(f"struct<{schema}>")
    structs = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for v, f in zip(row, st.fields)
            ]
        )
        for row in rows
    ]
    legacy_df = (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("_s"))
        .select("_s.*")
    )
    a = sorted(map(tuple, json_df.collect()))
    b = sorted(map(tuple, legacy_df.collect()))
    assert a == b
    # float bit-exactness explicitly
    assert a[0][2] == 0.1 + 0.2 and a[0][3][1] == -2.25e-300
    # non-JSON-safe values still work via the fallback path
    import datetime

    d = literal_df(
        spark, [(datetime.date(2024, 1, 2), 7)], "d date, k int"
    ).collect()
    assert d[0].d == datetime.date(2024, 1, 2) and d[0].k == 7
    # coercion guard: _to_json_value refuses what JSON can't carry
    with pytest.raises(ValueError):
        _to_json_value(float("nan"), st.fields[2].dataType)


def test_literal_map_equals_create_map(spark):
    from stock_data_warehouse_analytics_spark.operators.localrel import literal_map

    m = {"a b": 3, "naïve|x": -17, "": 0}
    lm = literal_map(m)
    cm = F.create_map(*[F.lit(x) for kv in m.items() for x in kv])
    row = spark.range(1).select(
        F.element_at(lm, "a b").alias("l1"),
        F.element_at(cm, "a b").alias("c1"),
        F.element_at(lm, "naïve|x").alias("l2"),
        F.element_at(cm, "naïve|x").alias("c2"),
        F.element_at(lm, "missing").alias("l3"),
        F.element_at(cm, "missing").alias("c3"),
    ).first()
    assert row.l1 == row.c1 == 3
    assert row.l2 == row.c2 == -17
    assert row.l3 is None and row.c3 is None
    # constant-folded: no from_json left in the optimized plan
    plan = (
        spark.range(1)
        .select(lm.alias("m"))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "from_json" not in plan


def test_hyperplane_signature_matches_chained_reference(spark):
    from stock_data_warehouse_analytics_spark.operators import similarity as S

    dim, n_planes = 16, 8
    df = spark.range(64).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (F.col("id") * (j.cast("double") + 1.0) % 7.0) - 3.0,
        ).alias("v")
    )
    new = df.select(
        S.hyperplane_signature(F.col("v"), dim=dim, n_planes=n_planes).alias("s")
    ).collect()
    ref = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(x) for x in S._plane(dim, p)])
        ref = ref + F.when(S.dot(plane, F.col("v")) > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    old = df.select(ref.alias("s")).collect()
    assert [r.s for r in new] == [r.s for r in old]


def test_dedup_store_matches_direct_operators(spark):
    from stock_data_warehouse_analytics_spark.operators.dedup import (
        minhash_candidate_pairs,
        minhash_signatures,
        shingle_table,
        simhash_near_pairs,
    )
    from stock_data_warehouse_analytics_spark.plans.dedup_store import (
        staged_candidates,
        staged_shingles,
        staged_signatures,
        staged_simhash_pairs,
    )
    from stock_data_warehouse_analytics_spark.sources.tables import load_table

    d = load_table(spark, SF_DIR, "documents")
    pairs_direct = sorted(
        map(tuple, minhash_candidate_pairs(d, n_hashes=16, bands=4).collect())
    )
    pairs_staged = sorted(map(tuple, staged_candidates(spark, SF_DIR).collect()))
    assert pairs_direct == pairs_staged
    sig_direct = sorted(map(tuple, minhash_signatures(d, n_hashes=16).collect()))
    sig_staged = sorted(map(tuple, staged_signatures(spark, SF_DIR).collect()))
    assert sig_direct == sig_staged
    sh_direct = sorted(map(tuple, shingle_table(d, "text", 3).collect()))
    sh_staged = sorted(map(tuple, staged_shingles(spark, SF_DIR).collect()))
    assert sh_direct == sh_staged
    sim_direct = sorted(
        map(tuple, simhash_near_pairs(d, max_hamming=8, bands=4).collect())
    )
    sim_staged = sorted(
        map(tuple, staged_simhash_pairs(spark, SF_DIR).collect())
    )
    assert sim_direct == sim_staged
