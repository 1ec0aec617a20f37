"""Literal-map vs broadcast+pandas-UDF parity for the stateless
admission gates (advisor r5: the create_map literal vehicle must not be
the ONLY vehicle once models approach the 65536-entry cap).

Both paths share the Spark-side quantization/sum/argmax expressions;
the only difference is who produces the raw ln values (JVM codegen vs
Python math.log on identical double inputs) — these tests pin that the
two paths emit IDENTICAL rows on the real trained models.
"""

from __future__ import annotations

from stock_data_warehouse_analytics_spark.sources.tables import load_table
from stock_data_warehouse_analytics_spark.streaming.admission import (
    _LITERAL_SAFE_ENTRIES,
    lm_score_columns,
    nb_langid_columns,
)

from .conftest import SF_SMALL


def _rows(df, keys):
    return sorted(tuple(r[k] for k in keys) for r in df.collect())


def test_lm_paths_identical(spark):
    from stock_data_warehouse_analytics_spark.plans.lm import (
        _train_bigram_lm,
    )

    c2, c1, v = _train_bigram_lm(spark, SF_SMALL)
    docs = load_table(spark, SF_SMALL, "documents")
    keys = ("doc_id", "n_bigrams", "ppl", "admitted")
    lit = _rows(
        lm_score_columns(docs, c2, c1, v, force_path="literal"), keys
    )
    bro = _rows(
        lm_score_columns(docs, c2, c1, v, force_path="broadcast"), keys
    )
    assert lit == bro
    assert len(lit) > 0


def test_nb_paths_identical(spark):
    from stock_data_warehouse_analytics_spark.plans.stat_models import (
        _train_nb_langid,
    )

    clt, cl, prior, v = _train_nb_langid(spark, SF_SMALL)
    docs = load_table(spark, SF_SMALL, "documents")
    keys = ("doc_id", "n_tokens", "predicted", "score_micro", "admitted")
    lit = _rows(
        nb_langid_columns(
            docs, clt, cl, prior, v, force_path="literal"
        ),
        keys,
    )
    bro = _rows(
        nb_langid_columns(
            docs, clt, cl, prior, v, force_path="broadcast"
        ),
        keys,
    )
    assert lit == bro
    assert len(lit) > 0


def test_auto_switch_threshold():
    """The auto-selected vehicle must flip to broadcast past the
    literal-safe bound (no 131k-literal plan trees can be built)."""
    assert _LITERAL_SAFE_ENTRIES <= 10_000
