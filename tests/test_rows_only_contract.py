"""Driver-shaped contract test for every rows-only registered query:
the driver records (rowcount, schema) for these — so pin exactly that,
per REGISTRY NAME (the operator-level substitute tests in the other
modules verify semantics; this file guarantees no rows-only entry can
silently break or go nondeterministic in the dimension the driver
measures).  Two independent executions must agree on schema and
rowcount at sf0.001."""

from __future__ import annotations

import pytest

from stock_data_warehouse_analytics_spark.plans.registry import (
    QUERIES,
    _ensure_loaded,
)

from .conftest import SF_SMALL

_ensure_loaded()
ROWS_ONLY = sorted(n for n, s in QUERIES.items() if s.oracle is None)


def test_rows_only_inventory_is_intentional():
    """Every rows-only entry must SAY why in its doc (the register
    comment/docstring naming a substitute check) — new entries without
    a stated reason fail here, keeping the attestation story tight."""
    undocumented = []
    for n in ROWS_ONLY:
        doc = (QUERIES[n].doc or "").lower()
        if not any(
            k in doc
            for k in ("test", "rows-only", "sketch", "recall", "differential")
        ):
            undocumented.append(n)
    assert not undocumented, undocumented


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_schema_and_rowcount_stable(spark, name):
    fn = QUERIES[name].fn
    df1 = fn(spark, SF_SMALL)
    schema1 = [(f.name, f.dataType.simpleString()) for f in df1.schema.fields]
    n1 = df1.count()
    df2 = fn(spark, SF_SMALL)
    schema2 = [(f.name, f.dataType.simpleString()) for f in df2.schema.fields]
    assert schema1 == schema2, name
    assert n1 == df2.count(), name
    assert n1 >= 0
