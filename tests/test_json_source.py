"""JSON-lines source semantics: schema'd reads, PERMISSIVE corrupt-
record capture, DROPMALFORMED, and the json sink round trip — the
semi-structured half of the S-family (S1-S5 cover CSV; events.props
covers embedded JSON strings)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from stock_data_warehouse_analytics_spark.sources.sinks import (
    read_table,
    write_table,
)

_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def _write_jsonl(path: str) -> None:
    rows = [
        {"id": 1, "name": "a", "score": 1.5},
        {"id": 2, "name": "b", "score": 2.5},
        "{broken json",
        {"id": 4, "name": "d", "score": None},
    ]
    with open(path, "w") as f:
        for r in rows:
            f.write(r if isinstance(r, str) else json.dumps(r))
            f.write("\n")


def test_permissive_mode_captures_corrupt_records(spark, tmp_path):
    p = os.path.join(tmp_path, "in.jsonl")
    _write_jsonl(p)
    df = read_table(spark, p, "json", schema=_SCHEMA, mode="PERMISSIVE")
    rows = df.collect()
    assert len(rows) == 4
    corrupt = [r for r in rows if r._corrupt_record is not None]
    assert len(corrupt) == 1
    assert corrupt[0]._corrupt_record.startswith("{broken")
    good = {r.id for r in rows if r.id is not None}
    assert good == {1, 2, 4}


def test_dropmalformed_skips_bad_lines(spark, tmp_path):
    p = os.path.join(tmp_path, "in.jsonl")
    _write_jsonl(p)
    schema = T.StructType(_SCHEMA.fields[:3])
    df = read_table(spark, p, "json", schema=schema, mode="DROPMALFORMED")
    assert sorted(r.id for r in df.collect()) == [1, 2, 4]


def test_json_sink_roundtrip_preserves_types(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "x", 1.25), (2, "y", None)], "id long, name string, score double"
    )
    out = os.path.join(tmp_path, "out_json")
    write_table(src, out, "json")
    schema = T.StructType(_SCHEMA.fields[:3])
    back = read_table(spark, out, "json", schema=schema)
    assert sorted((r.id, r.name, r.score) for r in back.collect()) == [
        (1, "x", 1.25),
        (2, "y", None),
    ]
    assert back.schema == schema


def test_json_predicate_prunes_with_filter_pushdown(spark, tmp_path):
    src = spark.range(100).select(
        F.col("id"), (F.col("id") % 10).alias("bucket")
    )
    out = os.path.join(tmp_path, "part_json")
    write_table(src, out, "json", partition_by=("bucket",))
    schema = T.StructType([T.StructField("id", T.LongType())])
    back = read_table(spark, out, "json", schema=schema).filter(
        F.col("bucket") == 3
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition-directory pruning must reach the scan
    assert "PartitionFilters: [isnotnull(bucket" in plan, plan
    assert back.count() == 10
