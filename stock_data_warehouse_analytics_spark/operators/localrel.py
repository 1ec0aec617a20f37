"""Literal local relations — small bounded frames without Python-RDD
partitions.

``spark.createDataFrame(list_of_tuples, schema)`` backs the frame with
a pickled Python-RDD partition, so EVERY job that scans it (including
each broadcast build and each re-execution of an uncached plan) pays a
Python-worker round trip — measured at ~0.3 s on an idle box and up to
~5 s per job under load (round-9 bisect: a 60-row coalesce(1).count()
at 5.5 s while a 32-task JVM scan of real data ran in 0.2 s).  A
literal ``explode(array(struct(...)))`` over ``spark.range(1)`` stays
entirely JVM-side: Catalyst folds it to a LocalRelation, broadcasts
come straight from the plan, and no Python worker is ever launched.

For BOUNDED frames only: every value is embedded in the query plan, so
callers keep rows at O(100s) — grid/sweep tables, quantile targets,
centroid tables, per-group offset maps.  Data-sized frames keep the
normal read path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import _parse_datatype_string


def literal_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """A DataFrame of ``rows`` (tuples/lists matching ``schema``, a DDL
    string like ``"cell int, cvec array<double>"``) built as a pure
    literal plan — the JVM-side replacement for small
    ``createDataFrame`` calls.  Values may be None (cast to the field
    type); empty ``rows`` falls back to an empty ``createDataFrame``
    (no job ever scans it)."""
    st = _parse_datatype_string(f"struct<{schema}>")
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    structs = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for v, f in zip(row, st.fields)
            ]
        )
        for row in rows
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("_s"))
        .select("_s.*")
    )
