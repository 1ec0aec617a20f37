"""Query registry backing ``__spark_entry__.py``.

Each :class:`QuerySpec` pairs a Spark DataFrame plan with the ANSI-SQL
string a DuckDB oracle runs on the same parquet tables.  The driver
hash-compares the two result sets (order-insensitive, columns sorted by
name), so every computed column is aliased identically on both sides and
float aggregates are derived from exact decimal moments (see
``plans/exact.py``) to be bit-identical across engines.

Registration is import-driven: importing ``plans.all_queries`` populates
``QUERIES``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None → driver does a weaker rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(
    name: str, *, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags
        )
        return fn

    return deco


def _ensure_loaded() -> None:
    # Unconditional import: Python's module cache makes this a no-op
    # after the first time.  (A `if not QUERIES` guard here is a trap:
    # importing any single plans submodule directly registers SOME
    # queries, and the guard would then skip loading the rest —
    # partial-registry KeyErrors far from the cause.)
    from . import all_queries  # noqa: F401  (import side effect registers)


def get_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in QUERIES.items()}


def get_oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
