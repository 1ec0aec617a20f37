"""Local stand-in for the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet
tables, sorts columns by name and rows by value, and compares cell-wise.
``strict=True`` requires bit-identical floats (our target — see
``plans/exact.py``); the returned report also carries the max float
deviation for diagnosis when something drifts.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from dataclasses import dataclass, field

import duckdb

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


@dataclass
class CompareReport:
    name: str
    rows_spark: int
    rows_oracle: int
    cols_spark: list[str]
    cols_oracle: list[str]
    exact_match: bool
    mismatched_cells: int = 0
    max_abs_diff: float = 0.0
    first_diff: str = ""
    errors: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return self.exact_match and not self.errors


def _norm_cell(v):
    if isinstance(v, _dt.datetime | _dt.date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _sortkey(row):
    return tuple(
        (v is None, str(type(v)), str(v)) for v in row
    )


def compare_query(name: str, fn, oracle: str, spark, sf_dir: str) -> CompareReport:
    sdf = fn(spark, sf_dir)
    s_cols = sorted(sdf.columns)
    s_rows = [tuple(_norm_cell(r[c]) for c in s_cols) for r in sdf.collect()]

    con = duckdb_conn(sf_dir)
    cur = con.execute(oracle)
    o_cols_raw = [d[0] for d in cur.description]
    order = sorted(range(len(o_cols_raw)), key=lambda i: o_cols_raw[i])
    o_cols = [o_cols_raw[i] for i in order]
    o_rows = [tuple(_norm_cell(row[i]) for i in order) for row in cur.fetchall()]
    con.close()

    rep = CompareReport(
        name=name,
        rows_spark=len(s_rows),
        rows_oracle=len(o_rows),
        cols_spark=s_cols,
        cols_oracle=o_cols,
        exact_match=False,
    )
    if s_cols != o_cols:
        rep.errors.append(f"column mismatch: spark={s_cols} oracle={o_cols}")
        return rep
    if len(s_rows) != len(o_rows):
        rep.errors.append(f"row count: spark={len(s_rows)} oracle={len(o_rows)}")
        return rep

    s_rows.sort(key=_sortkey)
    o_rows.sort(key=_sortkey)
    mism = 0
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        for j, (a, b) in enumerate(zip(sr, orow)):
            same = a == b or (a is None and b is None)
            if not same:
                mism += 1
                if isinstance(a, int | float) and isinstance(b, int | float):
                    d = abs(float(a) - float(b))
                    rep.max_abs_diff = max(rep.max_abs_diff, d)
                if not rep.first_diff:
                    rep.first_diff = f"row {i} col {s_cols[j]}: spark={a!r} oracle={b!r}"
    rep.mismatched_cells = mism
    rep.exact_match = mism == 0
    return rep
