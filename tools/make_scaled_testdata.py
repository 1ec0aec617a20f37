#!/usr/bin/env python
"""Synthesize scaled copies of the sf0.1 documents/embeddings tables for
growth-curve benchmarking (PERF.md) — the driver only ships sf ≤ 0.1,
and /root/testdata is read-only, so scaled inputs live under /tmp.

Scaling rule (deterministic, no RNG):

- documents ×k: copy c ∈ [0,k) TAGS every word longer than 2 chars
  with a copy suffix (``w~c``) and keeps short words global.  This is
  the Heaps-law regime a real growing corpus exhibits: the shingle
  vocabulary grows ~×k (content shingles are copy-local, df stays
  flat) while a small set of short-word shingles stays global with df
  growing ×k — the stop-shingle population the df cap exists for.
  Within-copy structure is preserved verbatim, so every true near-dup
  pair of the base corpus replicates once per copy: the TRUE pair
  count grows exactly ×k, which is the yardstick the join's output
  should track.  (The naive alternatives fail: verbatim copies make
  every cross-copy pair a near-dup — quadratic true pairs; and this
  base corpus's ~30-word vocabulary saturates the trigram space, so
  untagged scaling drives EVERY shingle's df up ×k — a regime where
  no inverted index is linear and which no natural corpus matches.)
- embeddings ×k: copy c adds a small deterministic offset to two
  coordinates (c-dependent), so copies are distinct vectors with the
  same scale/distribution.

Usage: python tools/make_scaled_testdata.py [k ...]  (default 2 5 10)
Writes /tmp/sfscale/x{k}/{documents,embeddings}.parquet and symlinks
the remaining sf0.1 tables (bench warmup reads lineitem).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST_ROOT = "/tmp/sfscale"


def make(k: int, docs_only: bool = False) -> str:
    """``docs_only`` scales documents/embeddings only and symlinks the
    fact tables from sf0.1 — the ×100 dedup growth point needs a 500k-
    doc corpus but not a 100M-row lineitem."""
    out = os.path.join(DST_ROOT, f"x{k}")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    copies = ", ".join(str(c) for c in range(k))
    con.execute(
        f"""
COPY (
  WITH src AS (SELECT * FROM read_parquet('{SRC}/documents.parquet')),
  copies AS (SELECT unnest([{copies}]) AS c)
  SELECT doc_id + c * 1_000_000 AS doc_id,
         CASE WHEN c = 0 THEN text ELSE
           array_to_string(
             list_transform(t, w ->
               CASE WHEN length(w) <= 2 THEN w
                    ELSE w || '~' || c END),
             ' ')
         END AS text,
         lang, source, n_chars
  FROM (SELECT *, string_split_regex(lower(trim(text)), '\\s+') AS t FROM src)
  CROSS JOIN copies
) TO '{out}/documents.parquet' (FORMAT PARQUET)
"""
    )
    con.execute(
        f"""
COPY (
  WITH src AS (SELECT * FROM read_parquet('{SRC}/embeddings.parquet')),
  copies AS (SELECT unnest([{copies}]) AS c)
  SELECT vec_id + c * 1_000_000 AS vec_id,
         CASE WHEN c = 0 THEN embedding ELSE
           list_transform(embedding, (x, i) ->
             CAST(x + CASE WHEN i - 1 = c % 64 THEN 0.05 * (c + 1)
                           WHEN i - 1 = (c + 7) % 64 THEN -0.03 * (c + 1)
                           ELSE 0 END AS FLOAT))
         END AS embedding,
         label
  FROM src CROSS JOIN copies
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
"""
    )
    # orders/lineitem ×k: each copy offsets the order AND customer key
    # space (disjoint customer populations per copy) while the PART
    # catalog stays shared — the real marketplace-growth regime, where
    # popular parts accumulate ×k buyers and become hubs.  True
    # same-copy link-prediction pairs replicate ×k; a part's customer
    # df grows ×k, so the df-capped inverted index must prune more —
    # exactly the discipline the growth protocol exists to stress.
    for t in ("orders", "lineitem"):
        # drop the symlink earlier tool versions left — COPY through a
        # symlink would try to write the read-only source
        p = os.path.join(out, f"{t}.parquet")
        if os.path.islink(p):
            os.unlink(p)
    if docs_only:
        for t in (
            "region", "nation", "customer", "supplier", "part", "events",
            "orders", "lineitem",
        ):
            link = os.path.join(out, f"{t}.parquet")
            if not os.path.exists(link):
                os.symlink(os.path.join(SRC, f"{t}.parquet"), link)
        return out
    con.execute(
        f"""
COPY (
  WITH src AS (SELECT * FROM read_parquet('{SRC}/orders.parquet')),
  copies AS (SELECT unnest([{copies}]) AS c)
  SELECT o_orderkey + c * 100_000_000 AS o_orderkey,
         o_custkey + c * 10_000_000 AS o_custkey,
         * EXCLUDE (o_orderkey, o_custkey)
  FROM src CROSS JOIN copies
) TO '{out}/orders.parquet' (FORMAT PARQUET)
"""
    )
    con.execute(
        f"""
COPY (
  WITH src AS (SELECT * FROM read_parquet('{SRC}/lineitem.parquet')),
  copies AS (SELECT unnest([{copies}]) AS c)
  SELECT l_orderkey + c * 100_000_000 AS l_orderkey,
         * EXCLUDE (l_orderkey)
  FROM src CROSS JOIN copies
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
"""
    )
    for t in (
        "region", "nation", "customer", "supplier", "part", "events",
    ):
        link = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), link)
    return out


if __name__ == "__main__":
    args = sys.argv[1:]
    docs_only = "--docs-only" in args
    ks = [int(a) for a in args if a != "--docs-only"] or [2, 5, 10]
    for k in ks:
        print(make(k, docs_only=docs_only))
