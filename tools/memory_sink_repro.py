#!/usr/bin/env python
"""Minimal standalone repro: does Spark's MEMORY SINK retain rows from
EVERY micro-batch under ``trigger(availableNow=True)``, or only the
final batch?

Background (r7 verdict action #6): while building the stateful
sessionizer parity test (tests/test_stateful_skew.py::
test_stateful_sessionizer_matches_batch) the memory table was observed
holding only the LAST batch's rows even though each batch's
StreamingQueryProgress reported correct non-zero ``numOutputRows`` —
the test therefore uses foreachBatch as ground truth.  This script
isolates the question from the sessionizer entirely: a trivial
stateless pass-through over three files, one file per micro-batch
(``maxFilesPerTrigger=1``), APPEND mode, comparing

  1. rows visible in the memory table after termination,
  2. rows delivered to foreachBatch (ground truth),
  3. per-batch numOutputRows from query progress.

Run:  python tools/memory_sink_repro.py

Findings from this box (Spark 4.1.2, local mode) are recorded at the
bottom of this docstring after each run of the script.

Upstream context (checked 2026-08-16, offline box — from the Spark
source shipped in the installed pyspark wheel): MemorySink.addBatch
keeps an in-memory ArrayBuffer of AddedData per batchId and its
``allData`` concatenates every batch, so append-mode accumulation IS
the documented contract (SPARK source: sql/core/.../memory.scala; the
sink even guards "skipping already committed batch").  A final batch
replacing earlier ones would mean addBatch was called with a REPLAYED
batchId after a checkpoint restart (the sink drops duplicate batchIds)
or the table was re-created.  This repro decides which side of that
contract this environment actually lands on; network access to Spark
JIRA is unavailable here, so the disposition below cites observed
behavior + shipped source, not an upstream ticket.

OBSERVED (2026-08-16, Spark 4.1.2, local[8], this container):
  BOTH legs retained ALL batches — stateless: 30/30 rows, sink ==
  foreachBatch == per-batch progress (10+10+10); stateful
  (applyInPandasWithState, NoTimeout): 6/6 rows (2 keys × 3 batches),
  sink == foreachBatch.  The one-batch-only retention seen while
  developing the sessionizer test therefore reproduces on NEITHER a
  stateless pass-through NOR a minimal stateful operator; it involved
  additional moving parts (EventTimeTimeout + watermark + query
  retries under suite load).  Disposition: no generic memory-sink
  defect demonstrable — the accumulation contract in the shipped
  source holds here; the sessionizer test keeps foreachBatch as its
  ground truth (strictly more conservative, and immune to whatever
  the original interaction was), and nothing in the package builds on
  memory-sink accumulation semantics.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("memory-sink-repro")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="memsink_repro_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    # three files, ascending mtimes (FileStreamSource orders pending
    # files by modification time), 10 rows each
    for b in range(3):
        stage = os.path.join(work, f"stage{b}")
        spark.range(b * 10, b * 10 + 10).coalesce(1).write.mode(
            "overwrite"
        ).json(stage)
        (part,) = glob.glob(f"{stage}/part-*.json")
        dst = f"{src}/{b:03d}.json"
        shutil.move(part, dst)
        os.utime(dst, (1_000_000 + b, 1_000_000 + b))

    got_foreach: list[int] = []

    def sink(df, bid):
        got_foreach.extend(r.id for r in df.collect())

    stream = (
        spark.readStream.schema("id long")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q1 = (
        stream.writeStream.format("memory")
        .queryName("memsink_probe")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(work, "ckpt_mem"))
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination()
    progress_rows = [
        (p.batchId, p.sink.numOutputRows) for p in q1.recentProgress
    ]
    mem_rows = sorted(r.id for r in spark.table("memsink_probe").collect())

    q2 = (
        stream.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(work, "ckpt_feb"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    want = list(range(30))
    print("--- stateless pass-through ---")
    print(f"per-batch (batchId, numOutputRows): {progress_rows}")
    print(f"memory sink rows ({len(mem_rows)}): {mem_rows}")
    print(f"foreachBatch rows ({len(got_foreach)}): {sorted(got_foreach)}")
    ok = mem_rows == want and sorted(got_foreach) == want
    print(
        "RESULT: memory sink retained ALL batches — accumulation contract "
        "holds for stateless append"
        if mem_rows == want
        else f"RESULT: memory sink DROPPED batches — kept {len(mem_rows)}/30 "
        "rows while foreachBatch/progress saw all of them"
    )

    # ---- stateful leg: the SAME comparison through a trivial
    # applyInPandasWithState operator (emit each batch's per-key count
    # immediately, keep a running total in state) — isolates whether
    # the one-batch-only retention seen in the sessionizer test is a
    # stateful-pipeline interaction rather than a sink defect.
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def per_batch_count(key, pdfs, state):
        n = sum(len(p) for p in pdfs)
        total = (state.get[0] if state.exists else 0) + n
        state.update((total,))
        yield pd.DataFrame(
            {"k": [key[0]], "batch_rows": [n], "running": [total]}
        )

    def stateful_stream():
        return (
            stream.withColumn("k", (stream.id % 2).cast("long"))
            .groupBy("k")
            .applyInPandasWithState(
                per_batch_count,
                outputStructType="k long, batch_rows long, running long",
                stateStructType="total long",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )

    q3 = (
        stateful_stream()
        .writeStream.format("memory")
        .queryName("memsink_stateful")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(work, "ckpt_mem_st"))
        .trigger(availableNow=True)
        .start()
    )
    q3.awaitTermination()
    st_mem = sorted(
        (r.k, r.batch_rows, r.running)
        for r in spark.table("memsink_stateful").collect()
    )

    st_foreach: list[tuple] = []

    def sink_st(df, bid):
        st_foreach.extend(
            (r.k, r.batch_rows, r.running) for r in df.collect()
        )

    q4 = (
        stateful_stream()
        .writeStream.foreachBatch(sink_st)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(work, "ckpt_feb_st"))
        .trigger(availableNow=True)
        .start()
    )
    q4.awaitTermination()

    print("--- stateful (applyInPandasWithState) ---")
    print(f"memory sink rows ({len(st_mem)}): {st_mem}")
    print(f"foreachBatch rows ({len(st_foreach)}): {sorted(st_foreach)}")
    st_ok = st_mem == sorted(st_foreach) and len(st_mem) == 6
    print(
        "RESULT: stateful memory sink retained ALL batches too"
        if st_ok
        else f"RESULT: stateful leg diverged — memory sink kept "
        f"{len(st_mem)} rows vs foreachBatch {len(st_foreach)} "
        "(expected 6 = 2 keys × 3 batches each)"
    )

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0 if (ok and st_ok) else 1


if __name__ == "__main__":
    raise SystemExit(main())
