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

OBSERVED (round 9, retry legs — closes the r8 remaining suspect
"timeout-batch replay after a retry's checkpoint reuse"):
  (a) Spark REFUSES to start a memory-sink query against an existing
      checkpoint at all — AnalysisException "This query does not
      support recovering from checkpoint location" — so replayed
      timeout batches interacting with the sink's batchId dedup can
      never occur: the replay hypothesis is structurally impossible,
      not merely unobserved.
  (b) A re-start under the same queryName (what any retry wrapper or
      re-invoked helper does, necessarily with a fresh checkpoint per
      (a)) RECREATES the table: rows the previous run emitted are
      gone, and the table afterwards holds exactly what the LAST
      attempt processed.  If the last attempt processes fewer batches
      than the first (e.g. the FileStreamSource mtime-ordering +
      watermark-drop gotcha in ROUND_NOTES, or an EventTimeTimeout
      emitting expired state in batch 0 of the retry), the table shows
      the one/final-batch-only picture.
  DISPOSITION: closed — no sink defect, no replay path.  The r5/r7
  empty-table flake was the DataSource module-unpickling bug (fixed
  r8, sources/pydatasource.py); the one-batch-only retention matches
  re-start recreation under (b).  foreachBatch remains the correct
  ground truth for every stream≡batch parity test.
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

    # ---- retry legs (r8 remaining suspect: "timeout-batch replay
    # after a retry's checkpoint reuse").  Two sub-questions:
    #
    # (a) CAN a memory-sink query even resume from a reused
    #     checkpoint?  (If yes, replayed batchIds could interact with
    #     the sink's dedup and drop rows.)
    # (b) What does a RE-START of a same-named memory query (any retry
    #     wrapper, fresh checkpoint) do to rows the previous run put
    #     in the table?
    src2 = os.path.join(work, "src_restart")
    os.makedirs(src2)

    def add_file(b: int) -> None:
        stage = os.path.join(work, f"rstage{b}")
        spark.range(b * 10, b * 10 + 10).coalesce(1).write.mode(
            "overwrite"
        ).json(stage)
        (part,) = glob.glob(f"{stage}/part-*.json")
        dst = f"{src2}/{b:03d}.json"
        shutil.move(part, dst)
        os.utime(dst, (2_000_000 + b, 2_000_000 + b))

    add_file(0)
    add_file(1)
    stream2 = (
        spark.readStream.schema("id long")
        .option("maxFilesPerTrigger", 1)
        .json(src2)
    )
    ck_restart = os.path.join(work, "ckpt_restart")

    def run_once(ckpt: str) -> list[tuple]:
        q = (
            stream2.writeStream.format("memory")
            .queryName("memsink_restart")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return [(p.batchId, p.sink.numOutputRows) for p in q.recentProgress]

    prog_run1 = run_once(ck_restart)
    rows_run1 = sorted(r.id for r in spark.table("memsink_restart").collect())
    add_file(2)  # arrives between run 1 and the retry

    print("--- retry leg (a): checkpoint REUSE with a memory sink ---")
    print(f"run 1 per-batch: {prog_run1}; table after run 1: {rows_run1}")
    reuse_refused = False
    try:
        run_once(ck_restart)
        rows_reuse = sorted(
            r.id for r in spark.table("memsink_restart").collect()
        )
        print(f"checkpoint reuse SUCCEEDED; table now: {rows_reuse}")
    except Exception as exc:  # AnalysisException expected
        reuse_refused = "recovering from checkpoint" in str(exc)
        print(
            "RESULT: Spark REFUSES memory-sink recovery outright — "
            f"{str(exc).splitlines()[0][:160]}"
        )
        print(
            "⇒ the 'timeout-batch replay after checkpoint reuse' "
            "suspect is STRUCTURALLY IMPOSSIBLE for a memory sink: no "
            "run ever resumes a memory-sink checkpoint."
        )

    # (b) re-start with a FRESH checkpoint (what any retry wrapper or
    # re-invoked helper actually does): the sink is recreated at
    # start(), so run 1's rows vanish and the table afterwards holds
    # exactly what the LAST attempt processed.
    prog_run2 = run_once(os.path.join(work, "ckpt_restart2"))
    rows_run2 = sorted(r.id for r in spark.table("memsink_restart").collect())
    print("--- retry leg (b): re-start, same table name, fresh ckpt ---")
    print(f"run 2 per-batch: {prog_run2}; table after run 2: {rows_run2}")
    recreated = rows_run1 == list(range(20)) and rows_run2 == list(range(30))
    print(
        "RESULT: start() RECREATED the table — run 1's view is gone and "
        "the table reflects only the last attempt's batches.  Any retry "
        "wrapper (or a helper that re-invokes start()) therefore shows "
        "the one/last-batch-only symptom with zero sink defect; combined "
        "with leg (a)'s hard refusal, the r8 suspect is closed: replay "
        "cannot happen, recreation explains what was seen."
        if recreated
        else f"RESULT: unexpected table contents after re-start: "
        f"{rows_run2}"
    )

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0 if (ok and st_ok and reuse_refused and recreated) else 1


if __name__ == "__main__":
    raise SystemExit(main())
