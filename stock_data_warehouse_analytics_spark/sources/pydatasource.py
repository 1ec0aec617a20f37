"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API) —
the extension point for reading systems Spark has no built-in connector
for (internal feeds, bespoke formats), with REAL partition planning:
the driver decides the split, executors read their partitions in
parallel, nothing funnels through the driver.

The concrete source here generates a deterministic synthetic number
table (hash-mixed uniform values), so tests and the DuckDB oracle can
reproduce every row arithmetically — the source mechanics (schema
declaration, option handling, partition planning, per-partition
iteration) are exactly what a production connector implements.
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from collections.abc import Iterator, Sequence

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

__all__ = [
    "SyntheticNumbersDataSource",
    "ensure_package_shipped",
    "MIX_MULT",
    "MIX_MOD",
    "STREAM_BATCH_ROWS",
]

# Python-worker processes unpickle the DataSource BY MODULE REFERENCE,
# so the package must be importable on executors — which is only
# incidentally true when the driver's cwd is the repo root.  Shipping
# the package archive via addPyFile is the real deployment contract
# (spark-submit --py-files) and covers EXECUTOR workers — but NOT the
# driver-side python_streaming_source_runner process that plans a
# STREAMING Python data source: that runner's sys.path ignores
# addPyFile archives, so from any other cwd it died with
# ModuleNotFoundError at initialOffset planning — surfacing in the
# memory sink as a query that terminates with 0 rows (the r5/r7
# "streaming DataSource flake", misattributed to worker-socket load
# for two rounds: it reproduces instantly from /tmp with or without
# load, and never from the repo root).  The fix is to register this
# MODULE with cloudpickle BY VALUE, so the pickled source carries its
# own code and no process ever needs the import to resolve — the
# module is deliberately self-contained (stdlib + pyspark imports
# only) to keep that sound.
_SHIPPED: set[str] = set()


def ensure_package_shipped(spark: SparkSession) -> None:
    """Make this module runnable in every Spark-spawned Python process:
    register it with cloudpickle by VALUE (covers the driver-side
    streaming-source runner, whose path addPyFile does NOT reach) and
    ship the package zip via addPyFile (the --py-files deployment
    contract for executor workers), once per application."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"sdwas_pkg_{os.path.basename(pkg_dir)}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, base))
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED.add(app_id)

# Knuth-style multiplicative mix; products stay < 2^63 for i < ~3.4e9
MIX_MULT = 2_654_435_761
MIX_MOD = 1 << 31


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class _Reader(DataSourceReader):
    def __init__(self, n_rows: int, n_partitions: int) -> None:
        self.n_rows = n_rows
        self.n_partitions = n_partitions

    def partitions(self) -> Sequence[InputPartition]:
        per = max(1, -(-self.n_rows // self.n_partitions))
        return [
            _RangePartition(lo, min(lo + per, self.n_rows))
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition: _RangePartition) -> Iterator:
        # Arrow-batched read: one RecordBatch per partition instead of
        # per-row tuples — the per-row Python→JVM path is the classic
        # custom-source bottleneck; vectorized construction + Arrow
        # transfer is the production pattern (and ~10× faster here).
        import numpy as np
        import pyarrow as pa

        i = np.arange(partition.start, partition.end, dtype=np.int64)
        mixed = (i * MIX_MULT) % MIX_MOD
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(i, type=pa.int64()),
                pa.array((i % 10).astype(np.int32), type=pa.int32()),
                pa.array(mixed / MIX_MOD, type=pa.float64()),
            ],
            names=["i", "bucket", "x"],
        )


STREAM_BATCH_ROWS = 256


class _StreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same synthetic feed: offsets are plain row
    counters, each micro-batch serves the next ``STREAM_BATCH_ROWS``
    rows of the SAME deterministic sequence as the batch reader.

    The simple-reader contract demonstrated here is what any
    offset-based connector (queue, changelog, ticker feed) implements:
    ``initialOffset`` → where to start, ``read(start)`` → (rows, next
    offset) for a new batch, ``readBetweenOffsets`` → deterministic
    REPLAY of a committed range after restart — replayability, not the
    happy path, is what makes the source exactly-once."""

    def __init__(self, batch_rows: int = STREAM_BATCH_ROWS) -> None:
        self.batch_rows = batch_rows

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def _rows(self, start: int, end: int) -> Iterator[tuple]:
        # list-backed iterator, NOT a generator: Spark's prefetch cache
        # copy.copy()s the iterator between micro-batches and generators
        # are neither copyable nor picklable
        return iter(
            [
                (i, int(i % 10), ((i * MIX_MULT) % MIX_MOD) / MIX_MOD)
                for i in range(start, end)
            ]
        )

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        s = int(start["offset"])
        e = s + self.batch_rows
        return self._rows(s, e), {"offset": e}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return self._rows(int(start["offset"]), int(end["offset"]))


class SyntheticNumbersDataSource(DataSource):
    """``spark.read.format("synthetic_numbers").option("rows", N)`` —
    and ``spark.readStream.format("synthetic_numbers")`` for the
    offset-tracked streaming face of the same rows.

    Options (batch): ``rows`` (default 1000), ``partitions`` (default 8).
    Options (stream): ``batch_rows`` (default 256) per micro-batch."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_numbers"

    def schema(self) -> str:
        return "i bigint, bucket int, x double"

    def reader(self, schema) -> DataSourceReader:  # noqa: ANN001
        return _Reader(
            int(self.options.get("rows", 1000)),
            int(self.options.get("partitions", 8)),
        )

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:  # noqa: ANN001
        return _StreamReader(int(self.options.get("batch_rows", STREAM_BATCH_ROWS)))
