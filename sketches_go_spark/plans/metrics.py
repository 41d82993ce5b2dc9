"""Per-task lineage / metrics emission (north rule: "lineage and metrics
emitted per task").

``TaskMetricsCollector`` registers a list-accumulating Spark accumulator;
sketch stages report one record per task: partition id, rows seen, rows
rejected (NaN/out-of-range), groups produced, wall seconds.  Records are
JSON-serializable dicts — write them to a manifest (the checkpoint job does)
or ship them to any metrics sink.

Works in local and cluster mode (accumulators travel with task results)."""

from __future__ import annotations

import time
from typing import Iterator

import pandas as pd

from pyspark import AccumulatorParam, TaskContext
from pyspark.sql import SparkSession


class _ListAccum(AccumulatorParam):
    def zero(self, value):
        return []

    def addInPlace(self, v1, v2):
        v1.extend(v2)
        return v1


class TaskMetricsCollector:
    def __init__(self, spark: SparkSession, name: str = "sgs"):
        self.name = name
        self._acc = spark.sparkContext.accumulator([], _ListAccum())

    def record(self, **fields) -> None:
        ctx = TaskContext.get()
        rec = {
            "name": self.name,
            "partition_id": ctx.partitionId() if ctx else -1,
            "stage_id": ctx.stageId() if ctx else -1,
            "attempt": ctx.attemptNumber() if ctx else -1,
            "ts": time.time(),
            **fields,
        }
        self._acc.add([rec])

    def records(self) -> list[dict]:
        return list(self._acc.value)

    def to_frame(self) -> pd.DataFrame:
        return pd.DataFrame(self.records())


def instrument_map_in_pandas(fn, collector: TaskMetricsCollector | None):
    """Wrap a mapInPandas function so each task emits (rows_in, rows_out,
    wall_sec) to the collector."""
    if collector is None:
        return fn

    def wrapped(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t0 = time.perf_counter()
        rows_in = 0
        rows_out = 0

        def counted() -> Iterator[pd.DataFrame]:
            nonlocal rows_in
            for pdf in batches:
                rows_in += len(pdf)
                yield pdf

        for out in fn(counted()):
            rows_out += len(out)
            yield out
        collector.record(
            rows_in=rows_in,
            rows_out=rows_out,
            wall_sec=round(time.perf_counter() - t0, 4),
        )

    return wrapped
