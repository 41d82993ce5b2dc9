"""Checkpointed, resumable sketch jobs with per-partition lineage + metrics.

The unit of recovery is a deterministic content-hash slice of the input
(``slice = portable_hash(key cols) % n_slices`` — stable across runs and
independent of physical partitioning).  Each slice's partial sketches are
written as an encoded-blob parquet directory plus a manifest line
(JSON: slice id, rows, groups, bytes, wall time, attempt).  Resume skips
slices already in the manifest and decode-and-merges the rest — the same
"decode is merge" shape as the reference's streaming decoder
(/root/reference/ddsketch/ddsketch.go:400-475).

This is the batch twin of a streaming checkpoint: a 100-TB job sliced into
256 recoverable units loses at most 1/256 of its work to a failure, and the
manifest doubles as the per-task lineage/metrics record the north rule
requires."""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Sequence

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sketches_go_spark.core.ddsketch import DDSketch, DDSketchConfig
from sketches_go_spark.functions.ddsketch_fns import (
    ddsketch_agg,
    ddsketch_merge,
    with_quantiles,
)
from sketches_go_spark.functions.expressions import portable_hash64


@dataclass
class SliceRecord:
    slice_id: int
    n_groups: int
    bytes_written: int
    wall_sec: float
    attempt: int
    finished_at: float


class CheckpointedSketchJob:
    """Resumable per-group DDSketch aggregation.

    >>> job = CheckpointedSketchJob("/ckpt/dir", keys=["role"], n_slices=16)
    >>> job.run(df, "v")          # computes missing slices, writes manifest
    >>> result = job.result(spark)  # merged sketches (decode-and-merge)
    """

    def __init__(
        self,
        job_dir: str,
        keys: Sequence[str],
        n_slices: int = 16,
        config: DDSketchConfig | None = None,
        slices_per_batch: int = 4,
    ):
        self.job_dir = job_dir
        self.keys = list(keys)
        self.n_slices = n_slices
        self.config = config or DDSketchConfig()
        self.slices_per_batch = slices_per_batch
        os.makedirs(job_dir, exist_ok=True)

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.job_dir, "manifest.jsonl")

    def completed_slices(self) -> dict[int, dict]:
        done: dict[int, dict] = {}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    rec = json.loads(line)
                    done[rec["slice_id"]] = rec
        return done

    def _slice_col(self):
        h = portable_hash64(F.concat_ws("\x1f", *[F.col(k) for k in self.keys]))
        return F.pmod(h, F.lit(self.n_slices))

    def _slice_dir(self, s: int) -> str:
        return os.path.join(self.job_dir, f"slice={s}")

    def run(self, df: DataFrame, value_col: str, fail_after_slices: int | None = None):
        """Compute partial sketches for every slice not yet in the manifest.

        ``fail_after_slices`` injects a crash after N slices (test hook for
        the resume path)."""
        done = self.completed_slices()
        missing = [s for s in range(self.n_slices) if s not in done]
        sliced = df.withColumn("_slice", self._slice_col())
        processed = 0
        for i in range(0, len(missing), self.slices_per_batch):
            chunk = missing[i : i + self.slices_per_batch]
            t0 = time.perf_counter()
            part = sliced.where(F.col("_slice").isin([int(s) for s in chunk]))
            out = ddsketch_agg(part, value_col, [*self.keys, "_slice"], self.config)
            pdf = out.toPandas()
            wall = time.perf_counter() - t0
            for s in chunk:
                sub = pdf[pdf["_slice"] == s].drop(columns=["_slice"])
                sdir = self._slice_dir(int(s))
                os.makedirs(sdir, exist_ok=True)
                path = os.path.join(sdir, "partials.parquet")
                sub.to_parquet(path)
                rec = SliceRecord(
                    slice_id=int(s),
                    n_groups=len(sub),
                    bytes_written=os.path.getsize(path),
                    wall_sec=round(wall / len(chunk), 4),
                    attempt=1,
                    finished_at=time.time(),
                )
                # manifest append is the commit point for the slice
                with open(self.manifest_path, "a") as f:
                    f.write(json.dumps(rec.__dict__) + "\n")
                processed += 1
                if fail_after_slices is not None and processed >= fail_after_slices:
                    raise RuntimeError(
                        f"injected failure after {processed} slices"
                    )
        return self

    def result(self, spark: SparkSession) -> DataFrame:
        """Merged per-group sketches from all checkpointed slices
        (decode-and-merge; resume-safe: requires a complete manifest)."""
        done = self.completed_slices()
        if len(done) < self.n_slices:
            missing = sorted(set(range(self.n_slices)) - set(done))
            raise RuntimeError(f"job incomplete; missing slices {missing}")
        frames = [
            pd.read_parquet(os.path.join(self._slice_dir(s), "partials.parquet"))
            for s in sorted(done)
        ]
        allp = pd.concat(frames, ignore_index=True)
        partials = spark.createDataFrame(allp)
        return ddsketch_merge(partials, self.keys, self.config)

    def quantiles(self, spark: SparkSession, qs: Sequence[float]) -> DataFrame:
        return with_quantiles(self.result(spark), qs)

    def metrics(self) -> pd.DataFrame:
        """The lineage/metrics table (one row per completed slice)."""
        return pd.DataFrame(list(self.completed_slices().values()))
