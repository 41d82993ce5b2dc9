"""SparkSession factory tuned for the sketch workload.

Defaults target the sandbox (single JVM, local[N]) but every knob is the one
you would set on a real 1000-executor cluster: AQE on (runtime coalescing +
skew-join splitting), Arrow enabled for every pandas UDF boundary, shuffle
partitions sized to cores (override per-job at scale).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    app_name: str = "sketches-go-spark",
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cores}]" if cores else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = (cores or os.cpu_count() or 8) * 2

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's parallelism-first coalescing targets max(bytes/parallelism,
        # minPartitionSize); the 1m default assumes work ∝ shuffle bytes,
        # which the hash-heavy blocking self-joins here violate badly — a
        # ~2 MB fingerprint shuffle fans out into a 16M-row candidate
        # explode, and the default coalesced it to ONE task (measured:
        # winnow containment 14-17 s with a serialized 63 MB single-task
        # join stage, stable ~5 s at 256k; 64k over-splits the many tiny
        # exchanges of the LSH queries and costs ~1.5 s back).  Only
        # byte-light exchanges are affected; large shuffles still coalesce
        # toward the advisory target, so cluster behaviour is unchanged.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SGS_AQE_MIN_PARTITION_SIZE", "256k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # InferFiltersFromGenerate adds `size(arr) > 0` under every explode;
        # predicate pushdown then re-substitutes the array-building
        # expression into a scan-level filter, duplicating the whole
        # higher-order-function tree (and re-inlining split() at every
        # element_at site — the O(words²) shape word_shingles exists to
        # avoid).  Every HOF+explode operator here (shingles, winnow
        # fingerprints, simhash tokens, pigeonhole segments) pays the array
        # build TWICE for a filter that explode's own empty-array semantics
        # already imply (measured: shingle relation 5.1 s -> 1.1 s at
        # sf0.1).  The rule only helps when the inferred filter prunes at
        # the source CHEAPLY, which a generator fed by a derived array
        # never is.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # G1 (the JVM default) degrades 3-4x under 16+ allocating task
        # threads in this container; throughput GC restores linear scaling
        # for the scan-heavy string workloads
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(spark: SparkSession, sf_dir: str, name: str, fmt: str = "parquet"):
    """Table loader with a format switch.

    The production target is Iceberg (``format='iceberg'`` reads
    ``spark.read.format('iceberg').load(name)`` against the session catalog);
    the sandbox has no iceberg-spark-runtime jar, so parquet files with the
    identical schema stand in — switching is config-only.
    """
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(name)
    return spark.read.parquet(table_path(sf_dir, name))
