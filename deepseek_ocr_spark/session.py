"""SparkSession factory tuned for the extraction workload.

Local mode stands in for a multi-executor cluster (north_rule): the same
configs — AQE, shuffle partition sizing, Arrow batching — are the ones a
1000-executor deployment would set via spark-submit. Parallelism is a
parameter so the bench harness can run the identical job at two levels
(local[8] vs local[32]) to evidence scaling efficiency.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    parallelism: int | None = None,
    app_name: str = "deepseek-ocr-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    parallelism: cores for local[N]; defaults to $SPARK_GRAFT_CPUS or all.
    shuffle_partitions: defaults to 2x cores — small enough that sf0.1
        partitions stay well under executor memory, large enough for AQE
        to coalesce rather than split.
    """
    cpus = parallelism or int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    shuffle = shuffle_partitions or max(8, 2 * cpus)
    # glibc malloc tunables for the PYTHON WORKERS (they inherit the
    # JVM's env, which inherits this process's): pin the mmap threshold
    # at its 32 MB cap and raise the trim threshold so the numpy kernel
    # slabs (operators/dedup.py `_buf`) are served from the reused heap
    # instead of per-call mmap/munmap — 32 workers churning big mmaps
    # put the box at 94% system time (TLB shootdowns; same class of
    # pathology as the JVM AlwaysPreTouch note below). On a cluster,
    # ship these via spark.executorEnv.MALLOC_MMAP_THRESHOLD_ etc.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "33554432")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "134217728")
    # pyarrow's bundled jemalloc/mimalloc pools decay dirty pages back
    # to the OS (madvise/munmap churn per Arrow batch); the system pool
    # obeys the glibc tunables above and reuses pages.
    os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime partition coalescing + skew-join splitting. At
        # cluster scale this is what absorbs Zipf-skewed hosts without
        # hand-tuned partition counts.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        # Arrow: the JVM<->Python boundary for every pandas UDF. Large
        # batches amortize serialization; extraction UDFs are string-heavy
        # so 10k rows/batch keeps memory bounded.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Nested-schema pruning so a projection of spans.kind doesn't
        # read spans.text from parquet.
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "12g"))
        # Measured JVM hygiene (see BENCH.md "JVM notes"):
        # - 1g code cache + flushing: the extraction expression trees
        #   generate very large codegen classes; the default 240m cache
        #   fills after a few distinct plans, silently disabling the JIT
        #   (2-25x slowdowns).
        # - fixed pre-touched heap + throughput GC: a growing/shrinking
        #   heap spends whole cores in kernel page-fault storms at 32
        #   threads (observed sys-time 9x user-time); -Xms=-Xmx +
        #   AlwaysPreTouch commits pages once.
        # On a cluster the same flags go in executor.extraJavaOptions.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing "
            "-XX:+UseParallelGC -Xms"
            + os.environ.get("SPARK_DRIVER_MEMORY", "12g")
            + " -XX:+AlwaysPreTouch",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
