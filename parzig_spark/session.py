"""SparkSession factory with the engine's standard configuration.

Local-mode testing (local[N], one JVM) per sandbox; the same settings are the
ones that matter on a multi-executor cluster: AQE for runtime re-planning and
skew-join splitting, Arrow transfer for the pandas-UDF encode/decode kernels,
shuffle partitions sized to parallelism instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "parzig_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "48g",
    arrow_batch_rows: int = 4096,
    task_cpus: int | None = None,
) -> SparkSession:
    cores = cpu_count()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    shuffle_partitions = shuffle_partitions or cores
    if task_cpus is None:
        # Measured on this host: >16 concurrent Arrow/python workers collapse
        # throughput (kernel page-fault serialization under the sandbox VM —
        # sha-over-200MB goes 1.4s@16 → 6.5s@32 workers). Cap concurrent
        # tasks to ≤16 per host via task.cpus; on a real cluster the same
        # knob sizes worker concurrency to memory bandwidth per executor.
        if master.startswith("local-cluster"):
            n = 1  # per-executor cores are small; one task per core
        else:
            try:
                n = int(master.split("[")[1].rstrip("]*")) if "[" in master else cores
            except ValueError:
                n = cores
        task_cpus = int(os.environ.get("SPARK_GRAFT_TASK_CPUS", max(1, -(-n // 16))))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let the planner pick shuffled-hash join when its size conditions
        # hold (guide §3.1/§9): no sort of either side; measured 2.0s ->
        # 1.0s on the lineitem-orders join lane. The planner still guards
        # the build side by size (falls back to sort-merge when a local
        # hash map would not fit), so this stays safe at cluster scale.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # v2 commits task output straight to the destination (one rename
        # per task instead of a serial driver-side per-directory pass at
        # job commit) — measured 2.5s -> 1.3s on the 64-directory LSH index
        # write. The engine's own store commits use parzig's marker
        # protocol, not this committer; index/maintenance parquet writes
        # are build-once artifacts where v2's weaker job atomicity is fine.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        # the parzig Python data source plans its own partition pruning in
        # pushFilters (sources/datasource.py) — default-off in Spark 4.1
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.task.cpus", str(task_cpus))
    )
    if master.startswith("local-cluster"):
        # Multi-process executors (the closest this sandbox gets to real
        # N→4N executors): worker JVMs need the repo on their python path
        # and enough python-worker memory headroom.
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        extra = os.environ.get("PYTHONPATH", "")
        builder = builder.config(
            "spark.executorEnv.PYTHONPATH", repo + (os.pathsep + extra if extra else "")
        ).config(
            # executors request spark.executor.memory, NOT the worker-mem
            # field of the master string (default 1g OOMs real workloads)
            "spark.executor.memory",
            os.environ.get("SPARK_GRAFT_EXECUTOR_MEM", "8g"),
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
