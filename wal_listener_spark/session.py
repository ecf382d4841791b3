"""SparkSession factory tuned for the CDC replay workload.

Local-mode analog of the reference's connection bootstrap
(``cmd/wal-listener/init.go:17-63``): where the Go daemon opens pgx
sockets, we open a SparkSession with AQE + Arrow enabled so the decode
UDFs run vectorized and skewed shuffles re-plan at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "wal_listener_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to the local core count — on a real
    cluster this would be sized to ~2-3x total executor cores; the knob is
    explicit so bench can sweep it.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    ncores = _parse_local_cores(master, cpus)
    if shuffle_partitions is None:
        shuffle_partitions = max(ncores, 8)

    # Tungsten execution memory OFF-HEAP (guide §5): the LWW hash
    # aggregation and merge join hold the whole compacted change set in
    # execution memory — on-heap that is multi-GB state surviving many
    # young collections, and the first full-size batch on a cold JVM
    # spends more CPU copying survivors than computing (measured: first
    # rep 1218 JVM-CPU-s vs 137 steady-state on 4.2M events at
    # local[32]; GC log shows 2-3 s young pauses promoting ~6 GB until
    # ParallelGC's adaptive sizing settles). Off-heap pages are invisible
    # to the collector, so per-rep GC work drops to the real garbage.
    # Sized PER CORE (executors on a real cluster get the same
    # per-core memoryOverhead regardless of cluster width); override
    # with WAL_OFFHEAP_PER_CORE_G (0 disables), cap with WAL_OFFHEAP_MAX_G.
    offheap_per_core = float(os.environ.get("WAL_OFFHEAP_PER_CORE_G", "1"))
    offheap_mb = min(
        int(offheap_per_core * ncores * 1024),
        int(float(os.environ.get("WAL_OFFHEAP_MAX_G", "24")) * 1024),
    )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
        # ParallelGC beats G1 ~20% on this batch-throughput workload in
        # local mode (measured on the replay bench); on a real cluster
        # this is an executor JVM flag
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        # Subset co-partitioning for joins (guide §2.4): the lake MERGE
        # joins on (bucket, keys...) with BOTH sides repartitioned on
        # the bucket alone — the designed storage-partitioned layout.
        # With the default (true), Spark 4 refuses to co-partition on a
        # key subset: it rewrote both sides to full-key hash exchanges,
        # adding ONE ENTIRE extra shuffle of the compacted payload per
        # merge (plan-verified: ENSURE_REQUIREMENTS exchange on
        # (bucket, repo, path) above the compaction) and de-clustering
        # the partitioned write (tasks held many buckets -> tasks x
        # buckets output files instead of one per bucket). Subset
        # co-partitioning is exactly what bucketed tables rely on; the
        # bucket count already bounds merge-join parallelism by design.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
    )
    if offheap_mb > 0:
        builder = builder.config(
            "spark.memory.offHeap.enabled", "true"
        ).config("spark.memory.offHeap.size", f"{offheap_mb}m")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _parse_local_cores(master: str, default: int) -> int:
    if master.startswith("local["):
        inner = master[len("local[") : -1]
        if inner == "*":
            return os.cpu_count() or default
        try:
            return int(inner)
        except ValueError:
            return default
    return default
