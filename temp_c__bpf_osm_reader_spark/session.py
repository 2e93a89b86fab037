"""SparkSession factory with the engine's scale-oriented defaults.

Local-mode testing stands in for the multi-executor cluster (no cluster in
this sandbox); every config below is chosen to also be the right default at
1000-executor scale — AQE on (runtime re-plan + skew-join splitting), Arrow
transfer for the pandas-UDF stages, shuffle partitions sized to parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "spark-spatial-tiles",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Python workers must be able to import this package regardless of the
    # driver's CWD: workers inherit PYTHONPATH through the JVM, so export the
    # package root before the JVM starts. (spark-submit --py-files covers the
    # zip case; this covers plain `python` drivers launched elsewhere.)
    # only meaningful pre-JVM (workers read PYTHONPATH at launch) and only
    # when the package lives in a real directory (spark-submit --py-files
    # ships the zip itself)
    # Allocator hygiene, exported pre-JVM so executors' Python workers
    # inherit it (workers are children of the JVM): this host's first-touch
    # page faults are ~10x slow AND kernel-serialized, so any hot path that
    # frees-and-refaults large buffers scales at ~0.5 across cores (measured:
    # repeated 240MB numpy reallocation 1→4 cores = 0.50 efficiency; with
    # these settings = 0.99 and 35% faster absolute). Keep glibc from
    # mmap/munmap-ing large blocks (reuse warm heap pages instead) and route
    # Arrow through malloc so the same policy covers pyarrow buffers.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(16 << 30))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(16 << 30))
    os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if os.path.isdir(pkg_root):
        pp = os.environ.get("PYTHONPATH", "")
        if pkg_root not in pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                pkg_root + (os.pathsep + pp if pp else "")
            )
    if shuffle_partitions is None:
        # ~2× task slots: enough granularity for AQE to coalesce, not so many
        # that small stages drown in scheduling overhead
        shuffle_partitions = max(cores * 2, 8)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # deterministic float aggregation order is NOT assumed anywhere;
        # outputs that feed golden checks round/sort explicitly instead
        .config("spark.sql.parquet.compression.codec", "snappy")
        # Python Data Source V2 filter pushdown (osmxml shard pruning)
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    # ad-hoc tuning hook: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" (bench experiments)
    for kv in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";"):
        if "=" in kv:
            k, _, v = kv.partition("=")
            b = b.config(k.strip(), v.strip())
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
