"""SparkSession construction tuned for the engine.

All relational optimization is delegated to Catalyst + AQE (SURVEY.md §4):
predicate pushdown, column pruning, join reordering and dynamic join
selection, skew handling, and partition coalescing are enabled here once
and apply to every operator in the package.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Session timezone is pinned to UTC so TIMESTAMP semantics match the
# reference's UTC-aware ``get_utc_now`` (gcpde/base.py:6-8) and so results
# hash identically to a DuckDB oracle (naive-UTC timestamps).
_BASE_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime re-planning — dynamic join selection, skew-join
    # splitting, and post-shuffle partition coalescing. At 100 TB this is
    # what turns a static 'shuffle.partitions' guess into right-sized tasks.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Keep Spark's default parallelismFirst=true for partition
    # coalescing: with `false`, AQE shrinks any shuffle under the 64 MB
    # advisory size to 1-2 partitions, serializing every window sort and
    # merge-join on a box with 32 idle cores (measured at sf1:
    # sessionize 3.0 s -> 0.8 s, window lag 1.7 s -> 0.4 s after the
    # revert). At cluster scale the coalesce result is still bounded by
    # the advisory size and initialPartitionNum, so `true` only raises
    # the parallelism floor — it does not fragment large shuffles.
    # Arrow for any pandas boundary (toPandas, pandas_udf, applyInPandas).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The driver testdata 'events' table stores TIMESTAMP(NANOS) which the
    # vectorized Parquet reader rejects; read nanos as raw int64 and let
    # the catalog layer (gcpde_spark.catalog) convert to timestamp_ntz.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # The dataset file-name contract contains ':' (…T00:00.jsonl,
    # gcpde/gcs.py:82-83). The default local FS is a ChecksumFileSystem
    # whose ".{name}.crc" sidecar Path construction rejects colons
    # (HADOOP-14217) — executors reading such files throw URISyntaxException.
    # RawLocalFileSystem skips sidecars and handles colons fine; remote
    # schemes (hdfs://, gs://) are unaffected by this conf.
    "spark.hadoop.fs.file.impl": "org.apache.hadoop.fs.RawLocalFileSystem",
}


def build_session(
    app_name: str = "gcpde_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``);
    on a real cluster pass the cluster master / rely on spark-submit.
    ``shuffle_partitions`` defaults to the local core count — at cluster
    scale leave AQE's coalescing to right-size reducers instead.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    builder = SparkSession.builder.master(master).appName(app_name)
    confs = dict(_BASE_CONFS)
    confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    # Local mode = single JVM; give it headroom but leave room for Python
    # workers (Arrow UDFs fork python processes).
    if master.startswith("local") and "spark.driver.memory" not in (extra_confs or {}):
        confs["spark.driver.memory"] = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
    if master.startswith("local") and "spark.driver.extraJavaOptions" not in (
        extra_confs or {}
    ):
        # Throughput collector for the single-JVM local mode: the bench
        # workload is a batch of short queries where G1's pause-target
        # bookkeeping costs ~7% wall-clock (measured round 4). Cluster
        # deployments set their own executor GC flags.
        # SPARK_GRAFT_JAVA_OPTS appends extra flags for A/B experiments
        # (JVM options are process-static, so runtime conf.set can't
        # reach them — a fresh process per arm is the only honest A/B).
        opts = "-XX:+UseParallelGC"
        extra = os.environ.get("SPARK_GRAFT_JAVA_OPTS")
        if extra:
            opts = f"{opts} {extra}"
        confs["spark.driver.extraJavaOptions"] = opts
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
