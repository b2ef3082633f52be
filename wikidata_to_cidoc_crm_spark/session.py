"""SparkSession construction tuned for the KG-construction workload.

Local mode is the sandbox proxy for a multi-executor cluster: shuffle
partitions scale with cores, AQE handles skew/coalesce at runtime, Arrow is
on for the pandas-UDF linking stage. On a real cluster the same builder is
used via ``spark-submit --py-files`` (see ``pipeline.py`` main).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_cores() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "wikidata_to_cidoc_crm_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores=None`` → ``local[$SPARK_GRAFT_CPUS]`` (default 32).
    ``shuffle_partitions`` defaults to the core count — at cluster scale this
    is instead sized as ~2-3x total executor cores (and AQE coalesces).
    ``master`` overrides the local-mode default — used by the scaling bench
    to run ``local-cluster[N,cores,mem]``, which spawns SEPARATE executor
    JVMs (driver-isolated, the faithful N→4N-executor protocol). In that
    mode executor-side Python workers need the package on their path, so
    PYTHONPATH and the python executable are propagated.
    """
    import sys

    cores = cores or default_cores()
    shuffle = shuffle_partitions or cores
    builder = (
        SparkSession.builder.master(master or f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if master and master.startswith("local-cluster"):
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        builder = (
            builder
            .config("spark.executorEnv.PYTHONPATH", repo_root)
            .config("spark.pyspark.python", sys.executable)
            .config("spark.executor.memory",
                    os.environ.get("SPARK_GRAFT_EXEC_MEM", "10g"))
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
