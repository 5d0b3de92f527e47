"""SparkSession factory with the engine's tuned defaults.

The reference's equivalent "session" is its mutable ``Config`` singleton
pair (``globals.py:55-56``) plus a ProcessPoolExecutor
(``ui/gradio_process.py:91-93``); here all knobs are explicit Spark conf
— no mutable global state crosses the driver/executor boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size bounds per-batch memory for giant documents
# (SURVEY.md §7.4-3) while amortizing the JVM↔Python IPC boundary;
# 2048 docs/batch measured ~15% faster than 512 and still keeps a
# median corpus batch ~10 MB.  Lower it for corpora with many
# 10^5-span giants.
ARROW_MAX_RECORDS = 2048


def get_spark(
    cores: int | str | None = None,
    app_name: str = "parserpdf_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a local session.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` then 32.  On a real
    cluster the same conf applies minus ``master`` (spark-submit sets it).
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    cores = str(cores)
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cores) if cores.isdigit() else 32, 8)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.python.worker.reuse", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_MAX_RECORDS)
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # sandbox tables are MB-sized; the 4 MB default open-cost floor
        # would bin-pack them into fewer splits than cores
        .config("spark.sql.files.openCostInBytes", "262144")
        # 4 task waves per core: one straggler then costs 1/4 of a wave,
        # not a whole wave (32 tasks on 32 cores has zero slack)
        .config(
            "spark.sql.files.minPartitionNum",
            str(4 * (int(cores) if cores.isdigit() else 32)),
        )
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
