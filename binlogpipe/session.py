"""SparkSession factory with the pipeline's scale-oriented defaults.

Local mode here; on a real cluster the same config ships via
``spark-submit --py-files`` with master/executor settings from the
submitter. AQE handles runtime skew-join splitting and shuffle coalescing
on top of the router's explicit salting (SURVEY §4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_spark(app: str = "binlogpipe", cores: int | None = None,
                shuffle_partitions: int | None = None,
                extra_conf: dict[str, str] | None = None) -> SparkSession:
    """`extra_conf` entries are applied LAST (override the defaults) —
    the A/B harnesses use it to flip one conf (e.g.
    spark.io.compression.codec) between otherwise-identical sessions."""
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(2 * cores, 32)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        # Spark 4: pandas-UDF eval batches are governed by THIS knob, which
        # defaults to 100 rows — every UDF was paying per-batch Python
        # overhead 200x more often than intended. The Arrow knob above only
        # bounds createDataFrame/toPandas and mapInPandas/mapInArrow.
        .config("spark.sql.execution.python.udf.maxRecordsPerBatch", "20000")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # 10g: large heaps measured multi-second G1 pauses under Arrow +
        # parquet churn; smaller heap keeps pauses short and stable
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "10g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
