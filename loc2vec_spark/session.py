"""SparkSession factory with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(master: str | None = None, app_name: str = "loc2vec_spark",
              shuffle_partitions: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build a SparkSession.

    Defaults follow SURVEY.md §4.3: AQE on (runtime coalesce + skew-join
    split), Arrow on (all Python crossings are vectorized), shuffle
    partitions sized to cores (not the 200 default, which over-partitions
    local runs and under-partitions clusters — on a real cluster set
    2-4x total cores via spark-submit conf).
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[*]"
    if shuffle_partitions is None:
        cores = os.cpu_count() or 8
        if master.startswith("local["):
            inner = master[len("local["):-1]
            if inner != "*":
                cores = int(inner)
        shuffle_partitions = max(8, cores)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
