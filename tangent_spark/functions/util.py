"""Small plan utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Guarantee at least defaultParallelism * min_factor partitions
    before a compute-heavy (pandas-UDF) stage.

    Why: parquet scans split by spark.sql.files.maxPartitionBytes
    (128 MB), so a small-but-expensive input (10k compressed HTML pages
    ~ 30 MB) arrives as ONE partition and the whole extract/parse stage
    runs on one core no matter how many executors exist. At real
    Common-Crawl scale inputs have thousands of splits and this is a
    no-op; locally it is the difference between using 1 core and all of
    them. (Round-robin repartition: no key needed, pure fan-out.)"""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
