"""Small plan utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Guarantee at least defaultParallelism * min_factor partitions
    before a compute-heavy (pandas-UDF) stage.

    Why: parquet scans split by spark.sql.files.maxPartitionBytes,
    so a small-but-expensive input (10k compressed HTML pages ~ 30 MB)
    can arrive as ONE partition and the whole extract/parse stage runs
    on one core no matter how many executors exist. At real
    Common-Crawl scale inputs have thousands of splits and this is a
    no-op; locally it is the difference between using 1 core and all of
    them. (Round-robin repartition: no key needed, pure fan-out.)

    min_factor=1 on purpose: the repartition is a FULL shuffle of the
    input (for a text corpus, hundreds of MB serialized both ways), so
    it must fire only when cores would otherwise sit idle — not to buy
    straggler slack. Round-5 scaling finding: the old 2x target made
    this a no-op at local[2] (scan gave 5 >= 4 partitions) but a
    full-corpus shuffle at local[8] (10 < 16) — the extra CPU halved
    measured 2->8 scaling efficiency. Straggler balance comes from the
    scan split size instead (spark.sql.files.maxPartitionBytes=32m in
    get_spark), which adds parallelism without moving a byte."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
