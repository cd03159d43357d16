"""Partitioned append writers (reference S3/S4, SURVEY.md §2.1).

The reference appends to two BigQuery tables with ingestion-time DAY
partitioning (``WriteToBigQuery(..., timePartitioning=DAY)``,
code/beam.py:167-193). Spark equivalent: parquet append partitioned by
an ``ingest_date`` column stamped at load time — note the reference
partitions by LOAD time, not the order's ``date`` column.

Scale notes:
* ``partitionBy('ingest_date')`` gives readers directory-level partition
  pruning for free.
* A 10-minute append cadence produces many small files; ``compact_table``
  is the maintenance path (coalesce rewrite per partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def with_ingest_date(df: DataFrame) -> DataFrame:
    """Stamp the load-time partition column (BQ ingestion-time analog)."""
    return df.withColumn("ingest_date", F.current_date())


def write_status_table(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_col: str = "ingest_date",
) -> None:
    """Append-only, day-partitioned parquet write (S3/S4 semantics)."""
    if partition_col not in df.columns:
        df = with_ingest_date(df)
    df.write.mode(mode).partitionBy(partition_col).parquet(path)


def compact_table(
    spark: SparkSession, path: str, target_files_per_partition: int = 1
) -> None:
    """Rewrite a partitioned table to fewer files per partition.

    Maintenance for the many-tiny-files cadence (one small file per
    10-minute run). Reads, coalesces within partitions, overwrites.
    """
    df = spark.read.parquet(path)
    (
        df.repartition(target_files_per_partition, "ingest_date")
        .write.mode("overwrite")
        .partitionBy("ingest_date")
        .parquet(path + "_compacted")
    )


def ensure_database(spark: SparkSession, name: str) -> None:
    """Reference S5: ``CREATE DATASET IF NOT EXISTS`` (beam.py:141-150)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")
