"""Readers (reference S1/S2, SURVEY.md §2.1).

The reference reads the CSV as raw text lines and goes structured only
at the sink (code/beam.py:113-116). We go structured AT THE SCAN —
named columns + explicit schema — so Catalyst can prune columns and push
predicates into the reader. A raw-line mode is kept for byte-fidelity
experiments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gcp_food_delivery_data_pipeline_spark.schema import RAW_SCHEMA


def read_orders_csv(spark: SparkSession, path: str) -> DataFrame:
    """Structured scan of a food-orders CSV (header skipped, 11 string cols).

    ``mode=PERMISSIVE`` maps short rows to trailing NULLs; the cleaning
    step's malformed-row guard then reproduces the reference's drop
    (code/beam.py:50-51). An explicit schema (never inferSchema) keeps
    the scan single-pass and the types deterministic.
    """
    return (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("encoding", "UTF-8")
        .schema(RAW_SCHEMA)
        .csv(path)
    )


def read_orders_text(spark: SparkSession, path: str) -> DataFrame:
    """Raw-fidelity mode: the file as lines (reference ReadFromText)."""
    return spark.read.text(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the driver's parquet tables from a scale-factor dir."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, names: list[str]) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
