"""Production GCP connectors (reference S3/S4 real targets), gated.

The reference writes to BigQuery via the Beam BigQuery sink
(reference code/beam.py:167-193) and reads CSVs from GCS
(reference code/beam.py:113-116). In Spark those become the
spark-bigquery-connector and the GCS Hadoop connector — **jars that are
not in this container**, so both paths probe for the connector and
raise a clear, actionable error when absent. The parquet warehouse
(sources/writers.py) is the default target everywhere else in the
engine; these adapters exist so a GCP deployment is a config change,
not a rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

BIGQUERY_FORMAT = "bigquery"
_CONNECTOR_HINT = (
    "spark-bigquery-connector jar not on the classpath; submit with "
    "--packages com.google.cloud.spark:spark-bigquery-with-dependencies_2.13:<version> "
    "(public connector) or write to the parquet warehouse via "
    "sources.writers.write_status_table instead"
)


def bigquery_available(spark: SparkSession) -> bool:
    """True when the spark-bigquery-connector is loadable."""
    try:
        spark._jvm.java.lang.Class.forName(
            "com.google.cloud.spark.bigquery.BigQueryRelationProvider"
        )
        return True
    except Exception:
        return False


def write_bigquery(
    df: DataFrame,
    table: str,
    mode: str = "append",
    partition_field: str | None = "ingest_date",
) -> None:
    """Append to a BigQuery table with time partitioning — the direct
    analog of the reference's WriteToBigQuery(..., timePartitioning=DAY,
    WRITE_APPEND, CREATE_IF_NEEDED)."""
    spark = df.sparkSession
    if not bigquery_available(spark):
        raise NotImplementedError(_CONNECTOR_HINT)
    writer = df.write.format(BIGQUERY_FORMAT).mode(mode)
    if partition_field is not None:
        writer = writer.option("partitionField", partition_field).option(
            "partitionType", "DAY"
        )
    writer.option("createDisposition", "CREATE_IF_NEEDED").save(table)


def read_gcs_csv(spark: SparkSession, gcs_path: str):
    """Read a gs:// CSV through the structured scan. Requires the GCS
    Hadoop connector on the classpath; local paths work unchanged."""
    if gcs_path.startswith("gs://"):
        try:
            spark._jvm.java.lang.Class.forName(
                "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem"
            )
        except Exception as exc:
            raise NotImplementedError(
                "GCS Hadoop connector not on the classpath; submit with "
                "the gcs-connector jar or stage the file locally"
            ) from exc
    from gcp_food_delivery_data_pipeline_spark.sources.readers import read_orders_csv

    return read_orders_csv(spark, gcs_path)
