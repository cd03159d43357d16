"""The GCP connector adapters must degrade with actionable errors when
the jars are absent (they are absent in this container), and pass
local paths through unchanged."""

from __future__ import annotations

import pytest

from gcp_food_delivery_data_pipeline_spark.sources.gcp import (
    bigquery_available,
    read_gcs_csv,
    write_bigquery,
)
from tests.fixtures import write_food_csv


def test_bigquery_probe_is_false_here(spark):
    assert bigquery_available(spark) is False


def test_write_bigquery_raises_actionable(spark):
    df = spark.range(3)
    with pytest.raises(NotImplementedError, match="spark-bigquery-connector"):
        write_bigquery(df, "proj.dataset.table")


def test_read_gcs_csv_gs_path_raises_actionable(spark):
    with pytest.raises(NotImplementedError, match="GCS Hadoop connector"):
        read_gcs_csv(spark, "gs://bucket/food_daily.csv")


def test_read_gcs_csv_local_path_passthrough(spark, tmp_path):
    csv = write_food_csv(str(tmp_path / "food.csv"))
    df = read_gcs_csv(spark, csv)
    assert df.count() > 0 and "customer_id" in df.columns


def test_avro_gate_or_roundtrip(spark):
    """Avro is an external Spark module: when absent the writer/reader
    fail fast naming the exact jar coordinate; when present the
    roundtrip must preserve aggregates (mirrors the BigQuery gate)."""
    import pytest as _pytest

    from gcp_food_delivery_data_pipeline_spark.sources.writers import (
        avro_available,
        read_avro,
        write_avro,
    )

    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    if not avro_available(spark):
        with _pytest.raises(NotImplementedError, match="spark-avro"):
            write_avro(df, "/tmp/avro_gate_probe")
        with _pytest.raises(NotImplementedError, match="spark-avro"):
            read_avro(spark, "/tmp/avro_gate_probe")
    else:
        write_avro(df, "/tmp/avro_gate_probe")
        back = read_avro(spark, "/tmp/avro_gate_probe")
        assert back.agg({"v": "sum"}).collect()[0][0] == 90
