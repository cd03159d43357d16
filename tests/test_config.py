"""Config loader (O6) + count logging (S6) parity tests."""

from __future__ import annotations

import logging

from gcp_food_delivery_data_pipeline_spark.config import (
    apply_conf,
    get_conf,
    load_conf,
    log_counts,
)


def test_load_conf_reference_semantics(tmp_path):
    p = tmp_path / "conf.conf"
    p.write_text(
        "# comment line\n"
        "\n"
        "PROJECT_ID = my-project\n"
        "BQ_DATASET=food_orders\n"
        "URL=http://x/a=b=c\n"          # split on FIRST '=' only
        "  SPACED  =  padded value  \n"
    )
    conf = load_conf(str(p))
    assert conf == {
        "PROJECT_ID": "my-project",
        "BQ_DATASET": "food_orders",
        "URL": "http://x/a=b=c",
        "SPACED": "padded value",
    }


def test_apply_and_get_conf(spark, tmp_path):
    p = tmp_path / "conf.conf"
    p.write_text("PROJECT_ID=demo\nVERSION=v2\n")
    apply_conf(spark, load_conf(str(p)))
    assert get_conf(spark, "PROJECT_ID") == "demo"
    assert get_conf(spark, "VERSION") == "v2"
    assert get_conf(spark, "MISSING", "fallback") == "fallback"


def test_log_counts_exact_reference_strings(caplog):
    with caplog.at_level(logging.INFO, logger="gcp_food_delivery_data_pipeline_spark"):
        log_counts(891, 869, 22)
    messages = [r.message for r in caplog.records]
    # byte-exact shapes from reference code/beam.py:144,153,161
    assert "Total records: 891" in messages
    assert "Delivered records: 869" in messages
    assert "Other status records: 22" in messages
