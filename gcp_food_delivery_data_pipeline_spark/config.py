"""Config loader + run-count logging (reference O6 + S6 parity).

O6: the reference DAG reads a ``key=value`` conf file, skipping blanks
and ``#`` comments, splitting on the FIRST ``=`` only
(reference code/airflow_pipe.py:23-38). Same semantics here, plus an
optional push into the session conf under ``spark.foodpipeline.*`` so
executors and ``foreachBatch`` closures can read it.

S6: the reference logs the three run counts via ``logging.info`` with
fixed message shapes (reference code/beam.py:140-162). ``log_counts``
reproduces those exact strings so log-scraping parity holds.
"""

from __future__ import annotations

import logging

from pyspark.sql import SparkSession

logger = logging.getLogger("gcp_food_delivery_data_pipeline_spark")

CONF_PREFIX = "spark.foodpipeline."


def load_conf(path: str) -> dict[str, str]:
    """Parse a ``key=value`` conf file (reference semantics: strip
    whitespace, skip blank/comment lines, split on first ``=``)."""
    config: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                key, value = line.split("=", 1)
                config[key.strip()] = value.strip()
    return config


def apply_conf(spark: SparkSession, config: dict[str, str]) -> None:
    """Publish config under ``spark.foodpipeline.*`` runtime conf."""
    for key, value in config.items():
        spark.conf.set(CONF_PREFIX + key, value)


def get_conf(spark: SparkSession, key: str, default: str | None = None) -> str | None:
    """Read one engine config key back from the session conf."""
    return spark.conf.get(CONF_PREFIX + key, default)


def log_counts(total: int, delivered: int, other: int) -> None:
    """S6 parity: the reference's exact count log lines
    (code/beam.py:144,153,161)."""
    logger.info(f"Total records: {total}")
    logger.info(f"Delivered records: {delivered}")
    logger.info(f"Other status records: {other}")
