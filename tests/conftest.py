"""Shared pytest fixtures: one session-scoped SparkSession, fixture data."""

from __future__ import annotations

import pytest

from gcp_food_delivery_data_pipeline_spark.session import get_spark
from tests.fixtures import write_food_csv

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="engine-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/engine-tests-warehouse"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def spark_global(spark):
    """Session-scoped alias for hypothesis @given tests (hypothesis
    forbids function-scoped fixtures, session scope is fine)."""
    return spark


@pytest.fixture(scope="session")
def food_csv(tmp_path_factory) -> str:
    """Synthetic food_daily-shaped CSV per FIXTURES.md §1 (NOT copied
    from the reference's data file)."""
    path = tmp_path_factory.mktemp("food") / "food_daily_fixture.csv"
    write_food_csv(str(path))
    return str(path)
