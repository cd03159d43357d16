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
    # Cache-release hygiene gate (VERDICT r14 next #7): release()
    # never raises by contract, but every failure lands in this ring —
    # a suite that exercised every release path and left entries here
    # means an unpersist is silently failing and the per-round cache
    # leak is back. Tests that INJECT failures (the monkeypatch test)
    # clean up after themselves, so a non-empty ring at teardown is a
    # real regression, seen the round it starts.
    from gcp_food_delivery_data_pipeline_spark.checkpointing import (
        RELEASE_FAILURES,
    )

    leftover = list(RELEASE_FAILURES)
    s.stop()
    assert not leftover, (
        "checkpointing.release() failed during the suite (cache-leak "
        f"risk): {leftover}"
    )


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
