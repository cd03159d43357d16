"""Grouping-sets lattice and sketch-accuracy tests."""

from __future__ import annotations

from gcp_food_delivery_data_pipeline_spark.plans.analytics import (
    q_approx_users,
    q_cube_events,
    q_distinct_users,
)
from gcp_food_delivery_data_pipeline_spark.sources.readers import load_table
from tests.conftest import SF_DIR


def test_cube_contains_all_lattice_levels(spark):
    ev = load_table(spark, SF_DIR, "events")
    rows = q_cube_events(ev).collect()
    total = ev.count()
    # grand total cell (both NULL)
    grand = [r for r in rows if r.event_type is None and r.day is None]
    assert len(grand) == 1 and grand[0].n_events == total
    # per-type subtotals sum to the grand total
    per_type = [r for r in rows if r.event_type is not None and r.day is None]
    assert sum(r.n_events for r in per_type) == total
    # per-day subtotals sum to the grand total
    per_day = [r for r in rows if r.event_type is None and r.day is not None]
    assert sum(r.n_events for r in per_day) == total
    # leaf cells sum to the grand total
    leaves = [r for r in rows if r.event_type is not None and r.day is not None]
    assert sum(r.n_events for r in leaves) == total


def test_approx_users_within_rsd(spark):
    ev = load_table(spark, SF_DIR, "events")
    exact = {r.event_type: r.n_users for r in q_distinct_users(ev).collect()}
    approx = {
        r.event_type: r.approx_users for r in q_approx_users(ev, 0.05).collect()
    }
    assert set(exact) == set(approx)
    for et, n in exact.items():
        assert abs(approx[et] - n) / n <= 0.15  # 3× the configured rsd
