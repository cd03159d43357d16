"""M4 food-orders analytics over the typed projection of the fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_food_delivery_data_pipeline_spark.operators.clean import (
    clean_orders,
    typed_orders,
)
from gcp_food_delivery_data_pipeline_spark.plans.analytics import (
    food_item_popularity,
    food_mode_share,
    food_ratings_by_status,
    food_restaurant_summary,
)
from gcp_food_delivery_data_pipeline_spark.sources.readers import read_orders_csv
from tests.fixtures import N_TOTAL


@pytest.fixture(scope="module")
def typed(spark, food_csv):
    return typed_orders(clean_orders(read_orders_csv(spark, food_csv))).cache()


def test_restaurant_summary(typed):
    rows = {r.restaurant: r for r in food_restaurant_summary(typed).collect()}
    bm = rows["brussels mussels "]  # trailing space survives cleaning
    assert bm.n_orders == 2
    assert float(bm.revenue) == 75.0     # 21 + 54
    assert bm.avg_rating == 5.0
    assert rows["tokyo table"].n_orders == 2  # one delivered, one on hold


def test_mode_share_sums_to_one(typed):
    rows = food_mode_share(typed).collect()
    assert sum(r.n_orders for r in rows) == N_TOTAL
    assert abs(sum(r.share for r in rows) - 1.0) < 0.01


def test_item_popularity_explodes_packed_items(typed):
    top = food_item_popularity(typed, k=50).collect()
    counts = {r.item: r.n_orders for r in top}
    # 'waterzooi' appears in a multi-item order AND alone
    assert counts["waterzooi"] == 2
    assert counts["pizza"] == 1
    assert "" not in counts


def test_ratings_pivot_shape(typed):
    piv = food_ratings_by_status(typed)
    assert set(piv.columns) == {"status", "1", "2", "3", "4", "5"}
    row = {r.status: r for r in piv.collect()}
    assert row["delivered"]["5"] == 4   # four 5-star delivered orders
    assert row["on hold"]["2"] == 1


def test_part_pairs_golden(spark):
    """3 orders: parts (1,2,3), (1,2), (1,2) -> pair (1,2) co-occurs
    3x; lift checks the independence normalization."""
    from gcp_food_delivery_data_pipeline_spark.plans.analytics import (
        q_part_pairs,
    )

    rows = [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (3, 1), (3, 2)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = q_part_pairs(li, k=10).collect()
    top = got[0]
    assert (top.part_a, top.part_b, top.n_both) == (1, 2, 3)
    # lift(1,2) = n_both * N / (n_1 * n_2) = 3*3/(3*3) = 1.0
    assert top.lift == 1.0
    # (1,3) and (2,3): 1 * 3 / (3 * 1) = 1.0
    rest = {(r.part_a, r.part_b): (r.n_both, r.lift) for r in got[1:]}
    assert rest == {(1, 3): (1, 1.0), (2, 3): (1, 1.0)}


def test_revenue_trend_recovers_planted_line(spark):
    """Planted y = 3x + 100 (exact): slope/intercept recovered
    exactly, r2 = 1."""
    from datetime import datetime

    from gcp_food_delivery_data_pipeline_spark.plans.analytics import (
        q_revenue_trend,
    )

    rows = [
        (i, "1-URGENT", datetime(1990, 1, 1 + i), 100.0 + 3.0 * i)
        for i in range(10)
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderpriority string, "
        "o_orderdate timestamp, o_totalprice double",
    )
    got = q_revenue_trend(orders).collect()[0]
    assert got.slope == 3.0
    assert got.intercept == 100.0
    assert got.r2 == 1.0
    assert got.n_orders == 10
