"""Rollup-merge tests: batch-wise partial aggregation must equal the
direct full-scan answer (the mergeable-monoid contract), coarse-grain
re-aggregation must work from fine-grain state, and HLL sketch unions
over a partition of the data must equal the one-shot sketch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_food_delivery_data_pipeline_spark.operators.rollup import (
    build_distinct_sketches,
    build_rollup,
    merge_rollups,
    rollup_distinct_sketches,
    with_avg,
)
from gcp_food_delivery_data_pipeline_spark.sources.readers import load_table
from tests.conftest import SF_DIR

KEYS = ["event_type", "day"]
MEASURES = {
    "n_events": ("count", ""),
    "sum_value": ("sum", "value"),
    "min_value": ("min", "value"),
    "max_value": ("max", "value"),
}


@pytest.fixture(scope="module")
def events(spark):
    return (
        load_table(spark, SF_DIR, "events")
        .withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .cache()
    )


def _rows(df):
    return {
        (r.event_type, r.day): (
            r.n_events,
            round(r.sum_value, 2),
            r.min_value,
            r.max_value,
        )
        for r in df.collect()
    }


def test_merged_batches_equal_direct_rollup(events):
    direct = build_rollup(events, KEYS, MEASURES)
    batches = [
        build_rollup(
            events.filter(F.pmod(F.col("event_id"), F.lit(4)) == i),
            KEYS,
            MEASURES,
        )
        for i in range(4)
    ]
    merged = merge_rollups(batches, KEYS, MEASURES)
    assert _rows(merged) == _rows(direct)


def test_fine_grain_rolls_up_to_coarse(events):
    fine = build_rollup(events, KEYS, MEASURES)
    coarse_from_fine = merge_rollups([fine], ["event_type"], MEASURES)
    coarse_direct = build_rollup(events, ["event_type"], MEASURES)
    a = {
        r.event_type: (r.n_events, round(r.sum_value, 2))
        for r in coarse_from_fine.collect()
    }
    b = {
        r.event_type: (r.n_events, round(r.sum_value, 2))
        for r in coarse_direct.collect()
    }
    assert a == b


def test_with_avg_derives_from_state(spark):
    r = spark.createDataFrame(
        [("a", 4, 10.0)], "k string, n long, s double"
    )
    out = with_avg(r, "avg", "s", "n").collect()[0]
    assert out.avg == 2.5


def test_unmergeable_measure_rejected(events):
    with pytest.raises(ValueError, match="not mergeable"):
        build_rollup(events, KEYS, {"bad": ("avg", "value")})


def test_sketch_union_of_split_equals_whole(events):
    """HLL registers are max-based, so sketches over any partition of
    the rows union to EXACTLY the one-shot sketch's estimate."""
    whole = rollup_distinct_sketches(
        build_distinct_sketches(events, ["event_type"], "user_id"),
        ["event_type"],
    )
    split_daily = build_distinct_sketches(events, KEYS, "user_id")
    unioned = rollup_distinct_sketches(split_daily, ["event_type"])
    a = {r.event_type: r.n_distinct_est for r in whole.collect()}
    b = {r.event_type: r.n_distinct_est for r in unioned.collect()}
    assert a == b


def test_sketch_estimate_near_exact(events):
    est = rollup_distinct_sketches(
        build_distinct_sketches(events, KEYS, "user_id"), ["event_type"]
    )
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n")
    )
    joined = est.join(exact, "event_type").collect()
    assert joined
    for r in joined:
        assert abs(r.n_distinct_est - r.n) <= 0.15 * r.n


def test_countmin_never_underestimates_and_bounds(spark):
    """CMS invariants on a hand-built skewed frame: est >= exact for
    every key, the heaviest key's estimate is exact when its buckets
    are collision-free, and output is top-k by exact count."""
    from gcp_food_delivery_data_pipeline_spark.operators.rollup import (
        countmin_profile,
    )

    rows = [(1,)] * 50 + [(2,)] * 30 + [(i,) for i in range(3, 23)]
    df = spark.createDataFrame(rows, ["user_id"])
    out = countmin_profile(df, key_col="user_id", d=4, w=64, k=5).collect()
    assert len(out) == 5
    assert [r.user_id for r in out][:2] == [1, 2]
    for r in out:
        assert r.est_ok and r.n_est >= r.n_exact
    total = len(rows)
    # CMS bound: overestimate <= total additional mass in the bucket
    for r in out:
        assert r.n_est <= total


def test_kmv_overlap_exact_below_k_and_estimates(spark):
    """With n < k the sketch IS the set: union_est == union_exact and
    jaccard_kmv == jaccard_exact for every pair; with k clamped tiny
    the estimator still lands within its ~1/sqrt(k) band on a
    structured overlap."""
    from gcp_food_delivery_data_pipeline_spark.operators.rollup import (
        kmv_overlap,
    )

    rows = (
        [("a", i) for i in range(40)]
        + [("b", i) for i in range(20, 60)]   # |a ∩ b| = 20, |a ∪ b| = 60
        + [("c", i) for i in range(100, 110)]  # disjoint from a and b
    )
    df = spark.createDataFrame(rows, ["grp", "item"])
    out = {
        (r.g_a, r.g_b): r
        for r in kmv_overlap(df, "grp", "item", k=128).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = out[("a", "b")]
    assert ab.union_exact == 60 and ab.inter_exact == 20
    assert ab.union_est == 60  # n < k: sketch is exact
    assert ab.jaccard_kmv == ab.jaccard_exact
    ac = out[("a", "c")]
    assert ac.inter_exact == 0 and ac.jaccard_kmv == 0.0
    # k smaller than the sets: estimator path engages
    small = {
        (r.g_a, r.g_b): r
        for r in kmv_overlap(df, "grp", "item", k=16).collect()
    }
    ab16 = small[("a", "b")]
    assert 0 < ab16.jaccard_kmv < 1
    # |union|=60, k=16 -> sigma ~ 60/4; allow 3 sigma
    assert abs(ab16.union_est - 60) <= 45


def test_kmv_overlap_rejects_tiny_k(spark):
    import pytest

    from gcp_food_delivery_data_pipeline_spark.operators.rollup import (
        kmv_overlap,
    )

    df = spark.createDataFrame([("a", 1)], ["grp", "item"])
    with pytest.raises(ValueError, match="k must be >= 2"):
        kmv_overlap(df, "grp", "item", k=1)
