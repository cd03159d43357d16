"""Event-time streaming tests: watermarked windowed agg equals the
batch rollup on a replayed directory; stateful per-user totals
accumulate across micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_food_delivery_data_pipeline_spark.plans.analytics import q_events_hourly
from gcp_food_delivery_data_pipeline_spark.sources.readers import load_table
from gcp_food_delivery_data_pipeline_spark.streaming.events import (
    run_events_hourly_stream,
    run_user_totals_stream,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events replayed as 3 parquet files (3 micro-batches)."""
    out = str(tmp_path_factory.mktemp("events_stream") / "events")
    ev = load_table(spark, SF_DIR, "events")
    ev.withColumn("_split", F.col("event_id") % 3).repartition(
        3, "_split"
    ).drop("_split").write.mode("overwrite").parquet(out)
    return out


def test_stream_hourly_rollup_matches_batch(spark, events_dir, tmp_path):
    q = run_events_hourly_stream(
        spark,
        events_dir,
        str(tmp_path / "ckpt"),
        query_name="t_events_hourly",
    )
    q.awaitTermination(180)

    streamed = {
        (r.hour, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM t_events_hourly").collect()
    }
    batch = {
        (r.hour, r.event_type): (r.n_events, r.sum_value)
        for r in q_events_hourly(spark.read.parquet(events_dir)).collect()
    }
    assert streamed == batch


def test_stateful_user_totals_accumulate(spark, events_dir, tmp_path):
    q = run_user_totals_stream(
        spark,
        events_dir,
        str(tmp_path / "ckpt"),
        query_name="t_user_totals",
    )
    q.awaitTermination(180)

    # update-mode memory sink: one row per user per micro-batch; the
    # running count is monotone, so max(n_events) is the final state
    # (robust to collect order).
    rows = spark.sql("SELECT * FROM t_user_totals").collect()
    final: dict[int, tuple[int, float]] = {}
    for r in rows:
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, r.sum_value)

    ev = spark.read.parquet(events_dir)
    expected = {
        r.user_id: (r.n, round(r.s, 2))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert {u: v[0] for u, v in final.items()} == {
        u: v[0] for u, v in expected.items()
    }
    for u in expected:
        assert abs(final[u][1] - expected[u][1]) < 0.05
