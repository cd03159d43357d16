"""As-of and range join tests with hand-computed golden matches, plus
SimHash fingerprint properties."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from gcp_food_delivery_data_pipeline_spark.operators.dedup import (
    hamming_distance,
    with_simhash,
)
from gcp_food_delivery_data_pipeline_spark.operators.joins import (
    asof_join_backward,
    range_join_within,
)


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 10:00:05")),
            (2, "A", _ts("2024-01-01 10:00:10")),
            (3, "B", _ts("2024-01-01 10:00:03")),
            (4, "B", _ts("2024-01-01 09:59:00")),  # before any quote
        ],
        ["trade_id", "sym", "ts"],
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 100.0),
            ("A", _ts("2024-01-01 10:00:07"), 101.0),
            ("A", _ts("2024-01-01 10:00:10"), 102.0),  # exact tie with trade 2
            ("B", _ts("2024-01-01 10:00:01"), 50.0),
        ],
        ["sym", "ts", "price"],
    )
    return trades, quotes


def test_asof_backward_golden(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join_backward(
        trades, quotes, on="ts", by="sym", right_value_cols=["price"]
    )
    got = {r.trade_id: r.price_matched for r in out.collect()}
    assert got[1] == 100.0   # latest quote ≤ 10:00:05
    assert got[2] == 102.0   # tie at 10:00:10 → inclusive (≤)
    assert got[3] == 50.0
    assert got[4] is None    # no quote before 09:59
    assert out.count() == trades.count()  # left-join cardinality


def test_asof_null_value_in_matched_row_stays_null(spark):
    """The matched row is carried atomically: when the as-of quote has
    a NULL price, the output must NOT stitch an older row's price onto
    the newer row's timestamp (pandas merge_asof / DuckDB ASOF
    semantics — regression for the per-column ignorenulls carry)."""
    trades = spark.createDataFrame(
        [(1, "A", _ts("2024-01-01 10:00:30"))], ["trade_id", "sym", "ts"]
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 100.0),
            ("A", _ts("2024-01-01 10:00:20"), None),
        ],
        ["sym", "ts", "price"],
    )
    row = asof_join_backward(
        trades, quotes, on="ts", by="sym", right_value_cols=["price"]
    ).collect()[0]
    assert row.ts_matched == _ts("2024-01-01 10:00:20")
    assert row.price_matched is None


def test_range_join_golden(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 10:00:00"))], ["lid", "key", "ts"]
    )
    right = spark.createDataFrame(
        [
            (10, "u", _ts("2024-01-01 09:59:30")),   # -30s → in
            (11, "u", _ts("2024-01-01 10:00:45")),   # +45s → in
            (12, "u", _ts("2024-01-01 10:01:01")),   # +61s → out
            (13, "v", _ts("2024-01-01 10:00:00")),   # other key → out
        ],
        ["rid", "key", "ts"],
    )
    out = range_join_within(left, right, on="ts", by="key", window_seconds=60)
    assert sorted(r.r_rid for r in out.collect()) == [10, 11]


def test_range_join_no_duplicate_pairs(spark):
    """A pair within the window must appear exactly once despite the
    3-bucket explode."""
    left = spark.createDataFrame(
        [(i, "k", _ts(f"2024-01-01 10:00:{i:02d}")) for i in range(10)],
        ["lid", "key", "ts"],
    )
    out = range_join_within(left, left, on="ts", by="key", window_seconds=60)
    # 10×10 pairs all within 60s — every pair exactly once
    assert out.count() == 100
    assert out.dropDuplicates(["l_lid", "r_lid"]).count() == 100


def test_simhash_near_texts_close_in_hamming(spark):
    base = (
        "the quick brown fox jumps over the lazy dog near the quiet river "
        "bank while autumn leaves drift slowly past the wooden bridge"
    )
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base + " today"),           # near-dup
            (3, "completely different words about database engines"),
        ],
        ["doc_id", "text"],
    )
    fp = with_simhash(df)
    rows = {r.doc_id: r.simhash for r in fp.collect()}
    d12 = df.sparkSession.createDataFrame(
        [(rows[1], rows[2]), (rows[1], rows[3])], ["a", "b"]
    ).select(hamming_distance("a", "b").alias("d")).collect()
    near, far = d12[0]["d"], d12[1]["d"]
    assert near < far
    assert near <= 6        # near-dup flips few of 32 bits
    assert rows[1] != rows[3]


def test_asof_forward_and_nearest_golden(spark):
    from gcp_food_delivery_data_pipeline_spark.operators.joins import asof_join

    trades = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 10:00:10")),   # between quotes
            (2, "A", _ts("2024-01-01 10:00:20")),   # exactly at q2
            (3, "A", _ts("2024-01-01 10:00:40")),   # after last quote
            (4, "B", _ts("2024-01-01 10:00:00")),   # no quotes at all
        ],
        ["trade_id", "sym", "ts"],
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 100.0),
            ("A", _ts("2024-01-01 10:00:20"), 200.0),
        ],
        ["sym", "ts", "price"],
    )

    fwd = {
        r.trade_id: (r.ts_matched, r.price_matched)
        for r in asof_join(
            trades, quotes, "ts", "sym", ["price"], direction="forward"
        ).collect()
    }
    assert fwd[1] == (_ts("2024-01-01 10:00:20"), 200.0)   # next quote
    assert fwd[2] == (_ts("2024-01-01 10:00:20"), 200.0)   # inclusive tie
    assert fwd[3] == (None, None)                          # nothing ahead
    assert fwd[4] == (None, None)

    near = {
        r.trade_id: (r.ts_matched, r.price_matched)
        for r in asof_join(
            trades, quotes, "ts", "sym", ["price"], direction="nearest"
        ).collect()
    }
    assert near[1] == (_ts("2024-01-01 10:00:00"), 100.0)  # 10s back < 10s fwd? tie -> backward
    assert near[2] == (_ts("2024-01-01 10:00:20"), 200.0)  # exact hit
    assert near[3] == (_ts("2024-01-01 10:00:20"), 200.0)  # only backward exists
    assert near[4] == (None, None)


def test_asof_nearest_prefers_closer_forward(spark):
    from gcp_food_delivery_data_pipeline_spark.operators.joins import asof_join

    trades = spark.createDataFrame(
        [(1, "A", _ts("2024-01-01 10:00:25"))], ["trade_id", "sym", "ts"]
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 100.0),   # 25s back
            ("A", _ts("2024-01-01 10:00:30"), 300.0),   # 5s forward
        ],
        ["sym", "ts", "price"],
    )
    row = asof_join(
        trades, quotes, "ts", "sym", ["price"], direction="nearest"
    ).collect()[0]
    assert row.price_matched == 300.0


def test_interval_overlap_pairs_golden(spark):
    """Three entities: A [0,10], B [5,15] overlap 5; C [20,30] is
    disjoint; touching-at-an-instant counts (B [5,15] x D [15,18]
    overlap 0). Bucketing (tiny bucket to force multi-bucket spans)
    must not duplicate pairs."""
    from gcp_food_delivery_data_pipeline_spark.operators.joins import (
        interval_overlap_pairs,
    )

    iv = spark.createDataFrame(
        [("A", 0, 10), ("B", 5, 15), ("C", 20, 30), ("D", 15, 18)],
        "ent string, start_us long, end_us long",
    )
    got = {
        (r.ent_a, r.ent_b): r.overlap_us
        for r in interval_overlap_pairs(
            iv, entity_col="ent", bucket_us=3
        ).collect()
    }
    assert got == {("A", "B"): 5, ("B", "D"): 0}


def test_interval_overlap_same_entity_excluded(spark):
    from gcp_food_delivery_data_pipeline_spark.operators.joins import (
        interval_overlap_pairs,
    )

    iv = spark.createDataFrame(
        [("A", 0, 10), ("A", 5, 15)],
        "ent string, start_us long, end_us long",
    )
    assert interval_overlap_pairs(iv, entity_col="ent").count() == 0


def test_interval_overlap_identical_rows_stay_distinct(spark):
    """Bag semantics: two byte-identical interval rows (same entity,
    bounds, payload) are DISTINCT intervals — each pairs with the
    partner, yielding two rows, exactly like a plain SQL inequality
    join. The old distinct()-based dedup collapsed them to one."""
    from gcp_food_delivery_data_pipeline_spark.operators.joins import (
        interval_overlap_pairs,
    )

    iv = spark.createDataFrame(
        [("A", 0, 10, "p"), ("A", 0, 10, "p"), ("B", 5, 15, "q")],
        "ent string, start_us long, end_us long, tag string",
    )
    rows = interval_overlap_pairs(
        iv, entity_col="ent", bucket_us=3, payload_cols=["tag"]
    ).collect()
    assert len(rows) == 2
    assert all((r.ent_a, r.ent_b, r.overlap_us) == ("A", "B", 5) for r in rows)
    # multi-bucket shared span (buckets 1..5 shared) still emits each
    # copy exactly once — the overlap-start-bucket rule, not distinct.
    assert all(r.tag_a == "p" and r.tag_b == "q" for r in rows)


def test_interval_overlap_bucket_width_is_result_invariant(spark):
    """Bucketing is an execution strategy: any width gives the same
    pair set as the inequality-join definition."""
    from gcp_food_delivery_data_pipeline_spark.operators.joins import (
        interval_overlap_pairs,
    )

    iv = spark.createDataFrame(
        [("A", 0, 100), ("B", 50, 60), ("C", 99, 200), ("D", 300, 400)],
        "ent string, start_us long, end_us long",
    )
    expect = {("A", "B"), ("A", "C")}
    for width in (1, 7, 1000):
        got = {
            (r.ent_a, r.ent_b)
            for r in interval_overlap_pairs(
                iv, entity_col="ent", bucket_us=width
            ).collect()
        }
        assert got == expect, width
