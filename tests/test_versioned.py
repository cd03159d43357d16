"""Snapshot-versioned table tests: publish/read/history/vacuum, the
atomic-pointer contract, and snapshot isolation for concurrent readers."""

from __future__ import annotations

import pytest

from gcp_food_delivery_data_pipeline_spark.sources import versioned as V


@pytest.fixture()
def root(tmp_path) -> str:
    return str(tmp_path / "vt")


def _df(spark, n, mult):
    return spark.range(n).selectExpr("id", f"id * {mult} as v")


def test_write_read_latest_and_history(spark, root):
    assert V.latest_version(spark, root) is None
    assert V.write_snapshot(spark, _df(spark, 5, 10), root) == 1
    assert V.write_snapshot(spark, _df(spark, 8, 20), root) == 2
    assert V.latest_version(spark, root) == 2
    assert V.read_snapshot(spark, root).count() == 8
    assert V.read_snapshot(spark, root, 1).count() == 5
    assert V.history(spark, root) == [1, 2]


def test_read_before_first_publish_raises(spark, root):
    with pytest.raises(FileNotFoundError):
        V.read_snapshot(spark, root)


def test_old_reader_survives_new_publish(spark, root):
    """Snapshot isolation: a DataFrame resolved against v1 still reads
    v1's files after v2 publishes (immutable directories)."""
    V.write_snapshot(spark, _df(spark, 5, 10), root)
    old_reader = V.read_snapshot(spark, root)  # resolves v=1 paths now
    V.write_snapshot(spark, _df(spark, 9, 20), root)
    assert old_reader.count() == 5  # unchanged by the publish
    assert V.read_snapshot(spark, root).count() == 9


def test_failed_write_leaves_pointer_untouched(spark, root):
    V.write_snapshot(spark, _df(spark, 5, 10), root)
    # simulate a crash AFTER data write, BEFORE publish: an orphan dir
    _df(spark, 3, 1).write.parquet(f"{root}/v=2")
    assert V.latest_version(spark, root) == 1  # pointer never moved
    assert V.read_snapshot(spark, root).count() == 5
    # vacuum sweeps the orphan (newer than the pointer)
    assert V.vacuum(spark, root, keep_last=2) == [2]
    assert V.history(spark, root) == [1]
    # and the next real write replays version 2 cleanly
    assert V.write_snapshot(spark, _df(spark, 7, 2), root) == 2


def test_vacuum_retention_and_guard(spark, root):
    for n in (3, 4, 5, 6):
        V.write_snapshot(spark, _df(spark, n, 1), root)
    assert V.vacuum(spark, root, keep_last=2) == [1, 2]
    assert V.history(spark, root) == [3, 4]
    assert V.read_snapshot(spark, root, 3).count() == 5
    with pytest.raises(ValueError):
        V.vacuum(spark, root, keep_last=0)


def test_vacuum_on_empty_root_is_noop(spark, root):
    assert V.vacuum(spark, root) == []
    assert V.history(spark, root) == []


def test_snapshot_diff_classifies_all_changes(spark, root):
    df1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        ["id", "name", "v"],
    )
    df2 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (4, None, 40.0), (5, "e", 50.0)],
        ["id", "name", "v"],
    )
    V.write_snapshot(spark, df1, root)
    V.write_snapshot(spark, df2, root)
    got = {
        r.id: r.change
        for r in V.snapshot_diff(spark, root, 1, 2, ["id"]).collect()
    }
    assert got == {
        1: "unchanged",
        2: "update",
        3: "delete",
        4: "unchanged",  # NULL payload equal via null-safe struct compare
        5: "insert",
    }


def test_snapshot_diff_rejects_schema_drift(spark, root):
    V.write_snapshot(spark, spark.range(2).selectExpr("id", "id as a"), root)
    V.write_snapshot(spark, spark.range(2).selectExpr("id", "id as b"), root)
    with pytest.raises(ValueError):
        V.snapshot_diff(spark, root, 1, 2, ["id"])
