"""Snapshot-versioned table tests: publish/read/history/vacuum, the
atomic-pointer contract, and snapshot isolation for concurrent readers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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
    # a fresh orphan is indistinguishable from an in-flight write, so
    # the default grace period protects it...
    assert V.vacuum(spark, root, keep_last=2) == []
    assert V.history(spark, root) == [1, 2]
    # ...and an explicit zero grace (no concurrent writers) sweeps it
    assert V.vacuum(spark, root, keep_last=2, orphan_grace_seconds=0) == [2]
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


# ---------------------------------------------------------------------------
# incremental materialized-view maintenance
# ---------------------------------------------------------------------------


def _orders_agg(df):
    return df.groupBy("status").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("amount").alias("total"),
        F.min("amount").alias("lo"),  # NON-monoid under deletes
        F.max("amount").alias("hi"),
    )


@pytest.fixture()
def mv_roots(tmp_path):
    return str(tmp_path / "src"), str(tmp_path / "mv")


def test_matview_full_then_incremental_equals_recompute(spark, mv_roots):
    src, mv = mv_roots
    rows1 = [(i, "open" if i % 2 else "done", float(i)) for i in range(1, 21)]
    df1 = spark.createDataFrame(rows1, ["id", "status", "amount"])
    V.write_snapshot(spark, df1, src)
    mode, n = V.refresh_matview(
        spark, src, mv, ["id"], ["status"], _orders_agg
    )
    assert mode == "full" and n == 2

    # v2: delete the current MAX of 'done' (forces min/max recompute),
    # update one row, insert two new rows in one group
    df2 = (
        df1.filter(F.col("id") != 20)  # delete max(done)=20
        .withColumn(
            "amount",
            F.when(F.col("id") == 3, F.lit(100.0)).otherwise(F.col("amount")),
        )
        .unionByName(
            spark.createDataFrame(
                [(21, "open", 0.5), (22, "open", 99.0)],
                ["id", "status", "amount"],
            )
        )
    )
    V.write_snapshot(spark, df2, src)
    mode, n = V.refresh_matview(
        spark, src, mv, ["id"], ["status"], _orders_agg
    )
    assert mode == "incremental" and n == 2  # both groups touched

    got = {
        r.status: (r.n, r.total, r.lo, r.hi)
        for r in V.read_snapshot(spark, mv).collect()
    }
    want = {
        r.status: (r.n, r.total, r.lo, r.hi)
        for r in _orders_agg(df2).collect()
    }
    assert got == want
    # the deleted row's max is GONE (the delta-folding failure mode)
    assert got["done"][3] == 18.0


def test_matview_untouched_groups_carry_over(spark, mv_roots):
    src, mv = mv_roots
    rows = [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]
    V.write_snapshot(
        spark, spark.createDataFrame(rows, ["id", "status", "amount"]), src
    )
    V.refresh_matview(spark, src, mv, ["id"], ["status"], _orders_agg)
    # v2 touches ONLY group 'a'
    rows2 = [(1, "a", 9.0), (2, "b", 2.0), (3, "c", 3.0)]
    V.write_snapshot(
        spark, spark.createDataFrame(rows2, ["id", "status", "amount"]), src
    )
    mode, n = V.refresh_matview(
        spark, src, mv, ["id"], ["status"], _orders_agg
    )
    assert (mode, n) == ("incremental", 1)  # b and c never recompute
    got = {r.status: r.total for r in V.read_snapshot(spark, mv).collect()}
    assert got == {"a": 9.0, "b": 2.0, "c": 3.0}


def test_matview_noop_when_current(spark, mv_roots):
    src, mv = mv_roots
    V.write_snapshot(
        spark,
        spark.createDataFrame([(1, "a", 1.0)], ["id", "status", "amount"]),
        src,
    )
    V.refresh_matview(spark, src, mv, ["id"], ["status"], _orders_agg)
    assert V.refresh_matview(
        spark, src, mv, ["id"], ["status"], _orders_agg
    ) == ("noop", 0)


def test_matview_group_moves_between_groups(spark, mv_roots):
    """A row whose GROUP value changes must leave its old group and
    join the new one — both groups are affected."""
    src, mv = mv_roots
    V.write_snapshot(
        spark,
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0)], ["id", "status", "amount"]
        ),
        src,
    )
    V.refresh_matview(spark, src, mv, ["id"], ["status"], _orders_agg)
    V.write_snapshot(
        spark,
        spark.createDataFrame(
            [(1, "b", 1.0), (2, "b", 2.0)], ["id", "status", "amount"]
        ),
        src,
    )
    V.refresh_matview(spark, src, mv, ["id"], ["status"], _orders_agg)
    got = {r.status: r.n for r in V.read_snapshot(spark, mv).collect()}
    assert got == {"b": 2}  # group 'a' vanished entirely


def test_matview_null_group_refreshes_and_evicts(spark, mv_roots):
    """NULL is a legitimate group key: an update inside the NULL group
    must re-aggregate it (null-safe semi-join), and the carried MV row
    for it must be evicted rather than duplicated (null-safe
    anti-join). A plain equi-join silently keeps the stale row."""
    src, mv = mv_roots
    schema = "id long, status string, amount double"
    V.write_snapshot(
        spark,
        spark.createDataFrame(
            [(1, None, 1.0), (2, None, 2.0), (3, "a", 3.0)], schema
        ),
        src,
    )
    V.refresh_matview(spark, src, mv, ["id"], ["status"], _orders_agg)
    # update one NULL-group row, delete the other; 'a' untouched
    V.write_snapshot(
        spark,
        spark.createDataFrame([(1, None, 10.0), (3, "a", 3.0)], schema),
        src,
    )
    mode, n = V.refresh_matview(
        spark, src, mv, ["id"], ["status"], _orders_agg
    )
    assert mode == "incremental" and n == 1  # only the NULL group
    rows = V.read_snapshot(spark, mv).collect()
    assert len(rows) == 2  # no stale duplicate of the NULL group
    got = {r.status: (r.n, r.total) for r in rows}
    assert got[None] == (1, 10.0)
    assert got["a"] == (1, 3.0)
