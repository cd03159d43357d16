"""Scale-ops tests: bucketed joins must be shuffle-free (plan-level
assertion), salted joins must equal plain joins row-for-row."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_food_delivery_data_pipeline_spark.operators.scale import (
    bucketed_join,
    salted_join,
    write_bucketed,
)
from tests.conftest import SF_DIR


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", num_buckets=8)
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", num_buckets=8)
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


@pytest.fixture()
def no_broadcast(spark):
    """Force SortMergeJoin so the bucketed-vs-shuffled contrast shows
    (at test scale Spark would otherwise broadcast the small side)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables, no_broadcast):
    lt, rt = bucketed_tables
    joined = bucketed_join(spark, lt, rt, "o_orderkey")
    plan = _physical_plan(joined)
    # co-located buckets: SortMergeJoin with NO shuffle on either side
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan
    # and the join result is correct
    expected = (
        spark.table(lt).join(spark.table(rt), "o_orderkey").count()
    )
    assert joined.count() == expected > 0


def test_write_bucketed_spares_external_table_in_other_db(spark, tmp_path):
    """Destructive-path safety: an EXTERNAL table registered in a
    DIFFERENT database over <warehouse>/<name> must make
    write_bucketed refuse — the guard scans every database, not just
    the current one, and matches normalized URIs exactly."""
    df = spark.range(10).withColumnRenamed("id", "k")
    wh = spark.conf.get("spark.sql.warehouse.dir")
    jvm = spark.sparkContext._jvm
    loc = jvm.org.apache.hadoop.fs.Path(wh, "b_guarded")
    uri = loc.toUri().toString()
    spark.sql("CREATE DATABASE IF NOT EXISTS guard_db")
    # external table in ANOTHER database squatting on the target path
    df.write.mode("overwrite").parquet(uri)
    spark.sql(
        f"CREATE TABLE guard_db.squatter (k BIGINT) USING parquet "
        f"LOCATION '{uri}'"
    )
    try:
        with pytest.raises(ValueError, match="refusing to overwrite"):
            write_bucketed(df, "b_guarded", "k", num_buckets=4)
        # the squatter's data survived the refusal
        assert spark.table("guard_db.squatter").count() == 10
    finally:
        spark.sql("DROP TABLE IF EXISTS guard_db.squatter")
        spark.sql("DROP DATABASE IF EXISTS guard_db")
        fs = loc.getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration()
        )
        if fs.exists(loc):
            fs.delete(loc, True)


def test_write_bucketed_ignores_suffix_sibling(spark):
    """A table whose path merely ENDS WITH the target's relative path
    (…/other_b_sib vs …/b_sib) must NOT trigger a spurious refusal —
    the old endswith match did."""
    df = spark.range(6).withColumnRenamed("id", "k")
    wh = spark.conf.get("spark.sql.warehouse.dir")
    jvm = spark.sparkContext._jvm
    sib = jvm.org.apache.hadoop.fs.Path(wh, "other_b_sib")
    sib_uri = sib.toUri().toString()
    df.write.mode("overwrite").parquet(sib_uri)
    spark.sql(
        f"CREATE TABLE sib_ext (k BIGINT) USING parquet "
        f"LOCATION '{sib_uri}'"
    )
    try:
        write_bucketed(df, "b_sib", "k", num_buckets=4)
        assert spark.table("b_sib").count() == 6
    finally:
        spark.sql("DROP TABLE IF EXISTS b_sib")
        spark.sql("DROP TABLE IF EXISTS sib_ext")
        fs = sib.getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration()
        )
        if fs.exists(sib):
            fs.delete(sib, True)


def test_unbucketed_join_does_shuffle(spark, no_broadcast):
    """Control: the same join over raw parquet needs an Exchange —
    proving the bucketed assertion above is meaningful."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    joined = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    )
    assert "Exchange" in _physical_plan(joined)


def test_salted_join_equals_plain_join(spark):
    # Skewed big side: 90% of rows share one key.
    big = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias(
            "k"
        ),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim_val")
    )
    plain = big.join(small, "k")
    salted = salted_join(big, small, "k", salt=8)
    assert salted.count() == plain.count()
    a = sorted((r.k, r.payload, r.dim_val) for r in plain.collect())
    b = sorted((r.k, r.payload, r.dim_val) for r in salted.collect())
    assert a == b


def test_salted_join_rejects_right_and_full(spark):
    """right/full would emit each unmatched small-side salt replica as
    its own null-padded row — the operator must refuse, not corrupt."""
    import pytest

    big = spark.range(3).select(F.col("id").alias("k"))
    small = spark.range(3).select(F.col("id").alias("k"))
    for how in ("right", "full", "right_outer", "full_outer"):
        with pytest.raises(ValueError, match="salt-safe"):
            salted_join(big, small, "k", how=how)


def test_salted_join_left_keeps_unmatched_big_rows(spark):
    big = spark.range(4).select(F.col("id").alias("k"))
    small = spark.range(2).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    out = salted_join(big, small, "k", salt=4, how="left")
    assert out.count() == 4  # unmatched big rows appear exactly once
    assert out.filter(F.col("v").isNull()).count() == 2


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must occupy multiple salt buckets."""
    big = spark.range(0, 1000).select(F.lit(7).alias("k"), F.col("id"))
    big_salt = big.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(8))
    )
    n_buckets = big_salt.select("_salt").distinct().count()
    assert n_buckets == 8


def test_zorder_key_interleaves_bits(spark):
    """z(a, b) must equal the hand-computed Morton interleave."""
    from gcp_food_delivery_data_pipeline_spark.operators.scale import (
        zorder_key,
    )

    rows = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)], "a long, b long"
    )
    out = {
        (r.a, r.b): r.z
        for r in rows.select(
            "a", "b", zorder_key("a", "b", bits=8).alias("z")
        ).collect()
    }

    def morton(a: int, b: int) -> int:
        z = 0
        for j in range(8):
            z |= ((a >> j) & 1) << (2 * j)
            z |= ((b >> j) & 1) << (2 * j + 1)
        return z

    assert out == {(a, b): morton(a, b) for (a, b) in out}


def test_cluster_by_zorder_partitions_have_disjoint_ranges(spark):
    """Range-partitioned z-keys: per-partition [min, max] spans must
    not overlap — that disjointness IS the parquet min/max
    data-skipping guarantee after writing."""
    from gcp_food_delivery_data_pipeline_spark.operators.scale import (
        cluster_by_zorder,
    )

    df = (
        spark.range(4096)
        .select(
            F.pmod(F.col("id") * 37, F.lit(256)).alias("x"),
            F.pmod(F.col("id") * 91, F.lit(256)).alias("y"),
        )
    )
    clustered = cluster_by_zorder(df, ["x", "y"], num_partitions=8, bits=8)
    spans = (
        clustered.select(F.spark_partition_id().alias("pid"), "_zkey")
        .groupBy("pid")
        .agg(F.min("_zkey").alias("lo"), F.max("_zkey").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(spans) >= 4
    for prev, cur in zip(spans, spans[1:]):
        assert prev.hi <= cur.lo  # disjoint (boundary key may repeat)


def test_key_skew_report_shares_sum_and_order(spark):
    from gcp_food_delivery_data_pipeline_spark.operators.scale import (
        key_skew_report,
    )

    df = spark.createDataFrame(
        [("a",)] * 70 + [("b",)] * 20 + [("c",)] * 10, "k string"
    )
    rep = key_skew_report(df, "k", top_n=2).collect()
    assert [(r.k, r.n_rows, r.share) for r in rep] == [
        ("a", 70, 0.7),
        ("b", 20, 0.2),
    ]


def test_zorder_written_files_enable_box_skipping(spark, tmp_path):
    """After cluster_by_zorder + write, parquet footer min/max stats
    must localize a small 2-D box to a few files — the actual
    data-skipping payoff. The box [0,32)x[0,32) is 1/64 of the key
    space; Morton clustering maps it to one contiguous z-range, so at
    most a couple of the 16 files can intersect it (a 1-D sort by x
    alone would leave EVERY file intersecting the y-range)."""
    import glob as g

    import pyarrow.parquet as pq

    from gcp_food_delivery_data_pipeline_spark.operators.scale import (
        cluster_by_zorder,
    )

    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"),
        ((F.col("id") / 256).cast("long") % 256).alias("y"),
    )
    out = str(tmp_path / "zclustered")
    cluster_by_zorder(grid, ["x", "y"], num_partitions=16, bits=8).drop(
        "_zkey"
    ).write.parquet(out)

    files = sorted(g.glob(out + "/part-*.parquet"))
    assert len(files) >= 8
    intersecting = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        lo = {"x": 1 << 60, "y": 1 << 60}
        hi = {"x": -1, "y": -1}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name in lo and col.statistics is not None:
                    lo[name] = min(lo[name], col.statistics.min)
                    hi[name] = max(hi[name], col.statistics.max)
        if lo["x"] < 32 and lo["y"] < 32:  # bounding box hits the query box
            intersecting += 1
    assert 1 <= intersecting <= 3, intersecting


def test_zorder_key_rejects_bit_overflow():
    from gcp_food_delivery_data_pipeline_spark.operators.scale import (
        zorder_key,
    )

    with pytest.raises(ValueError, match="63"):
        zorder_key("a", "b", "c", "d", bits=16)  # 64 positions
    zorder_key("a", "b", "c", "d", bits=15)  # 60 positions: fine


def test_hilbert_key_matches_reference_walk(spark):
    """Bit-exact vs the textbook xy2d rotate-and-accumulate loop over
    the FULL 16x16 grid, plus the defining Hilbert property: each
    consecutive key is a grid NEIGHBOR (manhattan distance 1) — the
    locality guarantee Morton interleave lacks."""
    from gcp_food_delivery_data_pipeline_spark.operators.scale import (
        hilbert_key,
    )

    def xy2d(n, x, y):
        rx, ry, d = 0, 0, 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r.x, r.y): r.h
        for r in df.select(
            "x", "y", hilbert_key("x", "y", bits=4).alias("h")
        ).collect()
    }
    assert got == {(x, y): xy2d(16, x, y) for x, y in rows}
    byd = {v: k for k, v in got.items()}
    assert all(
        abs(byd[i][0] - byd[i + 1][0]) + abs(byd[i][1] - byd[i + 1][1]) == 1
        for i in range(255)
    )


def test_hilbert_key_validates_bits(spark):
    import pytest as _pytest

    from gcp_food_delivery_data_pipeline_spark.operators.scale import (
        hilbert_key,
    )

    with _pytest.raises(ValueError, match="bits"):
        hilbert_key("a", "b", bits=0)
    with _pytest.raises(ValueError, match="bits"):
        hilbert_key("a", "b", bits=32)


def test_bloom_semijoin_superset_never_misses(spark):
    """Every true semi-join row survives the Bloom filter (no false
    negatives), survivors are a subset of the probe, and shrinking the
    filter only ever ADDS rows (false positives), never drops one."""
    from gcp_food_delivery_data_pipeline_spark.operators.scale import (
        bloom_semijoin,
    )

    probe = spark.createDataFrame(
        [(i, f"p{i}") for i in range(500)], ["k", "payload"]
    )
    build = spark.createDataFrame(
        [(i,) for i in range(0, 500, 7)], ["bk"]
    )
    exact = {
        r.k
        for r in probe.join(
            build, probe["k"] == build["bk"], "left_semi"
        ).collect()
    }
    got = {
        r.k
        for r in bloom_semijoin(
            probe, build, "k", "bk", m_bits=4096, n_hashes=3
        ).collect()
    }
    assert exact <= got  # no false negatives, ever
    tiny = {
        r.k
        for r in bloom_semijoin(
            probe, build, "k", "bk", m_bits=64, n_hashes=2
        ).collect()
    }
    assert exact <= tiny and got <= tiny  # smaller filter => superset


def test_bloom_semijoin_probe_plan_is_join_free(spark):
    """The membership test rides the probe plan as literal bit
    arithmetic: the physical plan must contain NO join operator —
    that zero-shuffle shape is the entire point of the pattern."""
    from gcp_food_delivery_data_pipeline_spark.operators.scale import (
        bloom_semijoin,
    )

    probe = spark.createDataFrame([(i,) for i in range(100)], ["k"])
    build = spark.createDataFrame([(3,), (5,)], ["bk"])
    out = bloom_semijoin(probe, build, "k", "bk", m_bits=512, n_hashes=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan


def test_bloom_pos_short_parse_matches_full_parse(spark):
    """r16: for power-of-two m_bits, _bloom_pos parses only the hex
    digits that cover the low bits instead of the full 8-digit prefix.
    Pin position-identity against the original full parse across
    several widths (the 192 = non-power-of-two arm keeps the full
    parse by construction)."""
    from pyspark.sql import functions as F

    from gcp_food_delivery_data_pipeline_spark.operators.scale import (
        _bloom_pos,
    )

    def full_parse(key_col, salt, m_bits):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{salt}:"), F.col(key_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        return (h % m_bits).cast("int")

    df = spark.createDataFrame([(i,) for i in range(3000)], ["k"])
    cond = None
    for m_bits in (64, 4096, 1 << 16, 1 << 20, 192):
        for salt in (0, 1, 2):
            c = _bloom_pos("k", salt, m_bits) == full_parse("k", salt, m_bits)
            cond = c if cond is None else (cond & c)
    assert df.filter(~cond).count() == 0


def test_bloom_bitmap_validates_args(spark):
    import pytest

    from gcp_food_delivery_data_pipeline_spark.operators.scale import (
        bloom_bitmap,
    )

    df = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_bitmap(df, "k", m_bits=100)
    with pytest.raises(ValueError, match="at least one hash"):
        bloom_bitmap(df, "k", n_hashes=0)
