"""Scale-engineering operators: bucketed co-located joins and salted
skew joins.

At 100 TB the two dominant shuffle pathologies are (1) re-shuffling the
same fact table for every key-equal join, and (2) a handful of hot keys
serializing one reducer. These helpers encode the standard cures:

* ``write_bucketed`` / ``bucketed_join`` — persist both sides bucketed
  (and sorted) by the join key: Spark's SortMergeJoin then reads the
  co-located buckets directly, with NO Exchange on either side
  (asserted in tests via the physical plan).
* ``salted_join`` — explode the small side's hot keys into R salted
  replicas and scatter the big side's rows across them: the hot key's
  rows spread over R reducers instead of one. AQE's skew-join handles
  moderate skew automatically (session.py enables it); explicit salting
  is for the extreme tail where one key exceeds a single executor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_food_delivery_data_pipeline_spark.functions.lits import dense_lit


def ensure_min_partitions(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Guarantee at least ``min_parts`` partitions (default: the
    cluster's default parallelism) before a per-row-heavy stage.

    Small parquet files arrive as ONE input split (file size <
    ``files.maxPartitionBytes``), which silently serializes expression-
    heavy stages — minhashing, all-pairs cosine, Arrow feature
    extraction — onto a single core no matter how wide the cluster is.
    At real scale the input already has >= min_parts splits and this is
    an exact no-op (no shuffle); the round-robin repartition only fires
    on narrow inputs, where shuffling them is negligible by definition.
    """
    spark = df.sparkSession
    if min_parts is None:
        min_parts = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= min_parts:
        return df
    return df.repartition(min_parts)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    num_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (+sorted) managed table.

    Both sides of a recurring join bucketed by the same key with the
    same bucket count join WITHOUT a shuffle — the one-time write cost
    amortizes over every subsequent join/aggregation on that key.

    Overwrite is made idempotent ACROSS sessions: a managed table's
    directory can survive in the warehouse after its catalog entry is
    gone (new session, dropped metastore), and ``saveAsTable`` then
    fails with LOCATION_ALREADY_EXISTS rather than overwriting — so
    any uncataloged leftover location is removed first. That cleanup
    only applies to UNQUALIFIED names in the default database: the
    <warehouse>/<name> path convention does not hold for `db.table`
    (or catalog-qualified) names, and deleting it for one would nuke
    an unrelated directory — so qualified names are rejected, and the
    path is only deleted when no cataloged table still owns it (the
    DROP above removed this table's own entry, so any remaining owner
    is an unrelated external table).
    """
    if "." in table:
        raise ValueError(
            "write_bucketed: qualified table names are not supported "
            f"(got {table!r}); the leftover-location cleanup assumes "
            "<warehouse>/<name> which only holds for unqualified "
            "names in the default database"
        )
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir")
    jvm = spark.sparkContext._jvm
    loc = jvm.org.apache.hadoop.fs.Path(wh, table.lower())
    loc_path = loc.toUri().getPath()
    # Never delete a directory some OTHER cataloged table still points
    # at (this table's own entry is already dropped above): a stray
    # external table registered over <warehouse>/<name> must survive —
    # wherever it is cataloged, so scan EVERY database, and compare
    # normalized absolute URI paths (exact equality, not endswith: a
    # suffix match would both miss scheme-differing duplicates and
    # spuriously refuse unrelated paths like .../other_<name>).
    target = loc_path.rstrip("/")
    for db in spark.catalog.listDatabases():
        try:
            db_tables = spark.catalog.listTables(db.name)
        except Exception:  # noqa: BLE001 — db dropped concurrently
            continue
        for t in db_tables:
            qual = f"`{t.database or db.name}`.`{t.name}`"
            try:
                rows = spark.sql(
                    f"DESCRIBE TABLE EXTENDED {qual}"
                ).collect()
            except Exception:  # noqa: BLE001 — concurrent drop; skip
                continue
            t_loc = next(
                (
                    str(r.data_type)
                    for r in rows
                    if r.col_name == "Location"
                ),
                "",
            )
            if not t_loc:
                continue
            t_path = (
                jvm.org.apache.hadoop.fs.Path(t_loc)
                .toUri()
                .getPath()
                .rstrip("/")
            )
            if t_path == target:
                raise ValueError(
                    f"write_bucketed: refusing to overwrite {loc_path}:"
                    f" it is the location of cataloged table {qual}"
                )
    fs = loc.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if fs.exists(loc):
        fs.delete(loc, True)
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_key)
    if sort:
        writer = writer.sortBy(bucket_key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-key bucketed tables (shuffle-free SortMergeJoin)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side scattered over ``salt`` sub-keys.

    The small side replicates ``salt``× (explode — bounded, it's the
    small side); the big side picks ONE pseudo-random salt per row via
    a hash of the whole row (deterministic, no rand()). Each (key,
    salt) bucket then holds ~1/salt of a hot key's rows. Results are
    identical to the plain join (verified in tests) — but ONLY for
    join types where an unmatched small-side row produces no output:
    under right/full outer each of the ``salt`` unmatched replicas of
    a small-side row would surface as its own null-padded output row,
    so those types are rejected.
    """
    how_norm = how.lower().replace("_", "")
    if how_norm not in {"inner", "left", "leftouter", "leftsemi", "leftanti", "cross"}:
        raise ValueError(
            f"salted_join: how={how!r} is not salt-safe — unmatched "
            f"small-side salt replicas would each emit an output row; "
            f"use inner/left/left_semi/left_anti, or AQE skew-join for "
            f"outer joins"
        )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    big_salt = F.pmod(
        F.hash(*[F.col(c) for c in big.columns]), F.lit(salt)
    )
    salted_big = big.withColumn("_salt", big_salt)
    return salted_big.join(salted_small, [on, "_salt"], how).drop("_salt")


def zorder_key(*cols: Column | str, bits: int = 16) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    column — bit ``j`` of column ``i`` lands at position ``j*n + i``.

    Rows close in z-value are close in EVERY interleaved dimension, so
    range-partitioning by z gives each output file a tight bounding box
    in all dims at once — parquet min/max stats then prune scans on any
    of them, where a lexicographic sort only prunes the leading column.
    Pure integer Column arithmetic (shift/and/or): whole-stage codegen,
    no UDF. The disjoint bit positions mean OR == addition, which is
    what lets the DuckDB oracle restate it as a sum.

    Columns must be non-negative integers; only the low ``bits`` bits
    participate (callers bucket/hash wider domains first).
    """
    exprs = [
        F.col(c).cast("long") if isinstance(c, str) else c.cast("long")
        for c in cols
    ]
    n = len(exprs)
    if n * bits > 63:
        raise ValueError(
            f"zorder_key: {n} cols x {bits} bits needs {n * bits} bit "
            f"positions; a signed long holds 63 — bit 63 flips the "
            f"sign (breaking range ordering) and higher positions wrap "
            f"(breaking bijectivity). Lower bits to "
            f"{63 // n} or fewer."
        )
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i, e in enumerate(exprs):
            bit = F.shiftright(e, j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * n + i))
    return z


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    num_partitions: int = 32,
    bits: int = 16,
    key_col: str = "_zkey",
) -> DataFrame:
    """Re-cluster for multi-column data skipping: range-partition +
    sort by the Morton key, so each written file covers a small
    hyper-rectangle of the key space. ``repartitionByRange`` samples
    the key distribution for balanced split points (one shuffle —
    the one-time layout cost that every later selective scan
    amortizes). The key column is kept (``key_col``) so writers can
    also partition-prune on coarse z-ranges; drop it after writing.
    """
    keyed = df.withColumn(key_col, zorder_key(*cols, bits=bits))
    return keyed.repartitionByRange(
        num_partitions, F.col(key_col)
    ).sortWithinPartitions(key_col)


def key_skew_report(
    df: DataFrame, key: str, top_n: int = 10
) -> DataFrame:
    """Heavy-hitter diagnosis for a prospective join/agg key: top-N
    keys by row count with their share of the table.

    One partial-aggregable shuffle on the key; the grand total rides
    along as a broadcast scalar (no second pass over the data, no
    global window). Reading: share ~ 1/num_partitions for one key
    means that key serializes a reducer — reach for ``salted_join`` /
    AQE skew handling before running the real job.
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            key,
            "n_rows",
            F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
        )
        .orderBy(F.col("n_rows").desc(), F.col(key))
        .limit(top_n)
    )


def hilbert_key(
    xcol: Column | str, ycol: Column | str, bits: int = 8
) -> Column:
    """Hilbert-curve key for two non-negative integer columns (low
    ``bits`` bits participate): the space-filling layout that beats
    Z-order for range scans — Hilbert never makes the long diagonal
    jumps Morton interleave does, so consecutive key ranges map to
    CONTIGUOUS grid tiles and each written file's min/max bounding box
    is tighter for the same file size.

    The classic per-level rotate-and-accumulate loop (Hilbert curve
    via gray-code quadrant walk) is expressed as ONE ``aggregate``
    fold over the level array with a struct (x, y, d) accumulator —
    the single-lambda plan shape (see similarity._pq_book_dists):
    the rotation logic compiles once and evaluates per level, instead
    of ``bits`` levels of substituted when-trees growing ~3x per
    level. All-integer arithmetic; the oracle reproduces the SAME
    recurrence as a recursive CTE (DuckDB's list_reduce mis-evaluates
    struct-state folds — verify SKILL gotcha — so the SQL twin
    unrolls via recursion instead).
    """
    if bits < 1 or 2 * bits > 62:
        raise ValueError(
            f"hilbert_key: bits must be in [1, 31], got {bits}"
        )
    x0 = (F.col(xcol) if isinstance(xcol, str) else xcol).cast("long")
    y0 = (F.col(ycol) if isinstance(ycol, str) else ycol).cast("long")
    levels = F.array(
        *[F.lit(1 << k).cast("long") for k in range(bits - 1, -1, -1)]
    )
    init = F.struct(
        x0.alias("x"), y0.alias("y"), F.lit(0).cast("long").alias("d")
    )

    def step(acc: Column, s: Column) -> Column:
        rx = F.when(acc["x"].bitwiseAND(s) > 0, F.lit(1)).otherwise(
            F.lit(0)
        ).cast("long")
        ry = F.when(acc["y"].bitwiseAND(s) > 0, F.lit(1)).otherwise(
            F.lit(0)
        ).cast("long")
        d2 = acc["d"] + s * s * (rx * 3).bitwiseXOR(ry)
        # quadrant rotation: reflect when (ry=0, rx=1), then swap x/y
        # whenever ry=0 — the gray-code walk's frame adjustment
        xr = F.when(
            (ry == 0) & (rx == 1), s - 1 - acc["x"]
        ).otherwise(acc["x"])
        yr = F.when(
            (ry == 0) & (rx == 1), s - 1 - acc["y"]
        ).otherwise(acc["y"])
        return F.struct(
            F.when(ry == 0, yr).otherwise(xr).alias("x"),
            F.when(ry == 0, xr).otherwise(yr).alias("y"),
            d2.alias("d"),
        )

    return F.aggregate(levels, init, step)["d"]


def bloom_bitmap(
    build: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    n_hashes: int = 3,
) -> list[int]:
    """Build a Bloom filter over the distinct keys of ``build`` and
    return it as ``m_bits / 64`` little-endian long words — the
    driver-sized artifact (8 KiB at the default m) that
    ``bloom_semijoin`` embeds into the probe plan as literals.

    This is the runtime-filter pattern Spark itself applies to
    broadcast joins (InjectRuntimeFilter): reduce the build side to a
    constant-size bitmap on the driver, then push the membership test
    into the probe scan so non-matching rows die BEFORE any shuffle.
    The collect here is bounded by m_bits regardless of build-side
    row count — the build side is aggregated to distinct bit
    positions (at most m_bits rows) before anything reaches the
    driver.

    Bit positions use the engine-portable row-salted md5-prefix
    family (salt r in [0, n_hashes)), so any engine derives the
    identical bitmap and the identical pass/fail per probe key.
    """
    if m_bits % 64:
        raise ValueError(
            f"bloom_bitmap: m_bits must be a multiple of 64, got {m_bits}"
        )
    if n_hashes < 1:
        raise ValueError(
            f"bloom_bitmap: need at least one hash, got {n_hashes}"
        )
    pos_cols = [
        _bloom_pos(key_col, r, m_bits) for r in range(n_hashes)
    ]
    positions = (
        build.select(
            F.explode(F.array(*pos_cols)).alias("_pos")
        )
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for row in positions:
        p = row["_pos"]
        words[p // 64] |= 1 << (p % 64)
    # fold into signed-64 range so the literals round-trip any engine
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def _bloom_pos(key_col: str, salt: int, m_bits: int) -> Column:
    """Bit position of ``key_col`` under hash row ``salt`` — the same
    md5-prefix family as ``countmin_profile``/``kmv_overlap``.

    Defined as conv(substring(md5, 1, 8), 16, 10) % m_bits. For a
    power-of-two ``m_bits = 2^b`` (every caller in-tree) that value is
    just the LOW b BITS of the 8-hex-digit prefix, i.e. the value of
    its last ceil(b/4) digits — so only those digits are parsed
    (r16, guide §1.2 step 2: the probe evaluates this n_hashes times
    per row; position-identity vs the full parse is pinned in
    tests/test_scale.py). Non-power-of-two widths keep the full
    8-digit parse.
    """
    md = F.md5(
        F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string"))
    )
    if m_bits & (m_bits - 1) == 0:
        b = m_bits.bit_length() - 1
        j = min(8, max(1, -(-b // 4)))  # hex digits covering b bits
        h = F.conv(F.substring(md, 9 - j, j), 16, 10).cast("long")
    else:
        h = F.conv(F.substring(md, 1, 8), 16, 10).cast("long")
    return (h % m_bits).cast("int")


def bloom_semijoin(
    probe: DataFrame,
    build: DataFrame,
    probe_col: str,
    build_col: str,
    m_bits: int = 1 << 16,
    n_hashes: int = 3,
) -> DataFrame:
    """Approximate semi-join: keep the probe rows whose key passes a
    Bloom-filter membership test against the build side's key set —
    a deterministic SUPERSET of the exact semi-join (false positives
    possible at ~(1 - e^{-hn/m})^h, false negatives never).

    The filter rides the plan as ``m_bits/64`` literal long words, so
    the probe side needs ZERO shuffle and ZERO join: the membership
    test is pure whole-stage-codegen bit arithmetic
    (``word[pos / 64] >> (pos % 64)) & 1`` per hash row), exactly the
    shape of an engine's pushed-down runtime filter. At 100 TB this
    is the difference between shuffling the probe table into a join
    and streaming it through a scan-local predicate; the exact join
    (if required) then runs over the pre-filtered survivor stream.
    """
    words = bloom_bitmap(build, build_col, m_bits, n_hashes)
    # m_bits/64 words (1024 at the default) as ONE folded literal —
    # the CreateArray route put a thousand scalar nodes in every
    # analysis pass of the probe plan (functions.lits.dense_lit)
    warr = dense_lit([int(w) for w in words], "array<bigint>")
    # single-bit masks as literals (shiftleft takes only a Python
    # int for the distance, so the variable shift is a lookup)
    masks = [1 << i for i in range(64)]
    masks = [m - (1 << 64) if m >= (1 << 63) else m for m in masks]
    marr = dense_lit(masks, "array<bigint>")
    checks = []
    for r in range(n_hashes):
        pos = _bloom_pos(probe_col, r, m_bits)
        word = F.element_at(warr, F.floor(pos / 64).cast("int") + 1)
        mask = F.element_at(marr, (pos % 64) + 1)
        checks.append(word.bitwiseAND(mask) != 0)
    passed = checks[0]
    for c in checks[1:]:
        passed = passed & c
    return probe.filter(passed)
