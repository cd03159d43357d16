"""Snapshot-versioned parquet tables with time-travel reads.

The transactional-lakehouse core idea (Delta/Iceberg) reduced to its
two essentials, with no new file format: IMMUTABLE snapshot
directories plus an ATOMICALLY-SWAPPED pointer file.

Layout::

    <root>/v=1/…parquet       immutable snapshot directories
    <root>/v=2/…parquet
    <root>/_latest            one line: the published version number

Guarantees (the ones a 100 TB pipeline actually leans on):

* **Snapshot isolation for readers**: a reader that resolved the
  pointer to v=N keeps reading v=N's immutable files even while a
  writer publishes v=N+1 — no torn reads, no partial-overwrite window
  (the failure mode of ``mode("overwrite")`` on a live table).
* **Atomic publish**: the pointer is written to a temp file and
  renamed into place — a metadata-atomic operation on HDFS/local
  filesystems. A crash mid-write leaves an unpublished orphan
  directory, never a corrupt table; ``vacuum`` sweeps orphans.
* **Time travel**: ``read_snapshot(root, version=N)`` reproduces any
  retained historical state — the audit/rollback/repro primitive.

On S3-like object stores rename is not atomic — that is precisely the
gap the real table formats fill with conditional PUTs / a log store;
the reference's BigQuery sink gets this from BigQuery itself
(SURVEY.md §2.1 S3/S4). This module is the self-hosted equivalent for
filesystem-backed deployments, and the docstring-level contract maps
1:1 onto a Delta/Iceberg swap-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_POINTER = "_latest"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _read_int_file(spark: SparkSession, path: str) -> int | None:
    fs, jvm = _fs(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        raw = bytes(
            stream.readAllBytes()
        )  # tiny file: the version number line
    finally:
        stream.close()
    return int(raw.decode("ascii").strip())


def _write_int_file(spark: SparkSession, path: str, n: int) -> None:
    """Atomic publish of a small integer file: PER-WRITER tmp + an
    OVERWRITING rename (``FileContext.rename(…, Rename.OVERWRITE)``) —
    one metadata op, so no reader can ever observe a missing pointer.
    The tmp name carries pid+uuid: a SHARED tmp would let two
    concurrent writers truncate each other's half-written pointer and
    publish garbage. ``FileSystem.rename`` cannot overwrite;
    delete-then-rename opens exactly the window the module contract
    forbids — it survives only as the fallback for stores whose
    connector has no AbstractFileSystem binding (FileContext
    unavailable), where the window is documented, not denied."""
    import os
    import uuid

    fs, jvm = _fs(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(
        f"{path}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    )
    dst = jvm.org.apache.hadoop.fs.Path(path)
    out = fs.create(tmp, True)
    try:
        out.write(f"{n}\n".encode("ascii"))
    finally:
        out.close()
    try:
        ctx = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            fs.getUri(), spark._jsc.hadoopConfiguration()
        )
        ren_cls = jvm.org.apache.hadoop.fs.Options.Rename
        opts = spark.sparkContext._gateway.new_array(ren_cls, 1)
        opts[0] = ren_cls.OVERWRITE
        ctx.rename(tmp, dst, opts)  # varargs -> explicit Java array
    except Exception:  # noqa: BLE001 — scheme without FileContext
        if fs.exists(dst):
            fs.delete(dst, False)
        if not fs.rename(tmp, dst):
            raise IOError(f"cannot publish pointer file {path}")


def _read_pointer(spark: SparkSession, root: str) -> int | None:
    return _read_int_file(spark, f"{root}/{_POINTER}")


def latest_version(spark: SparkSession, root: str) -> int | None:
    """Currently-published snapshot version (None before first write)."""
    return _read_pointer(spark, root)


def write_snapshot(spark: SparkSession, df: DataFrame, root: str) -> int:
    """Materialize ``df`` as the next snapshot and publish it.

    The data lands in ``v=<N+1>/`` FIRST; only after that write fully
    succeeds does the pointer swap (tmp + rename). Readers of the old
    version are never disturbed; a crash before the rename leaves the
    new directory unpublished (invisible) for ``vacuum`` to sweep.
    """
    n = (_read_pointer(spark, root) or 0) + 1
    df.write.mode("error").parquet(f"{root}/v={n}")
    _write_int_file(spark, f"{root}/{_POINTER}", n)
    return n


def read_snapshot(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read the published snapshot (or an explicit historical one)."""
    v = version if version is not None else _read_pointer(spark, root)
    if v is None:
        raise FileNotFoundError(f"read_snapshot: no published version in {root}")
    return spark.read.parquet(f"{root}/v={v}")


def history(spark: SparkSession, root: str) -> list[int]:
    """All snapshot versions present on disk (published or orphaned),
    ascending."""
    fs, jvm = _fs(spark, root)
    jroot = jvm.org.apache.hadoop.fs.Path(root)
    if not fs.exists(jroot):
        return []
    out = []
    for st in fs.listStatus(jroot):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("v="):
            out.append(int(name[2:]))
    return sorted(out)


def vacuum(
    spark: SparkSession,
    root: str,
    keep_last: int = 2,
    orphan_grace_seconds: int = 3600,
) -> list[int]:
    """Delete snapshots older than the ``keep_last`` most recent
    PUBLISHED versions, plus orphan directories newer than the pointer
    (failed writes). Returns the versions removed. Never touches the
    published version itself.

    An in-flight ``write_snapshot`` (data written, pointer not yet
    swapped) is indistinguishable from a crashed one by shape alone,
    so orphans are only reclaimed once their directory has been
    untouched for ``orphan_grace_seconds`` (default 1 h, mirroring the
    scratch-dir mtime cutoff) — a concurrent vacuum can then never
    delete the v=N+1 a live writer is about to publish. Pass 0 to
    reclaim immediately when no writer can be running.

    "Now" is derived from the FILESYSTEM's clock, not the driver's:
    a freshly-touched probe file's mtime is compared against the
    orphan's mtime, so both timestamps come from the same clock and
    a skewed object-store clock cannot shrink the grace window (the
    failure mode of comparing driver ``time.time()`` to remote
    mtimes). Falls back to the driver clock only if the probe cannot
    be written.
    """
    import time as _time

    if keep_last < 1:
        raise ValueError("vacuum: keep_last must be >= 1")
    latest = _read_pointer(spark, root)
    if latest is None:
        return []
    fs, jvm = _fs(spark, root)
    try:
        probe = jvm.org.apache.hadoop.fs.Path(f"{root}/_vacuum_probe")
        fs.create(probe, True).close()
        now_ms = float(fs.getFileStatus(probe).getModificationTime())
        fs.delete(probe, False)
    except Exception:  # noqa: BLE001 — read-only FS: driver clock
        now_ms = _time.time() * 1000.0
    removed = []
    for v in history(spark, root):
        path = jvm.org.apache.hadoop.fs.Path(f"{root}/v={v}")
        orphan = v > latest
        if orphan and orphan_grace_seconds > 0:
            age_ms = now_ms - fs.getFileStatus(path).getModificationTime()
            if age_ms < orphan_grace_seconds * 1000.0:
                continue  # possibly a live write — skip this pass
        expired = v <= latest - keep_last
        if orphan or expired:
            fs.delete(path, True)
            removed.append(v)
    return removed


def snapshot_diff(
    spark: SparkSession,
    root: str,
    v_old: int,
    v_new: int,
    key_cols: list[str],
) -> DataFrame:
    """Change data feed DERIVED from two snapshots: per key, whether
    the row was inserted / deleted / updated / unchanged between
    ``v_old`` and ``v_new`` — the audit/debug/compaction-safety
    companion of time travel (Delta's CDF computed after the fact).

    One full-outer join on the key columns; non-key columns compare as
    a null-safe struct equality (a single codegen comparison per row,
    no per-column fan-out). Returns key columns + ``change``.

    Scale shape: the join shuffles both snapshots once on the key —
    the minimum for any diff; partition-pruned reads apply when the
    snapshots are partitioned.
    """
    old = read_snapshot(spark, root, v_old)
    new = read_snapshot(spark, root, v_new)
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"snapshot_diff: column mismatch {sorted(old.columns)} vs "
            f"{sorted(new.columns)}"
        )
    payload = [c for c in old.columns if c not in key_cols]
    o = old.select(
        *key_cols, F.struct(*payload).alias("_o") if payload else F.lit(1).alias("_o")
    )
    n = new.select(
        *key_cols, F.struct(*payload).alias("_n") if payload else F.lit(1).alias("_n")
    )
    j = o.join(n, on=key_cols, how="full_outer")
    change = (
        F.when(F.col("_o").isNull(), F.lit("insert"))
        .when(F.col("_n").isNull(), F.lit("delete"))
        .when(F.col("_o").eqNullSafe(F.col("_n")), F.lit("unchanged"))
        .otherwise(F.lit("update"))
    )
    return j.select(*key_cols, change.alias("change"))


# ---------------------------------------------------------------------------
# incremental materialized-view maintenance over snapshots
# ---------------------------------------------------------------------------

_SRC_PTR = "_src_version"


def refresh_matview(
    spark: SparkSession,
    src_root: str,
    mv_root: str,
    key_cols: list[str],
    group_cols: list[str],
    agg_fn,
) -> tuple[str, int]:
    """Incremental materialized-view refresh WITH DELETE SUPPORT.

    ``agg_fn(df) -> DataFrame`` must aggregate its input to one row per
    ``group_cols`` value. The MV is itself a versioned table (time
    travel over MV states comes free); ``_src_version`` records which
    source snapshot the MV reflects.

    Refresh strategy — re-aggregate AFFECTED GROUPS ONLY:
    ``snapshot_diff`` between the reflected and current source versions
    yields changed row keys; joining them back to both snapshots gives
    the set of group values touched by any insert/delete/update. Only
    those groups re-aggregate from the new snapshot; unaffected MV rows
    carry over untouched. Unlike delta-folding (which only handles
    monoid aggregates — deletes break min/max), group recomputation is
    correct for EVERY aggregate, and the work is bounded by the
    affected groups' row count, not table size.

    Returns ("full" | "noop" | "incremental", n): for "full" the MV's
    group count, for "incremental" the number of AFFECTED groups (the
    re-aggregation's input set — a fully-deleted group counts even
    though it yields no output row).
    """
    cur = latest_version(spark, src_root)
    if cur is None:
        raise FileNotFoundError(f"refresh_matview: no snapshot in {src_root}")
    last = _read_int_file(spark, f"{mv_root}/{_SRC_PTR}")
    if last is None:
        mv = agg_fn(read_snapshot(spark, src_root, cur))
        write_snapshot(spark, mv, mv_root)
        _write_int_file(spark, f"{mv_root}/{_SRC_PTR}", cur)
        # count the MATERIALIZED snapshot (metadata-cheap), not the
        # plan — mv.count() would re-run the whole aggregation
        return ("full", read_snapshot(spark, mv_root).count())
    if last == cur:
        return ("noop", 0)

    changed = snapshot_diff(
        spark, src_root, last, cur, key_cols
    ).filter(F.col("change") != "unchanged")
    old = read_snapshot(spark, src_root, last)
    new = read_snapshot(spark, src_root, cur)
    affected = (
        old.join(changed, key_cols, "left_semi")
        .select(*group_cols)
        .unionByName(
            new.join(changed, key_cols, "left_semi").select(*group_cols)
        )
        .distinct()
    )

    # Null-safe group matching: a plain equi-join never matches NULL
    # group values, which would leave a NULL-valued group neither
    # re-aggregated nor evicted — a silently stale MV row. NULL is a
    # legitimate group key (it is one for groupBy), so both the
    # recompute semi-join and the carry-over anti-join use <=> on
    # every group column.
    def _ns(left: DataFrame, how: str) -> DataFrame:
        la, ra = left.alias("l"), affected.alias("r")
        cond = None
        for c in group_cols:
            e = F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}"))
            cond = e if cond is None else cond & e
        return la.join(ra, cond, how)

    recomputed = agg_fn(_ns(new, "left_semi"))
    carried = _ns(read_snapshot(spark, mv_root), "left_anti")
    patched = carried.unionByName(recomputed)
    write_snapshot(spark, patched, mv_root)
    _write_int_file(spark, f"{mv_root}/{_SRC_PTR}", cur)
    # affected-group count from the tiny distinct frame — never re-run
    # the diff-join-aggregate pipeline just for the return value
    return ("incremental", affected.count())
