"""Mergeable-state rollups: incremental aggregate maintenance and
sketch-based distinct-count rollups.

The 100 TB pattern: never re-scan history to refresh an aggregate.
Keep a materialized rollup keyed at the finest grain you query, and

* fold each new batch in with ``merge_rollups`` — legal because every
  supported measure (count, sum, min, max; avg derived as sum/count)
  is a commutative monoid, so batch-wise partial states merge to
  exactly the direct full-scan answer (asserted row-for-row by the
  driver oracle on ``q_incremental_rollup``);
* roll fine-grain rows up to coarser grains with the same merge —
  day → month → total without touching raw data;
* for DISTINCT counts — which are NOT sum-mergeable — store an HLL
  sketch per fine-grain row (``hll_sketch_agg``) and merge with
  ``hll_union_agg``: the Apache DataSketches HLL union is lossless
  w.r.t. the sketch accuracy, so a pre-aggregated table can still
  answer "distinct users last quarter" with one tiny scan.

This supplies the re-aggregation layer the reference's 10-minute
batch cadence implies but hard-codes (each reference run recounts its
whole file; here each run merges O(|batch|) partial state instead).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# measure -> (build aggregator, merge aggregator)
_MEASURES = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _aggs(
    measures: dict[str, tuple[str, str]], which: int
) -> list[Column]:
    out = []
    for out_col, (kind, in_col) in measures.items():
        if kind not in _MEASURES:
            raise ValueError(
                f"rollup measure {kind!r} is not mergeable; supported: "
                f"{sorted(_MEASURES)} (derive avg as sum/count, use "
                f"sketch_rollup for distinct)"
            )
        fn = _MEASURES[kind][which]
        src = in_col if which == 0 else out_col
        out.append(fn(src).alias(out_col))
    return out


def build_rollup(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Aggregate raw rows to one partial-state row per key group.

    ``measures`` maps output column -> (kind, input column), kind in
    {count, sum, min, max}. One map-side-combinable shuffle on the
    keys.
    """
    return df.groupBy(*keys).agg(*_aggs(measures, 0))


def merge_rollups(
    rollups: Iterable[DataFrame],
    keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Merge partial rollups (or roll a fine grain up to ``keys``).

    count/sum states add; min/max states re-min/re-max. The union is
    column-pruned and the merge is again one combinable shuffle over
    rollup-sized (not raw-sized) input.
    """
    parts = list(rollups)
    if not parts:
        raise ValueError("merge_rollups: need at least one rollup")
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    return merged.groupBy(*keys).agg(*_aggs(measures, 1))


def with_avg(
    rollup: DataFrame,
    avg_col: str,
    sum_col: str,
    count_col: str,
    scale: int = 6,
) -> DataFrame:
    """Derive an average from mergeable (sum, count) state."""
    return rollup.withColumn(
        avg_col, F.round(F.col(sum_col) / F.col(count_col), scale)
    )


def build_distinct_sketches(
    df: DataFrame,
    keys: list[str],
    col: str,
    sketch_col: str = "sketch",
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch of ``col`` per key group — the mergeable stand-in
    for ``count_distinct``, constant bytes per group (2^lg_k registers)
    regardless of group size."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias(sketch_col)
    )


def rollup_distinct_sketches(
    sketches: DataFrame,
    keys: list[str],
    sketch_col: str = "sketch",
    estimate_col: str = "n_distinct_est",
) -> DataFrame:
    """Union fine-grain sketches up to ``keys`` and estimate: distinct
    counts over any coarser grain WITHOUT re-scanning raw data —
    the query shape plain count_distinct can never pre-aggregate."""
    merged = sketches.groupBy(*keys).agg(
        F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    )
    return merged.withColumn(
        estimate_col,
        F.hll_sketch_estimate(F.col(sketch_col)).cast("long"),
    )


def countmin_profile(
    df: DataFrame,
    key_col: str = "user_id",
    d: int = 4,
    w: int = 1024,
    k: int = 20,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) heavy-hitter
    estimation, verified against exact counts: estimate each key's
    frequency as min over ``d`` hash rows of a ``w``-bucket counter
    array, and emit the top-``k`` keys by exact count with their
    estimate and the never-underestimates invariant (``est_ok``).

    The sketch counters here are derived FROM the exact per-key
    aggregate (one combinable shuffle; the counter build is d keyed
    windows over the already-aggregated keys frame — tiny), which is
    what makes the estimate oracle-checkable bit-for-bit. In a
    production position the same counters fold directly over the raw
    stream (sum per (row, bucket) is a commutative monoid, so the
    d×w counter grid merges batch-wise exactly like ``build_rollup``
    state — constant memory regardless of key cardinality), and the
    exact side disappears; the CMS guarantee est >= exact with
    overestimate <= 2N/w at probability 1 - (1/2)^d carries over
    unchanged.

    Hashes are the engine-portable md5-prefix family (row-salted), so
    bucket assignment — and therefore every counter — is identical in
    any engine.
    """
    from pyspark.sql import Window

    keyed = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n_exact"))

    def bucket(r: int) -> Column:
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{r}:"), F.col(key_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        return (h % w).alias(f"_b{r}")

    # ONE (row, bucket) grid instead of d sequential window passes:
    # posexplode the d bucket assignments to rows, sum counter mass in
    # a single keyed window, min back per key — 2 shuffles total
    # regardless of d (a d-window chain re-sorts the keyed frame d
    # times, which matters exactly in CMS's high-cardinality regime).
    grid = keyed.select(
        key_col,
        "n_exact",
        F.posexplode(F.array(*[bucket(r) for r in range(d)])).alias(
            "_r", "_b"
        ),
    )
    counted = grid.withColumn(
        "_c", F.sum("n_exact").over(Window.partitionBy("_r", "_b"))
    )
    est = F.min("_c")
    return (
        counted.groupBy(key_col)
        .agg(
            F.first("n_exact").alias("n_exact"),
            est.alias("n_est"),
            (est >= F.first("n_exact")).alias("est_ok"),
        )
        .orderBy(F.col("n_exact").desc(), F.col(key_col))
        .limit(k)
    )


def kmv_overlap(
    df: DataFrame,
    group_col: str,
    item_col: str,
    k: int = 128,
) -> DataFrame:
    """K-Minimum-Values distinct sketches (Beyer et al., SIGMOD 2007)
    with SET OPERATIONS on the sketches: for every pair of groups,
    estimate the distinct-union size and the Jaccard overlap of their
    item sets from k-sized sketches — never from the raw sets.

    Per group the sketch is the ``k`` smallest values of a uniform
    item hash; for a group with n >= k distinct items the classic
    estimator is ``(k-1) * H / h_k`` (``H`` = hash-space size, ``h_k``
    = the k-th smallest hash), and with n < k the sketch IS the set,
    so the estimate is exact. For a PAIR, the k smallest of the merged
    sketches form a valid sketch of the UNION, and the fraction of
    those union-sketch members present in both sides estimates the
    Jaccard coefficient — the resemblance estimator LSH schemes build
    on, here exact-by-construction over the sketch.

    Scale shape (100 TB): one combinable ``distinct`` shuffle over
    (group, item), one per-group top-k window (state: k rows per
    group), and every ESTIMATE runs over sketch rows only — G^2 * k
    rows for G groups, independent of corpus size. The raw item sets
    are never joined pairwise: the exact companion columns come from a
    hash-KEYED self equi-join (items group only with the groups that
    contain them — co-occurrence counting) plus inclusion-exclusion
    ``|A ∪ B| = |A| + |B| - |A ∩ B|``, so the heavy side is one
    equi-join shuffle proportional to corpus distinct size, never a
    cross product. The hash is the engine-portable md5-prefix (15 hex
    chars -> [0, 16^15)), so every estimate is bit-identical in any
    engine — which is what lets the SQL oracle check the ESTIMATES
    themselves, not a tolerance band.

    Returns one row per unordered group pair (g_a < g_b):
    ``(g_a, g_b, union_exact, inter_exact, jaccard_exact,
    union_est, jaccard_kmv)`` — the ``*_exact`` columns are TRUE set
    sizes computed from the full hashed distinct stream (collision
    probability ~n^2/2^60), so the sketch error is measurable in-row
    even when groups are far larger than k.
    """
    from pyspark.sql import Window

    if k < 2:
        raise ValueError(f"kmv_overlap: k must be >= 2, got {k}")
    hash_space = float(16**15)
    h = F.conv(
        F.substring(F.md5(F.col(item_col).cast("string")), 1, 15),
        16,
        10,
    ).cast("long")
    hashed = (
        df.select(
            F.col(group_col).alias("_g"), h.alias("_h")
        )
        .distinct()
    )
    w = Window.partitionBy("_g").orderBy("_h")
    sk = (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("_g", "_h")
    )
    groups = sk.select("_g").distinct()
    gp = (
        groups.select(F.col("_g").alias("g_a"))
        .crossJoin(
            F.broadcast(groups.select(F.col("_g").alias("g_b")))
        )
        .filter(F.col("g_a") < F.col("g_b"))
    )
    # Membership-flagged union of the two sketches per pair: sketch
    # rows fan out only to the (few) pairs their group belongs to.
    side_a = gp.join(
        sk, sk["_g"] == gp["g_a"]
    ).select(
        "g_a", "g_b", "_h",
        F.lit(1).alias("_in_a"), F.lit(0).alias("_in_b"),
    )
    side_b = gp.join(
        sk, sk["_g"] == gp["g_b"]
    ).select(
        "g_a", "g_b", "_h",
        F.lit(0).alias("_in_a"), F.lit(1).alias("_in_b"),
    )
    u = (
        side_a.unionByName(side_b)
        .groupBy("g_a", "g_b", "_h")
        .agg(
            F.max("_in_a").alias("_in_a"),
            F.max("_in_b").alias("_in_b"),
        )
    )
    wk = Window.partitionBy("g_a", "g_b").orderBy("_h")
    ranked = u.withColumn("_rn", F.row_number().over(wk))
    in_cut = F.col("_rn") <= k
    kth = F.max(F.when(F.col("_rn") == k, F.col("_h")))
    n_cut = F.sum(F.when(in_cut, 1).otherwise(0))
    n_both_cut = F.sum(
        F.when(in_cut, F.col("_in_a") * F.col("_in_b")).otherwise(0)
    )
    est = ranked.groupBy("g_a", "g_b").agg(
        kth.alias("_kth"),
        n_cut.alias("_n_cut"),
        n_both_cut.alias("_n_both"),
    )
    # TRUE exact companions, without a pairwise raw-set join: items
    # meet only the groups that contain them (hash-keyed equi-join =
    # co-occurrence counting), and unions come from inclusion-
    # exclusion over per-group distinct counts.
    sizes = hashed.groupBy("_g").agg(F.count(F.lit(1)).alias("_n"))
    inter = (
        hashed.alias("x")
        .join(
            hashed.alias("y"),
            (F.col("x._h") == F.col("y._h"))
            & (F.col("x._g") < F.col("y._g")),
        )
        .groupBy(
            F.col("x._g").alias("g_a"), F.col("y._g").alias("g_b")
        )
        .agg(F.count(F.lit(1)).alias("_ix"))
    )
    exact = (
        gp.join(
            F.broadcast(sizes.withColumnRenamed("_g", "g_a")), "g_a"
        )
        .withColumnRenamed("_n", "_n_a")
        .join(
            F.broadcast(sizes.withColumnRenamed("_g", "g_b")), "g_b"
        )
        .withColumnRenamed("_n", "_n_b")
        .join(F.broadcast(inter), ["g_a", "g_b"], "left")
        .select(
            "g_a",
            "g_b",
            F.coalesce(F.col("_ix"), F.lit(0)).alias("inter_exact"),
            (
                F.col("_n_a")
                + F.col("_n_b")
                - F.coalesce(F.col("_ix"), F.lit(0))
            ).alias("union_exact"),
        )
    )
    return exact.join(est, ["g_a", "g_b"]).select(
        "g_a",
        "g_b",
        "union_exact",
        "inter_exact",
        F.round(
            F.col("inter_exact") / F.col("union_exact"), 6
        ).alias("jaccard_exact"),
        F.when(
            F.col("_n_cut") < k, F.col("union_exact")
        )
        .otherwise(
            F.round(
                F.lit(float(k - 1))
                * F.lit(hash_space)
                / F.col("_kth").cast("double")
            ).cast("long")
        )
        .alias("union_est"),
        F.round(F.col("_n_both") / F.col("_n_cut"), 6).alias(
            "jaccard_kmv"
        ),
    ).orderBy("g_a", "g_b")
