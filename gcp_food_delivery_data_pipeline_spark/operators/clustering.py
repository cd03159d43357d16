"""Embedding clustering: distributed k-means and SemDeDup-style
semantic deduplication.

Reference parity note: the reference pipeline (see SURVEY.md §2) has no
clustering; this module is part of the large-scale training-data layer
(M5) alongside dedup/similarity — the "cluster then prune inside each
cluster" recipe of SemDeDup (Abbas et al. 2023, arXiv:2303.09540).

Scale design
------------
* **Assignment is zero-shuffle.** Centroids are tiny (k × d doubles) so
  they live as literals in the plan: a single codegen stage computes
  all k cosine similarities per row and arg-maxes them via
  ``array_max`` on ``struct(sim, -cluster_id)`` — no crossJoin, no
  window, no exchange. At 100 TB this is a pure map over the scan.
* **The vector is unit-normalized ONCE per row** and the centroid
  norms are folded into the literals, so per-row work is exactly k
  dot products (k·d fused multiply-adds in whole-stage codegen).
* **Lloyd's iterations are driver-coordinated**, like MLlib's KMeans:
  each iteration is one scan (zero-shuffle assignment) + one
  ``posexplode → groupBy(cluster, dim) → avg`` whose shuffle carries at
  most partitions × k × d partial rows (map-side combine), then a
  k × d-row collect — bytes, not data. No iteration ever shuffles the
  vectors themselves.
* **SemDeDup's intra-cluster pairwise join** is quadratic per cluster,
  which is exactly why it is run AFTER clustering: with k ≈ √N
  clusters the expected pair count is N^1.5, not N². The join is a
  plain equi-join on ``cluster_id`` so AQE's skew-join splitting
  applies if one cluster runs hot.

Determinism: seeds are the k lowest-id vectors, arg-max ties break to
the smallest cluster id, and the dedup keep-rule is "drop iff some
LOWER-id member of the same cluster is ≥ threshold similar" — all
rerun- and engine-stable, which is what lets DuckDB grade the
fixed-centroid forms bit-for-bit.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gcp_food_delivery_data_pipeline_spark.functions.lits import dense_lit
from gcp_food_delivery_data_pipeline_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
)

Centroid = tuple[int, list[float]]


def _unit(vec: Sequence[float]) -> list[float]:
    n = math.sqrt(sum(float(x) * float(x) for x in vec))
    if n == 0.0:
        return [0.0 for _ in vec]
    return [float(x) / n for x in vec]


def _unit_vec_col(vec_col: str) -> Column:
    """Row vector scaled to unit norm (all-zero stays all-zero)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return F.when(norm == 0.0, v).otherwise(
        F.transform(v, lambda x: x / norm)
    )


def _best_cluster(centroids: Sequence[Centroid]) -> Column:
    """struct(sim, neg_cid) of the nearest centroid, given ``_unit``.

    The per-centroid similarity is a plain dot product because both
    sides are pre-normalized (centroid literals here, the row vector
    in ``_unit``). ``array_max`` over struct(sim, -cid) implements
    "max sim, tie → smallest cluster id" in one expression.

    Shape note: k SEPARATE dot-product chains, deliberately — the
    "smaller tree" alternative (one nested-array literal + a single
    ``zip_with`` lambda) measured 15× SLOWER cold and 3× slower warm:
    the lambda captures ``_unit``, so CollapseProject inlines the
    whole normalization into it and re-evaluates it per element (the
    per-element re-evaluation pitfall in SCALE.md). With k separate
    chains ``_unit`` is multi-referenced and stays staged.
    """
    scored = F.array(
        *[
            F.struct(
                dot_product(
                    F.col("_unit"),
                    dense_lit(_unit(cv), "array<double>"),
                ).alias("sim"),
                F.lit(-int(cid)).alias("neg_cid"),
            )
            for cid, cv in centroids
        ]
    )
    return F.array_max(scored)


def assign_clusters(
    vectors: DataFrame,
    centroids: Sequence[Centroid],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment: (id, cluster_id, cosine_sim).

    Zero-shuffle: one codegen projection over the scan (see module
    docstring). ``centroids`` is a driver-side list of
    (cluster_id, vector) — k·d doubles, plan literals.
    """
    if not centroids:
        raise ValueError("assign_clusters: need at least one centroid")
    best = _best_cluster(centroids)
    return (
        vectors.select(
            F.col(id_col), _unit_vec_col(vec_col).alias("_unit")
        )
        .select(
            F.col(id_col),
            best.alias("_best"),
        )
        .select(
            F.col(id_col),
            (-F.col("_best.neg_cid")).alias("cluster_id"),
            F.round(F.col("_best.sim"), 6).alias("cosine_sim"),
        )
    )


def seed_centroids(
    vectors: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[Centroid]:
    """Deterministic seeds: the k lowest-id vectors, renumbered 0..k-1.

    A k-row ordered collect — independent of partition layout, so
    reruns and engine migrations agree (unlike ``df.sample`` whose
    seed binds to the split layout; see SCALE.md "Determinism").
    """
    rows = (
        vectors.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy("i")
        .limit(k)
        .collect()
    )
    return [(j, [float(x) for x in r.v]) for j, r in enumerate(rows)]


def seed_centroids_farthest(
    vectors: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[Centroid]:
    """Deterministic k-center greedy seeding (Gonzalez's farthest-first
    traversal — the derandomized cousin of k-means++): start from the
    lowest-id vector, then repeatedly take the vector LEAST similar to
    every centroid chosen so far (tie → lowest id). Spreads seeds
    across the space so Lloyd's starts near distinct modes instead of
    wherever the k lowest ids happen to sit.

    Cost: k-1 driver-coordinated jobs, each a zero-shuffle argmax scan
    (the same literal-centroid expression as assignment) + a 1-row
    ordered collect — no vector ever shuffles.
    """
    if k <= 0:
        raise ValueError("seed_centroids_farthest: k must be positive")
    staged = vectors.select(
        F.col(id_col).alias("_i"), _unit_vec_col(vec_col).alias("_unit")
    )
    first = staged.orderBy("_i").limit(1).collect()
    if not first:
        raise ValueError("seed_centroids_farthest: empty input")
    chosen: list[Centroid] = [(0, [float(x) for x in first[0]._unit])]
    for j in range(1, k):
        nxt = (
            staged.select(
                "_i", _best_cluster(chosen)["sim"].alias("_s"), "_unit"
            )
            .orderBy(F.col("_s").asc(), F.col("_i").asc())
            .limit(1)
            .collect()[0]
        )
        chosen.append((j, [float(x) for x in nxt._unit]))
    return chosen


def kmeans_fit(
    vectors: DataFrame,
    k: int = 8,
    max_iter: int = 10,
    tol: float = 1e-6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "lowest_id",
) -> tuple[list[Centroid], int]:
    """Spherical k-means (Lloyd's, cosine) — returns (centroids, iters).

    ``init``: "lowest_id" (one cheap ordered collect) or "farthest"
    (k-center greedy spread — k-1 extra scans, better mode coverage).

    Each iteration: zero-shuffle assignment, then the new centroid of
    each cluster as the per-dimension mean via ``posexplode →
    groupBy(cluster, dim) → avg`` (shuffle rows ≤ partitions·k·d after
    map-side combine) and a k·d-row collect. Empty clusters keep their
    previous centroid. Stops when every centroid's max coordinate
    shift < ``tol`` (post-normalization, so the test is scale-free).
    """
    if init == "farthest":
        cents = seed_centroids_farthest(
            vectors, k, id_col=id_col, vec_col=vec_col
        )
    elif init == "lowest_id":
        cents = seed_centroids(vectors, k, id_col=id_col, vec_col=vec_col)
    else:
        raise ValueError(f"kmeans_fit: unknown init {init!r}")
    staged = vectors.select(
        F.col(id_col), _unit_vec_col(vec_col).alias("_unit")
    )
    it = 0
    for it in range(1, max_iter + 1):
        best = _best_cluster(cents)
        assigned = staged.select(
            (-best["neg_cid"]).alias("cluster_id"), F.col("_unit")
        )
        means = (
            assigned.select(
                "cluster_id", F.posexplode("_unit").alias("dim", "x")
            )
            .groupBy("cluster_id", "dim")
            .agg(F.avg("x").alias("mu"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in means:
            by_cid.setdefault(r.cluster_id, {})[r.dim] = r.mu
        new_cents: list[Centroid] = []
        shift = 0.0
        for cid, old in cents:
            if cid in by_cid:
                dims = by_cid[cid]
                vec = _unit([dims[d] for d in range(len(old))])
            else:  # empty cluster: keep the old centroid
                vec = _unit(old)
            shift = max(
                shift,
                max(abs(a - b) for a, b in zip(vec, _unit(old))),
            )
            new_cents.append((cid, vec))
        cents = new_cents
        if shift < tol:
            break
    return cents, it


def semantic_dedup(
    vectors: DataFrame,
    centroids: Sequence[Centroid],
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup: drop a vector iff a LOWER-id member of its cluster is
    ≥ ``threshold`` cosine-similar. Returns survivors
    (id, cluster_id) — deterministic, order-free.

    The pairwise check never leaves a cluster AND never evaluates a
    per-pair JVM expression: it rides the blocked-BLAS pairwise kernel
    (``dedup.embedding_near_dup_pairs_blocked`` with
    ``group_col="cluster_id"``) — each (cluster, block-pair) group
    computes one dense numpy ``A @ B.T``, so per-row replication is
    ~cluster_size/block_rows + 1 and the quadratic work is bounded per
    cluster (pick k ≈ √N; see module docstring). The earlier
    equi-join + per-pair ``aggregate``-fold form was ~100× more
    per-pair overhead (interpreted higher-order functions, parallelism
    capped at k join keys) — measured 36 s vs 2 s at sf0.1.

    The drop decision thresholds the ROUNDED cosine, so it is
    identical across engines/summation orders (the same trick the
    graded v_embedding_pairs uses).
    """
    from gcp_food_delivery_data_pipeline_spark.operators.dedup import (
        embedding_near_dup_pairs_blocked,
    )

    assigned = vectors.select(
        F.col(id_col), F.col(vec_col), _unit_vec_col(vec_col).alias("_unit")
    ).select(
        F.col(id_col),
        (-_best_cluster(centroids)["neg_cid"]).alias("cluster_id"),
        F.col(vec_col),
    )
    # Size the block grid from the RAW count (a metadata-cheap parquet
    # count) and the mean cluster size, instead of the kernel's default
    # max-group-size aggregate — that aggregate would re-evaluate the
    # whole assignment subtree just to pick an integer. A skew-hot
    # cluster under-blocks (fewer, larger kernel tasks), which costs
    # parallelism, never correctness or memory (the kernel chunks A
    # internally).
    par = vectors.sparkSession.sparkContext.defaultParallelism
    mean_cluster = math.ceil(vectors.count() / max(len(centroids), 1))
    n_blocks = max(
        math.ceil(mean_cluster / 4096), math.ceil(math.sqrt(2 * par)), 1
    )
    pairs = embedding_near_dup_pairs_blocked(
        assigned,
        id_col=id_col,
        vec_col=vec_col,
        threshold=float(threshold),
        group_col="cluster_id",
        n_blocks=n_blocks,
    )
    # pairs come canonically ordered (id_a < id_b): the HIGHER id has a
    # lower-id near-dup in its own cluster -> it is the one dropped.
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return assigned.join(dropped, on=id_col, how="left_anti").select(
        id_col, "cluster_id"
    )


def semantic_dedup_kmeans(
    vectors: DataFrame,
    k: int = 8,
    threshold: float = 0.35,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """End-to-end SemDeDup: fit k-means, then prune inside clusters."""
    cents, _ = kmeans_fit(
        vectors, k=k, max_iter=max_iter, id_col=id_col, vec_col=vec_col
    )
    return semantic_dedup(
        vectors, cents, threshold=threshold, id_col=id_col, vec_col=vec_col
    )


def cluster_purity(
    assigned: DataFrame,
    labels: DataFrame,
    id_col: str = "vec_id",
    cluster_col: str = "cluster_id",
    label_col: str = "label",
) -> DataFrame:
    """Clustering-quality scorecard against ground-truth labels: one
    row with PURITY (each cluster votes its majority label;
    sum(majority counts) / N — the "how clean are the clusters"
    number) and NMI (mutual information I(C;L) normalized by
    sqrt(H(C) * H(L)) — purity's inflation-resistant twin: purity
    rewards shattering into singletons, NMI penalizes it). The
    standard pair for judging a dedup/mixture clustering before
    trusting it downstream.

    Reproducibility: every count is an exact integer; purity is an
    exact-integer ratio emitted RAW; the entropy/MI terms are ln over
    exact-integer ratios (the q_entropy_profile contract) with one
    final 6-decimal round.

    Scale shape: one keyed join (id -> label), one combinable
    (cluster, label) count — the contingency table is k x |labels|
    rows, and everything after runs on that tiny frame.
    """
    joined = assigned.select(id_col, cluster_col).join(
        labels.select(id_col, label_col), id_col
    )
    cells = joined.groupBy(
        F.col(cluster_col).alias("_c"), F.col(label_col).alias("_l")
    ).agg(F.count(F.lit(1)).alias("_n"))
    wc = Window.partitionBy("_c")
    wl = Window.partitionBy("_l")
    wmaj = wc.orderBy(F.col("_n").desc(), F.col("_l"))
    wlab = wl.orderBy(F.col("_n").desc(), F.col("_c"))
    # the grand total is a bare global window over the k x |labels|
    # contingency frame — the documented tiny-frame exemption (the
    # corpus never rides this window, only its cell counts do)
    t = (
        cells.withColumn("_nc", F.sum("_n").over(wc))
        .withColumn("_nl", F.sum("_n").over(wl))
        .withColumn("_rkc", F.row_number().over(wmaj))
        .withColumn("_rkl", F.row_number().over(wlab))
        .withColumn("_tot", F.sum("_n").over(Window.partitionBy()))
    )
    # NOTE: Spark resolves column names case-insensitively by default,
    # so the total must NOT be called "_N" — that silently REPLACES
    # the per-cell "_n" count instead of adding a column.
    nn = F.col("_tot").cast("double")
    mi = (F.col("_n") / nn) * F.log(
        F.col("_n") * nn / (F.col("_nc").cast("double") * F.col("_nl"))
    )
    hc = F.when(
        F.col("_rkc") == 1,
        -(F.col("_nc") / nn) * F.log(F.col("_nc") / nn),
    ).otherwise(F.lit(0.0))
    hl = F.when(
        F.col("_rkl") == 1,
        -(F.col("_nl") / nn) * F.log(F.col("_nl") / nn),
    ).otherwise(F.lit(0.0))
    maj = F.when(F.col("_rkc") == 1, F.col("_n")).otherwise(F.lit(0))
    # degenerate single-cluster or single-label input: an entropy is
    # 0, NMI is undefined -> NULL (guarded; IEEE 0/0 would emit NaN
    # where a SQL oracle emits NULL — the zero-denominator rule)
    nmi_den = F.sqrt(F.sum(hc) * F.sum(hl))
    return t.agg(
        F.first("_tot").alias("n_vectors"),
        F.countDistinct("_c").alias("n_clusters"),
        (F.sum(maj).cast("double") / F.first("_tot")).alias("purity"),
        F.round(
            F.when(nmi_den > 0.0, F.sum(mi) / nmi_den), 6
        ).alias("nmi"),
    )


def centroid_drift(
    embeddings: DataFrame,
    split_col: Column | str,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-distribution drift scorecard: split the corpus into
    two cohorts (``split_col`` → 0/1 — train/holdout, old/new ingest
    batch, A/B arm), compute each label's per-cohort centroid, and
    report the cosine between the two centroids per label — near 1.0
    when the label's embedding mass is stable, dropping when a class
    shifts (the embedding-space twin of q_psi_drift).

    Engine-exactness: per-dimension means are ROUNDED to 6 decimals
    FIRST (the v_label_centroids rule — float-sum order across
    engines differs in last ulps), so both engines then fold the
    cosine over identical inputs in identical dim order; the cosine
    re-rounds to 6.

    Scale shape: ``posexplode → groupBy(label, cohort, dim) → avg``
    partial-aggregates map-side (shuffle ≤ partitions·labels·2·d
    rows); rebuilding the centroid array is a sort_array over ≤ d
    structs per group; the final join pairs |labels| rows. The
    vectors themselves never shuffle.
    """
    s = F.col(split_col) if isinstance(split_col, str) else split_col
    per_dim = (
        embeddings.select(
            F.col(label_col).alias("label"),
            s.cast("int").alias("_half"),
            F.posexplode(vec_col).alias("dim", "v"),
        )
        .groupBy("label", "_half", "dim")
        .agg(
            F.round(F.avg("v"), 6).alias("_c"),
            # one exploded row per (vector, dim): the per-dim row
            # count IS the cohort's vector count
            F.count(F.lit(1)).alias("_n"),
        )
    )
    cent = per_dim.groupBy("label", "_half").agg(
        F.array_sort(
            F.collect_list(F.struct("dim", "_c"))
        ).alias("_dc"),
        F.max("_n").alias("_n"),
    ).select(
        "label",
        "_half",
        "_n",
        F.transform(F.col("_dc"), lambda x: x["_c"]).alias("_cv"),
    )
    a = cent.filter(F.col("_half") == 0).select(
        "label",
        F.col("_n").alias("n_a"),
        F.col("_cv").alias("_ca"),
    )
    b = cent.filter(F.col("_half") == 1).select(
        "label",
        F.col("_n").alias("n_b"),
        F.col("_cv").alias("_cb"),
    )
    return a.join(b, "label").select(
        "label",
        "n_a",
        "n_b",
        F.round(cosine_similarity("_ca", "_cb"), 6).alias(
            "drift_cosine"
        ),
    )
