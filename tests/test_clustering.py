"""Clustering / SemDeDup / bigram-LM / source-mix operator tests.

Golden values are hand-computed on tiny synthetic inputs; the sf0.001
embeddings exercise the distributed paths (Lloyd's convergence,
determinism across partitionings).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gcp_food_delivery_data_pipeline_spark.operators.clustering import (
    assign_clusters,
    kmeans_fit,
    seed_centroids,
    semantic_dedup,
    semantic_dedup_kmeans,
)
from gcp_food_delivery_data_pipeline_spark.operators.corpus import (
    resample_source_mix,
)
from gcp_food_delivery_data_pipeline_spark.operators.text import (
    bigram_lm_scores,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


# ---------------------------------------------------------------------------
# assignment
# ---------------------------------------------------------------------------


def test_assign_golden(spark):
    """Hand-checkable 2-D case: two orthogonal centroids."""
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 2.0]), (2, [3.0, 3.0])],
        ["vec_id", "embedding"],
    )
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    got = {
        r.vec_id: (r.cluster_id, r.cosine_sim)
        for r in assign_clusters(df, cents).collect()
    }
    assert got[0] == (0, 1.0)
    assert got[1] == (1, 1.0)
    # equidistant from both -> tie breaks to the SMALLEST cluster id
    assert got[2][0] == 0
    assert abs(got[2][1] - round(1 / math.sqrt(2), 6)) < 1e-9


def test_assign_zero_norm_vector_gets_tiebreak_cluster(spark):
    df = spark.createDataFrame([(7, [0.0, 0.0])], ["vec_id", "embedding"])
    rows = assign_clusters(df, [(0, [1.0, 0.0]), (1, [0.0, 1.0])]).collect()
    assert rows[0].cluster_id == 0  # all sims 0.0 -> smallest cid
    assert rows[0].cosine_sim == 0.0


def test_assign_covers_all_rows_once(embeddings):
    out = assign_clusters(embeddings, seed_centroids(embeddings, 4))
    assert out.count() == embeddings.count()
    assert out.select("vec_id").distinct().count() == embeddings.count()
    assert out.filter(~F.col("cluster_id").isin(0, 1, 2, 3)).count() == 0


def test_assign_is_partitioning_independent(embeddings):
    cents = seed_centroids(embeddings, 4)
    a = sorted(
        (r.vec_id, r.cluster_id)
        for r in assign_clusters(embeddings, cents).collect()
    )
    b = sorted(
        (r.vec_id, r.cluster_id)
        for r in assign_clusters(embeddings.repartition(13), cents).collect()
    )
    assert a == b


# ---------------------------------------------------------------------------
# k-means fit
# ---------------------------------------------------------------------------


def test_kmeans_converges_on_separated_blobs(spark):
    """Two clearly separated 2-D blobs: Lloyd's must find them and
    converge (iters < max_iter), regardless of which blob seeds."""
    pts = [(i, [10.0 + (i % 3) * 0.1, 0.0]) for i in range(6)] + [
        (10 + i, [0.0, 10.0 + (i % 3) * 0.1]) for i in range(6)
    ]
    df = spark.createDataFrame(pts, ["vec_id", "embedding"])
    cents, iters = kmeans_fit(df, k=2, max_iter=10, tol=1e-9)
    assert iters < 10  # converged early
    assigned = assign_clusters(df, cents)
    # each blob maps to exactly one cluster
    blobs = assigned.withColumn("blob", (F.col("vec_id") >= 10).cast("int"))
    pairs = blobs.select("blob", "cluster_id").distinct().collect()
    assert len(pairs) == 2
    assert len({p.cluster_id for p in pairs}) == 2


def test_kmeans_deterministic_across_partitionings(embeddings):
    c1, _ = kmeans_fit(embeddings, k=3, max_iter=3)
    c2, _ = kmeans_fit(embeddings.repartition(17), k=3, max_iter=3)
    for (i1, v1), (i2, v2) in zip(c1, c2):
        assert i1 == i2
        # avg() partial-agg order may differ -> tiny float wobble only
        assert max(abs(a - b) for a, b in zip(v1, v2)) < 1e-9


def test_kmeans_centroids_are_unit_norm(embeddings):
    cents, _ = kmeans_fit(embeddings, k=3, max_iter=2)
    for _, v in cents:
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-9


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    """k > distinct points: the starved cluster must not NaN out."""
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [1.0, 0.0])],
        ["vec_id", "embedding"],
    )
    cents, _ = kmeans_fit(df, k=2, max_iter=3)
    assert len(cents) == 2
    for _, v in cents:
        assert all(not math.isnan(x) for x in v)


# ---------------------------------------------------------------------------
# semantic dedup
# ---------------------------------------------------------------------------


def test_semantic_dedup_drops_only_same_cluster_dups(spark):
    """id 1 duplicates id 0 (same cluster -> dropped); id 3 duplicates
    id 2's direction but sits in the other cluster's orbit — a
    cross-cluster near-dup is NOT SemDeDup's business."""
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.001]),  # near-dup of 0, same cluster
            (2, [0.0, 1.0]),
            (3, [0.001, 1.0]),  # near-dup of 2, same cluster
            (4, [1.0, 1.0]),  # distinct; tie -> cluster 0, not similar enough
        ],
        ["vec_id", "embedding"],
    )
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    survivors = {
        r.vec_id: r.cluster_id
        for r in semantic_dedup(df, cents, threshold=0.99).collect()
    }
    assert set(survivors) == {0, 2, 4}
    assert survivors[0] == 0 and survivors[2] == 1 and survivors[4] == 0


def test_semantic_dedup_matches_brute_force_within_cluster(embeddings):
    """Exact rule replay in local Python over the sf0.001 vectors."""
    cents = seed_centroids(embeddings, 4)
    got = sorted(
        r.vec_id
        for r in semantic_dedup(embeddings, cents, threshold=0.35).collect()
    )
    rows = embeddings.select("vec_id", "embedding").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v] if n else v

    def best(v):
        sims = [
            (sum(a * b for a, b in zip(unit(v), unit(cv))), -cid)
            for cid, cv in cents
        ]
        return -max(sims)[1]

    cl = {i: best(v) for i, v in vecs.items()}
    survivors = []
    for i in sorted(vecs):
        dup = any(
            j < i
            and cl[j] == cl[i]
            and round(
                sum(a * b for a, b in zip(unit(vecs[i]), unit(vecs[j]))), 6
            )
            >= 0.35
            for j in vecs
        )
        if not dup:
            survivors.append(i)
    assert got == survivors


def test_semantic_dedup_kmeans_end_to_end(embeddings):
    out = semantic_dedup_kmeans(embeddings, k=4, threshold=0.35, max_iter=2)
    n = out.count()
    assert 0 < n <= embeddings.count()
    assert out.columns == ["vec_id", "cluster_id"]


# ---------------------------------------------------------------------------
# bigram LM
# ---------------------------------------------------------------------------


def test_bigram_lm_golden(spark):
    """Corpus 'a b', 'a b', 'a c' — hand-computed add-one model.

    Counts: bigrams ab=2, ac=1; unigrams a=3, b=2, c=1; V=3.
    ce(doc 'a b')  = ln((3+3)/(2+1)) = ln 2
    ce(doc 'a c')  = ln((3+3)/(1+1)) = ln 3
    """
    df = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "a c")], ["doc_id", "text"]
    )
    got = {
        r.doc_id: (r.n_bigrams, r.cross_entropy)
        for r in bigram_lm_scores(df).collect()
    }
    assert got[0] == (1, round(math.log(2), 6))
    assert got[1] == (1, round(math.log(2), 6))
    assert got[2] == (1, round(math.log(3), 6))


def test_bigram_lm_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(0, "solo"), (1, ""), (2, "  "), (3, "x y")], ["doc_id", "text"]
    )
    got = {
        r.doc_id: (r.n_bigrams, r.cross_entropy)
        for r in bigram_lm_scores(df).collect()
    }
    assert got[0] == (0, None)
    assert got[1] == (0, None)
    assert got[2] == (0, None)
    assert got[3][0] == 1


def test_bigram_lm_repeated_bigrams_counted_per_occurrence(spark):
    """'a a a' has TWO (a,a) occurrences — occurrences, not distinct
    grams, drive both training counts and per-doc averaging."""
    df = spark.createDataFrame([(0, "a a a")], ["doc_id", "text"])
    row = bigram_lm_scores(df).collect()[0]
    # c(a,a)=2, c(a)=3, V=1 -> ce = ln((3+1)/(2+1)) = ln(4/3)
    assert row.n_bigrams == 2
    assert row.cross_entropy == round(math.log(4 / 3), 6)


# ---------------------------------------------------------------------------
# source-mix resampling
# ---------------------------------------------------------------------------


def test_mix_quota_math_exact(spark):
    """n = {a: 10, b: 6}, w = {a: 3, b: 1}: M = min(10//3, 6//1) = 3,
    quotas a=9, b=3."""
    rows = [(i, "a") for i in range(10)] + [(100 + i, "b") for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = resample_source_mix(df, {"a": 3, "b": 1})
    counts = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"a": 9, "b": 3}


def test_mix_unknown_source_dropped_and_deterministic(spark):
    rows = [(i, "a") for i in range(4)] + [(10 + i, "zzz") for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out1 = sorted(r.doc_id for r in resample_source_mix(df, {"a": 2}).collect())
    out2 = sorted(
        r.doc_id
        for r in resample_source_mix(df.repartition(7), {"a": 2}).collect()
    )
    assert out1 == out2
    assert all(i < 10 for i in out1)  # zzz rows gone
    assert len(out1) == 4  # M = 4//2 = 2 -> quota 2*2 = 4


def test_mix_weighted_but_absent_source_forces_empty(spark):
    """A declared source with zero rows can fill zero mixture units:
    the strict contract yields an EMPTY result, never a silently
    skewed mix."""
    df = spark.createDataFrame([(i, "a") for i in range(6)], ["doc_id", "source"])
    assert resample_source_mix(df, {"a": 1, "ghost": 1}).count() == 0
    # weight-0 declarations are NOT part of the mixture -> unaffected
    assert resample_source_mix(df, {"a": 1, "ghost": 0}).count() == 6


def test_mix_rejects_empty_weights(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "source"])
    with pytest.raises(ValueError):
        resample_source_mix(df, {})
    with pytest.raises(ValueError):
        resample_source_mix(df, {"a": 0})


# ---------------------------------------------------------------------------
# property tests (hypothesis): pure-Python models of the LM and mixer
# ---------------------------------------------------------------------------

from collections import Counter  # noqa: E402

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

WORD = st.sampled_from(["a", "b", "cc", "dd", "e1", "x"])
DOC = st.lists(WORD, min_size=0, max_size=8).map(" ".join)


def model_bigram_lm(texts: list[str]) -> dict[int, tuple[int, float | None]]:
    """Pure-Python add-one bigram LM, mirroring bigram_lm_scores."""
    import math

    toks = {i: t.split() if t.split() else [] for i, t in enumerate(texts)}
    uni = Counter(w for ts in toks.values() for w in ts)
    bi = Counter(
        (ts[j], ts[j + 1])
        for ts in toks.values()
        for j in range(len(ts) - 1)
    )
    v = len(uni)
    out: dict[int, tuple[int, float | None]] = {}
    for i, ts in toks.items():
        grams = [(ts[j], ts[j + 1]) for j in range(len(ts) - 1)]
        if not grams:
            out[i] = (0, None)
            continue
        ce = sum(
            math.log(uni[w1] + v) - math.log(bi[(w1, w2)] + 1)
            for w1, w2 in grams
        ) / len(grams)
        out[i] = (len(grams), round(ce, 6))
    return out


@settings(max_examples=8, deadline=None)
@given(texts=st.lists(DOC, min_size=1, max_size=12))
def test_bigram_lm_matches_python_model(spark_global, texts):
    df = spark_global.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r.doc_id: (r.n_bigrams, r.cross_entropy)
        for r in bigram_lm_scores(df).collect()
    }
    expected = model_bigram_lm(texts)
    assert set(got) == set(expected)
    for i in expected:
        assert got[i][0] == expected[i][0]
        if expected[i][1] is None:
            assert got[i][1] is None
        else:
            # same rounding; allow a 1-ulp-at-6dp disagreement from
            # summation order
            assert abs(got[i][1] - expected[i][1]) <= 1e-6


@settings(max_examples=8, deadline=None)
@given(
    counts=st.dictionaries(
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=1, max_value=12),
        min_size=1,
        max_size=3,
    ),
    weights=st.dictionaries(
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=1, max_value=4),
        min_size=1,
        max_size=3,
    ),
)
def test_mix_quota_invariants(spark_global, counts, weights):
    rows = [
        (s_i * 1000 + j, s)
        for s_i, (s, n) in enumerate(sorted(counts.items()))
        for j in range(n)
    ]
    df = spark_global.createDataFrame(rows, ["doc_id", "source"])
    declared = {s: w for s, w in weights.items() if w > 0}
    # strict mixture: M ranges over EVERY declared source; one with no
    # rows forces M = 0 (n // w of a zero count)
    m = min(counts.get(s, 0) // w for s, w in declared.items())
    out = resample_source_mix(df, weights).collect()
    got = Counter(r.source for r in out)
    assert got == Counter(
        {
            s: declared[s] * m
            for s in declared
            if s in counts and declared[s] * m > 0
        }
    )
    # survivors are a subset of the input rows
    in_ids = {r[0] for r in rows}
    assert all(r.doc_id in in_ids for r in out)


# ---------------------------------------------------------------------------
# farthest-first seeding
# ---------------------------------------------------------------------------

from gcp_food_delivery_data_pipeline_spark.operators.clustering import (  # noqa: E402
    seed_centroids_farthest,
)


def test_farthest_seeding_spreads_across_blobs(spark):
    """Both blobs must be seeded even though the 2 lowest ids sit in
    ONE blob (which is exactly where lowest-id seeding fails)."""
    pts = [(i, [10.0, 0.1 * i]) for i in range(5)] + [
        (10 + i, [0.0, 10.0 + 0.1 * i]) for i in range(5)
    ]
    df = spark.createDataFrame(pts, ["vec_id", "embedding"])
    cents = seed_centroids_farthest(df, 2)
    assert [c for c, _ in cents] == [0, 1]
    # seed 0 = lowest id (blob A); seed 1 must come from blob B
    assert cents[0][1][0] > 0.9  # unit([10, 0]) ~ [1, 0]
    assert cents[1][1][1] > 0.9  # unit([0, 10]) ~ [0, 1]


def test_farthest_seeding_deterministic(embeddings):
    a = seed_centroids_farthest(embeddings, 3)
    b = seed_centroids_farthest(embeddings.repartition(11), 3)
    for (i1, v1), (i2, v2) in zip(a, b):
        assert i1 == i2 and v1 == v2


def test_kmeans_farthest_init_end_to_end(spark):
    pts = [(i, [10.0, 0.1 * i]) for i in range(5)] + [
        (10 + i, [0.0, 10.0 + 0.1 * i]) for i in range(5)
    ]
    df = spark.createDataFrame(pts, ["vec_id", "embedding"])
    cents, iters = kmeans_fit(df, k=2, max_iter=10, init="farthest")
    assigned = assign_clusters(df, cents)
    blobs = assigned.withColumn("blob", (F.col("vec_id") >= 10).cast("int"))
    assert blobs.select("blob", "cluster_id").distinct().count() == 2


def test_kmeans_rejects_unknown_init(spark):
    df = spark.createDataFrame([(0, [1.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        kmeans_fit(df, k=1, init="random")


# ---------------------------------------------------------------------------
# weighted sampling
# ---------------------------------------------------------------------------

from gcp_food_delivery_data_pipeline_spark.operators.corpus import (  # noqa: E402
    weighted_sample,
)


def test_weighted_sample_matches_python_model(spark):
    """Exact A-ES replay: same md5-uniform, same ln(u)/w key."""
    import hashlib

    rows = [(i, float(1 + (i * 7) % 13)) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = sorted(
        r.doc_id
        for r in weighted_sample(df, "w", k=10, id_col="doc_id").collect()
    )

    def key(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        u = (h + 1) / 4294967296.0
        return math.log(u) / w

    expected = sorted(
        sorted(rows, key=lambda r: (-key(*r), r[0]))[:10]
    )
    assert got == [i for i, _ in expected]


def test_weighted_sample_excludes_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(0, 5.0), (1, 0.0), (2, -1.0), (3, 2.0)], ["doc_id", "w"]
    )
    got = {r.doc_id for r in weighted_sample(df, "w", k=10).collect()}
    assert got == {0, 3}


def test_weighted_sample_is_partitioning_independent(spark):
    rows = [(i, float(1 + i % 5)) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    a = sorted(r.doc_id for r in weighted_sample(df, "w", k=15).collect())
    b = sorted(
        r.doc_id
        for r in weighted_sample(df.repartition(9), "w", k=15).collect()
    )
    assert a == b


def test_weighted_sample_rejects_bad_k(spark):
    df = spark.createDataFrame([(0, 1.0)], ["doc_id", "w"])
    with pytest.raises(ValueError):
        weighted_sample(df, "w", k=0)


def test_cluster_purity_golden(spark):
    """Hand-computed purity/NMI: perfectly pure clusters -> purity 1,
    NMI 1; assignments independent of labels -> purity = majority
    share, NMI ~ 0."""
    from gcp_food_delivery_data_pipeline_spark.operators.clustering import (
        cluster_purity,
    )

    pure_a = spark.createDataFrame(
        [(i, i % 2) for i in range(20)], ["vec_id", "cluster_id"]
    )
    labels = spark.createDataFrame(
        [(i, 100 + i % 2) for i in range(20)], ["vec_id", "label"]
    )
    r = cluster_purity(pure_a, labels).collect()[0]
    assert r.n_vectors == 20 and r.n_clusters == 2
    assert r.purity == 1.0 and r.nmi == 1.0

    # truly independent assignment: two block clusters, each holding
    # an even label mix -> purity = majority share 0.5, MI exactly 0
    indep = spark.createDataFrame(
        [(i, i // 10) for i in range(20)], ["vec_id", "cluster_id"]
    )
    r2 = cluster_purity(indep, labels).collect()[0]
    assert r2.purity == 0.5
    assert r2.nmi == 0.0


def test_centroid_drift_golden(spark):
    """Two labels: label 1's cohorts share the centroid direction
    (drift 1.0); label 2's cohorts are orthogonal (drift 0.0)."""
    from gcp_food_delivery_data_pipeline_spark.operators.clustering import (
        centroid_drift,
    )
    from pyspark.sql import functions as F

    rows = [
        # label 1: even cohort [1,0], odd cohort [2,0] -> cosine 1
        (0, [1.0, 0.0], 1), (2, [1.0, 0.0], 1), (1, [2.0, 0.0], 1),
        # label 2: even [1,0] vs odd [0,3] -> cosine 0
        (4, [1.0, 0.0], 2), (5, [0.0, 3.0], 2),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {
        r.label: (r.n_a, r.n_b, r.drift_cosine)
        for r in centroid_drift(df, F.col("vec_id") % 2).collect()
    }
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (1, 1, 0.0)


def test_cluster_purity_single_cluster_nmi_null(spark):
    """One cluster + one label: both entropies are 0, NMI is
    undefined -> NULL (guarded), never NaN; purity stays 1.0."""
    from gcp_food_delivery_data_pipeline_spark.operators.clustering import (
        cluster_purity,
    )

    assigned = spark.createDataFrame(
        [(i, 0) for i in range(5)], "vec_id long, cluster_id int"
    )
    labels = spark.createDataFrame(
        [(i, 1) for i in range(5)], "vec_id long, label int"
    )
    r = cluster_purity(assigned, labels).collect()[0]
    assert r.purity == 1.0
    assert r.nmi is None
