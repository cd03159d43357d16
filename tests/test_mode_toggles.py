"""Mode-toggle invariance (VERDICT r10 item 7).

Two families of runtime switches that a cluster operator flips without
consulting the query author, pinned answer-identical here:

1. AQE skew-join x manual salting. ``salted_join`` and
   ``blocked_linkage_salted`` already split hot keys by construction;
   AQE's skew-join optimizer may then re-split the already-salted
   shuffle partitions at runtime (double mitigation). That must never
   change ANSWERS — re-splitting a shuffle partition is a physical
   choice. These tests force the aggressive end
   (``forceOptimizeSkewedJoin``) and the off end (adaptive disabled)
   and require identical results, on data skewed enough that the salt
   actually engages.

2. ANSI mode x division guards. The division-guard family
   (q_seasonal_naive, q_autocorr, q_chi2_independence,
   v_cluster_purity's NMI) documents Inf/NaN guards around zero
   denominators; Spark 4 defaults ``spark.sql.ansi.enabled=true``
   where an unguarded x/0 RAISES instead of yielding NULL/Inf. The
   sweep runs each key under both modes at sf0.001 and requires
   byte-identical rows — proving the guards, not the mode, decide
   every output value.

3. (r12, VERDICT r11 item 7) Join-strategy independence: broadcast
   threshold forced to -1 (every AUTOMATIC broadcast degrades to
   sort-merge; explicit ``F.broadcast`` hints at call sites still
   apply, which is precisely the engine's contract — hinted dims
   broadcast regardless of statistics) must not change any answer.
   Run over graded keys whose joins are NOT all explicitly hinted,
   so the toggle actually flips physical strategies.

4. (r12) ``spark.sql.shuffle.partitions`` independence on a
   two-phase-rank key: the distributed global rank derives offsets
   from ACTUAL partition totals, so where the range boundaries land
   (and how many there are) must never show in the output.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from gcp_food_delivery_data_pipeline_spark.operators.dedup import (
    blocked_linkage,
    blocked_linkage_salted,
)
from gcp_food_delivery_data_pipeline_spark.operators.scale import salted_join

SF_DIR = "/root/testdata/sf0.001"


class _conf_sweep:
    """Set Spark confs, restore originals on exit (even unset ones)."""

    def __init__(self, spark, **confs):
        self.spark = spark
        self.confs = {k.replace("__", "."): v for k, v in confs.items()}

    def __enter__(self):
        self.saved = {}
        for k, v in self.confs.items():
            try:
                self.saved[k] = self.spark.conf.get(k)
            except Exception:  # noqa: BLE001 — unset conf
                self.saved[k] = None
            self.spark.conf.set(k, v)
        return self

    def __exit__(self, *exc):
        for k, v in self.saved.items():
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)
        return False


AQE_AGGRESSIVE = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    # thresholds low enough that the tiny test shuffle qualifies as
    # "skewed" to AQE — otherwise the optimizer never engages and the
    # test proves nothing
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
}
AQE_OFF = {"spark.sql.adaptive.enabled": "false"}


def _skewed_frames(spark):
    # 5,000 rows of one hot key + a cold tail; small dim side.
    big = spark.range(6_000).select(
        F.when(F.col("id") < 5_000, F.lit(7))
        .otherwise(F.col("id") % 40)
        .cast("int")
        .alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    small = spark.range(40).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("dim_"), F.col("id")).alias("name"),
    )
    return big, small


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_answer_identical_under_skewjoin_toggle(spark):
    big, small = _skewed_frames(spark)
    plain = _rows(big.join(small, "k", "inner"))
    got = {}
    for label, confs in (("aggr", AQE_AGGRESSIVE), ("off", AQE_OFF)):
        with _conf_sweep(spark, **confs):
            got[label] = _rows(salted_join(big, small, "k", salt=8))
    assert got["aggr"] == got["off"] == plain


def test_blocked_linkage_salted_under_skewjoin_toggle(spark):
    # one hot block (b=0) with enough candidate product to trip the
    # pairs_per_task=100 salting path, plus cold blocks; both frames
    # share the id/val column names (the operator's contract), val is
    # a string (it is Levenshtein-scored)
    ref = spark.range(120).select(
        (F.when(F.col("id") < 100, 0).otherwise(F.col("id") % 5))
        .cast("int")
        .alias("b"),
        F.col("id").alias("rid"),
        F.concat(F.lit("name_"), F.col("id") % 37).alias("v"),
    )
    rec = spark.range(300).select(
        (F.when(F.col("id") < 250, 0).otherwise(F.col("id") % 5))
        .cast("int")
        .alias("b"),
        (F.col("id") + 10_000).alias("rid"),
        F.concat(F.lit("name_"), F.col("id") % 41).alias("v"),
    )
    base = _rows(blocked_linkage(ref, rec, ["b"], "rid", "v"))
    got = {}
    for label, confs in (("aggr", AQE_AGGRESSIVE), ("off", AQE_OFF)):
        with _conf_sweep(spark, **confs):
            got[label] = _rows(
                blocked_linkage_salted(
                    ref, rec, ["b"], "rid", "v", pairs_per_task=100
                )
            )
    assert got["aggr"] == got["off"] == base


@pytest.mark.parametrize(
    "key",
    ["q_seasonal_naive", "q_autocorr", "q_chi2_independence", "v_cluster_purity"],
)
def test_division_guards_identical_under_ansi_toggle(spark, key):
    q = entry_mod.queries()[key]
    got = {}
    for mode in ("true", "false"):
        with _conf_sweep(spark, **{"spark.sql.ansi.enabled": mode}):
            got[mode] = _rows(q(spark, SF_DIR))
    assert got["true"] == got["false"]
    assert got["true"], f"{key} returned no rows at sf0.001"


NO_BROADCAST = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    # AQE keeps its own threshold for runtime broadcast demotion;
    # force both off or the optimizer re-broadcasts from runtime stats
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@pytest.mark.parametrize(
    "key",
    [
        "q4_order_priority",   # EXISTS semi-join, no explicit hint
        "q13_order_counts",    # left outer join + two-level agg
        "q18_large_volume",    # HAVING rollup feeding a fact join
        "d_near_dup_pairs",    # LSH band self-join + 2 verify joins
        "q_part_pairs",        # basket co-occurrence self-join
    ],
)
def test_answers_identical_with_broadcast_disabled(spark, key):
    """No result depends on join-strategy selection: forcing every
    automatic broadcast down to sort-merge must be answer-invariant."""
    q = entry_mod.queries()[key]
    base = _rows(q(spark, SF_DIR))
    with _conf_sweep(spark, **NO_BROADCAST):
        smj = _rows(q(spark, SF_DIR))
    assert smj == base
    assert base, f"{key} returned no rows at sf0.001"


@pytest.mark.parametrize("n_shuffle", ["3", "17"])
def test_two_phase_rank_shuffle_partition_independence(spark, n_shuffle):
    """q_ntile_buckets routes its global order through the two-phase
    distributed rank; the answer must be a pure function of the data,
    not of the partition count the sort/agg stages happen to use."""
    q = entry_mod.queries()["q_ntile_buckets"]
    base = _rows(q(spark, SF_DIR))
    with _conf_sweep(
        spark, **{"spark.sql.shuffle.partitions": n_shuffle}
    ):
        got = _rows(q(spark, SF_DIR))
    assert got == base
    assert base, "q_ntile_buckets returned no rows at sf0.001"
