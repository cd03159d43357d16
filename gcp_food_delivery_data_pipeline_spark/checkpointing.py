"""Durability-parameterized lineage materialization (VERDICT r11 #4).

Every iterative / release-point operator in this engine truncates
lineage with ``localCheckpoint(eager=True)`` — the fastest option on a
healthy cluster, but local-checkpoint blocks DIE WITH THEIR EXECUTOR:
at 1000 executors, executor loss is routine, and a long PageRank /
containment-dedup job *fails* instead of recomputing. Until round 12
that caveat lived in docstrings as prose ("a production run would use
reliable ``checkpoint``"); this module makes it a parameter.

Modes (``materialize(df, mode=...)``):

* ``'local'`` — ``df.localCheckpoint(eager)``. Today's default and the
  historical behavior at every call site: fastest (blocks stay on the
  executors that computed them, no FS round-trip), NOT fault-tolerant.
* ``'reliable'`` — ``df.checkpoint(eager)``. Blocks are written to the
  SparkContext checkpoint directory (HDFS / object store on a real
  cluster), so the job survives executor loss at the price of one
  write+read of the materialized data per checkpoint. Fails fast with
  an actionable error if ``setCheckpointDir`` was never called —
  Spark's own error for that case surfaces deep in a job stage.
* ``'persist'`` — ``StorageLevel.MEMORY_AND_DISK`` persist (+
  ``count()`` when ``eager``). Lost blocks are recomputed FROM LINEAGE
  on executor failure — fault-tolerant without needing a distributed
  checkpoint FS — but the logical plan is NOT truncated, so per-round
  plan growth makes this fit for short loops and one-shot pins, not
  deep iteration (plan-depth analysis cost grows every round).

Mode resolution order (``resolve_mode``): an explicit ``mode=``
argument wins; else the session conf ``spark.foodPipeline.
checkpointMode`` (so a deployment flips the whole engine to
``'reliable'`` with one conf, no call-site changes); else ``'local'``.

All three modes are result-identical by construction — they choose
where materialized blocks live, never what is computed. Pinned by
``tests/test_checkpoint_modes.py`` (hash-identical results across
modes on the graph loop, containment dedup, and two-phase rank pin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

CONF_KEY = "spark.foodPipeline.checkpointMode"
VALID_MODES = ("local", "reliable", "persist")


def resolve_mode(df: DataFrame, mode: str | None = None) -> str:
    """Explicit arg > session conf ``spark.foodPipeline.checkpointMode``
    > ``'local'``. Raises ``ValueError`` on an unknown mode so a typo'd
    conf fails at the release point, not as silently-local behavior."""
    if mode is None:
        try:
            mode = df.sparkSession.conf.get(CONF_KEY, "local")
        except Exception:  # noqa: BLE001 — connect-mode conf quirks
            mode = "local"
    if mode not in VALID_MODES:
        raise ValueError(
            f"checkpoint mode {mode!r} not in {VALID_MODES} "
            f"(arg or session conf {CONF_KEY})"
        )
    return mode


def materialize(
    df: DataFrame, eager: bool = True, mode: str | None = None
) -> DataFrame:
    """Cut/pin ``df``'s lineage per the resolved durability mode.

    Drop-in for the historical ``df.localCheckpoint(eager=...)`` call
    sites: with no explicit ``mode`` and no session conf this IS
    ``localCheckpoint`` — zero behavior change for existing callers.
    """
    mode = resolve_mode(df, mode)
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    if mode == "reliable":
        spark = df.sparkSession
        try:
            ckpt_dir = spark.sparkContext.getCheckpointDir()
        except Exception:  # noqa: BLE001 — older API shape
            ckpt_dir = None
        if not ckpt_dir:
            raise RuntimeError(
                "checkpoint mode 'reliable' needs a checkpoint "
                "directory: call spark.sparkContext.setCheckpointDir("
                "'hdfs://... or file:///...') first"
            )
        return df.checkpoint(eager=eager)
    # 'persist': fault-tolerant via lineage recompute; plan NOT cut.
    from pyspark import StorageLevel

    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    if eager:
        out.count()
    return out
