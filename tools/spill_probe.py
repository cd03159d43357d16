"""Spill/GC evidence for the prefix-join x100 slope (SCALE.md).

Round 12's rested-box sample settled that `d_prefix_join_slice`'s
x30->x100 per-pair cost growth (~4.7 us -> ~16 us) is real on this
fixed-memory node, not box pollution. SCALE.md attributes it to the
working set crossing into the spill regime; this tool MEASURES that
attribution instead of asserting it: run the slice at one size in a
fresh JVM, then read the completed application's per-stage metrics
from the local Spark UI REST API and report total
memory/disk-spilled bytes, shuffle IO, executor run time and JVM GC
time. Compare x30 vs x100: the regime hypothesis predicts near-zero
spill at x30 and substantial spill (or a much larger GC share) at
x100.

Usage:
    python tools/spill_probe.py x30   /tmp/spark_graft_scale/x30
    python tools/spill_probe.py x100  /tmp/spark_graft_scale/x100

Prints one JSON line: SPILL_PROBE {...}. Run each size in its own
process (fresh JVM per point, as tools/scale_curve.py does).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rest(path: str):
    url = f"http://localhost:4040/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def main() -> int:
    size, sf_dir = sys.argv[1], sys.argv[2]
    import __spark_entry__ as entry_mod
    from gcp_food_delivery_data_pipeline_spark.session import get_spark

    # session.py disables the UI for bench hygiene; the REST metrics
    # endpoint needs it, so this diagnostic re-enables it explicitly
    spark = get_spark(
        app_name=f"spill-probe-{size}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4040"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    try:  # Arrow worker pool warmup (scale_curve pattern)
        n_cpus = spark.sparkContext.defaultParallelism
        spark.range(n_cpus * 10).repartition(n_cpus).mapInPandas(
            lambda it: it, "id long"
        ).write.format("noop").mode("overwrite").save()
    except Exception:  # noqa: BLE001
        pass

    t0 = time.time()
    rows = entry_mod.queries()["d_prefix_join_slice"](spark, sf_dir).count()
    wall = round(time.time() - t0, 3)

    app_id = spark.sparkContext.applicationId
    stages = _rest(f"applications/{app_id}/stages?status=complete")
    agg = {
        "memoryBytesSpilled": 0,
        "diskBytesSpilled": 0,
        "shuffleReadBytes": 0,
        "shuffleWriteBytes": 0,
        "executorRunTime": 0,
        "jvmGcTime": 0,
        "inputBytes": 0,
    }
    for st in stages:
        for k in agg:
            agg[k] += st.get(k, 0)
    out = {
        "size": size,
        "wall_sec": wall,
        "rows": rows,
        "n_stages": len(stages),
        **agg,
        "gc_share": round(
            agg["jvmGcTime"] / max(agg["executorRunTime"], 1), 4
        ),
        "spilled_gib": round(agg["diskBytesSpilled"] / 2**30, 2),
        "shuffle_write_gib": round(agg["shuffleWriteBytes"] / 2**30, 2),
    }
    print("SPILL_PROBE " + json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
