"""Price of durability: checkpoint_mode 'local' vs 'reliable' vs
'persist' on the two operator families that materialize most
(VERDICT r12 next-round #5).

tests/test_checkpoint_modes.py proves the three modes result-identical;
a 100 TB deployment also needs the COST number to choose. This tool
measures it: each (key, mode) point runs the graded sf0.1 key in its
own fresh JVM (scale_curve isolation pattern) with the session conf
``spark.foodPipeline.checkpointMode`` set, a /tmp checkpoint dir for
'reliable' (a real cluster would pay an object-store round-trip on
top — this measures the serialize+write+read mechanics, a LOWER
bound on reliable's cluster cost), and reports min-of-2 wall. The
overhead ratio vs 'local' lands in SCALE.md's durability table.

Usage:
    python tools/durability_cost.py                     # both keys, 3 modes
    python tools/durability_cost.py --keys g_pagerank_parts --modes local,reliable
    python tools/durability_cost.py --child g_pagerank_parts reliable  # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
KEYS = ("g_pagerank_parts", "d_containment")
MODES = ("local", "reliable", "persist")
OUT_PATH = os.path.join(REPO, "DURABILITY_COST.json")


def _child(key: str, mode: str) -> int:
    import __spark_entry__ as entry_mod
    from gcp_food_delivery_data_pipeline_spark.checkpointing import CONF_KEY
    from gcp_food_delivery_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"durability-{key}-{mode}")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    try:  # Arrow worker pool warmup
        n = spark.sparkContext.defaultParallelism
        spark.range(n * 10).repartition(n).mapInPandas(
            lambda it: it, "id long"
        ).write.format("noop").mode("overwrite").save()
    except Exception:  # noqa: BLE001
        pass
    if mode == "reliable":
        spark.sparkContext.setCheckpointDir(
            tempfile.mkdtemp(prefix="durability_ckpt_")
        )
    if mode != "local":
        spark.conf.set(CONF_KEY, mode)
    best = None
    rows = None
    for _ in range(2):
        t0 = time.time()
        rows = entry_mod.queries()[key](spark, SF01).count()
        el = round(time.time() - t0, 3)
        best = el if best is None else min(best, el)
        spark.catalog.clearCache()
    print(
        "DURABILITY "
        + json.dumps(
            {"key": key, "mode": mode, "wall_sec": best, "rows": rows},
            separators=(",", ":"),
        )
    )
    spark.stop()
    return 0


def main() -> int:
    argv = sys.argv[1:]
    if argv and argv[0] == "--child":
        return _child(argv[1], argv[2])
    keys, modes = list(KEYS), list(MODES)
    i = 0
    while i < len(argv):
        if argv[i] == "--keys":
            keys = argv[i + 1].split(",")
            i += 2
        elif argv[i] == "--modes":
            modes = argv[i + 1].split(",")
            i += 2
        else:
            raise SystemExit(f"unknown arg {argv[i]}")
    results = []
    if os.path.exists(OUT_PATH):
        results = json.load(open(OUT_PATH)).get("points", [])
    for key in keys:
        for mode in modes:
            print(f"== {key} @ {mode}", flush=True)
            try:
                proc = subprocess.run(
                    [sys.executable, __file__, "--child", key, mode],
                    capture_output=True,
                    text=True,
                    timeout=1200,
                )
            except subprocess.TimeoutExpired:
                results.append({"key": key, "mode": mode, "error": "timeout"})
                continue
            line = next(
                (
                    ln
                    for ln in proc.stdout.splitlines()
                    if ln.startswith("DURABILITY ")
                ),
                None,
            )
            if line is None:
                tail = (proc.stderr or proc.stdout or "")[-300:]
                print(f"   FAILED: {tail}", flush=True)
                results.append(
                    {"key": key, "mode": mode, "error": tail[-200:]}
                )
                continue
            point = json.loads(line[len("DURABILITY "):])
            results = [
                p
                for p in results
                if not (p.get("key") == key and p.get("mode") == mode)
            ] + [point]
            print(f"   {point['wall_sec']} s ({point['rows']} rows)", flush=True)
    with open(OUT_PATH, "w") as f:
        json.dump(
            {
                "method": (
                    "fresh JVM per (key,mode), sf0.1, min-of-2; "
                    "reliable -> /tmp checkpoint dir (lower bound on "
                    "cluster object-store cost)"
                ),
                "points": results,
            },
            f,
            indent=1,
        )
    print(f"wrote {OUT_PATH}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
