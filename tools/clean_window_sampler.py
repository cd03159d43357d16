"""Wait for a probe-verified clean window, then take the round's two
pending fresh-JVM samples (VERDICT r12 next-round #4 and #7):

1. ``d_prefix_join_slice`` @ x100 (the second clean sample under the
   salted plan's x100 cell — closes the 2.47-vs-2.02 segment-slope
   band to a two-clean-sample statement, or confirms it real), via
   ``tools/scale_curve.py --child`` (same protocol as the committed
   samples).
2. Full-corpus ``d_prefix_join`` @ sf0.1 (the BASELINE.md history-
   table row of record for r13; expected ~15 s on the salted plan).

Every attempt probes BEFORE (gate: both probes in the clean band,
bench._probe_verdict == 'clean') and AFTER (a post-probe exceeding
the band voids the sample as polluted-in-flight). All attempts —
taken and skipped — append to CLEAN_WINDOW_SAMPLES.json so the
evidence trail shows how many windows were polled.

Usage: python tools/clean_window_sampler.py [--max-minutes 90]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "CLEAN_WINDOW_SAMPLES.json")
X100 = "/tmp/spark_graft_scale/x100"
SF01 = "/root/testdata/sf0.1"
POLL_SEC = 420


def _probe() -> tuple[str, float, float, float, float | None]:
    """One fresh-JVM dual-probe reading (own process so the probe JVM
    never warms the sample JVM)."""
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from gcp_food_delivery_data_pipeline_spark.session import get_spark\n"
        "import bench, json\n"
        "steal0 = bench._read_steal_ticks()\n"
        "spark = get_spark(app_name='probe')\n"
        "spark.range(1_000_000).selectExpr('sum(id)').collect()\n"
        "cal = bench._calibration_probe(spark)\n"
        "cal_io = bench._calibration_probe_io(spark, %r)\n"
        "steal = bench._steal_pct(steal0, bench._read_steal_ticks())\n"
        "v, r = bench._probe_verdict([cal, cal], [cal_io, cal_io], steal)\n"
        "print('PROBE ' + json.dumps([v, r, cal, cal_io, steal]))\n"
        "spark.stop()\n"
    ) % (REPO, SF01)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300,
    )
    for ln in proc.stdout.splitlines():
        if ln.startswith("PROBE "):
            v, r, cal, cal_io, steal = json.loads(ln[6:])
            return v, r, cal, cal_io, steal
    return "unknown", -1.0, -1.0, -1.0, None


def _run_slice_x100() -> dict:
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "scale_curve.py"),
            "--child", "x100", X100, "d_prefix_join_slice",
        ],
        capture_output=True, text=True, timeout=1800,
    )
    for ln in proc.stdout.splitlines():
        if ln.startswith("SCALE_CURVE_CHILD "):
            return json.loads(ln[len("SCALE_CURVE_CHILD "):])
    return {"error": (proc.stderr or proc.stdout or "")[-300:]}


def _run_full_corpus() -> dict:
    code = (
        "import sys, time, json; sys.path.insert(0, %r)\n"
        "from gcp_food_delivery_data_pipeline_spark.session import get_spark\n"
        "import bench, __spark_entry__ as e\n"
        "spark = get_spark(app_name='full-corpus-prefix-join')\n"
        "spark.range(1_000_000).selectExpr('sum(id)').collect()\n"
        "cal = bench._calibration_probe(spark)\n"
        "t0 = time.time()\n"
        "rows = e.queries()['d_prefix_join'](spark, %r).count()\n"
        "wall = round(time.time() - t0, 3)\n"
        "cal2 = bench._calibration_probe(spark)\n"
        "print('FULL ' + json.dumps({'wall_sec': wall, 'rows': rows, "
        "'cal_inproc': [cal, cal2]}))\n"
        "spark.stop()\n"
    ) % (REPO, SF01)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1800,
    )
    for ln in proc.stdout.splitlines():
        if ln.startswith("FULL "):
            return json.loads(ln[5:])
    return {"error": (proc.stderr or proc.stdout or "")[-300:]}


def main() -> int:
    max_minutes = 90.0
    argv = sys.argv[1:]
    if argv and argv[0] == "--max-minutes":
        max_minutes = float(argv[1])
    t_start = time.time()
    attempts = []
    if os.path.exists(OUT):
        attempts = json.load(open(OUT)).get("attempts", [])

    def _save():
        with open(OUT, "w") as f:
            json.dump(
                {
                    "gate": "bench._probe_verdict clean before AND after",
                    "attempts": attempts,
                },
                f,
                indent=1,
            )

    while (time.time() - t_start) / 60.0 < max_minutes:
        v, r, cal, cal_io, steal = _probe()
        print(
            f"probe: {v} ratio={r} cal={cal} cal_io={cal_io} "
            f"steal={steal}",
            flush=True,
        )
        if v != "clean":
            attempts.append(
                {"pre_probe": [v, r, cal, cal_io, steal], "action": "skipped"}
            )
            _save()
            time.sleep(POLL_SEC)
            continue
        rec = {
            "pre_probe": [v, r, cal, cal_io, steal],
            "action": "sampled",
        }
        rec["slice_x100"] = _run_slice_x100()
        rec["full_corpus_prefix_join"] = _run_full_corpus()
        v2, r2, cal2, cal_io2, steal2 = _probe()
        rec["post_probe"] = [v2, r2, cal2, cal_io2, steal2]
        rec["verdict"] = (
            "clean" if v2 == "clean" else "polluted-in-flight"
        )
        attempts.append(rec)
        _save()
        print(json.dumps(rec), flush=True)
        if rec["verdict"] == "clean":
            return 0
        time.sleep(POLL_SEC)
    print("no clean window inside budget", flush=True)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
