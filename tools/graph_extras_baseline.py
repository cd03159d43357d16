"""Fresh-JVM min-of-samples baseline rows for the heavy graph extras
(VERDICT r13 next-round #3).

``g_pagerank_parts`` / ``g_ppr`` / ``g_hits`` rotate stalest-first
through the bench extras, so they surface rarely and always
late-suite where session residue is worst (r13: pagerank read
21.88 s in-suite on a drifted run vs 8.98 s fresh-JVM). Their trend
must therefore be read from fresh-JVM min-of-samples rows, which
until r14 existed only informally (DURABILITY_COST / scattered
probes). This tool takes the rows of record: each sample runs the
graded sf0.1 key in its OWN JVM (no shared warmth), brackets it with
the three-probe verdict (cal, cal_io, steal — bench._probe_verdict),
and only probe-clean-bracketed samples are eligible for the min. All
samples, clean or not, append to GRAPH_EXTRAS_BASELINE.json so the
evidence trail shows what was polled.

Usage:
    python tools/graph_extras_baseline.py                 # all keys, 2 samples
    python tools/graph_extras_baseline.py --keys g_ppr --samples 3
    python tools/graph_extras_baseline.py --child g_ppr   # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
KEYS = ("g_pagerank_parts", "g_ppr", "g_hits")
OUT_PATH = os.path.join(REPO, "GRAPH_EXTRAS_BASELINE.json")


def _child(key: str) -> int:
    """One fresh-JVM sample: probe -> min-of-2 key wall -> probe."""
    import bench
    import __spark_entry__ as entry_mod
    from gcp_food_delivery_data_pipeline_spark.session import get_spark

    steal0 = bench._read_steal_ticks()
    spark = get_spark(app_name=f"graph-extras-{key}")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    cal_s = bench._calibration_probe(spark)
    cal_io_s = bench._calibration_probe_io(spark, SF01)
    best = None
    rows = None
    for _ in range(2):
        t0 = time.time()
        rows = entry_mod.queries()[key](spark, SF01).count()
        el = round(time.time() - t0, 3)
        best = el if best is None else min(best, el)
        spark.catalog.clearCache()
    cal_e = bench._calibration_probe(spark)
    cal_io_e = bench._calibration_probe_io(spark, SF01)
    steal = bench._steal_pct(steal0, bench._read_steal_ticks())
    # Absolute bands + steal only — NO spread term: across a 10-min
    # suite the start/end spread witnesses decaying residue, but
    # across a <2-min fresh-JVM sample it mostly measures JIT warmup
    # (r14 attempt 4: first timed unit AT the clean base while the
    # end probes ran 1.7x faster than the start probes). The raw
    # readings are recorded so a consumer can apply the stricter rule.
    readings = [cal_s, cal_e, cal_io_s, cal_io_e]
    if any(v is None for v in readings) or steal is None:
        verdict, ratio = "unknown", None
    else:
        ratios = [
            cal_s / bench.CAL_CLEAN_MAX,
            cal_e / bench.CAL_CLEAN_MAX,
            cal_io_s / bench.CAL_IO_CLEAN_MAX,
            cal_io_e / bench.CAL_IO_CLEAN_MAX,
            steal / bench.STEAL_CLEAN_MAX_PCT,
        ]
        ratio = round(max(ratios), 3)
        verdict = "clean" if ratio <= 1.0 else "drifted"
    print(
        "GRAPH_EXTRAS "
        + json.dumps(
            {
                "key": key,
                "wall_sec": best,
                "rows": rows,
                "cal": [cal_s, cal_e],
                "cal_io": [cal_io_s, cal_io_e],
                "steal_pct": steal,
                "probe_verdict": verdict,
                "drift_ratio": ratio,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()
    return 0


def main() -> int:
    argv = sys.argv[1:]
    if argv and argv[0] == "--child":
        return _child(argv[1])
    keys, samples = list(KEYS), 2
    i = 0
    while i < len(argv):
        if argv[i] == "--keys":
            keys = argv[i + 1].split(",")
            i += 2
        elif argv[i] == "--samples":
            samples = int(argv[i + 1])
            i += 2
        else:
            raise SystemExit(f"unknown arg {argv[i]}")
    doc = {"doc": __doc__.strip().splitlines()[0], "samples": []}
    if os.path.exists(OUT_PATH):
        try:
            with open(OUT_PATH) as f:
                loaded = json.load(f)
            if isinstance(loaded, dict):
                doc = loaded
        except Exception:  # noqa: BLE001 — truncated artifact
            pass
    # A hand-edited / differently-shaped artifact must not KeyError
    # AFTER the (long) sampling loop already started (ADVICE r14).
    doc.setdefault("samples", [])
    for key in keys:
        for _ in range(samples):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", key],
                capture_output=True,
                text=True,
                timeout=1800,
            )
            rec = {"key": key, "error": (proc.stderr or "")[-300:]}
            for ln in proc.stdout.splitlines():
                if ln.startswith("GRAPH_EXTRAS "):
                    rec = json.loads(ln[len("GRAPH_EXTRAS "):])
            doc["samples"].append(rec)
            print(json.dumps(rec), flush=True)
            time.sleep(20)  # let the exited JVM's residue decay
    # min over clean-bracketed samples only — the row of record
    mins: dict[str, dict] = {}
    for rec in doc["samples"]:
        if rec.get("probe_verdict") != "clean":
            continue
        cur = mins.get(rec["key"])
        if cur is None or rec["wall_sec"] < cur["wall_sec"]:
            mins[rec["key"]] = {
                "wall_sec": rec["wall_sec"],
                "rows": rec["rows"],
            }
    doc["min_of_clean_samples"] = mins
    with open(OUT_PATH, "w") as f:
        json.dump(doc, f, indent=1)
    print("min_of_clean_samples: " + json.dumps(mins))
    print(f"wrote {OUT_PATH}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
