"""Diff two bench outputs: per-query ratios, sorted worst-first.

Usage:
  python tools/bench_compare.py BENCH_r03.json BENCH_r04.json
  python tools/bench_compare.py BENCH_r03.json bench_out.txt

Accepts either the driver's wrapper JSON (with a ``parsed`` payload)
or bench.py's raw one-line JSON; for a text file, the last line
starting with '{' is used.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    text = open(path).read()
    try:
        obj = json.loads(text)
        if isinstance(obj, dict) and "parsed" in obj:
            obj = obj["parsed"]
        if isinstance(obj, dict) and "queries" in obj:
            return obj
    except json.JSONDecodeError:
        pass
    lines = [ln for ln in text.splitlines() if ln.startswith("{")]
    for ln in reversed(lines):
        try:
            obj = json.loads(ln)
            if "queries" in obj:
                return obj
        except json.JSONDecodeError:
            continue
    raise SystemExit(f"{path}: no bench payload found")


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    base, cur = load(sys.argv[1]), load(sys.argv[2])
    bq, cq = base["queries"], cur["queries"]
    print(
        f"total: base={base.get('value')}s cur={cur.get('value')}s "
        f"(sf={cur.get('sf')})"
    )
    # max(base, 1ms): timings are rounded to 3 decimals, so a
    # sub-millisecond base records 0.0 and a bare ratio would divide
    # by zero
    rows = sorted(
        (
            (k, bq[k], v, v / max(bq[k], 0.001))
            for k, v in cq.items()
            if k in bq
        ),
        key=lambda r: -r[3],
    )
    for k, b, c, ratio in rows:
        flag = "  <-- regression" if ratio > 1.5 and c > 1.0 else ""
        print(f"{k:28s} base={b:7.2f} cur={c:7.2f} x{ratio:5.2f}{flag}")
    only_cur = sorted(set(cq) - set(bq))
    if only_cur:
        print("new queries:", ", ".join(only_cur))


if __name__ == "__main__":
    main()
