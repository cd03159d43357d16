"""Staleness manifest for the driver's 50-key-per-round grading budget.

The driver grades the FIRST 50 keys of ``queries()`` each round, so
keeping every key's latest grade fresh is a rotation problem. This
tool reads every committed CORRECTNESS_r*.json, records each key's
last-graded round (0 = never graded), and writes GRADE_MANIFEST.json
so staleness is visible at a glance — the round's grading priority
list in __spark_entry__._GRADE_FIRST is derived from it: keys whose
results changed this round, then never-graded keys, then oldest-first.

Usage: python tools/grade_manifest.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    import __spark_entry__ as entry_mod

    keys = list(entry_mod.queries().keys())
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            graded = json.load(open(path))
        except Exception:  # noqa: BLE001 — truncated artifact
            continue
        for k in graded:
            last[k] = max(last.get(k, 0), rnd)

    manifest = {
        "keys": {k: last.get(k, 0) for k in keys},
        "never_graded": [k for k in keys if k not in last],
        "oldest_first": sorted(keys, key=lambda k: (last.get(k, 0), k)),
        "by_round": {
            str(r): sorted(k for k in keys if last.get(k, 0) == r)
            for r in sorted({last.get(k, 0) for k in keys})
        },
        "n_keys": len(keys),
        "top_50_next_grade": list(keys[:50]),
    }
    out = os.path.join(REPO, "GRADE_MANIFEST.json")
    with open(out, "w") as f:
        json.dump(manifest, f, indent=1)
    ages = [last.get(k, 0) for k in keys]
    print(
        f"{len(keys)} keys; never graded: {len(manifest['never_graded'])}; "
        f"oldest grade round: r{min(a for a in ages if a) if any(ages) else 0}"
    )
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
