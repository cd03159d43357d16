"""Scale-curve measurement for the grinder operators (VERDICT r10 #2).

Times the five most expensive operator families at four corpus sizes —
x1 (sf0.01: 500 docs / 2,000 parts), x10 (sf0.1: 5,000 / 20,000),
x30 (15,000 / 60,000) and x100 (50,000 / 200,000, the sf1-class
point) — and fits the log-log slope, converting every "bounded by
construction" scale claim in SURVEY §8 / SCALE.md into a measured
exponent. Results land in SCALE_CURVE.json and the summary table in
SCALE.md.

The x30/x100 corpora are GENERATED (deterministic, seed 42) to match
the driver testdata's measured distributions, NOT by replicating
rows — replication would multiply near-duplicate group sizes and
fake a quadratic pair-output term the real data does not have:

- documents: 30-word uniform vocabulary (extracted at runtime from
  sf0.1), token count ~ U{10..100}, and a 5% near-duplicate rate
  where a near-dup copies a uniformly random EARLIER doc and inserts
  the token "dup" at a random position (the exact construction
  observed in the driver data: 243/250 sf0.1 dup-marked docs equal
  another doc's text with " dup" removed, group sizes 1-3 from
  dup-of-dup chains); lang ~ {en:.4, de/es/fr/zh:.15}, source =
  src{i%20}, n_chars = len(text).
- part: p_name = adjective + " " + noun over the observed 8x8 name
  universe (64 distinct names — the property that makes the
  last-token blocking key's blocks grow LINEARLY with the table, so
  fuzzy_name_pairs' in-block pair OUTPUT is inherently quadratic in
  this data shape; the fit must charge that to the output term, not
  the operator).

Each (size, op) point runs in its OWN fresh subprocess (one JVM per
measurement). The first sweep ran one JVM per SIZE with the five ops
sequential inside it, and the residue of a 62 s / 4M-pair prefix
join inflated the LSH ops that followed it 13x (near_dup at x30:
80.3 s in-sequence vs 5.98 s isolated — same code, same data; the
bench.py System.gc()-between-units hygiene was NOT enough at these
shuffle volumes). JVM startup (~20 s/point) is the price of numbers
that are a property of the OPERATOR. Within a point: JVM +
Arrow-worker warmup, then min-of-2 when the first run is cheap
(<30 s), single run otherwise (min-of-2 on a 400 s point doubles
wall-clock for noise the log-log fit doesn't care about).

d_fuzzy_pairs is SKIPPED at x100 by default: its pair output at
200k parts is ~1.25e9 (quadratic, see above), a projected ~70 min
single run. The x1->x30 points pin its exponent; the skip is
recorded in the JSON, not silent.

A full sweep MERGES into the committed SCALE_CURVE.json rather than
clobbering it (ADVICE r11): the committed file carries out-of-band
cells the sweep itself never produces — hand-merged rested-box
``samples`` arrays, ``note`` annotations, and the d_fuzzy_pairs@x100
cell measured outside the sweep budget. Any old cell with a measured
``sec`` whose fresh counterpart is missing/skipped/errored is carried
forward verbatim; annotation keys on a re-measured cell are kept,
with the fresh ``sec`` appended to ``samples``. The prior file is
also backed up to SCALE_CURVE.json.bak before every rewrite.

Usage:
    python tools/scale_curve.py                 # full sweep -> SCALE_CURVE.json
    python tools/scale_curve.py --sizes x1,x10  # subset
    python tools/scale_curve.py --child x30 /tmp/...  # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"
SCRATCH = os.path.join("/tmp", "spark_graft_scale")

# (label, documents rows, part rows, dir-or-None for generated)
SIZES = {
    "x1": (500, 2_000, SF001),
    "x10": (5_000, 20_000, SF01),
    "x30": (15_000, 60_000, None),
    "x100": (50_000, 200_000, None),
}

OPS = [
    "d_prefix_join_slice",
    "t_sparse_nn",
    "d_near_dup_pairs",
    "c_prep_pipeline",
    "d_fuzzy_pairs",
]

# (op, size) pairs whose projected single run exceeds the sweep budget;
# skipped and RECORDED (never silent — the fit uses the smaller sizes).
SKIP = {("d_fuzzy_pairs", "x100")}


def _observed_distributions() -> dict:
    """Extract the generator parameters from the driver's sf0.1 data
    (runtime extraction, not hardcoded copies — regenerated testdata
    changes the proxy automatically)."""
    import duckdb

    doc = f"{SF01}/documents.parquet"
    part = f"{SF01}/part.parquet"
    vocab = [
        r[0]
        for r in duckdb.sql(
            f"with t as (select unnest(string_split(text,' ')) tok from '{doc}')"
            " select distinct tok from t where tok != 'dup' order by tok"
        ).fetchall()
    ]
    langs = duckdb.sql(
        f"select lang, count(*) from '{doc}' group by 1 order by 1"
    ).fetchall()
    total = sum(c for _, c in langs)
    names = [
        r[0].split(" ")
        for r in duckdb.sql(f"select distinct p_name from '{part}'").fetchall()
    ]
    adjs = sorted({a for a, _ in names})
    nouns = sorted({n for _, n in names})
    types = [
        r[0]
        for r in duckdb.sql(
            f"select distinct p_type from '{part}' order by 1"
        ).fetchall()
    ]
    return {
        "vocab": vocab,
        "langs": [(l, c / total) for l, c in langs],
        "adjs": adjs,
        "nouns": nouns,
        "types": types,
    }


def generate_proxy(out_dir: str, n_docs: int, n_parts: int) -> None:
    """Write documents.parquet + part.parquet matching the driver
    testdata's distributions at the requested row counts (seed 42)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    dist = _observed_distributions()
    rng = np.random.default_rng(42)

    vocab = dist["vocab"]
    lang_vals = [l for l, _ in dist["langs"]]
    lang_p = np.array([p for _, p in dist["langs"]])
    lang_p = lang_p / lang_p.sum()

    texts: list[str] = []
    for i in range(n_docs):
        if i > 0 and rng.random() < 0.05:
            base = texts[int(rng.integers(0, i))].split(" ")
            pos = int(rng.integers(0, len(base) + 1))
            texts.append(" ".join(base[:pos] + ["dup"] + base[pos:]))
        else:
            n_tok = int(rng.integers(10, 101))
            toks = rng.integers(0, len(vocab), size=n_tok)
            texts.append(" ".join(vocab[t] for t in toks))
    docs = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(
                [lang_vals[j] for j in rng.choice(len(lang_vals), n_docs, p=lang_p)]
            ),
            "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(out_dir, "documents.parquet"))

    adjs, nouns = dist["adjs"], dist["nouns"]
    a_idx = rng.integers(0, len(adjs), size=n_parts)
    n_idx = rng.integers(0, len(nouns), size=n_parts)
    parts = pa.table(
        {
            "p_partkey": pa.array(range(n_parts), pa.int64()),
            "p_name": pa.array(
                [f"{adjs[a]} {nouns[n]}" for a, n in zip(a_idx, n_idx)]
            ),
            "p_brand": pa.array(
                [f"Brand#{b}" for b in rng.integers(1, 26, size=n_parts)]
            ),
            "p_type": pa.array(
                [dist["types"][t] for t in rng.integers(0, len(dist["types"]), n_parts)]
            ),
            "p_size": pa.array(rng.integers(1, 51, size=n_parts), pa.int32()),
            "p_retailprice": pa.array(
                [900.0 + 0.1 * k for k in range(n_parts)], pa.float64()
            ),
        }
    )
    pq.write_table(parts, os.path.join(out_dir, "part.parquet"))


def _child(size: str, sf_dir: str, ops: list[str] | None = None) -> None:
    """Run the (non-skipped) ops at one size in THIS process's fresh
    JVM; print one JSON line {op: {"sec": s, "rows": n}}."""
    import __spark_entry__ as entry_mod
    from gcp_food_delivery_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"scale_curve_{size}")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    try:  # Arrow worker pool warmup (bench.py pattern)
        n_cpus = spark.sparkContext.defaultParallelism
        spark.range(n_cpus * 10).repartition(n_cpus).mapInPandas(
            lambda it: it, "id long"
        ).write.format("noop").mode("overwrite").save()
    except Exception:  # noqa: BLE001
        pass

    queries = entry_mod.queries()
    out: dict[str, dict] = {}
    for op in ops or OPS:
        if (op, size) in SKIP:
            out[op] = {"skipped": "projected > sweep budget (see module doc)"}
            continue
        try:
            best, rows = None, None
            for attempt in range(2):
                t0 = time.time()
                # count() as the timed action: the full join/verify
                # plan executes AND we get the pair-output row count
                # the exponent fit needs, in one pass.
                rows = queries[op](spark, sf_dir).count()
                el = time.time() - t0
                best = el if best is None else min(best, el)
                spark.catalog.clearCache()
                try:
                    spark.sparkContext._jvm.System.gc()
                except Exception:  # noqa: BLE001
                    pass
                if el >= 30.0:  # min-of-2 only for cheap points
                    break
            out[op] = {"sec": round(best, 3), "rows": rows}
        except Exception as ex:  # noqa: BLE001 — one op never voids the size
            out[op] = {"error": f"{type(ex).__name__}: {ex}"[:300]}
    print("SCALE_CURVE_CHILD " + json.dumps(out), flush=True)


def _fit(points: list[tuple[float, float]]) -> float | None:
    """log-log OLS slope over (scale_mult, seconds) points."""
    import math

    pts = [(m, s) for m, s in points if s and s > 0]
    if len(pts) < 2:
        return None
    xs = [math.log(m) for m, _ in pts]
    ys = [math.log(s) for _, s in pts]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    return round(sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom, 3)


def main() -> int:
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        ops = sys.argv[4].split(",") if len(sys.argv) > 4 else None
        _child(sys.argv[2], sys.argv[3], ops)
        return 0

    wanted = list(SIZES)
    for i, a in enumerate(sys.argv):
        if a == "--sizes":
            wanted = sys.argv[i + 1].split(",")

    ops_filter = None
    for i, a in enumerate(sys.argv):
        if a == "--ops":
            ops_filter = sys.argv[i + 1].split(",")
    results: dict[str, dict] = {}
    for size in wanted:
        n_docs, n_parts, sf_dir = SIZES[size]
        if sf_dir is None:
            sf_dir = os.path.join(SCRATCH, size)
            if not os.path.exists(os.path.join(sf_dir, "part.parquet")):
                print(f"generating {size}: {n_docs} docs / {n_parts} parts")
                generate_proxy(sf_dir, n_docs, n_parts)
        print(f"== {size} ({n_docs} docs / {n_parts} parts)")
        results[size] = {}
        for op in ops_filter or OPS:
            # one fresh JVM PER MEASUREMENT (see module doc: in-JVM
            # residue from a prior op inflated followers up to 13x)
            cmd = [
                sys.executable, os.path.abspath(__file__),
                "--child", size, sf_dir, op,
            ]
            try:
                proc = subprocess.run(
                    cmd, capture_output=True, text=True, timeout=3600
                )
            except subprocess.TimeoutExpired:
                # One hung (size, op) child must not abort the whole
                # ~45-min sweep and lose every completed cell — record
                # it like any other per-op failure and move on.
                results[size][op] = {"error": "timeout: child exceeded 3600s"}
                print(f"  {op}: TIMEOUT (3600s)")
                continue
            line = [
                ln
                for ln in proc.stdout.splitlines()
                if ln.startswith("SCALE_CURVE_CHILD ")
            ]
            if not line:
                results[size][op] = {"error": proc.stderr[-400:]}
                print(f"  {op}: FAILED rc={proc.returncode}")
                continue
            results[size][op] = json.loads(line[-1].split(" ", 1)[1])[op]
            print(f"  {op}: {results[size][op]}")

    # Merge pass (ADVICE r11 / module doc): carry forward out-of-band
    # cells from the committed file so a full sweep cannot silently
    # lose them. Runs BEFORE fitting so exponents see merged points.
    old_path = os.path.join(REPO, "SCALE_CURVE.json")
    old_points: dict[tuple[str, str], dict] = {}
    if os.path.exists(old_path):
        try:
            old = json.load(open(old_path))
            for op, f in (old.get("fits") or {}).items():
                for s, cell in (f.get("points") or {}).items():
                    if isinstance(cell, dict):
                        old_points[(op, s)] = cell
        except Exception:  # noqa: BLE001 — unreadable old file: no merge
            pass
    for size in wanted:
        for op in ops_filter or OPS:
            new = results.get(size, {}).get(op)
            old_cell = old_points.get((op, size))
            if old_cell is None:
                continue
            if not (isinstance(new, dict) and "sec" in new):
                if "sec" in old_cell:
                    # fresh sweep has no measurement here (skip/error/
                    # timeout) but the committed file does: keep it —
                    # and if the fresh attempt ERRORED (vs a planned
                    # skip), surface that beside the carried value
                    # instead of silently masking a new failure
                    kept = dict(old_cell)
                    if isinstance(new, dict) and "error" in new:
                        kept["fresh_error"] = new["error"]
                    results[size][op] = kept
            else:
                for k, v in old_cell.items():
                    if k in ("sec", "rows"):
                        continue
                    if k == "samples" and isinstance(v, list):
                        results[size][op][k] = v + [new["sec"]]
                    else:
                        results[size][op].setdefault(k, v)

    mults = {"x1": 1.0, "x10": 10.0, "x30": 30.0, "x100": 100.0}
    fits = {}
    for op in OPS:
        pts = [
            (mults[s], results.get(s, {}).get(op, {}).get("sec"))
            for s in wanted
            if isinstance(results.get(s, {}).get(op), dict)
        ]
        rows = [
            (mults[s], results.get(s, {}).get(op, {}).get("rows"))
            for s in wanted
            if isinstance(results.get(s, {}).get(op), dict)
        ]
        # Per-segment slopes alongside the global fit: the x1 points
        # carry ~2 s of fixed per-query overhead (planning, stage
        # scheduling) that depresses a global log-log fit, so the
        # LAST segment (largest sizes) is the scale-credible number.
        segs = {}
        for (m0, s0), (m1, s1) in zip(pts, pts[1:]):
            if s0 and s1:
                segs[f"x{int(m0)}->x{int(m1)}"] = _fit([(m0, s0), (m1, s1)])
        fits[op] = {
            "time_exponent": _fit(pts),
            "time_exponent_by_segment": segs,
            "rows_exponent": _fit([(m, r) for m, r in rows if r]),
            "points": {
                s: results.get(s, {}).get(op) for s in wanted
            },
        }
    out = {"sizes": {s: SIZES[s][:2] for s in wanted}, "fits": fits}
    if ops_filter is None and set(wanted) == set(SIZES):
        path = os.path.join(REPO, "SCALE_CURVE.json")
        if os.path.exists(path):
            import shutil

            shutil.copyfile(path, path + ".bak")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {path}")
    else:
        print("diagnostic subset: SCALE_CURVE.json NOT rewritten")
    print(json.dumps({op: {k: v for k, v in f.items() if k != "points"}
                      for op, f in fits.items()}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
