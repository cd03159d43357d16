"""Stage-level AQE-serialization sweep for the iterative graph family
and the two-phase rank machinery (VERDICT r12 next-round #3).

Round 12's profiling found the repo's one real scale-killer class:
AQE sizes shuffle partitions by BYTES, so rows-heavy/bytes-light
exchanges (integer pairs compress to ~0.15 B/row) get coalesced onto
1-3 tasks ahead of expensive per-row work. The pairs family was swept
and width-pinned; this tool applies the SAME per-stage task-count
methodology to the other two structurally-exposed families — the
iterative graph loops (integer-id frontier/rank shuffles every round)
and the corpus two-phase global rank — at x30/x100, where the hazard
would bite if it exists.

Ops:

* ``pagerank`` / ``bfs`` / ``cc`` — the operators behind
  ``g_pagerank_parts`` / ``g_bfs_parts`` / ``d_dup_components``, run
  on a part-co-occurrence graph. x10 is the REAL sf0.1 lineitem
  graph (2.39M directed edges / 20k parts); x30/x100 are
  deterministically synthesized basket tables whose basket-size
  distribution is EXTRACTED from sf0.1 at runtime and whose part
  choice is md5-uniform (matching TPC-H's uniform l_partkey), giving
  ~7.2M / ~24M directed edges — the linear extrapolation the real
  generator would produce.
* ``rank`` — ``corpus.pack_greedy_closed_form``-style two-phase
  global rank via the graded ``c_token_budget`` key over the
  scale-proxy documents corpora that ``tools/scale_curve.py``
  generates (x10 = sf0.1 real documents).

Each (op, size) point runs in its OWN fresh subprocess (one JVM per
measurement — the scale_curve lesson: ops sharing a JVM contaminate
each other beyond what System.gc() fixes). The child enables the UI
and reads per-stage numTasks / executorRunTime / shuffle records from
the REST API; a stage with numTasks <= 4 and executorRunTime > 2 s is
flagged as AQE-serialized (the exact signature that caught the pairs
family). Results print one JSON line per point and aggregate into
GRAPH_SCALE_PROBE.json (merged, never clobbered).

Usage:
    python tools/graph_scale_probe.py                      # full sweep
    python tools/graph_scale_probe.py --ops pagerank,cc --sizes x30
    python tools/graph_scale_probe.py --child pagerank x100  # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SCRATCH = "/tmp/spark_graft_scale"
OUT_PATH = os.path.join(REPO, "GRAPH_SCALE_PROBE.json")

# (label, n_orders, n_parts): x10 is the real sf0.1 graph; the
# synthetic sizes scale orders/parts linearly from sf0.1's measured
# 147,236 orders / 20,000 parts (edge count scales with orders).
SIZES = {
    "x10": (147_236, 20_000),
    "x30": (441_708, 60_000),
    "x100": (1_472_360, 200_000),
}
OPS = ("pagerank", "bfs", "cc", "rank")

SERIALIZED_MAX_TASKS = 4
SERIALIZED_MIN_MS = 2_000


def _basket_cdf() -> list[tuple[int, float]]:
    """Empirical basket-size CDF from sf0.1 lineitem (runtime
    extraction, scale_curve-style — regenerated testdata changes the
    synthetic graph automatically)."""
    import duckdb

    rows = duckdb.sql(
        "with li as (select distinct l_orderkey, l_partkey from "
        f"'{SF01}/lineitem.parquet') "
        "select cnt, count(*) n from (select l_orderkey, count(*) cnt "
        "from li group by 1) group by 1 order by 1"
    ).fetchall()
    total = sum(n for _, n in rows)
    cdf, acc = [], 0.0
    for size, n in rows:
        acc += n / total
        cdf.append((int(size), acc))
    cdf[-1] = (cdf[-1][0], 1.0)
    return cdf


def _synthetic_baskets(spark, n_orders: int, n_parts: int):
    """Deterministic (order, part) basket table: basket size from the
    empirical sf0.1 CDF via an md5-uniform draw, parts md5-uniform
    (TPC-H l_partkey is uniform). Pure Column expressions — the
    generator itself must not be the bottleneck at 1.5M orders."""
    from pyspark.sql import functions as F

    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("b"), F.col("id"))), 1, 8),
            16,
            10,
        ).cast("double")
        / F.lit(float(2**32))
    )
    cdf = _basket_cdf()
    expr = F.lit(cdf[-1][0])
    for size, p in reversed(cdf[:-1]):
        expr = F.when(u <= F.lit(p), F.lit(size)).otherwise(expr)
    items = (
        spark.range(n_orders)
        .withColumn("_b", expr)
        .select(
            F.col("id").alias("okey"),
            F.explode(F.sequence(F.lit(1), F.col("_b"))).alias("_j"),
        )
    )
    part = F.conv(
        F.substring(
            F.md5(F.concat_ws("_", F.col("okey"), F.col("_j"))), 1, 12
        ),
        16,
        10,
    ).cast("long") % F.lit(n_parts)
    return items.select("okey", part.alias("pkey")).distinct()


def _edges(spark, size: str, min_n: int, keep_weight: bool):
    """Directed symmetric co-occurrence edges, the _part_edges shape:
    x10 from the real sf0.1 lineitem, larger sizes synthetic."""
    from pyspark.sql import functions as F

    if size == "x10":
        from gcp_food_delivery_data_pipeline_spark.sources.readers import (
            load_table,
        )

        li = load_table(spark, SF01, "lineitem").select(
            F.col("l_orderkey").alias("okey"),
            F.col("l_partkey").alias("pkey"),
        ).distinct()
    else:
        n_orders, n_parts = SIZES[size]
        li = _synthetic_baskets(spark, n_orders, n_parts)
    a = li.toDF("okey", "src")
    b = li.toDF("okey", "dst")
    pairs = (
        a.join(b, "okey")
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    if min_n > 1:
        pairs = pairs.filter(F.col("w") >= min_n)
    if not keep_weight:
        pairs = pairs.select("src", "dst")
    return pairs


def _run_op(spark, op: str, size: str) -> int:
    from pyspark.sql import functions as F

    if op == "pagerank":
        from gcp_food_delivery_data_pipeline_spark.operators.graph import (
            pagerank,
        )

        e = _edges(spark, size, min_n=1, keep_weight=True)
        return pagerank(e, damping=0.85, iterations=10, weight="w").count()
    if op == "bfs":
        from gcp_food_delivery_data_pipeline_spark.operators.graph import (
            bfs_distances,
        )

        # min_n=1 (the graded key filters to min_n=2): repeat
        # co-orders are vanishingly rare under the synthetic uniform
        # part draw, so the min_n=2 graph would be near-empty at
        # x30/x100 — the probe must drive the FULL-size frontier
        # shuffles, which is the hazard class under test
        e = _edges(spark, size, min_n=1, keep_weight=False)
        seeds = e.select(F.col("src").alias("node")).filter(
            F.col("node") <= 5
        )
        return bfs_distances(e, seeds, max_hops=4).count()
    if op == "cc":
        from gcp_food_delivery_data_pipeline_spark.operators.dedup import (
            connected_components,
        )

        # min_n=1 for the same reason as bfs: the label-propagation
        # loop must shuffle corpus-sized id frames to expose the
        # AQE byte-coalescing hazard, not a 7k-edge remnant
        e = _edges(spark, size, min_n=1, keep_weight=False).filter(
            F.col("src") < F.col("dst")
        )
        pairs = e.select(
            F.col("src").alias("id_a"), F.col("dst").alias("id_b")
        )
        verts = (
            pairs.select(F.col("id_a").alias("doc_id"))
            .unionByName(pairs.select(F.col("id_b").alias("doc_id")))
            .distinct()
        )
        return connected_components(pairs, verts).count()
    if op == "rank":
        # the graded two-phase-rank key over the scale-proxy corpus
        import __spark_entry__ as entry_mod

        sf_dir = SF01 if size == "x10" else os.path.join(SCRATCH, size)
        if not os.path.isdir(sf_dir):
            raise RuntimeError(
                f"{sf_dir} missing — run tools/scale_curve.py first to "
                "generate the proxy corpora"
            )
        return entry_mod.queries()["c_token_budget"](spark, sf_dir).count()
    raise ValueError(op)


def _rest(path: str):
    with urllib.request.urlopen(
        f"http://localhost:4040/api/v1/{path}", timeout=10
    ) as r:
        return json.loads(r.read().decode())


def _child(op: str, size: str) -> int:
    from gcp_food_delivery_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name=f"graph-probe-{op}-{size}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4040"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    t0 = time.time()
    n_out = _run_op(spark, op, size)
    wall = round(time.time() - t0, 3)

    app_id = spark.sparkContext.applicationId
    stages = _rest(f"applications/{app_id}/stages?status=complete")
    slow_serialized = []
    n_stages = 0
    total_run_ms = 0
    brief = []
    for st in stages:
        n_stages += 1
        rt = st.get("executorRunTime", 0)
        total_run_ms += rt
        brief.append(
            {
                "stageId": st.get("stageId"),
                "numTasks": st.get("numTasks"),
                "executorRunTimeMs": rt,
                "shuffleReadRecords": st.get("shuffleReadRecords", 0),
                "shuffleWriteRecords": st.get("shuffleWriteRecords", 0),
                "name": (st.get("name") or "")[:80],
            }
        )
        if (
            st.get("numTasks", 0) <= SERIALIZED_MAX_TASKS
            and rt > SERIALIZED_MIN_MS
        ):
            slow_serialized.append(brief[-1])
    # the 5 hottest stages, so a "no serialized stage" verdict also
    # records WHERE the time went and at what width
    hot = sorted(
        brief, key=lambda s: s["executorRunTimeMs"], reverse=True
    )[:5]
    out = {
        "op": op,
        "size": size,
        "wall_sec": wall,
        "n_output": n_out,
        "n_stages": n_stages,
        "executor_run_total_ms": total_run_ms,
        "serialized_stages": slow_serialized,
        "n_serialized": len(slow_serialized),
        "hot_stages": hot,
    }
    print("GRAPH_PROBE " + json.dumps(out, separators=(",", ":")))
    spark.stop()
    return 0


def main() -> int:
    argv = sys.argv[1:]
    if argv and argv[0] == "--child":
        return _child(argv[1], argv[2])
    sizes = list(SIZES)
    ops = list(OPS)
    i = 0
    while i < len(argv):
        if argv[i] == "--sizes":
            sizes = argv[i + 1].split(",")
            i += 2
        elif argv[i] == "--ops":
            ops = argv[i + 1].split(",")
            i += 2
        else:
            raise SystemExit(f"unknown arg {argv[i]}")
    results = []
    if os.path.exists(OUT_PATH):
        results = json.load(open(OUT_PATH)).get("points", [])
    for op in ops:
        for size in sizes:
            print(f"== {op} @ {size}", flush=True)
            # fresh JVM per point (scale_curve pattern); a timeout
            # marks the point failed without killing the sweep
            try:
                proc = subprocess.run(
                    [sys.executable, __file__, "--child", op, size],
                    capture_output=True,
                    text=True,
                    timeout=2400,
                )
            except subprocess.TimeoutExpired:
                print(f"   TIMEOUT {op}@{size}", flush=True)
                results.append({"op": op, "size": size, "error": "timeout"})
                continue
            line = next(
                (
                    ln
                    for ln in proc.stdout.splitlines()
                    if ln.startswith("GRAPH_PROBE ")
                ),
                None,
            )
            if line is None:
                tail = (proc.stderr or proc.stdout or "")[-400:]
                print(f"   FAILED {op}@{size}: {tail}", flush=True)
                results.append(
                    {"op": op, "size": size, "error": tail[-200:]}
                )
                continue
            point = json.loads(line[len("GRAPH_PROBE "):])
            # merge: newest stage data wins, but every prior wall
            # sample is retained (this box's drift only inflates —
            # min-of-samples is the comparable number)
            prev = next(
                (
                    p
                    for p in results
                    if p.get("op") == op and p.get("size") == size
                ),
                None,
            )
            if prev and prev.get("samples"):
                samples = list(prev["samples"])
            elif prev and prev.get("wall_sec") is not None:
                samples = [prev["wall_sec"]]
            else:
                samples = []
            point["samples"] = samples + [point["wall_sec"]]
            point["wall_min_sec"] = min(point["samples"])
            results = [
                p
                for p in results
                if not (p.get("op") == op and p.get("size") == size)
            ] + [point]
            print(
                f"   wall {point['wall_sec']} s, {point['n_stages']} "
                f"stages, serialized: {point['n_serialized']}",
                flush=True,
            )
    with open(OUT_PATH, "w") as f:
        json.dump(
            {
                "method": (
                    "fresh JVM per (op,size); REST per-stage metrics; "
                    f"serialized = numTasks<={SERIALIZED_MAX_TASKS} and "
                    f"executorRunTime>{SERIALIZED_MIN_MS}ms"
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
