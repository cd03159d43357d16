"""Self-check: run every __spark_entry__.queries() entry against its
oracle_sql() via DuckDB at sf0.01 — the same contract the driver grades
(row-count + column names + order-insensitive value hash).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from gcp_food_delivery_data_pipeline_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(rows, columns) -> str:
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "|".join(_norm_cell(r[i]) for i in idx) for r in rows
    )
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


# DuckDB result types whose serialized representation differs from the
# Spark-side type even when every value is numerically identical —
# exactly the class of hash-only "failure" round 4 hit (HUGEINT from
# an uncast sum()/windowed sum over integers). The local replica's
# str() normalization structurally CANNOT see these, so lint them out
# of existence: every oracle must cast to BIGINT/DOUBLE explicitly.
_HASH_UNSAFE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")

# Nested result types crash the DRIVER's canonicalizer outright
# (round 5: `v_random_projection` returned array<double> and pandas
# factorize raised "unhashable type: list" — the suite's only nested
# column). Graded results must be scalar-only: explode arrays to rows
# or project components to wide scalar columns instead.
_NESTED_MARKERS = ("[]", "STRUCT", "MAP(", "LIST", "UNION(")


def lint_oracle_types(con, oracles: dict[str, str]) -> list[str]:
    """Bind every oracle (no execution) and flag result columns whose
    DuckDB type is representation-sensitive under the driver's value
    hash (HUGEINT/DECIMAL) or nested and therefore un-canonicalizable
    by the driver (LIST/STRUCT/MAP). Returns a list of
    'key.column: TYPE' problems."""
    problems = []
    for name, sql in oracles.items():
        try:
            rel = con.sql(sql)
        except Exception as ex:
            problems.append(f"{name}: oracle does not bind: {ex}")
            continue
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ).upper()
            if any(t.startswith(b) for b in _HASH_UNSAFE_TYPES):
                problems.append(f"{name}.{col}: {t}")
            elif any(m in t for m in _NESTED_MARKERS):
                problems.append(f"{name}.{col}: nested type {t}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    lint = lint_oracle_types(con, entry_mod.oracle_sql())
    if lint:
        print("ORACLE TYPE LINT FAILURES (cast to BIGINT/DOUBLE):")
        for p in lint:
            print(f"  {p}")
        return 1
    print(f"oracle type lint: clean ({len(entry_mod.oracle_sql())} oracles)")

    spark = get_spark(app_name="check-correctness")
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(s_rows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            rel = con.sql(oracles[name])
            o_cols = [c for c in rel.columns]
            o_rows = rel.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {ex}")
            n_fail += 1
            continue
        rows_ok = len(s_rows) == len(o_rows)
        schema_ok = sorted(s_cols) == sorted(o_cols)
        hash_ok = (
            value_hash(s_rows, s_cols) == value_hash(o_rows, o_cols)
            if rows_ok and schema_ok
            else False
        )
        status = "PASS" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        detail = ""
        if not rows_ok:
            detail = f" rows {len(s_rows)} vs {len(o_rows)}"
        elif not schema_ok:
            detail = f" schema {sorted(s_cols)} vs {sorted(o_cols)}"
        elif not hash_ok:
            detail = " value-hash mismatch"
            for sr, orow in zip(
                sorted(map(str, s_rows))[:3], sorted(map(str, o_rows))[:3]
            ):
                if sr != orow:
                    detail += f"\n    spark : {sr}\n    oracle: {orow}"
        print(f"{status} {name}: {len(s_rows)} rows [{time.time()-t0:.1f}s]{detail}")
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
