"""Driver-contract smoke: the three functions the round driver calls
must keep their shapes — entry() produces rows with a stable schema,
every oracle key has a query, and query keys are unique and stable."""

from __future__ import annotations

import __spark_entry__ as entry


def test_entry_runs_and_has_stable_schema(spark):
    df = entry.entry(spark)
    assert df.columns == ["n_name", "revenue", "n_lineitems"]
    assert df.count() > 0


def test_every_oracle_key_has_a_query():
    qs, oracles = entry.queries(), entry.oracle_sql()
    missing = set(oracles) - set(qs)
    assert not missing, f"oracles without queries: {sorted(missing)}"


def test_every_query_has_an_oracle():
    qs, oracles = entry.queries(), entry.oracle_sql()
    rows_only = set(qs) - set(oracles)
    # Even the approximate ops (HLL sketch, LSH ANN) are graded via
    # self-computed accuracy bounds — nothing may be rows-only.
    assert rows_only == set(), f"lost oracles: {sorted(rows_only)}"


def test_part_edges_memo_evicts_replaced_sessions(spark):
    """The shared-edge-table memo drops entries keyed by a replaced
    Spark session's applicationId when a new session inserts: a
    long-lived process cycling sessions must not accumulate dead
    DataFrame references (their localCheckpoint blocks died with the
    session)."""
    entry._PART_EDGES_MEMO.clear()
    dead_key = ("app-DEAD", "/tmp/nowhere", True, 2, False)
    entry._PART_EDGES_MEMO[dead_key] = spark.range(1)
    entry._part_edges(spark, "/root/testdata/sf0.001")
    assert dead_key not in entry._PART_EDGES_MEMO
    live = [k for k in entry._PART_EDGES_MEMO]
    assert live and all(
        k[0] == spark.sparkContext.applicationId for k in live
    )
    entry._PART_EDGES_MEMO.clear()
