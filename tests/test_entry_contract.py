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
