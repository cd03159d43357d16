"""Data-quality rule engine tests: per-kind golden counts, NULL
semantics, the single-pass compilation, and error guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_food_delivery_data_pipeline_spark.operators.quality import (
    Rule,
    check_constraints,
    custom,
    in_range,
    in_set,
    matches,
    not_null,
    unique,
)


@pytest.fixture(scope="module")
def messy(spark):
    rows = [
        (1, "a", 10.0, "ok-1"),
        (2, "b", -5.0, "ok-2"),       # range violation
        (2, None, 50.0, "bad"),       # dup key, null name, shape violation
        (3, "c", None, "ok-3"),       # null amount -> range violation
        (3, "c", 999.0, "ok-4"),      # dup key, range violation
    ]
    return spark.createDataFrame(rows, ["id", "name", "amount", "code"])


def test_each_rule_kind_counts_golden(messy):
    out = {
        r.rule: (r.n_violations, r["pass"])
        for r in check_constraints(
            messy,
            [
                not_null("name"),
                in_range("amount", 0.0, 100.0),
                in_set("name", ["a", "b", "c"]),
                matches("code", r"^ok-[0-9]$"),
                unique("id"),
            ],
        ).collect()
    }
    assert out["not_null(name)"] == (1, False)
    # -5 out of range, NULL can't prove membership, 999 out of range
    assert out["in_range(amount)"] == (3, False)
    assert out["in_set(name)"] == (1, False)  # the NULL name
    assert out["matches(code)"] == (1, False)  # "bad"
    assert out["unique(id)"] == (2, False)  # 2x2 and 3x2 -> 1+1 extras


def test_all_pass_on_clean_data(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "name"])
    out = check_constraints(df, [not_null("id"), unique("id")]).collect()
    assert all(r["pass"] and r.n_violations == 0 for r in out)


def test_unique_ignores_null_keys(spark):
    """Null-ness is not duplication (Deequ semantics): N null keys add
    zero uniqueness violations — not_null polices them instead."""
    df = spark.createDataFrame(
        [(None, "a"), (None, "b"), (None, "c"), (1, "d"), (1, "e")],
        "id bigint, name string",
    )
    out = {
        r.rule: (r.n_violations, r["pass"])
        for r in check_constraints(
            df, [unique("id"), not_null("id")]
        ).collect()
    }
    assert out["unique(id)"] == (1, False)  # only the real dup key 1
    assert out["not_null(id)"] == (3, False)


def test_custom_predicate_and_guards(messy):
    out = check_constraints(
        messy, [custom("amount", F.col("amount") > F.col("id"))]
    ).collect()[0]
    # valid rows: 10>1, 50>2, 999>3; invalid: -5>2 false, NULL -> violation
    assert out.n_violations == 2
    with pytest.raises(ValueError):
        check_constraints(messy, [])
    with pytest.raises(ValueError):
        check_constraints(messy, [Rule("custom", "amount")]).collect()
    with pytest.raises(ValueError):
        check_constraints(messy, [Rule("bogus", "amount")]).collect()


def test_count_rules_compile_to_one_aggregation(messy):
    """All non-unique rules share ONE scan+aggregate: the plan holds a
    single Aggregate over the input (uniqueness excluded here)."""
    df = check_constraints(
        messy,
        [not_null("name"), in_range("amount", 0, 100), matches("code", "ok")],
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 1


def test_matches_rule_with_metachars_and_unicode(spark):
    df = spark.createDataFrame(
        [(1, "a.b"), (2, "axb"), (3, "héllo"), (4, None)], ["id", "s"]
    )

    def violations(pattern):
        rows = check_constraints(df, [matches("s", pattern)]).collect()
        assert len(rows) == 1
        return rows[0].n_violations

    # escaped dot: only the literal 'a.b' passes; NULL counts too
    assert violations(r"^a\.b$") == 3
    # unicode letter class matches the accented char
    assert violations(r"^h\p{L}llo$") == 3  # only 'héllo' passes


def test_duplicate_rule_names_disambiguated(spark):
    df = spark.createDataFrame([(1, "a.b"), (2, "x")], ["id", "s"])
    rows = check_constraints(
        df, [matches("s", r"^a\.b$"), matches("s", r"^x$")]
    ).collect()
    assert sorted(r.rule for r in rows) == ["matches(s)", "matches(s)#2"]
    got = {r.rule: r.n_violations for r in rows}
    assert got["matches(s)"] == 1 and got["matches(s)#2"] == 1
