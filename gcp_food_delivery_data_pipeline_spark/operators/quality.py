"""Declarative data-quality checks (Deequ-style, single-pass).

The reference's only quality surface is three logged counts
(C1-C3, SURVEY.md §2.4); production pipelines grow that into declared
CONSTRAINTS evaluated on every batch: completeness (non-null),
uniqueness, ranges, set membership, regex shape. This module keeps
the reference's spirit — counts, not samples — and the scale shape
is ONE aggregation pass for all rules together:

* every non-uniqueness rule compiles to a conditional-count aggregate
  (``sum(violates ? 1 : 0)``), all evaluated in a single scan with
  map-side partial aggregation — adding a rule adds a column, not a
  pass;
* uniqueness rules need their own keyed aggregation (a count-distinct
  per key column); each runs as one extra shuffle on that key.

Results come back as one row per rule: (rule, column, n_violations,
pass). Engine-stable by construction — integer counts, no floats.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One declared constraint; ``kind`` drives compilation."""

    kind: str  # not_null | unique | in_range | in_set | matches | custom
    column: str
    low: float | None = None
    high: float | None = None
    values: tuple = field(default_factory=tuple)
    pattern: str | None = None
    predicate: Column | None = None  # kind == custom: TRUE where VALID

    @property
    def name(self) -> str:
        return f"{self.kind}({self.column})"


def not_null(column: str) -> Rule:
    return Rule("not_null", column)


def unique(column: str) -> Rule:
    return Rule("unique", column)


def in_range(column: str, low: float, high: float) -> Rule:
    return Rule("in_range", column, low=low, high=high)


def in_set(column: str, values) -> Rule:
    return Rule("in_set", column, values=tuple(values))


def matches(column: str, pattern: str) -> Rule:
    return Rule("matches", column, pattern=pattern)


def custom(column: str, predicate: Column) -> Rule:
    return Rule("custom", column, predicate=predicate)


def _violation(rule: Rule) -> Column:
    """TRUE where the row VIOLATES the rule (NULL counts as a
    violation for every rule except not_null's complement logic —
    a null can't prove it's in range/set/shape)."""
    c = F.col(rule.column)
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "in_range":
        ok = (c >= rule.low) & (c <= rule.high)
    elif rule.kind == "in_set":
        ok = c.isin(*rule.values)
    elif rule.kind == "matches":
        ok = c.rlike(rule.pattern)
    elif rule.kind == "custom":
        if rule.predicate is None:
            raise ValueError("custom rule needs a predicate")
        ok = rule.predicate
    else:
        raise ValueError(f"unknown rule kind: {rule.kind}")
    return ~F.coalesce(ok, F.lit(False))


def check_constraints(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate all rules; returns (rule, column, n_violations, pass).

    One scan covers every count rule; each ``unique`` rule adds one
    keyed aggregation (duplicate rows counted as rows-beyond-first
    per duplicated value, so a key appearing 3x contributes 2; NULL
    keys are skipped — declare ``not_null`` on the same column to
    police nulls).
    """
    if not rules:
        raise ValueError("check_constraints: need at least one rule")
    # Two same-kind rules on one column share a display name; suffix
    # repeats (#2, #3…) so result rows stay unambiguous per rule.
    seen: dict[str, int] = {}
    names: list[str] = []
    for r in rules:
        seen[r.name] = seen.get(r.name, 0) + 1
        names.append(
            r.name if seen[r.name] == 1 else f"{r.name}#{seen[r.name]}"
        )
    named = list(zip(names, rules))
    count_rules = [(n, r) for n, r in named if r.kind != "unique"]
    uniq_rules = [(n, r) for n, r in named if r.kind == "unique"]

    parts = []
    if count_rules:
        aggs = [
            # coalesce: sum() over ZERO rows is NULL, but an empty
            # input vacuously satisfies every rule -> 0 violations
            F.coalesce(F.sum(_violation(r).cast("long")), F.lit(0)).alias(
                f"_v{i}"
            )
            for i, (_, r) in enumerate(count_rules)
        ]
        row = df.agg(*aggs)
        stacked = row.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(n).alias("rule"),
                            F.lit(r.column).alias("column"),
                            F.col(f"_v{i}").alias("n_violations"),
                        )
                        for i, (n, r) in enumerate(count_rules)
                    ]
                )
            ).alias("_r")
        ).select("_r.rule", "_r.column", "_r.n_violations")
        parts.append(stacked)
    for n, r in uniq_rules:
        # Deequ-style uniqueness: NULL keys are excluded — null-ness
        # is not duplication (a groupBy would pool N nulls into one
        # group and report N-1 phantom violations). Pair unique(col)
        # with not_null(col) when nulls themselves are illegal.
        dup = (
            df.filter(F.col(r.column).isNotNull())
            .groupBy(r.column)
            .agg((F.count(F.lit(1)) - 1).alias("_extra"))
            .agg(F.sum("_extra").alias("n_violations"))
            .select(
                F.lit(n).alias("rule"),
                F.lit(r.column).alias("column"),
                F.coalesce("n_violations", F.lit(0)).alias("n_violations"),
            )
        )
        parts.append(dup)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("pass", F.col("n_violations") == 0)
