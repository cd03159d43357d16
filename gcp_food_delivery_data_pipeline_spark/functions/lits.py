"""Constant-array plan literals that stay SMALL in the unresolved plan.

``F.lit(nested_list)`` expands to a ``CreateArray`` tree carrying one
scalar ``Literal`` node per element. Catalyst re-walks the whole tree
on every analysis pass of every transformation in the builder chain,
so index state embedded this way — a 16x64 centroid table, 8x16x8 PQ
codebooks, a 1024-word Bloom bitmap — costs SECONDS of driver-side
planning per query while contributing nothing to execution
(optimization-guide §7.3: planning time as the bottleneck; profiled
round 15 at sf0.1/local[32]: building ``pq_topk``'s DataFrame spent
~50x longer in analysis than executing it).

``dense_lit`` routes the same values through ``from_json`` of ONE
string literal. The analyzer sees two nodes; ``ConstantFolding``
evaluates the foldable ``from_json`` during optimization, so the
OPTIMIZED plan holds a single array ``Literal`` — same values, same
codegen, same result — and the executed plan is byte-identical to
where the ``F.lit`` route ends up after folding.

Value fidelity: ``json.dumps`` serializes Python floats via ``repr``
(shortest round-trip decimal) and the JVM JSON reader parses with
correct rounding, so every finite double survives bit-for-bit. JSON
cannot carry NaN/Infinity — callers with non-finite constants fall
back to the classic ``F.lit`` route automatically.
"""

from __future__ import annotations

import json
import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _all_finite(values) -> bool:
    if isinstance(values, (list, tuple)):
        return all(_all_finite(v) for v in values)
    if isinstance(values, float):
        return math.isfinite(values)
    return True


def dense_lit(values: list, ddl: str) -> Column:
    """``values`` (a possibly nested list of numbers) as one constant
    array column of DDL type ``ddl`` (e.g. ``"array<array<double>>"``).

    Equivalent to ``F.lit(values)`` after constant folding, but the
    pre-optimization plan carries 2 nodes instead of one per element.
    Falls back to ``F.lit`` when any element is non-finite (JSON has
    no NaN/Infinity tokens; ``from_json`` would silently null them).
    """
    if not _all_finite(values):
        return F.lit(values)
    return F.from_json(F.lit(json.dumps(values)), ddl)
