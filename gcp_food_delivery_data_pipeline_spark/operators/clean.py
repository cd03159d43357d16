"""The reference's cleaning chain P1→P4 as one Catalyst projection.

Reference semantics (SURVEY.md §2.2, reference code/beam.py:111-120):

  P1 ``remove_last_colon``  — strip at most one trailing ``:`` from the
     ``items`` field (field index 4)            code/beam.py:35-39
  P2 lowercase the entire line (every column)   code/beam.py:118
  P3 delete ``[?%&]`` from every field          code/beam.py:42-45
  P4 append constant field ``new_col = "1"``    code/beam.py:120

plus the dict projection P5 (code/beam.py:48-66): positional naming,
``time``→``timestamp`` / ``restaurnt``→``restaurant`` renames, and the
deployed variant's drop of rows with fewer than the full field count.

The whole chain is expressed as a single ``select`` of column
expressions: Catalyst folds lower+regexp into one generated loop and the
status filters downstream can be pushed through it (the predicate is
column-local). Operator order is preserved exactly (P1 before P2/P3)
for byte-fidelity with the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gcp_food_delivery_data_pipeline_spark.schema import OUT_COLS, RAW_COLS, RENAMES
from gcp_food_delivery_data_pipeline_spark.functions.cleaning import (
    SPECIAL_CHARS_RE,
    TRAILING_COLON_RE,
)


def clean_orders(df: DataFrame, drop_malformed: bool = True) -> DataFrame:
    """Apply P1-P5 to a raw orders DataFrame (RAW_SCHEMA-shaped).

    Returns the 12-column all-string OUT_SCHEMA shape. ``drop_malformed``
    reproduces the deployed variant's length guard (code/beam.py:50-51):
    rows whose ``status`` is NULL (short CSV rows parse to trailing
    NULLs) are dropped rather than emitted as None.
    """
    exprs = []
    for c in RAW_COLS:
        col = F.col(c)
        if c == "items":
            # P1 first (reference order), then P2 lower, then P3 specials.
            col = F.regexp_replace(col, TRAILING_COLON_RE, "")
        col = F.regexp_replace(F.lower(col), SPECIAL_CHARS_RE, "")
        exprs.append(col.alias(RENAMES.get(c, c)))
    exprs.append(F.lit("1").alias("new_col"))

    out = df.select(*exprs)
    if drop_malformed:
        # Short rows → NULL in the last positional fields; the deployed
        # reference drops them before the sink (code/beam.py:50-51).
        out = out.filter(F.col("feedback").isNotNull())
    return out.select(*OUT_COLS)


def typed_orders(cleaned: DataFrame) -> DataFrame:
    """Analytics-mode projection: cast the latent types the reference
    leaves as strings (SURVEY.md §1.2). Input: OUT_SCHEMA-shaped."""
    return cleaned.select(
        F.col("customer_id"),
        F.to_date("date", "M/d/yyyy").alias("order_date"),
        F.to_timestamp(
            F.concat_ws(
                " ", F.col("date"), F.regexp_replace("timestamp", r"\.", ":")
            ),
            "M/d/yyyy H:mm:ss",
        ).alias("order_ts"),
        F.col("order_id"),
        F.split("items", ":").alias("items"),
        F.col("amount").cast("decimal(12,2)").alias("amount"),
        F.col("mode"),
        F.col("restaurant"),
        F.col("status"),
        F.col("ratings").cast("int").alias("ratings"),
        F.col("feedback"),
    )
