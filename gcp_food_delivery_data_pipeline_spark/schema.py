"""Schemas for the food-orders pipeline.

Three schemas, mirroring the reference's data model (SURVEY.md §1):

* ``RAW_SCHEMA`` — the 11 input CSV columns, all strings, named after the
  header of ``data/food_daily.csv`` (reference ``code/beam.py:48-66``
  addresses them positionally; we name them up front so Catalyst can
  prune/push down).
* ``OUT_SCHEMA`` — the declared 12-column all-STRING sink shape
  (reference ``code/beam.py:73-86``), with the reference's renames
  ``time`` → ``timestamp`` and ``restaurnt`` → ``restaurant``.
* ``TYPED_SCHEMA`` — the analytics-mode schema the data latently carries
  (integer amount, 1-5 ratings, real dates/timestamps, items as an
  array) — the reference stores strings only; we expose both modes.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DateType,
    DecimalType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Input column order = positional index in the reference's row.split(',')
# (items is index 4, status index 8 — reference code/beam.py:37, :126).
RAW_COLS = [
    "customer_id",
    "date",
    "time",
    "order_id",
    "items",
    "amount",
    "mode",
    "restaurnt",
    "status",
    "ratings",
    "feedback",
]

RAW_SCHEMA = StructType([StructField(c, StringType(), True) for c in RAW_COLS])

# Spark populates this column exactly when a row's token count differs
# from the schema (short OR long rows) — the engine's field-count
# detector for the reference's ``len(cols) < 12`` guard.
CORRUPT_COL = "_corrupt_record"

RAW_SCHEMA_WITH_CORRUPT = StructType(
    list(RAW_SCHEMA.fields) + [StructField(CORRUPT_COL, StringType(), True)]
)

# Output columns in the reference's declared sink order (code/beam.py:73-86).
OUT_COLS = [
    "customer_id",
    "date",
    "timestamp",
    "order_id",
    "items",
    "amount",
    "mode",
    "restaurant",
    "status",
    "ratings",
    "feedback",
    "new_col",
]

OUT_SCHEMA = StructType([StructField(c, StringType(), True) for c in OUT_COLS])

# Input-name -> output-name renames applied by the reference's dict
# projection (code/beam.py:57,61).
RENAMES = {"time": "timestamp", "restaurnt": "restaurant"}

TYPED_SCHEMA = StructType(
    [
        StructField("customer_id", StringType(), True),
        StructField("order_date", DateType(), True),
        StructField("order_ts", TimestampType(), True),
        StructField("order_id", StringType(), True),
        StructField("items", ArrayType(StringType()), True),
        StructField("amount", DecimalType(12, 2), True),
        StructField("mode", StringType(), True),
        StructField("restaurant", StringType(), True),
        StructField("status", StringType(), True),
        StructField("ratings", IntegerType(), True),
        StructField("feedback", StringType(), True),
    ]
)
