"""Batch pipeline entry point — the reference's whole dataflow graph
(SURVEY.md §2.8) as one Spark job group.

Reference graph (code/beam.py:109-193): read → P1..P4 → fan-out to
{F1→count→sink, F2→count→sink, global count}. Beam executes all five
terminal edges in one run; Spark runs one job per action. The one
deliberate physical decision here is to NOT cache at the fan-out
point by default: for a regex-projection of all-string columns the
columnar cache build costs ~5× the work it saves and cache reads are
slower than recomputing from the CSV (measured — see
``run_pipeline``); recomputing the scan+clean per action wins. A
``persist=True`` opt-in covers expensive upstreams.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark import StorageLevel
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from gcp_food_delivery_data_pipeline_spark.config import log_counts
from gcp_food_delivery_data_pipeline_spark.operators.clean import clean_orders
from gcp_food_delivery_data_pipeline_spark.operators.metrics import Counts, run_counts
from gcp_food_delivery_data_pipeline_spark.operators.split import split_by_status
from gcp_food_delivery_data_pipeline_spark.sources.readers import read_orders_csv
from gcp_food_delivery_data_pipeline_spark.sources.writers import (
    with_ingest_date,
    write_status_table,
)


@dataclass(frozen=True)
class PipelineResult:
    counts: Counts
    delivered_path: str
    other_path: str


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    persist: bool = False,
) -> PipelineResult:
    """Clean one batch of orders, split by status, append both tables,
    and return the three run counts (reference entry point B, §3.2).

    ``persist=False`` (default) recomputes the scan+clean for each of
    the three actions. Measured at 1M rows / 13 string columns, the
    columnar cache is a double loss for this shape: building it costs
    ~5× the projection it saves (string column batches compress one
    value at a time), and the partitioned write READING the cache is
    slower than re-parsing the CSV (56s cached vs 11.6s recomputed,
    local[32]). ``persist=True`` is for genuinely expensive upstreams
    (remote object store, heavier parse) where three source passes
    cost more than one cache build.
    """
    raw = read_orders_csv(spark, input_path)
    # drop_malformed=False: the reference counts C1-C3 on cleaned_data
    # BEFORE the len<12 drop (the guard lives in to_json at the sink,
    # code/beam.py:50-51,140-162) — so counts include short rows and
    # only the sinks exclude them.
    cleaned = with_ingest_date(clean_orders(raw, drop_malformed=False))
    if persist:
        cleaned.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        sink_ready = cleaned.filter(~F.col("is_short")).drop("is_short")
        delivered, other = split_by_status(sink_ready)
        delivered_path = f"{output_dir}/delivered_orders"
        other_path = f"{output_dir}/other_status_orders"
        write_status_table(delivered, delivered_path)
        write_status_table(other, other_path)
        counts = run_counts(cleaned)
        # S6 parity: reference logs the three counts (code/beam.py:140-162).
        log_counts(counts.total, counts.delivered, counts.other)
    finally:
        if persist:
            cleaned.unpersist()
    return PipelineResult(
        counts=counts, delivered_path=delivered_path, other_path=other_path
    )
