"""gcp_food_delivery_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``SakkoumHamza/gcp-food-delivery-data-pipeline`` (a GCP
Beam/Dataflow batch-ETL pipeline; see SURVEY.md), extended with the
operators a large-scale training-data pipeline needs (dedup, similarity
search, text analysis, multimodal columns).

Design principles (enforced throughout):

* **DataFrame, not RDD** — every operator is declared via the DataFrame /
  SQL API so Catalyst gets full visibility (pushdown, pruning, reordering,
  whole-stage codegen).
* **JVM-side expressions** — no row-at-a-time Python UDFs in any hot path;
  the few places Python is unavoidable use Arrow-batched pandas UDFs.
* **Shuffle-aware** — small dimensions are broadcast, aggregations rely on
  partial (map-side) combine, skew is handled by AQE, and wide fan-outs
  reuse a single persisted scan instead of re-reading.
"""

from gcp_food_delivery_data_pipeline_spark.session import get_spark
from gcp_food_delivery_data_pipeline_spark.pipeline import run_pipeline

__all__ = ["get_spark", "run_pipeline"]
__version__ = "0.1.0"
