from gcp_food_delivery_data_pipeline_spark.plans import analytics

__all__ = ["analytics"]
