from batch_data_pipeline_exercise_spark.sources.csv_feed import read_csv_feed
from batch_data_pipeline_exercise_spark.sources.warehouse import Warehouse

__all__ = ["read_csv_feed", "Warehouse"]
