from batch_data_pipeline_exercise_spark.plans.dates import build_dim_dates

__all__ = ["build_dim_dates"]
