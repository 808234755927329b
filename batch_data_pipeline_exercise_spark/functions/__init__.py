from batch_data_pipeline_exercise_spark.functions.core import (
    change_detected,
    current_at,
    row_checksum,
    surrogate_key,
)

__all__ = ["change_detected", "current_at", "row_checksum", "surrogate_key"]
