"""batch_data_pipeline_exercise_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference batch data pipeline exercise
(``data-community/batch-data-pipeline-exercise``): Kimball-style staging →
SCD Type-2 dimensions → facts → metrics, plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
columns).

Design stance (SURVEY.md §7): pure, parameterized DataFrame transforms
(``f(spark, inputs, ds, ts) -> DataFrame``), Parquet-backed layers,
deterministic + idempotent, with Catalyst/Tungsten doing the physical
planning. No RDDs, no driver-side loops over data.
"""

from batch_data_pipeline_exercise_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
