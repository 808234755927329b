"""CSV feed ingestion.

Replaces the reference's three-step ingest (BashSensor poll → row-by-row
Python ``normalize_csv`` → Postgres ``COPY``; reference
``examples/shared.py:3-25``, ``examples/process_orders.py:23-52``) with a
single parallel, vectorized Spark CSV scan that appends the batch metadata
column. The normalize step disappears: header handling and typing are the
reader's job, and the ``processed_time`` stamp is a literal column.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from batch_data_pipeline_exercise_spark.functions.core import ts_lit


def feed_exists(spark: SparkSession, path: str) -> bool:
    """File-readiness check (reference's BashSensor,
    ``process_orders.py:23-28``) via the Hadoop FS API — works for local
    paths, HDFS and object stores alike."""
    sc = spark.sparkContext
    hpath = sc._jvm.org.apache.hadoop.fs.Path(path)  # type: ignore[union-attr]
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())  # type: ignore[union-attr]
    return bool(fs.globStatus(hpath))


def read_csv_feed(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    ts: datetime | str,
    renames: dict[str, str] | None = None,
) -> DataFrame:
    """Read one daily CSV drop and stamp the batch timestamp.

    ``renames`` maps feed column names to warehouse names (the reference
    renames ``productId`` → ``product_id`` etc. in its staging SELECTs,
    ``process_orders_sqls.py:42-45``).

    Scale note: Spark parallelizes a single large CSV by byte ranges and a
    directory of daily files by file; either way this scan is linear and
    shuffle-free.
    """
    df = spark.read.csv(path, header=True, schema=schema, mode="PERMISSIVE")
    for old, new in (renames or {}).items():
        df = df.withColumnRenamed(old, new)
    return df.withColumn("processed_time", ts_lit(ts))
