"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual registry lives in
``batch_data_pipeline_exercise_spark/plans/contract.py`` (and
``plans/contract_ext.py`` for the LLM-pipeline extension operators);
this module just re-exports it.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from batch_data_pipeline_exercise_spark.plans import contract
from batch_data_pipeline_exercise_spark.plans import contract_ext  # noqa: F401 — registers extension queries
from batch_data_pipeline_exercise_spark.plans import contract2  # noqa: F401 — registers breadth queries
from batch_data_pipeline_exercise_spark.plans import contract3  # noqa: F401 — registers TPC-H + corpus breadth


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return contract.REGISTRY["revenue_by_region_quarter"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each queries() entry (omitted only
    for genuinely non-SQL-expressible ops → rows-only check)."""
    return contract.oracle_sql()
