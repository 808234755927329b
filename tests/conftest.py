from __future__ import annotations

import tempfile

import pytest

from batch_data_pipeline_exercise_spark import compat
from batch_data_pipeline_exercise_spark.session import get_spark

# Make google.protobuf importable from a vendored copy when no installed
# one exists (transformWithState's JVM↔Python state protocol needs it),
# and expose the same fallback to Spark Python workers. Must run before
# the first get_spark() call — workers inherit the driver's environment
# only at JVM launch.
if compat.ensure_protobuf():
    compat.propagate_protobuf_to_workers()


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="bdpe-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "4g",
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark-warehouse-"),
        },
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
