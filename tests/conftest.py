from __future__ import annotations

import tempfile

import pytest

from batch_data_pipeline_exercise_spark.session import get_spark

# google.protobuf fallback (transformWithState's JVM↔Python state
# protocol needs it): get_spark() applies compat.worker_env_conf(),
# which covers the driver AND scopes the worker-side shim to
# spark.executorEnv.PYTHONPATH — no process-global mutation here.


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
