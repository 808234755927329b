"""Capture .explain("formatted") for every benched registry query.

Writes ``plans/r14/<query>_<tag>.txt`` (repo root ``plans/`` — the
optimization-round evidence directory, distinct from the
``batch_data_pipeline_exercise_spark/plans`` package). Usage::

    python tests/capture_plans_r14.py before [query ...]
    python tests/capture_plans_r14.py after  [query ...]

With no query names, captures all ``bench=True`` queries. The plan is
captured via the internal ``explainString`` API (same text as
``df.explain("formatted")`` prints) so it can be written to a file.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

from batch_data_pipeline_exercise_spark.plans import contract
from batch_data_pipeline_exercise_spark.plans import contract_ext  # noqa: F401
from batch_data_pipeline_exercise_spark.plans import contract2  # noqa: F401
from batch_data_pipeline_exercise_spark.plans import contract3  # noqa: F401
from batch_data_pipeline_exercise_spark.plans import contract4  # noqa: F401
from batch_data_pipeline_exercise_spark.plans import contract5  # noqa: F401
from batch_data_pipeline_exercise_spark.plans import contract6  # noqa: F401
from batch_data_pipeline_exercise_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or [n for n, q in contract.REGISTRY.items() if q.bench]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_dir = Path(os.environ.get("PLANS_OUT", "/root/repo/plans/r14"))
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark(
        app_name="bdpe-plan-capture",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = contract.REGISTRY[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(txt)
        print(f"captured {name} -> {name}_{tag}.txt ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
