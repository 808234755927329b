"""Deliberately-skewed sf1 variant for the round-9 skew stress
(``tests/skew_stress.py`` → SCALE.md).

Takes a ``gen_sf_scale.py`` output (default /tmp/sf1) and rewrites two
tables with ONE Zipf-head hot key holding ≈30% of rows — the shape AQE's
input-byte skew splitting sees but a single reduce task still has to
process when the operator is key-hashed:

- ``lineitem``: 30% of rows get ``l_partkey`` = the minimum existing
  part key (hot dim-join key for ``salted_brand_revenue`` vs its plain
  unsalted twin);
- ``events``: 30% of rows get ``user_id`` = the minimum existing user id
  (hot window-partition key for ``user_sessions`` /
  ``scd2_incremental_intervals``).

Selection is a deterministic content hash of each table's unique row key
(``pmod(xxhash64(key), 10) < 3``), so re-runs are byte-stable and no
rand-replay hazard exists. All other tables copy through unchanged.
DuckDB oracles run on the SAME skewed parquet, so every oracle-paired
query stays exactly checkable.

Usage: python tests/gen_skew_data.py [src_dir] [out_dir]
Defaults: /tmp/sf1 → /tmp/sf1skew. Re-run is a full overwrite.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from batch_data_pipeline_exercise_spark.plans.contract import load  # noqa: E402
from batch_data_pipeline_exercise_spark.session import get_spark  # noqa: E402


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1skew"
    spark = get_spark(app_name="gen-skew", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    li = load(spark, src, "lineitem")
    hot_part = li.agg(F.min("l_partkey")).first()[0]
    rowkey = F.concat_ws("#", F.col("l_orderkey"), F.col("l_linenumber"))
    li_skew = li.withColumn(
        "l_partkey",
        F.when(F.pmod(F.xxhash64(rowkey), F.lit(10)) < 3, F.lit(hot_part)).otherwise(
            F.col("l_partkey")
        ),
    )
    li_skew.repartition(8).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    print("lineitem done: hot l_partkey =", hot_part)

    e = load(spark, src, "events")
    hot_user = e.agg(F.min("user_id")).first()[0]
    e_skew = e.withColumn(
        "user_id",
        F.when(F.pmod(F.xxhash64(F.col("event_id")), F.lit(10)) < 3, F.lit(hot_user)).otherwise(
            F.col("user_id")
        ),
    )
    e_skew.repartition(4).write.mode("overwrite").parquet(f"{out}/events.parquet")
    print("events done: hot user_id =", hot_user)

    for t in ("region", "nation", "customer", "supplier", "part", "orders", "documents", "embeddings"):
        dst = Path(out) / f"{t}.parquet"
        if dst.exists():
            shutil.rmtree(dst) if dst.is_dir() else dst.unlink()
        src_p = Path(src) / f"{t}.parquet"
        shutil.copytree(src_p, dst) if src_p.is_dir() else shutil.copy(src_p, dst)
        print(t, "copied")
    spark.stop()


if __name__ == "__main__":
    main()
