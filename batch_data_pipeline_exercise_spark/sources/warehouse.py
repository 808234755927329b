"""Parquet-backed warehouse layers (raw → stg → dim/fact → metrics).

The reference's warehouse is Postgres tables with UNIQUE constraints and
truncate-reload staging (``process_orders_sqls.py:12,64``). On Parquet
there are no constraints and no UPDATE, so the layer contract is:

- staging: ``overwrite`` per batch (truncate-reload equivalent),
- dimensions: deterministic rebuild + atomic overwrite (SCD2, see
  ``operators/scd2.py``),
- facts: append with anti-join idempotency (``operators/facts.py``).

Writes go through a temp-dir + rename-free overwrite (Spark's dynamic
overwrite handles atomicity at the partition level); fact tables are
partitioned by date for pruning at scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class Warehouse:
    """Thin path registry + IO helper for the Parquet warehouse."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        from batch_data_pipeline_exercise_spark.sources.csv_feed import feed_exists

        return feed_exists(self.spark, os.path.join(self.path(table), "*.parquet")) or feed_exists(
            self.spark, os.path.join(self.path(table), "_SUCCESS")
        )

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    def overwrite(self, df: DataFrame, table: str, partition_by: list[str] | None = None) -> None:
        """Overwrite via temp-dir + rename.

        SCD2 rebuilds read the current dim and replace it; writing straight
        back to the source path would fail ("cannot overwrite a path that
        is also being read from") or corrupt it mid-job. Writing to
        ``<path>__tmp`` and renaming makes the swap safe and near-atomic.
        """
        target, tmp, bak = self.path(table), self.path(table) + "__tmp", self.path(table) + "__bak"
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        jvm = self.spark.sparkContext._jvm  # type: ignore[union-attr]
        conf = self.spark.sparkContext._jsc.hadoopConfiguration()  # type: ignore[union-attr]
        P = jvm.org.apache.hadoop.fs.Path
        fs = P(target).getFileSystem(conf)
        # crash-safe swap: old data survives as __bak until the new data is
        # in place (a crash mid-swap loses nothing; next run cleans up)
        if fs.exists(P(bak)):
            fs.delete(P(bak), True)
        if fs.exists(P(target)):
            fs.rename(P(target), P(bak))
        fs.rename(P(tmp), P(target))
        if fs.exists(P(bak)):
            fs.delete(P(bak), True)

    def append(self, df: DataFrame, table: str, partition_by: list[str] | None = None) -> None:
        """Append, conforming to the existing table's column order.

        Anti-join idempotency patterns reorder columns (join keys come
        first), and parquet directory reads surface whichever part-file
        footer gets sampled — mixed orders make the table's column order
        nondeterministic. Values are always name-resolved; this keeps the
        schema presentation stable too."""
        if self.exists(table):
            df = df.select(*self.read(table).columns)
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(table))

    def compact(self, table: str, target_partitions: int | None = None) -> None:
        """Rewrite a table into ``target_partitions`` files (default: the
        session's parallelism). Append-heavy tables (bronze logs, facts)
        accumulate small part files batch over batch; periodic compaction
        keeps scan task counts sane — the parquet-native stand-in for a
        lakehouse OPTIMIZE."""
        n = target_partitions or self.spark.sparkContext.defaultParallelism
        compacted = self.read(table).repartition(n)
        self.overwrite(compacted, table)

    def analyze(self, table: str, name: str | None = None) -> None:
        """Register in the catalog and compute table statistics so the
        cost-based optimizer can size joins (broadcast decisions, join
        reordering) from real row counts instead of file-size guesses."""
        name = name or table
        self.register_catalog(table, name)
        self.spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")

    def register_catalog(self, table: str, name: str | None = None) -> None:
        """Expose a warehouse table in the session catalog so users can
        ``spark.sql`` against it — the engine's equivalent of the
        reference's CREATE TABLE IF NOT EXISTS DDL (S4,
        process_orders_sqls.py:4,16,54,68,80). External parquet table:
        the catalog entry points at the warehouse path, no data copy."""
        name = name or table
        self.spark.sql(
            f"CREATE TABLE IF NOT EXISTS {name} USING parquet LOCATION '{self.path(table)}'"
        )
