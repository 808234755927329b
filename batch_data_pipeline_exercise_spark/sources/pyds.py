"""Custom connector surface: a Spark 4 Python DataSource for JSONL
order-event feed drops (batch + incremental streaming).

The reference ingests daily order-event feed files with a
sensor/scan/load pipeline (reference ``process_orders.py``,
``guides.md`` feed contract); its CSV shape is covered by
``sources/csv_feed.py`` on Spark's native reader. This module covers
the OTHER side of that surface: the connector API a user needs when the
feed format is NOT one Spark ships a reader for (a proprietary wire
format, an internal service). The Python Data Source API
(SPARK-44076, public since Spark 4.0) is the idiomatic extension point,
and this JSONL implementation is the swap-ready exemplar: replace
``_parse_line`` and the glob with your codec/endpoint and every other
mechanism — partition planning, filter pushdown, incremental offsets —
carries over unchanged.

Scale + correctness properties demonstrated (and pinned by tests):

- **Partition planning**: one input partition per feed file, so a
  1000-file drop fans out across the cluster instead of serializing
  through one task.
- **Filter pushdown** (Spark 4.1 ``pushFilters``): ``status = 'x'`` /
  ``IN`` filters are applied inside the reader BEFORE JSON parsing
  (cheap substring pre-screen, exact post-parse check), so a selective
  query never pays full decode cost. Handled filters are consumed;
  everything else is returned for Spark to evaluate.
- **Incremental streaming**: a ``SimpleDataSourceStreamReader`` whose
  offset is the count of lexicographically-ordered processed files —
  feed drops arrive with monotonically increasing names (the
  reference's dated-filename contract), so a single integer offset is
  exact, replayable (``readBetweenOffsets``), and O(1) in state size.

Python-side parsing is the slow path by design budget: this API is for
formats where no JVM reader exists; for JSON/CSV/Parquet Spark's native
readers win and the repo uses them everywhere else.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator
from glob import glob

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

#: the reference feed contract (guides.md): one JSON object per line
FEED_SCHEMA = (
    "id string, productId string, amount int, totalPrice double, status string, timestamp string"
)
_COLS = ["id", "productId", "amount", "totalPrice", "status", "timestamp"]


def _feed_files(path: str) -> list[str]:
    return sorted(glob(os.path.join(path, "*.jsonl")))


def _parse_line(line: str) -> tuple | None:
    line = line.strip()
    if not line:
        return None
    d = json.loads(line)
    amount = d.get("amount")
    total = d.get("totalPrice")
    return (
        d.get("id"),
        d.get("productId"),
        int(amount) if amount is not None else None,
        float(total) if total is not None else None,
        d.get("status"),
        d.get("timestamp"),
    )


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class OrderFeedReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("order_feed requires a path (directory of *.jsonl files)")
        #: status values pinned by pushed EqualTo/In filters (AND semantics)
        self.status_values: list[str] | None = None

    def pushFilters(self, filters):  # noqa: N802 — API name
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("status",) and isinstance(f.value, str):
                new = [f.value]
            elif (
                isinstance(f, In)
                and f.attribute == ("status",)
                and all(isinstance(v, str) for v in f.value)
            ):
                new = list(f.value)
            else:
                yield f  # unsupported — Spark evaluates it post-scan
                continue
            # AND semantics: a consumed filter is one Spark will NOT
            # re-check, so multiple status constraints (status = 'a' AND
            # status IN ('a','b')) must be INTERSECTED, not last-wins —
            # otherwise rows failing the dropped constraint leak through.
            if self.status_values is None:
                self.status_values = new
            else:
                self.status_values = [v for v in self.status_values if v in new]

    def partitions(self) -> list[_FilePartition]:
        files = _feed_files(self.path)
        if not files:
            raise FileNotFoundError(f"no *.jsonl feed files under {self.path}")
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        wanted = self.status_values
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                if wanted is not None and not any(f'"{v}"' in line for v in wanted):
                    continue  # pre-screen: skip JSON parse entirely
                row = _parse_line(line)
                if row is None:
                    continue
                if wanted is not None and row[4] not in wanted:
                    continue  # exact check (substring hit elsewhere in line)
                yield row


class OrderFeedStreamReader(SimpleDataSourceStreamReader):
    """Offset = number of lexicographically-ordered files fully consumed."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("order_feed requires a path (directory of *.jsonl files)")

    def initialOffset(self) -> dict:  # noqa: N802 — API name
        return {"n": 0}

    def _rows_for(self, files: list[str]) -> list[tuple]:
        # a LIST, not a generator: Spark caches the prefetched batch and
        # copy.copy()s the returned iterator for replay — generators are
        # neither copyable nor picklable
        rows: list[tuple] = []
        for p in files:
            with open(p, encoding="utf-8") as fh:
                for line in fh:
                    row = _parse_line(line)
                    if row is not None:
                        rows.append(row)
        return rows

    def read(self, start: dict) -> tuple[list[tuple], dict]:
        files = _feed_files(self.path)
        k = int(start.get("n", 0))
        return self._rows_for(files[k:]), {"n": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        # exact replay after failure: same file slice, same rows
        files = _feed_files(self.path)
        return self._rows_for(files[int(start.get("n", 0)) : int(end.get("n", 0))])


class OrderFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "order_feed"

    def schema(self) -> str:
        return FEED_SCHEMA

    def reader(self, schema: StructType) -> OrderFeedReader:
        return OrderFeedReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> OrderFeedStreamReader:  # noqa: N802
        return OrderFeedStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> "OrderFeedWriter":
        return OrderFeedWriter(self.options, overwrite)


def register(spark) -> None:
    """Idempotent registration: ``spark.read.format('order_feed')``.

    Also enables the conf-gated Python filter-pushdown capability —
    without it Spark refuses to plan a reader that defines
    ``pushFilters`` (fail-closed), rather than silently skipping the
    pushdown.
    """
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(OrderFeedDataSource)


class _FeedCommit(WriterCommitMessage):
    def __init__(self, files: list[str]):
        self.files = files


class OrderFeedWriter(DataSourceWriter):
    """Two-phase-commit JSONL writer.

    Tasks write to a hidden staging dir with attempt-unique names
    (partition id + task attempt id, so a speculative or retried task
    can never clobber another attempt's file) and report their files in
    the commit message. Only the driver-side ``commit`` publishes —
    atomically renaming exactly the reported files into the target and
    deleting everything else in staging (orphans from failed/speculative
    attempts). ``abort`` removes staging wholesale. Readers therefore
    never observe a partial write: the feed contract's dated-filename
    ordering is preserved because published names embed the partition
    index, not the attempt.
    """

    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("order_feed requires a path to write to")
        self.overwrite = overwrite
        self.staging = os.path.join(self.path, "_staging")

    def write(self, iterator) -> _FeedCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid, attempt = ctx.partitionId(), ctx.taskAttemptId()
        os.makedirs(self.staging, exist_ok=True)
        fname = f"part-{pid:05d}-{attempt}.jsonl"
        tmp = os.path.join(self.staging, fname)
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps({c: row[i] for i, c in enumerate(_COLS)}) + "\n")
                n += 1
        if n == 0:
            os.remove(tmp)
            return _FeedCommit([])
        return _FeedCommit([fname])

    def commit(self, messages) -> None:
        published = sorted(f for m in messages if m is not None for f in m.files)
        if self.overwrite:
            for old in _feed_files(self.path):
                os.remove(old)
        # published names are commit-sequence ordered AFTER any existing
        # drop, so an appended batch sorts lexicographically after
        # earlier ones — exactly the monotone-name contract the stream
        # reader's integer offset relies on. Spark calls commit() once,
        # driver-side, so the numbering has a single writer.
        base = len(_feed_files(self.path))
        for i, fname in enumerate(published):
            target = f"orders_{base + i:05d}.jsonl"
            os.replace(os.path.join(self.staging, fname), os.path.join(self.path, target))
        self._clean_staging()

    def abort(self, messages) -> None:
        self._clean_staging()

    def _clean_staging(self) -> None:
        if os.path.isdir(self.staging):
            for f in os.listdir(self.staging):
                os.remove(os.path.join(self.staging, f))
            os.rmdir(self.staging)
