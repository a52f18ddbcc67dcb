"""Custom connector via the Python DataSource API (Spark 4).

The reference IS a connector (ClickHouse ↔ files); this module shows
the engine's extension point for new sources: a `DataSource` subclass
with *partition planning* — the driver plans N row-range splits, each
executor task generates/fetches only its split. A real network
connector (JDBC page ranges, ClickHouse shard scans, REST cursors)
swaps the `read()` body; the planning/registration shape is identical.

The built-in source here is a deterministic arithmetic row generator
(`synthetic_rows`), so its output is reproducible and fully
SQL-expressible — the DuckDB oracle replays the same arithmetic over
``range()``, giving the connector a hash-checked correctness gate
(rare for connectors; possible because generation is pure).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class SyntheticRowsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_rows = int(options.get("rows", "1000"))
        self.n_parts = int(options.get("partitions", "8"))

    def partitions(self):
        """Driver-side split planning: contiguous row ranges. At scale
        this is where a connector maps shards/pages/offsets to tasks."""
        step = max(1, self.n_rows // self.n_parts)
        parts = []
        start = 0
        while start < self.n_rows:
            parts.append(_RangePartition(start, min(start + step, self.n_rows)))
            start += step
        return parts

    def read(self, partition: _RangePartition):
        """Executor-side: generate only this split's rows. Pure
        arithmetic — the DuckDB oracle replays it exactly."""
        for i in range(partition.start, partition.end):
            yield (i, i % 97, (i * 31) % 1000 / 10.0, i % 30)


class SyntheticRowsDataSource(DataSource):
    """``spark.read.format("synthetic_rows").option("rows", N)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_rows"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, amount double, day bigint"

    def reader(self, schema) -> SyntheticRowsReader:
        return SyntheticRowsReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotent registration into the session."""
    spark.dataSource.register(SyntheticRowsDataSource)
