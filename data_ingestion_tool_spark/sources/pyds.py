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


# ---------------------------------------------------------------------------
# Write path: a Python DataSource SINK with a commit protocol
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage  # noqa: E402


class _StagedFile(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int) -> None:
        self.path = path
        self.n_rows = n_rows


class ChecksumSinkWriter(DataSourceWriter):
    """Executor-side write + driver-side atomic commit — the V2 write
    protocol in miniature: each task stages its split to a uniquely
    named file and returns a commit message; ONLY the driver's
    ``commit()`` makes them visible, by writing a manifest that lists
    exactly the committed files. A failed/speculative task's stray
    file is never manifested, so readers (which must go through the
    manifest) cannot observe partial writes — the same
    visible-iff-committed rule as the txnlog table format."""

    def __init__(self, options) -> None:
        self.root = str(options.get("path"))

    def write(self, iterator):
        import os
        import uuid

        os.makedirs(self.root, exist_ok=True)
        path = os.path.join(self.root, f"staged-{uuid.uuid4().hex}.csv")
        n = 0
        with open(path, "w") as fh:
            for row in iterator:
                fh.write(f"{row[0]},{row[1]}\n")
                n += 1
        return _StagedFile(path, n)

    def commit(self, messages):
        import json
        import os

        manifest = {
            "files": sorted(
                os.path.basename(m.path) for m in messages if m is not None
            ),
            "rows": sum(m.n_rows for m in messages if m is not None),
        }
        tmp = os.path.join(self.root, ".manifest.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, os.path.join(self.root, "_MANIFEST.json"))

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.unlink(m.path)


class ChecksumSinkDataSource(DataSource):
    """``df.write.format("checksum_sink").option("path", dir).save()``
    for two-column (key, value) string rows."""

    @classmethod
    def name(cls) -> str:
        return "checksum_sink"

    def writer(self, schema, overwrite):
        return ChecksumSinkWriter(self.options)


def register_checksum_sink(spark) -> None:
    spark.dataSource.register(ChecksumSinkDataSource)


def read_manifested(spark, root: str):
    """Read back ONLY the manifested files (the sink's visibility
    rule); stray staged files are invisible by construction."""
    import json
    import os

    with open(os.path.join(root, "_MANIFEST.json")) as fh:
        manifest = json.load(fh)
    paths = [os.path.join(root, f) for f in manifest["files"]]
    return spark.read.schema("k string, v string").csv(paths)
