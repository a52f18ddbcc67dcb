"""Optional real-ClickHouse routing for the API façade (import-gated).

The reference actually speaks to a ClickHouse server — a pooled
``clickhouse_connect.get_client`` keyed host:port:db:user with the
password deliberately excluded from the key
(`/root/reference/backend/main.py:64-87`) — while this engine's default
"connection" is the shared SparkSession catalog. This module closes
that parity gap WITHOUT adding a dependency: when

1. ``clickhouse_connect`` is importable (never pip-installed here —
   gated exactly like the optional fastapi dependency), AND
2. the deployment opts in via ``SPARK_GRAFT_CLICKHOUSE=1``,

:func:`route` returns a :class:`ClickHouseBackend` that answers the
catalog-shaped façade calls (SHOW TABLES capped at 1000, EXISTS TABLE,
DESCRIBE TABLE → name/type/default/comment, SELECT 1 health probe —
main.py:102,133-147,311) against the server the ``ConnectionInfo``
names. Otherwise it returns ``None`` and the façade falls back to the
session catalog unchanged.

Routing covers all four endpoints: metadata (list/describe/probe),
export (server-side query → rows, main.py:184), and import (all-String
CREATE TABLE IF NOT EXISTS + 10,000-row batched inserts,
main.py:263-286). Data volumes here are API-sized by construction —
the payload of one HTTP request — exactly like the reference; the
engine's distributed scan/write paths remain the Spark-side default
for anything bigger.
"""

from __future__ import annotations

import os
from typing import Any

from ..catalog import MAX_LIST_TABLES
from .models import ConnectionInfo

# reference main.py:64-66 — module-level pool reused across requests;
# password excluded from the key (main.py:68)
_POOL: dict[str, Any] = {}


def clickhouse_available() -> bool:
    """True when the OPTIONAL clickhouse_connect package is importable."""
    try:
        import clickhouse_connect  # noqa: F401

        return True
    except ImportError:
        return False


def routing_enabled() -> bool:
    """Deployment opt-in: the driver env must set SPARK_GRAFT_CLICKHOUSE=1.
    Import availability alone never flips behavior — an engine embedded
    in an app that happens to ship the package must not silently start
    dialing servers."""
    return os.environ.get("SPARK_GRAFT_CLICKHOUSE", "") == "1"


def route(conn: ConnectionInfo) -> "ClickHouseBackend | None":
    """A ClickHouseBackend for ``conn`` when routing is enabled and the
    package is present; None → caller uses the Spark catalog."""
    if not (routing_enabled() and clickhouse_available()):
        return None
    return ClickHouseBackend(conn)


def _pooled_client(conn: ConnectionInfo):
    key = conn.pool_key
    if key not in _POOL:
        import clickhouse_connect

        _POOL[key] = clickhouse_connect.get_client(
            host=conn.host,
            port=conn.port,
            database=conn.database,
            username=conn.username,
            password=conn.password,
        )
    return _POOL[key]


class ClickHouseBackend:
    """Metadata-call parity against a live server (main.py:96-161,304-334).

    ``client`` is injectable for tests — the routed path is verified
    with a mock client; no live server is ever required."""

    def __init__(self, conn: ConnectionInfo, client: Any | None = None) -> None:
        self.conn = conn
        self._client = client if client is not None else _pooled_client(conn)

    def list_tables(self) -> list[str]:
        res = self._client.query(
            "SHOW TABLES", settings={"max_result_rows": MAX_LIST_TABLES}
        )
        return [row[0] for row in res.result_rows][:MAX_LIST_TABLES]

    def table_exists(self, table: str) -> bool:
        return bool(self._client.query(f"EXISTS TABLE {table}").result_rows[0][0])

    def columns(self, table: str) -> list[dict[str, str]]:
        rows = self._client.query(f"DESCRIBE TABLE {table}").result_rows
        return [
            {
                "name": r[0],
                "type": r[1],
                "default": r[2],
                "comment": r[3],
            }
            for r in rows
        ]

    def ping(self) -> bool:
        return self._client.query("SELECT 1").result_rows[0][0] == 1

    def query_rows(self, sql: str) -> list[tuple]:
        """Export path (main.py:184): run the façade-built SELECT on
        the server and return its row tuples."""
        return self._client.query(sql).result_rows

    def create_table_all_string(
        self, table: str, columns: list[str]
    ) -> str:
        """Reference auto-DDL (main.py:258-271) as OBSERVED: the CSV
        arrives dtype=str/na_filter=False, so every column is pandas
        object and the int/float/bool/datetime branches of its
        type_mapping are dead — every ingested column is String
        (SURVEY §1.2). Emit exactly that table."""
        cols = ", ".join(f"`{c}` String" for c in columns)
        sql = (
            f"CREATE TABLE IF NOT EXISTS `{table}` ({cols}) "
            f"ENGINE = MergeTree() ORDER BY tuple()"
        )
        self._client.command(sql)
        return sql

    def insert_rows(
        self,
        table: str,
        columns: list[str],
        rows: list[list],
        batch_size: int = 10_000,
    ) -> int:
        """The reference's batched append insert (main.py:273-286,
        batch_size=10000): one client.insert per slice, returns rows
        inserted."""
        inserted = 0
        for i in range(0, len(rows), batch_size):
            batch = rows[i : i + batch_size]
            self._client.insert(table, batch, column_names=list(columns))
            inserted += len(batch)
        return inserted
