"""Import-gated external ClickHouse routing (api/connector.py).

The optional dependency is NOT in this container, so the default path
proves the fallback; the routed path is proven by injecting a fake
``clickhouse_connect`` module / mock client — never a live server.
Reference behaviors mirrored: SHOW TABLES capped at 1000
(main.py:102), EXISTS + DESCRIBE shape (main.py:133-147), client pool
keyed host:port:db:user with password excluded (main.py:64-87).
"""

from __future__ import annotations

import sys
import types

import pytest

from data_ingestion_tool_spark.api import connector, service
from data_ingestion_tool_spark.api.models import ConnectionInfo


class FakeResult:
    def __init__(self, rows):
        self.result_rows = rows


class FakeClient:
    def __init__(self, tables=None, described=None):
        self.tables = tables or []
        self.described = described or {}
        self.queries = []

    def query(self, sql, settings=None):
        self.queries.append((sql, settings))
        if sql == "SHOW TABLES":
            return FakeResult([(t,) for t in self.tables])
        if sql == "SELECT 1":
            return FakeResult([(1,)])
        if sql.startswith("EXISTS TABLE "):
            return FakeResult([(1 if sql.split()[-1] in self.described else 0,)])
        if sql.startswith("DESCRIBE TABLE "):
            return FakeResult(self.described[sql.split()[-1]])
        raise AssertionError(f"unexpected sql: {sql}")


def test_dependency_absent_falls_back_to_catalog(monkeypatch):
    """The container has no clickhouse_connect: availability is False,
    route() is None even when the env opts in, and the façade keeps
    answering from the session catalog."""
    monkeypatch.setenv("SPARK_GRAFT_CLICKHOUSE", "1")
    assert not connector.clickhouse_available()
    assert connector.route(ConnectionInfo()) is None


def test_env_opt_in_required(monkeypatch):
    """Import availability alone must not flip behavior — no env
    opt-in, no routing, even with the package 'installed'."""
    monkeypatch.delenv("SPARK_GRAFT_CLICKHOUSE", raising=False)
    monkeypatch.setattr(connector, "clickhouse_available", lambda: True)
    assert connector.route(ConnectionInfo()) is None


def test_routed_connect_and_columns(monkeypatch, spark):
    """Routed path with a mock client: connect lists the SERVER's
    tables (not the catalog's), get_columns returns the server's
    DESCRIBE shape, missing tables 404."""
    client = FakeClient(
        tables=["remote_t1", "remote_t2"],
        described={
            "remote_t1": [
                ("id", "UInt64", "", ""),
                ("name", "String", "", "primary name"),
            ]
        },
    )
    conn = ConnectionInfo(host="ch.example.com", port=8123)
    monkeypatch.setattr(
        service, "route", lambda c: connector.ClickHouseBackend(c, client=client)
    )
    out = service.connect(spark, conn)
    assert out["tables"] == ["remote_t1", "remote_t2"]
    assert out["connection"] == "ch.example.com:8123"
    cols = service.get_columns(spark, conn, "remote_t1")
    assert cols["count"] == 2
    assert cols["columns"][1] == {
        "name": "name",
        "type": "String",
        "default": "",
        "comment": "primary name",
    }
    with pytest.raises(service.ApiError) as e:
        service.get_columns(spark, conn, "nope")
    assert e.value.status_code == 404
    # the SHOW TABLES probe carried the reference's 1000-row cap
    assert ("SHOW TABLES", {"max_result_rows": 1000}) in client.queries


def test_route_pools_clients_by_conn_key_without_password(monkeypatch):
    """Full route() path via an injected fake package: clients pool by
    host:port:db:user; a password change REUSES the pooled client
    (excluded from the key, main.py:68); a host change does not."""
    made = []

    def get_client(**kw):
        made.append(kw)
        return FakeClient(tables=["t"])

    fake_pkg = types.ModuleType("clickhouse_connect")
    fake_pkg.get_client = get_client
    monkeypatch.setitem(sys.modules, "clickhouse_connect", fake_pkg)
    monkeypatch.setenv("SPARK_GRAFT_CLICKHOUSE", "1")
    monkeypatch.setattr(connector, "_POOL", {})

    a = connector.route(ConnectionInfo(host="h1", password="p1"))
    b = connector.route(ConnectionInfo(host="h1", password="CHANGED"))
    c = connector.route(ConnectionInfo(host="h2", password="p1"))
    assert a is not None and b is not None and c is not None
    assert a._client is b._client  # password not in the pool key
    assert a._client is not c._client
    assert len(made) == 2
    assert made[0]["password"] == "p1"  # first writer wins the pool slot
    assert a.list_tables() == ["t"]
    assert a.ping()


class FakeClientRW(FakeClient):
    """Adds the write surface (command/insert) for routed export/import."""

    def __init__(self, tables=None, described=None, query_rows=None):
        super().__init__(tables, described)
        self.query_result = query_rows
        self.commands = []
        self.inserts = []

    def query(self, sql, settings=None):
        if self.query_result is not None and sql.startswith("SELECT "):
            self.queries.append((sql, settings))
            return FakeResult(self.query_result)
        return super().query(sql, settings)

    def command(self, sql):
        self.commands.append(sql)

    def insert(self, table, rows, column_names=None):
        self.inserts.append((table, rows, column_names))


def test_routed_export_runs_query_on_server(monkeypatch, spark):
    """Routed export: the façade-built SQL string runs on the server
    (main.py:184); rows come back as the reference's CSV shape; the
    zero-row short-circuit holds."""
    from data_ingestion_tool_spark.api.models import ColumnSelection

    client = FakeClientRW(query_rows=[(1, "a"), (2, "b")])
    conn = ConnectionInfo(host="ch.example.com")
    monkeypatch.setattr(
        service, "route", lambda c: connector.ClickHouseBackend(c, client=client)
    )
    sel = ColumnSelection(table="t1", columns=["id", "name"])
    out = service.export_flatfile(spark, conn, sel)
    assert out["count"] == 2
    assert out["query"] == "SELECT id, name FROM t1"
    assert out["data"].splitlines() == ["id,name", "1,a", "2,b"]
    assert client.queries[-1][0] == "SELECT id, name FROM t1"
    # zero rows -> reference's "No data found" body, no CSV built
    client2 = FakeClientRW(query_rows=[])
    monkeypatch.setattr(
        service, "route", lambda c: connector.ClickHouseBackend(c, client=client2)
    )
    out2 = service.export_flatfile(spark, conn, sel)
    assert out2 == {"status": "success", "data": "", "count": 0,
                    "message": "No data found"}


def test_routed_import_all_string_ddl_and_batching(monkeypatch, spark):
    """Routed import: all-String IF NOT EXISTS DDL (the reference's
    OBSERVED dead-type-mapping behavior) + batched inserts; insert
    batching splits at batch_size with the last partial batch."""
    client = FakeClientRW()
    conn = ConnectionInfo()
    monkeypatch.setattr(
        service, "route", lambda c: connector.ClickHouseBackend(c, client=client)
    )
    csv = "a,b\n" + "\n".join(f"{i},x{i}" for i in range(5)) + "\n"
    out = service.import_flatfile(
        spark, conn, "up.csv", csv.encode(), table="tt"
    )
    assert out["count"] == 5 and out["columns"] == ["a", "b"]
    assert client.commands == [
        "CREATE TABLE IF NOT EXISTS `tt` (`a` String, `b` String) "
        "ENGINE = MergeTree() ORDER BY tuple()"
    ]
    assert len(client.inserts) == 1  # 5 rows < 10k -> one batch
    table, rows, cols = client.inserts[0]
    assert table == "tt" and cols == ["a", "b"] and len(rows) == 5
    assert rows[0] == ["0", "x0"]  # all-string compat parse
    # batch split semantics, directly on the backend (main.py:274)
    be = connector.ClickHouseBackend(conn, client=FakeClientRW())
    n = be.insert_rows("t", ["c"], [[i] for i in range(5)], batch_size=2)
    assert n == 5
    assert [len(r) for _, r, _ in be._client.inserts] == [2, 2, 1]
