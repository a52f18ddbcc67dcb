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
