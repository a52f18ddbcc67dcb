"""End-to-end tests for the service façade — the five reference
endpoints' behavior (response shapes, status codes, compat semantics)
backed by Spark instead of ClickHouse."""

from __future__ import annotations

import pytest

from data_ingestion_tool_spark.api import (
    ApiError,
    ColumnSelection,
    ConnectionInfo,
)
from data_ingestion_tool_spark.api import service


@pytest.fixture(scope="module")
def catalog(spark, sf_dir):
    """Register the customer/orders test tables as temp views (the
    service works against the session catalog, like the reference
    against the CH database)."""
    for t in ("customer", "orders"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    yield spark


CONN = ConnectionInfo()


def test_connect_lists_tables(catalog):
    out = service.connect(catalog, CONN)
    assert out["status"] == "success"
    assert {"customer", "orders"} <= set(out["tables"])
    assert out["connection"] == "localhost:8123"


def test_get_columns_shape(catalog):
    out = service.get_columns(catalog, CONN, "customer")
    assert out["status"] == "success"
    assert out["count"] == len(out["columns"])
    first = out["columns"][0]
    assert set(first) == {"name", "type", "default", "comment"}
    names = [c["name"] for c in out["columns"]]
    assert "c_custkey" in names


def test_get_columns_404(catalog):
    with pytest.raises(ApiError) as e:
        service.get_columns(catalog, CONN, "no_such_table")
    assert e.value.status_code == 404


def test_export_single_table(catalog):
    sel = ColumnSelection("customer", ["c_custkey", "c_name"])
    out = service.export_flatfile(catalog, CONN, sel)
    assert out["status"] == "success"
    # NO BOM: main.py:194's encoding='utf-8-sig' is ignored by to_csv
    # without a path — the reference's actual body is BOM-less
    assert not out["data"].startswith("﻿")
    header = out["data"].splitlines()[0]
    assert header == "c_custkey,c_name"
    assert out["count"] == out["data"].count("\n") - 1
    assert out["query"] == "SELECT c_custkey, c_name FROM customer"


def test_export_count_with_embedded_newlines(catalog):
    """count must equal the row count even when field values carry
    quoted embedded newlines (newline-counting would overcount)."""
    catalog.createDataFrame(
        [(1, "line1\nline2"), (2, "plain")], "id int, note string"
    ).createOrReplaceTempView("notes_nl")
    out = service.export_flatfile(
        catalog, CONN, ColumnSelection("notes_nl", ["id", "note"])
    )
    assert out["count"] == 2
    assert out["data"].count("\n") == 4  # header + 2 rows + 1 embedded


def test_export_over_limit_maps_to_500(catalog, monkeypatch):
    """The bounded-collect guard surfaces as the reference's blanket
    500, not an unbounded driver collect."""
    from data_ingestion_tool_spark.sources.csv_io import export_csv_rows

    monkeypatch.setattr(
        service,
        "export_csv_rows",
        lambda df, columns=None: export_csv_rows(df, columns, max_rows=1),
    )
    with pytest.raises(ApiError) as e:
        service.export_flatfile(
            catalog, CONN, ColumnSelection("customer", ["c_custkey"])
        )
    assert e.value.status_code == 500
    assert "max_rows" in e.value.detail


def test_export_comma_join(catalog):
    sel = ColumnSelection(
        "orders",
        ["c_name", "o_orderkey"],
        join_tables=["customer"],
        join_condition="o_custkey = c_custkey AND o_totalprice > 400000.0",
    )
    out = service.export_flatfile(catalog, CONN, sel)
    assert out["count"] > 0
    assert "WHERE o_custkey = c_custkey" in out["query"]


def test_export_empty_short_circuit(catalog):
    sel = ColumnSelection(
        "orders",
        ["o_orderkey"],
        join_tables=["customer"],
        join_condition="o_custkey = c_custkey AND o_totalprice < 0",
    )
    out = service.export_flatfile(catalog, CONN, sel)
    assert out == {
        "status": "success", "data": "", "count": 0, "message": "No data found",
    }


def test_import_roundtrip(catalog, tmp_path):
    csv = "a,b,c\n1,x,\n2,,z\n"
    out = service.import_flatfile(
        catalog, CONN, "up.csv", csv.encode(), table="svc_imported"
    )
    assert out["status"] == "success"
    assert out["count"] == 2
    assert out["columns"] == ["a", "b", "c"]
    # compat semantics: all-string schema, empty cells are '' not NULL
    df = catalog.table("svc_imported")
    assert all(f.dataType.simpleString() == "string" for f in df.schema.fields)
    rows = {tuple(r) for r in df.collect()}
    assert ("1", "x", "") in rows and ("2", "", "z") in rows
    # append-wins policy: second import appends to the existing schema
    service.import_flatfile(
        catalog, CONN, "up.csv", csv.encode(), table="svc_imported"
    )
    assert catalog.table("svc_imported").count() == 4
    catalog.sql("DROP TABLE svc_imported")


def test_import_extension_gate(catalog):
    with pytest.raises(ApiError) as e:
        service.import_flatfile(catalog, CONN, "evil.parquet", b"x")
    assert e.value.status_code == 400


def test_import_empty_400(catalog):
    with pytest.raises(ApiError) as e:
        service.import_flatfile(catalog, CONN, "empty.csv", b"")
    assert e.value.status_code == 400


def test_health(catalog):
    out = service.health(catalog)
    assert out["status"] == "healthy"
    assert out["services"] == {"database": "available", "storage": "ok"}


def test_fastapi_wrapper_importable():
    """app.py must import cleanly without fastapi and raise the guard
    error from create_app."""
    from data_ingestion_tool_spark.api import app as app_mod

    if not app_mod.HAVE_FASTAPI:
        with pytest.raises(ImportError, match="fastapi"):
            app_mod.create_app(None)
