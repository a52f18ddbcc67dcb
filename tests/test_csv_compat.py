"""Compat-semantics tests for the reference's CSV quirks (SURVEY.md §1.2,
FIXTURES.md §4): all-string ingest, '' not NULL, BOM on export,
delimiter/extension gates, append-wins table policy."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_ingestion_tool_spark.sources import (
    export_csv_string,
    ingest_append,
    read_csv_compat,
    read_csv_inferred,
    validate_upload_extension,
    write_csv,
)


@pytest.fixture()
def plain_csv(tmp_path):
    p = tmp_path / "plain.csv"
    p.write_text("id,name,amount,ts\n1,alice,3.5,2024-01-01\n2,bob,,\n")
    return str(p)


def test_compat_read_all_string(spark, plain_csv):
    df = read_csv_compat(spark, plain_csv)
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string"] * 4
    rows = {r["id"]: r for r in df.collect()}
    # empty cells stay '' — never NULL (na_filter=False, main.py:238)
    assert rows["2"]["amount"] == ""
    assert rows["2"]["ts"] == ""
    assert rows["1"]["amount"] == "3.5"


def test_inferred_read_types(spark, plain_csv):
    df = read_csv_inferred(spark, plain_csv)
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types["id"] == "int"
    assert types["amount"] == "double"
    rows = {r["id"]: r for r in df.collect()}
    assert rows[2]["amount"] is None  # inferred mode keeps SQL nulls


def test_delimiter_variants(spark, tmp_path):
    pipe = tmp_path / "pipe.txt"
    pipe.write_text("a|b\n1|x\n2|y\n")
    df = read_csv_compat(spark, str(pipe), delimiter="|")
    assert df.columns == ["a", "b"]
    assert df.count() == 2


def test_extension_gate():
    validate_upload_extension("data.csv")
    validate_upload_extension("DATA.TXT")
    with pytest.raises(ValueError, match="CSV and TXT"):
        validate_upload_extension("data.parquet")


def test_export_no_bom_and_header(spark):
    df = spark.createDataFrame([(1, "café"), (2, "naïve")], "id int, name string")
    s = export_csv_string(df, ["name", "id"])
    # reference parity: to_csv without a path ignores encoding='utf-8-sig',
    # so the actual response body carries NO BOM (main.py:193-194)
    assert not s.startswith("﻿")
    lines = s.strip().splitlines()
    assert lines[0] == "name,id"  # header = selected column order
    assert "café,1" in lines


def test_export_row_bound_enforced(spark):
    from data_ingestion_tool_spark.sources.csv_io import export_csv_rows

    df = spark.range(100).selectExpr("id", "concat('v', id) AS v")
    csv, n = export_csv_rows(df, max_rows=100)
    assert n == 100 and csv.count("\n") == 101
    with pytest.raises(ValueError, match="max_rows=99"):
        export_csv_rows(df, max_rows=99)


def test_csv_unicode_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([("héllo", "emoji🎉")], "a string, b string")
    out = str(tmp_path / "uni")
    write_csv(df, out)
    back = read_csv_compat(spark, out)
    assert [tuple(r) for r in back.collect()] == [("héllo", "emoji🎉")]


def test_ingest_append_wins_policy(spark, tmp_path):
    """First writer defines the table; later ingests append
    (CREATE TABLE IF NOT EXISTS, main.py:263-268)."""
    out = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "a")], "id bigint, v string")
    ingest_append(df, out)
    ingest_append(df, out)
    assert spark.read.parquet(out).count() == 2
