"""API façade validation parity with the reference's pydantic models
(`backend/main.py:38-62`)."""

from __future__ import annotations

import pytest

from data_ingestion_tool_spark.api import (
    ColumnSelection,
    ConnectionInfo,
    build_export_dataframe,
)
from data_ingestion_tool_spark.catalog import (
    TableNotFoundError,
    columns_df,
    describe_table,
)


def test_host_regex():
    ConnectionInfo(host="db.example-1.com")
    with pytest.raises(ValueError, match="Invalid host"):
        ConnectionInfo(host="bad host;drop")


def test_pool_key_excludes_password():
    a = ConnectionInfo(password="x")
    b = ConnectionInfo(password="y")
    assert a.pool_key == b.pool_key  # main.py:68 quirk preserved


def test_table_identifier_regex():
    ColumnSelection(table="good_name1", columns=["a"])
    with pytest.raises(ValueError, match="Invalid table name"):
        ColumnSelection(table="bad-name", columns=["a"])
    with pytest.raises(ValueError, match="Invalid table name"):
        ColumnSelection(table="t", columns=["a"], join_tables=["1bad"],
                        join_condition="x = y")


def test_min_one_column():
    with pytest.raises(ValueError, match="At least one column"):
        ColumnSelection(table="t", columns=[])


def test_single_table_fallback_when_condition_missing(spark):
    """Reference quirk: join_tables without join_condition silently
    falls back to the single-table branch (main.py:174-180)."""
    spark.createDataFrame([(1, "x")], "id int, v string").createOrReplaceTempView(
        "t_fallback"
    )
    sel = ColumnSelection(table="t_fallback", columns=["id"], join_tables=["t_fallback"])
    df = build_export_dataframe(spark, sel)
    assert df.count() == 1  # no self-cross-join happened


def test_describe_missing_table_raises(spark):
    with pytest.raises(TableNotFoundError):
        describe_table(spark, "definitely_not_a_table")


def test_columns_df_shape(spark):
    df = spark.createDataFrame([(1, "x")], "id bigint, v string")
    rows = [tuple(r) for r in columns_df(spark, df).collect()]
    assert rows == [("id", "bigint"), ("v", "string")]
