"""SQL-UDF surface: correctness parity with the Column-expression
operators and the no-Python-in-plan guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_tool_spark.functions import register_sql_functions
from data_ingestion_tool_spark.operators import text as TX
from data_ingestion_tool_spark.plans import simple_plan


def test_sql_udfs_match_column_exprs(spark):
    register_sql_functions(spark)
    df = spark.createDataFrame(
        [("  The quick brown fox  ",), ("the a of and",), ("",), ("x",)],
        "s string",
    )
    df.createOrReplaceTempView("t_fn")
    got = spark.sql(
        "SELECT dit_token_count(s) AS n, dit_fingerprint(s) AS h, "
        "dit_stopword_ratio(s) AS r FROM t_fn"
    ).collect()
    want = df.select(
        TX.token_count("s").alias("n"),
        TX.fingerprint("s").alias("h"),
        TX.stopword_ratio("s").alias("r"),
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_sql_udf_cosine(spark):
    register_sql_functions(spark)
    row = spark.sql(
        "SELECT dit_cosine(array(1.0d, 2.0d, 3.0d), array(1.0d, 2.0d, 3.0d)) AS c, "
        "dit_cosine(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS o"
    ).collect()[0]
    assert abs(row.c - 1.0) < 1e-12
    assert abs(row.o) < 1e-12


def test_sql_udfs_stay_jvm_side(spark):
    """SQL UDF bodies must inline as Catalyst expressions — a plan that
    routes through Python shows BatchEvalPython/ArrowEvalPython nodes,
    which would serialize every row across the JVM↔Python boundary."""
    register_sql_functions(spark)
    spark.createDataFrame([("abc def",)], "s string").createOrReplaceTempView("t_fn2")
    plan = simple_plan(
        spark.sql("SELECT dit_token_count(s), dit_fingerprint(s) FROM t_fn2")
    )
    assert "EvalPython" not in plan
