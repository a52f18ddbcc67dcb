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


def test_word_ngrams_short_docs(spark):
    """Docs shorter than n yield NO grams (matching the SQL LEAD
    formulation); exact grams for a known doc."""
    df = spark.createDataFrame(
        [("a b c d",), ("a b",), ("",), ("solo",)], "s string"
    )
    got = [r.g for r in df.select(TX.word_ngrams("s", 3).alias("g")).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == [] and got[2] == [] and got[3] == []


def test_contamination_scores_bounds(spark):
    """Exact overlap accounting on a tiny hand-built corpus."""
    from data_ingestion_tool_spark.operators.text import contamination_scores

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),      # fully contained
            (2, "alpha beta gamma epsilon"),    # 1 of 2 grams hit
            (3, "zeta eta theta iota"),         # clean
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_grams, r.n_hits, r.contamination)
        for r in contamination_scores(docs, bench).collect()
    }
    assert got[1] == (2, 2, 1.0)
    assert got[2] == (2, 1, 0.5)
    assert got[3] == (2, 0, 0.0)


def test_pii_scrub_redactions(spark):
    from data_ingestion_tool_spark.operators.text import pii_scrub

    df = spark.createDataFrame(
        [
            ("mail a.user+tag@sub.example.org and call 555-1234 now",),
            ("no pii here",),
            ("two mails x@y.io z@w.co and 555-0000",),
        ],
        "s string",
    )
    rows = pii_scrub(df, "s").collect()
    assert rows[0].scrubbed == "mail <EMAIL> and call <PHONE> now"
    assert rows[0].n_redactions == 2
    assert rows[1].scrubbed == "no pii here" and rows[1].n_redactions == 0
    assert rows[2].scrubbed == "two mails <EMAIL> <EMAIL> and <PHONE>"
    assert rows[2].n_redactions == 3


def test_repetition_ratio_edges(spark):
    from data_ingestion_tool_spark.operators.text import repetition_ratio

    df = spark.createDataFrame(
        [("a a a a",), ("a b c d",), ("",), ("a b a b",)], "s string"
    )
    got = [r.r for r in df.select(repetition_ratio("s").alias("r")).collect()]
    assert got[0] == 0.75 and got[1] == 0.0 and got[2] == 0.0 and got[3] == 0.5


def test_pii_scrub_overlapping_match_counts_once(spark):
    """A phone-shaped token inside an email match is consumed by the
    email replacement — n_redactions must equal actual substitutions."""
    from data_ingestion_tool_spark.operators.text import pii_scrub

    df = spark.createDataFrame([("reach 555-1234@corp.example",)], "s string")
    row = pii_scrub(df, "s").collect()[0]
    assert row.scrubbed == "reach <EMAIL>"
    assert row.n_redactions == 1
