"""Value-level accuracy for the rows-only compressibility signal
(operators/text.py compression_ratio) — the tests that stand in for
the DuckDB twin zlib cannot have."""

from __future__ import annotations

import zlib

from pyspark.sql import functions as F

from data_ingestion_tool_spark.operators.text import compression_ratio


def _ratios(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = compression_ratio(df)
    return {r.doc_id: r.zlib_ratio for r in out.collect()}


def test_compression_ratio_exact_zlib_twin(spark):
    """The operator's value IS len(zlib.compress(utf8, 6))/len(utf8),
    exactly, including multi-byte UTF-8."""
    texts = [
        "the quick brown fox jumps over the lazy dog " * 20,
        "héllo wörld ünïcode — π≈3.14159 " * 7,
        "x",
    ]
    got = _ratios(spark, texts)
    for i, t in enumerate(texts):
        raw = t.encode("utf-8")
        expect = len(zlib.compress(raw, 6)) / len(raw)
        assert got[i] == expect


def test_compression_ratio_orders_spam_below_prose_below_junk(spark):
    """The signal separates the three regimes the census fences:
    repeated boilerplate << natural prose < high-entropy junk."""
    import random

    rng = random.Random(7)
    spam = "click here buy now " * 200
    prose = (
        "In the beginning the engine read its tables from parquet and "
        "planned each query with a cost model that favored broadcast "
        "joins for small dimensions and sort merge for everything else, "
        "while late materialization kept the scan columns narrow."
    )
    junk = "".join(chr(rng.randrange(0x21, 0x7F)) for _ in range(3000))
    got = _ratios(spark, [spam, prose, junk])
    assert got[0] < 0.1
    assert got[0] < got[1] < got[2]
    assert got[2] > 0.7


def test_compression_ratio_deterministic_and_edge_cases(spark):
    """Same input → same ratio across runs; empty/null text → 1.0."""
    texts = ["abc " * 50, "", None]
    a = _ratios(spark, texts)
    b = _ratios(spark, texts)
    assert a == b
    assert a[1] == 1.0 and a[2] == 1.0


def test_compression_census_fences_match_operator(spark):
    """The query's fence math over a tiny frame equals plain Python."""
    texts = ["spam spam spam " * 100, "normal words here and there."]
    df = spark.createDataFrame(
        [(i, "s", t) for i, t in enumerate(texts)],
        "doc_id long, source string, text string",
    )
    r = compression_ratio(df)
    row = (
        r.groupBy("source")
        .agg(
            F.sum(F.when(F.col("zlib_ratio") < 0.35, 1).otherwise(0)).alias(
                "spam"
            ),
            F.sum(
                F.when(
                    (F.col("zlib_ratio") >= 0.35)
                    & (F.col("zlib_ratio") <= 1.05),
                    1,
                ).otherwise(0)
            ).alias("keep"),
        )
        .collect()[0]
    )
    ratios = [
        len(zlib.compress(t.encode(), 6)) / len(t.encode()) for t in texts
    ]
    assert row["spam"] == sum(1 for x in ratios if x < 0.35)
    assert row["keep"] == sum(1 for x in ratios if 0.35 <= x <= 1.05)
