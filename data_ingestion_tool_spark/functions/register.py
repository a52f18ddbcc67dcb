"""SQL-callable engine functions.

The reference exposes zero user functions (SURVEY.md §2.C); this module
gives the engine's text/similarity primitives a SQL surface so
``spark.sql`` users can call them like built-ins. Everything registers
as a Spark *SQL UDF* (``CREATE FUNCTION ... RETURN <expr>``) — the body
is a Catalyst expression, so these inline into whole-stage codegen with
zero Python in the execution path (unlike ``spark.udf.register``, which
would bolt a row-at-a-time Python call into every plan that uses it).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name → (signature, return type, body). Bodies mirror operators/text.py
# and operators/similarity.py exactly — one source of truth for tests.
SQL_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    "dit_token_count": (
        "(s STRING)",
        "BIGINT",
        r"size(filter(split(lower(s), '\\s+'), x -> x != ''))",
    ),
    "dit_fingerprint": (
        "(s STRING)",
        "STRING",
        "md5(lower(trim(s)))",
    ),
    "dit_stopword_ratio": (
        "(s STRING)",
        "DOUBLE",
        r"""
        cast(size(filter(filter(split(lower(s), '\\s+'), x -> x != ''),
                         x -> array_contains(array('the','a','of','and','to','in','is','that'), x)))
             as double)
        / cast(greatest(size(filter(split(lower(s), '\\s+'), x -> x != '')), 1) as double)
        """,
    ),
    "dit_dot": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)",
        "DOUBLE",
        "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)",
    ),
    "dit_cosine": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)",
        "DOUBLE",
        "dit_dot(a, b) / (sqrt(dit_dot(a, a)) * sqrt(dit_dot(b, b)))",
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Install every engine SQL function into the session (idempotent).
    Returns the registered names."""
    for name, (sig, ret, body) in SQL_FUNCTIONS.items():
        body_one_line = " ".join(body.split())
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} "
            f"RETURNS {ret} RETURN {body_one_line}"
        )
    return list(SQL_FUNCTIONS)
