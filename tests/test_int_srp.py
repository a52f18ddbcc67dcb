"""Cross-engine contract tests for the exact-integer SRP path
(round-8 oracle promotions: similarity_topk_lsh, dedup_embedding_cosine).

The promoted oracles only stay honest while two identities hold:

1. plane identity — DuckDB's ``('0x'||substr(md5(s),1,15))::BIGINT %
   2001 - 1000`` equals Python's ``int(md5(s).hexdigest()[:15], 16) %
   2001 - 1000`` for every (t, p, d) triple;
2. quantization identity — Spark's float→double→decimal(9,6)→·10⁶→long
   equals DuckDB's CAST chain for float32 inputs.

The driver's differential hash checks these transitively at sf scale;
these tests pin each identity in isolation so a breakage points at the
exact seam.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from data_ingestion_tool_spark.operators.similarity import (
    INT_SRP_MOD,
    INT_SRP_SCALE,
    int_srp_planes,
    quantize_vec,
)


def test_plane_identity_python_vs_duckdb():
    tables = int_srp_planes(4, 8, 64)
    con = duckdb.connect()
    rows = con.execute(
        """
        SELECT tt.t, pp.p, dd.d,
               (CAST('0x' || substr(md5(tt.t || '-' || pp.p || '-' || dd.d),
                                    1, 15) AS BIGINT) % 2001) - 1000 AS r
        FROM (SELECT unnest(generate_series(0, 3)) AS t) tt,
             (SELECT unnest(generate_series(0, 7)) AS p) pp,
             (SELECT unnest(generate_series(0, 63)) AS d) dd
        """
    ).fetchall()
    assert len(rows) == 4 * 8 * 64
    for t, p, d, r in rows:
        assert tables[t][p][d] == r, (t, p, d)
    # sanity on the value range contract
    flat = [c for t in tables for p in t for c in p]
    assert min(flat) >= -(INT_SRP_MOD // 2) and max(flat) <= INT_SRP_MOD // 2


def test_quantize_identity_spark_vs_duckdb(spark):
    # float32 corner-ish values: negatives, tiny, near-decimal-boundary
    vals = [
        -0.5773654, 0.5193883, 0.0, 1e-7, -1e-7, 0.1234565, -0.9999995,
        0.4999995, 0.125, -0.125,
    ]
    df = spark.createDataFrame(
        [(list(map(float, vals)),)], "embedding array<float>"
    )
    got = df.select(quantize_vec("embedding").alias("q")).collect()[0]["q"]
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT CAST(CAST(CAST(CAST(? AS FLOAT) AS DOUBLE)"
            f" AS DECIMAL(9,6)) * {INT_SRP_SCALE} AS BIGINT)",
            [v],
        ).fetchone()[0]
        for v in vals
    ]
    assert got == want, list(zip(vals, got, want))


def test_int_bucket_sign_is_strict_zero_excluded(spark):
    """A zero dot must be a 0-bit (strict >0): the orthogonal-vector
    case where a >=0 rule would disagree with the SQL twin."""
    from data_ingestion_tool_spark.operators.similarity import (
        _with_int_srp_buckets,
    )

    # plane [1, -1]; vector [x, x] quantizes to equal ints → dot == 0
    tables = [[[1, -1]]]
    df = spark.createDataFrame(
        [(1, [0.25, 0.25])], "vec_id long, embedding array<float>"
    )
    out = _with_int_srp_buckets(df, "vec_id", "embedding", tables, "id")
    assert out.collect()[0]["bkt"] == 0
