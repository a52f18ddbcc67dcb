"""Edge cases the sf oracles can't see for the round-6 additions:
empty/degenerate inputs for sequence packing, the bloom prefilter's
empty-filter side, containment vs jaccard asymmetry, and AQP sample
determinism."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_pack_blocks_exact_boundaries(spark):
    """Docs summing to an exact block multiple leave no partial tail;
    a doc longer than a block spans multiple blocks."""
    from data_ingestion_tool_spark.operators.ranking import (
        with_global_prefix_sum,
    )

    rows = [(1, 200), (2, 312), (3, 700), (4, 836)]  # cum: 200,512,1212,2048
    t = spark.createDataFrame(rows, "doc_id long, n long")
    c = with_global_prefix_sum(t, ["doc_id"], "n", rn="rn", cum="cum")
    spans = c.select(
        "doc_id", "n", (F.col("cum") - F.col("n")).alias("s"),
        F.col("cum").alias("e"),
    )
    blocks = (
        spans.select(
            F.explode(
                F.sequence(F.expr("s DIV 512"), F.expr("(e - 1) DIV 512"))
            ).alias("block_id"),
            "s",
            "e",
        )
        .select(
            "block_id",
            (
                F.least(F.col("e"), (F.col("block_id") + 1) * 512)
                - F.greatest(F.col("s"), F.col("block_id") * 512)
            ).alias("toks"),
        )
        .groupBy("block_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").alias("n_tokens"),
        )
    )
    out = {r["block_id"]: (r["n_docs"], r["n_tokens"]) for r in blocks.collect()}
    # 2048 tokens = exactly 4 full blocks. Doc 2 ends EXACTLY at offset
    # 512 so it does not touch block 1 (the end-exclusive boundary);
    # doc 3 (700) spans blocks 1-2; doc 4 spans blocks 2-3.
    assert out == {0: (2, 512), 1: (1, 512), 2: (2, 512), 3: (1, 512)}


def test_bloom_semantics_no_false_negatives_synthetic(spark):
    """The md5-bitset bloom keeps the no-false-negative invariant on a
    synthetic frame with engineered duplicates across the split."""
    rows = [(i, f"text {i % 7}", "srcA" if i % 2 else "srcB") for i in range(40)]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    h = d.select(
        "doc_id", "source", F.md5(F.lower(F.trim("text"))).alias("h")
    )
    filt = h.filter(F.col("source") == "srcA").select("h")
    probe = h.filter(F.col("source") == "srcB").select("doc_id", "h")

    def bit(col, start):
        return F.conv(F.substring(col, start, 8), 16, 10).cast("bigint") % 64

    bits = (
        filt.select(bit(F.col("h"), 1).alias("b"))
        .unionAll(filt.select(bit(F.col("h"), 9).alias("b")))
        .distinct()
    )
    b1s = bits.select(F.col("b").alias("b1"), F.lit(1).alias("h1"))
    b2s = bits.select(F.col("b").alias("b2"), F.lit(1).alias("h2"))
    dups = filt.select("h", F.lit(1).alias("d")).distinct()
    p = probe.select(
        "doc_id", "h", bit(F.col("h"), 1).alias("b1"), bit(F.col("h"), 9).alias("b2")
    )
    out = (
        p.join(b1s, "b1", "left")
        .join(b2s, "b2", "left")
        .join(dups, "h", "left")
        .select(
            "doc_id",
            (F.col("h1").isNotNull() & F.col("h2").isNotNull()).alias("hit"),
            F.col("d").isNotNull().alias("dup"),
        )
        .collect()
    )
    assert len(out) == 20
    assert all(r["hit"] for r in out if r["dup"])  # no false negatives
    assert any(r["dup"] for r in out)  # the engineered dups exist


def test_containment_asymmetry_vs_jaccard(spark):
    """A short doc embedded in a doc ~3x its size: containment fires,
    symmetric Jaccard at 0.5 does not."""
    from data_ingestion_tool_spark.operators.dedup import shingles

    short = "alpha beta gamma delta epsilon zeta eta theta"
    long = short + (
        " one two three four five six seven eight nine ten eleven twelve"
        " thirteen fourteen fifteen sixteen seventeen eighteen nineteen"
    )
    d = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id long, text string"
    )
    sh = d.select("doc_id", shingles(F.col("text"), 3).alias("sh"))
    rows = {r["doc_id"]: set(r["sh"]) for r in sh.collect()}
    inter = len(rows[1] & rows[2])
    union = len(rows[1] | rows[2])
    nmin = min(len(rows[1]), len(rows[2]))
    assert 10 * inter >= 9 * nmin  # containment >= 0.9
    assert 2 * inter < union  # symmetric jaccard < 0.5 misses it


def test_aqp_sample_deterministic_and_value_based(spark):
    """The md5 sample is a pure function of row values: identical rows
    land in or out together, and two runs agree exactly."""
    rows = [(1, 1, 10.0), (1, 1, 10.0), (2, 1, 20.0), (3, 1, 30.0)] + [
        (i, 1, float(i)) for i in range(10, 200)
    ]
    l = spark.createDataFrame(
        rows, "l_orderkey long, l_linenumber long, l_extendedprice double"
    )
    h = F.md5(
        F.concat_ws(
            "-",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
            F.col("l_extendedprice").cast("decimal(18,2)").cast("string"),
        )
    )
    s = l.select(
        "l_orderkey",
        (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % 10 == 0).alias(
            "in_sample"
        ),
    )
    a = sorted((r["l_orderkey"], r["in_sample"]) for r in s.collect())
    b = sorted((r["l_orderkey"], r["in_sample"]) for r in s.collect())
    assert a == b
    dup_flags = [f for k, f in a if k == 1]
    assert len(dup_flags) == 2 and len(set(dup_flags)) == 1  # together
