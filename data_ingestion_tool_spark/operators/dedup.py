"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup (north-star, BASELINE.json).

Scale design — the common shape for every near-dup variant is

    shingle/feature -> compact signature -> band/bucket key ->
    self-join ON bucket -> exact verify within candidate pairs

so the only shuffle is on short bucket keys and the quadratic step runs
per-bucket over candidate pairs, never over the corpus. A naive
pairwise cross-join is O(n^2) and is never used here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import fingerprint, tokens


def exact_dedup(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact dedup on a column subset = hash-groupBy (shuffles only the
    key columns after map-side partial distinct)."""
    return df.dropDuplicates(cols)


def exact_dedup_by_content(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the min-id representative per content fingerprint.

    Shuffles (digest, id) pairs only — at 100 TB the documents
    themselves never move.
    """
    return (
        df.select(fingerprint(text_col).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        )
    )


def shingles(col, n: int = 3):
    """Word n-gram shingles from the token array (codegen'd)."""
    toks = tokens(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def minhash_signature(shingle_col, num_hashes: int = 64, seed: int = 42):
    """MinHash signature as an array<bigint>.

    Each of the ``num_hashes`` permutations is xxhash64(shingle, seed+i)
    minimized over the shingle set — pure JVM expression work, no UDF,
    embarrassingly parallel per row.

    (Closure note, applies throughout this package: loop variables are
    bound via factory functions, never lambda default args — PySpark
    dispatches higher-order-function lambdas on arity, so an extra
    default parameter silently receives the element *index*.)
    """

    def min_hash(i: int):
        return F.array_min(
            F.transform(shingle_col, lambda s: F.xxhash64(s, F.lit(seed + i)))
        )

    return F.array(*[min_hash(i) for i in range(num_hashes)])


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """MinHash + banded LSH near-duplicate pairs.

    shingle -> 64-hash MinHash signature -> 16 bands x 4 rows ->
    explode one row per (band, band-hash) -> self-join on the band
    bucket -> verify candidates with the exact signature-level Jaccard
    estimate. The self-join shuffles only (bucket-key, id, signature);
    candidate verification is per-pair on 64-element arrays.

    Returns (id_a, id_b, jaccard_sim) with id_a < id_b and
    jaccard_sim >= threshold.
    """
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(shingles(F.col(text_col), shingle_n), num_hashes, seed).alias(
            "sig"
        ),
    )
    banded = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bucket")

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq
        )
    ).cast("double") / F.lit(float(num_hashes))
    return (
        cand.withColumn("jaccard_sim", est)
        .filter(F.col("jaccard_sim") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Exact n-gram Jaccard over LSH-pruned candidates.

    Candidate generation reuses the MinHash/LSH path (cheap, recall ~1
    at these thresholds); the exact set-Jaccard then runs only on
    candidate pairs — this is the scale-correct form of "pairwise
    Jaccard" (never all-pairs).
    """
    cands = minhash_near_dup_pairs(
        df, text_col, id_col, num_hashes, bands, shingle_n,
        jaccard_threshold=0.0, seed=seed,
    ).select("id_a", "id_b")
    sh = df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), shingle_n).alias("sh")
    )
    j = (
        cands.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        j.withColumn("jaccard", inter / F.greatest(union, F.lit(1.0)))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(col, shingle_n: int = 2):
    """64-bit SimHash of word shingles, as pure column expressions.

    Per feature hash, each bit position contributes +1/-1; the sign of
    the per-bit sum forms the fingerprint. Implemented by summing bit
    extractions over the shingle array with higher-order functions —
    JVM-side, no UDF.
    """
    feats = F.transform(shingles(col, shingle_n), lambda s: F.xxhash64(s))

    def bit_weight(bit: int):
        contrib = F.aggregate(
            feats,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        if bit < 63:
            return F.when(contrib > 0, F.lit(2 ** bit).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        # bit 63: negative weight keeps the value in signed-long range
        return F.when(contrib > 0, F.lit(-(2 ** 63))).otherwise(F.lit(0)).cast("long")

    out = bit_weight(0)
    for b in range(1, 64):
        out = out + bit_weight(b)
    return out


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    shingle_n: int = 2,
) -> DataFrame:
    """SimHash near-dup: bucket by the four 16-bit chunks of the
    fingerprint (pigeonhole: hamming<=3 pairs share at least one exact
    chunk), self-join per chunk, verify with exact popcount distance."""
    sh = df.select(
        F.col(id_col).alias("id"), simhash64(F.col(text_col), shingle_n).alias("sim")
    )
    chunks = sh.select(
        "id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned("sim", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("ck"),
    ).select("id", "sim", "ck.chunk", "ck.key")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sim").alias("sim_a"),
            F.col("b.sim").alias("sim_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.withColumn("hamming", ham.cast("bigint"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
