"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup (north-star, BASELINE.json).

Scale design — the common shape for every near-dup variant is

    shingle/feature -> compact signature -> band/bucket key ->
    self-join ON bucket -> exact verify within candidate pairs

so the only shuffle is on short bucket keys and the quadratic step runs
per-bucket over candidate pairs, never over the corpus. A naive
pairwise cross-join is O(n^2) and is never used here.

Execution split (measured, not guessed): string-shingle hashing runs
JVM-side (``F.transform`` + ``xxhash64``, one pass per shingle), while
the 64 minhash permutations / simhash bit-sums run as Arrow-batched
Pandas UDFs over the hash arrays with numpy broadcasting. A pure
higher-order-function formulation evaluates lambdas interpreted
per-element (64 x shingles evals/row ≈ 50 ms/doc — 100x slower than
the numpy path); the hybrid keeps per-doc cost ~0.1 ms and parallelizes
per partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from .text import fingerprint, tokens

MERSENNE_P = (1 << 61) - 1


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


def shingles(col, n: int = 3) -> Column:
    """Word n-gram shingles from the token array (JVM-side).

    Built as a ZIP of n shifted slices, NOT a transform over an index
    range: ``F.slice(toks, i + 1, n)`` inside a HOF lambda re-embeds
    the whole tokenize expression per element — O(tokens²) per row,
    the exact CLAUDE.md bigram hazard (this operator spent ~7s at
    sf0.1 on 2000 docs before the rewrite; <1s after). Here ``toks``
    appears a constant n+1 times in the tree. ``zip_with`` pads the
    shorter slice with NULL and ``concat_ws`` skips NULLs, so the
    tail yields partial grams — sliced off to match the original
    semantics (grams 0..size−n; for size<n one partial gram survives,
    e.g. a 2-token doc yields "t0 t1")."""
    toks = tokens(col)
    size = F.size(toks)
    grams = toks
    for j in range(2, n + 1):
        grams = F.zip_with(
            grams,
            F.slice(toks, j, F.greatest(size - j + 1, F.lit(0))),
            lambda g, x: F.concat_ws(" ", g, x),
        )
    grams = F.slice(grams, 1, F.greatest(size - (n - 1), F.lit(1)))
    return F.array_distinct(F.filter(grams, lambda s: s != ""))


from .partitioning import spread as _spread  # canonical home (round 13)


def hashed_shingles(
    df: DataFrame, text_col: str, id_col: str, shingle_n: int
) -> DataFrame:
    """(id, feats: array<long>) — xxhash64 per distinct shingle, JVM-side.
    Rows with no shingles (empty/whitespace docs) are dropped; exact
    dedup handles those."""
    out = _spread(df).select(
        F.col(id_col).alias("id"),
        F.transform(shingles(F.col(text_col), shingle_n), lambda s: F.xxhash64(s)).alias(
            "feats"
        ),
    )
    return out.filter(F.size("feats") > 0)


def _perm_constants(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE_P, size=num_hashes).astype(np.uint64)
    b = rng.randint(0, MERSENNE_P, size=num_hashes).astype(np.uint64)
    return a, b


def minhash_signature_udf(num_hashes: int = 64, seed: int = 42):
    """Vectorized MinHash: sig[i] = min over shingles of (a_i*h + b_i)
    (universal hashing over the 64-bit ring; numpy broadcast per row)."""
    a, b = _perm_constants(num_hashes, seed)

    @F.pandas_udf(ArrayType(LongType()))
    def sig(feats_s: pd.Series) -> pd.Series:
        out = []
        for f in feats_s:
            h = np.asarray(f, dtype=np.uint64)
            vals = h[None, :] * a[:, None] + b[:, None]  # uint64 wraparound ok
            out.append(vals.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    return sig


def simhash_bits_udf(nbits: int = 64):
    """Vectorized SimHash: per bit position, sign of sum of +/-1
    contributions across feature hashes; returns array<long> of
    ``nbits`` bits (64 for the xxhash64 production path, 60 for the
    md5-prefix cross-engine oracle path)."""

    @F.pandas_udf(ArrayType(LongType()))
    def bits_fn(feats_s: pd.Series) -> pd.Series:
        shifts = np.arange(nbits, dtype=np.uint64)
        out = []
        for f in feats_s:
            h = np.asarray(f, dtype=np.uint64)
            bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
            contrib = (2 * bits - 1).sum(axis=0)
            out.append((contrib > 0).astype(np.int64).tolist())
        return pd.Series(out)

    return bits_fn


def _band_explode(sig_df: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """One row per (band, band-bucket-hash): the LSH key a self-join
    shuffles on. Bucket = xxhash64 of the band's signature slice."""
    rows_per_band = num_hashes // bands
    return sig_df.select(
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

    shingle -> 64-perm MinHash signature -> 16 bands x 4 rows ->
    explode one row per (band, band-hash) -> self-join on the band
    bucket -> verify candidates with the signature-level Jaccard
    estimate. The self-join shuffles only (bucket-key, id, signature);
    candidate verification is per-pair on 64-element arrays.

    Returns (id_a, id_b, jaccard_sim) with id_a < id_b and
    jaccard_sim >= threshold.
    """
    feats = hashed_shingles(df, text_col, id_col, shingle_n)
    return minhash_near_dup_pairs_from_feats(
        feats, num_hashes, bands, jaccard_threshold, seed
    )


def minhash_near_dup_pairs_from_feats(
    feats: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """:func:`minhash_near_dup_pairs` from a precomputed ``(id, feats:
    array<long>)`` frame — lets callers that ALSO need the shingle sets
    (the exact-verify pipelines) compute shingles once and derive the
    hashed features instead of re-tokenizing the corpus per branch."""
    from ..plans.pin import pin

    # Pin the signatures: the banded self-join reads them on both
    # sides; unpinned, the 64-permutation UDF runs twice (same shape
    # and fix as the simhash bits pin above).
    sig = feats.select(
        "id", minhash_signature_udf(num_hashes, seed)("feats").alias("sig")
    ).transform(pin, eager=False)
    banded = _band_explode(sig, num_hashes, bands)
    a, b = banded.alias("a"), banded.alias("b")
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
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq)
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
    Jaccard" (never all-pairs). The exact verify joins on hashed
    shingle sets (array<long>), not raw text. The shingle features are
    computed ONCE and pinned — the signature branch and the exact-
    verify branch both read the same materialized frame instead of
    re-tokenizing the corpus per branch (round-9).
    """
    from ..plans.pin import pin

    feats = hashed_shingles(df, text_col, id_col, shingle_n).transform(
        pin, eager=False
    )
    cands = minhash_near_dup_pairs_from_feats(
        feats, num_hashes, bands, jaccard_threshold=0.0, seed=seed
    ).select("id_a", "id_b")
    sh = feats.select("id", F.array_distinct("feats").alias("sh"))
    j = cands.join(
        sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a"
    ).join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        j.withColumn("jaccard", inter / F.greatest(union, F.lit(1.0)))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    shingle_n: int = 2,
    scheme: str = "chunk_triples",
    allow_recall_loss: bool = False,
    hash_expr=None,
    nbits: int = 64,
) -> DataFrame:
    """SimHash near-dup: ``nbits``-bit fingerprint, pigeonhole-bucketed
    self-join, exact hamming verify within candidates.

    ``max_hamming`` beyond the scheme's pigeonhole guarantee (chunks:
    <=3, chunk_pairs: <=4) silently loses recall — a pair can differ in
    every bucket key yet still satisfy the hamming bound — so it RAISES
    unless ``allow_recall_loss=True`` is passed explicitly (candidate-
    volume studies like tools/soak_dedup.py opt in deliberately).

    Two bucketing schemes, identical OUTPUT (verify filters to the
    exact hamming bound either way); they differ only in chance-
    collision candidate volume:

    - ``chunks``: four nbits/4-bit chunks — hamming<=3 leaves >=1
      chunk intact. Chance candidates ~ 4·n²/2^16: fine to ~10^5 docs
      (the soak table in PLANS.md measures it) but QUADRATIC beyond —
      kept only for the candidate-volume comparison studies.
    - ``chunk_pairs`` (round-7 default): six ~nbits/6-bit chunks,
      bucket on every PAIR of chunks (C(6,2)=15 keys/doc) —
      hamming<=3 leaves >=3 chunks intact, hence >=3 intact pairs, so
      recall stays exact while a chance collision now needs ~21-22
      matching bits instead of 16: ~15·n²/2^21.3, an order of
      magnitude fewer false candidates for ~4x more (tiny) bucket
      rows (PLANS.md soak: 527k vs 60k candidates at 125k docs).
    - ``chunk_triples`` (default since round 12, the 100 TB choice):
      same six chunks, bucket on every TRIPLE (C(6,3)=20 keys/doc) —
      hamming<=3 leaves >=3 intact chunks, hence >=1 intact triple
      (recall still exact by pigeonhole), while a chance collision
      now needs ~30-33 matching bits: background ~20·n²/2^31, another
      ~2^10 cut over chunk_pairs for only 1.33x more bucket rows.
      The round-11 soak showed chunk_pairs' background term tracking
      its n²/2^21.3 prediction (527k→8.2M at 4x); triples push the
      n² crossover past ~10^8 docs and the soak back to true-pair
      (linear) growth.

    ``hash_expr`` (shingle-string Column -> int64 Column) defaults to
    ``F.xxhash64`` (production: full 64-bit ring, JVM-native). The
    oracle-backed ``dedup_simhash`` query passes an md5-prefix hash +
    ``nbits=60`` instead — the only per-shingle hash both Spark and
    DuckDB compute bit-identically — so the driver's differential
    oracle exercises THIS exact pipeline end-to-end."""
    if hash_expr is None:
        feats = hashed_shingles(df, text_col, id_col, shingle_n)
    else:
        feats = (
            _spread(df)
            .select(
                F.col(id_col).alias("id"),
                F.transform(
                    shingles(F.col(text_col), shingle_n),
                    lambda s: hash_expr(s),
                ).alias("feats"),
            )
            .filter(F.size("feats") > 0)
        )
    from ..plans.pin import pin

    # Pin the fingerprints: the bucket self-join reads this frame on
    # BOTH sides, and without the pin each side re-runs the whole
    # shingle→hash→bit-sum pipeline (measured 3.0s → 2.0s at sf0.1).
    # At 100 TB this is the standard persist-the-signatures step.
    bits = feats.select(
        "id", simhash_bits_udf(nbits)("feats").alias("bits")
    ).transform(pin, eager=False)

    if scheme == "chunks":
        w4, r4 = divmod(nbits, 4)
        widths = [w4 + 1] * r4 + [w4] * (4 - r4)
        starts = [sum(widths[:i]) for i in range(4)]
        bounds = list(zip(starts, widths))
        guaranteed = 3  # 4 chunks: hamming<=3 leaves >=1 chunk intact
    elif scheme in ("chunk_pairs", "chunk_triples"):
        w6, r6 = divmod(nbits, 6)
        widths = [w6 + 1] * r6 + [w6] * (6 - r6)
        starts = [sum(widths[:i]) for i in range(6)]
        bounds = list(zip(starts, widths))
        # pairs: hamming<=4 leaves >=2 intact chunks => >=1 intact pair
        # triples: hamming<=3 leaves >=3 intact chunks => >=1 intact triple
        guaranteed = 4 if scheme == "chunk_pairs" else 3
    else:
        raise ValueError(f"unknown simhash scheme: {scheme!r}")
    if max_hamming > guaranteed and not allow_recall_loss:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the {scheme!r} scheme's "
            f"pigeonhole recall guarantee (<={guaranteed}); pass "
            "allow_recall_loss=True to accept incomplete candidate recall"
        )

    def chunk_key(start: int, width: int) -> Column:
        return F.aggregate(
            F.slice("bits", start + 1, width),
            F.lit(0).cast("long"),
            lambda acc, x: acc * 2 + x,
        )

    # evaluate each chunk's bit-fold ONCE as a column — combo keys are
    # then plain integer arithmetic; embedding the interpreted HOF fold
    # inside every combo re-ran it m·C(k,m) times per row (the
    # round-12 triples bench regression: 60 folds/row instead of 6)
    bits = bits.select(
        "id",
        "bits",
        *[chunk_key(s, w).alias(f"_c{i}") for i, (s, w) in enumerate(bounds)],
    )
    singles = [F.col(f"_c{i}") for i in range(len(bounds))]

    if scheme == "chunks":
        keys = [
            F.struct(F.lit(i).alias("chunk"), singles[i].alias("key"))
            for i in range(len(bounds))
        ]
    else:
        from itertools import combinations

        m = 2 if scheme == "chunk_pairs" else 3

        def combo_key(idxs: tuple[int, ...]) -> Column:
            # combined key: concatenated disjoint chunk bits,
            # k_i·2^(w_j+w_l+..) + k_j·2^(w_l+..) + ... (<=33 bits)
            k = singles[idxs[0]]
            for j in idxs[1:]:
                k = k * (2 ** bounds[j][1]) + singles[j]
            return k

        keys = [
            F.struct(F.lit(ci).alias("chunk"), combo_key(idxs).alias("key"))
            for ci, idxs in enumerate(combinations(range(6), m))
        ]

    # bucket rows carry ONLY (id, chunk, key): the 60-element bits
    # array would multiply the self-join shuffle by the key count
    # (20 for triples — the round-12 bench regression); candidates are
    # orders of magnitude fewer, so fingerprints join back per side
    chunks = bits.select(
        "id",
        F.explode(F.array(*keys)).alias("ck"),
    ).select("id", "ck.chunk", "ck.key")
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
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = cand.join(
        bits.select(F.col("id").alias("id_a"), F.col("bits").alias("bits_a")),
        "id_a",
    ).join(
        bits.select(F.col("id").alias("id_b"), F.col("bits").alias("bits_b")),
        "id_b",
    )
    ham = F.size(
        F.filter(F.zip_with("bits_a", "bits_b", lambda x, y: x != y), lambda d: d)
    )
    return (
        cand.withColumn("hamming", ham.cast("bigint"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
