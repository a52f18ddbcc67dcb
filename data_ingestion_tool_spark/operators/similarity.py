"""Similarity search over embedding columns (north-star, BASELINE.json).

Two tiers, same answer shape (query_id, neighbor_id, score, rank):

- :func:`cosine_topk` — exact brute force. The scale shape is
  (queries x corpus) with the *query* side broadcast: the corpus (the
  100 TB side) never shuffles; each executor scores its local corpus
  partitions against the broadcast query block, and top-k-per-query is a
  rank-within-partition window over (queries x k) candidates, after a
  per-partition prune.
- :func:`lsh_topk` — approximate: sign-random-projection (hyperplane
  LSH) bucket join, then exact re-rank inside buckets. Sub-linear
  candidate generation for when even one full corpus pass is too much.

Dot products run through ``F.zip_with``/``F.aggregate`` in double
precision — array-order sequential fold, JVM codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus.

    Scale shape: the (small) query block is collected once and ships to
    every task in the ``mapInPandas`` closure — the corpus (the 100 TB
    side) NEVER shuffles; each task scores its local Arrow batches with
    one numpy matmul (BLAS) and emits only its per-batch top-k per
    query, so the window that merges candidates ranks ≤ k·partitions
    rows per query, not the whole corpus. ~6x faster than the
    equivalent ``zip_with``/``aggregate`` column-expression fold at
    sf0.1, and the gap widens with dimension count.

    Self-matches are excluded. Scores are double-precision matmul;
    callers comparing against a sequential-fold oracle should round
    (drift ≤ ~4e-16).
    """
    import numpy as np
    import pandas as pd

    qrows = queries.select(
        F.col(id_col).alias("qid"), _as_double(vec_col).alias("qv")
    ).collect()
    qids = np.array([r.qid for r in qrows], dtype=np.int64)
    qmat = np.array([r.qv for r in qrows], dtype=np.float64)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)

    def score_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cmat = np.stack(pdf["cv"].map(np.asarray).values).astype(np.float64)
            cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)
            sims = cmat @ qnorm.T  # (batch, queries)
            cand_ids = pdf["neighbor_id"].values
            nb = len(pdf)
            for qi in range(sims.shape[1]):
                col = sims[:, qi].copy()
                col[cand_ids == qids[qi]] = -np.inf  # drop self-match
                kk = min(k, nb)
                idx = np.argpartition(-col, kk - 1)[:kk] if nb > kk else np.arange(nb)
                idx = idx[np.isfinite(col[idx])]
                yield pd.DataFrame(
                    {
                        "query_id": qids[qi],
                        "neighbor_id": cand_ids[idx],
                        "score": col[idx],
                    }
                )

    scored = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv")
    ).mapInPandas(score_batches, "query_id long, neighbor_id long, score double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def _srp_bucket(vec, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id: one bit per hyperplane."""
    key = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        s = dot(vec, plane)
        key = key + F.when(s >= 0, F.lit(2 ** i)).otherwise(F.lit(0)).cast("long")
    return key


def _with_srp_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    tables: list[list[list[float]]],
    out_id: str,
    use_numpy: bool | None = None,
) -> DataFrame:
    """(out_id, out_id_v, tbl, bkt) — one row per (vector, hash table).

    Same scale story as IVF's ``_assign_cells``: the hyperplanes ride
    the plan as literal expressions while small (n_tables × n_planes ×
    dim ≤ IVF_MAX_CODEBOOK_LITERALS — whole-stage codegen, fastest at
    toy sizes), and switch to one numpy matmul per Arrow batch in
    mapInPandas beyond that (a production 768-dim embedding with 4×16
    planes is ~50k literals — codegen death)."""
    v = _as_double(vec_col)
    n_tables = len(tables)
    n_literals = n_tables * len(tables[0]) * len(tables[0][0])
    if use_numpy is None:
        use_numpy = n_literals > IVF_MAX_CODEBOOK_LITERALS
    vcol = f"{out_id}_v"
    if not use_numpy:
        return df.select(
            F.col(id_col).alias(out_id),
            v.alias(vcol),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("tbl"),
                            _srp_bucket(v, tables[t]).alias("bkt"),
                        )
                        for t in range(n_tables)
                    ]
                )
            ).alias("tb"),
        ).select(out_id, vcol, "tb.tbl", "tb.bkt")

    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    pmats = [np.array(t, dtype=np.float64) for t in tables]
    pows = [2 ** np.arange(len(t), dtype=np.int64) for t in tables]
    base = df.select(F.col(id_col).alias(out_id), v.alias(vcol))
    schema = StructType(
        [
            base.schema[out_id],
            StructField(vcol, ArrayType(DoubleType())),
            StructField("tbl", IntegerType()),
            StructField("bkt", LongType()),
        ]
    )

    def buckets(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vmat = np.stack(pdf[vcol].map(np.asarray).values)
            out = []
            for t, (pm, pw) in enumerate(zip(pmats, pows)):
                # sign bit per plane; >= 0 matches the expression path
                bits = (vmat @ pm.T) >= 0
                part = pdf[[out_id, vcol]].copy()
                part["tbl"] = t
                part["bkt"] = bits @ pw
                out.append(part)
            yield pd.concat(out, ignore_index=True)

    return base.mapInPandas(buckets, schema)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucketing, exact re-rank within
    buckets. ``n_tables`` independent hash tables trade recall for work;
    candidates = corpus rows sharing any bucket with the query, so the
    scored set is a small fraction of the corpus."""
    import numpy as np

    rng = np.random.RandomState(seed)
    tables = [
        [rng.standard_normal(dim).tolist() for _ in range(n_planes)]
        for _ in range(n_tables)
    ]

    cb = _with_srp_buckets(corpus, id_col, vec_col, tables, "neighbor_id")
    qb = _with_srp_buckets(queries, id_col, vec_col, tables, "query_id")
    cand = (
        cb.join(F.broadcast(qb), ["tbl", "bkt"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "query_id_v", "neighbor_id", "neighbor_id_v")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("query_id_v"), F.col("neighbor_id_v")).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via the same LSH bucketing
    (self-join form): pairs sharing a bucket, exact cosine >= threshold.

    Sizing at scale: a table has 2^n_planes buckets, so expected
    chance-candidates ~ n_tables·n²/2^n_planes — n_planes must grow
    with the corpus (≈ log2(n·n_tables / target_candidates) bits;
    100 TB of embeddings wants 24-32 planes, not the toy default 8).
    Raising n_planes cuts recall per table; compensate with n_tables
    (recall ≈ 1-(1-p^planes)^tables for match prob p)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    tables = [
        [rng.standard_normal(dim).tolist() for _ in range(n_planes)]
        for _ in range(n_tables)
    ]
    from ..plans.pin import pin

    # Pin the bucketed frame: the self-join otherwise evaluates the
    # projection/bucketing pipeline once per side.
    b = (
        _with_srp_buckets(df, id_col, vec_col, tables, "id")
        .withColumnRenamed("id_v", "v")
        .transform(pin, eager=False)
    )
    x, y = b.alias("x"), b.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.tbl") == F.col("y.tbl"))
            & (F.col("x.bkt") == F.col("y.bkt"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.v").alias("va"),
            F.col("y.v").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("score", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


# --- cross-engine exact-integer SRP (round-8 oracle-promotion path) -------
#
# The float SRP above is the production default (gaussian planes, BLAS
# matmul). This variant makes the WHOLE pipeline replayable bit-for-bit
# by a SQL engine, the same move dedup_simhash made for minhash-style
# hashing: md5-derived INTEGER hyperplanes + integer-quantized vectors,
# so every bucket bit is the sign of an exact int64 dot product and the
# threshold verify is exact integer cross-multiplication — no float
# boundary anywhere a row can appear or vanish. The float path's
# bucket-sizing rule applies unchanged (2^n_planes buckets/table —
# grow n_planes with the corpus); the exactness budget below holds to
# ~2000 dims at these magnitudes, so production dimensionalities fit.

INT_SRP_MOD = 2001  # plane components in [-1000, 1000]
INT_SRP_SCALE = 1_000_000  # vector quantization: decimal(9,6) → ·10^6

# Exactness budget (why these constants are safe for |v| < ~2, dim ≤ 64):
# |vq| ≤ 2·10^6  ⇒ plane dot ≤ 64·2e6·1000 = 1.3e11 (int64 exact);
# pair dot / norms ≤ 64·(2e6)² = 2.6e14 < 2^53 (exact as int64 AND as
# double); dot² ≤ 6.6e28 → decimal(29,0)/int128, still exact.


def int_srp_planes(
    n_tables: int, n_planes: int, dim: int, mod: int = INT_SRP_MOD
) -> list[list[list[int]]]:
    """Deterministic integer hyperplanes: component (t, p, d) is
    ``md5int60(f"{t}-{p}-{d}") mod 2001 − 1000`` where md5int60 is the
    first 15 hex digits of the md5 as an int. A SQL twin rebuilds the
    exact matrix from its own md5() (md5 is md5; the rest is integer
    arithmetic) — no RNG-state coupling with numpy."""
    import hashlib

    return [
        [
            [
                int(hashlib.md5(f"{t}-{p}-{d}".encode()).hexdigest()[:15], 16)
                % mod
                - mod // 2
                for d in range(dim)
            ]
            for p in range(n_planes)
        ]
        for t in range(n_tables)
    ]


def quantize_vec(vec_col) -> Column:
    """array<long> quantization of a float-vector column: component →
    double (exact widen) → decimal(9,6) (the cross-engine-identical
    rounding step, proven by embedding_centroid_per_label) → ·10^6 →
    int64. Two engines casting the same float this way get the same
    integer, so everything downstream is exact."""
    return F.transform(
        vec_col,
        lambda x: (
            x.cast("double").cast("decimal(9,6)")
            * F.lit(INT_SRP_SCALE).cast("decimal(7,0)")
        ).cast("long"),
    )


def _int_dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _with_int_srp_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    tables: list[list[list[int]]],
    out_id: str,
    use_numpy: bool | None = None,
) -> DataFrame:
    """(out_id, out_id_q: array<long>, tbl, bkt) — integer twin of
    :func:`_with_srp_buckets`. Bucket bit p is ``dot_int > 0`` (STRICT:
    an exact-zero dot is a definite 0-bit on both engines — unlike the
    float path's >= 0, there is no sign ambiguity to paper over).
    Same literal-budget split as the float path: plane literals ride
    codegen while small, else one numpy int64 matmul per Arrow batch
    (exact — magnitudes stay under 2^53, see the budget note above)."""
    vq = quantize_vec(vec_col)
    n_tables = len(tables)
    n_literals = n_tables * len(tables[0]) * len(tables[0][0])
    if use_numpy is None:
        # Lower budget than the float path: the int fold is the same
        # interpreted-HOF shape, but Catalyst ALSO pays to fold 32
        # aggregate trees of long literals (measured at sf0.1, 4×8×64:
        # expression 8.9s vs numpy 2.3s for the bucket stage alone).
        use_numpy = n_literals > 512
    qcol = f"{out_id}_q"
    if not use_numpy:

        def table_key(t: int) -> Column:
            key = F.lit(0).cast("long")
            for p, plane in enumerate(tables[t]):
                lit_plane = F.array(*[F.lit(int(c)).cast("long") for c in plane])
                s = _int_dot(F.col(qcol), lit_plane)
                key = key + F.when(s > 0, F.lit(2**p)).otherwise(F.lit(0)).cast(
                    "long"
                )
            return key

        base = df.select(F.col(id_col).alias(out_id), vq.alias(qcol))
        return base.select(
            out_id,
            qcol,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("tbl"), table_key(t).alias("bkt")
                        )
                        for t in range(n_tables)
                    ]
                )
            ).alias("tb"),
        ).select(out_id, qcol, "tb.tbl", "tb.bkt")

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    pmats = [np.array(t, dtype=np.int64) for t in tables]
    pows = [2 ** np.arange(len(t), dtype=np.int64) for t in tables]
    base = df.select(F.col(id_col).alias(out_id), vq.alias(qcol))
    schema = StructType(
        [
            base.schema[out_id],
            StructField(qcol, ArrayType(LongType())),
            StructField("tbl", IntegerType()),
            StructField("bkt", LongType()),
        ]
    )

    def buckets(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vmat = np.stack(pdf[qcol].map(np.asarray).values).astype(np.int64)
            out = []
            for t, (pm, pw) in enumerate(zip(pmats, pows)):
                bits = (vmat @ pm.T) > 0  # exact int64, strict sign
                part = pdf[[out_id, qcol]].copy()
                part["tbl"] = t
                part["bkt"] = bits @ pw
                out.append(part)
            yield pd.concat(out, ignore_index=True)

    return base.mapInPandas(buckets, schema)


def _int_cosine_verify(
    dot_col: Column, na2: Column, nb2: Column, num: int, den: int
) -> Column:
    """cos ≥ num/den, decided in EXACT integer math (no float boundary):
    dot > 0 AND den²·dot² ≥ num²·na2·nb2, with the squares/products in
    decimal(29..32,0) — int64 inputs ≤ 2.6e14, so every intermediate is
    exact and far under decimal-38 / int128."""
    d = dot_col.cast("decimal(14,0)")
    a = na2.cast("decimal(14,0)")
    b = nb2.cast("decimal(14,0)")
    return (dot_col > 0) & (
        F.lit(den * den).cast("decimal(6,0)") * d * d
        >= F.lit(num * num).cast("decimal(6,0)") * a * b
    )


def embedding_near_dup_pairs_int(
    df: DataFrame,
    threshold_num: int = 2,
    threshold_den: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-dup pairs on the exact-integer SRP path:
    candidates from integer buckets, threshold verify cos ≥ num/den by
    integer cross-multiplication, score = dot/(√na2·√nb2) over
    identical int64 inputs (bit-equal across engines; ≤ 2^53 so the
    int→double widen is exact). Same bucketed-never-all-pairs scale
    shape as :func:`embedding_near_dup_pairs`."""
    from ..plans.pin import pin

    tables = int_srp_planes(n_tables, n_planes, dim)
    # Pinned for the same both-sides-of-the-self-join reason as the
    # float variant above.
    b = _with_int_srp_buckets(df, id_col, vec_col, tables, "id").transform(
        pin, eager=False
    )
    x, y = b.alias("x"), b.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.tbl") == F.col("y.tbl"))
            & (F.col("x.bkt") == F.col("y.bkt"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.id_q").alias("qa"),
            F.col("y.id_q").alias("qb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    dp = _int_dot(F.col("qa"), F.col("qb"))
    na2 = _int_dot(F.col("qa"), F.col("qa"))
    nb2 = _int_dot(F.col("qb"), F.col("qb"))
    return (
        cand.withColumn("dp", dp)
        .withColumn("na2", na2)
        .withColumn("nb2", nb2)
        .filter(
            _int_cosine_verify(
                F.col("dp"), F.col("na2"), F.col("nb2"),
                threshold_num, threshold_den,
            )
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("dp").cast("double")
                / (
                    F.sqrt(F.col("na2").cast("double"))
                    * F.sqrt(F.col("nb2").cast("double"))
                ),
                9,
            ).alias("score"),
        )
    )


def lsh_topk_int(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k on the exact-integer SRP path (cross-engine
    twin of :func:`lsh_topk`): integer buckets generate candidates, the
    exact integer-quantized cosine re-ranks them. Every score is a
    deterministic function of identical int64 triples, so a SQL engine
    replaying the buckets gets the same candidates, the same doubles,
    and the same row_number order (score desc, neighbor_id tie-break)."""
    tables = int_srp_planes(n_tables, n_planes, dim)
    cb = _with_int_srp_buckets(corpus, id_col, vec_col, tables, "neighbor_id")
    qb = _with_int_srp_buckets(queries, id_col, vec_col, tables, "query_id")
    cand = (
        cb.join(F.broadcast(qb), ["tbl", "bkt"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "query_id_q", "neighbor_id", "neighbor_id_q")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    dp = _int_dot(F.col("query_id_q"), F.col("neighbor_id_q"))
    na2 = _int_dot(F.col("query_id_q"), F.col("query_id_q"))
    nb2 = _int_dot(F.col("neighbor_id_q"), F.col("neighbor_id_q"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        (
            dp.cast("double")
            / (F.sqrt(na2.cast("double")) * F.sqrt(nb2.cast("double")))
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("score", 9).alias("score"),
            "rank",
        )
    )


def _sq_dist(a, b) -> Column:
    d = F.zip_with(a, b, lambda x, y: x - y)
    return dot(d, d)


def _nearest_cells(vec, centroids: list[tuple[int, list[float]]], n: int) -> Column:
    """Array of the ``n`` nearest centroid ids (ties → smaller id)."""
    scored = F.array(
        *[
            F.struct(
                _sq_dist(vec, F.array(*[F.lit(float(x)) for x in cv])).alias("d"),
                F.lit(cid).alias("cid"),
            )
            for cid, cv in centroids
        ]
    )
    return F.slice(F.array_sort(scored), 1, n).getField("cid")


# Above this many codebook literals (n_centroids × dim) cell
# assignment switches from column expressions to a numpy scorer in
# mapInPandas with the codebook in the task closure; plan stays O(1)
# in codebook size. The two paths agree on tie-robust data
# (tests/test_temporal.py pins agreement on the test corpora), but the
# numpy path's expanded distance form (v·v − 2v·c + c·c) can differ
# from the expression path's fold of (x−y)² in final ulps, so an EXACT
# distance tie may assign across paths differently — the pruned
# consumers stay safe because they are fenced by recall/fullprobe
# oracles, not by bit-identical cell assignment (round-13 ADVICE). Round-13 measurement: the numpy path wins ALREADY at
# 1024 literals (16×64 codebook: 1.77s → 0.27s on the 2000-row
# corpus) — Catalyst analysis + codegen of the ~2k-node distance tree
# dominates long before the old 4096 budget; guide §4.2's "one
# vectorized batch op beats a chain of JVM expressions" applies. The
# expression path stays for genuinely tiny codebooks where a Python
# worker round-trip isn't worth spinning up.
IVF_MAX_CODEBOOK_LITERALS = 128


def _assign_cells(
    df: DataFrame,
    vec_col: str,
    centroids: list[tuple[int, list[float]]],
    n: int,
    out_col: str,
    use_numpy: bool | None = None,
) -> DataFrame:
    """Add ``out_col`` = array of the ``n`` nearest centroid ids (ties →
    smaller id) for ``df[vec_col]`` (array<double>).

    ``use_numpy=None`` auto-selects: column expressions while the
    codebook fits :data:`IVF_MAX_CODEBOOK_LITERALS` (faster at small
    sizes — stays in whole-stage codegen), numpy mapInPandas beyond.
    """
    cents = sorted(centroids)
    dim = len(cents[0][1])
    if use_numpy is None:
        use_numpy = len(cents) * dim > IVF_MAX_CODEBOOK_LITERALS
    if not use_numpy:
        return df.withColumn(out_col, _nearest_cells(F.col(vec_col), cents, n))

    import numpy as np

    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    cids = np.array([c for c, _ in cents], dtype=np.int64)  # ascending
    cmat = np.array([v for _, v in cents], dtype=np.float64)
    cn2 = (cmat * cmat).sum(axis=1)
    schema = StructType(
        df.schema.fields + [StructField(out_col, ArrayType(IntegerType()))]
    )

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vmat = np.stack(pdf[vec_col].map(np.asarray).values).astype(np.float64)
            d2 = (vmat * vmat).sum(1)[:, None] - 2.0 * (vmat @ cmat.T) + cn2[None, :]
            # cents ascend by cid, so a stable argsort breaks distance
            # ties toward the smaller cid — same rule as _nearest_cells
            order = np.argsort(d2, axis=1, kind="stable")[:, :n]
            pdf = pdf.copy()
            pdf[out_col] = [cids[row].tolist() for row in order]
            yield pdf

    return df.mapInPandas(assign, schema)


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 1,
) -> list[tuple[int, list[float]]]:
    """Deterministic IVF codebook: seed with the ``n_centroids`` vectors
    whose ``md5(id)`` hashes sort lowest (a deterministic uniform sample
    over the whole corpus — head-of-table seeding is distributionally
    biased on sorted/clustered corpora at scale; round-4 verdict), then
    ``refine_iters`` distributed Lloyd steps (assign → per-dimension
    mean via posexplode → collect the tiny codebook). The corpus is
    only ever scanned, never shuffled by vector — the per-cell means
    shuffle (cell, dim, partial-sum) triples, O(n_centroids × dim)
    final state.
    """
    seeds = (
        corpus.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_centroids)
        .select(_as_double(vec_col).alias("v"))
        .collect()
    )
    cents = [(i, list(r.v)) for i, r in enumerate(seeds)]
    # Fused Lloyd step (round-8): ONE mapInPandas pass assigns every
    # local batch to cells via a numpy distance matmul AND emits
    # per-task (cell, vector-sum, count) partials — replacing the
    # retired assign-job + posexplode-shuffle + means-job chain (three
    # jobs and an n×dim row explosion; the fixed job overhead dominated
    # the whole IVF query at bench scale). The driver combine is
    # bounded by O(tasks × n_centroids × dim) partial rows — fine to
    # ~10^4 tasks; past that, insert a groupBy(cid) tree-combine in
    # front (same partials, one tiny shuffle) before collecting.
    import numpy as np
    import pandas as pd

    for _ in range(refine_iters):
        cmat = np.array([v for _, v in cents], dtype=np.float64)
        cell_ids = np.array([c for c, _ in cents], dtype=np.int64)
        cn2 = (cmat * cmat).sum(axis=1)

        def partials(it):
            acc_s: dict[int, np.ndarray] = {}
            acc_n: dict[int, int] = {}
            for pdf in it:
                if not len(pdf):
                    continue
                vm = np.stack(pdf["v"].map(np.asarray).values)
                d2 = (
                    (vm * vm).sum(axis=1)[:, None]
                    - 2.0 * (vm @ cmat.T)
                    + cn2[None, :]
                )
                # argmin's first-minimum rule == ties → smaller cid
                # (cents are sorted by id)
                a = d2.argmin(axis=1)
                for j in np.unique(a):
                    m = a == j
                    cid = int(cell_ids[j])
                    if cid in acc_n:
                        acc_s[cid] = acc_s[cid] + vm[m].sum(axis=0)
                        acc_n[cid] += int(m.sum())
                    else:
                        acc_s[cid] = vm[m].sum(axis=0)
                        acc_n[cid] = int(m.sum())
            if acc_n:
                yield pd.DataFrame(
                    {
                        "cid": pd.Series(list(acc_n), dtype="int64"),
                        "s": [acc_s[c].tolist() for c in acc_n],
                        "n": pd.Series(
                            [acc_n[c] for c in acc_n], dtype="int64"
                        ),
                    }
                )

        rows = (
            corpus.select(_as_double(vec_col).alias("v"))
            .mapInPandas(partials, "cid long, s array<double>, n long")
            .collect()
        )
        sums: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for r in rows:
            a = np.asarray(r.s, dtype=np.float64)
            if r.cid in counts:
                sums[r.cid] = sums[r.cid] + a
                counts[r.cid] += r.n
            else:
                sums[r.cid] = a
                counts[r.cid] = r.n
        # empty cells drop, matching the retired groupBy semantics
        cents = sorted(
            (int(c), (sums[c] / counts[c]).tolist()) for c in counts
        )
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    cents: list[tuple[int, list[float]]] | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    centroid cells, score each query only against its ``n_probe``
    nearest cells, exact cosine re-rank inside the probed cells.

    ``cents`` takes a precomputed :func:`ivf_centroids` codebook — the
    index-once / probe-many pattern (an n_probe tuning sweep trains ONE
    codebook, not one per operating point).

    Scale shape: the corpus is assigned to cells in one local pass (no
    shuffle — the codebook rides the plan as expressions while small,
    or the task closure as a numpy matrix past
    IVF_MAX_CODEBOOK_LITERALS; see :func:`_assign_cells`); queries
    explode to (query, cell) pairs and broadcast; the candidate join
    touches ~n_probe/n_centroids of the corpus. Scoring (round-8) is a
    vectorized einsum per Arrow batch with a per-batch top-k prune —
    the global window ranks O(k × batches × queries) rows, never the
    candidate set (the retired per-pair HOF-fold version spent 14× the
    brute-force matmul's time at full probe and shipped every candidate
    to the window).
    """
    import numpy as np
    import pandas as pd

    if cents is None:
        cents = ivf_centroids(corpus, n_centroids, id_col, vec_col)
    if assigned is not None:
        # probe a PERSISTED index (columns neighbor_id, cv, cid) — the
        # index-once/probe-many pattern made literal: the assignment
        # scan is skipped entirely and, when the index is written
        # partitionBy(cid), the cid join key prunes cell directories.
        c = assigned.select("neighbor_id", "cv", "cid")
    else:
        c = _assign_cells(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                _as_double(vec_col).alias("cv"),
            ),
            "cv", cents, 1, "cids",
        ).withColumn("cid", F.col("cids")[0]).drop("cids")
    q = _assign_cells(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
        ),
        "qv", cents, n_probe, "cids",
    ).withColumn("cid", F.explode("cids")).drop("cids")
    joined = (
        c.join(F.broadcast(q), "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
    )

    def score_batches(it):
        for pdf in it:
            if not len(pdf):
                continue
            qm = np.stack(pdf["qv"].map(np.asarray).values)
            cm = np.stack(pdf["cv"].map(np.asarray).values)
            dots = np.einsum("ij,ij->i", qm, cm)
            s = dots / (
                np.linalg.norm(qm, axis=1) * np.linalg.norm(cm, axis=1)
            )
            out = pd.DataFrame(
                {
                    "query_id": pdf["query_id"].astype("int64"),
                    "neighbor_id": pdf["neighbor_id"].astype("int64"),
                    "score": s,
                }
            )
            # per-batch top-k per query, same order as the global
            # window (score desc, neighbor_id) — pruning-safe: the
            # global top-k is a subset of the union of batch top-ks
            yield (
                out.sort_values(
                    ["query_id", "score", "neighbor_id"],
                    ascending=[True, False, True],
                )
                .groupby("query_id", sort=False)
                .head(k)
            )

    scored = joined.mapInPandas(
        score_batches, "query_id long, neighbor_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )



def ivf_topk_sweep(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    probes: tuple[int, ...] = (1, 2, 4, 8),
    cents: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF top-k at SEVERAL n_probe operating points from ONE scoring
    pass: assign query cells once at max(probes) keeping the probe
    rank, score all candidates once, then each operating point is a
    filter (probe_rank < p) + top-k window over the pruned candidate
    set.  4 probe points cost ~1 ivf_topk run, not 4 (the n_probe
    tuning sweep went 20.8s -> see query using this).

    Pruning safety: the per-batch head(k) is grouped by (query_id,
    probe_idx), so for every prefix set {probe_idx < p} the global
    top-k survives batching — each survivor is within the top-k of its
    own (query, probe rank) group.

    Returns columns: n_probe, query_id, neighbor_id, score, rank.
    """
    import numpy as np
    import pandas as pd

    from ..plans.pin import pin

    probes = tuple(sorted(set(probes)))
    max_p = probes[-1]
    if cents is None:
        cents = ivf_centroids(corpus, n_centroids, id_col, vec_col)
    c = _assign_cells(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv")
        ),
        "cv", cents, 1, "cids",
    ).withColumn("cid", F.col("cids")[0]).drop("cids")
    q = _assign_cells(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
        ),
        "qv", cents, max_p, "cids",
    ).select(
        "query_id", "qv",
        F.posexplode("cids").alias("probe_idx", "cid"),
    )
    joined = (
        c.join(F.broadcast(q), "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qv", "probe_idx", "neighbor_id", "cv")
    )

    def score_batches(it):
        for pdf in it:
            if not len(pdf):
                continue
            qm = np.stack(pdf["qv"].map(np.asarray).values)
            cm = np.stack(pdf["cv"].map(np.asarray).values)
            dots = np.einsum("ij,ij->i", qm, cm)
            s = dots / (
                np.linalg.norm(qm, axis=1) * np.linalg.norm(cm, axis=1)
            )
            out = pd.DataFrame(
                {
                    "query_id": pdf["query_id"].astype("int64"),
                    "probe_idx": pdf["probe_idx"].astype("int32"),
                    "neighbor_id": pdf["neighbor_id"].astype("int64"),
                    "score": s,
                }
            )
            yield (
                out.sort_values(
                    ["query_id", "score", "neighbor_id"],
                    ascending=[True, False, True],
                )
                .groupby(["query_id", "probe_idx"], sort=False)
                .head(k)
            )

    scored = pin(
        joined.mapInPandas(
            score_batches,
            "query_id long, probe_idx int, neighbor_id long, score double",
        ),
        eager=False,
    )  # consumed once per operating point; <= batches*queries*max_p*k rows
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    res = None
    for p_ in probes:
        r = (
            scored.filter(F.col("probe_idx") < p_)
            .withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= k)
            .select(
                F.lit(p_).cast("int").alias("n_probe"),
                "query_id", "neighbor_id", "score", "rank",
            )
        )
        res = r if res is None else res.unionByName(r)
    return res


# ---------------------------------------------------------------------------
# Product quantization (PQ) with asymmetric distance computation (ADC)
# ---------------------------------------------------------------------------

# Driver-side training sample is bounded by this many vectors — the
# codebook must be learnable from a sample regardless of corpus size
# (the standard PQ practice: train on ~10^4-10^6 vectors even for
# billion-vector indexes).
PQ_TRAIN_SAMPLE = 2048


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 5,
):
    """Train per-subspace PQ codebooks on L2-normalized vectors.

    Deterministic: the training sample is the PQ_TRAIN_SAMPLE vectors
    with the lowest ``md5(id)`` hashes — a deterministic uniform sample
    over the whole corpus rather than a head-of-table prefix, which is
    distributionally biased on sorted/clustered corpora at scale
    (round-4 verdict item 3). Bounded driver collect, like the IVF
    codebook; each subspace k-means seeds from the first ``n_codes``
    sample rows and runs a fixed number of Lloyd iterations with stable
    (lowest-code-wins) tie-breaks.

    Returns ``(codebooks, dim)`` where codebooks is a float64 array of
    shape (m, n_codes, dim // m).
    """
    import numpy as np

    rows = (
        corpus.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(PQ_TRAIN_SAMPLE)
        .select(_as_double(vec_col).alias("v"))
        .collect()
    )
    x = np.array([r.v for r in rows], dtype=np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    x = x / norms
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m
    books = np.empty((m, n_codes, d_sub), dtype=np.float64)
    for s in range(m):
        xs = x[:, s * d_sub : (s + 1) * d_sub]
        cents = xs[:n_codes].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # argmin: first (lowest) code on ties
            for c in range(n_codes):
                mask = assign == c
                if mask.any():
                    cents[c] = xs[mask].mean(axis=0)
        books[s] = cents
    return books, dim


def pq_encode(
    corpus: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector to ``m`` one-byte codes (nearest sub-centroid
    per subspace, after L2 normalization). A 768-dim float corpus
    compresses ~384x at m=8 — the index that makes billion-scale ANN
    RAM-resident.

    Scale shape: pure mapInPandas over corpus partitions, codebook in
    the task closure (m × n_codes × d_sub ≈ KBs) — no shuffle, no
    driver involvement.
    """
    import numpy as np

    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    books = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, d_sub = books.shape
    schema = StructType(
        [
            StructField("neighbor_id", LongType()),
            StructField("codes", ArrayType(IntegerType())),
        ]
    )

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vmat = np.stack(pdf[vec_col].map(np.asarray).values).astype(np.float64)
            norms = np.linalg.norm(vmat, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            vmat = vmat / norms
            codes = np.empty((len(vmat), m), dtype=np.int64)
            for s in range(m):
                xs = vmat[:, s * d_sub : (s + 1) * d_sub]
                # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; row-constant
                # ||x||^2 doesn't change the argmin
                d2 = -2.0 * (xs @ books[s].T) + (books[s] ** 2).sum(axis=1)[None, :]
                codes[:, s] = d2.argmin(axis=1)
            out = pdf[[id_col]].rename(columns={id_col: "neighbor_id"}).copy()
            out["codes"] = [row.tolist() for row in codes]
            yield out

    return corpus.mapInPandas(encode, schema)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int = 4,
) -> DataFrame:
    """PQ/ADC approximate top-k cosine neighbors: quantize the corpus
    to ``m``-byte codes, shortlist ``k × rerank`` candidates per query
    via per-query lookup tables (asymmetric distance — the query stays
    exact), then EXACT-cosine re-rank the shortlist. On L2-normalized
    vectors, squared L2 is monotone in cosine, so the ADC shortlist
    orders by estimated cosine; the re-rank stage (the standard IVFPQ
    production pattern) recovers the precision quantization loses —
    recall is then limited only by true neighbors missing the
    shortlist, not by code resolution. ``rerank=0`` disables re-ranking
    (pure ADC scores in ``approx_score``).

    Scale shape: the corpus is scanned once to encode (mapInPandas, no
    shuffle) and once to score against the broadcast query LUT block
    (bounded: n_queries × m × n_codes floats); each batch emits only
    its local shortlist per query, so the global window ranks
    O(n_partitions × queries × k·rerank) candidate rows, never the
    corpus. The re-rank fetch is a broadcast semi-join of the tiny
    candidate id set against the corpus scan (predicate pushdown on
    id), then queries × shortlist exact scoring.
    """
    import numpy as np

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    books, dim = pq_train(corpus, m, n_codes, id_col, vec_col)
    d_sub = dim // m
    qrows = (
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
        )
        .collect()
    )
    qids = np.array([r.query_id for r in qrows], dtype=np.int64)
    qmat = np.array([r.qv for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(qmat, axis=1, keepdims=True)
    qn[qn == 0.0] = 1.0
    qmat = qmat / qn
    # LUT[q, s, c] = ||q_s - book[s, c]||^2
    lut = np.empty((len(qids), m, n_codes), dtype=np.float64)
    for s in range(m):
        qs = qmat[:, s * d_sub : (s + 1) * d_sub]
        lut[:, s, :] = (
            (qs ** 2).sum(axis=1)[:, None]
            - 2.0 * (qs @ books[s].T)
            + (books[s] ** 2).sum(axis=1)[None, :]
        )

    encoded = pq_encode(corpus, books, id_col, vec_col)
    schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("approx_score", DoubleType()),
        ]
    )
    sidx = np.arange(m)

    shortlist_k = k * rerank if rerank else k

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["codes"].map(np.asarray).values)  # (B, m)
            nids = pdf["neighbor_id"].values
            # d2[q, b] = sum_s LUT[q, s, codes[b, s]]
            d2 = lut[:, sidx[None, :], codes].sum(axis=2)  # (Q, B)
            for qi in range(len(qids)):
                row = d2[qi]
                mask = nids != qids[qi]
                cand = np.where(mask)[0]
                if not len(cand):
                    continue
                # local prune: keep this batch's shortlist best (ties to
                # lower id resolved by the global window later)
                order = cand[np.lexsort((nids[cand], row[cand]))][:shortlist_k]
                yield pd.DataFrame(
                    {
                        "query_id": qids[qi],
                        "neighbor_id": nids[order],
                        "approx_score": 1.0 - row[order] / 2.0,
                    }
                )

    scored = encoded.mapInPandas(score, schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_score").desc(), F.col("neighbor_id")
    )
    shortlisted = (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= shortlist_k)
    )
    if not rerank:
        return shortlisted.select("query_id", "neighbor_id", "approx_score", "rank")

    # Exact re-rank: fetch the shortlist's true vectors (broadcast the
    # tiny candidate set onto the corpus scan) and score exact cosine
    # against the broadcast queries.
    cand = shortlisted.select("query_id", "neighbor_id")
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv")
    )
    qdf = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    )
    exact = (
        cand.join(vecs, "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("score"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 16,
    n_codes: int = 32,
    rerank: int = 8,
) -> DataFrame:
    """IVF-PQ composite ANN — the production billion-vector index
    architecture: a coarse IVF codebook routes each vector to a cell,
    PQ compresses it to ``m`` one-byte codes, and a query (a) probes
    only its ``n_probe`` nearest cells and (b) scores the probed
    fraction via ADC lookup tables, then exact-cosine re-ranks the
    ``k × rerank`` shortlist. Relative to :func:`pq_topk`, the IVF
    routing cuts the scored fraction to ~n_probe/n_centroids; relative
    to :func:`ivf_topk`, the PQ codes make the probed scan a
    byte-table lookup instead of full-vector arithmetic. (Classic
    IVFPQ encodes residuals against the cell centroid; this
    implementation quantizes the raw normalized vectors — simpler, and
    the exact re-rank absorbs the accuracy difference at these
    shortlist sizes.)

    Deterministic end-to-end: IVF seeds and PQ training both derive
    from lowest-id samples; all tie-breaks are stable.

    Scale shape: one corpus pass to assign+encode (mapInPandas, both
    codebooks in the task closure), one pass over ONLY probed-cell
    rows for ADC, a window over per-batch shortlists, and a
    broadcast-stitched exact re-rank of k·rerank rows per query.
    """
    import numpy as np

    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    cents = ivf_centroids(corpus, n_centroids, id_col, vec_col)
    cids = np.array([c for c, _ in cents], dtype=np.int64)
    cmat = np.array([v for _, v in cents], dtype=np.float64)
    books, dim = pq_train(corpus, m, n_codes, id_col, vec_col)
    d_sub = dim // m

    # -- one corpus pass: coarse cell + fine codes
    enc_schema = StructType(
        [
            StructField("neighbor_id", LongType()),
            StructField("cid", IntegerType()),
            StructField("codes", ArrayType(IntegerType())),
        ]
    )

    def encode(batches):
        cn2 = (cmat * cmat).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            vmat = np.stack(pdf[vec_col].map(np.asarray).values).astype(np.float64)
            d2c = (vmat * vmat).sum(1)[:, None] - 2.0 * (vmat @ cmat.T) + cn2[None, :]
            cell = cids[np.argsort(d2c, axis=1, kind="stable")[:, 0]]
            norms = np.linalg.norm(vmat, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            vn = vmat / norms
            codes = np.empty((len(vn), m), dtype=np.int64)
            for s in range(m):
                xs = vn[:, s * d_sub : (s + 1) * d_sub]
                d2 = -2.0 * (xs @ books[s].T) + (books[s] ** 2).sum(axis=1)[None, :]
                codes[:, s] = d2.argmin(axis=1)
            out = pd.DataFrame(
                {
                    "neighbor_id": pdf[id_col].values,
                    "cid": cell.astype(np.int32),
                    "codes": [row.tolist() for row in codes],
                }
            )
            yield out

    encoded = corpus.select(F.col(id_col), _as_double(vec_col).alias(vec_col)).mapInPandas(
        encode, enc_schema
    )

    # -- queries: probe cells + ADC LUTs (bounded driver collect)
    qrows = (
        queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"))
        .collect()
    )
    qids = np.array([r.query_id for r in qrows], dtype=np.int64)
    qmat = np.array([r.qv for r in qrows], dtype=np.float64)
    d2c = (qmat * qmat).sum(1)[:, None] - 2.0 * (qmat @ cmat.T) + (cmat * cmat).sum(
        axis=1
    )[None, :]
    probes = [
        set(cids[np.argsort(row, kind="stable")[:n_probe]].tolist()) for row in d2c
    ]
    qn = np.linalg.norm(qmat, axis=1, keepdims=True)
    qn[qn == 0.0] = 1.0
    qnorm = qmat / qn
    lut = np.empty((len(qids), m, n_codes), dtype=np.float64)
    for s in range(m):
        qs = qnorm[:, s * d_sub : (s + 1) * d_sub]
        lut[:, s, :] = (
            (qs ** 2).sum(axis=1)[:, None]
            - 2.0 * (qs @ books[s].T)
            + (books[s] ** 2).sum(axis=1)[None, :]
        )

    shortlist_k = k * rerank if rerank else k
    score_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("approx_score", DoubleType()),
        ]
    )
    sidx = np.arange(m)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cell = pdf["cid"].values
            codes = np.stack(pdf["codes"].map(np.asarray).values)
            nids = pdf["neighbor_id"].values
            d2 = lut[:, sidx[None, :], codes].sum(axis=2)  # (Q, B)
            for qi in range(len(qids)):
                mask = np.isin(cell, list(probes[qi])) & (nids != qids[qi])
                cand = np.where(mask)[0]
                if not len(cand):
                    continue
                row = d2[qi]
                order = cand[np.lexsort((nids[cand], row[cand]))][:shortlist_k]
                yield pd.DataFrame(
                    {
                        "query_id": qids[qi],
                        "neighbor_id": nids[order],
                        "approx_score": 1.0 - row[order] / 2.0,
                    }
                )

    scored = encoded.mapInPandas(score, score_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_score").desc(), F.col("neighbor_id")
    )
    shortlisted = scored.withColumn(
        "rank", F.row_number().over(w).cast("bigint")
    ).filter(F.col("rank") <= shortlist_k)
    if not rerank:
        return shortlisted.select("query_id", "neighbor_id", "approx_score", "rank")
    cand = shortlisted.select("query_id", "neighbor_id")
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv")
    )
    qdf = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    )
    exact = (
        cand.join(vecs, "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("score"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def cosine_range_search(
    corpus: DataFrame,
    queries: DataFrame,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine RANGE search: every (query, corpus) pair with
    similarity ≥ ``tau`` — the radius-query sibling of
    :func:`cosine_topk` (dedup-by-similarity and recall-oriented
    retrieval want "everything this close", not a fixed k).

    Scale shape: identical to cosine_topk — the query block broadcasts
    inside the ``mapInPandas`` closure, the corpus never shuffles, and
    each Arrow batch emits ONLY its ≥ tau hits, so output volume is the
    result size, not batch·queries. No ranking window at all (nothing
    to merge: the predicate is per-pair).

    Caller picks ``tau`` away from any realizable score (matmul vs
    sequential-fold drift is ≤ ~4e-16; a threshold inside that band of
    an actual score would be engine-dependent).
    """
    import numpy as np
    import pandas as pd

    qrows = queries.select(
        F.col(id_col).alias("qid"), _as_double(vec_col).alias("qv")
    ).collect()
    qids = np.array([r.qid for r in qrows], dtype=np.int64)
    qmat = np.array([r.qv for r in qrows], dtype=np.float64)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)

    def score_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cmat = np.stack(pdf["cv"].map(np.asarray).values).astype(np.float64)
            cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)
            sims = cmat @ qnorm.T  # (batch, queries)
            cand_ids = pdf["neighbor_id"].values
            self_mask = cand_ids[:, None] == qids[None, :]
            sims[self_mask] = -np.inf
            rows, cols = np.nonzero(sims >= tau)
            if len(rows):
                yield pd.DataFrame(
                    {
                        "query_id": qids[cols],
                        "neighbor_id": cand_ids[rows],
                        "score": sims[rows, cols],
                    }
                )

    return corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv")
    ).mapInPandas(score_batches, "query_id long, neighbor_id long, score double")
