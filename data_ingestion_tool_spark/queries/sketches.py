"""Probabilistic-structure queries with EXACT cross-engine replay:
count-min sketch, Bloom-filter join pruning, bitmap (roaring-style)
index intersection.

These are the sketch/index primitives a 100 TB pipeline leans on —
heavy-hitter estimation without a full groupBy ship, semi-join pruning
before a shuffle, and set algebra over compressed user bitmaps. Each is
built from md5-derived or closed-form INTEGER hashing (Python-free,
engine-identical: Spark `conv(substring(md5(x),1,15),16,10)` ==
DuckDB `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`), so the DuckDB
oracle replays the ENTIRE structure — build, probe, and estimate — and
the driver hash pins every counter, not just a summary.

Reference parity: the reference (`backend/main.py`) has no sketches —
this is north-star extension surface (BASELINE.json: dedup/similarity/
scale machinery), same registry discipline as every other family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.pin import pin
from ..sources.parquet_io import read_events, read_table
from .registry import query

# shared md5→int60 fragments (the repo's standard cross-engine hash)
_SPARK_MD5 = "CAST(conv(substring(md5({x}), 1, 15), 16, 10) AS BIGINT)"
_DUCK_MD5 = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"

_CMS_D = 4  # hash rows
_CMS_W = 64  # counters per row — small enough that collisions are real


@query(
    "sketch_count_min_user_events",
    oracle=f"""
    WITH rows_ AS (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS j),
    hashed AS (
      SELECT r.j, e.user_id,
             {_DUCK_MD5.format(x="r.j || ':' || CAST(e.user_id AS VARCHAR)")}
               % {_CMS_W} AS bucket
      FROM events e, rows_ r),
    sketch AS (
      SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM hashed GROUP BY j, bucket),
    exact AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt
      FROM events GROUP BY user_id
      ORDER BY exact_cnt DESC, user_id LIMIT 10),
    probes AS (
      SELECT x.user_id, x.exact_cnt, r.j,
             {_DUCK_MD5.format(x="r.j || ':' || CAST(x.user_id AS VARCHAR)")}
               % {_CMS_W} AS bucket
      FROM exact x, rows_ r)
    SELECT p.user_id, p.exact_cnt,
           CAST(MIN(s.cnt) AS BIGINT) AS cms_estimate,
           CAST(MIN(s.cnt) - p.exact_cnt AS BIGINT) AS overestimate
    FROM probes p JOIN sketch s ON s.j = p.j AND s.bucket = p.bucket
    GROUP BY p.user_id, p.exact_cnt
    ORDER BY p.exact_cnt DESC, p.user_id
    """,
)
def sketch_count_min_user_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Count-min sketch (Cormode-Muthukrishnan) of per-user event
    counts — d=4 md5-derived hash rows x w=64 counters — probed for
    the top-10 exact heavy hitters: estimate = min over rows of the
    hit counter, always >= exact (the CMS one-sided guarantee, visible
    in the `overestimate` column since w=64 forces real collisions).
    The oracle replays build AND probe bit-for-bit, so the hash pins
    every counter the estimate touched.

    Scale shape: the sketch build is ONE map-side-combinable groupBy
    over (j, bucket) — d·w = 256 cells regardless of input rows (the
    whole point: a fixed-size summary at 100 TB); the probe joins 40
    rows against those cells. The exact top-10 is TakeOrdered-style
    (it exists to EXPOSE sketch error, not as part of the sketch
    cost). Round 14: keyed :func:`spread` fans the d=4 per-row md5s
    off the single-row-group scan task (solo 1.00 -> 0.59s); plan
    no-op on multi-row-group layouts."""
    from ..operators.partitioning import spread

    e = spread(
        read_events(spark, sf_dir).select("user_id", "event_id"),
        by=["event_id"],
    ).select("user_id")
    rows_ = spark.range(_CMS_D).select(F.col("id").cast("bigint").alias("j"))
    hashed = e.crossJoin(F.broadcast(rows_)).selectExpr(
        "j",
        "user_id",
        _SPARK_MD5.format(x="concat(j, ':', CAST(user_id AS STRING))")
        + f" % {_CMS_W} AS bucket",
    )
    sketch = hashed.groupBy("j", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    exact = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "user_id")
        .limit(10)
    )
    probes = exact.crossJoin(F.broadcast(rows_)).selectExpr(
        "user_id",
        "exact_cnt",
        "j",
        _SPARK_MD5.format(x="concat(j, ':', CAST(user_id AS STRING))")
        + f" % {_CMS_W} AS bucket",
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("user_id", "exact_cnt")
        .agg(
            F.min("cnt").cast("bigint").alias("cms_estimate"),
            (F.min("cnt") - F.col("exact_cnt"))
            .cast("bigint")
            .alias("overestimate"),
        )
        .orderBy(F.desc("exact_cnt"), "user_id")
    )


_BLOOM_M = 4096  # bits
_BLOOM_K = 3  # hash functions


@query(
    "sketch_bloom_join_prune",
    oracle=f"""
    WITH ks AS (SELECT unnest(generate_series(0, {_BLOOM_K - 1})) AS i),
    build AS (
      SELECT DISTINCT o_custkey AS k FROM orders
      WHERE o_totalprice > 150000),
    bits AS (
      SELECT DISTINCT
             {_DUCK_MD5.format(x="i.i || '#' || CAST(b.k AS VARCHAR)")}
               % {_BLOOM_M} AS bit
      FROM build b, ks i),
    probe AS (SELECT c_custkey AS k FROM customer),
    probe_bits AS (
      SELECT p.k, i.i,
             {_DUCK_MD5.format(x="i.i || '#' || CAST(p.k AS VARCHAR)")}
               % {_BLOOM_M} AS bit
      FROM probe p, ks i),
    hits AS (
      SELECT pb.k,
             SUM(CASE WHEN bits.bit IS NULL THEN 0 ELSE 1 END) AS nhit
      FROM probe_bits pb LEFT JOIN bits ON bits.bit = pb.bit
      GROUP BY pb.k),
    passed AS (SELECT k FROM hits WHERE nhit = {_BLOOM_K})
    SELECT CAST((SELECT COUNT(*) FROM build) AS BIGINT) AS n_build_keys,
           CAST((SELECT COUNT(*) FROM bits) AS BIGINT) AS n_set_bits,
           CAST((SELECT COUNT(*) FROM probe) AS BIGINT) AS n_probe,
           CAST((SELECT COUNT(*) FROM passed) AS BIGINT) AS n_pass,
           CAST((SELECT COUNT(*) FROM passed WHERE k IN (SELECT k FROM build))
                AS BIGINT) AS n_true_members,
           CAST((SELECT COUNT(*) FROM passed WHERE k NOT IN (SELECT k FROM build))
                AS BIGINT) AS n_false_positives
    """,
)
def sketch_bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning: an m=4096-bit / k=3-hash Bloom
    filter built over the distinct custkeys of high-value orders, then
    probed by EVERY customer — the pattern that prunes a 100 TB fact
    shuffle down to probable matches before the real join (Spark's own
    runtime row-group Bloom pushdown, made explicit and auditable).
    Zero false negatives by construction (every true member passes —
    the oracle pins n_true_members == n_build_keys); false positives
    are the measured cost of m/n bits per key.

    Scale shape: the filter is a distinct-bit frame (<= m rows) —
    broadcast-sized no matter how large the build side's ROW count is;
    the probe is a broadcast left join + bounded count per key, never
    a shuffle of the fact table."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    ks = spark.range(_BLOOM_K).select(F.col("id").cast("bigint").alias("i"))
    build = (
        o.filter(F.col("o_totalprice") > 150000)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    bits = (
        build.crossJoin(F.broadcast(ks))
        .selectExpr(
            _SPARK_MD5.format(x="concat(i, '#', CAST(k AS STRING))")
            + f" % {_BLOOM_M} AS bit"
        )
        .distinct()
    )
    probe = c.select(F.col("c_custkey").alias("k"))
    probe_bits = probe.crossJoin(F.broadcast(ks)).selectExpr(
        "k",
        _SPARK_MD5.format(x="concat(i, '#', CAST(k AS STRING))")
        + f" % {_BLOOM_M} AS bit",
    )
    hits = (
        probe_bits.join(
            F.broadcast(bits.withColumn("hit", F.lit(1))), "bit", "left"
        )
        .groupBy("k")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("nhit"))
    )
    passed = hits.filter(F.col("nhit") == _BLOOM_K).select("k")
    # all counts are tiny scalar folds; evaluate via joins against the
    # build key set (broadcast) to classify true members vs FPs
    bkeys = build.withColumn("is_member", F.lit(1))
    cls = passed.join(F.broadcast(bkeys), "k", "left")
    return (
        cls.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pass"),
            F.sum(F.coalesce(F.col("is_member"), F.lit(0)))
            .cast("bigint")
            .alias("n_true_members"),
            F.sum(
                F.when(F.col("is_member").isNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_false_positives"),
        )
        .crossJoin(
            F.broadcast(
                build.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_build_keys")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                bits.agg(F.count(F.lit(1)).cast("bigint").alias("n_set_bits"))
            )
        )
        .crossJoin(
            F.broadcast(
                probe.agg(F.count(F.lit(1)).cast("bigint").alias("n_probe"))
            )
        )
        .select(
            "n_build_keys",
            "n_set_bits",
            "n_probe",
            "n_pass",
            "n_true_members",
            "n_false_positives",
        )
    )


@query(
    "sketch_bitmap_index_intersection",
    oracle="""
    WITH words AS (
      SELECT event_type,
             CAST(user_id // 63 AS BIGINT) AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INT))
               AS bitmap
      FROM events
      WHERE event_type IN ('click', 'purchase')
      GROUP BY event_type, CAST(user_id // 63 AS BIGINT)),
    c AS (SELECT word, bitmap FROM words WHERE event_type = 'click'),
    p AS (SELECT word, bitmap FROM words WHERE event_type = 'purchase'),
    both_ AS (
      SELECT CAST(COALESCE(SUM(bit_count(c.bitmap & p.bitmap)), 0) AS BIGINT)
               AS n_both
      FROM c JOIN p ON p.word = c.word),
    uni AS (
      SELECT CAST(SUM(bit_count(bm)) AS BIGINT) AS n_union FROM (
        SELECT COALESCE(c.bitmap, 0) | COALESCE(p.bitmap, 0) AS bm
        FROM c FULL OUTER JOIN p ON p.word = c.word)),
    exact AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_both_exact FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'))
    SELECT
      CAST((SELECT SUM(bit_count(bitmap)) FROM c) AS BIGINT) AS n_click,
      CAST((SELECT SUM(bit_count(bitmap)) FROM p) AS BIGINT) AS n_purchase,
      (SELECT n_both FROM both_) AS n_both_bitmap,
      (SELECT n_union FROM uni) AS n_union_bitmap,
      (SELECT n_both_exact FROM exact) AS n_both_exact,
      CAST(((SELECT n_both FROM both_) = (SELECT n_both_exact FROM exact))
           AS INT) AS bitmap_matches_exact
    """,
)
def sketch_bitmap_index_intersection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Roaring-style bitmap index set algebra: per event type, user ids
    pack into 63-bit words (word = id DIV 63, bit = id MOD 63 — the
    sign bit stays clear so the int64 words behave identically in both
    engines' two's-complement & | bit_count). Intersection and union
    of the 'click'/'purchase' user sets are then word-aligned AND/OR +
    popcount — no distinct, no wide shuffle — and the bitmap
    intersection count is pinned EQUAL to the exact INTERSECT count
    (bitmaps are lossless, unlike sketches).

    Scale shape: the bitmap build is one map-side-combinable bit_or
    groupBy (output = n_users/63 words per type — the compressed
    index); the set ops join word-aligned frames that are ~1000x
    smaller than the event table. This is the bitmap-index pattern
    OLAP engines use for low-cardinality predicate algebra at scale."""
    e = read_events(spark, sf_dir).filter(
        F.col("event_type").isin("click", "purchase")
    )
    words = (
        e.selectExpr(
            "event_type",
            "CAST(user_id DIV 63 AS BIGINT) AS word",
            "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT)) AS b",
        )
        .groupBy("event_type", "word")
        .agg(F.expr("bit_or(b)").alias("bitmap"))
    )
    c = words.filter(F.col("event_type") == "click").select("word", "bitmap")
    p = words.filter(F.col("event_type") == "purchase").select(
        F.col("word").alias("pword"), F.col("bitmap").alias("pbitmap")
    )
    joined = c.join(p, F.col("word") == F.col("pword"), "full_outer")
    folded = joined.agg(
        F.sum(F.expr("bit_count(COALESCE(bitmap, 0))"))
        .cast("bigint")
        .alias("n_click"),
        F.sum(F.expr("bit_count(COALESCE(pbitmap, 0))"))
        .cast("bigint")
        .alias("n_purchase"),
        F.coalesce(
            F.sum(
                F.expr(
                    "CASE WHEN bitmap IS NOT NULL AND pbitmap IS NOT NULL"
                    " THEN bit_count(bitmap & pbitmap) ELSE 0 END"
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_both_bitmap"),
        F.sum(
            F.expr("bit_count(COALESCE(bitmap, 0) | COALESCE(pbitmap, 0))")
        )
        .cast("bigint")
        .alias("n_union_bitmap"),
    )
    exact = (
        e.filter(F.col("event_type") == "click")
        .select("user_id")
        .intersect(
            e.filter(F.col("event_type") == "purchase").select("user_id")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both_exact"))
    )
    return folded.crossJoin(F.broadcast(exact)).select(
        "n_click",
        "n_purchase",
        "n_both_bitmap",
        "n_union_bitmap",
        "n_both_exact",
        (F.col("n_both_bitmap") == F.col("n_both_exact"))
        .cast("int")
        .alias("bitmap_matches_exact"),
    )


_KMV_K = 64  # minima kept per sketch — small so estimates visibly differ


@query(
    "sketch_kmv_theta_union",
    oracle=f"""
    WITH a_keys AS (
      SELECT DISTINCT o_custkey AS k FROM orders
      WHERE year(o_orderdate) = 1995),
    b_keys AS (
      SELECT DISTINCT o_custkey AS k FROM orders
      WHERE year(o_orderdate) = 1996),
    a_h AS (SELECT {_DUCK_MD5.format(x="CAST(k AS VARCHAR)")} AS h
            FROM a_keys),
    b_h AS (SELECT {_DUCK_MD5.format(x="CAST(k AS VARCHAR)")} AS h
            FROM b_keys),
    a_kmin AS (SELECT h FROM a_h ORDER BY h LIMIT {_KMV_K}),
    b_kmin AS (SELECT h FROM b_h ORDER BY h LIMIT {_KMV_K}),
    u_kmin AS (
      SELECT h FROM (SELECT h FROM a_kmin UNION SELECT h FROM b_kmin)
      ORDER BY h LIMIT {_KMV_K}),
    thetas AS (
      SELECT (SELECT MAX(h) FROM a_kmin) AS ta,
             (SELECT MAX(h) FROM b_kmin) AS tb,
             (SELECT MAX(h) FROM u_kmin) AS tu),
    ests AS (
      SELECT
        CAST(FLOOR({_KMV_K - 1}.0 * 1152921504606846976.0
             / CAST(ta AS DOUBLE)) AS BIGINT) AS kmv_a_est,
        CAST(FLOOR({_KMV_K - 1}.0 * 1152921504606846976.0
             / CAST(tb AS DOUBLE)) AS BIGINT) AS kmv_b_est,
        CAST(FLOOR({_KMV_K - 1}.0 * 1152921504606846976.0
             / CAST(tu AS DOUBLE)) AS BIGINT) AS kmv_union_est
      FROM thetas)
    SELECT
      CAST((SELECT COUNT(*) FROM a_keys) AS BIGINT) AS n_a_exact,
      kmv_a_est,
      CAST((SELECT COUNT(*) FROM b_keys) AS BIGINT) AS n_b_exact,
      kmv_b_est,
      CAST((SELECT COUNT(*) FROM (SELECT k FROM a_keys UNION
                                  SELECT k FROM b_keys)) AS BIGINT)
        AS n_union_exact,
      kmv_union_est,
      CAST(kmv_a_est + kmv_b_est - kmv_union_est AS BIGINT)
        AS kmv_intersection_est
    FROM ests
    """,
)
def sketch_kmv_theta_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values / theta sketch (Bar-Yossef et al.; the Apache
    DataSketches theta family) over the 1995 vs 1996 order-customer
    sets: keep the k=64 smallest md5 hashes per set, estimate distinct
    = (k-1)·2^60/theta_k, and MERGE the two sketches (k smallest of the
    union of minima) for the union estimate — intersection then falls
    out by inclusion-exclusion. Every hash, theta, and FLOOR'd estimate
    is bit-replayed by the oracle (identical md5 → identical int60 →
    identical IEEE division), so the driver hash pins the sketch
    CONTENT, not an accuracy band.

    Scale shape: per-set k-min is orderBy(h).limit(k) — Spark's
    TakeOrdered (per-partition top-k, then a k-row merge), never a
    global sort; the merge step unions two 64-row frames. The sketch
    is the mergeable-summary pattern that replaces COUNT(DISTINCT)
    shuffles at 100 TB."""
    o = read_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("y"), F.col("o_custkey").alias("k")
    )
    hx = _SPARK_MD5.format(x="CAST(k AS STRING)") + " AS h"

    # one pruned scan → distinct (year, custkey) pairs, pinned: the
    # per-set k-mins, both exact counts, and the union count all branch
    # off this frame (unpinned, each branch re-derived the orders scan
    # + distinct — PLANS.md flagged ordersx4)
    yk = pin(
        o.filter(F.col("y").isin(1995, 1996)).distinct()
    )

    def kmin(year: int) -> DataFrame:
        return (
            yk.filter(F.col("y") == year)
            .selectExpr(hx)
            .orderBy("h")
            .limit(_KMV_K)
        )

    a_kmin, b_kmin = kmin(1995), kmin(1996)
    u_kmin = a_kmin.union(b_kmin).distinct().orderBy("h").limit(_KMV_K)

    def theta(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.max("h").alias(name))

    est = "CAST(FLOOR({k}.0 * 1152921504606846976.0 / CAST({t} AS DOUBLE)) AS BIGINT)"

    counts = yk.agg(
        F.sum(F.when(F.col("y") == 1995, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a_exact"),
        F.sum(F.when(F.col("y") == 1996, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b_exact"),
    )
    n_union = (
        yk.select("k")
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_union_exact"))
    )
    return (
        theta(a_kmin, "ta")
        .crossJoin(F.broadcast(theta(b_kmin, "tb")))
        .crossJoin(F.broadcast(theta(u_kmin, "tu")))
        .crossJoin(F.broadcast(counts))
        .crossJoin(F.broadcast(n_union))
        .selectExpr(
            "n_a_exact",
            est.format(k=_KMV_K - 1, t="ta") + " AS kmv_a_est",
            "n_b_exact",
            est.format(k=_KMV_K - 1, t="tb") + " AS kmv_b_est",
            "n_union_exact",
            est.format(k=_KMV_K - 1, t="tu") + " AS kmv_union_est",
        )
        .selectExpr(
            "n_a_exact",
            "kmv_a_est",
            "n_b_exact",
            "kmv_b_est",
            "n_union_exact",
            "kmv_union_est",
            "CAST(kmv_a_est + kmv_b_est - kmv_union_est AS BIGINT)"
            " AS kmv_intersection_est",
        )
    )


# HLL estimate expression — interpolated VERBATIM into both engines so
# every double op (alpha literal fold, cast, divide, ln) is bit-identical.
# alpha_256 = 0.7213/(1 + 1.079/m); 9007199254740992 = 2^53 (the rho
# fixed-point scale); 65536 = m^2; 640 = 2.5*m (small-range cutoff).
_HLL_RAW = (
    "(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)"
    " + CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE)))"
    " * CAST(65536.0 AS DOUBLE) * CAST(9007199254740992.0 AS DOUBLE)"
    " / CAST(hll_t AS DOUBLE)"
)
# NB: every literal is CAST(... AS DOUBLE) — Spark parses bare numeric
# literals as DECIMAL, so `0.7213 / (1.0 + ...)` would run under decimal
# scale rules and diverge from DuckDB's double fold at the 1e-9 level.
_HLL_EST = (
    "CASE WHEN raw_est <= CAST(640.0 AS DOUBLE) AND n_zero_registers > 0"
    " THEN CAST(256.0 AS DOUBLE)"
    " * ln(CAST(256.0 AS DOUBLE) / CAST(n_zero_registers AS DOUBLE))"
    " ELSE raw_est END"
)


@query(
    "sketch_hll_register_estimate",
    oracle=f"""
    WITH h AS (
      SELECT {_DUCK_MD5.format(x="CAST(o_custkey AS VARCHAR)")} AS hv
      FROM orders),
    split AS (SELECT hv % 256 AS reg, hv // 256 AS suffix FROM h),
    minsuf AS (SELECT reg, MIN(suffix) AS ms FROM split GROUP BY reg),
    powers AS (
      SELECT p, CAST(1 AS BIGINT) << CAST(p AS INT) AS v
      FROM (SELECT unnest(generate_series(0, 51)) AS p)),
    rho AS (
      SELECT m.reg,
             CASE WHEN m.ms = 0 THEN 53
                  ELSE 52 - MAX(pw.p) END AS r
      FROM minsuf m LEFT JOIN powers pw ON pw.v <= m.ms
      GROUP BY m.reg, m.ms),
    full_regs AS (
      SELECT g.reg, COALESCE(rho.r, 0) AS m_j
      FROM (SELECT unnest(generate_series(0, 255)) AS reg) g
      LEFT JOIN rho ON rho.reg = g.reg),
    folded AS (
      SELECT
        CAST(SUM(CAST(1 AS BIGINT) << CAST(53 - m_j AS INT)) AS BIGINT)
          AS hll_t,
        CAST(SUM(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_zero_registers
      FROM full_regs),
    est AS (
      SELECT hll_t, n_zero_registers, {_HLL_RAW} AS raw_est FROM folded)
    SELECT
      CAST((SELECT COUNT(DISTINCT o_custkey) FROM orders) AS BIGINT)
        AS n_exact,
      hll_t, n_zero_registers,
      {_HLL_EST} AS hll_estimate
    FROM est
    """,
)
def sketch_hll_register_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HyperLogLog (Flajolet et al. 2007) built from scratch on
    md5-derived 60-bit hashes: register = h mod 256, rho = leading-zero
    rank of the 52-bit suffix (computed EXACTLY via a 52-row
    powers-of-two join on MIN(suffix) — floor-log2 is monotone, so the
    per-register min suffix carries the max rho; no float log2 at
    power-of-two boundaries). The register fold T = sum(2^(53-M_j)) is
    a pure bigint (<= 2^61), so the driver hash pins ALL 256 registers,
    and the estimate — alpha_m·m²/sum(2^-M_j) with the standard
    small-range linear-counting correction — is one shared double
    expression both engines evaluate bit-identically.

    Scale shape: ONE map-side-combinable groupBy(reg)->MIN(suffix)
    (256 groups regardless of input rows), a 52-row broadcast join on
    the 256-row frame, and a 256-row fold — the fixed-size mergeable
    distinct-count summary that replaces COUNT(DISTINCT)'s full
    shuffle at 100 TB (register-wise MAX merges across partitions for
    free inside the MIN combine)."""
    o = read_table(spark, sf_dir, "orders")
    h = o.selectExpr(
        _SPARK_MD5.format(x="CAST(o_custkey AS STRING)") + " AS hv"
    )
    split = h.selectExpr("hv % 256 AS reg", "hv DIV 256 AS suffix")
    minsuf = split.groupBy("reg").agg(F.min("suffix").alias("ms"))
    powers = spark.range(52).selectExpr(
        "CAST(id AS INT) AS p",
        "shiftleft(CAST(1 AS BIGINT), CAST(id AS INT)) AS v",
    )
    rho = (
        minsuf.join(F.broadcast(powers), F.col("v") <= F.col("ms"), "left")
        .groupBy("reg", "ms")
        .agg(F.max("p").alias("lg"))
        .selectExpr(
            "reg",
            "CASE WHEN ms = 0 THEN 53 ELSE 52 - lg END AS r",
        )
    )
    full_regs = (
        spark.range(256)
        .selectExpr("CAST(id AS BIGINT) AS reg")
        .join(rho, "reg", "left")
        .selectExpr("COALESCE(r, 0) AS m_j")
    )
    folded = full_regs.agg(
        F.expr("CAST(SUM(shiftleft(CAST(1 AS BIGINT), CAST(53 - m_j AS INT)))"
               " AS BIGINT)").alias("hll_t"),
        F.expr("CAST(SUM(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS BIGINT)")
        .alias("n_zero_registers"),
    )
    exact = o.select("o_custkey").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact")
    )
    return (
        folded.crossJoin(F.broadcast(exact))
        .selectExpr(
            "n_exact", "hll_t", "n_zero_registers", _HLL_RAW + " AS raw_est"
        )
        .selectExpr(
            "n_exact",
            "hll_t",
            "n_zero_registers",
            _HLL_EST + " AS hll_estimate",
        )
    )


_LC_M = 65536  # linear-counting bitmap size

# shared estimate fragment (all literals CAST to DOUBLE — see _HLL_RAW
# note): n̂ = -m·ln(V) with V the empty fraction (Whang et al. 1990).
_LC_EST = (
    f"CASE WHEN {_LC_M} - n_set_bits > 0"
    f" THEN CAST({_LC_M}.0 AS DOUBLE)"
    f" * ln(CAST({_LC_M}.0 AS DOUBLE)"
    f" / CAST({_LC_M} - n_set_bits AS DOUBLE))"
    " ELSE CAST(NULL AS DOUBLE) END"
)


@query(
    "sketch_linear_counting_orderkeys",
    oracle=f"""
    WITH bits AS (
      SELECT DISTINCT
             {_DUCK_MD5.format(x="CAST(l_orderkey AS VARCHAR)")} % {_LC_M}
               AS bit
      FROM lineitem),
    folded AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_set_bits FROM bits)
    SELECT
      CAST((SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS BIGINT)
        AS n_exact,
      n_set_bits,
      CAST({_LC_M} - n_set_bits AS BIGINT) AS n_empty_bits,
      {_LC_EST} AS lc_estimate
    FROM folded
    """,
)
def sketch_linear_counting_orderkeys(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Linear counting (Whang-Vander-Zanden-Taylor 1990): hash every
    lineitem orderkey into an m=65536-slot bitmap and estimate the
    distinct count from the EMPTY fraction, n̂ = m·ln(m/empty) — the
    load factor crosses 1 between sf0.01 (~15k keys) and sf0.1 (~150k
    keys), so the estimator is exercised under real bitmap saturation,
    and the guard yields NULL if the bitmap ever fills. The set-bit
    count is exact integer state (pinned by the hash); the estimate is
    one shared all-DOUBLE expression.

    Scale shape: the bitmap is a distinct over md5%m — at most m=65536
    rows survive the partial-distinct map-side combine no matter the
    input size; the exact count exists only to expose the estimator's
    error. The fixed-size bitmap is register-wise OR-mergeable across
    partitions (what the distinct's partial aggregation does)."""
    li = read_table(spark, sf_dir, "lineitem")
    bits = (
        li.selectExpr(
            _SPARK_MD5.format(x="CAST(l_orderkey AS STRING)")
            + f" % {_LC_M} AS bit"
        )
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_set_bits"))
    )
    exact = (
        li.select("l_orderkey")
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    )
    return bits.crossJoin(F.broadcast(exact)).selectExpr(
        "n_exact",
        "n_set_bits",
        f"CAST({_LC_M} - n_set_bits AS BIGINT) AS n_empty_bits",
        _LC_EST + " AS lc_estimate",
    )


_AMS_J = 16  # independent +-1 estimators


@query(
    "sketch_ams_f2_user_events",
    oracle=f"""
    WITH hv AS (
      SELECT {_DUCK_MD5.format(x="CAST(e.user_id AS VARCHAR)")} AS h
      FROM events e),
    js AS (SELECT unnest(generate_series(0, {_AMS_J - 1})) AS j),
    signed AS (
      SELECT js.j, 1 - 2 * CAST((hv.h >> CAST(js.j AS INT)) % 2 AS INT)
               AS sgn
      FROM hv, js),
    z AS (SELECT j, CAST(SUM(sgn) AS BIGINT) AS zj FROM signed GROUP BY j),
    grp AS (
      SELECT j // 4 AS g, CAST(SUM(zj * zj) AS BIGINT) AS gsum
      FROM z GROUP BY j // 4),
    ranked AS (
      SELECT gsum, row_number() OVER (ORDER BY gsum, g) AS rn FROM grp),
    med AS (
      SELECT CAST(SUM(CASE WHEN rn IN (2, 3)
                           THEN gsum ELSE 0 END) AS BIGINT) AS ams_med2x
      FROM ranked),
    f2 AS (
      SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS f2_exact FROM (
        SELECT CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY user_id))
    SELECT f2_exact, ams_med2x,
           CAST(ams_med2x AS DOUBLE)
             / (CAST(8.0 AS DOUBLE) * CAST(f2_exact AS DOUBLE)) AS ams_ratio
    FROM f2, med
    """,
)
def sketch_ams_f2_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS sketch (Alon-Matias-Szegedy 1996) for the second frequency
    moment F2 = Σ cnt(user)² — the self-join-size / skew statistic a
    planner wants BEFORE shuffling a join on user_id. Sixteen ±1
    estimators — estimator j reads BIT j of one md5 per row (Z_j =
    Σ_rows sign_j, E[Z_j²] = F2; independent bits of one hash, so no
    per-estimator row expansion) — in
    the classic median-of-means composition: 4 groups of 4, group
    statistic = Σ Z² (4× the group mean, kept as exact bigint), report
    the median PAIR of group sums (sum of the 2nd+3rd order statistics
    ≈ 8·F2 — never a .5-rounding float; a bare median of single Z²
    draws would sit near the χ²₁ median, 0.45·F2, not F2). Everything
    is integer except the final ratio, one shared double division.

    Scale shape: the sketch is one groupBy(j) over 16 groups — a
    map-side-combined ±1 sum, so the sketch state is 16 longs per
    partition regardless of input rows (the streaming-sketch property
    that makes F2 estimable in one pass at 100 TB); the 4-row median
    window is constant-bounded. The exact F2 groupBy exists only to
    expose the estimator's error (tests/test_sketches.py bands it)."""
    e = read_events(spark, sf_dir).select("user_id")
    # ONE md5 per row; estimator j reads bit j of it (independent bits
    # of one hash are the standard multi-estimator trick — the earlier
    # md5-per-(j,row) crossJoin expanded every input row 16x for the
    # same statistical content; bench 1.55 -> ~0.4s). The 16 sums fold
    # in a single map-side-combined pass.
    h = e.selectExpr(
        _SPARK_MD5.format(x="CAST(user_id AS STRING)") + " AS h"
    )
    zrow = h.agg(
        *[
            F.sum(
                F.expr(f"1 - 2 * CAST(shiftright(h, {j}) % 2 AS INT)")
            )
            .cast("bigint")
            .alias(f"z{j}")
            for j in range(_AMS_J)
        ]
    )
    z = zrow.selectExpr(
        f"stack({_AMS_J}, "
        + ", ".join(f"CAST({j} AS BIGINT), z{j}" for j in range(_AMS_J))
        + ") AS (j, zj)"
    )
    grp = z.groupBy(F.expr("j DIV 4").alias("g")).agg(
        F.sum(F.expr("zj * zj")).cast("bigint").alias("gsum")
    )
    # 4-row grain: the unpartitioned window is constant-bounded
    ranked = grp.selectExpr(
        "gsum", "row_number() OVER (ORDER BY gsum, g) AS rn"
    )
    med = ranked.agg(
        F.expr(
            "CAST(SUM(CASE WHEN rn IN (2, 3)"
            " THEN gsum ELSE 0 END) AS BIGINT)"
        ).alias("ams_med2x")
    )
    f2 = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .agg(F.sum(F.expr("cnt * cnt")).cast("bigint").alias("f2_exact"))
    )
    return f2.crossJoin(F.broadcast(med)).selectExpr(
        "f2_exact",
        "ams_med2x",
        "CAST(ams_med2x AS DOUBLE)"
        " / (CAST(8.0 AS DOUBLE) * CAST(f2_exact AS DOUBLE)) AS ams_ratio",
    )


def _dyadic_cover(lo: int, hi: int) -> list[tuple[int, int]]:
    """Canonical dyadic cover of [lo, hi): greedy largest aligned
    block. Returns (level, index) nodes with node l,a spanning
    [a·2^l, (a+1)·2^l). Pure integer arithmetic on FIXED constants —
    the nodes are embedded as literals into BOTH engines' query text,
    so no engine replays the decomposition."""
    out = []
    while lo < hi:
        l = 0
        while (
            lo % (1 << (l + 1)) == 0 and lo + (1 << (l + 1)) <= hi
        ):
            l += 1
        out.append((l, lo >> l))
        lo += 1 << l
    return out


_DY_LO, _DY_HI = 10, 117
_DY_COVER = _dyadic_cover(_DY_LO, _DY_HI)
_DY_L = 12  # levels built: user_id < 2^12 at the test SFs (see doc)
_DY_W = 128  # counters per (level, hash-row)
_DY_D = 2  # hash rows

_DY_COVER_SQL = ", ".join(f"({l}, {a})" for l, a in _DY_COVER)


@query(
    "sketch_cms_dyadic_range_count",
    oracle=f"""
    WITH lv AS (SELECT unnest(generate_series(0, {_DY_L - 1})) AS l),
    js AS (SELECT unnest(generate_series(0, {_DY_D - 1})) AS j),
    hashed AS (
      SELECT lv.l, js.j,
             {_DUCK_MD5.format(
                 x="lv.l || ':' || CAST(e.user_id // (CAST(1 AS BIGINT) << "
                   "CAST(lv.l AS INT)) AS VARCHAR) || ':' || js.j")}
               % {_DY_W} AS bucket
      FROM events e, lv, js),
    sketch AS (
      SELECT l, j, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM hashed GROUP BY l, j, bucket),
    cover AS (SELECT * FROM (VALUES {_DY_COVER_SQL}) AS t(l, a)),
    probes AS (
      SELECT c.l, c.a, js.j,
             {_DUCK_MD5.format(
                 x="c.l || ':' || CAST(c.a AS VARCHAR) || ':' || js.j")}
               % {_DY_W} AS bucket
      FROM cover c, js),
    node_est AS (
      SELECT p.l, p.a, MIN(COALESCE(s.cnt, 0)) AS node_cnt
      FROM probes p LEFT JOIN sketch s
        ON s.l = p.l AND s.j = p.j AND s.bucket = p.bucket
      GROUP BY p.l, p.a),
    est AS (SELECT CAST(SUM(node_cnt) AS BIGINT) AS cms_range_estimate
            FROM node_est),
    exact AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM events
      WHERE user_id >= {_DY_LO} AND user_id < {_DY_HI})
    SELECT n_exact,
           cms_range_estimate,
           CAST({len(_DY_COVER)} AS BIGINT) AS n_cover_nodes,
           CAST(cms_range_estimate - n_exact AS BIGINT) AS overestimate
    FROM exact, est
    """,
)
def sketch_cms_dyadic_range_count(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dyadic count-min range counting (Cormode-Muthukrishnan 2005):
    one CMS per dyadic level l over node key user_id >> l, so ANY range
    count decomposes into <= 2·log(U) node probes — here the canonical
    8-node cover of [10, 117), computed once in Python on fixed
    constants (``_dyadic_cover``) and embedded as literals in BOTH
    engines. The estimate (sum of per-node CMS minima) is >= exact by
    the CMS one-sided guarantee, visible in `overestimate`. Levels
    stop at 2^12 — the test corpora's user-id domain; a 64-bit-keyed
    deployment builds 64 levels at the same fixed width each.

    Scale shape: the sketch build is one map-side-combinable groupBy
    over (level, row, bucket) — L·d·w = 3072 cells total regardless of
    input rows; probes are 8·d rows joined against those cells.
    Range-count queries then never rescan the fact table."""
    e = read_events(spark, sf_dir).select("user_id")
    lv = spark.range(_DY_L).selectExpr("CAST(id AS BIGINT) AS l")
    js = spark.range(_DY_D).selectExpr("CAST(id AS BIGINT) AS j")
    # pre-aggregate to (level, node) counts BEFORE hashing: the node
    # grain is ~2x the distinct-key count (sum over levels of n/2^l),
    # so the md5 work drops from rows·L·d to nodes·d (bench: 4.8->1.4s;
    # the counters are identical — a CMS cell is the SUM of its nodes'
    # counts either way, which is why the row-grain oracle still
    # hash-matches)
    nodes = (
        e.crossJoin(F.broadcast(lv))
        .selectExpr(
            "l",
            "user_id DIV shiftleft(CAST(1 AS BIGINT), CAST(l AS INT)) AS a",
        )
        .groupBy("l", "a")
        .agg(F.count(F.lit(1)).cast("bigint").alias("node_cnt"))
    )
    hashed = nodes.crossJoin(F.broadcast(js)).selectExpr(
        "l",
        "j",
        "node_cnt",
        _SPARK_MD5.format(x="concat(l, ':', CAST(a AS STRING), ':', j)")
        + f" % {_DY_W} AS bucket",
    )
    sketch = hashed.groupBy("l", "j", "bucket").agg(
        F.sum("node_cnt").cast("bigint").alias("cnt")
    )
    cover = spark.createDataFrame(
        [(l, a) for l, a in _DY_COVER], "l bigint, a bigint"
    )
    probes = cover.crossJoin(F.broadcast(js)).selectExpr(
        "l",
        "a",
        "j",
        _SPARK_MD5.format(x="concat(l, ':', CAST(a AS STRING), ':', j)")
        + f" % {_DY_W} AS bucket",
    )
    node_est = (
        probes.join(F.broadcast(sketch), ["l", "j", "bucket"], "left")
        .groupBy("l", "a")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("node_cnt"))
    )
    est = node_est.agg(
        F.sum("node_cnt").cast("bigint").alias("cms_range_estimate")
    )
    exact = e.filter(
        (F.col("user_id") >= _DY_LO) & (F.col("user_id") < _DY_HI)
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    return exact.crossJoin(F.broadcast(est)).selectExpr(
        "n_exact",
        "cms_range_estimate",
        f"CAST({len(_DY_COVER)} AS BIGINT) AS n_cover_nodes",
        "CAST(cms_range_estimate - n_exact AS BIGINT) AS overestimate",
    )


@query(
    "sketch_ams_join_size_estimate",
    oracle=f"""
    WITH ha AS (
      SELECT {_DUCK_MD5.format(x="CAST(user_id AS VARCHAR)")} AS h
      FROM events WHERE event_type = 'click'),
    hb AS (
      SELECT {_DUCK_MD5.format(x="CAST(user_id AS VARCHAR)")} AS h
      FROM events WHERE event_type = 'purchase'),
    js AS (SELECT unnest(generate_series(0, {_AMS_J - 1})) AS j),
    za AS (
      SELECT js.j,
             CAST(SUM(1 - 2 * CAST((ha.h >> CAST(js.j AS INT)) % 2 AS INT))
                  AS BIGINT) AS zj
      FROM ha, js GROUP BY js.j),
    zb AS (
      SELECT js.j,
             CAST(SUM(1 - 2 * CAST((hb.h >> CAST(js.j AS INT)) % 2 AS INT))
                  AS BIGINT) AS zj
      FROM hb, js GROUP BY js.j),
    prod AS (
      SELECT za.j, CAST(za.zj * zb.zj AS BIGINT) AS pj
      FROM za JOIN zb ON zb.j = za.j),
    grp AS (
      SELECT j // 4 AS g, CAST(SUM(pj) AS BIGINT) AS gsum
      FROM prod GROUP BY j // 4),
    ranked AS (
      SELECT gsum, row_number() OVER (ORDER BY gsum, g) AS rn FROM grp),
    med AS (
      SELECT CAST(SUM(CASE WHEN rn IN (2, 3)
                           THEN gsum ELSE 0 END) AS BIGINT) AS ams_med2x
      FROM ranked),
    exact AS (
      SELECT CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS join_size_exact FROM
        (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt FROM events
         WHERE event_type = 'click' GROUP BY user_id) a
        JOIN
        (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt FROM events
         WHERE event_type = 'purchase' GROUP BY user_id) b
        ON b.user_id = a.user_id)
    SELECT join_size_exact, ams_med2x,
           CAST(ams_med2x AS DOUBLE)
             / (CAST(8.0 AS DOUBLE) * CAST(join_size_exact AS DOUBLE))
             AS ams_ratio
    FROM exact, med
    """,
)
def sketch_ams_join_size_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """AMS join-size estimation (Alon-Matias-Szegedy-Gibbons 1999) —
    the ORIGINAL planner application of the F2 sketch: the inner
    product of two ±1 sketches estimates |A ⋈ B| on the join key,
    E[Z_A,j·Z_B,j] = Σ_k cntA(k)·cntB(k), here click-rows ⋈
    purchase-rows on user_id. Same one-md5-per-row bit-j estimators and
    exact-bigint median-of-means composition as
    sketch_ams_f2_user_events; the exact join size (what the sketch
    spares the planner from computing) is the grouped product-sum,
    never a row-level join.

    Scale shape: each side folds to 16 longs in one map-side-combined
    pass over ITS OWN scan — the two relations never meet until the
    16-row sketch join, which is how a planner prices a 100 TB ⋈
    100 TB join without executing it. The exact twin exists only to
    expose the estimator's error."""
    e = read_events(spark, sf_dir).select("user_id", "event_type")

    def side(etype: str) -> DataFrame:
        h = e.filter(F.col("event_type") == etype).selectExpr(
            _SPARK_MD5.format(x="CAST(user_id AS STRING)") + " AS h"
        )
        zrow = h.agg(
            *[
                F.sum(
                    F.expr(f"1 - 2 * CAST(shiftright(h, {j}) % 2 AS INT)")
                )
                .cast("bigint")
                .alias(f"z{j}")
                for j in range(_AMS_J)
            ]
        )
        return zrow.selectExpr(
            f"stack({_AMS_J}, "
            + ", ".join(
                f"CAST({j} AS BIGINT), z{j}" for j in range(_AMS_J)
            )
            + ") AS (j, zj)"
        )

    za = side("click")
    zb = side("purchase").selectExpr("j", "zj AS zbj")
    prod = za.join(zb, "j").selectExpr(
        "j", "CAST(zj * zbj AS BIGINT) AS pj"
    )
    grp = prod.groupBy(F.expr("j DIV 4").alias("g")).agg(
        F.sum("pj").cast("bigint").alias("gsum")
    )
    # 4-row grain: the unpartitioned window is constant-bounded
    ranked = grp.selectExpr(
        "gsum", "row_number() OVER (ORDER BY gsum, g) AS rn"
    )
    med = ranked.agg(
        F.expr(
            "CAST(SUM(CASE WHEN rn IN (2, 3) THEN gsum ELSE 0 END)"
            " AS BIGINT)"
        ).alias("ams_med2x")
    )

    def cnts(etype: str, alias: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == etype)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias(alias))
        )

    exact = (
        cnts("click", "ca")
        .join(cnts("purchase", "cb"), "user_id")
        .agg(
            F.sum(F.expr("ca * cb")).cast("bigint").alias("join_size_exact")
        )
    )
    return exact.crossJoin(F.broadcast(med)).selectExpr(
        "join_size_exact",
        "ams_med2x",
        "CAST(ams_med2x AS DOUBLE)"
        " / (CAST(8.0 AS DOUBLE) * CAST(join_size_exact AS DOUBLE))"
        " AS ams_ratio",
    )
