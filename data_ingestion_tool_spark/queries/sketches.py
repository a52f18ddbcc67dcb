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
    cost)."""
    e = read_events(spark, sf_dir).select("user_id")
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
