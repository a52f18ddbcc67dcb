"""Advanced relational coverage: statistical/grouping-set aggregation,
pivot, full outer join, analytic windows, scalar subqueries, regexp/null
/JSON scalar functions, arrays, sessionization, argmax.

All stock DataFrame ops (SURVEY.md §4.2: zero custom Catalyst rules);
determinism follows the registry's decimal-exact aggregation pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.ranking import (
    ntile_from_rn,
    percent_rank_from_rn,
    with_global_row_number,
)
from ..plans.pin import pin
from ..sources.parquet_io import read_events, read_table
from .registry import davg, dsum, fsum, query, sql_davg, sql_dsum, sql_fsum

# --- aggregation depth ----------------------------------------------------


@query(
    "agg_stats",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           {sql_davg('o_totalprice', 2)} AS mean_price,
           ROUND(SQRT(({sql_dsum('o_totalprice * o_totalprice', 4)}
                 - {sql_dsum('o_totalprice')} * {sql_dsum('o_totalprice')} / COUNT(*))
                / (COUNT(*) - 1)), 6) AS stddev_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev via exact decimal sums (sum, sum-of-squares) so the
    result is order-independent — a streaming one-pass stddev differs in
    final ulps between engines. The sqrt-of-difference still drifts in
    the last ulp across engines at larger n (≈3e-11 absolute at sf0.1),
    so both sides round to 6 decimals."""
    o = read_table(spark, sf_dir, "orders")
    n = F.count(F.lit(1))
    s = dsum("o_totalprice")
    sq = F.sum(
        (F.col("o_totalprice") * F.col("o_totalprice")).cast("decimal(18,4)")
    ).cast("double")
    return o.groupBy("o_orderstatus").agg(
        n.alias("n"),
        davg("o_totalprice", 2).alias("mean_price"),
        F.round(
            F.sqrt((sq - s * s / n) / (n - F.lit(1))), 6
        ).alias("stddev_price"),
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
           {sql_dsum('o_totalprice')} AS sum_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("sum_price")
    )


@query(
    "agg_median",
    oracle="""
    SELECT o_orderstatus, MEDIAN(o_totalprice) AS med_price,
           QUANTILE_CONT(o_totalprice, 0.9) AS p90_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) median/percentile — order statistics are
    deterministic, unlike floating sums."""
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.median("o_totalprice").alias("med_price"),
        F.percentile("o_totalprice", F.lit(0.9)).alias("p90_price"),
    )


@query(
    "agg_filtered_conditional",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderpriority = '1-URGENT'), 0) AS DOUBLE)
             AS urgent_total
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_filtered_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.when(F.col("o_totalprice") > 200000.0, 1)).alias("n_big"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("o_orderpriority") == "1-URGENT",
                    F.col("o_totalprice").cast("decimal(18,2)"),
                )
            ),
            F.lit(0).cast("decimal(18,2)"),
        )
        .cast("double")
        .alias("urgent_total"),
    )


@query(
    "agg_argmax",
    oracle="""
    SELECT o_orderstatus,
           ARG_MAX(o_orderkey, o_totalprice) AS top_orderkey,
           ARG_MIN(o_orderkey, o_totalprice) AS bottom_orderkey,
           MAX(o_totalprice) AS top_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("top_orderkey"),
        F.min_by("o_orderkey", "o_totalprice").alias("bottom_orderkey"),
        F.max("o_totalprice").alias("top_price"),
    )


@query(
    "pivot_status_counts",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list — at scale, naming the pivot
    values skips the extra distinct-values scan Spark otherwise runs."""
    o = read_table(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("n_f"),
        F.coalesce("O", F.lit(0)).alias("n_o"),
        F.coalesce("P", F.lit(0)).alias("n_p"),
    )


# --- joins / subqueries ---------------------------------------------------


@query(
    "join_full_outer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer FULL JOIN
         (SELECT * FROM orders WHERE o_totalprice > 450000.0) o
      ON c_custkey = o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer can't broadcast, so both sides shuffle regardless;
    the SHUFFLE_HASH hint on the filtered (small) orders side skips the
    two per-partition sorts SMJ would pay — measured ~18% faster at
    sf0.1, and the build side stays the pre-filtered slice so the hash
    map is bounded by the predicate's selectivity, not table size."""
    c = read_table(spark, sf_dir, "customer")
    o = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000.0)
        .hint("shuffle_hash")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "subquery_scalar_avg",
    oracle=f"""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > 1.5 * (SELECT {sql_davg('o_totalprice', 2)} FROM orders)
    """,
)
def subquery_scalar_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery as a broadcast single-row cross join — the
    aggregate runs once, its result ships to every executor; no second
    scan of the fact table per row."""
    o = read_table(spark, sf_dir, "orders")
    avg_df = o.agg(davg("o_totalprice", 2).alias("avg_price"))
    return (
        o.crossJoin(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > 1.5 * F.col("avg_price"))
        .select("o_orderkey", "o_totalprice")
    )


# --- analytic windows -----------------------------------------------------


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@query(
    "window_ntile_ranks",
    oracle="""
    SELECT o_orderkey,
           CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT)
             AS quartile,
           CAST(DENSE_RANK() OVER (PARTITION BY o_orderstatus
                ORDER BY o_orderpriority) AS BIGINT) AS prio_rank,
           PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey) AS pct
    FROM orders
    """,
)
def window_ntile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global quartile + percent_rank WITHOUT the single-task sort: a
    naive ``Window.orderBy`` with no partitioning funnels every row of
    orders through one executor. Two jobs total (round-9 verdict
    item 4): ONE (pid, status, priority) count aggregate over the
    pinned range exchange (≤ P·15 rows — status×priority is a 3×5
    enum domain) funds BOTH the partition row offsets for the global
    row_number AND the dense_rank-by-priority map, computed driver-side
    and embedded as plan literals; the output stage is then a pure
    whole-stage-codegen projection — no window over data, no broadcast
    join, no second scan. NTILE/PERCENT_RANK are closed-form integer
    math on (rn, n)."""
    from ..operators.ranking import _MID_MASK, _at_pid, _ranged

    o = read_table(spark, sf_dir, "orders")
    cols = o.select(
        "o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority"
    )
    parted, p = _ranged(cols, ["o_totalprice", "o_orderkey"], None)
    crows = (
        parted.groupBy(
            F.spark_partition_id().alias("pid"),
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    cnt_by_pid = [0] * p
    prios: dict[str, set] = {}
    for r in crows:
        cnt_by_pid[r["pid"]] += r["cnt"]
        prios.setdefault(r["o_orderstatus"], set()).add(
            r["o_orderpriority"]
        )
    offs, acc = [], 0
    for x in cnt_by_pid:
        offs.append(acc)
        acc += x
    n_total = acc
    rank_pairs: list = []
    for status, ps in prios.items():
        for i, prio in enumerate(sorted(ps)):
            rank_pairs += [F.lit(f"{status}\x1f{prio}"), F.lit(i + 1)]
    rank_map = F.create_map(*rank_pairs)
    local = (
        parted.sortWithinPartitions("o_totalprice", "o_orderkey")
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__mid", F.monotonically_increasing_id())
    )
    grn = (
        _at_pid(offs)
        + F.col("__mid").bitwiseAND(F.lit(_MID_MASK))
        + F.lit(1)
    ).cast("bigint")
    gn = F.lit(n_total).cast("bigint")
    return local.select(
        "o_orderkey",
        ntile_from_rn(grn, gn, 4).alias("quartile"),
        F.element_at(
            rank_map,
            F.concat_ws("\x1f", "o_orderstatus", "o_orderpriority"),
        )
        .cast("bigint")
        .alias("prio_rank"),
        percent_rank_from_rn(grn, gn).alias("pct"),
    )


# --- scalar functions: regexp / null / json / arrays ----------------------


@query(
    "scalar_regexp_funcs",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           regexp_replace(c_name, '0+', '-', 'g') AS squeezed,
           split_part(c_name, '#', 2) AS after_hash,
           CASE WHEN regexp_matches(c_name, '^Customer#') THEN 1 ELSE 0 END
             AS is_customer
    FROM customer
    """,
)
def scalar_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", "0+", "-").alias("squeezed"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("after_hash"),
        F.when(F.col("c_name").rlike("^Customer#"), 1).otherwise(0).alias(
            "is_customer"
        ),
    )


@query(
    "scalar_null_funcs",
    oracle="""
    SELECT c_custkey,
           NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'REDACTED') AS seg_filled,
           CASE WHEN NULLIF(c_mktsegment, 'BUILDING') IS NULL THEN 1 ELSE 0 END
             AS was_building
    FROM customer
    """,
)
def scalar_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    seg_or_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        "c_custkey",
        seg_or_null.alias("seg_or_null"),
        F.coalesce(seg_or_null, F.lit("REDACTED")).alias("seg_filled"),
        F.when(seg_or_null.isNull(), 1).otherwise(0).alias("was_building"),
    )


@query(
    "scalar_json_extract",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events ``props`` column — the
    semi-structured half of ingest. ``from_json`` with an explicit
    schema parses each document once into a struct (~5x faster at sf0.1
    than per-path ``get_json_object``, which re-parses per extraction
    and doesn't scale with the number of extracted fields)."""
    e = read_events(spark, sf_dir)
    return e.select(
        "event_id",
        "event_type",
        F.from_json("props", "k bigint").getField("k").alias("k"),
    )


@query(
    "array_functions",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(list_max(embedding) AS DOUBLE) AS max_val,
           CAST(list_sort(embedding)[1] AS DOUBLE) AS min_val
    FROM embeddings
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.array_max("embedding").cast("double").alias("max_val"),
        F.element_at(F.sort_array("embedding"), 1).cast("double").alias("min_val"),
    )


@query(
    "union_by_name",
    oracle="""
    SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal FROM customer
    UNION ALL
    SELECT s_suppkey, s_name, s_acctbal FROM supplier
    """,
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName aligns on column names, not positions."""
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = read_table(spark, sf_dir, "supplier").select(
        F.col("s_acctbal").alias("acctbal"),  # deliberately different order
        F.col("s_suppkey").alias("id"),
        F.col("s_name").alias("name"),
    )
    return c.unionByName(s)


# --- sessionization (events) ----------------------------------------------


@query(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → flag → running
    sum → per-session rollup. One shuffle on user_id; every window
    reuses the same partitioning."""
    e = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.select(
        "user_id", F.sum("new_session").over(wrun).cast("bigint").alias("session_id")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )


@query(
    "agg_skew_salted",
    oracle=f"""
    SELECT event_type, COUNT(*) AS cnt, {sql_dsum('value')} AS sum_value,
           MAX(value) AS max_value
    FROM events GROUP BY event_type
    """,
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation over the low-cardinality (= every
    key is hot) event_type column: partials per (key, salt) then a merge
    per key. Same answer as a direct groupBy — the oracle proves it —
    with the hot keys spread across 16 reducers in phase 1."""
    from ..operators.skew import salted_agg
    from ..sources.parquet_io import read_events

    e = read_events(spark, sf_dir).withColumn(
        "value_dec", F.col("value").cast("decimal(18,2)")
    )
    out = salted_agg(
        e,
        ["event_type"],
        {
            "cnt": ("value", "count"),
            "sum_value_dec": ("value_dec", "sum"),
            "max_value": ("value", "max"),
        },
        salt_from="event_id",
        n_salts=16,
    )
    return out.select(
        "event_type",
        F.col("cnt").cast("bigint").alias("cnt"),
        F.col("sum_value_dec").cast("double").alias("sum_value"),
        "max_value",
    )


@query(
    "join_skewed_sentinel",
    oracle=f"""
    WITH tagged AS (
      SELECT event_id,
             CASE WHEN event_type IN ('signup','error') THEN -1
                  ELSE user_id END AS join_uid,
             value
      FROM events
    ),
    user_purchases AS (
      SELECT user_id,
             COUNT(*) AS n_purchases,
             {sql_fsum('value')} AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT t.event_id, t.join_uid, t.value,
           u.n_purchases, u.purchase_value
    FROM tagged t LEFT JOIN user_purchases u ON t.join_uid = u.user_id
    """,
)
def join_skewed_sentinel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed fact⋈fact join: ~40% of the event fact carries the
    anonymous-user sentinel (-1) as its join key — the 100 TB classic
    where a plain join funnels the hot key through ONE reducer. The
    sentinel can never match the per-user purchase fact, so
    sentinel_bypass_join routes those rows around the shuffle and the
    join sees only the organic (near-uniform) key distribution; the
    LEFT JOIN oracle proves the rewrite is answer-preserving.
    tests/test_skew_bucketing.py asserts the hot key never enters the
    join and bounds the joined side's max key share."""
    from ..operators.skew import sentinel_bypass_join

    e = read_events(spark, sf_dir)
    tagged = e.select(
        "event_id",
        F.when(F.col("event_type").isin("signup", "error"), F.lit(-1))
        .otherwise(F.col("user_id"))
        .alias("join_uid"),
        "value",
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            fsum("value").alias("purchase_value"),
        )
    )
    return sentinel_bypass_join(
        tagged, purchases, on="join_uid", right_on="user_id", sentinel=-1
    )


@query(
    "grouped_pandas_zscore",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN STDDEV_SAMP(o_totalprice) OVER w IS NULL
                     OR STDDEV_SAMP(o_totalprice) OVER w = 0 THEN 0.0
                ELSE ROUND((o_totalprice - AVG(o_totalprice) OVER w)
                     / STDDEV_SAMP(o_totalprice) OVER w, 6) END AS z
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus)
    """,
)
def grouped_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score via ``applyInPandas`` — the grouped-map Pandas
    UDF family: each group arrives as ONE Arrow-backed pandas frame, the
    vectorized normalization runs in C, the result streams back. This is
    the escape hatch for per-group logic Spark expressions can't state
    (here they could — the oracle proves parity — which is exactly what
    makes it verifiable).

    Scale: one shuffle on the grouping key; each group must fit in one
    task's memory (fine for per-status slices; for giant groups use the
    window-function form instead)."""
    import pandas as pd

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf["o_totalprice"].std(ddof=1)
        m = pdf["o_totalprice"].mean()
        z = ((pdf["o_totalprice"] - m) / s).round(6) if s and s == s else 0.0
        return pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "o_orderstatus": pdf["o_orderstatus"],
                "z": z,
            }
        )

    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").applyInPandas(
        zscore, "o_orderkey long, o_orderstatus string, z double"
    )


@query(
    "ingest_upsert_merge",
    oracle="""
    SELECT COALESCE(u.o_orderkey, o.o_orderkey) AS o_orderkey,
           CASE WHEN u.o_orderkey IS NOT NULL THEN 'UPDATED'
                ELSE o.o_orderstatus END AS o_orderstatus,
           COALESCE(u.o_totalprice, o.o_totalprice) AS o_totalprice
    FROM orders o
    FULL JOIN (SELECT o_orderkey, o_totalprice * 2 AS o_totalprice
               FROM orders WHERE o_orderkey % 100 = 0) u
      ON o.o_orderkey = u.o_orderkey
    """,
)
def ingest_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert semantics on plain parquet tables: full outer join
    target×updates, updates win per column. The relational core of what
    Delta/Iceberg MERGE INTO does — here as a pure DataFrame transform
    (at 100 TB you'd pair it with a transactional table format; the
    join-and-coalesce shape is identical)."""
    o = read_table(spark, sf_dir, "orders")
    updates = (
        o.filter(F.col("o_orderkey") % 100 == 0)
        .select(
            F.col("o_orderkey").alias("u_key"),
            (F.col("o_totalprice") * 2).alias("u_price"),
        )
    )
    merged = o.join(updates, o.o_orderkey == F.col("u_key"), "full")
    return merged.select(
        F.coalesce(F.col("u_key"), F.col("o_orderkey")).alias("o_orderkey"),
        F.when(F.col("u_key").isNotNull(), F.lit("UPDATED"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.coalesce(F.col("u_price"), F.col("o_totalprice")).alias("o_totalprice"),
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
           {sql_dsum('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form behind rollup/cube:
    one scan, one expand, one shuffle for every grouping combination."""
    o = read_table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"]],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("sum_price"))


@query(
    "agg_string_concat",
    oracle="""
    SELECT c_mktsegment,
           string_agg(c_name, ',' ORDER BY c_name) AS names
    FROM (SELECT * FROM customer WHERE c_custkey <= 50) t
    GROUP BY c_mktsegment
    """,
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect_list is order-nondeterministic
    under parallelism, so determinism comes from sorting the collected
    array before joining — the distributed-safe LISTAGG pattern."""
    c = read_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 50)
    return c.groupBy("c_mktsegment").agg(
        F.array_join(F.sort_array(F.collect_list("c_name")), ",").alias("names")
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS est_within_5pct
    FROM events GROUP BY event_type
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count estimate per event_type. THE 100 TB
    cardinality operator: fixed ~small sketch per group mergeable across
    partitions, vs exact count-distinct's full shuffle of every distinct
    value. rsd=0.01 ≈ 1% error.

    Promoted from rows-only (round-5): the engine-specific estimate
    never reaches the output — the hash-checked columns are the exact
    twin and the accuracy bound AS A VALUE (|est − exact|·20 ≤ exact,
    integer math), so an estimator regression breaks the driver gate;
    tests/test_approx.py still pins the tighter rsd-level accuracy.

    Plan shape (round-9): pre-dedup the (type, user) pairs, then both
    aggregates run over the deduped frame — HLL is set-based so the
    estimate is unchanged, and exact_users becomes a plain count. This
    avoids the Expand operator (x2 row duplication) Spark plans when
    count_distinct mixes with another aggregate — measured 1.9x faster
    at sf0.1, and at 100 TB the map-side combine of the distinct pass
    shrinks the shuffle to the distinct-pair count."""
    from ..sources.parquet_io import read_events

    e = read_events(spark, sf_dir)
    pairs = e.select("event_type", "user_id").distinct()
    g = pairs.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("est"),
        F.count(F.lit(1)).cast("bigint").alias("exact_users"),
    )
    return g.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("est") - F.col("exact_users")) * 20
            <= F.col("exact_users")
        ).alias("est_within_5pct"),
    )


@query(
    "agg_approx_quantiles",
    oracle="""
    SELECT o_orderstatus, pct, CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS rank_within_bound
    FROM orders, (SELECT unnest([50, 95, 99]) AS pct) p
    GROUP BY o_orderstatus, pct
    """,
)
def agg_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable approximate percentiles (p50/p95/p99) of order totals —
    single pass, bounded memory, vs exact percentile's full sort.

    Promoted from rows-only (round-5): approximate VALUES are
    engine-specific (QuantileSummaries boundaries), so the output
    carries the RANK-ERROR GUARANTEE as a value instead — for each
    approximate quantile v̂ at φ, the exact rank of v̂ (#rows ≤ v̂)
    must sit within the summary's rank-error bound of φ·n, compared in
    integers (|100·rank − φ·n| ≤ 100·(n/1000 + 1); accuracy=10000 ⇒
    rank error ≤ n/10000, checked at 10x slack). The oracle pins the
    flag TRUE with the per-group row counts — a quantile-sketch
    regression now fails the driver hash; tests/test_approx.py still
    pins value-level accuracy."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice"
    )
    q = o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", [0.5, 0.95, 0.99], 10000).alias(
            "pcts"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    marks = q.select(
        F.col("o_orderstatus").alias("m_st"),
        "n",
        F.posexplode("pcts").alias("i", "v"),
    ).select(
        "m_st",
        "n",
        F.element_at(F.array(F.lit(50), F.lit(95), F.lit(99)), F.col("i") + 1)
        .cast("int")
        .alias("pct"),
        "v",
    )
    ranked = (
        o.join(F.broadcast(marks), o.o_orderstatus == marks.m_st)
        .groupBy("m_st", "pct", "n")
        .agg(
            F.sum(F.when(F.col("o_totalprice") <= F.col("v"), 1).otherwise(0))
            .cast("bigint")
            .alias("rank")
        )
    )
    return ranked.select(
        F.col("m_st").alias("o_orderstatus"),
        "pct",
        "n",
        (
            F.abs(100 * F.col("rank") - F.col("pct") * F.col("n"))
            <= 100 * (F.col("n") / 1000 + 1).cast("bigint")
        ).alias("rank_within_bound"),
    )


@query(
    "sample_seeded",
    oracle="""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_total,
           TRUE AS within_5_sigma
    FROM lineitem GROUP BY l_returnflag
    """,
)
def sample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample + aggregate — the exploratory pattern
    that reads 10% of 100 TB instead of all of it. Deterministic under
    the fixed seed (same rows every run; reproducibility unit-tested).

    Promoted from rows-only (round-5): the sampled row SET is
    engine-private RNG, so the output carries the statistical contract
    as a value instead — per group, the sampled count must sit within
    5 binomial standard deviations of fraction·n, compared in integers
    ((10·n_s − n)² ≤ 225·n, i.e. (n_s − n/10)² ≤ 25·(0.1·0.9)·n — no
    float boundary). The oracle pins the flag TRUE with the exact group
    totals, so a broken sampler (wrong fraction, biased partitioning)
    fails the driver hash."""
    l = read_table(spark, sf_dir, "lineitem")
    sampled = (
        l.sample(fraction=0.1, seed=42)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sampled"))
    )
    totals = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total")
    )
    j = totals.join(sampled, "l_returnflag")
    dev = 10 * F.col("n_sampled") - F.col("n_total")
    return j.select(
        "l_returnflag",
        "n_total",
        (dev * dev <= 225 * F.col("n_total")).alias("within_5_sigma"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                RANGE BETWEEN 50000.0 PRECEDING AND 50000.0 FOLLOWING)
             AS BIGINT) AS n_similar_priced
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window: per order, how many of the same customer's
    orders fall within ±50k of its price — a value-based frame (RANGE),
    not a row-count frame (ROWS)."""
    o = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-50000, 50000)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_similar_priced"),
    )


@query(
    "udaf_pandas_grouped_agg",
    oracle="""
    SELECT o_orderstatus,
           ROUND(SUM(o_totalprice * o_orderkey) / SUM(o_orderkey), 6)
             AS weighted_avg_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def udaf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF via a grouped-agg pandas UDF: orderkey-weighted mean
    price. Arrow ships each group's columns to one vectorized numpy
    reduction — the shape for custom aggregates Spark lacks. Rounded on
    both sides (pandas sums in a different order than DuckDB)."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit GROUPED_AGG: postponed annotations (PEP 563, active in
    # this module) defeat pandas_udf's signature-based type inference
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def weighted_avg(price, weight):
        return float((price * weight).sum() / weight.sum())

    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(
            weighted_avg("o_totalprice", "o_orderkey"), 6
        ).alias("weighted_avg_price")
    )


@query(
    "scalar_map_struct",
    oracle="""
    SELECT c_custkey,
           struct_extract(struct_pack(name := c_name, bal := c_acctbal), 'name')
             AS s_name,
           CAST(struct_extract(struct_pack(name := c_name, bal := c_acctbal), 'bal')
             AS DOUBLE) AS s_bal,
           map(['segment'], [c_mktsegment])['segment'][1] AS m_segment,
           CAST(cardinality(map(['a','b'], [c_custkey, c_nationkey])) AS BIGINT) AS m_size
    FROM customer
    """,
)
def scalar_map_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested types as expressions: build struct/map, extract fields.
    Output columns are primitives so the value hash compares cleanly
    across engines (struct/map literals themselves serialize
    differently)."""
    c = read_table(spark, sf_dir, "customer")
    s = F.struct(F.col("c_name").alias("name"), F.col("c_acctbal").alias("bal"))
    m = F.create_map(F.lit("segment"), F.col("c_mktsegment"))
    m2 = F.create_map(
        F.lit("a"), F.col("c_custkey"), F.lit("b"), F.col("c_nationkey")
    )
    return c.select(
        "c_custkey",
        s.getField("name").alias("s_name"),
        s.getField("bal").cast("double").alias("s_bal"),
        m.getItem("segment").alias("m_segment"),
        F.size(m2).cast("bigint").alias("m_size"),
    )


@query(
    "unpivot_melt",
    oracle="""
    SELECT p_partkey, metric, val FROM (
      SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val FROM part
      UNION ALL
      SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
    ) ORDER BY p_partkey, metric
    """,
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (pivot's inverse) via the native ``unpivot``
    (SQL ``UNPIVOT`` / pandas ``melt``). Narrow-only scan: ReadSchema
    carries just the id + value columns; no shuffle at all (unpivot is
    a per-row flatMap, oracle is the UNION ALL equivalent)."""
    p = read_table(spark, sf_dir, "part")
    return (
        p.select("p_partkey", F.col("p_retailprice").cast("double"), F.col("p_size").cast("double"))
        .unpivot("p_partkey", ["p_retailprice", "p_size"], "metric", "val")
        .orderBy("p_partkey", "metric")
    )


# Pearson-from-moments shared expression: every moment enters through a
# scale-0 CAST(. AS DOUBLE) (exact-int conversion, correctly rounded on
# both engines — never a DECIMAL(.,s>0)→double division).
def _cfm_d(c: str) -> str:
    return f"CAST({c} AS DOUBLE)"


_CFM_R = (
    f"ROUND(({_cfm_d('n')} * {_cfm_d('sxy')} - {_cfm_d('sx')} * {_cfm_d('sy')})"
    f" / (SQRT({_cfm_d('n')} * {_cfm_d('sxx')} - {_cfm_d('sx')} * {_cfm_d('sx')})"
    f" * SQRT({_cfm_d('n')} * {_cfm_d('syy')} - {_cfm_d('sy')} * {_cfm_d('sy')})),"
    f" 6)"
)


@query(
    "agg_corr_from_moments",
    oracle=f"""
    WITH iu AS (
      SELECT l_returnflag,
             CAST(ROUND(l_quantity, 0) AS BIGINT) AS x,
             CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS y
      FROM lineitem),
    mom AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             SUM(CAST(y AS DECIMAL(18,0))) AS sy,
             SUM(CAST(x * y AS DECIMAL(18,0))) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             SUM(CAST(y * y AS DECIMAL(18,0))) AS syy
      FROM iu GROUP BY l_returnflag)
    SELECT l_returnflag, {_CFM_R} AS corr_qty_price, n
    FROM mom ORDER BY l_returnflag
    """,
)
def agg_corr_from_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation composed from exact raw moments — NOT
    F.corr: engines disagree in final ulps on one-pass vs two-pass
    corr, but n·Sxy−Sx·Sy over exact sums is the same arithmetic on
    both sides. Round-13 overflow fix: correlation is scale-invariant,
    so moments are taken in INTEGER units (qty, price CENTS) and the
    y-bearing sums accumulate as DECIMAL(28,0) — the old fsum(price²,4)
    bigint accumulator sat at ~7.4e18 (80% of int64) at sf0.1 and would
    overflow at ~1.25× that volume; decimal(28,0) has headroom to
    ~sf 140,000 (the 100 TB regime) while per-row products stay int64
    (y² ≤ 1.2e14). Both engines evaluate the SAME textual composition
    over the named moments via scale-0 CAST(. AS DOUBLE); ROUND 6
    absorbs the final float composition. One scan, map-side partials,
    3-group shuffle."""
    l = read_table(spark, sf_dir, "lineitem")
    iu = l.select(
        "l_returnflag",
        F.round(F.col("l_quantity"), 0).cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("y"),
    )
    d18 = "decimal(18,0)"
    mom = iu.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("y").cast(d18)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(d18)).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(d18)).alias("syy"),
    )
    return mom.selectExpr(
        "l_returnflag", f"{_CFM_R} AS corr_qty_price", "n"
    ).orderBy("l_returnflag")


@query(
    "window_cume_dist_first_last",
    oracle="""
    SELECT o_orderkey,
           CUME_DIST() OVER (PARTITION BY o_orderstatus
                ORDER BY o_totalprice, o_orderkey) AS cd,
           FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_orderstatus
                ORDER BY o_totalprice, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS cheapest_key,
           LAST_VALUE(o_orderkey) OVER (PARTITION BY o_orderstatus
                ORDER BY o_totalprice, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS priciest_key
    FROM orders
    """,
)
def window_cume_dist_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUME_DIST + FIRST/LAST_VALUE over an explicit full-partition
    frame (LAST_VALUE's default frame ends at CURRENT ROW — the classic
    trap — so both sides pin UNBOUNDED..UNBOUNDED). cume_dist is
    count-ratio arithmetic: identical integer divisions both engines.
    Unique-key tie-break per the determinism rule.

    Scale shape (round-9): the UNIQUE tie-break makes every sort key
    distinct, so CUME_DIST degenerates to rn/n — computed through the
    grouped two-pass ranking (3 enum groups × the whole orders fact
    would otherwise each sort in ONE task), with the same integer →
    double division both engines evaluate identically. FIRST/LAST over
    the full frame are per-group argmin/argmax: a 3-row min_by/max_by
    aggregate broadcast back."""
    from ..operators.ranking import with_grouped_global_row_number

    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    ranked = with_grouped_global_row_number(
        o,
        ["o_orderstatus"],
        ["o_totalprice", "o_orderkey"],
        rn="__rn",
        n_col="__n",
    )
    order_key = F.struct("o_totalprice", "o_orderkey")
    ends = o.groupBy("o_orderstatus").agg(
        F.min_by("o_orderkey", order_key).alias("cheapest_key"),
        F.max_by("o_orderkey", order_key).alias("priciest_key"),
    )
    return ranked.join(F.broadcast(ends), "o_orderstatus").select(
        "o_orderkey",
        (
            F.col("__rn").cast("double") / F.col("__n").cast("double")
        ).alias("cd"),
        "cheapest_key",
        "priciest_key",
    )


@query(
    "agg_bool_any_every",
    oracle="""
    SELECT o_orderstatus,
           BOOL_AND(o_totalprice > 1000.0) AS every_over_1k,
           BOOL_OR(o_orderpriority = '1-URGENT') AS any_urgent,
           COUNT(*) FILTER (WHERE o_totalprice > 300000.0) AS n_large
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_bool_any_every(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/any — SQL BOOL_AND/BOOL_OR): set-level
    predicates without a self-join; partial-aggregable like any AND/OR
    monoid, so the shuffle carries one boolean per group."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.bool_and(F.col("o_totalprice") > 1000.0).alias("every_over_1k"),
            F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
            F.count(F.when(F.col("o_totalprice") > 300000.0, 1)).alias("n_large"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "graph_hierarchy_depth",
    oracle="""
    WITH RECURSIVE t AS (
      SELECT doc_id,
             CASE WHEN doc_id - 1 - (n_chars % 97) >= 0
                  THEN doc_id - 1 - (n_chars % 97) END AS parent
      FROM documents
    ),
    anc AS (
      SELECT doc_id, doc_id AS root_id, 0 AS depth FROM t WHERE parent IS NULL
      UNION ALL
      SELECT t.doc_id, anc.root_id, anc.depth + 1
      FROM t JOIN anc ON t.parent = anc.doc_id
    )
    SELECT doc_id, CAST(root_id AS BIGINT) AS root_id,
           CAST(depth AS INT) AS depth
    FROM anc
    """,
)
def graph_hierarchy_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy closure (root + depth per node) over a forest derived
    from documents (parent = doc_id − 1 − n_chars mod 97; ids are
    contiguous so every parent exists). DuckDB answers with a recursive
    CTE; Spark has none, so the engine runs pointer-doubling
    (operators/graph.py::hierarchy_closure) — O(log depth) self-join
    rounds instead of O(depth) recursive steps, the right trade on a
    cluster where each round is a full distributed join.
    """
    from ..operators.graph import hierarchy_closure

    d = read_table(spark, sf_dir, "documents")
    parent = F.col("doc_id") - 1 - (F.col("n_chars") % 97)
    nodes = d.select(
        F.col("doc_id").alias("id"),
        F.when(parent >= 0, parent).alias("parent"),
    )
    out = hierarchy_closure(nodes, "id", "parent")
    return out.select(
        F.col("node").alias("doc_id"),
        F.col("root_id").cast("bigint").alias("root_id"),
        F.col("depth").cast("int").alias("depth"),
    )


@query(
    "ingest_cdc_apply",
    oracle="""
    WITH ch AS (
      SELECT o_orderkey AS key, 1 AS seq, 'U' AS op,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 100 AS DOUBLE) AS price
      FROM orders WHERE o_orderkey % 5 = 3
      UNION ALL
      SELECT o_orderkey, 2, 'U',
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 3 AS DOUBLE)
      FROM orders WHERE o_orderkey % 10 = 3
      UNION ALL
      SELECT o_orderkey, 2, 'D', NULL FROM orders WHERE o_orderkey % 10 = 7
      UNION ALL
      SELECT o_orderkey + 100000, 2, 'I',
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 1 AS DOUBLE)
      FROM orders WHERE o_orderkey % 1000 = 1
    ),
    latest AS (
      SELECT key, op, price FROM (
        SELECT key, op, price,
               row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
        FROM ch
      ) WHERE rn = 1
    )
    SELECT COALESCE(o.o_orderkey, l.key) AS o_orderkey,
           CASE WHEN l.op = 'I' THEN 'INSERTED' ELSE o.o_orderstatus END
             AS o_orderstatus,
           CASE WHEN l.op IN ('U', 'I') THEN l.price
                ELSE o.o_totalprice END AS o_totalprice
    FROM orders o FULL JOIN latest l ON o.o_orderkey = l.key
    WHERE l.op IS NULL OR l.op <> 'D'
    """,
)
def ingest_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC change log (insert/update/delete, multiple ops per
    key) to a base table: latest sequence number wins per key, 'D'
    removes the row, 'I' introduces new keys, 'U' overlays values —
    the full Debezium-style log-compaction semantics, as a pure
    DataFrame transform (latest-per-key window + one full outer join).
    The change log here derives deterministically from orders so the
    oracle replays the identical scenario: update-then-update keys,
    update-only keys, delete keys, and fresh insert keys.

    Scale shape: the window and the join share the key partitioning —
    the change log shuffles once, the base once; at 100 TB with a
    transactional format, the same plan runs as MERGE INTO with the
    latest-wins dedup as the source subquery.
    """
    from ..plans.pin import pin

    # one materialization for the 4 change-log branches + the base join
    # (measured 25-30% faster than 5 re-scans at sf0.1, round 11)
    o = pin(read_table(spark, sf_dir, "orders"))
    key = F.col("o_orderkey")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    u1 = o.filter(key % 5 == 3).select(
        key.alias("key"), F.lit(1).alias("seq"), F.lit("U").alias("op"),
        (dec + 100).cast("double").alias("price"),
    )
    u2 = o.filter(key % 10 == 3).select(
        key.alias("key"), F.lit(2).alias("seq"), F.lit("U").alias("op"),
        (dec * 3).cast("double").alias("price"),
    )
    d2 = o.filter(key % 10 == 7).select(
        key.alias("key"), F.lit(2).alias("seq"), F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("price"),
    )
    ins = o.filter(key % 1000 == 1).select(
        (key + 100000).alias("key"), F.lit(2).alias("seq"),
        F.lit("I").alias("op"), (dec + 1).cast("double").alias("price"),
    )
    ch = u1.unionByName(u2).unionByName(d2).unionByName(ins)
    w = Window.partitionBy("key").orderBy(F.desc("seq"))
    latest = (
        ch.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("key", "op", "price")
    )
    merged = o.join(latest, o.o_orderkey == latest.key, "full")
    return merged.where(F.col("op").isNull() | (F.col("op") != "D")).select(
        F.coalesce(F.col("o_orderkey"), F.col("key")).alias("o_orderkey"),
        F.when(F.col("op") == "I", F.lit("INSERTED"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.when(F.col("op").isin("U", "I"), F.col("price"))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )


# ---------------------------------------------------------------------------
# Grid-bucketed spatial neighbor counts (the bucketed spatial-join pattern)
# ---------------------------------------------------------------------------


@query(
    "spatial_grid_neighbor_counts",
    oracle="""
    WITH pts AS (
      SELECT user_id,
             (CAST(CONCAT('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 6))
                   AS BIGINT) % 1000) / 100.0 AS lat,
             (CAST(CONCAT('0x', substring(md5(CAST(user_id AS VARCHAR)), 7, 6))
                   AS BIGINT) % 2000) / 100.0 AS lon
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    cells AS (
      SELECT user_id, lat, lon,
             CAST(floor(lat) AS BIGINT) AS cy, CAST(floor(lon) AS BIGINT) AS cx
      FROM pts
    ),
    fan AS (
      SELECT c.user_id, c.lat, c.lon,
             c.cy + dy.d AS ny, c.cx + dx.d AS nx
      FROM cells c,
           (SELECT unnest(ARRAY[-1, 0, 1]) AS d) dy,
           (SELECT unnest(ARRAY[-1, 0, 1]) AS d) dx
    )
    SELECT f.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_neighbors
    FROM fan f JOIN cells o
      ON o.cy = f.ny AND o.cx = f.nx AND o.user_id <> f.user_id
    WHERE (f.lat - o.lat) * (f.lat - o.lat)
          + (f.lon - o.lon) * (f.lon - o.lon) < 0.25
    GROUP BY f.user_id
    """,
)
def spatial_grid_neighbor_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial neighbor counting via the GRID-BUCKET join — the
    standard Spark answer to "points within radius" without a spatial
    index: each point lands in a 1°×1° cell, fans out to its 3×3 cell
    neighborhood, equi-joins on cell id (hashable, shuffleable), and
    only then applies the exact radius predicate (0.5° Euclidean
    here). Coordinates are derived deterministically from the user-id
    hash (the testdata has no geo columns — the PATTERN is the
    deliverable); the radius test compares identical float expressions
    of identical doubles, never crossing an engine boundary.

    Scale shape: the join is equi on cell id — shuffle partitions by
    cell, candidate pairs are bounded by 9 × cell occupancy (grid
    resolution tunes the quadratic term), never all-pairs. This is the
    same bucket-then-verify shape as the LSH near-dup stack.
    """
    ev = read_events(spark, sf_dir)
    users = ev.select("user_id").distinct()
    lat = (
        F.expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 6), 16, 10)"
            " AS BIGINT) % 1000"
        )
        / 100.0
    )
    lon = (
        F.expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 7, 6), 16, 10)"
            " AS BIGINT) % 2000"
        )
        / 100.0
    )
    cells = users.select(
        "user_id",
        lat.alias("lat"),
        lon.alias("lon"),
    ).select(
        "user_id",
        "lat",
        "lon",
        F.floor("lat").cast("bigint").alias("cy"),
        F.floor("lon").cast("bigint").alias("cx"),
    )
    d = spark.range(-1, 2).select(F.col("id").alias("d"))
    fan = (
        cells.crossJoin(d.select(F.col("d").alias("dy")))
        .crossJoin(d.select(F.col("d").alias("dx")))
        .select(
            "user_id",
            "lat",
            "lon",
            (F.col("cy") + F.col("dy")).alias("ny"),
            (F.col("cx") + F.col("dx")).alias("nx"),
        )
    )
    o = cells.select(
        F.col("user_id").alias("o_user"),
        F.col("lat").alias("o_lat"),
        F.col("lon").alias("o_lon"),
        F.col("cy").alias("o_cy"),
        F.col("cx").alias("o_cx"),
    )
    dy = F.col("lat") - F.col("o_lat")
    dx = F.col("lon") - F.col("o_lon")
    hits = (
        fan.join(
            o,
            (F.col("ny") == F.col("o_cy"))
            & (F.col("nx") == F.col("o_cx"))
            & (F.col("user_id") != F.col("o_user")),
        )
        .filter(dy * dy + dx * dx < 0.25)
    )
    return hits.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_neighbors")
    )


# ---------------------------------------------------------------------------
# Percent-of-parent hierarchy shares (region → nation → total)
# ---------------------------------------------------------------------------


@query(
    "agg_percent_of_parent_hierarchy",
    oracle="""
    WITH nat AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(SUM(CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
               AS bal_cents,
             CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM customer c, nation n, region r
      WHERE c.c_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, n.n_name
    ),
    shares AS (
      SELECT region, nation, n_customers, bal_cents,
             CAST(SUM(bal_cents) OVER (PARTITION BY region) AS BIGINT)
               AS region_cents,
             CAST(SUM(bal_cents) OVER () AS BIGINT) AS total_cents
      FROM nat
    )
    SELECT region, nation, n_customers, bal_cents / 100.0 AS balance,
           CAST(bal_cents AS DOUBLE) / CAST(region_cents AS DOUBLE)
             AS share_of_region,
           CAST(bal_cents AS DOUBLE) / CAST(total_cents AS DOUBLE)
             AS share_of_total
    FROM shares
    """,
)
def agg_percent_of_parent_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent OLAP shares down the region → nation
    hierarchy: each nation's customer balance as a fraction of its
    region and of the grand total, in one pass — the drill-down
    normalization every BI layer reimplements. Balances accumulate as
    exact cents (c_acctbal can be negative; bigint handles sign); the
    shares are identical divisions of exact integers.

    Scale shape: dims broadcast onto the customer scan; one map-side
    combinable groupBy to nation grain; both share windows run over
    the |nations| aggregate rows.
    """
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    nat = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("bal_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        )
    )
    shares = nat.select(
        "region",
        "nation",
        "n_customers",
        "bal_cents",
        F.sum("bal_cents")
        .over(Window.partitionBy("region"))
        .cast("bigint")
        .alias("region_cents"),
        F.sum("bal_cents").over(Window.partitionBy()).cast("bigint").alias(
            "total_cents"
        ),
    )
    return shares.select(
        "region",
        "nation",
        "n_customers",
        (F.col("bal_cents") / 100.0).alias("balance"),
        (
            F.col("bal_cents").cast("double")
            / F.col("region_cents").cast("double")
        ).alias("share_of_region"),
        (
            F.col("bal_cents").cast("double")
            / F.col("total_cents").cast("double")
        ).alias("share_of_total"),
    )


# ---------------------------------------------------------------------------
# Approximate query processing: deterministic-sample revenue estimate
# ---------------------------------------------------------------------------


@query(
    "agg_aqp_sample_estimate",
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
             md5(CAST(l_orderkey AS VARCHAR) || '-' ||
                 CAST(l_linenumber AS VARCHAR) || '-' ||
                 CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR))
               AS h
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(SUM(cents) AS BIGINT) AS exact_cents,
           CAST(10 * SUM(CASE WHEN CAST('0x' || substr(h, 1, 8) AS BIGINT)
                                   % 10 = 0
                              THEN cents ELSE 0 END) AS BIGINT) AS est_cents,
           abs(10 * SUM(CASE WHEN CAST('0x' || substr(h, 1, 8) AS BIGINT)
                                  % 10 = 0
                             THEN cents ELSE 0 END) - SUM(cents)) * 20
             <= SUM(cents) AS within_5pct
    FROM c GROUP BY l_returnflag
    """,
)
def agg_aqp_sample_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing: estimate per-group revenue from a
    DETERMINISTIC 10% sample (rows whose md5 of the row identity
    lands in bucket 0 of 10) scaled by the inverse sampling rate — the
    read-10%-of-100-TB exploration pattern. Unlike engine-RNG samples,
    the md5 sample is a pure function of row VALUES, so BOTH the
    estimate and the exact total are bit-exact integers on both
    engines — the estimate itself is hash-verified, and the 5%
    relative-error claim rides the output in integer cross-
    multiplication (|est − exact|·20 ≤ exact). Duplicate rows hash
    identically (in or out together) — deterministic on multisets.

    Scale shape: one pass, two conditional integer aggregates, map-
    side combinable; the sample predicate pushes into the scan at real
    scale (hash of scan columns, no shuffle). Round 14: keyed
    :func:`spread` fans the per-row md5 sample predicate off the
    single-row-group scan task (solo 0.92 -> 0.47s locally, where the
    one-task scan IS the bottleneck); plan no-op on multi-row-group
    layouts."""
    from ..operators.partitioning import spread

    l = spread(
        read_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
        ),
        by=["l_orderkey", "l_linenumber"],
    )
    cents = F.expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    )
    h = F.md5(
        F.concat_ws(
            "-",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
            F.col("l_extendedprice").cast("decimal(18,2)").cast("string"),
        )
    )
    in_sample = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % 10 == 0
    )
    c = l.select(
        "l_returnflag",
        cents.alias("cents"),
        in_sample.alias("s"),
    )
    g = c.groupBy("l_returnflag").agg(
        F.sum("cents").cast("bigint").alias("exact_cents"),
        (F.lit(10) * F.sum(F.when(F.col("s"), F.col("cents")).otherwise(0)))
        .cast("bigint")
        .alias("est_cents"),
    )
    return g.select(
        "l_returnflag",
        "exact_cents",
        "est_cents",
        (
            F.abs(F.col("est_cents") - F.col("exact_cents")) * 20
            <= F.col("exact_cents")
        ).alias("within_5pct"),
    )


# ---------------------------------------------------------------------------
# Privacy: k-anonymity audit over quasi-identifiers
# ---------------------------------------------------------------------------


@query(
    "privacy_k_anonymity_audit",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS k,
           COUNT(*) >= 5 AS is_k_anonymous
    FROM customer GROUP BY c_nationkey, c_mktsegment
    """,
)
def privacy_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit — the privacy gate a training-data release
    runs over its quasi-identifiers: every (nation, market-segment)
    equivalence class with its size k and a k ≥ 5 flag (a class
    smaller than k re-identifies its members by attribute combination
    alone). Pure integer counts and an integer threshold — bit-exact
    cross-engine.

    Scale shape: one map-side-combinable groupBy on the QI columns;
    the class domain (nations × segments) is bounded, so the result
    frame is tiny at any corpus size. Composes with text_pii_scrub
    (content-level PII) as the structural-privacy sibling."""
    c = read_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        (F.count(F.lit(1)) >= 5).alias("is_k_anonymous"),
    )


@query(
    "privacy_l_diversity_audit",
    oracle="""
    WITH cls AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 'debt'
                                      WHEN c_acctbal < 5000 THEN 'low'
                                      ELSE 'high' END) AS BIGINT) AS l,
             CAST(MAX(cnt_top) AS BIGINT) AS top_sens_cnt
      FROM (
        SELECT c_nationkey, c_mktsegment, c_acctbal,
               COUNT(*) OVER (
                 PARTITION BY c_nationkey, c_mktsegment,
                              CASE WHEN c_acctbal < 0 THEN 'debt'
                                   WHEN c_acctbal < 5000 THEN 'low'
                                   ELSE 'high' END) AS cnt_top
        FROM customer)
      GROUP BY c_nationkey, c_mktsegment
    )
    SELECT c_nationkey, c_mktsegment, k, l, top_sens_cnt,
           l >= 2 AND 2 * top_sens_cnt <= k AS is_l_diverse
    FROM cls
    """,
)
def privacy_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the attribute-disclosure companion to
    k-anonymity: within each (nation, segment) equivalence class,
    count DISTINCT sensitive values (account-balance band) and the
    largest single band's share. A class passes when l ≥ 2 AND no band
    exceeds half the class (the simple-majority homogeneity attack
    bound), both decided in integers. k-anonymity alone lets an
    attacker learn the sensitive value when a class is homogeneous;
    this catches exactly that.

    Scale shape: one window at (QI, sensitive) grain riding the same
    shuffle as the class groupBy; class domain bounded by QI
    cardinality, so the audit output is tiny at any corpus size."""
    c = read_table(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
    )
    w = Window.partitionBy("c_nationkey", "c_mktsegment", band)
    cls = (
        c.withColumn("cnt_top", F.count(F.lit(1)).over(w))
        .withColumn("band", band)
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k"),
            F.count_distinct("band").cast("bigint").alias("l"),
            F.max("cnt_top").cast("bigint").alias("top_sens_cnt"),
        )
    )
    return cls.select(
        "c_nationkey",
        "c_mktsegment",
        "k",
        "l",
        "top_sens_cnt",
        (
            (F.col("l") >= 2)
            & (2 * F.col("top_sens_cnt") <= F.col("k"))
        ).alias("is_l_diverse"),
    )


@query(
    "privacy_dp_noisy_counts",
    oracle="""
    WITH tc AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS true_n
      FROM events GROUP BY event_type
    )
    SELECT event_type,
           true_n + (CAST('0x' || substring(md5('dp-seed-1' || event_type),
                                            1, 15) AS BIGINT) % 21) - 10
             AS noisy_n,
           CAST(10 AS BIGINT) AS noise_bound
    FROM tc
    """,
)
def privacy_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Noisy histogram release — the differential-privacy mechanism
    shape (true count + bounded integer noise per cell), made
    reproducible for the differential oracle by drawing the noise from
    a seeded md5 of the cell key: ``md5int60 % 21 − 10`` is a uniform
    integer on [−10, 10], identical cross-engine (the md5-rational
    trick, CLAUDE.md). A production release swaps the seeded draw for
    a calibrated discrete-Laplace sample at the SAME call site — the
    aggregation plan (one map-side-combinable count, noise applied to
    the merged total, never per partition) is exactly what DP requires,
    since noising partials would add noise Ω(partitions).

    Scale shape: groupBy(event_type) over a bounded domain; noise is a
    scalar expression on the tiny aggregated frame."""
    e = read_events(spark, sf_dir)
    tc = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_n")
    )
    noise = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dp-seed-1"), F.col("event_type"))), 1, 15),
            16,
            10,
        ).cast("bigint")
        % 21
        - 10
    )
    return tc.select(
        "event_type",
        (F.col("true_n") + noise).alias("noisy_n"),
        F.lit(10).cast("bigint").alias("noise_bound"),
    )


@query(
    "privacy_t_closeness_audit",
    oracle="""
    WITH b AS (
      SELECT c_mktsegment AS seg,
             (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
              + 100000) // 110000 AS bin
      FROM customer
    ),
    cls AS (
      SELECT seg, bin, CAST(COUNT(*) AS BIGINT) AS a
      FROM b GROUP BY seg, bin
    ),
    segs AS (SELECT DISTINCT seg FROM b),
    bins AS (SELECT DISTINCT bin FROM b),
    grid AS (
      SELECT s.seg, bi.bin, COALESCE(c.a, 0) AS a
      FROM segs s CROSS JOIN bins bi
      LEFT JOIN cls c ON c.seg = s.seg AND c.bin = bi.bin
    ),
    gdist AS (
      SELECT bin, CAST(SUM(a) AS BIGINT) AS g FROM grid GROUP BY bin
    ),
    cums AS (
      SELECT gr.seg, gr.bin,
             CAST(SUM(gr.a) OVER (PARTITION BY gr.seg ORDER BY gr.bin)
                  AS BIGINT) AS cum_a,
             CAST(SUM(gl.g) OVER (PARTITION BY gr.seg ORDER BY gr.bin)
                  AS BIGINT) AS cum_g
      FROM grid gr JOIN gdist gl ON gr.bin = gl.bin
    ),
    tot AS (
      SELECT seg, MAX(cum_a) AS n_c, MAX(cum_g) AS n_tot,
             CAST(COUNT(*) AS BIGINT) AS n_bins
      FROM cums GROUP BY seg
    ),
    emd AS (
      SELECT c.seg,
             CAST(SUM(abs(c.cum_a * t.n_tot - c.cum_g * t.n_c))
                  AS BIGINT) AS emd_num
      FROM cums c JOIN tot t ON c.seg = t.seg
      WHERE c.bin < (SELECT MAX(bin) FROM bins)
      GROUP BY c.seg
    )
    SELECT t.seg, t.n_c, e.emd_num,
           ROUND(CAST(e.emd_num AS DOUBLE)
                 / (CAST(t.n_c AS DOUBLE) * CAST(t.n_tot AS DOUBLE)
                    * (CAST(t.n_bins AS DOUBLE) - 1.0)), 9) AS emd,
           5 * e.emd_num <= t.n_c * t.n_tot * (t.n_bins - 1)
             AS is_t_close
    FROM tot t JOIN emd e ON t.seg = e.seg
    """,
)
def privacy_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (the third rung of the privacy ladder after
    k-anonymity and l-diversity): for each market-segment equivalence
    class, the Earth Mover's Distance between the class's account-
    balance distribution and the global one, over ORDERED fixed-width
    balance bins — a class whose sensitive-attribute distribution
    deviates too far leaks information even when k and l pass. The EMD
    over an ordered domain is the mean |ΔCDF|, kept EXACT by cross-
    multiplying the two cumulative counts (|cumA·N − cumG·n_c|, int64)
    and comparing the t = 0.2 fence as 5·emd_num ≤ n_c·N·(B−1) — the
    integer-threshold rule; only the reported emd double is rounded.

    Scale shape: one groupBy to |segments|×|bins| cells; every window
    after runs on that bounded grid. Composes with
    privacy_k_anonymity_audit and privacy_l_diversity_audit."""
    c = read_table(spark, sf_dir, "customer")
    b = c.select(
        F.col("c_mktsegment").alias("seg"),
        F.expr(
            "(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " + 100000) DIV 110000"
        ).alias("bin"),
    )
    cls = b.groupBy("seg", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("a")
    ).transform(pin)
    # segs/bins derive from the aggregated cell frame, not the base
    # scan — and cls is PINNED: segs/bins/grid/max_bin all branch off
    # it, and unpinned each branch re-ran the customer groupBy (5
    # customer scans in the static plan — round-10 repeated-scan
    # audit; 1 after the pin).
    segs = cls.select("seg").distinct()
    bins = cls.select("bin").distinct()
    grid = (
        segs.crossJoin(bins)
        .join(cls, ["seg", "bin"], "left")
        .withColumn("a", F.coalesce(F.col("a"), F.lit(0)))
    )
    glob = grid.groupBy("bin").agg(F.sum("a").cast("bigint").alias("g"))
    wc = Window.partitionBy("seg").orderBy("bin")
    cums = (
        grid.join(glob, "bin")
        .select(
            "seg",
            "bin",
            F.sum("a").over(wc).cast("bigint").alias("cum_a"),
            F.sum("g").over(wc).cast("bigint").alias("cum_g"),
        )
    )
    tot = cums.groupBy("seg").agg(
        F.max("cum_a").alias("n_c"),
        F.max("cum_g").alias("n_tot"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
    )
    max_bin = bins.agg(F.max("bin").alias("mb"))
    emd = (
        cums.crossJoin(F.broadcast(max_bin))
        .filter(F.col("bin") < F.col("mb"))
        .join(tot, "seg")
        .groupBy("seg")
        .agg(
            F.sum(
                F.abs(
                    F.col("cum_a") * F.col("n_tot")
                    - F.col("cum_g") * F.col("n_c")
                )
            )
            .cast("bigint")
            .alias("emd_num")
        )
    )
    return tot.join(emd, "seg").select(
        "seg",
        "n_c",
        "emd_num",
        F.round(
            F.col("emd_num").cast("double")
            / (
                F.col("n_c").cast("double")
                * F.col("n_tot").cast("double")
                * (F.col("n_bins").cast("double") - F.lit(1.0))
            ),
            9,
        ).alias("emd"),
        (
            5 * F.col("emd_num")
            <= F.col("n_c") * F.col("n_tot") * (F.col("n_bins") - 1)
        ).alias("is_t_close"),
    )


@query(
    "privacy_generalization_ladder",
    oracle="""
    WITH l0 AS (
      SELECT n.n_regionkey AS region, c.c_nationkey AS nation,
             c.c_mktsegment AS seg,
             (CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
              + 100000) // 100000 AS band,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2, 3, 4
    ),
    l1 AS (SELECT region, nation, seg, CAST(SUM(k) AS BIGINT) AS k
           FROM l0 GROUP BY 1, 2, 3),
    l2 AS (SELECT region, seg, CAST(SUM(k) AS BIGINT) AS k
           FROM l1 GROUP BY 1, 2),
    l3 AS (SELECT seg, CAST(SUM(k) AS BIGINT) AS k FROM l2 GROUP BY 1),
    s0 AS (SELECT 0 AS level, CAST(COUNT(*) AS BIGINT) AS n_classes,
                  CAST(MIN(k) AS BIGINT) AS min_k,
                  CAST(COALESCE(SUM(CASE WHEN k < 5 THEN 1 END), 0)
                       AS BIGINT) AS small_classes,
                  CAST(COALESCE(SUM(CASE WHEN k < 5 THEN k END), 0)
                       AS BIGINT) AS exposed_rows
           FROM l0),
    s1 AS (SELECT 1, CAST(COUNT(*) AS BIGINT), CAST(MIN(k) AS BIGINT),
                  CAST(COALESCE(SUM(CASE WHEN k < 5 THEN 1 END), 0)
                       AS BIGINT),
                  CAST(COALESCE(SUM(CASE WHEN k < 5 THEN k END), 0)
                       AS BIGINT)
           FROM l1),
    s2 AS (SELECT 2, CAST(COUNT(*) AS BIGINT), CAST(MIN(k) AS BIGINT),
                  CAST(COALESCE(SUM(CASE WHEN k < 5 THEN 1 END), 0)
                       AS BIGINT),
                  CAST(COALESCE(SUM(CASE WHEN k < 5 THEN k END), 0)
                       AS BIGINT)
           FROM l2),
    s3 AS (SELECT 3, CAST(COUNT(*) AS BIGINT), CAST(MIN(k) AS BIGINT),
                  CAST(COALESCE(SUM(CASE WHEN k < 5 THEN 1 END), 0)
                       AS BIGINT),
                  CAST(COALESCE(SUM(CASE WHEN k < 5 THEN k END), 0)
                       AS BIGINT)
           FROM l3),
    u AS (SELECT * FROM s0 UNION ALL SELECT * FROM s1
          UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3)
    SELECT CAST(level AS INT) AS level, n_classes, min_k, small_classes,
           exposed_rows, CAST(min_k >= 5 AS INT) AS k5_ok
    FROM u
    """,
)
def privacy_generalization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The anonymization decision table k-anonymity audits feed: sweep
    the quasi-identifier GENERALIZATION ladder — L0 (nation, segment,
    $1000 balance band) → L1 (nation, segment) → L2 (region, segment)
    → L3 (segment) — and report, per level, the class count, the
    smallest class, how many classes re-identify (k < 5) and how many
    rows sit in them. A release picks the coarsest level whose utility
    survives and whose k5_ok holds — the structural-privacy sibling of
    filter_quality_threshold_sweep's operating-point curve.

    Determinism: balance banding is offset-cents integer floor-div
    (all-positive operands, so Spark DIV truncation == DuckDB //
    floor), every stat is an integer count.

    Scale shape: ONE scan of customer (broadcast nation join) down to
    the bounded L0 class histogram (regions × nations × segments ×
    ~11 bands); L1/L2/L3 re-aggregate that tiny frame instead of
    rescanning — the quality_multi_column_iqr histogram-grain rule."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    l0 = (
        c.join(
            F.broadcast(
                n.select(
                    F.col("n_nationkey"),
                    F.col("n_regionkey").alias("region"),
                )
            ),
            c["c_nationkey"] == F.col("n_nationkey"),
        )
        .select(
            "region",
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("seg"),
            F.expr(
                "(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"
                " + 100000) DIV 100000"
            ).alias("band"),
        )
        .groupBy("region", "nation", "seg", "band")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k"))
        # pin: four stats branches re-aggregate THIS frame — unpinned,
        # each union branch would re-derive l0 (4 customer scans)
        .transform(pin)
    )
    l1 = l0.groupBy("region", "nation", "seg").agg(
        F.sum("k").cast("bigint").alias("k")
    )
    l2 = l1.groupBy("region", "seg").agg(
        F.sum("k").cast("bigint").alias("k")
    )
    l3 = l2.groupBy("seg").agg(F.sum("k").cast("bigint").alias("k"))

    def stats(classes: DataFrame, level: int) -> DataFrame:
        small = F.when(F.col("k") < 5, 1)
        exposed = F.when(F.col("k") < 5, F.col("k"))
        return classes.agg(
            F.lit(level).cast("int").alias("level"),
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.min("k").cast("bigint").alias("min_k"),
            F.coalesce(F.sum(small), F.lit(0))
            .cast("bigint")
            .alias("small_classes"),
            F.coalesce(F.sum(exposed), F.lit(0))
            .cast("bigint")
            .alias("exposed_rows"),
        )

    u = (
        stats(l0, 0)
        .unionByName(stats(l1, 1))
        .unionByName(stats(l2, 2))
        .unionByName(stats(l3, 3))
    )
    return u.select(
        "level",
        "n_classes",
        "min_k",
        "small_classes",
        "exposed_rows",
        (F.col("min_k") >= 5).cast("int").alias("k5_ok"),
    )


@query(
    "window_fill_ignore_nulls",
    oracle="""
    WITH base AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
             END AS pc
      FROM events
    )
    SELECT event_id, user_id, ts,
           LAST_VALUE(pc IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_cents,
           FIRST_VALUE(pc IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             AS next_purchase_cents
    FROM base
    """,
)
def window_fill_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window navigation: every event carries the most
    recent purchase amount at-or-before it (LOCF) and the next one
    at-or-after (NOCB) within its user's timeline — the
    forward/backward-fill pair behind feature snapshots ('spend state
    when this event happened'). Both engines support IGNORE NULLS
    natively (Spark last/first with ignorenulls=True), values are
    exact cents with a (ts, event_id) tie-broken total order.

    Scale shape: one shuffle on user_id serves both frame directions;
    the fill is a linear per-partition pass, no join against the
    purchase subset."""
    e = read_events(spark, sf_dir)
    base = e.select(
        "event_id",
        "user_id",
        "ts",
        F.when(
            F.col("event_type") == "purchase",
            F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"),
        ).alias("pc"),
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return base.select(
        "event_id",
        "user_id",
        "ts",
        F.last("pc", ignorenulls=True).over(wb).alias("last_purchase_cents"),
        F.first("pc", ignorenulls=True).over(wf).alias("next_purchase_cents"),
    )


@query(
    "spatial_dbscan_core_points",
    oracle="""
    WITH pts AS (
      SELECT user_id,
             CAST(CONCAT('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 6))
                  AS BIGINT) % 1000 AS y,
             CAST(CONCAT('0x', substring(md5(CAST(user_id AS VARCHAR)), 7, 6))
                  AS BIGINT) % 2000 AS x
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    cells AS (
      SELECT user_id, y, x, y // 100 AS cy, x // 100 AS cx FROM pts
    ),
    fan AS (
      SELECT c.user_id, c.y, c.x, c.cy + dy.d AS ny, c.cx + dx.d AS nx
      FROM cells c,
           (SELECT unnest(ARRAY[-1, 0, 1]) AS d) dy,
           (SELECT unnest(ARRAY[-1, 0, 1]) AS d) dx
    ),
    nbr AS (
      SELECT f.user_id, o.user_id AS nbr_id
      FROM fan f JOIN cells o
        ON o.cy = f.ny AND o.cx = f.nx AND o.user_id <> f.user_id
      WHERE (f.y - o.y) * (f.y - o.y) + (f.x - o.x) * (f.x - o.x) < 2500
    ),
    cnt AS (
      SELECT p.user_id,
             CAST(1 + COALESCE(n.c, 0) AS BIGINT) AS n_within_eps
      FROM pts p LEFT JOIN (
        SELECT user_id, COUNT(*) AS c FROM nbr GROUP BY user_id
      ) n ON p.user_id = n.user_id
    ),
    core AS (SELECT user_id FROM cnt WHERE n_within_eps >= 4),
    border AS (
      SELECT DISTINCT b.user_id
      FROM nbr b JOIN core c ON b.nbr_id = c.user_id
      WHERE b.user_id NOT IN (SELECT user_id FROM core)
    )
    SELECT c.user_id, c.n_within_eps,
           CASE WHEN c.user_id IN (SELECT user_id FROM core) THEN 'core'
                WHEN c.user_id IN (SELECT user_id FROM border) THEN 'border'
                ELSE 'noise' END AS role
    FROM cnt c
    """,
)
def spatial_dbscan_core_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN's point classification (eps = 0.5°, minPts = 4) on the
    grid-bucket join: core points have ≥ minPts neighbors within eps
    (self included), border points are non-core within eps of a core,
    the rest is noise. Coordinates are md5-fabricated integer
    centi-degrees (same scheme as spatial_grid_neighbor_counts), so
    the eps test is a PURE INTEGER comparison (dy²+dx² < 50²) — no
    float anywhere. Full DBSCAN clustering = these cores fed to the
    hash-min connected-components operator (operators/graph.py); the
    classification step here is the part with a closed-form oracle.

    Scale shape: one 3×3 cell fan-out + equi join on cell id bounds
    candidate pairs by 9× cell occupancy; the core/border joins run on
    the neighbor pair list, never all points × all points."""
    ev = read_events(spark, sf_dir)
    pts = ev.select("user_id").distinct().select(
        "user_id",
        F.expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 6), 16, 10)"
            " AS BIGINT) % 1000"
        ).alias("y"),
        F.expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 7, 6), 16, 10)"
            " AS BIGINT) % 2000"
        ).alias("x"),
    )
    cells = pts.select(
        "user_id", "y", "x",
        F.expr("y DIV 100").alias("cy"),
        F.expr("x DIV 100").alias("cx"),
    )
    d = spark.range(-1, 2).select(F.col("id").alias("d"))
    fan = (
        cells.crossJoin(d.select(F.col("d").alias("dy")))
        .crossJoin(d.select(F.col("d").alias("dx")))
        .select(
            "user_id", "y", "x",
            (F.col("cy") + F.col("dy")).alias("ny"),
            (F.col("cx") + F.col("dx")).alias("nx"),
        )
    )
    o = cells.select(
        F.col("user_id").alias("nbr_id"),
        F.col("y").alias("oy"),
        F.col("x").alias("ox"),
        F.col("cy").alias("ny"),
        F.col("cx").alias("nx"),
    )
    nbr = pin(
        fan.join(o, ["ny", "nx"])
        .filter(
            (F.col("user_id") != F.col("nbr_id"))
            & (
                (F.col("y") - F.col("oy")) * (F.col("y") - F.col("oy"))
                + (F.col("x") - F.col("ox")) * (F.col("x") - F.col("ox"))
                < 2500
            )
        )
        .select("user_id", "nbr_id")
    )
    cnt = (
        pts.join(
            nbr.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")),
            "user_id",
            "left",
        )
        .select(
            "user_id",
            (F.lit(1) + F.coalesce(F.col("c"), F.lit(0)))
            .cast("bigint")
            .alias("n_within_eps"),
        )
    )
    core = cnt.filter(F.col("n_within_eps") >= 4).select("user_id")
    border = (
        nbr.join(
            core.select(F.col("user_id").alias("nbr_id")), "nbr_id", "left_semi"
        )
        .select("user_id")
        .distinct()
        .join(core, "user_id", "left_anti")
    )
    return (
        cnt.join(
            core.withColumn("is_core", F.lit(True)), "user_id", "left"
        )
        .join(
            border.withColumn("is_border", F.lit(True)), "user_id", "left"
        )
        .select(
            "user_id",
            "n_within_eps",
            F.when(F.col("is_core"), "core")
            .when(F.col("is_border"), "border")
            .otherwise("noise")
            .alias("role"),
        )
    )
