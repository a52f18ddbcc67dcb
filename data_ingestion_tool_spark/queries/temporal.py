"""Temporal + layout queries: as-of join, streaming session windows,
partition-pruned ingest, IVF similarity.

The as-of join and session windows are operators the reference engine
class typically adds beyond plain SQL; DuckDB expresses both (ASOF JOIN
/ gap sessionization) so they stay oracle-checked.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..sources.parquet_io import (
    enable_nanos_as_long,
    normalize_ts,
    read_events,
    read_table,
)
from ..streaming.windows import run_stream_to_table
from .registry import dsum, fsum, query, sql_dsum, sql_fsum
from .similarity import _RECALL_FENCE_ORACLE
from ..session import scratch_base


@query(
    "join_asof_last_click",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts, c.ts AS last_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON e.user_id = c.user_id AND e.ts >= c.ts
    """,
)
def join_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every error event, the most recent click by the same user at
    or before it — LEFT ASOF JOIN, planned as union + ordered window
    (one shuffle on user_id; see operators/asof.py for why not a
    range join)."""
    ev = read_events(spark, sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click")
    return asof_join(
        errors,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        payload={"ts": "last_click_ts"},
    )


@query(
    "stream_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged)
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (30-min inactivity gap) via the
    built-in ``session_window`` — state-store-backed session merging,
    the streaming twin of the batch gap-sessionization oracle."""
    enable_nanos_as_long(spark)
    schema = read_table(spark, sf_dir, "events").schema

    def transform(stream):
        e = normalize_ts(stream, "ts")
        return (
            e.withWatermark("ts", "30 minutes")
            .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events",
            )
        )

    return run_stream_to_table(
        spark, os.path.join(sf_dir, "events.parquet"), schema, transform
    )


@query(
    "ingest_partitioned_prune",
    oracle=f"""
    SELECT o_orderstatus, COUNT(*) AS cnt, {sql_dsum('o_totalprice')} AS sum_price
    FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderstatus
    """,
)
def ingest_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned ingest + partition-pruned read: write orders
    ``partitionBy(o_orderstatus)``, read back filtered to one partition.
    The filter prunes whole directories at planning time (zero I/O for
    other partitions) — the layout choice that replaces the reference's
    ``ORDER BY tuple()`` no-layout policy for 100 TB tables."""
    out = os.path.join(scratch_base(), "ditspark_part_orders")
    o = read_table(spark, sf_dir, "orders")
    (
        o.write.mode("overwrite")
        .partitionBy("o_orderstatus")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    from .registry import dsum

    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("sum_price")
    )


@query("similarity_topk_ivf", oracle=_RECALL_FENCE_ORACLE)
def similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate nearest neighbors: 16-cell codebook
    (one distributed Lloyd refinement), probe the 4 nearest cells per
    query, exact cosine re-rank inside probed cells. Output is the
    hash-oracled recall fence over the real pruned run (floor 50%;
    measured 28/50 hits at sf0.01, 30/50 at sf0.1 — see
    queries/similarity.py:_recall_fence for the bound-as-value
    design); raw-output exactness is pinned by the
    similarity_topk_ivf_fullprobe differential twin."""
    from ..operators.similarity import cosine_topk, ivf_topk
    from ..plans.pin import pin
    from .similarity import _recall_fence

    # index-once (round-11): seed collect, Lloyd refine, cell
    # assignment, brute-force fence and the query block all read ONE
    # pinned corpus projection instead of re-scanning embeddings x4
    emb = pin(
        read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    queries = emb.orderBy("vec_id").limit(10)
    ann = ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=4)
    bf = cosine_topk(emb, queries, k=5)
    return _recall_fence(queries, ann, bf, 5, 50)


@query(
    "events_hypertable_rollup",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_day,
           CASE WHEN GROUPING(date_trunc('hour', ts)) = 0
                THEN CAST(date_trunc('hour', ts) AS TIMESTAMP) END AS bucket_hour,
           event_type, COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((date_trunc('day', ts), event_type),
                            (date_trunc('day', ts), date_trunc('hour', ts), event_type))
    """,
)
def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: per-type event
    counts/sums at BOTH hour and day granularity in one pass (the
    timescale/druid rollup shape). GROUPING SETS expands once and
    shuffles once — vs two scans for two GROUP BYs; day-level rows
    carry NULL bucket_hour. Output rows ≈ types x hours, independent
    of event volume, so the aggregate itself is the compaction step a
    100 TB event table needs before serving."""
    ev = read_events(spark, sf_dir)
    d = ev.select(
        F.date_trunc("day", "ts").alias("bucket_day"),
        F.date_trunc("hour", "ts").alias("bucket_hour"),
        "event_type",
        "value",
    )
    return d.groupingSets(
        [
            ["bucket_day", "event_type"],
            ["bucket_day", "bucket_hour", "event_type"],
        ],
        "bucket_day",
        "bucket_hour",
        "event_type",
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        dsum("value").alias("sum_value"),
    )


@query(
    "events_global_seq",
    oracle="""
    SELECT event_id,
           CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT) AS seq
    FROM events WHERE event_type = 'purchase'
    """,
)
def events_global_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable global sequence numbers over an event stream slice — the
    ingestion primitive behind offset assignment / ordered replay /
    exactly-once reconciliation: every purchase event gets a dense
    1-based id in (ts, event_id) order.

    A naive ``row_number() OVER (ORDER BY ts)`` funnels the whole
    stream through one task; this runs the distributed ranking operator
    (operators/ranking.py) at event-fact grain — parallel range
    shuffle + broadcast partition offsets. (ts, event_id) is a total
    order (event_id unique), so the sequence is engine-exact."""
    from ..operators.ranking import with_global_row_number

    ev = read_events(spark, sf_dir).where(F.col("event_type") == "purchase")
    return with_global_row_number(
        ev.select("event_id", "ts"), ["ts", "event_id"], rn="seq"
    ).select("event_id", "seq")


@query(
    "join_asof_tolerance_click",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.ts,
           (SELECT MAX(c.ts) FROM c
            WHERE c.user_id = p.user_id AND c.ts <= p.ts
              AND c.ts >= p.ts - INTERVAL 10 MINUTE) AS last_click_ts
    FROM p
    """,
)
def join_asof_tolerance_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH TOLERANCE (pandas ``merge_asof(tolerance=...)``):
    the most recent click at most 10 minutes before each purchase;
    staler matches are nulled, not carried — the attribution-window
    semantics plain as-of gets wrong (a click from last week should not
    claim this purchase). DuckDB's ASOF has no tolerance either, so the
    oracle is the correlated bounded-MAX subquery.

    Scale shape: identical to join_asof_last_click — ONE shuffle on
    user_id; the tolerance is a post-scan projection filter on the
    matched timestamp riding in the payload struct (operators/asof.py
    ``tolerance_us``), not a second pass or a range join.
    """
    ev = read_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click")
    return asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        payload={"ts": "last_click_ts"},
        tolerance_us=10 * 60 * 1_000_000,
    )


@query(
    "events_hopping_window_counts",
    oracle="""
    WITH base AS (
      SELECT event_type,
             CAST(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)
                          // 1800 * 1800) AS TIMESTAMP) AS slot,
             unnest(ARRAY[0, 1]) AS back
      FROM events
    )
    SELECT slot - back * INTERVAL 30 MINUTE AS window_start,
           event_type, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM base
    GROUP BY slot - back * INTERVAL 30 MINUTE, event_type
    """,
)
def events_hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows in BATCH: ``F.window(ts, '1 hour',
    '30 minutes')`` assigns each event to the two 1-hour windows that
    contain it (starts at its 30-min slot and the slot before) — the
    overlap-aware rollup behind smooth dashboards. The oracle derives
    the same membership in closed form: floor ts to the 30-min slot,
    fan each row to (slot, slot − 30 min). The epoch floor goes
    through BIGINT before `//` — DuckDB's `//` on DOUBLE is plain
    division (the int-only agreement zone from CLAUDE.md).

    Scale shape: Spark's window() expands rows size/slide = 2× inside
    the scan projection before ONE map-side-combinable count shuffle —
    no self-join, no range join; output cardinality is slots × types
    (domain-bounded).
    """
    e = read_events(spark, sf_dir)
    win = e.groupBy(
        F.window("ts", "1 hour", "30 minutes").alias("win"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    return win.select(
        F.col("win.start").alias("window_start"), "event_type", "cnt"
    )


@query(
    "temporal_scd2_intervals",
    oracle="""
    WITH k AS (
      SELECT user_id, ts, event_id,
             CAST(json_extract(props, '$.k') AS BIGINT) // 25 AS bucket
      FROM events
    ),
    seg AS (
      SELECT user_id, ts, event_id, bucket,
             CASE WHEN LAG(bucket) OVER w IS NULL
                       OR LAG(bucket) OVER w <> bucket
                  THEN 1 ELSE 0 END AS new_seg
      FROM k WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT user_id, ts, bucket,
             SUM(new_seg) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg_id
      FROM seg
    ),
    iv AS (
      SELECT user_id, CAST(seg_id AS BIGINT) AS seg_id, MAX(bucket) AS bucket,
             MIN(ts) AS valid_from, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM runs GROUP BY user_id, seg_id
    )
    SELECT user_id, seg_id, bucket, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY seg_id)
             AS valid_to,
           n_events
    FROM iv
    """,
)
def temporal_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 interval construction from an event stream: runs of a
    constant attribute (the json `k` prop bucketed to 4 levels) per
    user become validity intervals [valid_from, valid_to), the open
    current segment keeping NULL valid_to — the change-data-capture →
    dimension-history derivation every warehouse needs. Gaps-and-islands
    via lag-flag-cumsum, then per-segment rollup and a LEAD for the
    closing edge.

    Scale shape: everything partitions by user_id — one shuffle, all
    three window passes and the rollup reuse it. JSON extraction is
    scan-side codegen (get_json_object / json_extract twins).
    """
    e = read_events(spark, sf_dir)
    k = e.select(
        "user_id",
        "ts",
        "event_id",
        F.expr(
            "CAST(get_json_object(props, '$.k') AS BIGINT) DIV 25"
        ).alias("bucket"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seg = k.withColumn(
        "new_seg",
        F.when(
            F.lag("bucket").over(w).isNull()
            | (F.lag("bucket").over(w) != F.col("bucket")),
            1,
        ).otherwise(0),
    )
    runs = seg.withColumn("seg_id", F.sum("new_seg").over(wrun).cast("bigint"))
    iv = runs.groupBy("user_id", "seg_id").agg(
        F.max("bucket").alias("bucket"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    wl = Window.partitionBy("user_id").orderBy("seg_id")
    return iv.select(
        "user_id",
        "seg_id",
        "bucket",
        "valid_from",
        F.lead("valid_from").over(wl).alias("valid_to"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# Interval union coverage (merge overlapping per-user activity intervals)
# ---------------------------------------------------------------------------


@query(
    "temporal_interval_union_coverage",
    oracle="""
    WITH i AS (
      SELECT user_id, event_id, epoch_us(ts) AS start_us,
             epoch_us(ts) + 1800000000 AS end_us
      FROM events
    ),
    p AS (
      SELECT user_id, event_id, start_us, end_us,
             max(end_us) OVER (
               PARTITION BY user_id ORDER BY start_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      FROM i
    ),
    f AS (
      SELECT user_id, event_id, start_us, end_us,
             CASE WHEN prev_end IS NULL OR start_us > prev_end
                  THEN 1 ELSE 0 END AS flag
      FROM p
    ),
    isl AS (
      SELECT user_id, start_us, end_us,
             SUM(flag) OVER (
               PARTITION BY user_id ORDER BY start_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM f
    ),
    g AS (
      SELECT user_id, island, min(start_us) AS s, max(end_us) AS e
      FROM isl GROUP BY user_id, island
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(e - s) AS BIGINT) AS covered_us
    FROM g GROUP BY user_id
    """,
)
def temporal_interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-of-intervals coverage per user: each event opens a
    half-open 30-minute activity interval; overlapping/adjacent
    intervals merge (the classic gaps-and-islands sweep) and the query
    reports islands and total covered microseconds per user. All
    arithmetic is exact bigint epoch-microseconds — no float anywhere.
    New-island rule: start strictly greater than the running max of
    prior ends (equal endpoints merge, matching half-open semantics).

    Scale shape: one shuffle on user_id; both windows and both
    group-bys reuse that partitioning (per-user frames, never a global
    sort). The sweep is O(events-per-user log) locally per partition.
    """
    ev = read_events(spark, sf_dir)
    i = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("start_us"),
        (F.unix_micros(F.col("ts")) + F.lit(1800000000).cast("bigint")).alias(
            "end_us"
        ),
    )
    w = Window.partitionBy("user_id").orderBy("start_us", "event_id")
    prev_end = F.max("end_us").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    f = i.withColumn(
        "flag",
        F.when(prev_end.isNull() | (F.col("start_us") > prev_end), 1).otherwise(0),
    )
    isl = f.withColumn(
        "island",
        F.sum("flag").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    g = isl.groupBy("user_id", "island").agg(
        F.min("start_us").alias("s"), F.max("end_us").alias("e")
    )
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum(F.col("e") - F.col("s")).cast("bigint").alias("covered_us"),
    )


# ---------------------------------------------------------------------------
# OHLC resampling (hourly bars per event type — time-series downsample)
# ---------------------------------------------------------------------------


@query(
    "temporal_resample_ohlc",
    oracle="""
    WITH r AS (
      SELECT event_type, date_trunc('hour', ts) AS bar_hour, value,
             row_number() OVER (
               PARTITION BY event_type, date_trunc('hour', ts)
               ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (
               PARTITION BY event_type, date_trunc('hour', ts)
               ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type, bar_hour,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open_v,
           MAX(value) AS high_v,
           MIN(value) AS low_v,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close_v,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS sum_value
    FROM r GROUP BY event_type, bar_hour
    """,
)
def temporal_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type — the canonical time-series
    resample (open/high/low/close/volume) over the raw event stream.
    First/last are picked by row_number with the (ts, event_id)
    unique tie-break on both engines; open/high/low/close are raw
    column values (no arithmetic, exact equality), volume uses the
    fixed-point sum.

    Scale shape: one shuffle on (event_type, hour); the two
    row_number windows and the final groupBy share that partitioning,
    and each window frame is one bar's rows, so parallelism grows
    with bar count. No global sort.
    """
    ev = read_events(spark, sf_dir)
    r = ev.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bar_hour"),
        "value",
        "ts",
        "event_id",
    )
    wspec = Window.partitionBy("event_type", "bar_hour")
    wa = wspec.orderBy("ts", "event_id")
    wd = wspec.orderBy(F.col("ts").desc(), F.col("event_id").desc())
    ranked = r.select(
        "event_type",
        "bar_hour",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return ranked.groupBy("event_type", "bar_hour").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open_v"),
        F.max("value").alias("high_v"),
        F.min("value").alias("low_v"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close_v"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        fsum("value").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Complex-event pattern: click → error within 5 min, no purchase between
# ---------------------------------------------------------------------------


@query(
    "events_cep_click_error_no_purchase",
    oracle="""
    WITH e AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'error'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    j1 AS (
      SELECT e.event_id, e.user_id, e.ts,
             CASE WHEN c.ts IS NOT NULL
                       AND epoch_us(e.ts) - epoch_us(c.ts) <= 300000000
                  THEN c.ts END AS click_ts
      FROM e ASOF LEFT JOIN c ON e.user_id = c.user_id AND e.ts >= c.ts
    ),
    j2 AS (
      SELECT j1.event_id, j1.user_id, j1.ts, j1.click_ts, p.ts AS purch_ts
      FROM j1 ASOF LEFT JOIN p ON j1.user_id = p.user_id AND j1.ts >= p.ts
    )
    SELECT user_id, event_id AS error_event_id, click_ts, ts AS error_ts
    FROM j2
    WHERE click_ts IS NOT NULL AND (purch_ts IS NULL OR purch_ts < click_ts)
    """,
)
def events_cep_click_error_no_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern match: a click followed by an
    error within 5 minutes with NO purchase in between — the
    "user tried to buy, hit an error, never converted" incident
    signature (MATCH_RECOGNIZE territory), composed from two as-of
    joins instead of a row-pattern automaton: the last click within
    tolerance supplies the pattern head, the last purchase before the
    error disqualifies matches where it landed at-or-after the click.
    Payloads are the matched timestamps themselves, so ties between
    same-timestamp right rows can't produce nondeterministic output.

    Scale shape: both as-of joins are the one-shuffle union + ordered
    per-user window plan (operators/asof.py) — no range join, no
    self-join; the pattern predicate is a post-projection filter.
    """
    ev = read_events(spark, sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    j1 = asof_join(
        errors,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        payload={"ts": "click_ts"},
        tolerance_us=300_000_000,
    )
    j2 = asof_join(
        j1,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        payload={"ts": "purch_ts"},
    )
    return j2.filter(
        F.col("click_ts").isNotNull()
        & (F.col("purch_ts").isNull() | (F.col("purch_ts") < F.col("click_ts")))
    ).select(
        "user_id",
        F.col("event_id").alias("error_event_id"),
        "click_ts",
        F.col("ts").alias("error_ts"),
    )


# ---------------------------------------------------------------------------
# Seasonal index by month (classical ratio-to-moving-average decomposition)
# ---------------------------------------------------------------------------


@query(
    "orders_seasonal_index_monthly",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY date_trunc('month', o_orderdate)
    ),
    w AS (
      SELECT month, cents,
             CAST(SUM(cents) OVER (ORDER BY month
               ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING) AS BIGINT) AS win_cents,
             CAST(COUNT(*) OVER (ORDER BY month
               ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING) AS BIGINT) AS win_n
      FROM m
    )
    SELECT month, cents / 100.0 AS revenue,
           (CAST(win_cents AS DOUBLE) / 12.0) / 100.0 AS trend,
           CAST(cents AS DOUBLE) / (CAST(win_cents AS DOUBLE) / 12.0)
             AS seasonal_index
    FROM w WHERE win_n = 12
    """,
)
def orders_seasonal_index_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical ratio-to-moving-average seasonal decomposition of
    monthly revenue: a centered 12-month moving average is the trend,
    and each month's revenue divided by it is the seasonal index
    (index > 1 ⇒ seasonally strong month). Month revenues are exact
    bigint cents, the moving window sums those bigints exactly, and
    the trend/index are identical double expressions — no float
    accumulation anywhere. Months without a full 12-row window are
    excluded (no partial-window bias).

    Scale shape: the fact table collapses to month grain first
    (map-side combinable); the global moving window runs over ~tens of
    month rows — the documented pre-aggregated-grain bound, not a
    fact-table sort.
    """
    o = read_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy("month").rowsBetween(-6, 5)
    d = m.select(
        "month",
        "cents",
        F.sum("cents").over(w).cast("bigint").alias("win_cents"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("win_n"),
    )
    return d.filter(F.col("win_n") == 12).select(
        "month",
        (F.col("cents") / 100.0).alias("revenue"),
        ((F.col("win_cents").cast("double") / 12.0) / 100.0).alias("trend"),
        (
            F.col("cents").cast("double")
            / (F.col("win_cents").cast("double") / 12.0)
        ).alias("seasonal_index"),
    )


# ---------------------------------------------------------------------------
# Hopping-window DISTINCT users (exact windowed distinct, not a count)
# ---------------------------------------------------------------------------


@query(
    "events_hopping_distinct_users",
    oracle="""
    WITH base AS (
      SELECT DISTINCT user_id,
             CAST(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)
                          // 1800 * 1800) AS TIMESTAMP)
               - back * INTERVAL 30 MINUTE AS window_start
      FROM events, (SELECT unnest(ARRAY[0, 1]) AS back)
    )
    SELECT window_start, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM base GROUP BY window_start
    """,
)
def events_hopping_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DISTINCT users per hopping 1-hour window (30-min slide) —
    the deduplicated-audience rollup (unique visitors per overlapping
    hour) that a plain hopping COUNT can't answer. Spark's window()
    fans each event into its two containing windows, then a two-level
    aggregate: DISTINCT (window, user) with map-side combine, then the
    per-window count. The oracle derives window membership in closed
    form (bigint epoch floor — never `//` on DOUBLE).

    Scale shape: the distinct shuffle carries (window, user_id) pairs
    — already combiner-reduced — and the final count reuses that
    partitioning; no self-join, output is slot-bounded. For 100 TB
    audiences where exact distinct is too wide, the sketch twin is
    agg_sketch_mergeable_distinct.
    """
    e = read_events(spark, sf_dir)
    pairs = (
        e.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("win"), "user_id"
        )
        .agg(F.lit(1))
        .select(F.col("win.start").alias("window_start"), "user_id")
    )
    return pairs.groupBy("window_start").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )


# ---------------------------------------------------------------------------
# Peak interval concurrency via distributed sweep-line
# ---------------------------------------------------------------------------


@query(
    "events_peak_concurrency_hourly",
    oracle="""
    WITH b AS (
      SELECT ts AS t, 1 AS delta, event_id FROM events
      UNION ALL
      SELECT ts + INTERVAL 5 MINUTE, -1, event_id FROM events
    ),
    sw AS (
      SELECT t, delta,
             CAST(SUM(delta) OVER (
               ORDER BY t, delta, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS running
      FROM b
    )
    SELECT date_trunc('hour', t) AS hour, MAX(running) AS peak_concurrency
    FROM sw WHERE delta = 1
    GROUP BY hour
    """,
)
def events_peak_concurrency_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per hour — how many 5-minute event windows
    overlap at the busiest instant of each hour (capacity planning /
    rate-limit sizing). Classic sweep-line: +1 at each start, −1 at
    each end, running sum over the global boundary order, max per
    hour. Ends sort BEFORE starts at equal timestamps (delta −1 < +1),
    so touching intervals don't double-count; event_id totalizes the
    order. Peaks are read at start boundaries only (concurrency can
    only peak when something starts). Differs from the sibling
    events_peak_concurrency (statistics.py), whose sweep is
    DAY-PARTITIONED — windows straddling midnight are truncated to
    their start day there; here the sweep is EXACT across all
    boundaries, which is what requires the distributed global prefix
    sum instead of a per-day window.

    Scale shape: the global running sum is the PARALLEL literal-offset
    prefix-sum operator (operators/ranking.py) — one range shuffle
    over the boundary stream, vectorized partition cumsums, no
    single-task sort; the oracle's single-sort window formulation is
    the fixture-scale twin. Hourly max is map-side combinable.
    """
    from ..operators.ranking import with_global_prefix_sum

    e = read_events(spark, sf_dir)
    starts = e.select(
        F.col("ts").alias("t"), F.lit(1).alias("delta"), "event_id"
    )
    ends = e.select(
        (F.col("ts") + F.expr("INTERVAL 5 MINUTE")).alias("t"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    b = starts.unionAll(ends)
    sw = with_global_prefix_sum(
        b, ["t", "delta", "event_id"], "delta", rn="__rn", cum="running"
    )
    return (
        sw.where(F.col("delta") == 1)
        .groupBy(F.date_trunc("hour", "t").alias("hour"))
        .agg(F.max("running").cast("bigint").alias("peak_concurrency"))
    )


# ---------------------------------------------------------------------------
# Year-over-year monthly revenue growth
# ---------------------------------------------------------------------------


@query(
    "orders_yoy_growth_monthly",
    oracle="""
    WITH m AS (
      SELECT CAST(strftime(o_orderdate, '%Y') AS INT) AS year,
             CAST(strftime(o_orderdate, '%m') AS INT) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                  AS BIGINT)) AS BIGINT) AS rev_c
      FROM orders GROUP BY year, month
    )
    SELECT year, month, rev_c,
           CAST(lag(rev_c) OVER (PARTITION BY month ORDER BY year)
                AS BIGINT) AS prev_year_rev_c,
           CAST(rev_c - lag(rev_c) OVER (PARTITION BY month ORDER BY year)
                AS DOUBLE)
             / CAST(lag(rev_c) OVER (PARTITION BY month ORDER BY year)
                    AS DOUBLE) AS yoy_growth
    FROM m
    """,
)
def orders_yoy_growth_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth of monthly revenue — the reporting
    staple: each (year, month) cell against the same month one year
    earlier (lag over the year axis within each month partition, which
    sidesteps calendar arithmetic entirely). Exact integer cents;
    growth is a quotient of identical bigints, NULL for the first
    year of each month as SQL defines.

    Scale shape: the fact table collapses to the (year, month) domain
    map-side; the lag window runs over ≤ years rows per month
    partition — bounded by the calendar, not data volume.
    """
    o = read_table(spark, sf_dir, "orders")
    cents = F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
    m = o.groupBy(
        F.year("o_orderdate").cast("int").alias("year"),
        F.month("o_orderdate").cast("int").alias("month"),
    ).agg(F.sum(cents).cast("bigint").alias("rev_c"))
    w = Window.partitionBy("month").orderBy("year")
    prev = F.lag("rev_c").over(w)
    return m.select(
        "year",
        "month",
        "rev_c",
        prev.cast("bigint").alias("prev_year_rev_c"),
        (
            (F.col("rev_c") - prev).cast("double") / prev.cast("double")
        ).alias("yoy_growth"),
    )


@query(
    "temporal_business_day_lag_histogram",
    oracle="""
    WITH d AS (
      SELECT CAST(datediff('day', DATE '1970-01-01',
                           CAST(o.o_orderdate AS DATE)) AS BIGINT) AS a,
             CAST(datediff('day', DATE '1970-01-01',
                           CAST(l.l_shipdate AS DATE)) AS BIGINT) AS b
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    w AS (
      SELECT ((b + 3) // 7) * 5 + least((b + 3) % 7, 5)
               - (((a + 3) // 7) * 5 + least((a + 3) % 7, 5)) AS bdays
      FROM d
    )
    SELECT CAST(bdays AS INT) AS business_days,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM w GROUP BY bdays
    """,
)
def temporal_business_day_lag_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Business-day fulfilment-lag histogram: weekdays elapsed between
    order date and line ship date, via the CLOSED-FORM weekday counter
    W(x) = ((x+3)//7)·5 + min((x+3)%7, 5) on epoch days (the +3 aligns
    Monday to index 0; epoch day 0 = Thursday) — no calendar table, no
    per-day explode, exact integers end to end. The SLA dashboards that
    promise '2 business days' read exactly this distribution.

    Scale shape: one orderkey equi-join (co-partitioned fact keys),
    two narrow integer expressions, one map-side-combinable groupBy on
    a ~100-value key; a calendar-table join or day-explode (the naive
    formulations) would multiply the fact table instead."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    a = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).cast("bigint")
    b = F.datediff(F.col("l_shipdate"), F.lit("1970-01-01")).cast("bigint")
    bdays = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(a.alias("a"), b.alias("b"))
        .select(F.expr(
            "((b + 3) DIV 7) * 5 + least((b + 3) % 7, 5)"
            " - (((a + 3) DIV 7) * 5 + least((a + 3) % 7, 5))"
        ).alias("bdays"))
    )
    return bdays.groupBy(
        F.col("bdays").cast("int").alias("business_days")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_lineitems"))


@query(
    "join_interval_overlap_bucketed",
    oracle="""
    WITH acts AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             MIN(CAST(epoch_us(ts) AS BIGINT)) AS a_start,
             MAX(CAST(epoch_us(ts) AS BIGINT)) AS a_end
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    errs AS (
      SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS h,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events WHERE event_type = 'error' GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nh,
             CAST(SUM(cnt) AS BIGINT) AS ne
      FROM errs
    ),
    wins AS (
      SELECT h * 3600000000 AS w_start, (h + 1) * 3600000000 AS w_end
      FROM errs, tot WHERE cnt * nh * 10 >= 15 * ne
    )
    SELECT a.user_id, a.d, w.w_start AS window_start_us,
           least(a.a_end, w.w_end) - greatest(a.a_start, w.w_start)
             AS overlap_us
    FROM acts a JOIN wins w
      ON a.a_start < w.w_end AND w.w_start < a.a_end
    WHERE least(a.a_end, w.w_end) - greatest(a.a_start, w.w_start) > 0
    """,
)
def join_interval_overlap_bucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Interval-overlap join the SCALABLE way: each per-(user, day)
    activity interval is exploded into the hour buckets it covers,
    error-burst windows (hours with ≥ 1.5x-mean error counts — an
    integer cross-multiplied, scale-invariant fence) live in exactly
    one bucket, and the join is an EQUI join on the bucket id with the
    exact strict-overlap residual after it. The DuckDB oracle runs the
    naive non-equi interval join — the differential proves the
    bucketing loses no pair and invents none (each positive-overlap
    pair shares exactly one bucket, since a window spans one bucket).

    Overlap lengths are exact int64 microseconds.

    Scale shape: the naive form is a BNLJ that dies at 100 TB; the
    bucketed form hash-partitions on the hour id — the standard
    time-bucket interval join (cf. range-join optimizations in
    warehouse engines). Bucket fan-out is bounded by interval span
    (≤ 24 hour-buckets per daily interval)."""
    H = 3600000000
    e = read_events(spark, sf_dir)
    us = F.unix_micros("ts")
    acts = e.groupBy(
        "user_id", F.col("ts").cast("date").alias("d")
    ).agg(
        F.min(us).alias("a_start"),
        F.max(us).alias("a_end"),
    )
    errs = (
        e.filter(F.col("event_type") == "error")
        .groupBy(F.expr(f"CAST(unix_micros(ts) AS BIGINT) DIV {H}").alias("h"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    tot = errs.agg(
        F.count(F.lit(1)).cast("bigint").alias("nh"),
        F.sum("cnt").cast("bigint").alias("ne"),
    )
    wins = (
        errs.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * F.col("nh") * 10 >= 15 * F.col("ne"))
        .select("h")
    )
    cand = acts.withColumn(
        "h",
        F.explode(
            F.sequence(
                F.expr(f"a_start DIV {H}"), F.expr(f"a_end DIV {H}")
            )
        ),
    ).join(wins, "h")
    w_start = F.col("h") * H
    w_end = (F.col("h") + 1) * H
    overlap = F.least(F.col("a_end"), w_end) - F.greatest(
        F.col("a_start"), w_start
    )
    return (
        cand.withColumn("overlap_us", overlap)
        .filter(F.col("overlap_us") > 0)
        .select(
            "user_id",
            "d",
            w_start.alias("window_start_us"),
            "overlap_us",
        )
    )


@query(
    "temporal_dow_hour_heatmap",
    oracle="""
    SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
           CAST(hour(ts) AS INT) AS hod,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM events
    GROUP BY 1, 2
    """,
)
def temporal_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap (counts + exact cent
    mass per cell) — the seasonality fingerprint behind staffing /
    batch-window decisions. The dow encoding is the classic
    cross-engine trap: DuckDB's dayofweek is 0=Sunday, Spark's is
    1=Sunday, so the oracle adds 1 (CLAUDE.md rule).

    Scale shape: one map-side-combinable groupBy to ≤ 7×24 cells —
    runs at scan speed at any scale."""
    e = read_events(spark, sf_dir)
    return e.groupBy(
        F.dayofweek("ts").cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(
            F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
        ).cast("bigint").alias("sum_cents"),
    )


# ---------------------------------------------------------------------------
# Dynamic-gap session windows: per-event inactivity timeout
# ---------------------------------------------------------------------------


@query(
    "stream_session_window_dynamic_gap",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id, epoch_us(ts) AS t,
             epoch_us(ts) + CASE WHEN event_type = 'purchase'
                                 THEN 3600000000 ELSE 900000000 END AS e
      FROM events
    ),
    f AS (
      SELECT user_id, ts, t, e, event_id,
             CASE WHEN MAX(e) OVER wprev IS NULL
                       OR t >= MAX(e) OVER wprev
                  THEN 1 ELSE 0 END AS new_s
      FROM g
      WINDOW wprev AS (PARTITION BY user_id ORDER BY t, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    s AS (
      SELECT user_id, ts, e,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM f
    )
    SELECT user_id, MIN(ts) AS session_start,
           make_timestamp(MAX(e)) AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def stream_session_window_dynamic_gap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming session windows with a DYNAMIC per-event gap: purchase
    events hold the session open 60 minutes, everything else 15 — the
    engagement-weighted sessionization ``session_window(ts, gap_expr)``
    exists for (a checkout should not be cut off by the browse
    timeout). State-store session merging is the same as the fixed-gap
    key; only the window length is data-dependent.

    Determinism: the batch oracle replays the merge rule exactly — a
    new session starts when an event's µs timestamp reaches the running
    MAX of prior (ts + own-gap) interval ends (Spark merges on interval
    OVERLAP, so the boundary comparison is >=); all integer µs with
    (ts, event_id) tie-broken order, session_end = max interval end via
    make_timestamp/timestamp_micros.

    Scale shape: state is per-user merged session intervals; the
    shuffle is the groupBy(user) the fixed-gap key already pays —
    the dynamic gap is a per-row expression, not extra state.
    """
    enable_nanos_as_long(spark)
    schema = read_table(spark, sf_dir, "events").schema

    def transform(stream):
        e = normalize_ts(stream, "ts")
        gap = F.when(
            F.col("event_type") == "purchase", F.lit("60 minutes")
        ).otherwise(F.lit("15 minutes"))
        return (
            e.withWatermark("ts", "60 minutes")
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events",
            )
        )

    return run_stream_to_table(
        spark, os.path.join(sf_dir, "events.parquet"), schema, transform
    )


# ---------------------------------------------------------------------------
# Timezone-aware day bucketing (IANA zones, not fixed offsets)
# ---------------------------------------------------------------------------


@query(
    "temporal_timezone_day_bucketing",
    oracle="""
    WITH z AS (
      SELECT * FROM (VALUES ('America/New_York'), ('Asia/Kolkata'),
                            ('UTC')) AS t(tz)
    ),
    loc AS (
      SELECT z.tz,
             CAST((e.ts AT TIME ZONE 'UTC') AT TIME ZONE z.tz AS DATE)
               AS local_day,
             CAST(CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS BIGINT) AS cents
      FROM events e, z
    )
    SELECT tz, local_day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM loc GROUP BY tz, local_day ORDER BY tz, local_day
    """,
)
def temporal_timezone_day_bucketing(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IANA-timezone day bucketing: the same UTC event stream rolled up
    to LOCAL calendar days in New York (DST zone, −5/−4), Kolkata
    (+5:30 half-hour offset — the case that breaks fixed-offset
    arithmetic), and UTC — the reporting-correctness surface every
    multi-region dashboard needs (a 'daily revenue' number is wrong for
    half the world if days are cut at UTC midnight). Both engines
    resolve zone rules from the IANA tzdb (`from_utc_timestamp` vs
    `AT TIME ZONE`), verified to agree across DST boundaries.

    Determinism: day assignment is exact integer µs + tzdb lookup;
    sums are exact cents.

    Scale shape: the 3-row zone dim broadcast cross-joins the scan
    (a per-row expression ×3, not a data blowup at the aggregate —
    output is days×zones); one map-side-combinable groupBy. Round 14:
    keyed :func:`spread` fans the 3x tzdb conversions + decimal cast
    off the single-row-group scan task (solo 0.77 -> 0.54s); plan
    no-op on multi-row-group layouts.
    """
    from ..operators.partitioning import spread

    ev = spread(
        read_events(spark, sf_dir).select("event_id", "ts", "value"),
        by=["event_id"],
    )
    zones = spark.createDataFrame(
        [("America/New_York",), ("Asia/Kolkata",), ("UTC",)], "tz string"
    )
    loc = ev.crossJoin(F.broadcast(zones)).select(
        "tz",
        F.from_utc_timestamp(F.col("ts"), F.col("tz"))
        .cast("date")
        .alias("local_day"),
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    return (
        loc.groupBy("tz", "local_day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )
        .orderBy("tz", "local_day")
    )


# ---------------------------------------------------------------------------
# ISO-week rollup: the week-boundary semantics that break naive reports
# ---------------------------------------------------------------------------


@query(
    "temporal_iso_week_rollup",
    oracle=f"""
    SELECT CAST(isoyear(o_orderdate) AS INT) AS iso_year,
           CAST(week(o_orderdate) AS INT) AS iso_week,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum('o_totalprice')} AS revenue
    FROM orders
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def temporal_iso_week_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-8601 week rollup with the ISO YEAR pairing — the
    cross-year-boundary semantics every weekly report gets wrong when
    it pairs weekofyear with the CALENDAR year (Jan 1 can belong to
    week 52 of the PREVIOUS iso-year, Dec 30 to week 1 of the NEXT;
    both engines' ISO rules verified to agree on exactly those
    boundary days). weekofyear/YEAROFWEEK vs week()/isoyear().

    Determinism: integer date-part extraction + exact decimal revenue.

    Scale shape: per-row date parts on the scan, one
    map-side-combinable groupBy onto ~365 (iso_year, week) rows.
    """
    from .registry import dsum

    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.expr("CAST(extract(YEAROFWEEK FROM o_orderdate) AS INT)")
            .alias("iso_year"),
            F.weekofyear("o_orderdate").cast("int").alias("iso_week"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
        .orderBy("iso_year", "iso_week")
    )
