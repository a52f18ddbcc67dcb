"""Statistical / profiling queries: histograms, order-statistic
quantiles + IQR outliers, per-group mode, percent ranks, Markov event
transitions, lag-1 autocorrelation, EWMA smoothing, and a blocked
fuzzy (edit-distance) self-join.

These are the column/series-statistics questions a data-quality or
feature-engineering pass asks of a 100 TB lake; the reference's scope
is the ingest bridge (`backend/main.py`), so these extend SURVEY §2.B
the same way the event-analytics family does.

Determinism strategy (CLAUDE.md rules, applied):
- every quantity that feeds a comparison or a hash is integer math
  (cents via DECIMAL(18,2)→BIGINT) or an identical-expression double on
  both engines (quotients/products of identical integers are bit-equal
  under IEEE round-to-nearest);
- order statistics are value-at-index (type-1 quantile), never
  interpolated — engines disagree on percentile_cont interpolation
  order, but "the k-th smallest value" is exact;
- integer division: operands are kept non-negative, where Spark's
  ``DIV`` (truncating) and DuckDB's ``//`` (flooring) agree;
- the EWMA fold is a left fold in (ts, event_id) order on both engines
  with the identical recurrence, rounded to 9 decimals (composed float).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet_io import read_events, read_table
from ..plans.pin import pin
from .registry import query

# Exact cents for a column that is exactly 2-decimal (events.value,
# l_extendedprice): decimal quantization is exact, the bigint is the
# true scaled integer.
def _cents(col: str) -> F.Column:
    return F.expr(f"CAST(CAST({col} AS DECIMAL(18,2)) * 100 AS BIGINT)")


_SQL_CENTS = "CAST(CAST({col} AS DECIMAL(18,2)) * 100 AS BIGINT)"


# ---------------------------------------------------------------------------
# Histogram with fixed bins
# ---------------------------------------------------------------------------

_HIST_LO = 90_000  # cents: $900.00 (observed price min is ~$900.68)
_HIST_W = 520_500  # cents per bin: ($105,000 - $900) / 20
_HIST_N = 20


@query(
    "histogram_price_fixed_bins",
    oracle=f"""
    WITH c AS (
      SELECT {_SQL_CENTS.format(col='l_extendedprice')} AS cents FROM lineitem
    )
    SELECT CAST((cents - {_HIST_LO}) // {_HIST_W} AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           MIN(cents) AS lo_cents, MAX(cents) AS hi_cents
    FROM c
    WHERE cents >= {_HIST_LO} AND cents < {_HIST_LO + _HIST_W * _HIST_N}
    GROUP BY 1
    """,
)
def histogram_price_fixed_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of lineitem prices over 20 fixed bins.

    Bin assignment is pure integer math on exact cents — no float
    boundary wobble, and Spark ``DIV`` == DuckDB ``//`` because the
    shifted value is kept non-negative by the range filter.

    Scale shape: one map-side-combinable groupBy on a 20-value key; the
    scan reads one column. Fixed (not data-dependent) bounds mean no
    extra pass to find min/max — the production pattern for dashboard
    histograms over append-only data.
    """
    li = read_table(spark, sf_dir, "lineitem")
    cents = _cents("l_extendedprice")
    return (
        li.select(cents.alias("cents"))
        .where(
            (F.col("cents") >= _HIST_LO)
            & (F.col("cents") < _HIST_LO + _HIST_W * _HIST_N)
        )
        .select(
            F.expr(f"CAST((cents - {_HIST_LO}) DIV {_HIST_W} AS INT)").alias(
                "bucket"
            ),
            F.col("cents"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Mode (most frequent value) per group, deterministic tie-break
# ---------------------------------------------------------------------------


@query(
    "agg_mode_per_user",
    oracle="""
    SELECT user_id, event_type AS mode_type, CAST(cnt AS BIGINT) AS cnt
    FROM (
      SELECT user_id, event_type, COUNT(*) AS cnt,
             row_number() OVER (
               PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type
             ) AS rn
      FROM events GROUP BY user_id, event_type
    ) WHERE rn = 1
    """,
)
def agg_mode_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-frequent event_type per user. Raw ``mode()`` breaks ties
    arbitrarily in both engines; ranking (count DESC, value ASC) makes
    the answer a function of the data.

    Scale shape: counts collapse the fact table first (map-side
    partials), then the window ranks the *aggregated* (user, type)
    pairs — cardinality ≈ users × |type|, tiny next to the raw events.
    """
    e = read_events(spark, sf_dir)
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("user_id").orderBy(F.desc("cnt"), F.asc("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), "cnt")
    )


# ---------------------------------------------------------------------------
# Percent rank within group
# ---------------------------------------------------------------------------


@query(
    "window_percent_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           percent_rank() OVER (
             PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
           ) AS pct_rank
    FROM customer
    """,
)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative standing of each customer's balance inside its market
    segment. ``percent_rank`` = (rank-1)/(n-1) — a quotient of
    identical small integers, so the doubles are bit-equal cross-engine
    without rounding; the custkey tie-break makes the ORDER BY a total
    order, so rank == row_number and the grouped PARALLEL range-shuffle
    ranking (operators/ranking.py) reconstructs percent_rank without
    funneling each segment through one task.
    """
    from ..operators.ranking import with_grouped_global_row_number

    c = read_table(spark, sf_dir, "customer")
    ranked = with_grouped_global_row_number(
        c,
        ["c_mktsegment"],
        ["c_acctbal", "c_custkey"],
        rn="__rn",
        n_col="__n",
    )
    return ranked.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.when(
            F.col("__n") > 1,
            (F.col("__rn") - 1).cast("double") / (F.col("__n") - 1).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("pct_rank"),
    )


# ---------------------------------------------------------------------------
# IQR outlier detection via order statistics (type-1 quantiles)
# ---------------------------------------------------------------------------


@query(
    "outlier_iqr_price",
    oracle=f"""
    WITH c AS (
      SELECT l_returnflag AS grp,
             {_SQL_CENTS.format(col='l_extendedprice')} AS cents
      FROM lineitem
    ),
    ranked AS (
      SELECT grp, cents,
             row_number() OVER (PARTITION BY grp ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY grp) AS n
      FROM c
    ),
    q AS (
      SELECT grp, CAST(MAX(n) AS BIGINT) AS n,
             MAX(CASE WHEN rn = (n - 1) // 4 + 1 THEN cents END) AS q1_cents,
             MAX(CASE WHEN rn = (3 * (n - 1)) // 4 + 1 THEN cents END) AS q3_cents
      FROM ranked GROUP BY grp
    )
    SELECT c.grp, MAX(q.n) AS n, MAX(q.q1_cents) AS q1_cents,
           MAX(q.q3_cents) AS q3_cents,
           CAST(SUM(CASE WHEN 2 * c.cents < 5 * q.q1_cents - 3 * q.q3_cents
                           OR 2 * c.cents > 5 * q.q3_cents - 3 * q.q1_cents
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM c JOIN q ON c.grp = q.grp
    GROUP BY c.grp
    """,
)
def outlier_iqr_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier counts per return flag: Q1/Q3 as exact
    value-at-index order statistics (index ``(n-1)//4``, the type-1
    quantile — no interpolation, so no cross-engine float drift), fences
    compared in doubled-cents integer math (``2x < 5·q1 − 3·q3`` ⟺
    ``x < q1 − 1.5·IQR``).

    Scale shape: ranking per group runs through the PARALLEL grouped
    range-shuffle operator (operators/ranking.py
    with_grouped_global_row_number) — a plain
    ``Window.partitionBy(grp)`` funnels each 3-way group's entire row
    set through ONE task, serial at 100x; the 3-row quartile table
    broadcasts back onto the scan.
    """
    from ..operators.partitioning import spread
    from ..operators.ranking import with_grouped_global_row_number

    li = read_table(spark, sf_dir, "lineitem")
    # Round 14: spread the raw projection keyed by the cheap bigint
    # l_orderkey — both branches (the ranking's range-shuffle map side
    # and the fence rejoin) otherwise run their map work, including
    # the decimal->cents cast, inside the single-row-group scan task
    # (solo 1.61 -> 1.44s); identical exchanges dedupe via reuse.
    c = spread(
        li.select("l_orderkey", "l_returnflag", "l_extendedprice"),
        by=["l_orderkey"],
    ).select(
        F.col("l_returnflag").alias("grp"),
        _cents("l_extendedprice").alias("cents"),
    )
    ranked = with_grouped_global_row_number(
        c, ["grp"], ["cents"], rn="rn", n_col="n"
    )
    q = ranked.groupBy("grp").agg(
        F.max("n").alias("n"),
        F.max(
            F.when(F.col("rn") == F.expr("(n - 1) DIV 4 + 1"), F.col("cents"))
        ).alias("q1_cents"),
        F.max(
            F.when(F.col("rn") == F.expr("(3 * (n - 1)) DIV 4 + 1"), F.col("cents"))
        ).alias("q3_cents"),
    )
    joined = c.join(F.broadcast(q), "grp")
    return joined.groupBy("grp").agg(
        F.max("n").alias("n"),
        F.max("q1_cents").alias("q1_cents"),
        F.max("q3_cents").alias("q3_cents"),
        F.sum(
            F.when(
                (2 * F.col("cents") < 5 * F.col("q1_cents") - 3 * F.col("q3_cents"))
                | (2 * F.col("cents") > 5 * F.col("q3_cents") - 3 * F.col("q1_cents")),
                1,
            ).otherwise(0)
        ).alias("n_outliers"),
    )


# ---------------------------------------------------------------------------
# Markov transition matrix over event sequences
# ---------------------------------------------------------------------------


@query(
    "events_markov_transitions",
    oracle="""
    WITH pairs AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS to_type
      FROM events
    ),
    agg AS (
      SELECT from_type, to_type, COUNT(*) AS cnt
      FROM pairs WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, CAST(cnt AS BIGINT) AS cnt,
           CAST(cnt AS DOUBLE)
             / CAST(SUM(cnt) OVER (PARTITION BY from_type) AS DOUBLE) AS prob
    FROM agg
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user event sequences:
    P(next = to | current = from). The probability is a quotient of
    identical bigints on both engines — bit-equal, no rounding needed.

    Scale shape: the lead() window shuffles the events once on user_id
    (sequences are per-user, so partitions are independent); the
    transition matrix is |type|² rows, and its normalizing window runs
    on that tiny aggregate.
    """
    e = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
    )
    agg = pairs.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("cnt"))
    wt = Window.partitionBy("from_type")
    return agg.select(
        "from_type",
        "to_type",
        "cnt",
        (
            F.col("cnt").cast("double") / F.sum("cnt").over(wt).cast("double")
        ).alias("prob"),
    )


# ---------------------------------------------------------------------------
# Lag-1 autocorrelation from exact integer moments
# ---------------------------------------------------------------------------


@query(
    "events_autocorr_lag1",
    oracle="""
    WITH x AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS xc,
             lead(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
             ) AS yc
      FROM events
    ),
    m AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(xc) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(yc) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(xc AS DECIMAL(18,0)) * yc) AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(CAST(xc AS DECIMAL(18,0)) * xc) AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(CAST(yc AS DECIMAL(18,0)) * yc) AS DECIMAL(38,0)) AS syy
      FROM x WHERE yc IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)) AS autocorr
    FROM m
    """,
)
def events_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the value series per event type (is the
    series trending or mean-reverting?). Pearson r over (x_i, x_{i+1})
    pairs, computed from EXACT integer moments (cents as bigints,
    moment sums in DECIMAL(38,0)); the only float ops are the final
    identical-expression casts/divide/sqrt on identical integers, so
    the doubles agree bit-for-bit cross-engine.

    Scale shape (round-6 replan — ONE full-data pass, one job): lag
    pairing rides :func:`operators.ranking.grouped_adjacent_pair_moments`
    — one range shuffle on (type, ts, id), an Arrow-batched mapInPandas
    emitting O(P·|type|) exact int64 pair-moment partials + edge rows,
    boundary pairs stitched on the ≤P-row edge frame, DECIMAL(38,0)
    combine. No pinned two-pass ranking, no self-join, no per-type
    single-task sort — replaces the round-5 rank+join plan (two extra
    jobs + two hash exchanges of the full frame; ~2x faster at sf0.1
    and one full-data pass at any scale). See the operator docstring
    for the int64 overflow guard and the pin rationale.
    """
    e = read_events(spark, sf_dir)
    from ..operators.ranking import grouped_adjacent_pair_moments

    base = e.select(
        "event_type", _cents("value").alias("xc"), "ts", "event_id"
    )
    m = grouped_adjacent_pair_moments(
        base, "event_type", ["ts", "event_id"], "xc"
    )
    return m.select(
        "event_type",
        F.col("n").alias("n_pairs"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                    "double"
                )
            )
        ).alias("autocorr"),
    )


# ---------------------------------------------------------------------------
# EWMA (exponentially-weighted moving average), final value per user
# ---------------------------------------------------------------------------


@query(
    "events_ewma_per_user",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(list_reduce(list(value ORDER BY ts, event_id),
                             (acc, x) -> acc * 0.9 + x * 0.1), 9) AS ewma
    FROM events GROUP BY user_id
    """,
)
def events_ewma_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final EWMA (α = 0.1) of each user's value series — the classic
    streaming smoother, evaluated as an exact left fold in (ts,
    event_id) order on both engines: DuckDB ``list_reduce`` over an
    ordered list, Spark ``F.aggregate`` over a sorted struct array.
    Identical recurrence ⇒ identical doubles; rounded to 9 decimals as
    composed-float hygiene.

    Scale shape: one shuffle on user_id; per-user sequences are short
    (bounded by user activity, not table size), so the collect_list is
    a per-group array, never a driver collect. For unbounded sequences
    the streaming engine's stateful variant (stream_stateful_running_max
    pattern) is the production path.
    """
    e = read_events(spark, sf_dir)
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("value")))
    )
    fold = F.aggregate(
        arr,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x["value"]).otherwise(
            acc * F.lit(0.9) + x["value"] * F.lit(0.1)
        ),
    )
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(fold, 9).alias("ewma"),
        )
    )


# ---------------------------------------------------------------------------
# Blocked fuzzy self-join on edit distance
# ---------------------------------------------------------------------------


@query(
    "fuzzy_join_levenshtein",
    oracle="""
    SELECT a.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MIN(levenshtein(a.p_name, b.p_name)) AS BIGINT) AS min_dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_size = b.p_size
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 15
    GROUP BY a.p_brand
    """,
)
def fuzzy_join_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy duplicate candidates among part names: pairs within edit
    distance 15, blocked on (brand, size) so the join is an equi-join
    with a codegen levenshtein filter — never an all-pairs product.
    Both engines implement classic Levenshtein (unit costs), so the
    distances and integer aggregates match exactly.

    Scale shape: the blocking key bounds each hash-join bucket to one
    (brand, size) group; pair work grows with Σ block² — the standard
    entity-resolution trade (pick blocks so the quadratic term stays
    local and bounded, here ≤ ~30 rows per block at sf0.1).
    """
    p = read_table(spark, sf_dir, "part")
    a = p.select(
        F.col("p_brand"),
        F.col("p_size"),
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
    )
    b = p.select(
        F.col("p_brand"),
        F.col("p_size"),
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
    )
    pairs = (
        a.join(b, ["p_brand", "p_size"])
        .where(F.col("key_a") < F.col("key_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("dist") <= 15)
    )
    return pairs.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("dist").cast("bigint").alias("min_dist"),
    )


# ---------------------------------------------------------------------------
# Z-score anomaly counts in exact integer math
# ---------------------------------------------------------------------------


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH c AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS xc
      FROM events
    ),
    m AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(xc) AS DECIMAL(38,0)) AS s,
             CAST(SUM(CAST(xc AS DECIMAL(18,0)) * xc) AS DECIMAL(38,0)) AS ss
      FROM c GROUP BY event_type
    )
    SELECT c.event_type, CAST(MAX(m.n) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN
                 (m.n * c.xc - m.s) * (m.n * c.xc - m.s)
                   > 9 * (m.n * m.ss - m.s * m.s)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM c JOIN m ON c.event_type = m.event_type
    GROUP BY c.event_type
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count |z| > 3 anomalies per event type WITHOUT any float math:
    z² > 9 ⟺ (n·x − S)² > 9·(n·SS − S²) over exact cents, with moment
    products in DECIMAL(38,0) (the cross term n·SS·9 overflows int64
    past ~10⁵ rows/group — the decimal width is the 100 TB headroom).
    A float z-score wobbles for points sitting exactly on the fence;
    integer cross-multiplication cannot (CLAUDE.md threshold rule).

    Scale shape: moments are one map-side-combinable pass to |type|
    rows; the 5-row moment table broadcasts back onto the scan for the
    fence test — the fact table moves zero times.
    """
    e = read_events(spark, sf_dir)
    c = e.select("event_type", _cents("value").alias("xc"))
    m = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xc").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("xc").cast("decimal(18,0)") * F.col("xc"))
        .cast("decimal(38,0)")
        .alias("ss"),
    )
    j = c.join(F.broadcast(m), "event_type")
    dev = F.col("n") * F.col("xc") - F.col("s")
    fence = dev * dev > 9 * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
    return j.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum(F.when(fence, 1).otherwise(0)).alias("n_anomalies"),
    )


# ---------------------------------------------------------------------------
# Time-weighted average price (TWAP)
# ---------------------------------------------------------------------------


@query(
    "events_twap_per_user",
    oracle="""
    WITH seg AS (
      SELECT user_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS xc,
             lead(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) - epoch_us(ts) AS dt_us
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(CAST(SUM(CAST(xc AS DECIMAL(18,0)) * dt_us) AS DECIMAL(38,0))
                AS DOUBLE)
             / CAST(CAST(SUM(dt_us) AS DECIMAL(38,0)) AS DOUBLE)
             / 100.0 AS twap
    FROM seg WHERE dt_us IS NOT NULL AND dt_us > 0
    GROUP BY user_id
    """,
)
def events_twap_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of each user's value series: each
    observation is weighted by how long it remained current
    (hold-until-next-event segments — the standard TWAP/TVWAP over
    irregular ticks). Numerator and denominator accumulate as EXACT
    integers (cents × microseconds in DECIMAL(38,0) — the per-row
    product alone can pass 10^17), and only the final identical
    division chain runs in doubles.

    Scale shape: one shuffle on user_id for the lead() window, then a
    map-side-combinable aggregation on the same key — Catalyst reuses
    the window's partitioning, so the fact table moves once.
    """
    e = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = (
        e.select(
            "user_id",
            _cents("value").alias("xc"),
            F.unix_micros(F.col("ts")).alias("us"),
            "ts",
            "event_id",
        )
        .withColumn("dt_us", F.lead("us").over(w) - F.col("us"))
        .where(F.col("dt_us").isNotNull() & (F.col("dt_us") > 0))
    )
    return seg.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        (
            F.sum(F.col("xc").cast("decimal(18,0)") * F.col("dt_us"))
            .cast("decimal(38,0)")
            .cast("double")
            / F.sum("dt_us").cast("decimal(38,0)").cast("double")
            / F.lit(100.0)
        ).alias("twap"),
    )


# ---------------------------------------------------------------------------
# Bitwise scalar function surface
# ---------------------------------------------------------------------------


@query(
    "scalar_bitwise_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS band,
           o_orderkey | 4096 AS bor,
           CAST(xor(o_orderkey, 1023) AS BIGINT) AS bxor,
           (o_orderkey & 255) << 4 AS shl,
           o_orderkey >> 3 AS shr,
           CAST(bit_count(o_orderkey) AS INT) AS popcnt
    FROM orders WHERE o_orderkey < 1000
    """,
)
def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator surface (AND/OR/XOR/shifts/popcount) — the ops
    hash-partitioners, bloom filters, and bitmap indexes are made of.
    Pure integer in, integer out; the shift operand is pre-masked so
    results stay far from the int64 edge on both engines.
    """
    o = read_table(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            F.expr("o_orderkey & 255").alias("band"),
            F.expr("o_orderkey | 4096").alias("bor"),
            F.expr("o_orderkey ^ 1023").cast("bigint").alias("bxor"),
            F.expr("shiftleft(o_orderkey & 255, 4)").cast("bigint").alias("shl"),
            F.expr("shiftright(o_orderkey, 3)").alias("shr"),
            F.expr("bit_count(o_orderkey)").cast("int").alias("popcnt"),
        )
    )


# ---------------------------------------------------------------------------
# Gaps-and-islands: longest consecutive-day activity streak
# ---------------------------------------------------------------------------


@query(
    "events_longest_streak",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    seq AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY day
             ) AS INT) AS island
      FROM daily
    ),
    runs AS (
      SELECT user_id, island, COUNT(*) AS run_len
      FROM seq GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(MAX(run_len) AS BIGINT) AS longest_streak,
           CAST(SUM(run_len) AS BIGINT) AS n_active_days
    FROM runs GROUP BY user_id
    """,
)
def events_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of consecutive active days per user — the classic
    gaps-and-islands pattern: ``day − row_number(day)`` is constant
    exactly within a consecutive run, so runs reduce to a groupBy on
    that island key. Pure date/integer math end to end.

    Scale shape: the DISTINCT collapses the fact table to (user, day)
    first; window + both aggregations share the user_id partitioning,
    so the post-distinct data shuffles once.
    """
    e = read_events(spark, sf_dir)
    daily = e.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    seq = daily.withColumn(
        "island", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    runs = seq.groupBy("user_id", "island").agg(F.count(F.lit(1)).alias("run_len"))
    return runs.groupBy("user_id").agg(
        F.max("run_len").alias("longest_streak"),
        F.sum("run_len").cast("bigint").alias("n_active_days"),
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation (exact, from integer rank moments)
# ---------------------------------------------------------------------------


@query(
    "agg_spearman_corr",
    oracle=f"""
    WITH c AS (
      SELECT l_returnflag AS grp,
             {_SQL_CENTS.format(col='l_extendedprice')} AS px,
             {_SQL_CENTS.format(col='l_quantity')} AS qy
      FROM lineitem
    ),
    r AS (
      SELECT grp,
             2 * rank() OVER (PARTITION BY grp ORDER BY px)
               + COUNT(*) OVER (PARTITION BY grp, px) - 1 AS r2x,
             2 * rank() OVER (PARTITION BY grp ORDER BY qy)
               + COUNT(*) OVER (PARTITION BY grp, qy) - 1 AS r2y,
             COUNT(*) OVER (PARTITION BY grp) AS n
      FROM c
    ),
    u AS (
      SELECT grp, n, r2x - (n + 1) AS ux, r2y - (n + 1) AS uy FROM r
    )
    SELECT grp, CAST(MAX(n) AS BIGINT) AS n,
           CAST(CAST(SUM(ux * uy) AS BIGINT) AS DOUBLE)
             / sqrt(CAST(CAST(SUM(ux * ux) AS BIGINT) AS DOUBLE)
                    * CAST(CAST(SUM(uy * uy) AS BIGINT) AS DOUBLE))
             AS spearman_rho
    FROM u GROUP BY grp
    """,
)
def agg_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-aware Spearman rank correlation of price vs quantity per
    return flag. lineitem has NO unique key (duplicate (orderkey,
    linenumber) pairs exist), so row_number ranks are engine-arbitrary
    under ties — instead each row gets its AVERAGE rank, doubled to
    stay integer (r2 = 2·rank_min + ties − 1), which is a function of
    the VALUE alone. Centering by the exact mean (n+1) makes ΣuΣv
    vanish, so rho = Σuv/√(Σu²·Σv²) needs only bigint sums (≤ n³/3 ≈
    2.7·10^15 at sf0.1; fits int64 through ~sf1) and one identical
    float expression — no decimal products (their 38-digit cap rounds
    per-engine in the last ulp; learned from the first draft).

    Scale shape: two ranking windows on the same 3-value partition key
    plus per-value tie counts (same shuffle), then map-side-combinable
    moments.
    """
    li = read_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_returnflag").alias("grp"),
        _cents("l_extendedprice").alias("px"),
        _cents("l_quantity").alias("qy"),
    )
    wx = Window.partitionBy("grp").orderBy("px")
    wy = Window.partitionBy("grp").orderBy("qy")
    r = base.select(
        "grp",
        (
            2 * F.rank().over(wx)
            + F.count(F.lit(1)).over(Window.partitionBy("grp", "px"))
            - 1
        ).alias("r2x"),
        (
            2 * F.rank().over(wy)
            + F.count(F.lit(1)).over(Window.partitionBy("grp", "qy"))
            - 1
        ).alias("r2y"),
        F.count(F.lit(1)).over(Window.partitionBy("grp")).alias("n"),
    )
    u = r.select(
        "grp",
        "n",
        (F.col("r2x") - (F.col("n") + 1)).alias("ux"),
        (F.col("r2y") - (F.col("n") + 1)).alias("uy"),
    )
    m = u.groupBy("grp").agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum(F.col("ux") * F.col("uy")).cast("bigint").alias("suv"),
        F.sum(F.col("ux") * F.col("ux")).cast("bigint").alias("su2"),
        F.sum(F.col("uy") * F.col("uy")).cast("bigint").alias("sv2"),
    )
    return m.select(
        "grp",
        "n",
        (
            F.col("suv").cast("double")
            / F.sqrt(F.col("su2").cast("double") * F.col("sv2").cast("double"))
        ).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# Chi-square test of independence (event type × day of week)
# ---------------------------------------------------------------------------


@query(
    "events_chi_square_independence",
    oracle="""
    WITH o AS (
      SELECT event_type, dayofweek(CAST(ts AS DATE)) + 1 AS dow,
             COUNT(*) AS observed
      FROM events GROUP BY event_type, dayofweek(CAST(ts AS DATE)) + 1
    ),
    tot AS (
      SELECT event_type, dow, observed,
             CAST(SUM(observed) OVER (PARTITION BY event_type) AS BIGINT)
               AS row_total,
             CAST(SUM(observed) OVER (PARTITION BY dow) AS BIGINT) AS col_total,
             CAST(SUM(observed) OVER () AS BIGINT) AS grand_total
      FROM o
    )
    SELECT event_type, CAST(dow AS INT) AS dow,
           CAST(observed AS BIGINT) AS observed,
           CAST(row_total * col_total AS DOUBLE)
             / CAST(grand_total AS DOUBLE) AS expected,
           (CAST(observed AS DOUBLE)
              - CAST(row_total * col_total AS DOUBLE)
                / CAST(grand_total AS DOUBLE))
           * (CAST(observed AS DOUBLE)
              - CAST(row_total * col_total AS DOUBLE)
                / CAST(grand_total AS DOUBLE))
           / (CAST(row_total * col_total AS DOUBLE)
              / CAST(grand_total AS DOUBLE)) AS chi2_term
    FROM tot
    """,
)
def events_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square contingency terms for event_type × day-of-week: is
    event mix independent of weekday? Emits observed, expected
    (row·col/grand, an identical-expression double over identical
    bigints), and each cell's (O−E)²/E contribution — summing the
    column gives the test statistic; per-cell terms localize WHERE the
    independence breaks. Day-of-week is aligned to Spark's 1=Sunday
    convention (DuckDB's ``dayofweek`` is 0-based — the oracle adds 1).

    Scale shape: the contingency table is one map-side-combinable
    groupBy; the three marginal windows run over the |types|×7 cells.
    """
    e = read_events(spark, sf_dir)
    o = (
        e.select(
            "event_type",
            F.dayofweek(F.col("ts").cast("date")).alias("dow"),
        )
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    tot = o.select(
        "event_type",
        "dow",
        "observed",
        F.sum("observed").over(Window.partitionBy("event_type")).alias("row_total"),
        F.sum("observed").over(Window.partitionBy("dow")).alias("col_total"),
        F.sum("observed").over(Window.partitionBy()).alias("grand_total"),
    )
    expected = (F.col("row_total") * F.col("col_total")).cast("double") / F.col(
        "grand_total"
    ).cast("double")
    dev = F.col("observed").cast("double") - expected
    return tot.select(
        "event_type",
        F.col("dow").cast("int").alias("dow"),
        "observed",
        expected.alias("expected"),
        (dev * dev / expected).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit distribution (fraud/quality screen)
# ---------------------------------------------------------------------------


@query(
    "histogram_benford_first_digit",
    oracle="""
    WITH d AS (
      SELECT CAST(substring(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
               AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice > 0
    )
    SELECT digit, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS share,
           ln(1.0 + 1.0 / digit) / ln(10.0) AS benford_expected
    FROM d GROUP BY digit
    """,
)
def histogram_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screen on order totals: observed first-significant-
    digit shares next to the log10(1+1/d) expectation — the classic
    anomaly/fraud sniff test for financial columns. The digit is
    extracted from the exact cents integer's decimal string (identical
    cross-engine; no float log in the digit path), and share/expected
    are identical float expressions.

    Scale shape: map-side-combinable groupBy onto 9 digit rows; the
    share window runs over those 9 rows.
    """
    o = read_table(spark, sf_dir, "orders")
    digit = F.expr(
        "CAST(substring(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
        " AS BIGINT) AS STRING), 1, 1) AS INT)"
    )
    d = o.where(F.col("o_totalprice") > 0).select(digit.alias("digit"))
    agg = d.groupBy("digit").agg(F.count(F.lit(1)).alias("cnt"))
    return agg.select(
        "digit",
        "cnt",
        (
            F.col("cnt").cast("double")
            / F.sum("cnt").over(Window.partitionBy()).cast("bigint").cast("double")
        ).alias("share"),
        (F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))).alias(
            "benford_expected"
        ),
    )


# ---------------------------------------------------------------------------
# Decile table per group (order statistics, generalizing the IQR query)
# ---------------------------------------------------------------------------


@query(
    "quantile_deciles_price",
    oracle=f"""
    WITH c AS (
      SELECT l_returnflag AS grp,
             {_SQL_CENTS.format(col='l_extendedprice')} AS cents
      FROM lineitem
    ),
    ranked AS (
      SELECT grp, cents,
             row_number() OVER (PARTITION BY grp ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY grp) AS n
      FROM c
    ),
    marks AS (
      SELECT grp, d.decile,
             (d.decile * (n - 1)) // 10 + 1 AS target_rn
      FROM (SELECT DISTINCT grp, n FROM ranked) g,
           (SELECT unnest(generate_series(1, 9)) AS decile) d
    )
    SELECT m.grp, CAST(m.decile AS INT) AS decile, r.cents AS value_cents
    FROM marks m JOIN ranked r
      ON r.grp = m.grp AND r.rn = m.target_rn
    """,
)
def quantile_deciles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nine deciles per return flag as exact value-at-index order
    statistics (rank (d·(n−1))//10 + 1) — the full distribution
    profile the IQR query samples at two points. No interpolation, so
    no cross-engine drift; the decile grid is generated, never scanned.

    Scale shape: the grouped PARALLEL range-shuffle ranking
    (operators/ranking.py — no per-group single-task sort), then a
    broadcast join of the 9·|grp| marks back onto the ranked rows.
    """
    from ..operators.partitioning import spread
    from ..operators.ranking import with_grouped_global_row_number

    li = read_table(spark, sf_dir, "lineitem")
    # Round 14: spread keyed by the cheap bigint l_orderkey — the
    # ranking's map side and the cents cast otherwise run inside the
    # single-row-group scan task (solo 1.74 -> 1.20s).
    c = spread(
        li.select("l_orderkey", "l_returnflag", "l_extendedprice"),
        by=["l_orderkey"],
    ).select(
        F.col("l_returnflag").alias("grp"),
        _cents("l_extendedprice").alias("cents"),
    )
    ranked = with_grouped_global_row_number(
        c, ["grp"], ["cents"], rn="rn", n_col="n"
    )
    g = ranked.select("grp", "n").distinct()
    deciles = spark.range(1, 10).select(F.col("id").cast("int").alias("decile"))
    marks = g.crossJoin(deciles).select(
        F.col("grp").alias("m_grp"),
        "decile",
        (F.expr("(decile * (n - 1)) DIV 10") + 1).alias("target_rn"),
    )
    return (
        ranked.join(
            F.broadcast(marks),
            (ranked.grp == marks.m_grp) & (ranked.rn == marks.target_rn),
        )
        .select("grp", "decile", F.col("cents").alias("value_cents"))
    )


# ---------------------------------------------------------------------------
# Inter-arrival median per user (order statistic over computed gaps)
# ---------------------------------------------------------------------------


@query(
    "events_interarrival_median",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             lead(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) - epoch_us(ts) AS dt_us
      FROM events
    ),
    ranked AS (
      SELECT user_id, dt_us,
             row_number() OVER (PARTITION BY user_id ORDER BY dt_us) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM gaps WHERE dt_us IS NOT NULL
    )
    SELECT user_id, CAST(MAX(n) AS BIGINT) AS n_gaps,
           MAX(CASE WHEN rn = (n - 1) // 2 + 1 THEN dt_us END) AS median_gap_us
    FROM ranked GROUP BY user_id
    """,
)
def events_interarrival_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median time between consecutive events per user (type-1 order
    statistic over exact microsecond gaps) — the cadence feature
    behind churn/engagement models, immune to the outlier gaps that
    wreck a mean. Gap values are integers; the median is value-at-
    index, so both engines agree exactly.

    Scale shape: the lead() window and both the ranking window and the
    final aggregate share the user_id partitioning — one shuffle.
    """
    e = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        e.select("user_id", F.unix_micros(F.col("ts")).alias("us"), "ts", "event_id")
        .withColumn("dt_us", F.lead("us").over(w) - F.col("us"))
        .where(F.col("dt_us").isNotNull())
    )
    wr = Window.partitionBy("user_id").orderBy("dt_us")
    ranked = gaps.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("user_id"))
    )
    return ranked.groupBy("user_id").agg(
        F.max("n").cast("bigint").alias("n_gaps"),
        F.max(
            F.when(F.col("rn") == F.expr("(n - 1) DIV 2 + 1"), F.col("dt_us"))
        ).alias("median_gap_us"),
    )


# ---------------------------------------------------------------------------
# DAU / WAU rolling engagement ratio
# ---------------------------------------------------------------------------


@query(
    "events_dau_wau_ratio",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    dau AS (
      SELECT day, COUNT(*) AS dau FROM active GROUP BY day
    ),
    spread AS (
      SELECT user_id,
             CAST(day + CAST(unnest(generate_series(0, 6)) AS INT) AS DATE)
               AS obs_day
      FROM active
    ),
    wau AS (
      SELECT obs_day AS day, COUNT(DISTINCT user_id) AS wau
      FROM spread GROUP BY obs_day
    )
    SELECT d.day, CAST(d.dau AS BIGINT) AS dau, CAST(w.wau AS BIGINT) AS wau,
           CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE) AS stickiness
    FROM dau d JOIN wau w ON d.day = w.day
    """,
)
def events_dau_wau_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users over trailing-7-day weekly actives (the
    "stickiness" engagement metric). Windowed COUNT(DISTINCT) isn't
    directly expressible, so each (user, active day) pair is spread
    onto the 7 observation days it supports and distinct-counted per
    day — a 7× linear fan-out instead of a quadratic self-join, and
    the exact-count twin of the mergeable-HLL sketch rollup
    (agg_sketch_mergeable_distinct) for when approximate won't do.
    Integer counts; the ratio is an identical bigint quotient.

    Scale shape: DISTINCT collapses the fact table first; the fan-out
    multiplies the small (user, day) set, not raw events; days with
    DAU but a 7-day window truncated at the data's start still count
    (both engines enumerate the same grid).
    """
    e = read_events(spark, sf_dir)
    active = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    dau = active.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    spread = active.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        "day",
    ).select("user_id", F.date_add(F.col("day"), F.col("off")).alias("day"))
    wau = spread.groupBy("day").agg(F.count_distinct("user_id").alias("wau"))
    return (
        dau.join(wau, "day")
        .select(
            "day",
            F.col("dau").cast("bigint").alias("dau"),
            F.col("wau").cast("bigint").alias("wau"),
            (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
                "stickiness"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Winsorized mean (robust preprocessing: clamp to [p5, p95])
# ---------------------------------------------------------------------------


@query(
    "outlier_winsorized_mean",
    oracle=f"""
    WITH c AS (
      SELECT l_returnflag AS grp,
             {_SQL_CENTS.format(col='l_extendedprice')} AS cents
      FROM lineitem
    ),
    ranked AS (
      SELECT grp, cents,
             row_number() OVER (PARTITION BY grp ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY grp) AS n
      FROM c
    ),
    fences AS (
      SELECT grp, CAST(MAX(n) AS BIGINT) AS n,
             MAX(CASE WHEN rn = (5 * (n - 1)) // 100 + 1 THEN cents END)
               AS p5_cents,
             MAX(CASE WHEN rn = (95 * (n - 1)) // 100 + 1 THEN cents END)
               AS p95_cents
      FROM ranked GROUP BY grp
    )
    SELECT c.grp, MAX(f.n) AS n, MAX(f.p5_cents) AS p5_cents,
           MAX(f.p95_cents) AS p95_cents,
           CAST(SUM(least(greatest(c.cents, f.p5_cents), f.p95_cents))
                AS BIGINT) AS winsorized_sum_cents,
           CAST(SUM(CASE WHEN c.cents < f.p5_cents
                          OR c.cents > f.p95_cents
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped
    FROM c JOIN fences f ON c.grp = f.grp
    GROUP BY c.grp
    """,
)
def outlier_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — the robust-preprocessing sibling of the IQR
    count: clamp every value into [p5, p95] (exact value-at-index
    percentiles) and report the clamped sum + how many rows were
    clamped. All integer: the winsorized mean downstream is
    winsorized_sum_cents / n / 100 with no float accumulation.

    Scale shape: identical to outlier_iqr_price — the grouped PARALLEL
    range-shuffle ranking (no per-group single-task sort), 3-row fence
    table broadcast back onto the scan.
    """
    from ..operators.partitioning import spread
    from ..operators.ranking import with_grouped_global_row_number

    li = read_table(spark, sf_dir, "lineitem")
    # Round 14: same spread as outlier_iqr_price — fan both branches'
    # map work (decimal->cents cast included) off the single-row-group
    # scan, keyed by the cheap bigint (solo 1.52 -> 1.22s).
    c = spread(
        li.select("l_orderkey", "l_returnflag", "l_extendedprice"),
        by=["l_orderkey"],
    ).select(
        F.col("l_returnflag").alias("grp"),
        _cents("l_extendedprice").alias("cents"),
    )
    ranked = with_grouped_global_row_number(
        c, ["grp"], ["cents"], rn="rn", n_col="n"
    )
    fences = ranked.groupBy("grp").agg(
        F.max("n").cast("bigint").alias("n"),
        F.max(
            F.when(F.col("rn") == F.expr("(5 * (n - 1)) DIV 100 + 1"), F.col("cents"))
        ).alias("p5_cents"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(95 * (n - 1)) DIV 100 + 1"), F.col("cents")
            )
        ).alias("p95_cents"),
    )
    j = c.join(F.broadcast(fences), "grp")
    clamped = F.least(F.greatest(F.col("cents"), F.col("p5_cents")), F.col("p95_cents"))
    return j.groupBy("grp").agg(
        F.max("n").alias("n"),
        F.max("p5_cents").alias("p5_cents"),
        F.max("p95_cents").alias("p95_cents"),
        F.sum(clamped).cast("bigint").alias("winsorized_sum_cents"),
        F.sum(
            F.when(
                (F.col("cents") < F.col("p5_cents"))
                | (F.col("cents") > F.col("p95_cents")),
                1,
            ).otherwise(0)
        ).alias("n_clamped"),
    )


# ---------------------------------------------------------------------------
# Weighted average (exact integer numerator/denominator)
# ---------------------------------------------------------------------------


@query(
    "agg_weighted_avg",
    oracle=f"""
    WITH c AS (
      SELECT l_returnflag AS grp,
             {_SQL_CENTS.format(col='l_extendedprice')} AS price_c,
             {_SQL_CENTS.format(col='l_quantity')} AS qty_c
      FROM lineitem
    )
    SELECT grp,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(price_c AS DECIMAL(18,0)) * qty_c)
                     AS DECIMAL(38,0)) AS DOUBLE)
             / CAST(CAST(SUM(qty_c) AS DECIMAL(38,0)) AS DOUBLE) / 100.0
             AS qty_weighted_avg_price
    FROM c GROUP BY grp
    """,
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per return flag: numerator and
    denominator accumulate as exact integers (cents × quantity-cents
    in DECIMAL(38,0) headroom), with one identical division chain at
    the end — the aggregation AVG can't express without float drift.

    Scale shape: one map-side-combinable pass.
    """
    li = read_table(spark, sf_dir, "lineitem")
    c = li.select(
        F.col("l_returnflag").alias("grp"),
        _cents("l_extendedprice").alias("price_c"),
        _cents("l_quantity").alias("qty_c"),
    )
    return c.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.col("price_c").cast("decimal(18,0)") * F.col("qty_c"))
            .cast("decimal(38,0)")
            .cast("double")
            / F.sum("qty_c").cast("decimal(38,0)").cast("double")
            / F.lit(100.0)
        ).alias("qty_weighted_avg_price"),
    )


# ---------------------------------------------------------------------------
# CUSUM drift detection (ordered scalar folds)
# ---------------------------------------------------------------------------


@query(
    "events_cusum_drift",
    oracle="""
    WITH s AS (
      SELECT user_id,
             list_prepend(0.0, list(CAST(value AS DOUBLE)
                                    ORDER BY ts, event_id)) AS vals,
             COUNT(*) AS n
      FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           ROUND(list_reduce(vals,
                 (acc, x) -> greatest(0.0, acc + x - 5.0)), 9) AS cusum_hi,
           ROUND(list_reduce(list_transform(vals, v -> -v),
                 (acc, x) -> least(0.0, acc + x + 5.0)), 9) AS cusum_lo
    FROM s
    """,
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM control-chart state per user: the upper cusum
    S⁺ = max(0, S⁺ + x − k) accumulates upward drift beyond allowance
    k=5, the lower mirror accumulates downward drift — the classic
    sequential change-point detector. Both engines run the identical
    left fold in (ts, event_id) order (a 0.0 is prepended so the first
    real element passes through the recurrence too); identical
    recurrence ⇒ identical doubles, rounded to 9 as hygiene.

    Scale shape: one shuffle on user_id; per-user arrays stay
    group-local (the streaming twin would carry S⁺/S⁻ as
    applyInPandasWithState state instead of an array).
    """
    e = read_events(spark, sf_dir)
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("value")))
    )
    hi = F.aggregate(
        arr,
        F.lit(0.0),
        lambda acc, x: F.greatest(F.lit(0.0), acc + x["value"] - F.lit(5.0)),
    )
    lo = F.aggregate(
        arr,
        F.lit(0.0),
        lambda acc, x: F.least(F.lit(0.0), acc - x["value"] + F.lit(5.0)),
    )
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(hi, 9).alias("cusum_hi"),
        F.round(lo, 9).alias("cusum_lo"),
    )


# ---------------------------------------------------------------------------
# Trailing moving average (ROWS frame, exact cents)
# ---------------------------------------------------------------------------


@query(
    "window_moving_average_rows",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id, ts,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events
    )
    SELECT user_id, event_id,
           CAST(SUM(cents) OVER w AS BIGINT) AS win_sum_cents,
           CAST(COUNT(*) OVER w AS BIGINT) AS win_n,
           CAST(CAST(SUM(cents) OVER w AS BIGINT) AS DOUBLE)
             / CAST(COUNT(*) OVER w AS BIGINT) / 100.0 AS moving_avg
    FROM c
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def window_moving_average_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 5-observation moving average per user (ROWS frame —
    the count-based sibling of the RANGE/time frames elsewhere in the
    suite). The frame sum is exact integer cents; the average is one
    identical division — no float accumulation across the frame.
    """
    e = read_events(spark, sf_dir)
    c = e.select("user_id", "event_id", "ts", _cents("value").alias("cents"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return c.select(
        "user_id",
        "event_id",
        F.sum("cents").over(w).cast("bigint").alias("win_sum_cents"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("win_n"),
        (
            F.sum("cents").over(w).cast("bigint").cast("double")
            / F.count(F.lit(1)).over(w).cast("bigint")
            / F.lit(100.0)
        ).alias("moving_avg"),
    )


# ---------------------------------------------------------------------------
# Peak concurrency via sweep line (+1/-1 deltas, running sum)
# ---------------------------------------------------------------------------


@query(
    "events_peak_concurrency",
    oracle="""
    WITH deltas AS (
      SELECT CAST(ts AS DATE) AS day, ts AS t, 1 AS delta, event_id
      FROM events
      UNION ALL
      SELECT CAST(ts AS DATE), ts + INTERVAL 5 MINUTE, -1, event_id
      FROM events
    ),
    swept AS (
      SELECT day,
             CAST(SUM(delta) OVER (
               PARTITION BY day ORDER BY t, delta, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS live
      FROM deltas
    )
    SELECT day, MAX(live) AS peak_concurrency
    FROM swept GROUP BY day
    """,
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent activity per day, each event counted live for 5
    minutes — the classic sweep line: +1 at start, −1 at expiry,
    running sum, daily max. The sweep order carries (delta, event_id)
    tie-breaks so an expiry at the same instant as an arrival
    decrements FIRST (delta −1 < +1) — both engines sweep identically
    and the counts are pure integers. (Day-boundary-straddling windows
    count toward the start day — the partition is the sweep scope.)

    Scale shape: the union doubles the rows once, the sweep is one
    day-partitioned window, the max collapses it — no joins at all,
    where the naive formulation is a quadratic self-join.
    """
    e = read_events(spark, sf_dir)
    starts = e.select(
        F.col("ts").cast("date").alias("day"),
        F.col("ts").alias("t"),
        F.lit(1).alias("delta"),
        "event_id",
    )
    ends = e.select(
        F.col("ts").cast("date").alias("day"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("t"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    deltas = starts.unionByName(ends)
    w = (
        Window.partitionBy("day")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = deltas.select(
        "day", F.sum("delta").over(w).cast("bigint").alias("live")
    )
    return swept.groupBy("day").agg(F.max("live").alias("peak_concurrency"))


# ---------------------------------------------------------------------------
# Equi-depth histogram via distributed global ranking (round 4)
# ---------------------------------------------------------------------------


@query(
    "histogram_equidepth_price",
    oracle=f"""
    WITH c AS (
      SELECT {_SQL_CENTS.format(col='l_extendedprice')} AS cents FROM lineitem
    ),
    r AS (SELECT cents, ntile(8) OVER (ORDER BY cents) AS bucket FROM c)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           MIN(cents) AS lo_cents, MAX(cents) AS hi_cents
    FROM r GROUP BY bucket
    """,
)
def histogram_equidepth_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equi-height) histogram of lineitem price — 8 buckets
    of equal row count with exact value boundaries, the optimizer-
    statistics primitive the fixed-bin histogram can't provide on
    skewed data.

    Runs the distributed global-ranking operator (operators/ranking.py)
    over the FULL fact table — one parallel range shuffle, never a
    single-task sort — then closed-form NTILE math and a per-bucket
    rollup. Determinism without a unique tie-break: equal cents
    colocate under range partitioning and the per-bucket aggregates
    (count, min, max) depend only on the sorted MULTISET — the value at
    each rank position is unique even when tied rows swap ranks."""
    from ..operators.partitioning import spread
    from ..operators.ranking import ntile_from_rn, with_global_row_number

    li = read_table(spark, sf_dir, "lineitem")
    # Round 14: keyed spread so the cents cast + range-shuffle map side
    # run cores-wide instead of inside the single-row-group scan task.
    c = spread(
        li.select("l_orderkey", "l_extendedprice"), by=["l_orderkey"]
    ).select(_cents("l_extendedprice").alias("cents"))
    ranked = with_global_row_number(c, ["cents"], rn="__rn", n_col="__n")
    return (
        ranked.select(
            "cents", ntile_from_rn("__rn", "__n", 8).alias("bucket")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Closed-form linear regression from exact integer moments (round 4)
# ---------------------------------------------------------------------------


@query(
    "agg_regr_slope_intercept",
    oracle=f"""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
             CAST(SUM({_SQL_CENTS.format(col='l_extendedprice')}) AS BIGINT)
               AS sy,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                      * {_SQL_CENTS.format(col='l_extendedprice')}) AS BIGINT)
               AS sxy,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                  AS BIGINT) AS sxx
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
           (CAST(sy AS DOUBLE)
              - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) AS intercept
    FROM m
    """,
)
def agg_regr_slope_intercept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares fit of price-cents on quantity per return flag
    (REGR_SLOPE / REGR_INTERCEPT) — closed form from exact int64
    moments, so both engines feed IDENTICAL integers into the SAME
    IEEE double expression: every product/difference/division is a
    correctly-rounded op on identical operands, hence bit-identical
    cross-engine with NO rounding fence. Integer bounds (documented):
    sxy <= n_rows·50·10^7 ≈ 3e15 at sf1 < 2^53, so every moment sum
    converts to double exactly; the >2^53 magnitudes only ever appear
    as double PRODUCTS, which round identically.

    Scale shape: one map-side-combinable aggregate over the fact table;
    the regression math runs on |groups| rows."""
    li = read_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("bigint")
    y = _cents("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    nd, sxd, syd = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    sxyd, sxxd = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    slope = (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
    return m.select(
        "l_returnflag",
        "n",
        slope.alias("slope"),
        ((syd - slope * sxd) / nd).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# Two-sample distribution tests: Kolmogorov-Smirnov and Mann-Whitney U
# ---------------------------------------------------------------------------


@query(
    "stats_ks_two_sample",
    oracle=f"""
    WITH c AS (
      SELECT {_SQL_CENTS.format(col='l_extendedprice')} AS cents,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ia
      FROM lineitem WHERE l_returnflag IN ('R', 'N')
    ),
    e AS (
      SELECT cents, SUM(ia) AS a_cnt, COUNT(*) AS t_cnt
      FROM c GROUP BY cents
    ),
    g AS (
      SELECT CAST(SUM(a_cnt) OVER (ORDER BY cents) AS BIGINT) AS ca,
             CAST(SUM(t_cnt) OVER (ORDER BY cents) AS BIGINT) AS ct
      FROM e
    ),
    t AS (
      SELECT CAST(SUM(a_cnt) AS BIGINT) AS na,
             CAST(SUM(t_cnt) - SUM(a_cnt) AS BIGINT) AS nb
      FROM e
    )
    SELECT t.na AS n_a, t.nb AS n_b,
           CAST(MAX(ABS(g.ca * t.nb - (g.ct - g.ca) * t.na)) AS BIGINT)
             AS d_num,
           CAST(MAX(ABS(g.ca * t.nb - (g.ct - g.ca) * t.na)) AS DOUBLE)
             / (CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE)) AS ks_stat
    FROM g, t GROUP BY t.na, t.nb
    """,
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the price
    distributions of returned ('R') vs non-returned ('N') line items:
    D = max_v |ECDF_A(v) - ECDF_B(v)|, compared in INTEGER math as
    max |cumA·nB - cumB·nA| so the supremum is exact (float ECDF
    differences wobble at ties); the statistic itself is one division
    of identical integers, bit-equal cross-engine while nA·nB < 2^53.

    Scale shape: group-by collapses the fact table to the distinct-value
    grain (domain-bounded: prices live in a fixed cents range), then
    ``with_global_prefix_sums`` (operators/ranking.py) runs BOTH groups'
    cumulative counts over one range shuffle — no single-task global
    window, no second pass. Bound: exact integer compare needs
    n_a·n_b < 2^63 (~3·10^9 rows per side); beyond that flip `d_num`
    to the double ECDF difference and keep the same plan.
    """
    from ..operators.ranking import with_global_prefix_sums

    li = read_table(spark, sf_dir, "lineitem")
    c = li.filter(F.col("l_returnflag").isin("R", "N")).select(
        _cents("l_extendedprice").alias("cents"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ia"),
    )
    e = c.groupBy("cents").agg(
        F.sum("ia").alias("a_cnt"), F.count(F.lit(1)).alias("t_cnt")
    )
    g = with_global_prefix_sums(
        e,
        ["cents"],
        ["a_cnt", "t_cnt"],
        rn="__rn",
        tot_prefix="tot_",
    )
    na = F.col("tot_a_cnt")
    nb = F.col("tot_t_cnt") - F.col("tot_a_cnt")
    diff = F.abs(
        F.col("cum_a_cnt") * nb - (F.col("cum_t_cnt") - F.col("cum_a_cnt")) * na
    )
    return (
        g.select(
            na.alias("n_a"), nb.alias("n_b"), diff.alias("diff")
        )
        .groupBy("n_a", "n_b")
        .agg(
            F.max("diff").cast("bigint").alias("d_num"),
            (
                F.max("diff").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("ks_stat"),
        )
    )


@query(
    "stats_mann_whitney_u",
    oracle=f"""
    WITH c AS (
      SELECT {_SQL_CENTS.format(col='l_extendedprice')} AS cents,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ia
      FROM lineitem WHERE l_returnflag IN ('R', 'N')
    ),
    e AS (
      SELECT cents, SUM(ia) AS a_cnt, COUNT(*) AS t_cnt
      FROM c GROUP BY cents
    ),
    g AS (
      SELECT a_cnt,
             CAST(SUM(t_cnt) OVER (ORDER BY cents) AS BIGINT) - t_cnt
               AS before_cnt,
             t_cnt
      FROM e
    ),
    t AS (
      SELECT CAST(SUM(a_cnt) AS BIGINT) AS na,
             CAST(SUM(t_cnt) - SUM(a_cnt) AS BIGINT) AS nb
      FROM e
    )
    SELECT t.na AS n_a, t.nb AS n_b,
           CAST(SUM(g.a_cnt * (2 * g.before_cnt + g.t_cnt + 1)) AS BIGINT)
             AS two_rank_sum_a,
           CAST(SUM(g.a_cnt * (2 * g.before_cnt + g.t_cnt + 1))
                - t.na * (t.na + 1) AS BIGINT) AS two_u_a,
           CAST(CAST(SUM(g.a_cnt * (2 * g.before_cnt + g.t_cnt + 1))
                     - t.na * (t.na + 1) AS BIGINT) AS DOUBLE) / 2 AS u_a
    FROM g, t GROUP BY t.na, t.nb
    """,
)
def stats_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (rank-sum) statistic for returned vs non-returned
    line-item prices, with tie-aware AVERAGE ranks held exactly in
    integers: for a distinct value with `t` total occurrences starting
    after `b` smaller rows, each occurrence's average rank is
    (2b + t + 1)/2 — so 2·R_A = Σ a_cnt·(2b + t + 1) stays a bigint and
    U_A = R_A − nA(nA+1)/2 is exact (halves only, so 2U is integral).
    This is the lineitem-has-no-unique-key-safe rank construction from
    CLAUDE.md (value-determined average ranks, never row_number ties).

    Scale shape: same distinct-value grain + one
    ``with_global_prefix_sum`` range shuffle as stats_ks_two_sample;
    the rank sum is a plain map-side-combinable aggregate on top.
    """
    from ..operators.ranking import with_global_prefix_sum

    li = read_table(spark, sf_dir, "lineitem")
    c = li.filter(F.col("l_returnflag").isin("R", "N")).select(
        _cents("l_extendedprice").alias("cents"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ia"),
    )
    e = c.groupBy("cents").agg(
        F.sum("ia").alias("a_cnt"), F.count(F.lit(1)).alias("t_cnt")
    )
    g = with_global_prefix_sum(
        e, ["cents"], "t_cnt", rn="__rn", cum="cum_t", n_col=None,
        total_col="__ttot",
    ).withColumn("before_cnt", F.col("cum_t") - F.col("t_cnt"))
    two_r = F.sum(
        F.col("a_cnt") * (2 * F.col("before_cnt") + F.col("t_cnt") + 1)
    ).cast("bigint")
    totals = g.groupBy().agg(
        F.sum("a_cnt").cast("bigint").alias("n_a"),
        (F.sum("t_cnt") - F.sum("a_cnt")).cast("bigint").alias("n_b"),
        two_r.alias("two_rank_sum_a"),
    )
    return totals.select(
        "n_a",
        "n_b",
        "two_rank_sum_a",
        (F.col("two_rank_sum_a") - F.col("n_a") * (F.col("n_a") + 1))
        .cast("bigint")
        .alias("two_u_a"),
        (
            (F.col("two_rank_sum_a") - F.col("n_a") * (F.col("n_a") + 1))
            .cast("bigint")
            .cast("double")
            / 2
        ).alias("u_a"),
    )


# ---------------------------------------------------------------------------
# Kendall tau-b on a bounded group grain
# ---------------------------------------------------------------------------


@query(
    "stats_kendall_tau_brand",
    oracle=f"""
    WITH b AS (
      SELECT p.p_brand AS brand,
             CAST(SUM(CAST(CAST(l.l_quantity AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS x,
             CAST(SUM({_SQL_CENTS.format(col='l.l_extendedprice')})
                  AS BIGINT) AS y
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand
    ),
    p AS (
      SELECT CASE WHEN (a.x - c.x) * (a.y - c.y) > 0 THEN 1 ELSE 0 END AS con,
             CASE WHEN (a.x - c.x) * (a.y - c.y) < 0 THEN 1 ELSE 0 END AS dis,
             CASE WHEN a.x = c.x THEN 1 ELSE 0 END AS tx,
             CASE WHEN a.y = c.y THEN 1 ELSE 0 END AS ty
      FROM b a JOIN b c ON a.brand < c.brand
    ),
    s AS (
      SELECT CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n,
             CAST(SUM(con) AS BIGINT) AS c_pairs,
             CAST(SUM(dis) AS BIGINT) AS d_pairs,
             CAST(SUM(tx) AS BIGINT) AS tie_x,
             CAST(SUM(ty) AS BIGINT) AS tie_y
      FROM p
    )
    SELECT n, c_pairs, d_pairs, tie_x, tie_y,
           CAST(c_pairs - d_pairs AS DOUBLE)
             / sqrt(CAST((n * (n - 1) / 2 - tie_x)
                         * (n * (n - 1) / 2 - tie_y) AS DOUBLE)) AS tau_b
    FROM s
    """,
)
def stats_kendall_tau_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between total quantity and total
    revenue across part brands. The fact table collapses to the brand
    grain first (domain-bounded: ~25 brands), so the O(n²) pairwise
    concordance scan is over a TINY broadcast frame — all-pairs on the
    raw table would be the classic quadratic blowup; all-pairs on a
    bounded aggregate is free. Concordant/discordant/tie counts are
    pure integer; tau-b is one sqrt of an exact-integer product (< 2^53)
    and one division — both IEEE correctly-rounded, so bit-equal
    cross-engine without any rounding fudge.
    """
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    b = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(F.expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .cast("bigint")
            .alias("x"),
            F.sum(_cents("l_extendedprice")).cast("bigint").alias("y"),
        )
    )
    a = b.alias("a")
    c = b.alias("c")
    pairs = a.join(
        F.broadcast(c), F.col("a.brand") < F.col("c.brand")
    ).select(
        (
            F.when(
                (F.col("a.x") - F.col("c.x")) * (F.col("a.y") - F.col("c.y")) > 0, 1
            ).otherwise(0)
        ).alias("con"),
        (
            F.when(
                (F.col("a.x") - F.col("c.x")) * (F.col("a.y") - F.col("c.y")) < 0, 1
            ).otherwise(0)
        ).alias("dis"),
        F.when(F.col("a.x") == F.col("c.x"), 1).otherwise(0).alias("tx"),
        F.when(F.col("a.y") == F.col("c.y"), 1).otherwise(0).alias("ty"),
    )
    s = pairs.groupBy().agg(
        F.sum("con").cast("bigint").alias("c_pairs"),
        F.sum("dis").cast("bigint").alias("d_pairs"),
        F.sum("tx").cast("bigint").alias("tie_x"),
        F.sum("ty").cast("bigint").alias("tie_y"),
    )
    n_df = b.groupBy().agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    s = s.crossJoin(F.broadcast(n_df))
    n0 = F.col("n") * (F.col("n") - 1) / 2
    return s.select(
        "n",
        "c_pairs",
        "d_pairs",
        "tie_x",
        "tie_y",
        (
            (F.col("c_pairs") - F.col("d_pairs")).cast("double")
            / F.sqrt(
                ((n0 - F.col("tie_x")) * (n0 - F.col("tie_y"))).cast("double")
            )
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# Weighted median (exact, integer cumulative weights)
# ---------------------------------------------------------------------------


@query(
    "quantile_weighted_median",
    oracle=f"""
    WITH c AS (
      SELECT l_returnflag AS grp,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS q_units,
             {_SQL_CENTS.format(col='l_extendedprice')} AS w_cents
      FROM lineitem
    ),
    e AS (
      SELECT grp, q_units, CAST(SUM(w_cents) AS BIGINT) AS w
      FROM c GROUP BY grp, q_units
    ),
    g AS (
      SELECT grp, q_units, w,
             CAST(SUM(w) OVER (PARTITION BY grp ORDER BY q_units)
                  AS BIGINT) AS cw,
             CAST(SUM(w) OVER (PARTITION BY grp) AS BIGINT) AS tw
      FROM e
    )
    SELECT grp, MAX(tw) AS total_w_cents,
           MIN(CASE WHEN 2 * cw >= tw THEN q_units END)
             AS weighted_median_q_units
    FROM g GROUP BY grp
    """,
)
def quantile_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-weighted median quantity per return flag: the smallest
    quantity value whose cumulative price weight reaches half the
    group's total (lower weighted median, 2·cum ≥ tot compared in
    integer cents — the CLAUDE.md integer-threshold rule, so the
    boundary row can't flip on float rounding).

    Scale shape: fact table collapses to (group, distinct-quantity)
    grain — quantity is a 1..50 domain, so the windowed frame is
    dozens of rows per group; the windows are PARTITIONED (per-group),
    never the single-task global sort.
    """
    li = read_table(spark, sf_dir, "lineitem")
    c = li.select(
        F.col("l_returnflag").alias("grp"),
        F.expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "q_units"
        ),
        _cents("l_extendedprice").alias("w_cents"),
    )
    e = c.groupBy("grp", "q_units").agg(F.sum("w_cents").cast("bigint").alias("w"))
    wspec = Window.partitionBy("grp").orderBy("q_units")
    g = e.withColumn(
        "cw",
        F.sum("w").over(wspec.rowsBetween(Window.unboundedPreceding, 0)).cast(
            "bigint"
        ),
    ).withColumn("tw", F.sum("w").over(Window.partitionBy("grp")).cast("bigint"))
    return g.groupBy("grp").agg(
        F.max("tw").alias("total_w_cents"),
        F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("q_units"))).alias(
            "weighted_median_q_units"
        ),
    )


# ---------------------------------------------------------------------------
# Graph: triangle count / clustering coefficient on brand co-occurrence
# ---------------------------------------------------------------------------

# Ordered brand pairs (u < v) from a per-order sorted brand-set array —
# shared by every graph_*_brands query below.
_BRAND_PAIR_EXPR = (
    "flatten(transform(bs, (x, i) -> "
    "transform(slice(bs, i + 2, size(bs)), y -> struct(x AS u, y AS v))))"
)


def _order_brand_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ok, bs): the sorted DISTINCT brand set per order — the shared
    first stage of the graph_*_brands family. Round-13 rewrite (guide
    §2.3/§2.4): ONE keyed spread + ONE grouped collect_set replace the
    old (ok, brand) DISTINCT + ob⋈ob self-join — two fact-scale
    shuffles and a join became one shuffle whose map side also runs
    cores-wide instead of inside the single-row-group scan task
    (edge build measured 1.8s → 1.0s at sf0.1). collect_set dedups
    per group exactly like the retired DISTINCT; downstream pair
    explosion is quadratic only in ORDER SIZE (≤ ~7 brands)."""
    from ..operators.partitioning import spread

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        spread(li, by=["l_orderkey"])
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.sort_array(F.collect_set("p_brand")).alias("bs"))
    )


def _brand_pair_occurrences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(u, v) with u < v, ONE ROW PER ORDER containing both brands —
    `.distinct()` of this is the unweighted edge list; groupBy(u, v)
    count is the co-occurrence weight (both identical to the old
    ob⋈ob formulations, which the oracles replay)."""
    return (
        _order_brand_sets(spark, sf_dir)
        .select(F.explode(F.expr(_BRAND_PAIR_EXPR)).alias("p"))
        .select("p.u", "p.v")
    )


@query(
    "graph_triangle_count_brands",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    edges AS (
      SELECT DISTINCT a.brand AS u, b.brand AS v
      FROM ob a JOIN ob b ON a.ok = b.ok AND a.brand < b.brand
    ),
    deg AS (
      SELECT brand, COUNT(*) AS d FROM (
        SELECT u AS brand FROM edges UNION ALL SELECT v AS brand FROM edges
      ) GROUP BY brand
    ),
    tri AS (
      SELECT COUNT(*) AS n_tri
      FROM edges e1 JOIN edges e2 ON e2.u = e1.v
                    JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    agg AS (
      SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
             CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
             CAST((SELECT n_tri FROM tri) AS BIGINT) AS n_triangles,
             CAST((SELECT SUM((d * (d - 1)) // 2) FROM deg) AS BIGINT)
               AS n_wedges
    )
    SELECT n_nodes, n_edges, n_triangles, n_wedges,
           CAST(3 * n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE)
             AS global_clustering
    FROM agg
    """,
)
def graph_triangle_count_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + global clustering coefficient on the brand
    co-purchase graph (brands are nodes; an edge means two brands appear
    in the same order). The standard i<j<k enumeration: each triangle is
    counted once via ordered edges (u<v), wedges from the degree sum —
    clustering = 3·triangles / wedges, one division of exact integers.

    Scale shape: the per-order pair blowup is quadratic in ORDER SIZE
    (bounded ~7 line items), never in table size; the edge/degree/
    triangle joins run on the brand-domain-bounded edge list (≤ n² ~
    hundreds of rows for tens of brands), explicitly broadcast. The only
    full-table work is the lineitem⋈part scan and the (order, brand)
    DISTINCT — one shuffle each.
    """
    edges = _brand_pair_occurrences(spark, sf_dir).distinct()
    edges = F.broadcast(edges.transform(pin, eager=False))
    deg = (
        edges.select(F.col("u").alias("brand"))
        .unionAll(edges.select(F.col("v").alias("brand")))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .groupBy()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    nodes_edges = deg.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum(F.expr("(d * (d - 1)) DIV 2")).cast("bigint").alias("n_wedges"),
    )
    n_edges = edges.groupBy().agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    out = nodes_edges.crossJoin(n_edges).crossJoin(tri)
    return out.select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        "n_wedges",
        (
            (3 * F.col("n_triangles")).cast("double")
            / F.col("n_wedges").cast("double")
        ).alias("global_clustering"),
    )


# ---------------------------------------------------------------------------
# Graph: 3-iteration weighted PageRank on brand co-occurrence
# ---------------------------------------------------------------------------

_PR_ITERS = 3
_PR_D = 0.85


@query(
    "graph_pagerank_brands",
    oracle=f"""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    und AS (
      SELECT a.brand AS u, b.brand AS v, COUNT(*) AS cnt
      FROM ob a JOIN ob b ON a.ok = b.ok AND a.brand < b.brand
      GROUP BY a.brand, b.brand
    ),
    w AS (
      SELECT u, v, cnt FROM und
      UNION ALL
      SELECT v AS u, u AS v, cnt FROM und
    ),
    outw AS (
      SELECT u, CAST(SUM(cnt) AS BIGINT) AS ow FROM w GROUP BY u
    ),
    n AS (SELECT COUNT(*) AS n FROM outw),
    r0 AS (
      SELECT outw.u AS brand, 1.0 / n.n AS r FROM outw, n
    ),
    r1 AS (
      SELECT w.v AS brand,
             0.15 / MAX(n.n) + {_PR_D} * CAST(SUM(CAST(
               r0.r * CAST(w.cnt AS DOUBLE) / CAST(outw.ow AS DOUBLE)
               AS DECIMAL(20,12))) AS DOUBLE) AS r
      FROM w JOIN r0 ON r0.brand = w.u JOIN outw ON outw.u = w.u, n
      GROUP BY w.v
    ),
    r2 AS (
      SELECT w.v AS brand,
             0.15 / MAX(n.n) + {_PR_D} * CAST(SUM(CAST(
               r1.r * CAST(w.cnt AS DOUBLE) / CAST(outw.ow AS DOUBLE)
               AS DECIMAL(20,12))) AS DOUBLE) AS r
      FROM w JOIN r1 ON r1.brand = w.u JOIN outw ON outw.u = w.u, n
      GROUP BY w.v
    ),
    r3 AS (
      SELECT w.v AS brand,
             0.15 / MAX(n.n) + {_PR_D} * CAST(SUM(CAST(
               r2.r * CAST(w.cnt AS DOUBLE) / CAST(outw.ow AS DOUBLE)
               AS DECIMAL(20,12))) AS DOUBLE) AS r
      FROM w JOIN r2 ON r2.brand = w.u JOIN outw ON outw.u = w.u, n
      GROUP BY w.v
    )
    SELECT brand, ROUND(r, 9) AS pagerank FROM r3
    """,
)
def graph_pagerank_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (damping 0.85, 3 fixed iterations, uniform
    init) over the undirected brand co-purchase graph — the iterative
    graph algorithm expressed BOTH as a Spark join loop and as chained
    SQL CTEs, so the differential oracle covers a class usually stuck
    with rows-only checks. Determinism: every per-edge contribution
    r·w/outw is an identical double expression, quantized to
    DECIMAL(20,12) before the neighbor SUM so accumulation order can't
    leak ulps; the damped update is identical arithmetic on identical
    doubles; final rank rounded to 9 (composed-float rule).

    Scale shape: the fact-table work is one lineitem⋈part scan + the
    (order, brand) DISTINCT; afterwards all iterations run on the
    brand-domain-bounded edge list (broadcast, hundreds of rows). For
    graphs that DON'T fit in a broadcast, the same loop holds with
    shuffle joins per iteration + localCheckpoint per round —
    operators/graph.py's label-propagation pattern.
    """
    und = (
        _brand_pair_occurrences(spark, sf_dir)
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = und.select("u", "v", "cnt").unionAll(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"), "cnt")
    )
    w = w.transform(pin, eager=False)
    outw = w.groupBy("u").agg(F.sum("cnt").cast("bigint").alias("ow"))
    n_df = outw.groupBy().agg(F.count(F.lit(1)).alias("n"))
    r = outw.crossJoin(F.broadcast(n_df)).select(
        F.col("u").alias("brand"), (F.lit(1.0) / F.col("n")).alias("r")
    )
    wj = w.join(F.broadcast(outw), "u")
    for _ in range(_PR_ITERS):
        contrib = (
            F.col("r") * F.col("cnt").cast("double") / F.col("ow").cast("double")
        ).cast("decimal(20,12)")
        r = (
            wj.join(F.broadcast(r), wj.u == r.brand)
            .crossJoin(F.broadcast(n_df))
            .groupBy(F.col("v").alias("brand2"))
            .agg(
                (
                    F.lit(0.15) / F.max("n")
                    + F.lit(_PR_D) * F.sum(contrib).cast("double")
                ).alias("r")
            )
            .withColumnRenamed("brand2", "brand")
        )
    return r.select("brand", F.round("r", 9).alias("pagerank"))


# ---------------------------------------------------------------------------
# Welch's t-test (unequal variances) from decimal-exact moments
# ---------------------------------------------------------------------------

_WT_SQL_MOM = """
      CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)
        AS n{i},
      CAST(SUM(CAST(CASE WHEN event_type = '{t}' THEN value END
               AS DECIMAL(18,2))) AS DOUBLE) AS s{i},
      CAST(SUM(CAST(CASE WHEN event_type = '{t}' THEN value * value END
               AS DECIMAL(18,4))) AS DOUBLE) AS q{i}
"""


@query(
    "stats_welch_ttest",
    oracle=f"""
    WITH m AS (
      SELECT
      {_WT_SQL_MOM.format(t='purchase', i=1)},
      {_WT_SQL_MOM.format(t='click', i=2)}
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    v AS (
      SELECT n1, n2, s1 / n1 AS m1, s2 / n2 AS m2,
             (q1 - s1 * s1 / n1) / (n1 - 1) AS v1,
             (q2 - s2 * s2 / n2) / (n2 - 1) AS v2
      FROM m
    )
    SELECT n1, n2, ROUND(m1, 6) AS mean_1, ROUND(m2, 6) AS mean_2,
           ROUND((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
           ROUND((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
                 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                    + (v2 / n2) * (v2 / n2) / (n2 - 1)), 6) AS welch_df
    FROM v
    """,
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test comparing mean event value of
    'purchase' vs 'click' events — the A/B-testing primitive. One pass:
    both groups' (n, Σx, Σx²) come from a single filtered-conditional
    aggregate (map-side combinable, no per-group scan), sums are
    decimal-exact so they're order-independent, and the composed float
    tail (variance → sqrt → ratio) is identical-expression on both
    engines, rounded to 6 (the agg_stats drift rule).

    Scale shape: one whole-table aggregate to a single row; everything
    after is scalar arithmetic. The same shape covers any two cohorts
    expressible as a CASE over a partition-prunable column.
    """
    e = read_events(spark, sf_dir)

    def mom(t: str, i: int) -> list:
        cond = F.col("event_type") == t
        return [
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(f"n{i}"),
            F.sum(F.when(cond, F.col("value")).cast("decimal(18,2)"))
            .cast("double")
            .alias(f"s{i}"),
            F.sum(
                F.when(cond, F.col("value") * F.col("value")).cast("decimal(18,4)")
            )
            .cast("double")
            .alias(f"q{i}"),
        ]

    m = (
        e.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy()
        .agg(*(mom("purchase", 1) + mom("click", 2)))
    )
    v = m.select(
        "n1",
        "n2",
        (F.col("s1") / F.col("n1")).alias("m1"),
        (F.col("s2") / F.col("n2")).alias("m2"),
        ((F.col("q1") - F.col("s1") * F.col("s1") / F.col("n1")) / (F.col("n1") - 1)).alias("v1"),
        ((F.col("q2") - F.col("s2") * F.col("s2") / F.col("n2")) / (F.col("n2") - 1)).alias("v2"),
    )
    vn1 = F.col("v1") / F.col("n1")
    vn2 = F.col("v2") / F.col("n2")
    return v.select(
        "n1",
        "n2",
        F.round("m1", 6).alias("mean_1"),
        F.round("m2", 6).alias("mean_2"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(vn1 + vn2), 6).alias("t_stat"),
        F.round(
            (vn1 + vn2) * (vn1 + vn2)
            / (vn1 * vn1 / (F.col("n1") - 1) + vn2 * vn2 / (F.col("n2") - 1)),
            6,
        ).alias("welch_df"),
    )


# ---------------------------------------------------------------------------
# Bootstrap confidence interval from deterministic hash resamples
# ---------------------------------------------------------------------------

_BOOT_B = 32


@query(
    "stats_bootstrap_mean_ci",
    oracle=f"""
    WITH h AS (
      SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
             md5(CAST(l_orderkey AS VARCHAR) || '-' ||
                 CAST(l_linenumber AS VARCHAR)) AS hx
      FROM lineitem
    ),
    d AS (
      SELECT cents, {", ".join(
        f"CAST('0x' || substring(hx, {i + 1}, 1) AS BIGINT) AS d{i}"
        for i in range(_BOOT_B // 4))}
      FROM h
    ),
    s AS (
      SELECT {", ".join(
        f"SUM(CASE WHEN (d{r // 4} >> {r % 4}) % 2 = 0 THEN cents ELSE 0 END)"
        f" AS s{r},"
        f" SUM(CASE WHEN (d{r // 4} >> {r % 4}) % 2 = 0 THEN 1 ELSE 0 END)"
        f" AS n{r}"
        for r in range(_BOOT_B))}
      FROM d
    ),
    m AS (
      SELECT r, ROUND(mean_cents / 100, 9) AS m FROM (
        {" UNION ALL ".join(
          f"SELECT {r} AS r, CAST(s{r} AS DOUBLE) / n{r} AS mean_cents FROM s"
          for r in range(_BOOT_B)
        )}
      )
    ),
    ranked AS (
      SELECT m, row_number() OVER (ORDER BY m, r) AS rn FROM m
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_reps,
           CAST(SUM(CAST(m AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)
             AS mean_of_means,
           MAX(CASE WHEN rn = 1 THEN m END) AS ci_lo,
           MAX(CASE WHEN rn = {_BOOT_B - 1} THEN m END) AS ci_hi
    FROM ranked
    """,
)
def stats_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap-style confidence interval for the mean price without
    any engine RNG: replicate r keeps the rows whose row-key md5 has
    bit r clear — 32 deterministic, engine-identical half-samples from
    ONE md5 per row (128 hash bits fund all 32 replicates; hashing per
    (row, replicate) pair was 3x the cost for nothing), each averaged
    in exact integer cents, CI = order statistics of the replicate
    means (type-1, value-at-index over the 32-row frame). The m-out-of-n
    (m≈n/2) bootstrap — same 1/√n error scaling, reproducible enough to
    hash-verify cross-engine.

    Scale shape: NO fan-out at all — the 32 replicate sums/counts are
    64 conditional aggregates in a single map-side-combinable pass
    (shuffle carries one 64-column row per partition), then the means
    unpivot into a 32-row frame for the ranking window. One scan, one
    md5 per row, and the 8 hex→int digit extractions are hoisted into
    the projection so the 64 aggregates share them instead of
    re-deriving the digit per condition.
    """
    from ..operators.partitioning import spread

    li = read_table(spark, sf_dir, "lineitem")
    # spread the 3-column projection first: the per-row md5 + 8 hex
    # digit extractions + 64 conditional aggregates otherwise all run
    # inside the single-row-group scan task (guide §2.5)
    h = spread(
        li.select("l_extendedprice", "l_orderkey", "l_linenumber"),
        by=["l_orderkey", "l_linenumber"],
    ).select(
        _cents("l_extendedprice").alias("cents"),
        F.md5(
            F.concat(
                F.col("l_orderkey").cast("string"),
                F.lit("-"),
                F.col("l_linenumber").cast("string"),
            )
        ).alias("hx"),
    )

    h = h.select(
        "cents",
        *[
            F.expr(
                f"CAST(conv(substring(hx, {i + 1}, 1), 16, 10) AS BIGINT)"
            ).alias(f"d{i}")
            for i in range(_BOOT_B // 4)
        ],
    )

    def bit_clear(r: int) -> F.Column:
        return (F.shiftright(F.col(f"d{r // 4}"), r % 4) % 2) == 0

    aggs = []
    for r in range(_BOOT_B):
        keep = bit_clear(r)
        aggs.append(
            F.sum(F.when(keep, F.col("cents")).otherwise(0)).alias(f"s{r}")
        )
        aggs.append(F.sum(F.when(keep, 1).otherwise(0)).alias(f"n{r}"))
    s = h.groupBy().agg(*aggs)
    stack_expr = ", ".join(
        f"{r}, CAST(s{r} AS DOUBLE) / n{r}" for r in range(_BOOT_B)
    )
    m = s.selectExpr(
        f"stack({_BOOT_B}, {stack_expr}) AS (r, mean_cents)"
    ).select("r", F.round(F.col("mean_cents") / 100, 9).alias("m"))
    # bounded: _BOOT_B bootstrap-replicate rows, a constant
    ranked = m.withColumn("rn", F.row_number().over(Window.orderBy("m", "r")))
    return ranked.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_reps"),
        (
            F.sum(F.col("m").cast("decimal(18,9)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_of_means"),
        F.max(F.when(F.col("rn") == 1, F.col("m"))).alias("ci_lo"),
        F.max(F.when(F.col("rn") == _BOOT_B - 1, F.col("m"))).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# Distribution drift: population stability index between time halves
# ---------------------------------------------------------------------------


@query(
    "quality_psi_value_drift",
    oracle="""
    WITH b AS (
      SELECT event_type,
             CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16' THEN 0 ELSE 1 END
               AS half,
             LEAST(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                        // 5000 AS INT), 9) AS bin
      FROM events
    ),
    c AS (
      SELECT event_type, bin,
             SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n_ref,
             SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n_cur
      FROM b GROUP BY event_type, bin
    ),
    t AS (
      SELECT event_type,
             CAST(SUM(n_ref) AS BIGINT) AS tot_ref,
             CAST(SUM(n_cur) AS BIGINT) AS tot_cur
      FROM c GROUP BY event_type
    ),
    terms AS (
      SELECT c.event_type,
             CAST((CAST(c.n_ref AS DOUBLE) / t.tot_ref
                   - CAST(c.n_cur AS DOUBLE) / t.tot_cur)
                  * ln((CAST(c.n_ref AS DOUBLE) / t.tot_ref)
                       / (CAST(c.n_cur AS DOUBLE) / t.tot_cur))
                  AS DECIMAL(20,12)) AS term,
             c.n_ref, c.n_cur
      FROM c JOIN t ON c.event_type = t.event_type
      WHERE c.n_ref > 0 AND c.n_cur > 0
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           ROUND(CAST(SUM(term) AS DOUBLE), 9) AS psi
    FROM terms GROUP BY event_type
    """,
)
def quality_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type between the first and
    second half of the observation window — the standard "has this
    feature's distribution drifted" monitor. Value domain is cut into
    10 fixed $50 bins (integer cents, `//`/DIV agreement zone); each
    PSI term (p−q)·ln(p/q) is an identical-expression double over
    exact integer ratios, quantized to DECIMAL(20,12) before the sum so
    bin accumulation order can't leak ulps; bins empty on either side
    are excluded (no smoothing constant to disagree about).

    Scale shape: one pass to the (type, bin, half) grain — a
    domain-bounded frame (types × 10 bins) — then scalar math. The
    split date is a constant (monitoring always compares fixed
    windows), so both engines bin identically with no median scan.
    """
    e = read_events(spark, sf_dir)
    b = e.select(
        "event_type",
        F.when(F.col("ts").cast("date") < F.lit("2024-01-16").cast("date"), 0)
        .otherwise(1)
        .alias("half"),
        F.least(
            F.expr(
                "CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
                " DIV 5000 AS INT)"
            ),
            F.lit(9),
        ).alias("bin"),
    )
    c = b.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n_cur"),
    )
    t = c.groupBy("event_type").agg(
        F.sum("n_ref").cast("bigint").alias("tot_ref"),
        F.sum("n_cur").cast("bigint").alias("tot_cur"),
    )
    j = c.join(F.broadcast(t), "event_type").filter(
        (F.col("n_ref") > 0) & (F.col("n_cur") > 0)
    )
    p = F.col("n_ref").cast("double") / F.col("tot_ref")
    q = F.col("n_cur").cast("double") / F.col("tot_cur")
    terms = j.select(
        "event_type", ((p - q) * F.log(p / q)).cast("decimal(20,12)").alias("term")
    )
    return terms.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.round(F.sum("term").cast("double"), 9).alias("psi"),
    )


# ---------------------------------------------------------------------------
# MAD (median absolute deviation) robust outlier fence
# ---------------------------------------------------------------------------


@query(
    "outlier_mad_robust",
    oracle=f"""
    WITH c AS (
      SELECT event_type AS grp,
             {_SQL_CENTS.format(col='value')} AS cents
      FROM events
    ),
    r1 AS (
      SELECT grp, cents,
             row_number() OVER (PARTITION BY grp ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY grp) AS n
      FROM c
    ),
    med AS (
      SELECT grp, MAX(CASE WHEN rn = (n - 1) // 2 + 1 THEN cents END)
               AS med_cents
      FROM r1 GROUP BY grp
    ),
    dev AS (
      SELECT c.grp, ABS(c.cents - m.med_cents) AS adev, c.cents,
             m.med_cents
      FROM c JOIN med m ON c.grp = m.grp
    ),
    r2 AS (
      SELECT grp, adev, cents, med_cents,
             row_number() OVER (PARTITION BY grp ORDER BY adev) AS rn,
             COUNT(*) OVER (PARTITION BY grp) AS n
      FROM dev
    ),
    mad AS (
      SELECT grp, MAX(CASE WHEN rn = (n - 1) // 2 + 1 THEN adev END)
               AS mad_cents
      FROM r2 GROUP BY grp
    )
    SELECT d.grp, MAX(d.med_cents) AS median_cents,
           MAX(x.mad_cents) AS mad_cents,
           CAST(SUM(CASE WHEN ABS(d.cents - d.med_cents) * 10000
                          > 3 * 14826 * x.mad_cents
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM dev d JOIN mad x ON d.grp = x.grp
    GROUP BY d.grp
    """,
)
def outlier_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outliers by median absolute deviation: |x − median| >
    3·1.4826·MAD (the normal-consistency constant), with BOTH order
    statistics exact value-at-index and the fence compared in scaled
    integer math (10⁴·dev > 3·14826·MAD — all bigint, the CLAUDE.md
    no-float-boundary rule; the 1.4826 constant clears its denominator
    into the left side). Unlike z-scores, immune to the outliers
    inflating their own fence.

    Scale shape: two grouped PARALLEL range-shuffle ranking passes
    (value, then absolute deviation; operators/ranking.py — no
    per-group single-task sort) + a broadcast of the per-group
    median/MAD rows back onto the scan — the outlier_iqr_price fence
    pattern, ×2.
    """
    e = read_events(spark, sf_dir)
    c = e.select(
        F.col("event_type").alias("grp"), _cents("value").alias("cents")
    )
    from ..operators.ranking import with_grouped_global_row_number

    r1 = with_grouped_global_row_number(c, ["grp"], ["cents"], rn="rn", n_col="n")
    med = r1.groupBy("grp").agg(
        F.max(
            F.when(F.col("rn") == F.expr("(n - 1) DIV 2 + 1"), F.col("cents"))
        ).alias("med_cents")
    )
    dev = c.join(F.broadcast(med), "grp").select(
        "grp",
        "cents",
        "med_cents",
        F.abs(F.col("cents") - F.col("med_cents")).alias("adev"),
    )
    r2 = with_grouped_global_row_number(dev, ["grp"], ["adev"], rn="rn", n_col="n")
    mad = r2.groupBy("grp").agg(
        F.max(
            F.when(F.col("rn") == F.expr("(n - 1) DIV 2 + 1"), F.col("adev"))
        ).alias("mad_cents")
    )
    out = dev.join(F.broadcast(mad), "grp")
    return out.groupBy("grp").agg(
        F.max("med_cents").alias("median_cents"),
        F.max("mad_cents").alias("mad_cents"),
        F.sum(
            F.when(
                F.col("adev") * 10000 > 3 * 14826 * F.col("mad_cents"), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_outliers"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


# ---------------------------------------------------------------------------
# Interpolated (continuous) quartiles — the percentile_cont surface
# ---------------------------------------------------------------------------


@query(
    "quantile_cont_quartiles",
    oracle=f"""
    WITH c AS (
      SELECT l_returnflag AS grp,
             {_SQL_CENTS.format(col='l_extendedprice')} AS cents
      FROM lineitem
    )
    SELECT grp,
           CAST(COUNT(*) AS BIGINT) AS n,
           quantile_cont(cents, 0.25) AS q1_cents,
           quantile_cont(cents, 0.5) AS q2_cents,
           quantile_cont(cents, 0.75) AS q3_cents
    FROM c GROUP BY grp
    """,
)
def quantile_cont_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linearly-INTERPOLATED quartiles (``percentile_cont`` semantics)
    — the continuous sibling of the repo's type-1 value-at-index
    quantiles. Safe cross-engine for DYADIC fractions only: the rank
    position (n−1)·q and the interpolation lo + frac·(hi−lo) are exact
    double arithmetic when q ∈ {{.25, .5, .75}} (powers of two) and the
    values are integer cents — both engines land on the same double.
    Non-dyadic q (e.g. 0.9) re-introduces representation error and
    belongs to the type-1 family instead (quantile_deciles_price).

    Scale shape: the grouped PARALLEL range-shuffle ranking
    (operators/ranking.py), then a broadcast join of the ≤ 2 marks per
    quartile back onto the ranked rows and exact integer interpolation
    (v_lo·(4−rem) + v_hi·rem)/4 — identical to quantile_cont's
    lo + frac·(hi−lo) for dyadic fractions over integer cents. The
    earlier ``percentile()`` aggregate was retired: Spark's exact
    percentile is an ObjectAggregate that BUFFERS every group value in
    executor memory per quantile (20 s at sf0.1, OOM territory at
    100×); the rank-marks plan touches each row once and holds
    nothing.
    """
    from ..operators.partitioning import spread
    from ..operators.ranking import with_grouped_global_row_number

    li = read_table(spark, sf_dir, "lineitem")
    # Round 14: same keyed spread as quantile_deciles_price (solo
    # 1.44 -> 1.22s).
    c = spread(
        li.select("l_orderkey", "l_returnflag", "l_extendedprice"),
        by=["l_orderkey"],
    ).select(
        F.col("l_returnflag").alias("grp"),
        _cents("l_extendedprice").alias("cents"),
    )
    ranked = with_grouped_global_row_number(
        c, ["grp"], ["cents"], rn="rn", n_col="n"
    )
    g = ranked.select("grp", "n").distinct()
    qs = spark.range(1, 4).select(F.col("id").cast("int").alias("q"))
    marks = g.crossJoin(qs).select(
        F.col("grp").alias("m_grp"),
        "q",
        (F.expr("(q * (n - 1)) DIV 4") + 1).alias("rn_lo"),
        F.expr("(q * (n - 1)) % 4").alias("rem"),
        (
            F.expr("(q * (n - 1)) DIV 4")
            + 1
            + F.when(F.expr("(q * (n - 1)) % 4") > 0, 1).otherwise(0)
        ).alias("rn_hi"),
    )
    hit = ranked.join(
        F.broadcast(marks),
        (ranked.grp == marks.m_grp)
        & ((ranked.rn == marks.rn_lo) | (ranked.rn == marks.rn_hi)),
    )
    t1 = hit.groupBy("grp", "q").agg(
        F.max("n").alias("n"),
        F.max(F.when(F.col("rn") == F.col("rn_lo"), F.col("cents"))).alias(
            "v_lo"
        ),
        F.max(F.when(F.col("rn") == F.col("rn_hi"), F.col("cents"))).alias(
            "v_hi"
        ),
        F.max("rem").alias("rem"),
    )
    val = (
        F.col("v_lo") * (4 - F.col("rem")) + F.col("v_hi") * F.col("rem")
    ).cast("double") / 4.0
    t2 = t1.select("grp", "q", "n", val.alias("val"))
    return t2.groupBy("grp").agg(
        F.max("n").cast("bigint").alias("n"),
        F.max(F.when(F.col("q") == 1, F.col("val"))).alias("q1_cents"),
        F.max(F.when(F.col("q") == 2, F.col("val"))).alias("q2_cents"),
        F.max(F.when(F.col("q") == 3, F.col("val"))).alias("q3_cents"),
    )


# ---------------------------------------------------------------------------
# One-way ANOVA (does mean event value differ across event types?)
# ---------------------------------------------------------------------------


@query(
    "stats_anova_oneway",
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS s1,
             CAST(SUM(CAST(ROUND(value * value * 10000, 0) AS BIGINT)) AS BIGINT)
               AS s2
      FROM events GROUP BY event_type
    ),
    comp AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS n_total,
             SUM((CAST(s2 AS DOUBLE) / 10000.0)
                 - (CAST(s1 AS DOUBLE) / 100.0) * (CAST(s1 AS DOUBLE) / 100.0)
                   / CAST(n AS DOUBLE)) AS ssw,
             CAST(SUM(s1) AS BIGINT) AS s1_tot
      FROM g
    ),
    grand AS (
      SELECT g.event_type, g.n, g.s1, c.k, c.n_total, c.ssw,
             CAST(c.s1_tot AS DOUBLE) / 100.0 / CAST(c.n_total AS DOUBLE)
               AS grand_mean
      FROM g, comp c
    ),
    ssb_t AS (
      SELECT max(k) AS k, max(n_total) AS n_total, max(ssw) AS ssw,
             SUM(CAST(n AS DOUBLE)
                 * (CAST(s1 AS DOUBLE) / 100.0 / CAST(n AS DOUBLE) - grand_mean)
                 * (CAST(s1 AS DOUBLE) / 100.0 / CAST(n AS DOUBLE) - grand_mean))
               AS ssb
      FROM grand
    )
    SELECT k AS k_groups, n_total,
           ROUND(ssb / CAST(n_total AS DOUBLE), 6) AS ssb_per_row,
           ROUND(ssw / CAST(n_total AS DOUBLE), 6) AS ssw_per_row,
           ROUND((ssb / (CAST(k AS DOUBLE) - 1.0))
                 / (ssw / (CAST(n_total AS DOUBLE) - CAST(k AS DOUBLE))), 6)
             AS f_stat,
           ROUND(ssb / (ssb + ssw), 6) AS eta_squared
    FROM ssb_t
    """,
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA across event types: F = (SSB/(k-1)) / (SSW/(n-k))
    plus the eta-squared effect size, answering "does mean event value
    differ by type beyond noise?". Sufficient statistics (n, Sigma-v,
    Sigma-v-squared) are accumulated in FIXED-POINT bigints (value is
    exactly 2-decimal, so v*100 and the identical-expression double
    product v*v*1e4 round to the same integers on both engines; group
    sums stay far under 2^53 even at 100x sf0.1), then SSW/SSB use the
    closed forms over those exact integers so the only float work is a
    handful of identical expressions per group. Final stats ROUND(6)
    on both sides; the sums-of-squares are emitted as SCALE-STABLE
    per-row quantities (SS / n_total) so their absolute magnitude never
    outgrows the 6-decimal rounding granularity as row count scales
    (raw SS ~ 1e10 at sf0.1 would leave <1e-6 of ulp headroom;
    ADVICE r4).

    Scale shape: one map-side-combinable groupBy to k=|event_type|
    rows; everything after runs on k rows. No raw-row second pass, no
    global sort, no window over the fact table.
    """
    e = read_events(spark, sf_dir)
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("s1"),
        F.sum(
            F.round(F.col("value") * F.col("value") * 10000, 0).cast("bigint")
        ).alias("s2"),
    )
    comp = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("n_total"),
        F.sum(
            F.col("s2").cast("double") / 10000.0
            - (F.col("s1").cast("double") / 100.0)
            * (F.col("s1").cast("double") / 100.0)
            / F.col("n").cast("double")
        ).alias("ssw"),
        F.sum("s1").cast("bigint").alias("s1_tot"),
    )
    grand = g.crossJoin(F.broadcast(comp)).withColumn(
        "grand_mean",
        F.col("s1_tot").cast("double") / 100.0 / F.col("n_total").cast("double"),
    )
    mean_dev = (
        F.col("s1").cast("double") / 100.0 / F.col("n").cast("double")
        - F.col("grand_mean")
    )
    ssb_t = grand.agg(
        F.max("k").alias("k"),
        F.max("n_total").alias("n_total"),
        F.max("ssw").alias("ssw"),
        F.sum(F.col("n").cast("double") * mean_dev * mean_dev).alias("ssb"),
    )
    k_d = F.col("k").cast("double")
    n_d = F.col("n_total").cast("double")
    return ssb_t.select(
        F.col("k").alias("k_groups"),
        "n_total",
        F.round(F.col("ssb") / n_d, 6).alias("ssb_per_row"),
        F.round(F.col("ssw") / n_d, 6).alias("ssw_per_row"),
        F.round(
            (F.col("ssb") / (k_d - F.lit(1.0)))
            / (F.col("ssw") / (n_d - k_d)),
            6,
        ).alias("f_stat"),
        F.round(F.col("ssb") / (F.col("ssb") + F.col("ssw")), 6).alias(
            "eta_squared"
        ),
    )


# ---------------------------------------------------------------------------
# Cramér's V (effect size for lang × source association on documents)
# ---------------------------------------------------------------------------


@query(
    "stats_cramers_v",
    oracle="""
    WITH o AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS observed
      FROM documents GROUP BY lang, source
    ),
    m AS (
      SELECT lang, source, observed,
             CAST(SUM(observed) OVER (PARTITION BY lang) AS BIGINT) AS row_total,
             CAST(SUM(observed) OVER (PARTITION BY source) AS BIGINT) AS col_total,
             CAST(SUM(observed) OVER () AS BIGINT) AS grand_total
      FROM o
    ),
    s AS (
      SELECT max(grand_total) AS n,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS r,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS c,
             SUM((CAST(observed AS DOUBLE)
                  - CAST(row_total * col_total AS DOUBLE)
                    / CAST(grand_total AS DOUBLE))
                 * (CAST(observed AS DOUBLE)
                    - CAST(row_total * col_total AS DOUBLE)
                      / CAST(grand_total AS DOUBLE))
                 / (CAST(row_total * col_total AS DOUBLE)
                    / CAST(grand_total AS DOUBLE))) AS chi2
      FROM m
    )
    SELECT n, r, c, ROUND(chi2, 6) AS chi2,
           ROUND(sqrt(chi2 / (CAST(n AS DOUBLE)
                 * CAST(least(r - 1, c - 1) AS DOUBLE))), 6) AS cramers_v
    FROM s
    """,
)
def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V for the lang × source association on documents — the
    normalized [0,1] effect size sqrt(chi2 / (n·min(r-1,c-1))) that the
    chi-square statistic alone doesn't give. Expected counts are the
    identical double expression row·col/n over exact bigints; the chi2
    sum runs over only r×c contingency cells (≤100), so cross-engine
    summation-order drift is bounded far below the ROUND(6) pin on
    both sides.

    Scale shape: one map-side-combinable groupBy to r×c cells;
    marginals are windows over those cells, never the corpus.
    """
    d = read_table(spark, sf_dir, "documents")
    o = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("observed")
    )
    m = o.select(
        "lang",
        "source",
        "observed",
        F.sum("observed").over(Window.partitionBy("lang")).alias("row_total"),
        F.sum("observed").over(Window.partitionBy("source")).alias("col_total"),
        F.sum("observed").over(Window.partitionBy()).alias("grand_total"),
    )
    expected = (F.col("row_total") * F.col("col_total")).cast("double") / F.col(
        "grand_total"
    ).cast("double")
    dev = F.col("observed").cast("double") - expected
    s = m.agg(
        F.max("grand_total").alias("n"),
        F.countDistinct("lang").cast("bigint").alias("r"),
        F.countDistinct("source").cast("bigint").alias("c"),
        F.sum(dev * dev / expected).alias("chi2"),
    )
    return s.select(
        "n",
        "r",
        "c",
        F.round(F.col("chi2"), 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (
                    F.col("n").cast("double")
                    * F.least(F.col("r") - 1, F.col("c") - 1).cast("double")
                )
            ),
            6,
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# Pythagorean means (arithmetic / geometric / harmonic) per group
# ---------------------------------------------------------------------------


@query(
    "agg_geo_harmonic_means",
    oracle="""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND((SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) / 100.0)
                 / COUNT(*), 6) AS arith_mean,
           ROUND(exp(CAST(SUM(CAST(ln(l_quantity) AS DECIMAL(18,9)))
                          AS DOUBLE) / COUNT(*)), 6) AS geo_mean,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / CAST(SUM(CAST(1.0 / l_quantity AS DECIMAL(18,10)))
                        AS DOUBLE), 6) AS harm_mean
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_geo_harmonic_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three Pythagorean means of l_quantity per return flag —
    the rate/ratio aggregation surface (harmonic for rates, geometric
    for multiplicative factors) next to the plain average. Per-row
    ln(q) and 1/q are identical double expressions; each is quantized
    to a decimal whose GROUP-SUM integer form stays under 2^53 at 100x
    sf0.1 (scale 9 for ln ≤ 3.92, scale 10 for 1/q ≤ 1), accumulated
    exactly, and only then divided/exponentiated — so the engines'
    different summation orders can't drift. Final ROUND(6).

    Scale shape: one map-side-combinable groupBy; no second pass, no
    windows. Round 14: keyed :func:`spread` fans the per-row ln/1/q +
    decimal quantization off the single-row-group scan task (solo
    1.29 -> 0.49s); plan no-op on multi-row-group layouts.
    """
    from ..operators.partitioning import spread

    li = spread(
        read_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_returnflag", "l_quantity"
        ),
        by=["l_orderkey"],
    )
    q = F.col("l_quantity")
    n = F.count(F.lit(1))
    sum_cents = F.sum(F.round(q * 100, 0).cast("bigint"))
    sum_ln = F.sum(F.log(q).cast("decimal(18,9)")).cast("double")
    sum_inv = F.sum((F.lit(1.0) / q).cast("decimal(18,10)")).cast("double")
    return li.groupBy("l_returnflag").agg(
        n.cast("bigint").alias("n"),
        F.round((sum_cents / 100.0) / n, 6).alias("arith_mean"),
        F.round(F.exp(sum_ln / n), 6).alias("geo_mean"),
        F.round(n.cast("double") / sum_inv, 6).alias("harm_mean"),
    )


# ---------------------------------------------------------------------------
# Wilson confidence interval for a monthly proportion
# ---------------------------------------------------------------------------


@query(
    "stats_wilson_ci_return_rate",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS r
      FROM lineitem GROUP BY date_trunc('month', l_shipdate)
    )
    SELECT month, n, r,
           ROUND(CAST(r AS DOUBLE) / CAST(n AS DOUBLE), 9) AS p_hat,
           ROUND(((CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
                  + 1.9208 / CAST(n AS DOUBLE)
                  - 1.96 * sqrt(((CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
                       * (1.0 - CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
                       + 0.9604 / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)))
                 / (1.0 + 3.8416 / CAST(n AS DOUBLE)), 9) AS wilson_lo,
           ROUND(((CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
                  + 1.9208 / CAST(n AS DOUBLE)
                  + 1.96 * sqrt(((CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
                       * (1.0 - CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
                       + 0.9604 / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)))
                 / (1.0 + 3.8416 / CAST(n AS DOUBLE)), 9) AS wilson_hi
    FROM m
    """,
)
def stats_wilson_ci_return_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly return rate with a 95% Wilson score interval — the
    small-sample-safe CI (never leaves [0,1], unlike the normal
    approximation) for monitoring a proportion over time. Counts are
    exact; the Wilson closed form is one identical float expression of
    those counts (z=1.96 constants pre-squared: z²=3.8416,
    z²/2=1.9208, z²/4=0.9604), pinned with ROUND(9).

    Scale shape: one map-side-combinable groupBy to month grain; the
    CI math runs on month rows only.
    """
    li = read_table(spark, sf_dir, "lineitem")
    m = li.groupBy(
        F.date_trunc("month", F.col("l_shipdate")).cast("date").alias("month")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("r"),
    )
    nd = F.col("n").cast("double")
    p = F.col("r").cast("double") / nd
    half = F.lit(1.96) * F.sqrt((p * (F.lit(1.0) - p) + 0.9604 / nd) / nd)
    denom = F.lit(1.0) + 3.8416 / nd
    return m.select(
        "month",
        "n",
        "r",
        F.round(p, 9).alias("p_hat"),
        F.round((p + 1.9208 / nd - half) / denom, 9).alias("wilson_lo"),
        F.round((p + 1.9208 / nd + half) / denom, 9).alias("wilson_hi"),
    )


# ---------------------------------------------------------------------------
# Per-user behavioral entropy (how varied is each user's event mix?)
# ---------------------------------------------------------------------------


@query(
    "events_user_entropy_event_mix",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id, event_type
    ),
    t AS (
      SELECT user_id, CAST(SUM(cnt) AS BIGINT) AS n_total
      FROM c GROUP BY user_id
    ),
    u AS (
      SELECT c.user_id,
             CAST(MAX(t.n_total) AS BIGINT) AS n_events,
             CAST(COUNT(*) AS BIGINT) AS k_types,
             SUM(-(CAST(cnt AS DOUBLE) / CAST(t.n_total AS DOUBLE))
                 * ln(CAST(cnt AS DOUBLE) / CAST(t.n_total AS DOUBLE)))
               AS entropy
      FROM c JOIN t USING (user_id) GROUP BY c.user_id
    )
    SELECT user_id, n_events, k_types,
           ROUND(entropy, 9) AS entropy,
           ROUND(CASE WHEN k_types > 1
                      THEN entropy / ln(CAST(k_types AS DOUBLE))
                      ELSE 0.0 END, 9) AS norm_entropy
    FROM u
    """,
)
def events_user_entropy_event_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix, raw and
    normalized by ln(types-used) — the behavioral-diversity score that
    separates single-action bots (entropy 0) from organic users.
    Counts are exact; each p·ln(p) term is an identical double
    expression and the per-user sum spans at most |event types| terms,
    pinned with ROUND(9). Single-type users get normalized entropy 0
    (not a 0/0).

    Scale shape: one shuffle to (user, type) counts with map-side
    combine; the second aggregate reuses user partitioning. No windows
    over raw facts.
    """
    ev = read_events(spark, sf_dir)
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    tot = Window.partitionBy("user_id")
    p = F.col("cnt").cast("double") / F.sum("cnt").over(tot).cast("bigint").cast(
        "double"
    )
    terms = c.select(
        "user_id",
        "cnt",
        (-p * F.log(p)).alias("term"),
    )
    u = terms.groupBy("user_id").agg(
        F.sum("cnt").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("k_types"),
        F.sum("term").alias("entropy"),
    )
    return u.select(
        "user_id",
        "n_events",
        "k_types",
        F.round(F.col("entropy"), 9).alias("entropy"),
        F.round(
            F.when(
                F.col("k_types") > 1,
                F.col("entropy") / F.log(F.col("k_types").cast("double")),
            ).otherwise(0.0),
            9,
        ).alias("norm_entropy"),
    )


# ---------------------------------------------------------------------------
# Grouped OLS: price-on-size regression per brand (integer-exact moments)
# ---------------------------------------------------------------------------


@query(
    "part_brand_price_size_regression",
    oracle="""
    WITH m AS (
      SELECT p_brand,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(p_size) AS BIGINT) AS sx,
             CAST(SUM(CAST(ROUND(p_retailprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS sy,
             CAST(SUM(p_size * CAST(ROUND(p_retailprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS sxy,
             CAST(SUM(p_size * p_size) AS BIGINT) AS sxx
      FROM part GROUP BY p_brand
    )
    SELECT p_brand, n,
           ROUND(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) / 100.0, 9)
             AS slope,
           ROUND((CAST(sy AS DOUBLE) / 100.0
                  - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) / 100.0
                    * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE), 9) AS intercept
    FROM m
    """,
)
def part_brand_price_size_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS of retail price on part size — GROUPED regression
    (one model per brand in a single pass), the segmentation twin of
    the global agg_regr_slope_intercept. Moments (n, Σx, Σy, Σxy, Σx²)
    accumulate as exact int64s (price in cents, size a small int), and
    slope/intercept are identical closed-form double expressions of
    those integers, ROUND(9).

    Scale shape: one map-side-combinable groupBy; models-per-group
    math runs on |brands| rows. No second pass, no windows.
    """
    p = read_table(spark, sf_dir, "part")
    cents = F.round(F.col("p_retailprice") * 100, 0).cast("bigint")
    m = p.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("p_size").cast("bigint").alias("sx"),
        F.sum(cents).cast("bigint").alias("sy"),
        F.sum(F.col("p_size") * cents).cast("bigint").alias("sxy"),
        F.sum(F.col("p_size") * F.col("p_size")).cast("bigint").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    slope_cents = (nd * F.col("sxy").cast("double") - sx * sy) / (
        nd * F.col("sxx").cast("double") - sx * sx
    )
    return m.select(
        "p_brand",
        "n",
        F.round(slope_cents / 100.0, 9).alias("slope"),
        F.round((sy / 100.0 - slope_cents / 100.0 * sx) / nd, 9).alias(
            "intercept"
        ),
    )


# ---------------------------------------------------------------------------
# Whole-table numeric profile: IQR fences for every column in one pass
# ---------------------------------------------------------------------------


@query(
    "quality_multi_column_iqr",
    oracle="""
    WITH c AS (
      SELECT col_name, cents FROM (
        SELECT 'quantity' AS col_name,
               CAST(ROUND(l_quantity * 100, 0) AS BIGINT) AS cents
        FROM lineitem
        UNION ALL
        SELECT 'extendedprice',
               CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) FROM lineitem
        UNION ALL
        SELECT 'discount',
               CAST(ROUND(l_discount * 100, 0) AS BIGINT) FROM lineitem
        UNION ALL
        SELECT 'tax', CAST(ROUND(l_tax * 100, 0) AS BIGINT) FROM lineitem
      )
    ),
    ranked AS (
      SELECT col_name, cents,
             row_number() OVER (PARTITION BY col_name ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY col_name) AS n
      FROM c
    ),
    q AS (
      SELECT col_name, CAST(MAX(n) AS BIGINT) AS n,
             MAX(CASE WHEN rn = (n - 1) // 4 + 1 THEN cents END) AS q1_cents,
             MAX(CASE WHEN rn = (n - 1) // 2 + 1 THEN cents END) AS med_cents,
             MAX(CASE WHEN rn = (3 * (n - 1)) // 4 + 1 THEN cents END)
               AS q3_cents
      FROM ranked GROUP BY col_name
    )
    SELECT c.col_name, MAX(q.n) AS n,
           MAX(q.q1_cents) AS q1_cents, MAX(q.med_cents) AS med_cents,
           MAX(q.q3_cents) AS q3_cents,
           CAST(SUM(CASE WHEN 2 * c.cents < 5 * q.q1_cents - 3 * q.q3_cents
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
           CAST(SUM(CASE WHEN 2 * c.cents > 5 * q.q3_cents - 3 * q.q1_cents
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_above
    FROM c JOIN q ON c.col_name = q.col_name
    GROUP BY c.col_name
    """,
)
def quality_multi_column_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass numeric table profile: every lineitem money/measure
    column is UNPIVOTed to (column, value) rows, quartiles come from
    ONE grouped parallel ranking over all columns at once (column name
    = group key), and Tukey 1.5·IQR outlier counts land per column —
    the data-profiling sweep that would otherwise run N separate
    quantile jobs. All order statistics are exact value-at-index; the
    fences are the 2·x vs 5·Q1−3·Q3 integer cross-multiplication.

    Scale shape: quantiles come from the VALUE-GRAIN cumulative
    histogram — one map-side-combinable groupBy to (column, distinct
    value) counts, then the per-column cumulative sums run through
    ``with_grouped_global_prefix_sum`` (round-9): one range shuffle of
    the histogram on (column, value), a ≤P·4-row offsets collect, and
    a per-(partition, column) parallel window — so even a column whose
    value domain rivals its row count (near-unique prices) never
    funnels through one task. The 4-row fence table broadcasts back
    onto the same pinned histogram. Columns profile in parallel.
    """
    from ..operators.partitioning import spread

    # Round 14: spread the raw 4-column projection BEFORE the 4x stack
    # fan-out so the unpivot + cents casts + histogram partial agg run
    # cores-wide instead of inside the single-row-group scan task
    # (solo 2.69 -> 2.24s). Keyed by the CHEAP bigint l_orderkey so the
    # scan task pays only one int hash per row — hashing the decimal
    # values themselves would keep the heavy math on the starved task.
    li = spread(
        read_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax"
        ),
        by=["l_orderkey"],
    )
    c = li.selectExpr(
        "stack(4,"
        " 'quantity', CAST(ROUND(l_quantity * 100, 0) AS BIGINT),"
        " 'extendedprice', CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT),"
        " 'discount', CAST(ROUND(l_discount * 100, 0) AS BIGINT),"
        " 'tax', CAST(ROUND(l_tax * 100, 0) AS BIGINT)"
        ") AS (col_name, cents)"
    )
    from ..operators.ranking import with_grouped_global_prefix_sum

    vc = c.groupBy("col_name", "cents").agg(F.count(F.lit(1)).alias("cnt"))
    # the operator pins its range exchange internally; BOTH downstream
    # branches (quantiles and fences) read that one materialization
    cum = with_grouped_global_prefix_sum(
        vc, ["col_name"], ["cents"], "cnt", cum="cum", n_col="n"
    ).withColumn("cum_prev", F.col("cum") - F.col("cnt"))
    r1 = F.expr("(n - 1) DIV 4 + 1")
    r2 = F.expr("(n - 1) DIV 2 + 1")
    r3 = F.expr("(3 * (n - 1)) DIV 4 + 1")
    q = cum.groupBy("col_name").agg(
        F.max("n").cast("bigint").alias("n"),
        F.max(
            F.when((F.col("cum_prev") < r1) & (r1 <= F.col("cum")), F.col("cents"))
        ).alias("q1_cents"),
        F.max(
            F.when((F.col("cum_prev") < r2) & (r2 <= F.col("cum")), F.col("cents"))
        ).alias("med_cents"),
        F.max(
            F.when((F.col("cum_prev") < r3) & (r3 <= F.col("cum")), F.col("cents"))
        ).alias("q3_cents"),
    )
    # Fence counts come from the SAME value-grain histogram (via the
    # operator's pinned exchange), not a second scan of the stacked
    # fact table: sum cnt over the histogram rows outside the fences.
    hist = cum.select("col_name", "cents", "cnt")
    j = hist.join(F.broadcast(q), "col_name")
    return j.groupBy("col_name").agg(
        F.max("n").alias("n"),
        F.max("q1_cents").alias("q1_cents"),
        F.max("med_cents").alias("med_cents"),
        F.max("q3_cents").alias("q3_cents"),
        F.sum(
            F.when(
                2 * F.col("cents") < 5 * F.col("q1_cents") - 3 * F.col("q3_cents"),
                F.col("cnt"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_below"),
        F.sum(
            F.when(
                2 * F.col("cents") > 5 * F.col("q3_cents") - 3 * F.col("q1_cents"),
                F.col("cnt"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_above"),
    )


# ---------------------------------------------------------------------------
# Fulfillment latency percentiles per priority (grouped ranking consumer)
# ---------------------------------------------------------------------------


@query(
    "orders_fulfillment_latency_quartiles",
    oracle="""
    WITH lat AS (
      SELECT o.o_orderpriority AS grp,
             CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
               AS days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    ranked AS (
      SELECT grp, days,
             row_number() OVER (PARTITION BY grp ORDER BY days) AS rn,
             COUNT(*) OVER (PARTITION BY grp) AS n
      FROM lat
    )
    SELECT grp, CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX(CASE WHEN rn = (1 * (n - 1)) // 4 + 1 THEN days END)
                AS BIGINT) AS q1_days,
           CAST(MAX(CASE WHEN rn = (2 * (n - 1)) // 4 + 1 THEN days END)
                AS BIGINT) AS q2_days,
           CAST(MAX(CASE WHEN rn = (3 * (n - 1)) // 4 + 1 THEN days END)
                AS BIGINT) AS q3_days
    FROM ranked GROUP BY grp
    """,
)
def orders_fulfillment_latency_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency quartiles per order priority — the SLA
    dashboard: days between order placement and each line item's ship
    date, type-1 quartiles per priority. Integer day latencies make
    the order statistics engine-exact (positions with duplicate values
    are value-determined — the lineitem tie rule).

    Scale shape (round 14, the histogram-grain variant): integer day
    latencies have a BOUNDED domain (~a few hundred distinct values —
    measured 1:5000 distinct:rows at sf0.1), so the rank engine is a
    (priority, days) HISTOGRAM — one map-side-combinable aggregate
    whose output is ~600 rows — with quartiles read off the cumulative
    counts (value at rank r = smallest days with cum ≥ r, identical to
    the row-grain rn hit by monotonicity). This replaces the row-grain
    range shuffle + offsets collect + rank math of
    ``with_grouped_global_row_number`` (the right engine for
    NEAR-UNIQUE domains like prices, where a histogram degenerates to
    the row grain — the round-14 domain measurement is what routes
    each key).
    """
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lat = o.join(l, o.o_orderkey == l.l_orderkey).select(
        F.col("o_orderpriority").alias("grp"),
        F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("days"),
    )
    hist = lat.groupBy("grp", "days").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wcum = (
        Window.partitionBy("grp")
        .orderBy("days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("grp")
    cum = hist.select(
        "grp",
        "days",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    rk = [F.expr(f"({k} * (n - 1)) DIV 4 + 1") for k in (1, 2, 3)]
    return cum.groupBy("grp").agg(
        F.max("n").cast("bigint").alias("n"),
        F.min(F.when(F.col("cum") >= rk[0], F.col("days")))
        .cast("bigint")
        .alias("q1_days"),
        F.min(F.when(F.col("cum") >= rk[1], F.col("days")))
        .cast("bigint")
        .alias("q2_days"),
        F.min(F.when(F.col("cum") >= rk[2], F.col("days")))
        .cast("bigint")
        .alias("q3_days"),
    )


# ---------------------------------------------------------------------------
# Monthly categorical drift monitor (chi-square vs the global mix)
# ---------------------------------------------------------------------------


@query(
    "orders_priority_mix_drift_monthly",
    oracle="""
    WITH cell AS (
      SELECT CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS ym,
             o_orderpriority AS pri, CAST(COUNT(*) AS BIGINT) AS obs
      FROM orders GROUP BY ym, pri
    ),
    m AS (
      SELECT ym, pri, obs,
             CAST(SUM(obs) OVER (PARTITION BY ym) AS BIGINT) AS month_n,
             CAST(SUM(obs) OVER (PARTITION BY pri) AS BIGINT) AS pri_n,
             CAST(SUM(obs) OVER () AS BIGINT) AS total_n
      FROM cell
    )
    SELECT ym, CAST(MAX(month_n) AS BIGINT) AS n_orders,
           ROUND(SUM(
             (CAST(obs AS DOUBLE)
              - CAST(month_n AS DOUBLE) * CAST(pri_n AS DOUBLE)
                / CAST(total_n AS DOUBLE))
             * (CAST(obs AS DOUBLE)
                - CAST(month_n AS DOUBLE) * CAST(pri_n AS DOUBLE)
                  / CAST(total_n AS DOUBLE))
             / (CAST(month_n AS DOUBLE) * CAST(pri_n AS DOUBLE)
                / CAST(total_n AS DOUBLE))), 6) AS chi2
    FROM m GROUP BY ym
    """,
)
def orders_priority_mix_drift_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical drift monitor: per month, the chi-square statistic
    of that month's order-priority mix against the expectation under
    the GLOBAL mix (expected cell = month_n·pri_n/total_n) — the
    relational sibling of the text KL-drift check, flagging months
    whose intake distribution shifted. All inputs are exact integer
    counts; chi2 is an identical closed-form expression of identical
    integers on both sides, ROUND(6) per the composed-float rule.

    Scale shape: the fact table collapses to the (month, priority)
    grid map-side (≤ months×5 rows); the margin windows run over that
    tiny grid, never over raw orders.
    """
    o = read_table(spark, sf_dir, "orders")
    cell = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.col("o_orderpriority").alias("pri"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("obs"))
    m = cell.select(
        "ym",
        "pri",
        "obs",
        F.sum("obs").over(Window.partitionBy("ym")).cast("bigint").alias(
            "month_n"
        ),
        F.sum("obs").over(Window.partitionBy("pri")).cast("bigint").alias(
            "pri_n"
        ),
        F.sum("obs").over(Window.partitionBy()).cast("bigint").alias("total_n"),
    )
    exp = (
        F.col("month_n").cast("double")
        * F.col("pri_n").cast("double")
        / F.col("total_n").cast("double")
    )
    dev = F.col("obs").cast("double") - exp
    return m.groupBy("ym").agg(
        F.max("month_n").cast("bigint").alias("n_orders"),
        F.round(F.sum(dev * dev / exp), 6).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# Brand neighborhood Jaccard (item-item co-purchase similarity)
# ---------------------------------------------------------------------------


@query(
    "graph_brand_neighborhood_jaccard",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    sz AS (SELECT brand, COUNT(*) AS s FROM ob GROUP BY brand),
    com AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS c
      FROM ob a JOIN ob b ON a.ok = b.ok AND a.brand < b.brand
      GROUP BY a.brand, b.brand
    )
    SELECT brand_a, brand_b, CAST(c AS BIGINT) AS n_common_orders,
           CAST(sa.s + sb.s - c AS BIGINT) AS n_union_orders
    FROM com JOIN sz sa ON sa.brand = brand_a
             JOIN sz sb ON sb.brand = brand_b
    WHERE 20 * c >= sa.s + sb.s - c
    """,
)
def graph_brand_neighborhood_jaccard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Item-item co-purchase similarity: Jaccard of two brands' ORDER
    sets (the collaborative-filtering "customers who bought X also
    bought Y" primitive), emitted as exact integer (common, union)
    counts for pairs above a 5% overlap floor — the threshold compares
    in integer cross-multiplication (20·common ≥ union), never a float
    share.

    Scale shape: the co-occurrence join keys on the ORDER (inverted
    index — per-order pair fan-out bounded by order size², never
    all-brand-pairs over the corpus); sizes and the pair frame are
    brand-domain-bounded (≤ |brands|² rows) and broadcast onto the
    aggregate. Same graph grain as graph_triangle_count_brands.
    """
    sets = pin(_order_brand_sets(spark, sf_dir), eager=False)
    sz = (
        sets.select(F.explode("bs").alias("brand"))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).alias("s"))
    )
    com = (
        sets.select(F.explode(F.expr(_BRAND_PAIR_EXPR)).alias("p"))
        .groupBy(
            F.col("p.u").alias("brand_a"),
            F.col("p.v").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sz.select(F.col("brand").alias("brand_a"), F.col("s").alias("sa"))
    sb = sz.select(F.col("brand").alias("brand_b"), F.col("s").alias("sb"))
    return (
        com.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .select(
            "brand_a",
            "brand_b",
            F.col("c").cast("bigint").alias("n_common_orders"),
            (F.col("sa") + F.col("sb") - F.col("c"))
            .cast("bigint")
            .alias("n_union_orders"),
        )
        .filter(
            F.lit(20) * F.col("n_common_orders") >= F.col("n_union_orders")
        )
    )


# ---------------------------------------------------------------------------
# Cross-table order-total consistency audit (data quality)
# ---------------------------------------------------------------------------


@query(
    "quality_order_total_consistency",
    oracle="""
    WITH li AS (
      SELECT l_orderkey,
             CAST(SUM(
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               * (100 + CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT))
               * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                        AS BIGINT))
             ) AS BIGINT) AS recomputed_u
      FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
      SELECT o.o_orderstatus,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               * 10000 AS stored_u,
             li.recomputed_u
      FROM orders o JOIN li ON li.l_orderkey = o.o_orderkey
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN stored_u = recomputed_u THEN 1 ELSE 0 END)
                AS BIGINT) AS n_consistent,
           CAST(SUM(CASE WHEN stored_u <> recomputed_u THEN 1 ELSE 0 END)
                AS BIGINT) AS n_mismatched
    FROM j GROUP BY o_orderstatus
    """,
)
def quality_order_total_consistency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-table consistency audit — the referential DQ check every
    warehouse runs: does each order's stored o_totalprice equal the
    TPC-H recomputation Σ extendedprice·(1+tax)·(1−discount) over its
    line items? Both sides evaluate in EXACT integer micro-units
    (cents × basis-point factors = 1e-6 dollars in int64; per-order
    sums « 2^53), so equal/unequal can never wobble on float rounding
    — the audit counts whatever the generator actually produced,
    identically on both engines.

    Scale shape: one map-side-combinable per-order aggregate of
    lineitem, one equi-join to orders on its key, one enum-grain
    rollup. Int64 bound: max per-order recomputed ≈ 7 items × 1e7
    cents × 1e4 ≈ 7e11 « 2^63.
    """
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    ep = _cents("l_extendedprice")
    tax = _cents("l_tax")
    disc = _cents("l_discount")
    rec = li.groupBy("l_orderkey").agg(
        F.sum(ep * (F.lit(100) + tax) * (F.lit(100) - disc))
        .cast("bigint")
        .alias("recomputed_u")
    )
    j = o.join(rec, o.o_orderkey == rec.l_orderkey).select(
        "o_orderstatus",
        (_cents("o_totalprice") * F.lit(10000)).alias("stored_u"),
        "recomputed_u",
    )
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(
            F.when(F.col("stored_u") == F.col("recomputed_u"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_consistent"),
        F.sum(
            F.when(F.col("stored_u") != F.col("recomputed_u"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_mismatched"),
    )


# ---------------------------------------------------------------------------
# Theil–Sen robust trend (median of pairwise slopes) per event type
# ---------------------------------------------------------------------------


@query(
    "stats_theil_sen_trend",
    oracle="""
    WITH d AS (
      SELECT event_type,
             DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, x
    ),
    s AS (
      SELECT a.event_type,
             CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope,
             a.x AS x1, b.x AS x2
      FROM d a JOIN d b
        ON a.event_type = b.event_type AND a.x < b.x
    ),
    r AS (
      SELECT event_type, slope,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY slope, x1, x2
             ) AS BIGINT) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM s
    )
    SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_pairs,
           (MAX(CASE WHEN rn = (n + 1) // 2 THEN slope END)
            + MAX(CASE WHEN rn = n // 2 + 1 THEN slope END)) / 2.0
             AS median_slope
    FROM r GROUP BY event_type
    """,
)
def stats_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of the daily event-count series per
    event type: the MEDIAN of all pairwise slopes — the
    breakdown-resistant alternative to least-squares (one anomalous
    day cannot drag the estimate). Slopes are quotients of identical
    integers (count deltas over epoch-day deltas) so the doubles are
    bit-equal cross-engine; the median reads VALUES at two ranks of a
    (slope, x1, x2)-ordered total order — value-determined under ties
    per the repo quantile rule — and averages them (odd n reads the
    middle twice).

    Scale shape: the pairwise blowup is DAY-DOMAIN-bounded (days²/2
    per type, corpus-free — the fact table collapses to |type|×|days|
    rows map-side first); the ranking window runs on that bounded
    aggregate, never on raw events."""
    e = read_events(spark, sf_dir)
    d = e.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")).alias("x"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    a, b = d.alias("a"), d.alias("b")
    s = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.x") < F.col("b.x")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.x") - F.col("a.x")).cast("double")
        ).alias("slope"),
        F.col("a.x").alias("x1"),
        F.col("b.x").alias("x2"),
    )
    w = Window.partitionBy("event_type").orderBy("slope", "x1", "x2")
    wn = Window.partitionBy("event_type")
    r = s.select(
        "event_type",
        "slope",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
    )
    return r.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_pairs"),
        (
            (
                F.max(
                    F.when(
                        F.col("rn") == F.expr("(n + 1) DIV 2"),
                        F.col("slope"),
                    )
                )
                + F.max(
                    F.when(
                        F.col("rn") == F.expr("n DIV 2 + 1"),
                        F.col("slope"),
                    )
                )
            )
            / F.lit(2.0)
        ).alias("median_slope"),
    )


# ---------------------------------------------------------------------------
# Threshold-crossing detection over ordered series (alerting primitive)
# ---------------------------------------------------------------------------


@query(
    "events_threshold_crossings",
    oracle="""
    WITH x AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc,
             lead(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
             ) AS nvc
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN vc < 10000 AND nvc >= 10000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_up_crossings,
           CAST(SUM(CASE WHEN vc >= 10000 AND nvc < 10000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_down_crossings
    FROM x WHERE nvc IS NOT NULL GROUP BY event_type
    """,
)
def events_threshold_crossings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-crossing detection per event type — the alerting
    primitive (how often does the value series cross the 100.00 alarm
    level, in each direction?). A crossing is a property of ADJACENT
    elements in the (ts, event_id) total order, so it rides
    :func:`operators.ranking.with_grouped_lead` — one range shuffle +
    local vectorized shifts with a ≤P-row boundary handoff, no
    per-type single-task sort, no self-join. Counts are exact integer
    comparisons of exact cents.

    Scale shape: the lead is computed partition-locally after one
    range shuffle (the with_grouped_lead boundary pattern); the final
    aggregate is |type| rows, map-side combinable.
    """
    from ..operators.ranking import with_grouped_lead

    e = read_events(spark, sf_dir)
    base = e.select(
        "event_type", _cents("value").alias("vc"), "ts", "event_id"
    )
    led = with_grouped_lead(
        base, ["event_type"], ["ts", "event_id"], {"vc": "nvc"}
    )
    x = led.where(F.col("nvc").isNotNull())
    t = F.lit(10000)
    return x.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.when((F.col("vc") < t) & (F.col("nvc") >= t), 1).otherwise(0))
        .cast("bigint")
        .alias("n_up_crossings"),
        F.sum(F.when((F.col("vc") >= t) & (F.col("nvc") < t), 1).otherwise(0))
        .cast("bigint")
        .alias("n_down_crossings"),
    )


@query(
    "orders_mann_kendall_trend",
    oracle="""
    WITH m AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS yc
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN b.yc > a.yc THEN 1
                           WHEN b.yc < a.yc THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
      FROM m a JOIN m b ON b.month > a.month
    ),
    ties AS (
      SELECT COALESCE(CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT), 0)
               AS tie_term
      FROM (SELECT COUNT(*) AS t FROM m GROUP BY yc) WHERE t > 1
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM m)
    SELECT n AS n_months, s_stat,
           CAST(n * (n - 1) * (2 * n + 5) - tie_term AS BIGINT) AS var_x18,
           ROUND((CAST(s_stat AS DOUBLE)
                  - CAST(CASE WHEN s_stat > 0 THEN 1
                              WHEN s_stat < 0 THEN -1 ELSE 0 END AS DOUBLE))
                 / sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE)
                        / 18.0), 9) AS z_score
    FROM s, ties, nn
    """,
)
def orders_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall non-parametric trend test over monthly revenue —
    the distribution-free 'is this series trending?' answer robust to
    outliers and seasonality spikes. S = Σ_{i<j} sign(y_j − y_i) and
    the tie-corrected variance numerator (·18) stay exact int64; only
    the final continuity-corrected z-score is float (one identical
    expression, rounded to 9).

    Scale shape: the distributed work is the monthly rollup; the
    O(m²) pair sum runs on the ~80-row MONTH frame (bounded by the
    calendar, broadcast-joined), never on the fact table."""
    o = read_table(spark, sf_dir, "orders")
    cents = F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
    m = (
        o.groupBy(F.trunc("o_orderdate", "month").alias("month"))
        .agg(F.sum(cents).cast("bigint").alias("yc"))
        .transform(pin, eager=False)
    )
    a, b = m.alias("a"), m.alias("b")
    s = (
        a.join(F.broadcast(b), F.col("b.month") > F.col("a.month"))
        .agg(
            F.sum(
                F.when(F.col("b.yc") > F.col("a.yc"), 1)
                .when(F.col("b.yc") < F.col("a.yc"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    ties = (
        m.groupBy("yc")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ).cast("bigint"),
                F.lit(0).cast("bigint"),
            ).alias("tie_term")
        )
    )
    nn = m.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    var_x18 = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("tie_term")
    ).cast("bigint")
    sgn = (
        F.when(F.col("s_stat") > 0, 1)
        .when(F.col("s_stat") < 0, -1)
        .otherwise(0)
    )
    z = (
        F.col("s_stat").cast("double") - sgn.cast("double")
    ) / F.sqrt(var_x18.cast("double") / 18.0)
    return (
        s.crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(nn))
        .select(
            F.col("n").alias("n_months"),
            "s_stat",
            var_x18.alias("var_x18"),
            F.round(z, 9).alias("z_score"),
        )
    )


@query(
    "quality_ks_two_sample_drift",
    oracle="""
    WITH v AS (
      SELECT length(text) AS val,
             CASE WHEN CAST(substr(source, 4) AS INT) < 10
                  THEN 1 ELSE 0 END AS in_a
      FROM documents
    ),
    g AS (
      SELECT val,
             CAST(SUM(in_a) AS BIGINT) AS c_a,
             CAST(SUM(1 - in_a) AS BIGINT) AS c_b
      FROM v GROUP BY val
    ),
    nn AS (
      SELECT CAST(SUM(c_a) AS BIGINT) AS n_a,
             CAST(SUM(c_b) AS BIGINT) AS n_b
      FROM g
    ),
    cum AS (
      SELECT CAST(SUM(c_a) OVER (ORDER BY val) AS BIGINT) AS ca,
             CAST(SUM(c_b) OVER (ORDER BY val) AS BIGINT) AS cb
      FROM g
    )
    SELECT n_a, n_b,
           CAST(MAX(ABS(ca * n_b - cb * n_a)) AS BIGINT) AS d_numerator,
           CAST(MAX(ABS(ca * n_b - cb * n_a)) AS DOUBLE)
             / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS d_stat
    FROM cum, nn
    GROUP BY n_a, n_b
    """,
)
def quality_ks_two_sample_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between two source
    cohorts (src0-9 vs src10-19) on document length: D = max |F_A −
    F_B| over the empirical CDFs. Computed ENTIRELY in integers —
    D's numerator max|ca·n_b − cb·n_a| is exact int64 and the single
    final division is the same two doubles on both engines — so the
    classic drift gate ('did this source's length distribution move?')
    is bit-exact, no binning, no approximation.

    Scale shape: value-grain CDF — one map-side-combinable groupBy to
    (value, cohort counts), then ONE ordered window over the value
    domain (bounded by distinct lengths, not row count) and a scalar
    max. The fact table is never sorted."""
    d = read_table(spark, sf_dir, "documents")
    in_a = (
        F.substring("source", 4, 10).cast("int") < 10
    ).cast("int")
    g = (
        d.select(F.length("text").alias("val"), in_a.alias("in_a"))
        .groupBy("val")
        .agg(
            F.sum("in_a").cast("bigint").alias("c_a"),
            F.sum(1 - F.col("in_a")).cast("bigint").alias("c_b"),
        )
    )
    nn = g.agg(
        F.sum("c_a").cast("bigint").alias("n_a"),
        F.sum("c_b").cast("bigint").alias("n_b"),
    )
    wcum = Window.orderBy("val").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = g.select(
        F.sum("c_a").over(wcum).cast("bigint").alias("ca"),
        F.sum("c_b").over(wcum).cast("bigint").alias("cb"),
    )
    num = F.max(
        F.abs(F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a"))
    ).cast("bigint")
    return (
        cum.crossJoin(F.broadcast(nn))
        .groupBy("n_a", "n_b")
        .agg(
            num.alias("d_numerator"),
            (
                num.cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("d_stat"),
        )
    )


@query(
    "stats_runs_test_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS cents
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    diffs AS (
      SELECT d, cents - LAG(cents) OVER (ORDER BY d) AS diff
      FROM daily
    ),
    signs AS (
      SELECT d, CASE WHEN diff > 0 THEN 1 ELSE 0 END AS up
      FROM diffs WHERE diff IS NOT NULL AND diff <> 0
    ),
    flips AS (
      SELECT up,
             CASE WHEN up <> LAG(up) OVER (ORDER BY d) THEN 1 ELSE 0 END
               AS flip
      FROM signs
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(up) AS BIGINT) AS n1,
             CAST(COUNT(*) - SUM(up) AS BIGINT) AS n2,
             CAST(1 + SUM(flip) AS BIGINT) AS runs
      FROM flips
    )
    SELECT n AS n_moves, n1 AS n_up, n2 AS n_down, runs,
           ROUND((runs - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
                 / sqrt((2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2))
                        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))), 6)
             AS z_runs
    FROM s
    """,
)
def stats_runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test for randomness of the daily-revenue
    up/down sequence: too FEW runs means trending (momentum), too many
    means oscillation — a drift detector with a closed-form null. Daily
    sums are exact cents (bigint), signs and the run count R are pure
    integer window arithmetic, and only the final z-statistic touches
    doubles — an identical closed-form expression on both engines,
    rounded to 6 (composed-float rule).

    Scale shape: one partial-aggregated groupBy(day) shrinks the table
    to ~hundreds of rows; every window after that runs on the tiny
    daily series in a single task. The heavy input never shuffles
    twice."""
    e = read_events(spark, sf_dir)
    daily = (
        e.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.sum(_cents("value")).cast("bigint").alias("cents"))
    )
    # day grain: bounded (one row per calendar day)
    w = Window.orderBy("d")
    signs = (
        daily.withColumn("diff", F.col("cents") - F.lag("cents").over(w))
        .filter(F.col("diff").isNotNull() & (F.col("diff") != 0))
        .withColumn("up", F.when(F.col("diff") > 0, 1).otherwise(0))
    )
    flips = signs.withColumn(
        "flip",
        F.when(F.col("up") != F.lag("up").over(w), 1).otherwise(0),
    )
    s = flips.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("up").cast("bigint").alias("n1"),
        (F.count(F.lit(1)) - F.sum("up")).cast("bigint").alias("n2"),
        (F.lit(1) + F.sum("flip")).cast("bigint").alias("runs"),
    )
    return s.select(
        F.col("n").alias("n_moves"),
        F.col("n1").alias("n_up"),
        F.col("n2").alias("n_down"),
        F.col("runs"),
        F.round(
            F.expr(
                "(runs - (2.0 * n1 * n2 / (n1 + n2) + 1.0))"
                " / sqrt((2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2))"
                "        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0)))"
            ),
            6,
        ).alias("z_runs"),
    )


@query(
    "stats_levene_brown_forsythe",
    oracle="""
    WITH g0 AS (
      SELECT event_type,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      FROM events
    ),
    meds AS (
      SELECT event_type, cents,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM g0
    ),
    med AS (
      SELECT event_type, cents AS med_cents
      FROM meds WHERE rn = (n + 1) // 2
    ),
    z AS (
      SELECT g0.event_type,
             abs(g0.cents - m.med_cents) AS zc
      FROM g0 JOIN med m ON g0.event_type = m.event_type
    ),
    g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(zc) AS BIGINT) AS s1,
             CAST(SUM(zc * zc) AS BIGINT) AS s2
      FROM z GROUP BY event_type
    ),
    comp AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS n_total,
             SUM((CAST(s2 AS DOUBLE) / 10000.0)
                 - (CAST(s1 AS DOUBLE) / 100.0) * (CAST(s1 AS DOUBLE) / 100.0)
                   / CAST(n AS DOUBLE)) AS ssw,
             CAST(SUM(s1) AS BIGINT) AS s1_tot
      FROM g
    ),
    grand AS (
      SELECT g.event_type, g.n, g.s1, c.k, c.n_total, c.ssw,
             CAST(c.s1_tot AS DOUBLE) / 100.0 / CAST(c.n_total AS DOUBLE)
               AS grand_mean
      FROM g, comp c
    ),
    ssb_t AS (
      SELECT max(k) AS k, max(n_total) AS n_total, max(ssw) AS ssw,
             SUM(CAST(n AS DOUBLE)
                 * (CAST(s1 AS DOUBLE) / 100.0 / CAST(n AS DOUBLE) - grand_mean)
                 * (CAST(s1 AS DOUBLE) / 100.0 / CAST(n AS DOUBLE) - grand_mean))
               AS ssb
      FROM grand
    )
    SELECT k AS k_groups, n_total,
           ROUND(ssb / CAST(n_total AS DOUBLE), 6) AS ssb_per_row,
           ROUND(ssw / CAST(n_total AS DOUBLE), 6) AS ssw_per_row,
           ROUND((ssb / (CAST(k AS DOUBLE) - 1.0))
                 / (ssw / (CAST(n_total AS DOUBLE) - CAST(k AS DOUBLE))), 6)
             AS bf_stat
    FROM ssb_t
    """,
)
def stats_levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe (median-centered Levene) test for EQUAL VARIANCE
    across event types — the homoscedasticity gate one runs before
    trusting the one-way ANOVA's F (stats_anova_oneway is its sibling:
    same closed forms, applied here to z = |x − group median|). The
    group median is a value-at-index order statistic (exact int cents,
    value-determined so duplicate values make the tie-break
    irrelevant), z is an exact integer, and the sufficient statistics
    (n, Σz, Σz²) are exact int64 per group — only the final k-row
    reduction touches doubles, with scale-stable per-row outputs
    ROUND(6) (same magnitude discipline that got ANOVA through the
    sf0.1 gate; Σz² stays under 2^63 to ~1e9 rows per group at these
    value magnitudes).

    Scale shape: one window per event_type for the median (per-key
    sort, the natural partitioning), one broadcast-sized median join
    back, then a map-side-combinable groupBy to k rows."""
    e = read_events(spark, sf_dir)
    g0 = e.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    w_rn = Window.partitionBy("event_type").orderBy("cents")
    w_n = Window.partitionBy("event_type")
    med = (
        g0.withColumn("rn", F.row_number().over(w_rn))
        .withColumn("n", F.count(F.lit(1)).over(w_n))
        .filter(F.col("rn") == F.expr("(n + 1) DIV 2"))
        .select("event_type", F.col("cents").alias("med_cents"))
    )
    z = g0.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.abs(F.col("cents") - F.col("med_cents")).alias("zc"),
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("zc").cast("bigint").alias("s1"),
        F.sum(F.col("zc") * F.col("zc")).cast("bigint").alias("s2"),
    )
    comp = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("n_total"),
        F.sum(
            F.col("s2").cast("double") / 10000.0
            - (F.col("s1").cast("double") / 100.0)
            * (F.col("s1").cast("double") / 100.0)
            / F.col("n").cast("double")
        ).alias("ssw"),
        F.sum("s1").cast("bigint").alias("s1_tot"),
    )
    grand = g.crossJoin(F.broadcast(comp)).withColumn(
        "grand_mean",
        F.col("s1_tot").cast("double") / 100.0 / F.col("n_total").cast("double"),
    )
    mean_dev = (
        F.col("s1").cast("double") / 100.0 / F.col("n").cast("double")
        - F.col("grand_mean")
    )
    ssb_t = grand.agg(
        F.max("k").alias("k"),
        F.max("n_total").alias("n_total"),
        F.max("ssw").alias("ssw"),
        F.sum(F.col("n").cast("double") * mean_dev * mean_dev).alias("ssb"),
    )
    k_d = F.col("k").cast("double")
    n_d = F.col("n_total").cast("double")
    return ssb_t.select(
        F.col("k").alias("k_groups"),
        "n_total",
        F.round(F.col("ssb") / n_d, 6).alias("ssb_per_row"),
        F.round(F.col("ssw") / n_d, 6).alias("ssw_per_row"),
        F.round(
            (F.col("ssb") / (k_d - F.lit(1.0)))
            / (F.col("ssw") / (n_d - k_d)),
            6,
        ).alias("bf_stat"),
    )


@query(
    "graph_kcore_brands",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    und AS (
      SELECT a.brand AS u, b.brand AS v, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ob a JOIN ob b ON a.ok = b.ok AND a.brand < b.brand
      GROUP BY a.brand, b.brand
    ),
    tot AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS np
      FROM und
    ),
    kept AS (SELECT u, v FROM und, tot WHERE cnt * np >= t),
    e0 AS (SELECT u, v FROM kept UNION ALL SELECT v AS u, u AS v FROM kept),
    d1 AS (SELECT u, COUNT(*) AS deg FROM e0 GROUP BY u),
    a1 AS (SELECT u FROM d1 WHERE deg >= 10),
    e1 AS (SELECT e.u, e.v FROM e0 e
           JOIN a1 x ON e.u = x.u JOIN a1 y ON e.v = y.u),
    d2 AS (SELECT u, COUNT(*) AS deg FROM e1 GROUP BY u),
    a2 AS (SELECT u FROM d2 WHERE deg >= 10),
    e2 AS (SELECT e.u, e.v FROM e1 e
           JOIN a2 x ON e.u = x.u JOIN a2 y ON e.v = y.u),
    d3 AS (SELECT u, COUNT(*) AS deg FROM e2 GROUP BY u),
    a3 AS (SELECT u FROM d3 WHERE deg >= 10),
    e3 AS (SELECT e.u, e.v FROM e2 e
           JOIN a3 x ON e.u = x.u JOIN a3 y ON e.v = y.u)
    SELECT u AS brand, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM e3 GROUP BY u
    """,
)
def graph_kcore_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling (k=10, 3 fixed rounds) of the above-average
    brand co-purchase graph: repeatedly drop vertices of degree < k
    and their edges, keeping the densely-interlinked brand core — the
    community-detection primitive for 'which brands sell together
    structurally, not incidentally'. The edge fence is the
    scale-invariant integer cross-multiplication cnt·n_pairs ≥ total
    (above-mean edges — a fixed absolute count would not survive a
    10x corpus), degrees are exact integers, and the fixed round count
    makes the unrolled-CTE oracle an exact replay (the
    pagerank/MMR unrolling pattern).

    Scale shape: the fact-table work is the one lineitem⋈part scan +
    (order, brand) DISTINCT — everything after runs on the
    brand-domain-bounded edge list (≤ |brands|² rows, broadcast
    territory). For billion-edge graphs the identical loop runs as
    shuffle joins with localCheckpoint per round (operators/graph.py
    pattern); convergence detection would swap the fixed rounds for a
    driver-side empty-diff test on a count() per round."""
    und = (
        _brand_pair_occurrences(spark, sf_dir)
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    tot = und.agg(
        F.sum("cnt").cast("bigint").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("np"),
    )
    kept = pin(
        und.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * F.col("np") >= F.col("t"))
        .select("u", "v")
    )
    edges = kept.unionByName(
        kept.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    # pin() each round: the peel re-reads `edges` from both the degree
    # branch and the two semi joins — without materialization the plan
    # re-derives the whole fact-table lineage 2^rounds times.
    for _ in range(3):
        edges = pin(edges)
        deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        alive = deg.filter(F.col("deg") >= 10).select("u")
        edges = (
            edges.join(F.broadcast(alive), "u", "left_semi")
            .join(
                F.broadcast(alive.select(F.col("u").alias("v"))),
                "v",
                "left_semi",
            )
        )
    return edges.groupBy(F.col("u").alias("brand")).agg(
        F.count(F.lit(1)).cast("bigint").alias("core_degree")
    )


def _ols2_exprs() -> dict:
    """Shared SQL fragments for the 2-feature OLS normal equations —
    interpolated VERBATIM into both the Spark selectExpr and the
    DuckDB oracle so the composed float arithmetic is expression-
    identical (the only determinism guarantee that survives Cramer's
    cancellation-heavy determinants)."""

    def d(c: str) -> str:
        return f"CAST({c} AS DOUBLE)"

    def det3(a, b, c):
        a0, a1, a2 = (d(x) for x in a)
        b0, b1, b2 = (d(x) for x in b)
        c0, c1, c2 = (d(x) for x in c)
        return (
            f"({a0}*({b1}*{c2} - {b2}*{c1})"
            f" - {b0}*({a1}*{c2} - {a2}*{c1})"
            f" + {c0}*({a1}*{b2} - {a2}*{b1}))"
        )

    c0 = ("n", "sx1", "sx2")
    c1 = ("sx1", "sx11", "sx12")
    c2 = ("sx2", "sx12", "sx22")
    rhs = ("sy", "sx1y", "sx2y")
    dd = det3(c0, c1, c2)
    b0 = f"({det3(rhs, c1, c2)} / {dd})"
    b1 = f"({det3(c0, rhs, c2)} / {dd})"
    b2 = f"({det3(c0, c1, rhs)} / {dd})"
    sse = (
        f"({d('syy')} - ({b0}*{d('sy')} + {b1}*{d('sx1y')}"
        f" + {b2}*{d('sx2y')}))"
    )
    sst = f"({d('syy')} - {d('sy')}*{d('sy')}/{d('n')})"
    return {
        "b0": b0, "b1": b1, "b2": b2,
        "r2": f"(1.0 - {sse}/{sst})",
    }


_OLS2 = _ols2_exprs()


@query(
    "stats_ols_two_factor",
    oracle=f"""
    WITH t AS (
      SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               // 100 AS y,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
               // 100 AS x1,
             CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS x2
      FROM lineitem
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x1) AS BIGINT) AS sx1,
             CAST(SUM(x2) AS BIGINT) AS sx2,
             CAST(SUM(x1 * x1) AS BIGINT) AS sx11,
             CAST(SUM(x2 * x2) AS BIGINT) AS sx22,
             CAST(SUM(x1 * x2) AS BIGINT) AS sx12,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x1 * y) AS BIGINT) AS sx1y,
             CAST(SUM(x2 * y) AS BIGINT) AS sx2y,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM t
    )
    SELECT n, ROUND({_OLS2['b0']}, 9) AS b0,
           ROUND({_OLS2['b1']}, 9) AS b1,
           ROUND({_OLS2['b2']}, 9) AS b2,
           ROUND({_OLS2['r2']}, 9) AS r_squared
    FROM m
    """,
)
def stats_ols_two_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-factor OLS by closed-form normal equations (Cramer's rule):
    extended price (whole dollars) regressed on quantity and discount
    cents. Every sufficient statistic is an exact int64 (y truncated
    to dollars keeps Σy² under 2^63 to ~billions of rows; CLAUDE.md
    forbids rounding at .5-capable boundaries, so truncating DIV, not
    ROUND); the determinants/coefficients/R² are built from ONE shared
    expression-fragment table (_ols2_exprs) interpolated verbatim into
    both engines, because Cramer's determinants subtract near-equal
    products and only bit-identical expression shape guarantees
    bit-identical IEEE results. Final values ROUND 9.

    Scale shape: a single map-side-combinable aggregation to one row
    of 10 sufficient statistics; the solve is constant work on the
    driver-sized result — the textbook 'ML on SQL engines' shape
    (cf. MADlib's closed-form regressions)."""
    li = read_table(spark, sf_dir, "lineitem")
    t = li.selectExpr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        " DIV 100 AS y",
        "CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)"
        " DIV 100 AS x1",
        "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS x2",
    )
    m = t.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").cast("bigint").alias("sx1"),
        F.sum("x2").cast("bigint").alias("sx2"),
        F.sum(F.col("x1") * F.col("x1")).cast("bigint").alias("sx11"),
        F.sum(F.col("x2") * F.col("x2")).cast("bigint").alias("sx22"),
        F.sum(F.col("x1") * F.col("x2")).cast("bigint").alias("sx12"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).cast("bigint").alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).cast("bigint").alias("sx2y"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    return m.selectExpr(
        "n",
        f"ROUND({_OLS2['b0']}, 9) AS b0",
        f"ROUND({_OLS2['b1']}, 9) AS b1",
        f"ROUND({_OLS2['b2']}, 9) AS b2",
        f"ROUND({_OLS2['r2']}, 9) AS r_squared",
    )


@query(
    "quality_column_entropy_profile",
    oracle="""
    WITH stacked AS (
      SELECT 'o_orderstatus' AS col_name, o_orderstatus AS val FROM orders
      UNION ALL
      SELECT 'o_orderpriority', o_orderpriority FROM orders
      UNION ALL
      SELECT 'order_year', CAST(year(o_orderdate) AS VARCHAR) FROM orders
    ),
    vc AS (
      SELECT col_name, val, CAST(COUNT(*) AS BIGINT) AS n
      FROM stacked GROUP BY col_name, val
    ),
    tot AS (
      SELECT col_name, CAST(SUM(n) AS BIGINT) AS nt,
             CAST(COUNT(*) AS BIGINT) AS n_distinct
      FROM vc GROUP BY col_name
    )
    SELECT v.col_name, t.n_distinct,
           ROUND(SUM(-(CAST(v.n AS DOUBLE) / CAST(t.nt AS DOUBLE))
                     * ln(CAST(v.n AS DOUBLE) / CAST(t.nt AS DOUBLE)))
                 / ln(2.0), 6) AS entropy_bits,
           ROUND(SUM(-(CAST(v.n AS DOUBLE) / CAST(t.nt AS DOUBLE))
                     * ln(CAST(v.n AS DOUBLE) / CAST(t.nt AS DOUBLE)))
                 / ln(CAST(GREATEST(t.n_distinct, 2) AS DOUBLE)), 6)
             AS normalized_entropy
    FROM vc v JOIN tot t ON v.col_name = t.col_name
    GROUP BY v.col_name, t.n_distinct
    """,
)
def quality_column_entropy_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Column-level Shannon entropy profile — the information-content
    sweep of a profiling pass: near-zero entropy flags near-constant
    columns (drop candidates), entropy near log₂(distinct) means
    uniform spread; normalized entropy (÷ ln distinct) compares
    columns of different cardinality on one scale. Value counts are
    exact; each p·ln p term is an identical expression over identical
    integer ratios (ln, never log — CLAUDE.md), domains are bounded so
    the float reductions are fixed-size. ROUND 6.

    Scale shape: unpivot-stack then ONE map-side-combinable
    (column, value) count — same single-pass shape as
    quality_multi_column_iqr; entropy math runs on the value-domain
    frame."""
    o = read_table(spark, sf_dir, "orders")
    stacked = o.selectExpr(
        "stack(3,"
        " 'o_orderstatus', o_orderstatus,"
        " 'o_orderpriority', o_orderpriority,"
        " 'order_year', CAST(year(o_orderdate) AS STRING)"
        ") AS (col_name, val)"
    )
    vc = stacked.groupBy("col_name", "val").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = vc.groupBy("col_name").agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
    )
    p = F.col("n").cast("double") / F.col("nt").cast("double")
    return (
        vc.join(F.broadcast(tot), "col_name")
        .groupBy("col_name", "n_distinct")
        .agg(
            F.round(
                F.sum(-p * F.log(p)) / F.log(F.lit(2.0)), 6
            ).alias("entropy_bits"),
            F.round(
                F.sum(-p * F.log(p))
                / F.log(
                    F.greatest(F.col("n_distinct"), F.lit(2)).cast("double")
                ),
                6,
            ).alias("normalized_entropy"),
        )
        .select(
            "col_name", "n_distinct", "entropy_bits", "normalized_entropy"
        )
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival with right-censoring (round 10b)
# ---------------------------------------------------------------------------


@query(
    "stats_kaplan_meier_survival",
    oracle="""
    WITH mx AS (SELECT MAX(o_orderdate) AS mxd FROM orders),
    seq AS (
      SELECT o_orderdate,
             LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS nxt
      FROM orders
    ),
    dur AS (
      SELECT CASE WHEN nxt IS NOT NULL
                  THEN date_diff('day', o_orderdate, nxt)
                  ELSE date_diff('day', o_orderdate, (SELECT mxd FROM mx))
             END AS gap_days,
             CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS is_event
      FROM seq
    ),
    byw AS (
      SELECT CAST(gap_days // 7 AS INT) AS week,
             CAST(SUM(is_event) AS BIGINT) AS d_events,
             CAST(SUM(1 - is_event) AS BIGINT) AS c_censored
      FROM dur GROUP BY 1
    ),
    km AS (
      SELECT week, d_events, c_censored,
             CAST(SUM(d_events + c_censored) OVER ()
                  - SUM(d_events + c_censored) OVER
                      (ORDER BY week ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW)
                  + (d_events + c_censored) AS BIGINT) AS n_risk
      FROM byw
    )
    SELECT week, n_risk, d_events, c_censored,
           ROUND(EXP(SUM(CASE WHEN d_events < n_risk
                              THEN LN(CAST(n_risk - d_events AS DOUBLE)
                                      / n_risk)
                              ELSE -1000.0 END)
                     OVER (ORDER BY week ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)), 6) AS surv
    FROM km ORDER BY week
    """,
)
def stats_kaplan_meier_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimator of the repeat-purchase gap WITH
    right-censoring: each order's duration is days-to-next-order (an
    event) or days-to-end-of-observation for a customer's last order
    (censored).  S(t) = prod_{u<=t} (1 - d_u/n_u) over week-grain event
    times.  Complements ``orders_repeat_gap_survival`` (pure empirical
    tail shares, censored rows discarded) with the estimator a churn
    model actually uses.

    Determinism: durations/counts are exact integer date math; the
    product is computed as EXP(SUM(LN((n-d)/n))) with the identical
    expression shape on both engines and rounded to 6 decimals
    (composed-float rule); a fully-dead tail (d == n) contributes -1000
    so EXP underflows to exactly 0.0 on both engines.

    Scale shape: one shuffle on o_custkey for the lead window, a
    map-side-combined groupBy on week (~350-row domain), then
    single-task windows over that tiny week domain only.  The global
    max date is a broadcast 1-row aggregate, never an unpartitioned
    window over the fact table.
    """
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    mx = o.agg(F.max("o_orderdate").alias("mxd"))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dur = (
        o.withColumn("nxt", F.lead("o_orderdate").over(w))
        .crossJoin(F.broadcast(mx))
        .select(
            F.when(
                F.col("nxt").isNotNull(),
                F.datediff("nxt", "o_orderdate"),
            )
            .otherwise(F.datediff("mxd", "o_orderdate"))
            .alias("gap_days"),
            F.when(F.col("nxt").isNotNull(), 1).otherwise(0).alias("is_event"),
        )
        .select(
            F.expr("CAST(gap_days DIV 7 AS INT)").alias("week"), "is_event"
        )
    )
    byw = dur.groupBy("week").agg(
        F.sum("is_event").cast("bigint").alias("d_events"),
        F.sum(1 - F.col("is_event")).cast("bigint").alias("c_censored"),
    )
    # week domain is ~350 rows post-agg: single-task windows are fine.
    cum = Window.orderBy("week").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy(F.lit(1))
    at = F.col("d_events") + F.col("c_censored")
    km = byw.withColumn(
        "n_risk",
        (F.sum(at).over(tot) - F.sum(at).over(cum) + at).cast("bigint"),
    )
    ln_term = F.when(
        F.col("d_events") < F.col("n_risk"),
        F.log(
            (F.col("n_risk") - F.col("d_events")).cast("double")
            / F.col("n_risk")
        ),
    ).otherwise(F.lit(-1000.0))
    return (
        km.withColumn("surv", F.round(F.exp(F.sum(ln_term).over(cum)), 6))
        .select("week", "n_risk", "d_events", "c_censored", "surv")
        .orderBy("week")
    )


# ---------------------------------------------------------------------------
# Changepoint scan: between-groups mean-shift score at every day split
# ---------------------------------------------------------------------------


@query(
    "stats_changepoint_mean_shift",
    oracle="""
    WITH byd AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_d,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS s_d
      FROM events GROUP BY 1
    ),
    cum AS (
      SELECT day,
             CAST(SUM(n_d) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS BIGINT) AS n1,
             CAST(SUM(s_d) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS BIGINT) AS s1,
             CAST(SUM(n_d) OVER () AS BIGINT) AS nt,
             CAST(SUM(s_d) OVER () AS BIGINT) AS st
      FROM byd
    )
    SELECT day AS split_day, n1, nt - n1 AS n2,
           ROUND(CAST((s1 * (nt - n1) - (st - s1) * n1) AS DOUBLE)
                 * CAST((s1 * (nt - n1) - (st - s1) * n1) AS DOUBLE)
                 / CAST(n1 * (nt - n1) * nt AS DOUBLE), 3) AS score
    FROM cum WHERE nt - n1 > 0 ORDER BY split_day
    """,
)
def stats_changepoint_mean_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint mean-shift scan over daily event values: for
    every day-boundary split, the between-segments SSE reduction
    n1*n2/N * (mean1 - mean2)^2, expressed in exact integer cents as
    (s1*n2 - s2*n1)^2 / (n1*n2*N) — the CUSUM/binary-segmentation
    scoring table (argmax = the changepoint; the full scan table is
    emitted so the decision is auditable).

    Determinism: day sums in exact cents (bigint), cumulative sums over
    the ~30-day domain; the numerator s1*n2 - s2*n1 stays in int64
    (|s|<~1e9 cents, n<~1e6 at sf0.1 -> <1e15), squared in doubles with
    the identical expression both engines.  No argmax tie-break needed:
    the whole scored table is the output, keyed by split_day.

    Scale shape: one map-side-combined groupBy(day), then windows over
    the tiny day domain only.  At 100 TB the day domain is still tiny;
    the int64 numerator bound (s1*n2 < 2^63) holds while total cents *
    rows < 9e18 — beyond that, promote s_d to DECIMAL(38,0) sums.
    """
    e = read_events(spark, sf_dir)
    byd = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_d"),
        F.sum(
            F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("s_d"),
    )
    cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy(F.lit(1))
    c = byd.select(
        "day",
        F.sum("n_d").over(cum).cast("bigint").alias("n1"),
        F.sum("s_d").over(cum).cast("bigint").alias("s1"),
        F.sum("n_d").over(tot).cast("bigint").alias("nt"),
        F.sum("s_d").over(tot).cast("bigint").alias("st"),
    )
    num = F.col("s1") * (F.col("nt") - F.col("n1")) - (
        F.col("st") - F.col("s1")
    ) * F.col("n1")
    den = F.col("n1") * (F.col("nt") - F.col("n1")) * F.col("nt")
    return (
        c.filter((F.col("nt") - F.col("n1")) > 0)
        .select(
            F.col("day").alias("split_day"),
            "n1",
            (F.col("nt") - F.col("n1")).alias("n2"),
            F.round(
                num.cast("double") * num.cast("double") / den.cast("double"),
                3,
            ).alias("score"),
        )
        .orderBy("split_day")
    )


# ---------------------------------------------------------------------------
# Schema/profile drift between two table snapshots
# ---------------------------------------------------------------------------


@query(
    "quality_schema_drift_report",
    oracle="""
    WITH s AS (
      SELECT CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 0 ELSE 1
             END AS snap,
             o_custkey, o_orderstatus, o_orderpriority, o_totalprice,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders
    ),
    base AS (
      SELECT CAST(SUM(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS cnt_a,
             CAST(SUM(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS cnt_b,
             CAST(SUM(CASE WHEN snap = 0 AND o_totalprice IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS null_a,
             CAST(SUM(CASE WHEN snap = 1 AND o_totalprice IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS null_b,
             CAST(SUM(CASE WHEN snap = 0 THEN cents ELSE 0 END) AS BIGINT)
               AS sc_a,
             CAST(SUM(CASE WHEN snap = 1 THEN cents ELSE 0 END) AS BIGINT)
               AS sc_b
      FROM s
    ),
    dd AS (
      SELECT col_name,
             CAST(COUNT(DISTINCT CASE WHEN snap = 0 THEN v END) AS BIGINT)
               AS val_a,
             CAST(COUNT(DISTINCT CASE WHEN snap = 1 THEN v END) AS BIGINT)
               AS val_b
      FROM (
        SELECT snap, 'distinct_custkey' AS col_name,
               CAST(o_custkey AS VARCHAR) AS v FROM s
        UNION ALL
        SELECT snap, 'distinct_status', o_orderstatus FROM s
        UNION ALL
        SELECT snap, 'distinct_priority', o_orderpriority FROM s
      ) GROUP BY col_name
    ),
    metrics AS (
      SELECT 'row_count' AS metric, cnt_a AS val_a, cnt_b AS val_b FROM base
      UNION ALL
      SELECT 'null_totalprice', null_a, null_b FROM base
      UNION ALL
      SELECT 'mean_price_cents', sc_a // GREATEST(cnt_a, 1),
             sc_b // GREATEST(cnt_b, 1) FROM base
      UNION ALL
      SELECT col_name, val_a, val_b FROM dd
    )
    SELECT metric, val_a, val_b,
           CASE WHEN ABS(val_a - val_b) * 5 > val_a THEN 1 ELSE 0 END
             AS drift_flag
    FROM metrics ORDER BY metric
    """,
)
def quality_schema_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile drift between two snapshots of the same table
    (orders before/after 1998-01-01): row counts, null counts, integer
    mean price, and exact per-column distinct counts, long-format with a
    >20%%-change flag per metric — the schema/profile-drift audit a lake
    ingestion pipeline runs between loads.

    Determinism: every metric is exact integer math (cents via decimal
    quantization, truncating DIV on non-negative operands); the drift
    flag is an integer cross-multiplication (|a-b|*5 > a), never a float
    share.

    Scale shape: one conditional-aggregation pass over the fact for
    counts/nulls/sums (map-side combined, no Expand — distincts are NOT
    mixed into this pass per the count_distinct rule), plus one
    column-pruned pass per distinct metric over a deduplicated
    (snap, value) pair frame.  All post-agg frames are 1-row; unions
    are tiny.
    """
    snap = F.expr(
        "CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 0 ELSE 1 END"
    )
    o = read_table(spark, sf_dir, "orders").select(
        snap.alias("snap"),
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        "o_totalprice",
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .alias("cents"),
    )

    def _side(cond: F.Column, val: F.Column) -> F.Column:
        return F.sum(F.when(cond, val).otherwise(F.lit(0))).cast("bigint")

    base = o.agg(
        _side(F.col("snap") == 0, F.lit(1)).alias("cnt_a"),
        _side(F.col("snap") == 1, F.lit(1)).alias("cnt_b"),
        _side(
            (F.col("snap") == 0) & F.col("o_totalprice").isNull(), F.lit(1)
        ).alias("null_a"),
        _side(
            (F.col("snap") == 1) & F.col("o_totalprice").isNull(), F.lit(1)
        ).alias("null_b"),
        _side(F.col("snap") == 0, F.col("cents")).alias("sc_a"),
        _side(F.col("snap") == 1, F.col("cents")).alias("sc_b"),
    )
    base_rows = base.selectExpr(
        "stack(3,"
        " 'row_count', cnt_a, cnt_b,"
        " 'null_totalprice', null_a, null_b,"
        " 'mean_price_cents', sc_a DIV GREATEST(cnt_a, 1L),"
        "   sc_b DIV GREATEST(cnt_b, 1L)"
        ") AS (metric, val_a, val_b)"
    )

    def _distinct(metric: str, col: str) -> DataFrame:
        # pre-dedup the (snap, value) pairs, then conditional-count:
        # avoids the count_distinct Expand and scans only 2 columns.
        return (
            o.select("snap", F.col(col).cast("string").alias("v"))
            .distinct()
            .agg(
                _side(F.col("snap") == 0, F.lit(1)).alias("val_a"),
                _side(F.col("snap") == 1, F.lit(1)).alias("val_b"),
            )
            .select(F.lit(metric).alias("metric"), "val_a", "val_b")
        )

    rows = (
        base_rows.unionByName(_distinct("distinct_custkey", "o_custkey"))
        .unionByName(_distinct("distinct_status", "o_orderstatus"))
        .unionByName(_distinct("distinct_priority", "o_orderpriority"))
    )
    return rows.select(
        "metric",
        "val_a",
        "val_b",
        F.when(
            F.abs(F.col("val_a") - F.col("val_b")) * 5 > F.col("val_a"), 1
        )
        .otherwise(0)
        .alias("drift_flag"),
    ).orderBy("metric")


# ---------------------------------------------------------------------------
# BFS hop levels over the thresholded brand co-purchase graph
# ---------------------------------------------------------------------------


@query(
    "graph_bfs_levels_brands",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    und AS (
      SELECT a.brand AS u, b.brand AS v, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ob a JOIN ob b ON a.ok = b.ok AND a.brand < b.brand
      GROUP BY a.brand, b.brand
    ),
    n AS (SELECT COUNT(*) AS n FROM und),
    th AS (
      SELECT cnt AS theta FROM (
        SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, u, v) AS rk
        FROM und
      ) WHERE rk = (SELECT CAST(CEIL(0.1 * n) AS BIGINT) FROM n)
    ),
    e0 AS (SELECT u, v FROM und WHERE cnt >= (SELECT theta FROM th)),
    e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
    deg AS (SELECT u, COUNT(*) AS d FROM e GROUP BY u),
    src AS (SELECT u AS s FROM deg ORDER BY d DESC, u LIMIT 1),
    reach AS (
      WITH RECURSIVE bfs(brand, lvl) AS (
        SELECT s, 0 FROM src
        UNION
        SELECT e.v, bfs.lvl + 1 FROM bfs JOIN e ON e.u = bfs.brand
        WHERE bfs.lvl < 4
      )
      SELECT brand, CAST(MIN(lvl) AS INT) AS lvl FROM bfs GROUP BY brand
    )
    SELECT ab.brand, COALESCE(reach.lvl, -1) AS lvl
    FROM (SELECT DISTINCT brand FROM ob) ab
    LEFT JOIN reach ON reach.brand = ab.brand
    ORDER BY ab.brand
    """,
)
def graph_bfs_levels_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop levels (<=4 hops) from the max-degree node over the
    SPARSIFIED brand co-purchase graph: keep only the top-10%%-weight
    edges (exact value-at-rank threshold), start at the highest-degree
    brand (tie-break lexicographic), emit min hop level per brand, -1
    for brands unreached within 4 hops — the reachability / blast-radius
    audit primitive.

    Determinism: the edge threshold is a value-at-rank (value-
    determined under cnt ties); source selection and min-level BFS are
    exact integer math; output keyed by brand.

    Scale shape: the fact-table work (one lineitem-part join + DISTINCT
    + edge aggregation) is fully distributed; the aggregated edge list
    is BRAND-DOMAIN BOUNDED (<= |brands|^2 = 625 rows here; it is the
    same tiny-broadcast-block class as IVF codebooks), so the BFS
    itself runs driver-side over that collected block and the level map
    broadcasts back — one collect bounded by the squared label domain,
    documented per the repo collect rule.  A distributed frontier-
    expansion loop of the same semantics (for graphs whose edge list
    does NOT fit the driver) was measured at 10.0s vs 2.4s end-to-end
    here (9 extra loop jobs over <=25-row frames); that loop pattern
    lives in operators/graph.py (connected_components / k-core).
    """
    import math as _math

    sets = pin(_order_brand_sets(spark, sf_dir), eager=False)
    und = (
        sets.select(F.explode(F.expr(_BRAND_PAIR_EXPR)).alias("p"))
        .groupBy(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    # Bounded collect: <= |brand-domain|^2 rows (625 at any SF).
    edges = und.collect()
    brands = sorted({r["u"] for r in edges} | {r["v"] for r in edges})
    n = len(edges)
    by_weight = sorted(edges, key=lambda r: (-r["cnt"], r["u"], r["v"]))
    theta = by_weight[_math.ceil(0.1 * n) - 1]["cnt"]
    adj: dict[str, set[str]] = {}
    for r in edges:
        if r["cnt"] >= theta:
            adj.setdefault(r["u"], set()).add(r["v"])
            adj.setdefault(r["v"], set()).add(r["u"])
    src = sorted(((-len(vs), u) for u, vs in adj.items()))[0][1]
    lvl = {src: 0}
    frontier = [src]
    for i in range(1, 5):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in lvl:
                    lvl[v] = i
                    nxt.append(v)
        frontier = nxt
    levels = spark.createDataFrame(
        [(bd, lvl.get(bd, -1)) for bd in brands], "brand string, lvl int"
    )
    all_brands = sets.select(F.explode("bs").alias("brand")).distinct()
    return (
        all_brands.join(F.broadcast(levels), "brand", "left")
        .select("brand", F.coalesce(F.col("lvl"), F.lit(-1)).alias("lvl"))
        .orderBy("brand")
    )


# ---------------------------------------------------------------------------
# Jarque-Bera normality test from exact integer raw moments (round 10c)
# ---------------------------------------------------------------------------


def _jb_exprs() -> dict:
    """Shared SQL fragments for the Jarque-Bera statistic from raw
    integer moment sums (s1..s4, n) — interpolated VERBATIM into both
    the Spark selectExpr and the DuckDB oracle (the _ols2_exprs
    technique): every float is a +,-,*,/,sqrt composition of identical
    integers, so IEEE correct rounding makes the doubles bit-identical
    cross-engine."""

    def d(c: str) -> str:
        return f"CAST({c} AS DOUBLE)"

    n, s1, s2, s3, s4 = (d(c) for c in ("n", "s1", "s2", "s3", "s4"))
    mu = f"({s1}/{n})"
    m2 = f"({s2}/{n} - {mu}*{mu})"
    m3 = f"({s3}/{n} - 3.0*{mu}*{s2}/{n} + 2.0*{mu}*{mu}*{mu})"
    m4 = (
        f"({s4}/{n} - 4.0*{mu}*{s3}/{n} + 6.0*{mu}*{mu}*{s2}/{n}"
        f" - 3.0*{mu}*{mu}*{mu}*{mu})"
    )
    skew = f"({m3} / ({m2}*sqrt({m2})))"
    kurt = f"({m4} / ({m2}*{m2}))"
    jb = (
        f"({n}/6.0 * ({skew}*{skew}"
        f" + ({kurt} - 3.0)*({kurt} - 3.0)/4.0))"
    )
    return {"mu": mu, "m2": m2, "skew": skew, "kurt": kurt, "jb": jb}


_JB = _jb_exprs()


@query(
    "stats_jarque_bera_quantity",
    oracle=f"""
    WITH m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS BIGINT) AS s1,
             CAST(SUM(q*q) AS BIGINT) AS s2,
             CAST(SUM(q*q*q) AS BIGINT) AS s3,
             CAST(SUM(q*q*q*q) AS BIGINT) AS s4
      FROM (SELECT CAST(l_quantity AS BIGINT) AS q FROM lineitem)
    )
    SELECT n,
           ROUND({_JB['mu']}, 6) AS mean_qty,
           ROUND({_JB['m2']}, 6) AS var_pop,
           ROUND({_JB['skew']}, 6) AS skewness,
           ROUND({_JB['kurt']}, 6) AS kurtosis,
           ROUND({_JB['jb']}, 6) AS jb_stat,
           CAST({_JB['jb']} > 5.991464547107979 AS INT) AS reject_norm_5pct
    FROM m
    """,
)
def stats_jarque_bera_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test on l_quantity via exact integer raw
    moments: skewness/kurtosis from closed-form central moments of
    bigint sums s1..s4 (quantity is integer-valued 1..50, so q^4 <=
    6.25e6 and the s4 sum stays under 2^53-equivalent headroom up to
    ~1.4e12 rows — document-level bound; past that, split the sum by
    partition ranges or widen to DECIMAL(38,0) with small final
    scales).  Uniform-ish quantities have kurtosis ~1.8 so JB rejects
    normality — the chi2(2) 5%% critical value is inlined as an exact
    double literal.

    Determinism: all floats are +,-,*,/,sqrt over identical integers
    with the expression shape shared verbatim between engines
    (_jb_exprs, the _ols2_exprs technique); no exp/ln.  The reject flag
    compares against a literal — JB here is ~1e5, nowhere near the
    boundary.

    Scale shape: ONE map-side-combinable aggregate over one pruned
    column; the moment frame is a single row."""
    li = read_table(spark, sf_dir, "lineitem")
    m = li.select(
        F.expr("CAST(l_quantity AS BIGINT)").alias("q")
    ).selectExpr(
        "q", "q*q AS q2", "q*q*q AS q3", "q*q*q*q AS q4"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").cast("bigint").alias("s1"),
        F.sum("q2").cast("bigint").alias("s2"),
        F.sum("q3").cast("bigint").alias("s3"),
        F.sum("q4").cast("bigint").alias("s4"),
    )
    return m.selectExpr(
        "n",
        f"ROUND({_JB['mu']}, 6) AS mean_qty",
        f"ROUND({_JB['m2']}, 6) AS var_pop",
        f"ROUND({_JB['skew']}, 6) AS skewness",
        f"ROUND({_JB['kurt']}, 6) AS kurtosis",
        f"ROUND({_JB['jb']}, 6) AS jb_stat",
        f"CAST({_JB['jb']} > 5.991464547107979 AS INT) AS reject_norm_5pct",
    )


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR-adjusted p-values for per-brand return rates
# ---------------------------------------------------------------------------


def _bh_exprs() -> dict:
    """Shared SQL fragments for the per-brand two-proportion z test:
    z from integer counts (k, n, kg, ng), two-sided p via the logistic
    approximation of the normal CDF (1-Phi(x) ~ 1/(1+exp(1.702x)) —
    max abs error ~0.0095, fine for a ranking statistic and, crucially,
    expressible identically on both engines).  exp() is the one
    non-correctly-rounded op, so p is rounded to 9 decimals before any
    downstream use."""

    def d(c: str) -> str:
        return f"CAST({c} AS DOUBLE)"

    p0 = f"({d('kg')}/{d('ng')})"
    z = (
        f"(({d('k')}/{d('n')} - {p0})"
        f" / sqrt({p0}*(1.0 - {p0})/{d('n')}))"
    )
    p = f"(2.0 / (1.0 + exp(1.702*abs({z}))))"
    return {"z": z, "p": p}


_BH = _bh_exprs()


@query(
    "stats_benjamini_hochberg_fdr",
    oracle=f"""
    WITH cnt AS (
      SELECT p.p_brand AS brand,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS k
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    ),
    g AS (SELECT CAST(SUM(n) AS BIGINT) AS ng, CAST(SUM(k) AS BIGINT) AS kg
          FROM cnt),
    pv AS (
      SELECT brand, n, k,
             ROUND({_BH['z']}, 6) AS z,
             ROUND({_BH['p']}, 9) AS p_value
      FROM cnt, g
    ),
    rk AS (
      SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY p_value, brand) AS BIGINT)
                  AS p_rank,
             CAST(COUNT(*) OVER () AS BIGINT) AS m
      FROM pv
    )
    SELECT brand, n, k, z, p_value, p_rank,
           ROUND(LEAST(1.0, MIN(CAST(m AS DOUBLE) * p_value / p_rank)
                 OVER (ORDER BY p_rank ROWS BETWEEN CURRENT ROW AND
                       UNBOUNDED FOLLOWING)), 6) AS p_adj_bh
    FROM rk ORDER BY brand
    """,
)
def stats_benjamini_hochberg_fdr(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Benjamini-Hochberg FDR-ADJUSTED p-values for 25 simultaneous
    per-brand return-rate tests (two-proportion z against the pooled
    rate).  Emitting the adjusted p (padj_(i) = min_{j>=i} m*p_(j)/j,
    the smallest q at which BH rejects) instead of a reject flag at an
    arbitrary q keeps the output informative even when the synthetic
    uniform return flags yield no true signal.

    Determinism: counts are exact integers; z and the logistic-CDF p
    share their expression shape verbatim with the oracle (_bh_exprs)
    and p is rounded to 9 BEFORE ranking / the suffix-min, so the
    adjusted values divide identical doubles.  Rank ties break on
    brand.

    Scale shape: the lineitem-part join is the only fact-scale work
    (broadcast part at these SFs; at 100 TB part is still the small
    side of a shuffle join); everything after the 25-row groupBy runs
    on the brand-domain frame — the single-task windows are over 25
    rows, the enum-domain window exemption."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_returnflag"
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cnt = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("k"),
        )
    )
    g = cnt.agg(
        F.sum("n").cast("bigint").alias("ng"),
        F.sum("k").cast("bigint").alias("kg"),
    )
    pv = cnt.crossJoin(F.broadcast(g)).selectExpr(
        "brand",
        "n",
        "k",
        f"ROUND({_BH['z']}, 6) AS z",
        f"ROUND({_BH['p']}, 9) AS p_value",
    )
    # brand grain: bounded (25 brands)
    w_rank = Window.orderBy("p_value", "brand")
    w_all = Window.partitionBy(F.lit(1))
    rk = pv.withColumn(
        "p_rank", F.row_number().over(w_rank).cast("bigint")
    ).withColumn("m", F.count(F.lit(1)).over(w_all).cast("bigint"))
    w_suffix = Window.orderBy("p_rank").rowsBetween(
        0, Window.unboundedFollowing
    )
    return (
        rk.withColumn(
            "p_adj_bh",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.min(
                        F.col("m").cast("double")
                        * F.col("p_value")
                        / F.col("p_rank")
                    ).over(w_suffix),
                ),
                6,
            ),
        )
        .select("brand", "n", "k", "z", "p_value", "p_rank", "p_adj_bh")
        .orderBy("brand")
    )


# ---------------------------------------------------------------------------
# Log-rank test: urgent vs non-urgent repeat-purchase survival curves
# ---------------------------------------------------------------------------


def _logrank_exprs() -> dict:
    """Shared SQL fragments for the per-week log-rank terms from
    integer risk-set counts (n1, n, d1, d): expected group-1 events and
    the hypergeometric variance.  Divisions of identical integers are
    correctly rounded, so the doubles are bit-identical cross-engine;
    each term is rounded to 9 decimals and accumulated as an EXACT
    DECIMAL sum (order-independent) before the final chi2."""

    def d(c: str) -> str:
        return f"CAST({c} AS DOUBLE)"

    e1 = f"({d('d')} * {d('n1')} / {d('n')})"
    v = (
        f"(CASE WHEN n > 1 THEN {d('d')} * ({d('n1')}/{d('n')})"
        f" * (({d('n')} - {d('n1')})/{d('n')})"
        f" * (({d('n')} - {d('d')})/({d('n')} - 1.0)) ELSE 0.0 END)"
    )
    return {
        "ome_dec": f"CAST(ROUND({d('d1')} - {e1}, 9) AS DECIMAL(28,9))",
        "v_dec": f"CAST(ROUND({v}, 9) AS DECIMAL(28,9))",
        "e1_dec": f"CAST(ROUND({e1}, 9) AS DECIMAL(28,9))",
    }


_LOGRANK = _logrank_exprs()


@query(
    "stats_logrank_priority_survival",
    oracle=f"""
    WITH mx AS (SELECT MAX(o_orderdate) AS mxd FROM orders),
    seq AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS grp,
             o_orderdate,
             LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS nxt
      FROM orders
    ),
    dur AS (
      SELECT grp,
             CAST(CASE WHEN nxt IS NOT NULL
                  THEN date_diff('day', o_orderdate, nxt)
                  ELSE date_diff('day', o_orderdate, (SELECT mxd FROM mx))
             END // 7 AS INT) AS week,
             CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS is_event
      FROM seq
    ),
    byw AS (
      SELECT week,
             CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS at1,
             CAST(COUNT(*) AS BIGINT) AS at_all,
             CAST(SUM(CASE WHEN grp = 1 THEN is_event ELSE 0 END) AS BIGINT)
               AS d1,
             CAST(SUM(is_event) AS BIGINT) AS d
      FROM dur GROUP BY 1
    ),
    risk AS (
      SELECT week, d1, d,
             CAST(SUM(at1) OVER () - SUM(at1) OVER
                  (ORDER BY week ROWS BETWEEN UNBOUNDED PRECEDING AND
                   CURRENT ROW) + at1 AS BIGINT) AS n1,
             CAST(SUM(at_all) OVER () - SUM(at_all) OVER
                  (ORDER BY week ROWS BETWEEN UNBOUNDED PRECEDING AND
                   CURRENT ROW) + at_all AS BIGINT) AS n
      FROM byw
    ),
    terms AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_weeks,
             CAST(SUM(d1) AS BIGINT) AS o1,
             SUM({_LOGRANK['e1_dec']}) AS e1_sum,
             SUM({_LOGRANK['ome_dec']}) AS ome_sum,
             SUM({_LOGRANK['v_dec']}) AS v_sum
      FROM risk WHERE d > 0
    )
    SELECT n_weeks, o1,
           ROUND(CAST(e1_sum AS DOUBLE), 6) AS e1,
           ROUND(CAST(ome_sum AS DOUBLE), 6) AS o_minus_e,
           ROUND(CAST(v_sum AS DOUBLE), 6) AS var_sum,
           ROUND(CAST(ome_sum AS DOUBLE) * CAST(ome_sum AS DOUBLE)
                 / CAST(v_sum AS DOUBLE), 6) AS chi2
    FROM terms
    """,
)
def stats_logrank_priority_survival(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Log-rank test comparing the repeat-purchase survival curves of
    URGENT vs non-urgent orders (same censored-duration construction
    as stats_kaplan_meier_survival; group = the priority of the order
    that OPENS the gap).  chi2 = (sum(d1-E1))^2 / sum(V) over event
    weeks, the standard Mantel-Cox form a churn A/B readout uses.

    Determinism: risk sets are exact integer suffix sums on the ~350-
    row week domain; per-week E1/V terms are correctly-rounded float
    compositions of identical integers (shared verbatim via
    _logrank_exprs), rounded to 9 decimals and summed as EXACT
    DECIMAL(28,9) so the reduction is order-independent; the final
    chi2 divides two identical doubles.  ~350 terms of magnitude <=
    ~100 stay far inside the decimal headroom.

    Scale shape: one o_custkey-partitioned lead window over orders
    (the same shuffle the KM query pays), ONE map-side-combined
    groupBy to the week domain, then tiny-domain windows and a 1-row
    reduce.  Nothing fact-scale happens after the first aggregate."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    mx = o.agg(F.max("o_orderdate").alias("mxd"))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dur = (
        o.withColumn("nxt", F.lead("o_orderdate").over(w))
        .crossJoin(F.broadcast(mx))
        .select(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("grp"),
            F.expr(
                "CAST(CASE WHEN nxt IS NOT NULL"
                " THEN datediff(nxt, o_orderdate)"
                " ELSE datediff(mxd, o_orderdate) END DIV 7 AS INT)"
            ).alias("week"),
            F.when(F.col("nxt").isNotNull(), 1).otherwise(0).alias(
                "is_event"
            ),
        )
    )
    byw = dur.groupBy("week").agg(
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("at1"),
        F.count(F.lit(1)).cast("bigint").alias("at_all"),
        F.sum(F.when(F.col("grp") == 1, F.col("is_event")).otherwise(0))
        .cast("bigint")
        .alias("d1"),
        F.sum("is_event").cast("bigint").alias("d"),
    )
    cum = Window.orderBy("week").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy(F.lit(1))
    risk = byw.select(
        "week",
        "d1",
        "d",
        (
            F.sum("at1").over(tot) - F.sum("at1").over(cum) + F.col("at1")
        )
        .cast("bigint")
        .alias("n1"),
        (
            F.sum("at_all").over(tot)
            - F.sum("at_all").over(cum)
            + F.col("at_all")
        )
        .cast("bigint")
        .alias("n"),
    )
    terms = risk.filter(F.col("d") > 0).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_weeks"),
        F.sum("d1").cast("bigint").alias("o1"),
        F.expr(f"SUM({_LOGRANK['e1_dec']})").alias("e1_sum"),
        F.expr(f"SUM({_LOGRANK['ome_dec']})").alias("ome_sum"),
        F.expr(f"SUM({_LOGRANK['v_dec']})").alias("v_sum"),
    )
    return terms.selectExpr(
        "n_weeks",
        "o1",
        "ROUND(CAST(e1_sum AS DOUBLE), 6) AS e1",
        "ROUND(CAST(ome_sum AS DOUBLE), 6) AS o_minus_e",
        "ROUND(CAST(v_sum AS DOUBLE), 6) AS var_sum",
        "ROUND(CAST(ome_sum AS DOUBLE) * CAST(ome_sum AS DOUBLE)"
        " / CAST(v_sum AS DOUBLE), 6) AS chi2",
    )


# ---------------------------------------------------------------------------
# Ljung-Box autocorrelation test over hourly event counts, lags 1..24
# ---------------------------------------------------------------------------

# chi2 95% critical values for df 1..24 (shared literal on both
# engines, so the reject comparison is engine-consistent by identity).
_CHI2_95 = [
    3.841459, 5.991465, 7.814728, 9.487729, 11.070498, 12.591587,
    14.067140, 15.507313, 16.918978, 18.307038, 19.675138, 21.026070,
    22.362032, 23.684791, 24.995790, 26.296228, 27.587112, 28.869299,
    30.143527, 31.410433, 32.670573, 33.924438, 35.172462, 36.415029,
]


def _ljungbox_exprs() -> dict:
    """Shared SQL fragments for lag-k autocorrelation from exact
    integer sums: with S1=sum(x), S2=sum(x^2) over the full series and
    per-lag Sxy=sum(x_t*x_{t-k}), T2=sum_{t>k}(x_t), T1=sum_{t<=n-k}
    (x_t), the centered cross-product has the closed form
    num = Sxy - xbar*(T1+T2) + (n-k)*xbar^2 — every float a correctly-
    rounded composition of identical integers (no per-term float
    reductions to drift)."""

    def d(c: str) -> str:
        return f"CAST({c} AS DOUBLE)"

    xb = f"({d('s1')}/{d('n')})"
    num = (
        f"({d('sxy')} - {xb}*({d('t1')} + {d('t2')})"
        f" + ({d('n')} - {d('k')})*{xb}*{xb})"
    )
    den = f"({d('s2')} - {d('s1')}*{d('s1')}/{d('n')})"
    r = f"({num} / {den})"
    return {
        "r": r,
        # per-lag Q term, rounded then decimal-exact cumulated so the
        # over-lags reduction is order-independent
        "term_dec": (
            f"CAST(ROUND({r}*{r} / ({d('n')} - {d('k')}), 15)"
            f" AS DECIMAL(28,18))"
        ),
    }


_LJB = _ljungbox_exprs()


@query(
    "stats_ljung_box_hourly",
    oracle=f"""
    WITH hr AS (
      SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY h) AS BIGINT) AS t, x FROM hr
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s1,
             CAST(SUM(x*x) AS BIGINT) AS s2
      FROM s
    ),
    lags AS (SELECT unnest(generate_series(1, 24)) AS k),
    byk AS (
      SELECT lags.k,
             CAST(SUM(a.x * b.x) AS BIGINT) AS sxy,
             CAST(SUM(a.x) AS BIGINT) AS t2,
             CAST(SUM(b.x) AS BIGINT) AS t1
      FROM lags, s a JOIN s b ON a.t = b.t + lags.k
      GROUP BY lags.k
    ),
    acf AS (
      SELECT k, n, ROUND({_LJB['r']}, 6) AS acf_k,
             SUM({_LJB['term_dec']}) OVER
               (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS qsum
      FROM byk, g
    )
    SELECT k AS lag, acf_k,
           ROUND(CAST(n AS DOUBLE)*(CAST(n AS DOUBLE) + 2.0)
                 * CAST(qsum AS DOUBLE), 6) AS q_stat,
           CAST(CAST(n AS DOUBLE)*(CAST(n AS DOUBLE) + 2.0)
                * CAST(qsum AS DOUBLE)
                > ([{', '.join(str(c) for c in _CHI2_95)}])[k] AS INT)
             AS reject_white_noise
    FROM acf ORDER BY lag
    """,
)
def stats_ljung_box_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test on the hourly event-count series,
    lags 1..24: per-lag autocorrelation r_k and the cumulative
    Q_k = n(n+2) * sum_{j<=k} r_j^2/(n-j), flagged against the chi2(k)
    95%% critical value.  The synthetic traffic has real diurnal
    seasonality, so Q blows past the critical value — the stationarity
    / whiteness check a forecasting pipeline runs before model fit.

    Determinism: the series is integer counts; r_k uses the closed
    centered form over exact integer sums (no per-term float sums to
    drift — _ljungbox_exprs, shared verbatim); the only cross-lag float
    reduction is the 24-term Q cumulation, rounded per-term to 15
    decimals and summed as EXACT DECIMAL(28,18).  The reject flag
    compares against a shared literal table.  Sxy stays in int64 up to
    ~3e8 events/hour over 720 hours — beyond that, pre-scale counts.

    Scale shape: ONE map-side-combinable groupBy hour over the fact
    scan; everything after runs on the ~720-row series frame (the
    tiny-domain window exemption) with a 24-row broadcast lag spine."""
    ev = read_events(spark, sf_dir)
    hr = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    s = hr.select(
        F.row_number().over(Window.orderBy("h")).cast("bigint").alias("t"),
        "x",
    ).transform(pin, eager=False)
    g = s.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("s2"),
    )
    lags = spark.range(1, 25).select(F.col("id").cast("bigint").alias("k"))
    a, b = s.alias("a"), s.alias("b")
    byk = (
        F.broadcast(lags)
        .join(a, how="cross")
        .join(b, F.col("a.t") == F.col("b.t") + F.col("k"))
        .groupBy("k")
        .agg(
            F.sum(F.col("a.x") * F.col("b.x")).cast("bigint").alias("sxy"),
            F.sum(F.col("a.x")).cast("bigint").alias("t2"),
            F.sum(F.col("b.x")).cast("bigint").alias("t1"),
        )
    )
    cum = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    acf = byk.crossJoin(F.broadcast(g)).selectExpr(
        "k", "n", f"ROUND({_LJB['r']}, 6) AS acf_k",
        f"{_LJB['term_dec']} AS term_dec",
    ).withColumn("qsum", F.sum("term_dec").over(cum))
    crit = "ARRAY({})".format(", ".join(str(c) for c in _CHI2_95))
    return acf.selectExpr(
        "k AS lag",
        "acf_k",
        "ROUND(CAST(n AS DOUBLE)*(CAST(n AS DOUBLE) + 2.0)"
        " * CAST(qsum AS DOUBLE), 6) AS q_stat",
        f"CAST(CAST(n AS DOUBLE)*(CAST(n AS DOUBLE) + 2.0)"
        f" * CAST(qsum AS DOUBLE) > element_at({crit}, CAST(k AS INT))"
        f" AS INT) AS reject_white_noise",
    ).orderBy("lag")


# ---------------------------------------------------------------------------
# Adamic-Adar link-prediction scores over the thresholded brand graph
# ---------------------------------------------------------------------------


@query(
    "graph_adamic_adar_brands",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    und AS (
      SELECT a.brand AS u, b.brand AS v, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ob a JOIN ob b ON a.ok = b.ok AND a.brand < b.brand
      GROUP BY a.brand, b.brand
    ),
    n AS (SELECT COUNT(*) AS n FROM und),
    th AS (
      SELECT cnt AS theta FROM (
        SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, u, v) AS rk
        FROM und
      ) WHERE rk = (SELECT CAST(CEIL(0.1 * n) AS BIGINT) FROM n)
    ),
    e0 AS (SELECT u, v FROM und WHERE cnt >= (SELECT theta FROM th)),
    e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
    deg AS (SELECT u AS w, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY 1),
    pairs AS (
      SELECT x.v AS u, y.v AS v, x.u AS w
      FROM e x JOIN e y ON x.u = y.u AND x.v < y.v
    )
    SELECT p.u, p.v,
           CAST(COUNT(*) AS BIGINT) AS n_common,
           ROUND(CAST(SUM(CAST(ROUND(1.0 / LN(CAST(deg.d AS DOUBLE)), 15)
                              AS DECIMAL(28,18))) AS DOUBLE), 6) AS aa_score,
           CAST(MAX(CASE WHEN e0.u IS NOT NULL THEN 1 ELSE 0 END) AS INT)
             AS is_existing_edge
    FROM pairs p
    JOIN deg ON deg.w = p.w
    LEFT JOIN e0 ON e0.u = p.u AND e0.v = p.v
    GROUP BY p.u, p.v
    ORDER BY p.u, p.v
    """,
)
def graph_adamic_adar_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link-prediction scores for every brand pair with at
    least one common neighbor in the SPARSIFIED co-purchase graph (same
    top-10%%-weight edge construction as graph_bfs_levels_brands):
    AA(u,v) = sum over common neighbors w of 1/ln(deg(w)), the classic
    "rare shared neighbors matter more" recommender score, with an
    is_existing_edge flag so non-edge high scorers read directly as
    link predictions.

    Determinism: the edge threshold is value-at-rank (value-determined
    under cnt ties); degrees are exact integers (a common neighbor has
    deg >= 2, so ln > 0); each 1/ln term is an identical expression
    rounded to 15 decimals and summed as EXACT DECIMAL(28,18), making
    the per-pair reduction order-independent; final score ROUND 6.

    Scale shape: the fact-scale work is the one lineitem-part join +
    DISTINCT; everything downstream (edges, degrees, the wedge join
    e(w,u)xe(w,v)) is brand-domain-bounded (<= |brands|^2 rows) and
    stays fully distributed — no driver collect, unlike the BFS query
    whose traversal is inherently sequential.  On a bigger label
    domain the wedge join fans out as sum_w deg(w)^2 — the standard
    AA cost, bounded by sparsification first."""
    und = (
        _brand_pair_occurrences(spark, sf_dir)
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .transform(pin, eager=False)
    )
    n = und.agg(F.count(F.lit(1)).alias("n"))
    rk = und.withColumn(
        "rk",
        F.row_number().over(
            # (u,v) pair grain: bounded enum-pair domain
            Window.orderBy(F.col("cnt").desc(), "u", "v")
        ),
    )
    th = (
        rk.crossJoin(F.broadcast(n))
        .filter(F.col("rk") == F.expr("CAST(CEIL(0.1 * n) AS BIGINT)"))
        .select(F.col("cnt").alias("theta"))
    )
    e0 = (
        und.crossJoin(F.broadcast(th))
        .filter(F.col("cnt") >= F.col("theta"))
        .select("u", "v")
        .transform(pin, eager=False)
    )
    e = e0.unionByName(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).transform(pin, eager=False)
    deg = e.groupBy(F.col("u").alias("w")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    x, y = e.alias("x"), e.alias("y")
    pairs = x.join(
        y,
        (F.col("x.u") == F.col("y.u")) & (F.col("x.v") < F.col("y.v")),
    ).select(
        F.col("x.v").alias("u"), F.col("y.v").alias("v"), F.col("x.u").alias("w")
    )
    term = (
        "CAST(ROUND(1.0 / LN(CAST(d AS DOUBLE)), 15) AS DECIMAL(28,18))"
    )
    ex = e0.select(
        F.col("u").alias("eu"), F.col("v").alias("ev"), F.lit(1).alias("hit")
    )
    return (
        pairs.join(F.broadcast(deg), "w")
        .join(
            F.broadcast(ex),
            (F.col("u") == F.col("eu")) & (F.col("v") == F.col("ev")),
            "left",
        )
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
            F.round(
                F.expr(f"SUM({term})").cast("double"), 6
            ).alias("aa_score"),
            F.max(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("int")
            .alias("is_existing_edge"),
        )
        .orderBy("u", "v")
    )


# ---------------------------------------------------------------------------
# Harmonic closeness centrality over the thresholded brand graph
# ---------------------------------------------------------------------------


@query(
    "graph_harmonic_closeness_brands",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    und AS (
      SELECT a.brand AS u, b.brand AS v, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ob a JOIN ob b ON a.ok = b.ok AND a.brand < b.brand
      GROUP BY a.brand, b.brand
    ),
    n AS (SELECT COUNT(*) AS n FROM und),
    th AS (
      SELECT cnt AS theta FROM (
        SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, u, v) AS rk
        FROM und
      ) WHERE rk = (SELECT CAST(CEIL(0.1 * n) AS BIGINT) FROM n)
    ),
    e0 AS (SELECT u, v FROM und WHERE cnt >= (SELECT theta FROM th)),
    e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
    srcs AS (SELECT DISTINCT u AS s FROM e),
    reach AS (
      WITH RECURSIVE bfs(src, node, lvl) AS (
        SELECT s, s, 0 FROM srcs
        UNION
        SELECT bfs.src, e.v, bfs.lvl + 1
        FROM bfs JOIN e ON e.u = bfs.node
        WHERE bfs.lvl < 24
      )
      SELECT src, node, CAST(MIN(lvl) AS BIGINT) AS d
      FROM bfs GROUP BY 1, 2
    ),
    harm AS (
      SELECT src,
             CAST(COUNT(*) AS BIGINT) AS n_reached,
             ROUND(CAST(SUM(CAST(ROUND(1.0 / CAST(d AS DOUBLE), 15)
                               AS DECIMAL(28,18))) AS DOUBLE), 6) AS harmonic
      FROM reach WHERE d > 0 GROUP BY src
    )
    SELECT ab.brand,
           COALESCE(harm.n_reached, 0) AS n_reached,
           COALESCE(harm.harmonic, 0.0) AS harmonic
    FROM (SELECT DISTINCT brand FROM ob) ab
    LEFT JOIN harm ON harm.src = ab.brand
    ORDER BY ab.brand
    """,
)
def graph_harmonic_closeness_brands(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Harmonic closeness centrality for every brand in the SPARSIFIED
    co-purchase graph (same top-10%%-weight construction as
    graph_bfs_levels_brands): C_H(u) = sum over reachable v != u of
    1/d(u,v) — the centrality that stays well-defined on disconnected
    graphs, where classic closeness breaks.

    Determinism: distances are exact integer BFS levels; each 1/d term
    is rounded to 15 decimals and summed as EXACT DECIMAL(28,18) (the
    per-source reduction is order-independent), ROUND 6; isolated
    brands emit exactly (0, 0.0).

    Scale shape: the fact-scale work (lineitem-part join + DISTINCT +
    edge agg) is fully distributed; the aggregated edge list is brand-
    domain bounded (<= |brands|^2 = 625 rows — the documented tiny-
    collect class), so the all-pairs BFS runs driver-side over the
    collected block and the (src, node, d) pair frame (<= 625 rows)
    goes back through createDataFrame; the harmonic sum itself is
    computed IN SPARK with the identical ROUND/DECIMAL expressions as
    the oracle (never Python round — banker's vs half-up,
    CLAUDE.md)."""
    import math as _math

    sets = pin(_order_brand_sets(spark, sf_dir), eager=False)
    und = (
        sets.select(F.explode(F.expr(_BRAND_PAIR_EXPR)).alias("p"))
        .groupBy(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    # Bounded collect: <= |brand-domain|^2 rows (625 at any SF).
    edges = und.collect()
    nrows = len(edges)
    by_weight = sorted(edges, key=lambda r: (-r["cnt"], r["u"], r["v"]))
    theta = by_weight[_math.ceil(0.1 * nrows) - 1]["cnt"]
    adj: dict[str, set[str]] = {}
    for r in edges:
        if r["cnt"] >= theta:
            adj.setdefault(r["u"], set()).add(r["v"])
            adj.setdefault(r["v"], set()).add(r["u"])
    pair_rows: list[tuple[str, str, int]] = []
    for s in sorted(adj):
        lvl = {s: 0}
        frontier = [s]
        depth = 0
        while frontier and depth < 24:
            depth += 1
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in lvl:
                        lvl[v] = depth
                        nxt.append(v)
            frontier = nxt
        pair_rows += [
            (s, node, d) for node, d in lvl.items() if d > 0
        ]
    pairs = spark.createDataFrame(
        pair_rows or [("", "", 0)], "src string, node string, d bigint"
    )
    if not pair_rows:
        pairs = pairs.filter(F.lit(False))
    harm = pairs.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_reached"),
        F.round(
            F.expr(
                "SUM(CAST(ROUND(1.0 / CAST(d AS DOUBLE), 15)"
                " AS DECIMAL(28,18)))"
            ).cast("double"),
            6,
        ).alias("harmonic"),
    )
    all_brands = sets.select(F.explode("bs").alias("brand")).distinct()
    return (
        all_brands.join(
            F.broadcast(harm), all_brands.brand == harm.src, "left"
        )
        .select(
            "brand",
            F.coalesce(F.col("n_reached"), F.lit(0))
            .cast("bigint")
            .alias("n_reached"),
            F.coalesce(F.col("harmonic"), F.lit(0.0)).alias("harmonic"),
        )
        .orderBy("brand")
    )


# ---------------------------------------------------------------------------
# Functional-dependency audit across candidate column pairs
# ---------------------------------------------------------------------------


@query(
    "quality_functional_dependency_audit",
    oracle="""
    WITH fd AS (
      SELECT 'orders: o_orderkey->o_custkey' AS fd_name,
             CAST(o_orderkey AS VARCHAR) AS lhs,
             CAST(o_custkey AS VARCHAR) AS rhs FROM orders
      UNION ALL
      SELECT 'part: p_partkey->p_brand',
             CAST(p_partkey AS VARCHAR), p_brand FROM part
      UNION ALL
      SELECT 'orders: o_custkey->o_orderpriority',
             CAST(o_custkey AS VARCHAR), o_orderpriority FROM orders
      UNION ALL
      SELECT 'customer: c_nationkey->c_mktsegment',
             CAST(c_nationkey AS VARCHAR), c_mktsegment FROM customer
      UNION ALL
      SELECT 'lineitem: l_partkey->l_suppkey',
             CAST(l_partkey AS VARCHAR),
             CAST(l_suppkey AS VARCHAR) FROM lineitem
    ),
    grain AS (
      SELECT fd_name, lhs, rhs, CAST(COUNT(*) AS BIGINT) AS n
      FROM fd GROUP BY 1, 2, 3
    ),
    per_lhs AS (
      SELECT fd_name, lhs,
             CAST(SUM(n) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS ndv_rhs
      FROM grain GROUP BY 1, 2
    )
    SELECT fd_name,
           CAST(COUNT(*) AS BIGINT) AS n_lhs_groups,
           CAST(SUM(CASE WHEN ndv_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_groups,
           CAST(SUM(CASE WHEN ndv_rhs > 1 THEN n_rows ELSE 0 END) AS BIGINT)
             AS n_rows_in_violations,
           CAST(MAX(ndv_rhs) AS BIGINT) AS max_rhs_per_lhs,
           CAST(SUM(CASE WHEN ndv_rhs > 1 THEN 1 ELSE 0 END) = 0 AS INT)
             AS fd_holds
    FROM per_lhs GROUP BY fd_name ORDER BY fd_name
    """,
)
def quality_functional_dependency_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Functional-dependency audit over five candidate X->Y pairs (two
    genuine key FDs, three plausible-but-violated ones): per FD, the
    lhs group count, how many lhs values map to >1 rhs, how many rows
    sit inside violating groups, and the worst fan-out — the profiling
    pass a schema-inference or constraint-mining tool runs before
    declaring dependencies.

    Determinism: pure integer counting on string-normalized pairs.

    Scale shape: each FD contributes one (lhs, rhs) DEDUP aggregate
    (map-side combinable) followed by a per-lhs rollup — the
    count_distinct Expand is avoided by aggregating the deduped grain
    (CLAUDE.md rule); the five FDs union at the 5-row summary grain
    only.  Each branch scans exactly two columns of its table."""
    specs = [
        ("orders: o_orderkey->o_custkey", "orders", "o_orderkey", "o_custkey"),
        ("part: p_partkey->p_brand", "part", "p_partkey", "p_brand"),
        (
            "orders: o_custkey->o_orderpriority",
            "orders",
            "o_custkey",
            "o_orderpriority",
        ),
        (
            "customer: c_nationkey->c_mktsegment",
            "customer",
            "c_nationkey",
            "c_mktsegment",
        ),
        ("lineitem: l_partkey->l_suppkey", "lineitem", "l_partkey", "l_suppkey"),
    ]
    outs = []
    for fd_name, tbl, lhs, rhs in specs:
        t = read_table(spark, sf_dir, tbl)
        grain = (
            t.select(
                F.lit(fd_name).alias("fd_name"),
                F.col(lhs).cast("string").alias("lhs"),
                F.col(rhs).cast("string").alias("rhs"),
            )
            .groupBy("fd_name", "lhs", "rhs")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )
        per_lhs = grain.groupBy("fd_name", "lhs").agg(
            F.sum("n").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("ndv_rhs"),
        )
        outs.append(
            per_lhs.groupBy("fd_name").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_lhs_groups"),
                F.sum(F.when(F.col("ndv_rhs") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("n_violating_groups"),
                F.sum(
                    F.when(F.col("ndv_rhs") > 1, F.col("n_rows")).otherwise(0)
                )
                .cast("bigint")
                .alias("n_rows_in_violations"),
                F.max("ndv_rhs").cast("bigint").alias("max_rhs_per_lhs"),
                (
                    F.sum(F.when(F.col("ndv_rhs") > 1, 1).otherwise(0)) == 0
                )
                .cast("int")
                .alias("fd_holds"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("fd_name")


# ---------------------------------------------------------------------------
# Rolling-median / rolling-MAD anomaly flags on daily event volume
# ---------------------------------------------------------------------------


@query(
    "events_rolling_median_mad_anomaly",
    oracle="""
    WITH byd AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT day, x,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t
      FROM byd
    ),
    pairs AS (
      SELECT a.day AS aday, a.x AS ax, b.day AS bday, b.x AS bx
      FROM s a JOIN s b ON b.t BETWEEN a.t - 6 AND a.t
    ),
    ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY aday
                     ORDER BY bx, bday) AS BIGINT) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY aday) AS BIGINT) AS wsize
      FROM pairs
    ),
    med AS (
      SELECT aday, wsize, bx AS med FROM ranked
      WHERE rn = (wsize + 1) // 2
    ),
    dev AS (
      SELECT p.aday, p.ax, m.wsize, m.med, p.bday,
             ABS(p.bx - m.med) AS ad
      FROM pairs p JOIN med m ON m.aday = p.aday
    ),
    dranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY aday
                     ORDER BY ad, bday) AS BIGINT) AS rn
      FROM dev
    ),
    mad AS (
      SELECT aday, ax, wsize, med, ad AS mad FROM dranked
      WHERE rn = (wsize + 1) // 2
    )
    SELECT aday AS day, ax AS n_events, wsize, med AS med7, mad AS mad7,
           ABS(ax - med) AS abs_dev,
           CAST(wsize = 7 AND 2 * ABS(ax - med) > 5 * mad AS INT)
             AS is_anomaly
    FROM mad ORDER BY day
    """,
)
def events_rolling_median_mad_anomaly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Trailing-7-day rolling MEDIAN + rolling MAD anomaly flags on
    daily event volume — the robust twin of events_daily_anomaly_zscore
    (a single bad day cannot drag the center or the spread the way it
    drags a mean/stddev).  A day is anomalous when |x - med| > 2.5*MAD
    and its window is complete.

    Determinism: the series is integer counts; rolling median and MAD
    are VALUE-AT-INDEX order statistics ((w+1) DIV 2, lower median)
    with (value, day) tie-breaks; the anomaly threshold is an integer
    cross-multiplication (2*dev > 5*mad), never a float ratio.

    Scale shape: ONE map-side-combinable groupBy day over the fact
    scan; the windowed self-join and both rank passes run on the day-
    domain frame (30 rows -> <=210 pairs, the tiny-domain exemption).
    At production day-counts the same plan holds: the pair frame is
    7x the day domain, never fact-scale."""
    ev = read_events(spark, sf_dir)
    byd = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    s = byd.select(
        "day",
        "x",
        F.row_number().over(Window.orderBy("day")).cast("bigint").alias("t"),
    ).transform(pin, eager=False)
    a, b = s.alias("a"), s.alias("b")
    pairs = a.join(
        b,
        (F.col("b.t") >= F.col("a.t") - 6) & (F.col("b.t") <= F.col("a.t")),
    ).select(
        F.col("a.day").alias("aday"),
        F.col("a.x").alias("ax"),
        F.col("b.day").alias("bday"),
        F.col("b.x").alias("bx"),
    ).transform(pin, eager=False)
    wm = Window.partitionBy("aday").orderBy("bx", "bday")
    wc = Window.partitionBy("aday")
    ranked = pairs.withColumn(
        "rn", F.row_number().over(wm).cast("bigint")
    ).withColumn("wsize", F.count(F.lit(1)).over(wc).cast("bigint"))
    med = ranked.filter(
        F.col("rn") == F.expr("(wsize + 1) DIV 2")
    ).select("aday", "wsize", F.col("bx").alias("med"))
    dev = pairs.join(F.broadcast(med), "aday").select(
        "aday",
        "ax",
        "wsize",
        "med",
        "bday",
        F.abs(F.col("bx") - F.col("med")).alias("ad"),
    )
    wd = Window.partitionBy("aday").orderBy("ad", "bday")
    mad = dev.withColumn(
        "rn", F.row_number().over(wd).cast("bigint")
    ).filter(F.col("rn") == F.expr("(wsize + 1) DIV 2"))
    return mad.select(
        F.col("aday").alias("day"),
        F.col("ax").alias("n_events"),
        "wsize",
        F.col("med").alias("med7"),
        F.col("ad").alias("mad7"),
        F.abs(F.col("ax") - F.col("med")).alias("abs_dev"),
        (
            (F.col("wsize") == 7)
            & (2 * F.abs(F.col("ax") - F.col("med")) > 5 * F.col("ad"))
        )
        .cast("int")
        .alias("is_anomaly"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Exact permutation test (md5-shuffled, integer-only) for mean difference
# ---------------------------------------------------------------------------


@query(
    "stats_permutation_test_mean_diff",
    oracle="""
    WITH ev AS (
      SELECT event_id, event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    base AS (
      SELECT CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN event_type = 'click' THEN cents ELSE 0 END)
                  AS BIGINT) AS s1,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN cents ELSE 0
                  END) AS BIGINT) AS s2
      FROM ev
    ),
    perms AS (SELECT unnest(generate_series(0, 39)) AS p),
    keyed AS (
      SELECT p, event_id, cents,
             md5(CAST(event_id AS VARCHAR) || ':' || CAST(p AS VARCHAR))
               AS mk
      FROM ev, perms
    ),
    ranked AS (
      SELECT p, cents,
             CAST(ROW_NUMBER() OVER (PARTITION BY p ORDER BY mk, event_id)
                  AS BIGINT) AS rn
      FROM keyed
    ),
    byp AS (
      SELECT p,
             CAST(SUM(CASE WHEN rn <= (SELECT n1 FROM base)
                      THEN cents ELSE 0 END) AS BIGINT) AS s1p,
             CAST(SUM(cents) AS BIGINT) AS stot
      FROM ranked GROUP BY p
    ),
    flags AS (
      SELECT CAST(CASE WHEN ABS(s1p * b.n2 - (stot - s1p) * b.n1)
                        >= ABS(b.s1 * b.n2 - b.s2 * b.n1)
                  THEN 1 ELSE 0 END AS BIGINT) AS extreme
      FROM byp, base b
    )
    SELECT b.n1, b.n2, b.s1 AS s1_cents, b.s2 AS s2_cents,
           ROUND(CAST(b.s1 AS DOUBLE) / CAST(b.n1 AS DOUBLE)
                 - CAST(b.s2 AS DOUBLE) / CAST(b.n2 AS DOUBLE), 6)
             AS mean_diff_cents,
           CAST(40 AS BIGINT) AS n_perms,
           (SELECT CAST(SUM(extreme) AS BIGINT) FROM flags) AS n_extreme,
           ROUND((SELECT CAST(SUM(extreme) AS DOUBLE) FROM flags) / 40.0, 6)
             AS p_value
    FROM base b
    """,
)
def stats_permutation_test_mean_diff(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT-ARITHMETIC permutation test for the click-vs-purchase mean
    value difference: 40 deterministic md5-keyed permutations of the
    pooled rows (rank by md5(event_id:perm), first n1 ranks form the
    pseudo-click group — true label permutation, group sizes preserved
    exactly), two-sided p = share of permutations whose |mean diff|
    reaches the observed one.

    Determinism: NO floats anywhere in the decision path — the mean
    comparison cross-multiplies to |s1p*n2 - s2p*n1| >= |s1*n2 - s2*n1|
    (exact int64: cents sums ~1e8 x counts ~2e4 = 1e12; past ~1e18
    widen to DECIMAL(38,0) comparisons), the shuffle key is md5 of a
    decimal string (bit-identical cross-engine, the CLAUDE.md
    sampling rule) with an event_id tie-break, and only the reported
    mean_diff/p_value are (identical-expression, rounded) floats.

    Scale shape: the 40x explode is the honest permutation cost; the
    rank uses with_grouped_global_row_number (one range shuffle keyed
    (perm, md5), contiguous perm runs, NO per-perm single-task sort —
    the operator built for exactly this few-huge-groups regime), and
    each permutation reduces map-side to one (s1p, stot) row."""
    from ..operators.ranking import with_grouped_global_row_number

    from ..operators.partitioning import spread

    ev = (
        read_events(spark, sf_dir)
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "event_id",
            "event_type",
            F.expr(
                "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
            ).alias("cents"),
        )
        # single-row-group scan → 1 task; the 40× perm explode and its
        # 1.6M md5s would otherwise run on one core (guide §2.5) —
        # spread the 3-column projection before pinning so every branch
        # reads a cores-wide checkpoint (keyed: skips the round-robin
        # local sort)
        .transform(lambda f: spread(f, by=["event_id"]))
        .transform(pin, eager=False)
    )
    base = ev.agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(
            F.when(F.col("event_type") == "click", F.col("cents")).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("s1"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase", F.col("cents")
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("s2"),
    )
    perms = spark.range(0, 40).select(F.col("id").alias("p"))
    keyed = ev.crossJoin(F.broadcast(perms)).select(
        "p",
        "event_id",
        "cents",
        F.md5(
            F.concat_ws(
                ":",
                F.col("event_id").cast("string"),
                F.col("p").cast("string"),
            )
        ).alias("mk"),
    )
    ranked = with_grouped_global_row_number(
        keyed, ["p"], ["mk", "event_id"], rn="rn"
    )
    byp = (
        ranked.crossJoin(F.broadcast(base.select("n1")))
        .groupBy("p")
        .agg(
            F.sum(
                F.when(F.col("rn") <= F.col("n1"), F.col("cents")).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias("s1p"),
            F.sum("cents").cast("bigint").alias("stot"),
        )
    )
    flags = byp.crossJoin(F.broadcast(base)).select(
        F.when(
            F.abs(
                F.col("s1p") * F.col("n2")
                - (F.col("stot") - F.col("s1p")) * F.col("n1")
            )
            >= F.abs(F.col("s1") * F.col("n2") - F.col("s2") * F.col("n1")),
            1,
        )
        .otherwise(0)
        .cast("bigint")
        .alias("extreme")
    )
    ext = flags.agg(F.sum("extreme").cast("bigint").alias("n_extreme"))
    return base.crossJoin(F.broadcast(ext)).selectExpr(
        "n1",
        "n2",
        "s1 AS s1_cents",
        "s2 AS s2_cents",
        "ROUND(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
        " - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6) AS mean_diff_cents",
        "CAST(40 AS BIGINT) AS n_perms",
        "n_extreme",
        "ROUND(CAST(n_extreme AS DOUBLE) / 40.0, 6) AS p_value",
    )


# ---------------------------------------------------------------------------
# STL-lite decomposition of the hourly series: trend / seasonal / residual
# ---------------------------------------------------------------------------


@query(
    "events_stl_hourly_decomposition",
    oracle="""
    WITH hr AS (
      SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY h) AS BIGINT) AS t,
             CAST(hour(h) AS INT) AS hod
      FROM hr
    ),
    tr AS (
      SELECT t, hod, x,
             CAST(SUM(x) OVER (ORDER BY t ROWS BETWEEN 23 PRECEDING AND
                  CURRENT ROW) AS BIGINT) AS s24
      FROM s
    ),
    d AS (
      SELECT hod, 24 * x - s24 AS dt FROM tr WHERE t >= 24
    )
    SELECT hod,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           CAST(SUM(dt) AS BIGINT) AS seas_num_scaled,
           CAST(SUM(dt * dt) AS BIGINT) AS seas_ss_scaled,
           ROUND(CAST(SUM(dt) AS DOUBLE)
                 / (24.0 * CAST(COUNT(*) AS DOUBLE)), 6) AS seasonal_mean,
           ROUND((CAST(SUM(dt * dt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                  - (CAST(SUM(dt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                    * (CAST(SUM(dt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)))
                 / 576.0, 6) AS within_hour_var
    FROM d GROUP BY hod ORDER BY hod
    """,
)
def events_stl_hourly_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STL-lite decomposition of hourly event volume: trend = trailing
    24h moving sum, detrended = 24*x - trend_sum (INTEGER-scaled, so
    the decomposition stays exact), seasonal index = per-hour-of-day
    mean of the detrended series, and the within-hour variance as the
    residual-strength readout.  The diurnal profile a capacity planner
    separates from trend before alerting on the remainder.

    Determinism: counts, the 24h window sum, and the scaled detrended
    values (and their squares) are exact integers; only the final
    mean/variance are identical-expression floats of those integers,
    ROUND 6.  dt^2 sums stay inside int64 up to ~3e6 events/hour
    (sf100-equivalent); past that, accumulate dt as DECIMAL(38,0).

    Scale shape: ONE map-side-combinable groupBy hour over the fact
    scan; the rolling window and hour-of-day rollup run on the ~720-row
    series frame (tiny-domain exemption)."""
    ev = read_events(spark, sf_dir)
    hr = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    s = hr.select(
        "x",
        F.row_number().over(Window.orderBy("h")).cast("bigint").alias("t"),
        F.hour("h").cast("int").alias("hod"),
    )
    w24 = Window.orderBy("t").rowsBetween(-23, 0)
    d = (
        s.withColumn("s24", F.sum("x").over(w24).cast("bigint"))
        .filter(F.col("t") >= 24)
        .select("hod", (24 * F.col("x") - F.col("s24")).alias("dt"))
    )
    return (
        d.groupBy("hod")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_obs"),
            F.sum("dt").cast("bigint").alias("seas_num_scaled"),
            F.sum(F.col("dt") * F.col("dt"))
            .cast("bigint")
            .alias("seas_ss_scaled"),
        )
        .selectExpr(
            "hod",
            "n_obs",
            "seas_num_scaled",
            "seas_ss_scaled",
            "ROUND(CAST(seas_num_scaled AS DOUBLE)"
            " / (24.0 * CAST(n_obs AS DOUBLE)), 6) AS seasonal_mean",
            "ROUND((CAST(seas_ss_scaled AS DOUBLE) / CAST(n_obs AS DOUBLE)"
            " - (CAST(seas_num_scaled AS DOUBLE) / CAST(n_obs AS DOUBLE))"
            " * (CAST(seas_num_scaled AS DOUBLE) / CAST(n_obs AS DOUBLE)))"
            " / 576.0, 6) AS within_hour_var",
        )
        .orderBy("hod")
    )


# ---------------------------------------------------------------------------
# Log2-binned magnitude histogram via exact bit-length binning
# ---------------------------------------------------------------------------


@query(
    "histogram_log2_value_magnitude",
    oracle="""
    WITH c AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events
    )
    SELECT event_type,
           CAST(LENGTH(bin(cents)) AS INT) AS log2_bin,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(MIN(cents) AS BIGINT) AS lo_cents,
           CAST(MAX(cents) AS BIGINT) AS hi_cents
    FROM c WHERE cents > 0
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def histogram_log2_value_magnitude(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Log2-spaced magnitude histogram of event values per type: the
    bin is the BIT LENGTH of the exact cents integer (length(bin(x)) —
    bit-identical in both engines, unlike floor(log2(x)) whose ln-ratio
    wobbles at power-of-two boundaries), giving the doubling-bucket
    view a latency/value dashboard uses for heavy-tailed metrics.

    Determinism: pure integer math end-to-end (exact cents, bit
    length, counts, min/max).

    Scale shape: ONE map-side-combinable groupBy on a
    (type, <=16-bin) key over a 2-column scan."""
    ev = read_events(spark, sf_dir)
    c = ev.select(
        "event_type",
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    ).filter(F.col("cents") > 0)
    return (
        c.groupBy(
            "event_type",
            F.length(F.bin("cents")).cast("int").alias("log2_bin"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.min("cents").cast("bigint").alias("lo_cents"),
            F.max("cents").cast("bigint").alias("hi_cents"),
        )
        .orderBy("event_type", "log2_bin")
    )


# ---------------------------------------------------------------------------
# Hodges-Lehmann location estimator of daily event volume
# ---------------------------------------------------------------------------


@query(
    "stats_hodges_lehmann_daily",
    oracle="""
    WITH byd AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT a.x + b.x AS s2, a.day AS da, b.day AS db
      FROM byd a JOIN byd b ON a.day <= b.day
    ),
    ranked AS (
      SELECT s2, CAST(ROW_NUMBER() OVER (ORDER BY s2, da, db) AS BIGINT)
               AS rk,
             CAST(COUNT(*) OVER () AS BIGINT) AS m
      FROM pairs
    ),
    med AS (
      SELECT CAST(SUM(CASE WHEN rk = (m + 1) // 2 THEN s2 ELSE 0 END)
                  AS BIGINT) AS lo2,
             CAST(SUM(CASE WHEN rk = (m + 2) // 2 THEN s2 ELSE 0 END)
                  AS BIGINT) AS hi2
      FROM ranked
    ),
    plain AS (
      SELECT x FROM (
        SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY x, day) AS BIGINT)
                 AS rk, CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM byd
      ) WHERE rk = (n + 1) // 2
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM byd) AS n_days,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_pairs,
           ROUND((CAST(lo2 AS DOUBLE) + CAST(hi2 AS DOUBLE)) / 4.0, 6)
             AS hodges_lehmann,
           (SELECT CAST(x AS BIGINT) FROM plain) AS plain_median
    FROM med
    """,
)
def stats_hodges_lehmann_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann location estimator of daily event volume — the
    median of all pairwise Walsh averages (x_i + x_j)/2, i <= j — next
    to the plain median: the robust location estimate with ~96%%
    Gaussian efficiency (vs the median's 64%%) that a monitoring
    baseline should actually center on.

    Determinism: Walsh averages are kept as INTEGER pair sums (s2 =
    x_i + x_j; halving deferred to the single final division), the
    median of the m pair sums is value-at-rank with (sum, day, day)
    tie-breaks, averaged low/high for even m — all exact integers
    until one rounded division.

    Scale shape: pairwise enumeration is day-DOMAIN quadratic (30
    days -> 465 pairs; calendar-bounded, never fact-scale), after ONE
    map-side-combinable groupBy day over the fact scan."""
    ev = read_events(spark, sf_dir)
    byd = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    ).transform(pin, eager=False)
    a, b = byd.alias("a"), byd.alias("b")
    pairs = a.join(b, F.col("a.day") <= F.col("b.day")).select(
        (F.col("a.x") + F.col("b.x")).alias("s2"),
        F.col("a.day").alias("da"),
        F.col("b.day").alias("db"),
    ).transform(pin, eager=False)
    wr = Window.orderBy("s2", "da", "db")
    wall = Window.partitionBy(F.lit(1))
    ranked = pairs.withColumn(
        "rk", F.row_number().over(wr).cast("bigint")
    ).withColumn("m", F.count(F.lit(1)).over(wall).cast("bigint"))
    med = ranked.agg(
        F.sum(
            F.when(
                F.col("rk") == F.expr("(m + 1) DIV 2"), F.col("s2")
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("lo2"),
        F.sum(
            F.when(
                F.col("rk") == F.expr("(m + 2) DIV 2"), F.col("s2")
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("hi2"),
    )
    wp = Window.orderBy("x", "day")
    plain = (
        byd.withColumn("rk", F.row_number().over(wp).cast("bigint"))
        .withColumn("n", F.count(F.lit(1)).over(wall).cast("bigint"))
        .filter(F.col("rk") == F.expr("(n + 1) DIV 2"))
        .select(F.col("x").cast("bigint").alias("plain_median"))
    )
    nd = byd.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    np_ = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    return (
        nd.crossJoin(F.broadcast(np_))
        .crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(plain))
        .selectExpr(
            "n_days",
            "n_pairs",
            "ROUND((CAST(lo2 AS DOUBLE) + CAST(hi2 AS DOUBLE)) / 4.0, 6)"
            " AS hodges_lehmann",
            "plain_median",
        )
    )


# ---------------------------------------------------------------------------
# Per-node local clustering coefficient over the thresholded brand graph
# ---------------------------------------------------------------------------


@query(
    "graph_clustering_coefficient_brands",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    und AS (
      SELECT a.brand AS u, b.brand AS v, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ob a JOIN ob b ON a.ok = b.ok AND a.brand < b.brand
      GROUP BY a.brand, b.brand
    ),
    n AS (SELECT COUNT(*) AS n FROM und),
    th AS (
      SELECT cnt AS theta FROM (
        SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, u, v) AS rk
        FROM und
      ) WHERE rk = (SELECT CAST(CEIL(0.1 * n) AS BIGINT) FROM n)
    ),
    e0 AS (SELECT u, v FROM und WHERE cnt >= (SELECT theta FROM th)),
    e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
    deg AS (SELECT u AS w, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY 1),
    tri AS (
      SELECT x.u AS w, CAST(COUNT(*) AS BIGINT) AS t2
      FROM e x
      JOIN e y ON y.u = x.v
      JOIN e z ON z.u = y.v AND z.v = x.u
      GROUP BY x.u
    )
    SELECT deg.w AS brand, deg.d AS degree,
           CAST(COALESCE(tri.t2, 0) / 2 AS BIGINT) AS n_triangles,
           CASE WHEN deg.d >= 2
                THEN ROUND(CAST(COALESCE(tri.t2, 0) AS DOUBLE)
                           / (CAST(deg.d AS DOUBLE)
                              * (CAST(deg.d AS DOUBLE) - 1.0)), 6)
                ELSE 0.0 END AS clustering_coef
    FROM deg LEFT JOIN tri ON tri.w = deg.w
    ORDER BY brand
    """,
)
def graph_clustering_coefficient_brands(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LOCAL clustering coefficient per node of the sparsified brand
    graph: C(w) = 2*triangles(w) / (deg(w)*(deg(w)-1)) — how close each
    brand's neighborhood is to a clique, the community-structure
    readout next to the global triangle count
    (graph_triangle_count_brands).

    Determinism: triangles per node counted by the directed 3-cycle
    join over the symmetrized edge list (each triangle at w counted
    twice: once per orientation — divided out as integer DIV 2 for the
    count and folded into the coefficient denominator); degrees and
    counts are exact integers; the one float is an identical-expression
    ratio of integers, ROUND 6.

    Scale shape: fact-scale work is the one lineitem-part join +
    DISTINCT; the wedge/cycle joins run on the brand-domain-bounded
    edge list (<= |brands|^2), fully distributed — cost sum_w deg(w)^2,
    the standard triangle bound, after top-10%-weight sparsification."""
    und = (
        _brand_pair_occurrences(spark, sf_dir)
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .transform(pin, eager=False)
    )
    n = und.agg(F.count(F.lit(1)).alias("n"))
    rk = und.withColumn(
        "rk",
        # (u,v) pair grain: bounded enum-pair domain
        F.row_number().over(Window.orderBy(F.col("cnt").desc(), "u", "v")),
    )
    th = (
        rk.crossJoin(F.broadcast(n))
        .filter(F.col("rk") == F.expr("CAST(CEIL(0.1 * n) AS BIGINT)"))
        .select(F.col("cnt").alias("theta"))
    )
    e0 = (
        und.crossJoin(F.broadcast(th))
        .filter(F.col("cnt") >= F.col("theta"))
        .select("u", "v")
    )
    e = e0.unionByName(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).transform(pin, eager=False)
    deg = e.groupBy(F.col("u").alias("w")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    x, y, z = e.alias("x"), e.alias("y"), e.alias("z")
    tri = (
        x.join(y, F.col("y.u") == F.col("x.v"))
        .join(
            z,
            (F.col("z.u") == F.col("y.v")) & (F.col("z.v") == F.col("x.u")),
        )
        .groupBy(F.col("x.u").alias("w"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("t2"))
    )
    return (
        deg.join(F.broadcast(tri), deg.w == tri.w, "left")
        .select(
            deg.w.alias("brand"),
            F.col("d").alias("degree"),
            F.expr("CAST(COALESCE(t2, 0) DIV 2 AS BIGINT)").alias(
                "n_triangles"
            ),
            F.when(
                F.col("d") >= 2,
                F.round(
                    F.coalesce(F.col("t2"), F.lit(0)).cast("double")
                    / (
                        F.col("d").cast("double")
                        * (F.col("d").cast("double") - 1.0)
                    ),
                    6,
                ),
            )
            .otherwise(0.0)
            .alias("clustering_coef"),
        )
        .orderBy("brand")
    )


# ---------------------------------------------------------------------------
# CUPED variance-reduced A/B readout from exact integer moments
# ---------------------------------------------------------------------------


def _cuped_exprs() -> dict:
    """Shared SQL fragments for CUPED: theta = cov(x,y)/var(x) over
    per-user (pre, post) cent totals, adjusted per-arm means — every
    float a +,-,*,/ composition of identical integer sums (n, sx, sy,
    sxx, sxy per arm and pooled), correctly rounded hence bit-identical
    cross-engine."""

    def d(c: str) -> str:
        return f"CAST({c} AS DOUBLE)"

    # pooled theta (computed over all users, the standard CUPED form)
    var = f"({d('sxx')} - {d('sx')}*{d('sx')}/{d('n')})"
    cov = f"({d('sxy')} - {d('sx')}*{d('sy')}/{d('n')})"
    theta = f"({cov} / {var})"
    return {"theta": theta}


_CUPED = _cuped_exprs()


@query(
    "events_ab_cuped_adjustment",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(user_id % 2 AS INT) AS arm,
             CAST(SUM(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                  THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                  THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    pooled AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x*x) AS BIGINT) AS sxx,
             CAST(SUM(x*y) AS BIGINT) AS sxy
      FROM per_user
    ),
    arms AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_a,
             CAST(SUM(x) AS BIGINT) AS sx_a,
             CAST(SUM(y) AS BIGINT) AS sy_a
      FROM per_user GROUP BY arm
    )
    SELECT arm, n_a AS n_users,
           ROUND(CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6)
             AS mean_post_cents,
           ROUND({_CUPED['theta']}, 9) AS theta,
           ROUND(CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                 - {_CUPED['theta']}
                   * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                      - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6)
             AS cuped_adjusted_mean
    FROM arms, pooled ORDER BY arm
    """,
)
def events_ab_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout (the pre-period-covariate
    adjustment every mature experimentation platform applies):
    per-user pre-period (days 1-15) and post-period (days 16+) spend
    in exact cents, pooled theta = cov(pre, post)/var(pre), and each
    arm's adjusted mean = mean(y) - theta*(mean(x) - pooled mean(x)).
    Arms are the deterministic user_id %% 2 split of
    events_ab_conversion_uplift.

    Determinism: all moment sums are exact int64 (x,y <= ~5e6 cents
    per user; sxy <= 2.5e13 * users — past ~3e5 users widen sxx/sxy
    to DECIMAL(38,0)); theta and the adjusted means are identical-
    expression float compositions of those integers (shared verbatim
    via _cuped_exprs), ROUND 6/9.

    Scale shape: ONE map-side-combinable groupBy user over the fact
    scan, then 1-row/2-row domain frames; the moment products ride
    the same pass."""
    ev = read_events(spark, sf_dir)
    pu = (
        ev.select(
            "user_id",
            F.expr("CAST(user_id % 2 AS INT)").alias("arm"),
            F.expr(
                "CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'"
                " THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
                " ELSE 0 END"
            ).alias("xv"),
            F.expr(
                "CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'"
                " THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
                " ELSE 0 END"
            ).alias("yv"),
        )
        .groupBy("user_id", "arm")
        .agg(
            F.sum("xv").cast("bigint").alias("x"),
            F.sum("yv").cast("bigint").alias("y"),
        )
        .transform(pin, eager=False)
    )
    pooled = pu.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    arms = pu.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_a"),
        F.sum("x").cast("bigint").alias("sx_a"),
        F.sum("y").cast("bigint").alias("sy_a"),
    )
    return (
        arms.crossJoin(F.broadcast(pooled))
        .selectExpr(
            "arm",
            "n_a AS n_users",
            "ROUND(CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6)"
            " AS mean_post_cents",
            f"ROUND({_CUPED['theta']}, 9) AS theta",
            f"ROUND(CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
            f" - {_CUPED['theta']}"
            f" * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
            f" - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6)"
            " AS cuped_adjusted_mean",
        )
        .orderBy("arm")
    )


# ---------------------------------------------------------------------------
# Poisson overdispersion (dispersion index) test on hourly volume
# ---------------------------------------------------------------------------


def _dispersion_exprs() -> dict:
    """Shared SQL fragments: dispersion index and chi-square vs the
    Wilson-Hilferty 95% critical value, all from integer (n, s1, s2) —
    identical-expression floats, correctly rounded ops only."""

    def d(c: str) -> str:
        return f"CAST({c} AS DOUBLE)"

    n, s1, s2 = (d(c) for c in ("n", "s1", "s2"))
    mean = f"({s1}/{n})"
    var = f"(({s2} - {s1}*{s1}/{n}) / ({n} - 1.0))"
    chi2 = f"(({n} - 1.0) * {var} / {mean})"
    df = f"({n} - 1.0)"
    wh = (
        f"({df} * (1.0 - 2.0/(9.0*{df})"
        f" + 1.6448536269514722*sqrt(2.0/(9.0*{df})))"
        f" * (1.0 - 2.0/(9.0*{df})"
        f" + 1.6448536269514722*sqrt(2.0/(9.0*{df})))"
        f" * (1.0 - 2.0/(9.0*{df})"
        f" + 1.6448536269514722*sqrt(2.0/(9.0*{df}))))"
    )
    return {"mean": mean, "var": var, "chi2": chi2, "crit": wh}


_DISP = _dispersion_exprs()


@query(
    "events_dispersion_index_hourly",
    oracle=f"""
    WITH hr AS (
      SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s1,
             CAST(SUM(x*x) AS BIGINT) AS s2
      FROM hr
    )
    SELECT n AS n_hours,
           ROUND({_DISP['mean']}, 6) AS mean_per_hour,
           ROUND({_DISP['var']}, 6) AS var_per_hour,
           ROUND({_DISP['var']} / {_DISP['mean']}, 6) AS dispersion_index,
           ROUND({_DISP['chi2']}, 6) AS chi2,
           ROUND({_DISP['crit']}, 6) AS chi2_crit_95,
           CAST({_DISP['chi2']} > {_DISP['crit']} AS INT) AS overdispersed
    FROM g
    """,
)
def events_dispersion_index_hourly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Poisson OVERDISPERSION test on hourly event counts: dispersion
    index var/mean and the chi-square (n-1)*var/mean against the
    Wilson-Hilferty 95%% critical value — the check that tells a
    capacity model whether plain-Poisson arrival assumptions hold
    (diurnal seasonality makes this corpus wildly overdispersed, so the
    flag fires; complements stats_ljung_box_hourly which localizes the
    structure by lag).

    Determinism: integer count moments; every float (including the
    Wilson-Hilferty cube and the flag comparison) is an identical
    expression over those integers, shared verbatim (_dispersion_exprs)
    — correctly-rounded ops only, no exp/ln.

    Scale shape: ONE map-side-combinable groupBy hour, then a 1-row
    reduce."""
    ev = read_events(spark, sf_dir)
    hr = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    g = hr.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("s2"),
    )
    return g.selectExpr(
        "n AS n_hours",
        f"ROUND({_DISP['mean']}, 6) AS mean_per_hour",
        f"ROUND({_DISP['var']}, 6) AS var_per_hour",
        f"ROUND({_DISP['var']} / {_DISP['mean']}, 6) AS dispersion_index",
        f"ROUND({_DISP['chi2']}, 6) AS chi2",
        f"ROUND({_DISP['crit']}, 6) AS chi2_crit_95",
        f"CAST({_DISP['chi2']} > {_DISP['crit']} AS INT) AS overdispersed",
    )


# ---------------------------------------------------------------------------
# Kruskal-Wallis H across order priorities (rank-based one-way ANOVA)
# ---------------------------------------------------------------------------

# Shared final-expression fragments (the _ols2_exprs discipline): the
# H computation composes divisions of near-equal magnitudes, so ONLY a
# bit-identical expression shape on both engines survives. Upstream
# inputs (n_g, s2_g, tie_sum, k, n) are exact int64 on both sides.
_KW_DEV = "(CAST(s2_g AS DOUBLE) / (2.0 * n_g) - (n + 1) / 2.0)"
_KW_SUMTERM = f"SUM(CAST(n_g AS DOUBLE) * {_KW_DEV} * {_KW_DEV})"
_KW_H = "(12.0 * sum_term / (CAST(n AS DOUBLE) * (n + 1)))"
_KW_C = (
    "(1.0 - CAST(tie_sum AS DOUBLE)"
    " / (CAST(n AS DOUBLE) * n * n - CAST(n AS DOUBLE)))"
)


@query(
    "stats_kruskal_wallis_h",
    oracle=f"""
    WITH c AS (
      SELECT o_orderpriority AS grp,
             {_SQL_CENTS.format(col='o_totalprice')} AS cents
      FROM orders
    ),
    grain AS (
      SELECT grp, cents, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM c GROUP BY grp, cents
    ),
    vg AS (
      SELECT cents, CAST(SUM(cnt) AS BIGINT) AS t_cnt
      FROM grain GROUP BY cents
    ),
    g AS (
      SELECT cents,
             2 * CAST(SUM(t_cnt) OVER (ORDER BY cents) AS BIGINT)
               - t_cnt + 1 AS r2,
             t_cnt
      FROM vg
    ),
    per AS (
      SELECT grp,
             CAST(SUM(cnt) AS BIGINT) AS n_g,
             CAST(SUM(cnt * r2) AS BIGINT) AS s2_g
      FROM grain JOIN g USING (cents) GROUP BY grp
    ),
    ties AS (
      SELECT CAST(SUM(t_cnt * t_cnt * t_cnt - t_cnt) AS BIGINT) AS tie_sum
      FROM vg
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n_g) AS BIGINT) AS n
      FROM per
    ),
    dev AS (
      SELECT MAX(k) AS k, MAX(n) AS n, {_KW_SUMTERM} AS sum_term
      FROM per, tot
    )
    SELECT k AS k_groups, n AS n_total, tie_sum,
           ROUND({_KW_H} / {_KW_C}, 6) AS h_stat,
           ROUND(({_KW_H} / {_KW_C} - k + 1)
                 / (CAST(n AS DOUBLE) - k), 9) AS epsilon_sq
    FROM dev, ties
    """,
)
def stats_kruskal_wallis_h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H (rank-based one-way ANOVA) of order totals
    across the five order priorities, tie-corrected. Average ranks are
    held EXACTLY in integers on the value grain — for a distinct value
    with t occurrences after b smaller rows, 2·avg_rank = 2b + t + 1
    (the Mann-Whitney construction generalized to k groups) — so the
    per-group rank sums S2_g = Σ cnt·(2b+t+1) are exact int64 and the
    only float work is the final closed form, computed in the
    cancellation-free centered shape H = 12/(N(N+1))·Σ n_g·(r̄_g −
    (N+1)/2)² from shared SQL fragments interpolated verbatim into
    both engines (fp error ~1e-13 ≪ the 1e-6 rounding grain even at
    100x sf0.1).

    Scale shape: value-grain groupBy (map-side combinable), ONE
    distributed range shuffle for the global cumulative tie counts
    (`with_global_prefix_sum` — no single-task window), then all math
    on k=5 group rows.
    """
    from ..operators.ranking import with_global_prefix_sum

    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        _cents("o_totalprice").alias("cents"),
    )
    grain = o.groupBy("grp", "cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    grain = pin(grain)  # consumed by the tie grain AND the rank join
    vg = grain.groupBy("cents").agg(
        F.sum("cnt").cast("bigint").alias("t_cnt")
    )
    vg = pin(vg)
    g = with_global_prefix_sum(vg, ["cents"], "t_cnt", rn="__rn", cum="cum_t")
    g = g.select(
        "cents",
        (2 * F.col("cum_t") - F.col("t_cnt") + 1).cast("bigint").alias("r2"),
    )
    per = (
        grain.join(g, "cents")
        .groupBy("grp")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_g"),
            F.sum(F.col("cnt") * F.col("r2")).cast("bigint").alias("s2_g"),
        )
    )
    ties = vg.agg(
        F.sum(
            F.col("t_cnt") * F.col("t_cnt") * F.col("t_cnt") - F.col("t_cnt")
        )
        .cast("bigint")
        .alias("tie_sum")
    )
    tot = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_g").cast("bigint").alias("n"),
    )
    dev = (
        per.crossJoin(F.broadcast(tot))
        .selectExpr("k", "n", "n_g", "s2_g")
        .groupBy()
        .agg(
            F.max("k").alias("k"),
            F.max("n").alias("n"),
            F.expr(_KW_SUMTERM).alias("sum_term"),
        )
    )
    return dev.crossJoin(F.broadcast(ties)).selectExpr(
        "k AS k_groups",
        "n AS n_total",
        "tie_sum",
        f"ROUND({_KW_H} / {_KW_C}, 6) AS h_stat",
        f"ROUND(({_KW_H} / {_KW_C} - k + 1)"
        " / (CAST(n AS DOUBLE) - k), 9) AS epsilon_sq",
    )


# ---------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard (complement to the KM estimator)
# ---------------------------------------------------------------------------


@query(
    "stats_nelson_aalen_cumhaz",
    oracle="""
    WITH mx AS (SELECT MAX(o_orderdate) AS mxd FROM orders),
    seq AS (
      SELECT o_orderdate,
             LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS nxt
      FROM orders
    ),
    dur AS (
      SELECT CASE WHEN nxt IS NOT NULL
                  THEN date_diff('day', o_orderdate, nxt)
                  ELSE date_diff('day', o_orderdate, (SELECT mxd FROM mx))
             END AS gap_days,
             CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS is_event
      FROM seq
    ),
    byw AS (
      SELECT CAST(gap_days // 7 AS INT) AS week,
             CAST(SUM(is_event) AS BIGINT) AS d_events,
             CAST(SUM(1 - is_event) AS BIGINT) AS c_censored
      FROM dur GROUP BY 1
    ),
    na AS (
      SELECT week, d_events, c_censored,
             CAST(SUM(d_events + c_censored) OVER ()
                  - SUM(d_events + c_censored) OVER
                      (ORDER BY week ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW)
                  + (d_events + c_censored) AS BIGINT) AS n_risk
      FROM byw
    )
    SELECT week, n_risk, d_events,
           ROUND(CAST(SUM(CAST(CAST(d_events AS DOUBLE) / n_risk
                          AS DECIMAL(28,12)))
                 OVER (ORDER BY week ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS DOUBLE), 6) AS cum_hazard,
           ROUND(CAST(SUM(CAST(CAST(d_events AS DOUBLE)
                          / (CAST(n_risk AS DOUBLE) * n_risk)
                          AS DECIMAL(28,12)))
                 OVER (ORDER BY week ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS DOUBLE), 9) AS cum_haz_var
    FROM na ORDER BY week
    """,
)
def stats_nelson_aalen_cumhaz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard H(t) = Σ_{u≤t} d_u/n_u (with its
    variance Σ d_u/n_u²) over the same censored repeat-purchase-gap
    grain as stats_kaplan_meier_survival — the estimator that stays
    stable when KM's product hits small risk sets, and the additive
    form churn-hazard models consume directly.

    Determinism: durations/counts are exact integer date math; each
    hazard increment d/n is ONE correctly-rounded double division of
    identical integers, quantized to DECIMAL(28,12) BEFORE the window
    sum so the cumulative is exact decimal addition (order-free —
    engines' windowed double summation trees differ), then rounded at
    emission.

    Scale shape: identical to KM — one o_custkey shuffle for the lead
    window, a map-side week-grain rollup, windows over the ~350-row
    week domain only.
    """
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    mx = o.agg(F.max("o_orderdate").alias("mxd"))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dur = (
        o.withColumn("nxt", F.lead("o_orderdate").over(w))
        .crossJoin(F.broadcast(mx))
        .select(
            F.when(
                F.col("nxt").isNotNull(), F.datediff("nxt", "o_orderdate")
            )
            .otherwise(F.datediff("mxd", "o_orderdate"))
            .alias("gap_days"),
            F.when(F.col("nxt").isNotNull(), 1).otherwise(0).alias(
                "is_event"
            ),
        )
        .select(
            F.expr("CAST(gap_days DIV 7 AS INT)").alias("week"), "is_event"
        )
    )
    byw = dur.groupBy("week").agg(
        F.sum("is_event").cast("bigint").alias("d_events"),
        F.sum(1 - F.col("is_event")).cast("bigint").alias("c_censored"),
    )
    cum = Window.orderBy("week").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy(F.lit(1))
    at = F.col("d_events") + F.col("c_censored")
    na = byw.withColumn(
        "n_risk",
        (F.sum(at).over(tot) - F.sum(at).over(cum) + at).cast("bigint"),
    )
    inc = (F.col("d_events").cast("double") / F.col("n_risk")).cast(
        "decimal(28,12)"
    )
    inc_var = (
        F.col("d_events").cast("double")
        / (F.col("n_risk").cast("double") * F.col("n_risk"))
    ).cast("decimal(28,12)")
    return (
        na.withColumn(
            "cum_hazard", F.round(F.sum(inc).over(cum).cast("double"), 6)
        )
        .withColumn(
            "cum_haz_var", F.round(F.sum(inc_var).over(cum).cast("double"), 9)
        )
        .select("week", "n_risk", "d_events", "cum_hazard", "cum_haz_var")
        .orderBy("week")
    )


# ---------------------------------------------------------------------------
# Cochran-Armitage trend test: completion rate across ordinal priorities
# ---------------------------------------------------------------------------

# One shared fragment for the z statistic: T/sqrt(p(1-p)·Sxx) over the
# five exact int64 sufficient statistics (n, r, s1, s2, sr). Every
# operation is a correctly-rounded IEEE op on identical inputs, so the
# result is bit-equal cross-engine with no rounding fudge (the
# stats_kendall_tau_brand precedent).
_CA_Z = (
    "((CAST(sr AS DOUBLE) - CAST(r AS DOUBLE) * s1 / n)"
    " / sqrt((CAST(r AS DOUBLE) / n) * (1.0 - CAST(r AS DOUBLE) / n)"
    "        * (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)))"
)


@query(
    "orders_cochran_armitage_trend",
    oracle=f"""
    WITH c AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS s,
             CASE WHEN o_orderstatus <> 'O' THEN 1 ELSE 0 END AS ev
      FROM orders
    ),
    suff AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(ev) AS BIGINT) AS r,
             CAST(SUM(s) AS BIGINT) AS s1,
             CAST(SUM(s * s) AS BIGINT) AS s2,
             CAST(SUM(s * ev) AS BIGINT) AS sr
      FROM c
    )
    SELECT n AS n_total, r AS n_events,
           {_CA_Z} AS z_trend,
           {_CA_Z} * {_CA_Z} AS chi2_trend
    FROM suff
    """,
)
def orders_cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test: does the order-completion rate
    (status ≠ 'O') trend monotonically across the ORDINAL priority
    scale 1-URGENT … 5-LOW? The binary-outcome-vs-ordered-groups test
    a dose-response / severity analysis runs, stronger than the
    unordered chi-square when the alternative is a trend.

    Determinism: the five sufficient statistics (N, R, Σs, Σs², Σs·ev)
    are exact int64 map-side aggregates; z is ONE shared-fragment
    double expression over them — bit-equal cross-engine, no rounding
    needed.

    Scale shape: a single map-side-combinable aggregate over the scan
    (no shuffle beyond the 1-row combine); nothing downstream touches
    raw rows.
    """
    o = read_table(spark, sf_dir, "orders").selectExpr(
        "CAST(substr(o_orderpriority, 1, 1) AS INT) AS s",
        "CASE WHEN o_orderstatus <> 'O' THEN 1 ELSE 0 END AS ev",
    )
    suff = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("ev").cast("bigint").alias("r"),
        F.sum("s").cast("bigint").alias("s1"),
        F.sum(F.col("s") * F.col("s")).cast("bigint").alias("s2"),
        F.sum(F.col("s") * F.col("ev")).cast("bigint").alias("sr"),
    )
    return suff.selectExpr(
        "n AS n_total",
        "r AS n_events",
        f"{_CA_Z} AS z_trend",
        f"{_CA_Z} * {_CA_Z} AS chi2_trend",
    )


# ---------------------------------------------------------------------------
# Grubbs max-deviation outlier statistic on event values
# ---------------------------------------------------------------------------

# G = max(|x_max - mean|, |mean - x_min|) / s from five exact int64
# sufficient statistics (n, s1=Σc, q=Σc², maxc, minc) — one shared
# fragment, bit-equal cross-engine (cents ≤ 1e5 so q ≤ n·1e10 stays
# int64-safe past sf1).
_GRUBBS_MEAN = "(CAST(s1 AS DOUBLE) / n)"
_GRUBBS_SD = (
    "sqrt((CAST(q AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)"
    " / (CAST(n AS DOUBLE) - 1.0))"
)
_GRUBBS_G = (
    f"(CASE WHEN maxc - {_GRUBBS_MEAN} >= {_GRUBBS_MEAN} - minc"
    f"      THEN maxc - {_GRUBBS_MEAN} ELSE {_GRUBBS_MEAN} - minc END"
    f" / {_GRUBBS_SD})"
)


@query(
    "stats_grubbs_max_outlier",
    oracle=f"""
    WITH c AS (
      SELECT {_SQL_CENTS.format(col='value')} AS cents FROM events
    ),
    suff AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s1,
             CAST(SUM(cents * cents) AS BIGINT) AS q,
             CAST(MAX(cents) AS BIGINT) AS maxc,
             CAST(MIN(cents) AS BIGINT) AS minc
      FROM c
    )
    SELECT n AS n_rows, maxc AS max_cents, minc AS min_cents,
           {_GRUBBS_G} AS g_stat
    FROM suff
    """,
)
def stats_grubbs_max_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs (extreme studentized deviate) statistic for the single
    most extreme event value: G = max(|x_(n) − x̄|, |x̄ − x_(1)|)/s —
    the classical one-outlier screen that complements the IQR/MAD keys
    (those flag counts; Grubbs scores THE extreme).

    Determinism: five exact int64 sufficient statistics (value is
    exactly 2-decimal; Σc² ≤ n·1e10 stays int64-safe beyond sf1) feed
    one shared-fragment double expression — bit-equal cross-engine, no
    rounding needed.

    Scale shape: one map-side-combinable aggregate over the scan.
    """
    ev = read_events(spark, sf_dir).select(_cents("value").alias("cents"))
    suff = ev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).cast("bigint").alias("q"),
        F.max("cents").cast("bigint").alias("maxc"),
        F.min("cents").cast("bigint").alias("minc"),
    )
    return suff.selectExpr(
        "n AS n_rows",
        "maxc AS max_cents",
        "minc AS min_cents",
        f"{_GRUBBS_G} AS g_stat",
    )


# ---------------------------------------------------------------------------
# Friedman test: do event types rank consistently across day blocks?
# ---------------------------------------------------------------------------


@query(
    "stats_friedman_test",
    oracle=f"""
    WITH cell AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM({_SQL_CENTS.format(col='value')}) AS BIGINT) AS s
      FROM events GROUP BY 1, 2
    ),
    kk AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k FROM cell),
    full_days AS (
      SELECT day FROM cell GROUP BY day
      HAVING COUNT(*) = (SELECT k FROM kk)
    ),
    c AS (SELECT cell.* FROM cell JOIN full_days USING (day)),
    r AS (
      SELECT a.day, a.event_type,
             CAST(2 * SUM(CASE WHEN b.s * a.n < a.s * b.n THEN 1 ELSE 0 END)
                  + SUM(CASE WHEN b.s * a.n = a.s * b.n THEN 1 ELSE 0 END)
                  + 1 AS BIGINT) AS r2
      FROM c a JOIN c b ON a.day = b.day
      GROUP BY a.day, a.event_type
    ),
    per AS (
      SELECT event_type, CAST(SUM(r2) AS BIGINT) AS s2,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM r GROUP BY event_type
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(MAX(n_days) AS BIGINT) AS n
      FROM per
    ),
    agg AS (
      SELECT tot.k, tot.n,
             CAST(SUM((s2 - tot.n * (tot.k + 1))
                      * (s2 - tot.n * (tot.k + 1))) AS BIGINT) AS sum_d2
      FROM per, tot GROUP BY tot.k, tot.n
    )
    SELECT k AS k_treatments, n AS n_blocks, sum_d2,
           3.0 * sum_d2 / (CAST(n AS DOUBLE) * k * (k + 1)) AS chi2_friedman,
           3.0 * sum_d2 / (CAST(n AS DOUBLE) * k * (k + 1))
             / (CAST(n AS DOUBLE) * (k - 1)) AS kendalls_w
    FROM agg
    """,
)
def stats_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test (rank-based repeated-measures ANOVA): do the
    event types keep the same mean-value ordering across day blocks?
    Each complete day ranks its k types by daily mean value; χ² =
    3·Σ d_j²/(n·k·(k+1)) with d_j = (2·rank-sum)_j − n(k+1), plus
    Kendall's W concordance.

    Determinism: ALL-INTEGER ranks — within a block, mean comparisons
    s_a/n_a vs s_b/n_b are done as exact cross-multiplications
    (s_a·n_b vs s_b·n_a, CLAUDE.md threshold rule), and tie-aware
    average ranks use the 2·rank = 2·smaller + equal + 1 construction,
    so the statistic is one double division of exact int64s — bit-equal
    cross-engine, no rounding.

    Scale shape: one map-side-combinable (day, type) rollup; the
    within-block rank join is k² rows per day over the tiny cell grain
    (k=5); everything downstream is k rows.
    """
    ev = read_events(spark, sf_dir)
    cell = ev.groupBy(
        F.col("ts").cast("date").alias("day"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(_cents("value")).cast("bigint").alias("s"),
    )
    cell = pin(cell)  # consumed by k-count, completeness gate, rank join
    k_val = cell.agg(
        F.countDistinct("event_type").cast("bigint").alias("k")
    )
    full_days = (
        cell.groupBy("day")
        .agg(F.count(F.lit(1)).alias("__c"))
        .crossJoin(F.broadcast(k_val))
        .filter(F.col("__c") == F.col("k"))
        .select("day")
    )
    c = cell.join(F.broadcast(full_days), "day")
    a = c.select("day", "event_type", "n", "s")
    b = c.select(
        F.col("day").alias("day"),
        F.col("n").alias("nb"),
        F.col("s").alias("sb"),
    )
    r = (
        a.join(b, "day")
        .groupBy("day", "event_type")
        .agg(
            (
                2
                * F.sum(
                    F.when(
                        F.col("sb") * F.col("n") < F.col("s") * F.col("nb"),
                        1,
                    ).otherwise(0)
                )
                + F.sum(
                    F.when(
                        F.col("sb") * F.col("n") == F.col("s") * F.col("nb"),
                        1,
                    ).otherwise(0)
                )
                + 1
            )
            .cast("bigint")
            .alias("r2")
        )
    )
    per = r.groupBy("event_type").agg(
        F.sum("r2").cast("bigint").alias("s2"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    # d_j needs n and k, both aggregates of the same 5-row frame; a
    # second tiny pass keeps it relational instead of array-wrangling
    per = pin(per)
    agg = (
        per.crossJoin(
            F.broadcast(
                per.agg(
                    F.count(F.lit(1)).cast("bigint").alias("k"),
                    F.max("n_days").cast("bigint").alias("n"),
                )
            )
        )
        .select(
            "k",
            "n",
            (
                (F.col("s2") - F.col("n") * (F.col("k") + 1))
                * (F.col("s2") - F.col("n") * (F.col("k") + 1))
            ).alias("d2"),
        )
        .groupBy("k", "n")
        .agg(F.sum("d2").cast("bigint").alias("sum_d2"))
    )
    return agg.selectExpr(
        "k AS k_treatments",
        "n AS n_blocks",
        "sum_d2",
        "3.0 * sum_d2 / (CAST(n AS DOUBLE) * k * (k + 1)) AS chi2_friedman",
        "3.0 * sum_d2 / (CAST(n AS DOUBLE) * k * (k + 1))"
        " / (CAST(n AS DOUBLE) * (k - 1)) AS kendalls_w",
    )


# ---------------------------------------------------------------------------
# Benford MAD conformity verdict (Nigrini bands)
# ---------------------------------------------------------------------------


@query(
    "histogram_benford_mad_conformity",
    oracle="""
    WITH d AS (
      SELECT CAST(substring(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
               AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    g AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS cnt FROM d GROUP BY digit
    ),
    t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM g),
    dev AS (
      SELECT CAST(abs(CAST(cnt AS DOUBLE) / t.n
                      - ln(1.0 + 1.0 / digit) / ln(10.0))
                  AS DECIMAL(18,12)) AS ad,
             t.n
      FROM g, t
    )
    SELECT MAX(n) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_digits,
           CAST(SUM(ad) AS DOUBLE) / 9.0 AS mad,
           CAST(SUM(ad) <= CAST(0.054 AS DECIMAL(18,12)) AS INT)
             AS close_conformity,
           CAST(SUM(ad) <= CAST(0.135 AS DECIMAL(18,12)) AS INT)
             AS acceptable_conformity
    FROM dev
    """,
)
def histogram_benford_mad_conformity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Benford conformity VERDICT via Nigrini's mean-absolute-deviation
    bands: MAD = mean |observed share − log10(1+1/d)| over the 9 first
    digits, with the standard ≤0.006 (close) and ≤0.015 (acceptable)
    fences — turning the histogram_benford_first_digit screen into a
    single auditable flag.

    Determinism: digits come from exact cents strings; each |obs−exp|
    deviation is an identical double expression (ln on BOTH sides —
    DuckDB log() is base-10, CLAUDE.md) QUANTIZED to DECIMAL(18,12), so
    the MAD sum and both threshold comparisons are exact decimal
    arithmetic; only the MAD itself casts to double at emission.

    Scale shape: map-side-combinable groupBy to 9 rows; everything
    after is constant-size.
    """
    o = read_table(spark, sf_dir, "orders")
    digit = F.expr(
        "CAST(substring(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
        " AS BIGINT) AS STRING), 1, 1) AS INT)"
    )
    g = (
        o.where(F.col("o_totalprice") > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    t = g.agg(F.sum("cnt").cast("bigint").alias("n"))
    ad = F.abs(
        F.col("cnt").cast("double") / F.col("n")
        - F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    ).cast("decimal(18,12)")
    dev = g.crossJoin(F.broadcast(t)).select(ad.alias("ad"), "n")
    # threshold on the UNDIVIDED decimal sum (9·MAD) and divide only at
    # emission in double: engines' decimal-division result scales differ
    sum_ad = F.sum("ad")
    return dev.agg(
        F.max("n").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_digits"),
        (sum_ad.cast("double") / F.lit(9.0)).alias("mad"),
        (sum_ad <= F.lit(0.054).cast("decimal(18,12)")).cast("int").alias(
            "close_conformity"
        ),
        (sum_ad <= F.lit(0.135).cast("decimal(18,12)")).cast("int").alias(
            "acceptable_conformity"
        ),
    )


# ---------------------------------------------------------------------------
# Outlier ensemble: z-score, IQR, and MAD votes on daily revenue
# ---------------------------------------------------------------------------


@query(
    "quality_outlier_ensemble_votes",
    oracle=f"""
    WITH byd AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM({_SQL_CENTS.format(col='o_totalprice')}) // 100
                  AS BIGINT) AS d
      FROM orders GROUP BY 1
    ),
    qs AS (
      SELECT CAST(MAX(CASE WHEN rn = lo THEN d END) AS BIGINT) AS q1,
             CAST(MAX(CASE WHEN rn = hi THEN d END) AS BIGINT) AS q3,
             CAST(MAX(CASE WHEN rn = md THEN d END) AS BIGINT) AS med
      FROM (
        SELECT d,
               ROW_NUMBER() OVER (ORDER BY d) AS rn,
               (COUNT(*) OVER () + 3) // 4 AS lo,
               (3 * (COUNT(*) OVER ()) + 3) // 4 AS hi,
               (COUNT(*) OVER () + 1) // 2 AS md
        FROM byd)
    ),
    suff AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(d - qs.med) AS BIGINT) AS s1c,
             CAST(SUM((d - qs.med) * (d - qs.med)) AS BIGINT) AS qc
      FROM byd, qs
    ),
    madv AS (
      SELECT CAST(MAX(CASE WHEN rn = md2 THEN ad END) AS BIGINT) AS mad
      FROM (
        SELECT abs(d - qs.med) AS ad,
               ROW_NUMBER() OVER (ORDER BY abs(d - qs.med)) AS rn,
               (COUNT(*) OVER () + 1) // 2 AS md2
        FROM byd, qs)
    ),
    votes AS (
      SELECT day,
             CASE WHEN (CAST(d - med AS DOUBLE) - CAST(s1c AS DOUBLE) / n)
                       * (CAST(d - med AS DOUBLE) - CAST(s1c AS DOUBLE) / n)
                       * (n - 1)
                  > 9.0 * (CAST(qc AS DOUBLE)
                           - CAST(s1c AS DOUBLE) * s1c / n)
                  THEN 1 ELSE 0 END AS v_z,
             CASE WHEN d * 2 > q3 * 5 - q1 * 3
                    OR d * 2 < q1 * 5 - q3 * 3
                  THEN 1 ELSE 0 END AS v_iqr,
             CASE WHEN abs(d - med) > 5 * mad THEN 1 ELSE 0 END AS v_mad
      FROM byd, suff, qs, madv
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(v_z) AS BIGINT) AS n_z_flags,
           CAST(SUM(v_iqr) AS BIGINT) AS n_iqr_flags,
           CAST(SUM(v_mad) AS BIGINT) AS n_mad_flags,
           CAST(SUM(CASE WHEN v_z + v_iqr + v_mad >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_consensus
    FROM votes
    """,
)
def quality_outlier_ensemble_votes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Outlier-detector ENSEMBLE on daily revenue (whole dollars):
    three independent flags per day — z-score (|x−x̄| > 3s), Tukey IQR
    (outside [Q1−1.5·IQR, Q3+1.5·IQR]), and MAD (|x−med| > 5·MAD) —
    with the ≥2-votes consensus count: the robust-screen composition a
    production data-quality monitor pages on (each single method has a
    known blind spot).

    Determinism: moments are MEDIAN-CENTERED exact int64 (Σ(d−med),
    Σ(d−med)² — raw Σd² overflows int64 at the daily-revenue scale;
    centering by an exact integer reference is the CLAUDE.md move),
    the z fence compares squared identical-expression doubles of those
    ints (no sqrt), the IQR fence is the exact integer
    cross-multiplication 2x > 5·Q3 − 3·Q1, and the MAD fence is pure
    integers; quantiles/medians are value-at-index.

    Scale shape: one map-side day-grain rollup (~2400 rows), then
    constant-size windows/aggregates over the day domain only.
    """
    o = read_table(spark, sf_dir, "orders")
    byd = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.expr(
            f"CAST(SUM({_SQL_CENTS.format(col='o_totalprice')}) DIV 100"
            " AS BIGINT)"
        ).alias("d")
    )
    byd = pin(byd)  # consumed by quantiles, moments, MAD, and the votes
    wall = Window.partitionBy(F.lit(1))
    ranked = byd.select(
        "d",
        # day grain: bounded (one row per calendar day)
        F.row_number().over(Window.orderBy("d")).alias("rn"),
        ((F.count(F.lit(1)).over(wall) + 3) / 4).cast("bigint").alias("lo"),
        ((3 * F.count(F.lit(1)).over(wall) + 3) / 4)
        .cast("bigint")
        .alias("hi"),
        ((F.count(F.lit(1)).over(wall) + 1) / 2).cast("bigint").alias("md"),
    )
    qs = ranked.agg(
        F.max(F.when(F.col("rn") == F.col("lo"), F.col("d")))
        .cast("bigint")
        .alias("q1"),
        F.max(F.when(F.col("rn") == F.col("hi"), F.col("d")))
        .cast("bigint")
        .alias("q3"),
        F.max(F.when(F.col("rn") == F.col("md"), F.col("d")))
        .cast("bigint")
        .alias("med"),
    )
    withmed = byd.crossJoin(F.broadcast(qs)).select(
        "day", "d", "q1", "q3", "med",
        (F.col("d") - F.col("med")).alias("dev"),
        F.abs(F.col("d") - F.col("med")).alias("ad"),
    )
    withmed = pin(withmed)
    suff = withmed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("dev").cast("bigint").alias("s1c"),
        F.sum(F.col("dev") * F.col("dev")).cast("bigint").alias("qc"),
    )
    madr = withmed.select(
        "ad",
        # value grain of per-day abs deviations: bounded (day count)
        F.row_number().over(Window.orderBy("ad")).alias("rn"),
        ((F.count(F.lit(1)).over(wall) + 1) / 2).cast("bigint").alias("md2"),
    )
    madv = madr.agg(
        F.max(F.when(F.col("rn") == F.col("md2"), F.col("ad")))
        .cast("bigint")
        .alias("mad")
    )
    votes = (
        withmed.crossJoin(F.broadcast(suff))
        .crossJoin(F.broadcast(madv))
        .selectExpr(
            "day",
            "CASE WHEN (CAST(dev AS DOUBLE) - CAST(s1c AS DOUBLE) / n)"
            "        * (CAST(dev AS DOUBLE) - CAST(s1c AS DOUBLE) / n)"
            "        * (n - 1)"
            "     > 9.0 * (CAST(qc AS DOUBLE) - CAST(s1c AS DOUBLE) * s1c / n)"
            "     THEN 1 ELSE 0 END AS v_z",
            "CASE WHEN d * 2 > q3 * 5 - q1 * 3"
            "       OR d * 2 < q1 * 5 - q3 * 3"
            "     THEN 1 ELSE 0 END AS v_iqr",
            "CASE WHEN ad > 5 * mad THEN 1 ELSE 0 END AS v_mad",
        )
    )
    return votes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("v_z").cast("bigint").alias("n_z_flags"),
        F.sum("v_iqr").cast("bigint").alias("n_iqr_flags"),
        F.sum("v_mad").cast("bigint").alias("n_mad_flags"),
        F.sum(
            F.when(
                F.col("v_z") + F.col("v_iqr") + F.col("v_mad") >= 2, 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_consensus"),
    )


# ---------------------------------------------------------------------------
# Last-digit uniformity chi-square (fabrication screen)
# ---------------------------------------------------------------------------


@query(
    "histogram_last_digit_uniformity_chi2",
    oracle=f"""
    WITH d AS (
      SELECT {_SQL_CENTS.format(col='o_totalprice')} % 10 AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    g AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS cnt FROM d GROUP BY digit
    ),
    s AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(cnt * cnt) AS BIGINT) AS ss,
             CAST(COUNT(*) AS BIGINT) AS n_digits
      FROM g
    )
    SELECT n AS n_rows, n_digits,
           (10.0 * ss - CAST(n AS DOUBLE) * n) / n AS chi2_uniform,
           CAST((10.0 * ss - CAST(n AS DOUBLE) * n) / n > 16.919 AS INT)
             AS rejected_95
    FROM s
    """,
)
def histogram_last_digit_uniformity_chi2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Last-digit uniformity screen: unlike FIRST digits (Benford),
    the LAST digit of organic amounts should be ~uniform — humans
    fabricating numbers over-use round/repeated endings. χ² against
    uniform reduces to (10·Σc²_d − n²)/n over exact integer digit
    counts (Σ(c−n/10)²/(n/10) expanded), one identical double
    expression; the 9-df 95% critical value 16.919 makes the verdict a
    comparison of IDENTICAL doubles.

    Scale shape: map-side-combinable groupBy to 10 digit rows.
    """
    o = read_table(spark, sf_dir, "orders")
    g = (
        o.where(F.col("o_totalprice") > 0)
        .select((_cents("o_totalprice") % 10).alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    s = g.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("ss"),
        F.count(F.lit(1)).cast("bigint").alias("n_digits"),
    )
    return s.selectExpr(
        "n AS n_rows",
        "n_digits",
        "(10.0 * ss - CAST(n AS DOUBLE) * n) / n AS chi2_uniform",
        "CAST((10.0 * ss - CAST(n AS DOUBLE) * n) / n > 16.919 AS INT)"
        " AS rejected_95",
    )


# ---------------------------------------------------------------------------
# Burstiness index of repeat-purchase interarrival gaps
# ---------------------------------------------------------------------------

# B = (σ − μ)/(σ + μ) ∈ [−1, 1]: −1 periodic, 0 Poisson, →1 bursty.
# From three exact int64 sums (n, Σg, Σg²) — shared fragment.
_BURST_MEAN = "(CAST(s1 AS DOUBLE) / n)"
_BURST_SD = (
    "sqrt((CAST(q AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)"
    " / CAST(n AS DOUBLE))"
)
_BURST_B = (
    f"(({_BURST_SD} - {_BURST_MEAN}) / ({_BURST_SD} + {_BURST_MEAN}))"
)


@query(
    "orders_interarrival_burstiness",
    oracle=f"""
    WITH seq AS (
      SELECT o_custkey,
             date_diff('day', LAG(o_orderdate) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS gap
      FROM orders
    ),
    g AS (SELECT CAST(gap AS BIGINT) AS gap FROM seq WHERE gap IS NOT NULL),
    suff AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(gap) AS BIGINT) AS s1,
             CAST(SUM(gap * gap) AS BIGINT) AS q
      FROM g
    )
    SELECT n AS n_gaps, s1 AS sum_gap_days,
           {_BURST_B} AS burstiness,
           {_BURST_SD} / {_BURST_MEAN} AS cv
    FROM suff
    """,
)
def orders_interarrival_burstiness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Goh-Barabási burstiness index B = (σ−μ)/(σ+μ) of repeat-purchase
    interarrival gaps (−1 = metronome, 0 = Poisson, →1 = bursty) plus
    the coefficient of variation — the single-number temporal-pattern
    signature behind demand forecasting and bot detection.

    Determinism: gaps are exact integer day differences with the
    (o_orderdate, o_orderkey) tie-broken lag; B and CV are
    shared-fragment double expressions of three exact int64 sums
    (gap ≤ ~2500 days ⇒ Σg² int64-safe far past sf1) — bit-equal
    cross-engine.

    Scale shape: one o_custkey shuffle for the lag window, one
    map-side-combinable sufficient-statistics aggregate.
    """
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = (
        o.select(
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(w)
            ).alias("gap")
        )
        .where(F.col("gap").isNotNull())
        .select(F.col("gap").cast("bigint").alias("gap"))
    )
    suff = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("gap").cast("bigint").alias("s1"),
        F.sum(F.col("gap") * F.col("gap")).cast("bigint").alias("q"),
    )
    return suff.selectExpr(
        "n AS n_gaps",
        "s1 AS sum_gap_days",
        f"{_BURST_B} AS burstiness",
        f"{_BURST_SD} / {_BURST_MEAN} AS cv",
    )


# ---------------------------------------------------------------------------
# Fixed-effects (within) estimator: price-on-quantity slope within customer
# ---------------------------------------------------------------------------


@query(
    "stats_fixed_effects_within_slope",
    oracle=f"""
    WITH j AS (
      SELECT o.o_custkey AS c,
             CAST(CAST(l.l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
             {_SQL_CENTS.format(col='l.l_extendedprice')} AS y
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    per AS (
      SELECT c, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM j GROUP BY c
    ),
    terms AS (
      SELECT CAST(CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * sy / n AS DECIMAL(38,6)) AS num,
             CAST(CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * sx / n AS DECIMAL(38,6)) AS den,
             n
      FROM per
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(num) AS DOUBLE) / CAST(SUM(den) AS DOUBLE), 9)
             AS within_slope
    FROM terms
    """,
)
def stats_fixed_effects_within_slope(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Panel fixed-effects (within) estimator: the slope of line-item
    price on quantity after demeaning WITHIN each customer — the
    econometric workhorse that removes per-customer level effects a
    pooled OLS would confound (agg_regr_slope_intercept is the pooled
    twin).

    Determinism: per-customer sufficient statistics (n, Σx, Σy, Σxy,
    Σx²) are exact int64 (cents-scaled; per-group Σxy ≤ ~1e13);
    each group's demeaned num/den is an identical-expression double of
    those ints QUANTIZED to DECIMAL(38,6), so the cross-group sums are
    exact decimal addition (order-free across 15k+ groups where raw
    double summation trees diverge); the slope is one double division
    rounded to 9 (the decimal→double cast of a >2^53-int-form sum
    differs in the last ulp cross-engine, CLAUDE.md).

    Scale shape: one join shuffled on orderkey, one customer-grain
    aggregate (map-side combinable), then a constant-width rollup —
    no window, no second pass over the fact table.
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .alias("x"),
        _cents("l_extendedprice").alias("y"),
    )
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("o_custkey").alias("c"),
    )
    j = li.join(o, "l_orderkey")
    per = j.groupBy("c").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    terms = per.select(
        "n",
        (
            F.col("sxy").cast("double")
            - F.col("sx").cast("double") * F.col("sy") / F.col("n")
        )
        .cast("decimal(38,6)")
        .alias("num"),
        (
            F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx") / F.col("n")
        )
        .cast("decimal(38,6)")
        .alias("den"),
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.round(
            F.sum("num").cast("double") / F.sum("den").cast("double"), 9
        ).alias("within_slope"),
    )


# ---------------------------------------------------------------------------
# Degree assortativity of the brand co-purchase graph
# ---------------------------------------------------------------------------

_ASSORT_R = (
    "((CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    " / sqrt((CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
    "        * (CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))"
)


@query(
    "graph_degree_assortativity_brands",
    oracle=f"""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    und AS (
      SELECT a.brand AS u, b.brand AS v, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ob a JOIN ob b ON a.ok = b.ok AND a.brand < b.brand
      GROUP BY a.brand, b.brand
    ),
    n AS (SELECT COUNT(*) AS n FROM und),
    th AS (
      SELECT cnt AS theta FROM (
        SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, u, v) AS rk
        FROM und
      ) WHERE rk = (SELECT CAST(CEIL(0.1 * n) AS BIGINT) FROM n)
    ),
    e0 AS (SELECT u, v FROM und WHERE cnt >= (SELECT theta FROM th)),
    e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
    deg AS (SELECT u AS w, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY 1),
    de AS (
      SELECT du.d AS x, dv.d AS y
      FROM e JOIN deg du ON du.w = e.u JOIN deg dv ON dv.w = e.v
    ),
    suff AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM de
    )
    SELECT m AS n_directed_edges,
           {_ASSORT_R} AS assortativity
    FROM suff
    """,
)
def graph_degree_assortativity_brands(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree assortativity (Newman's r) of the thresholded brand
    co-purchase graph: do high-degree brands link to other hubs
    (r > 0) or to the periphery (r < 0)? The one-number mixing-pattern
    summary behind recommendation-graph health checks; same top-10%
    edge fence as the other graph_* keys so all graph statistics
    describe ONE graph.

    Determinism: degrees and the six sufficient statistics are exact
    int64 over the bounded 25-node brand graph; r is one
    shared-fragment double expression — bit-equal cross-engine.

    Scale shape: the fact table collapses to the (order, brand) grain
    before any pairing; everything after runs on the ≤625-row brand
    graph (broadcast-sized).
    """
    und = (
        _brand_pair_occurrences(spark, sf_dir)
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    und = pin(und)  # threshold quantile AND edge filter read it
    nrow = und.agg(F.count(F.lit(1)).alias("n"))
    th = (
        und.crossJoin(F.broadcast(nrow))
        .select(
            "cnt",
            F.row_number()
            # (u,v) pair grain: bounded enum-pair domain
            .over(Window.orderBy(F.desc("cnt"), "u", "v"))
            .alias("rk"),
            F.expr("CAST(CEIL(0.1 * n) AS BIGINT)").alias("kth"),
        )
        .filter(F.col("rk") == F.col("kth"))
        .select(F.col("cnt").alias("theta"))
    )
    e0 = und.crossJoin(F.broadcast(th)).filter(
        F.col("cnt") >= F.col("theta")
    ).select("u", "v")
    e = e0.unionByName(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    e = pin(e)  # degree count AND both endpoint joins
    deg = e.groupBy(F.col("u").alias("w")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    de = (
        e.join(deg.select(F.col("w").alias("u"), F.col("d").alias("x")), "u")
        .join(deg.select(F.col("w").alias("v"), F.col("d").alias("y")), "v")
        .select("x", "y")
    )
    suff = de.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    return suff.selectExpr(
        "m AS n_directed_edges",
        f"{_ASSORT_R} AS assortativity",
    )


# ---------------------------------------------------------------------------
# Round-12 additions: McNemar / sign test / ACF ladder / partial corr /
# Durbin-Watson
# ---------------------------------------------------------------------------


@query(
    "stats_mcnemar_urgency_shift",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             MAX(CASE WHEN year(o_orderdate) = 1994 THEN 1 ELSE 0 END) AS a94,
             MAX(CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END) AS a95,
             MAX(CASE WHEN year(o_orderdate) = 1994
                       AND o_orderpriority = '1-URGENT'
                      THEN 1 ELSE 0 END) AS u94,
             MAX(CASE WHEN year(o_orderdate) = 1995
                       AND o_orderpriority = '1-URGENT'
                      THEN 1 ELSE 0 END) AS u95
      FROM orders
      WHERE year(o_orderdate) IN (1994, 1995)
      GROUP BY o_custkey),
    paired AS (SELECT * FROM per WHERE a94 = 1 AND a95 = 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_paired_customers,
           CAST(SUM(CASE WHEN u94 = 1 AND u95 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS b_lost_urgency,
           CAST(SUM(CASE WHEN u94 = 0 AND u95 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS c_gained_urgency,
           CAST((CAST(SUM(CASE WHEN u94 = 1 AND u95 = 0 THEN 1 ELSE 0 END)
                      AS BIGINT)
                 - CAST(SUM(CASE WHEN u94 = 0 AND u95 = 1 THEN 1 ELSE 0 END)
                        AS BIGINT))
                * (CAST(SUM(CASE WHEN u94 = 1 AND u95 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT)
                   - CAST(SUM(CASE WHEN u94 = 0 AND u95 = 1 THEN 1 ELSE 0 END)
                          AS BIGINT)) AS DOUBLE)
             / CAST(CAST(SUM(CASE WHEN u94 = 1 AND u95 = 0 THEN 1 ELSE 0 END)
                         AS BIGINT)
                    + CAST(SUM(CASE WHEN u94 = 0 AND u95 = 1 THEN 1 ELSE 0 END)
                           AS BIGINT) AS DOUBLE) AS mcnemar_chi2
    FROM paired
    """,
)
def stats_mcnemar_urgency_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test for paired binary outcomes: among customers
    active in BOTH 1994 and 1995, did the share placing an URGENT
    order change? Only the discordant cells matter (b = urgent in '94
    only, c = '95 only); chi2 = (b−c)²/(b+c). Every count is exact
    int64 and the statistic is ONE division of exact integers —
    bit-identical cross-engine, no rounding.

    Scale shape: one scan with a year pushdown, one customer-grain
    map-side-combined aggregate, one global fold."""
    o = read_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1994, 1995)
    )
    y94 = F.year("o_orderdate") == 1994
    urg = F.col("o_orderpriority") == "1-URGENT"
    per = o.groupBy("o_custkey").agg(
        F.max(y94.cast("int")).alias("a94"),
        F.max((~y94).cast("int")).alias("a95"),
        F.max((y94 & urg).cast("int")).alias("u94"),
        F.max(((~y94) & urg).cast("int")).alias("u95"),
    ).filter((F.col("a94") == 1) & (F.col("a95") == 1))
    b = F.sum(((F.col("u94") == 1) & (F.col("u95") == 0)).cast("int")).cast(
        "bigint"
    )
    c = F.sum(((F.col("u94") == 0) & (F.col("u95") == 1)).cast("int")).cast(
        "bigint"
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_paired_customers"),
        b.alias("b_lost_urgency"),
        c.alias("c_gained_urgency"),
        (((b - c) * (b - c)).cast("double") / (b + c).cast("double")).alias(
            "mcnemar_chi2"
        ),
    )


@query(
    "stats_sign_test_monthly_growth",
    oracle="""
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS mon,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1),
    d AS (
      SELECT cents - LAG(cents) OVER (ORDER BY mon) AS diff FROM m)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_transitions,
           CAST(SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_up,
           CAST(SUM(CASE WHEN diff < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_down,
           CAST(CAST(SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT)
                - CAST(SUM(CASE WHEN diff < 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS DOUBLE)
             / sqrt(CAST(COUNT(*) AS DOUBLE)) AS sign_z
    FROM d WHERE diff IS NOT NULL
    """,
)
def stats_sign_test_monthly_growth(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sign test on month-over-month revenue direction: n_up vs n_down
    over consecutive-month transitions, with the normal-approximation
    z = (n_up − n_down)/√n — the distribution-free "is revenue
    trending" check (the parametric siblings are Mann-Kendall /
    Cochran-Armitage, already registered). Monthly revenue is
    exact-cents int64, so every diff sign is exact and z is one
    identical expression over exact integers.

    Scale shape: month-grain aggregate (map-side combined), then a
    window over the bounded month frame."""
    o = read_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("mon")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
        )
        .cast("bigint")
        .alias("cents")
    )
    wmon = Window.orderBy("mon")  # bounded: one row per month
    d = m.select(
        (F.col("cents") - F.lag("cents").over(wmon)).alias("diff")
    ).filter(F.col("diff").isNotNull())
    n_up = F.sum((F.col("diff") > 0).cast("int")).cast("bigint")
    n_down = F.sum((F.col("diff") < 0).cast("int")).cast("bigint")
    return d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
        n_up.alias("n_up"),
        n_down.alias("n_down"),
        (
            (n_up - n_down).cast("double")
            / F.sqrt(F.count(F.lit(1)).cast("double"))
        ).alias("sign_z"),
    )


# Pearson r over exact-integer moment sums, shared textual shape for
# the ACF ladder (counts are small ints, so every product stays well
# inside int64 and the final expression is identical doubles).
_ACF_R = (
    "CAST(n * sxy - sx * sy AS DOUBLE)"
    " / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)"
    "        * CAST(n * syy - sy * sy AS DOUBLE))"
)


@query(
    "events_acf_lags_1_to_5",
    oracle=f"""
    WITH hr AS (
      SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1),
    s AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY h) AS t FROM hr),
    lagged AS (
      SELECT k, s.x AS x,
             LEAD(s.x, k) OVER (PARTITION BY k ORDER BY t) AS y
      FROM s, (SELECT unnest(generate_series(1, 5)) AS k)),
    mom AS (
      SELECT k,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM lagged WHERE y IS NOT NULL GROUP BY k)
    SELECT CAST(k AS INT) AS lag, n AS n_pairs, {_ACF_R} AS acf
    FROM mom ORDER BY lag
    """,
)
def events_acf_lags_1_to_5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation ladder of the hourly event-count series at lags
    1–5 (the seasonality/burst diagnostic one lag can't show —
    events_autocorr_lag1 is the single-point sibling). ACF here is the
    Pearson r of (x_t, x_{t+k}) pairs; every moment is an exact-int64
    sum of small counts, so the r expression is identical doubles on
    both engines — no rounding.

    Scale shape: one hour-grain aggregate (map-side combined), then
    windows over the bounded hour frame (≤ a few thousand rows), five
    lags sharing one pinned frame."""
    from ..plans.pin import pin

    e = read_events(spark, sf_dir)
    hr = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    wt = Window.orderBy("h")  # bounded: one row per hour
    s = hr.select("x", F.row_number().over(wt).alias("t"))
    s = pin(s)  # five lag branches read one materialization
    wk = Window.orderBy("t")
    parts = []
    for k in range(1, 6):
        parts.append(
            s.select(
                F.lit(k).alias("k"),
                F.col("x"),
                F.lead("x", k).over(wk).alias("y"),
            ).filter(F.col("y").isNotNull())
        )
    lagged = parts[0]
    for p in parts[1:]:
        lagged = lagged.unionByName(p)
    mom = lagged.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    return mom.selectExpr(
        "CAST(k AS INT) AS lag", "n AS n_pairs", f"{_ACF_R} AS acf"
    ).orderBy("lag")


# Partial correlation composed over NAMED moment columns: both engines
# aggregate the same EXACT moments into columns (n, sx, …) and then
# evaluate ONE shared textual expression — the only way a composition
# this deep stays bit-aligned (stats_ols_two_factor rule).
#
# Round-13 overflow fix: correlation is invariant under affine
# rescaling, so the moments are taken in INTEGER units (qty, price
# CENTS, discount PERCENT points) and the y-bearing sums accumulate as
# DECIMAL — the old fsum(price², 4) bigint sat at 7.4e18 (80% of int64)
# at sf0.1 and would overflow at ~1.25× that volume. Per-row products
# stay int64 (y² ≤ 1.2e14); SUM(CAST(prod AS DECIMAL(18,0))) →
# decimal(28,0), headroom to ~sf 140,000 (the 100 TB regime). Each
# moment enters the shared expression through CAST(. AS DOUBLE) —
# scale-0 exact-int conversion, correctly rounded on both engines
# (never a DECIMAL(.,s>0)→double division).
def _pcd(c: str) -> str:
    return f"CAST({c} AS DOUBLE)"


_PC_RXY = (
    f"(({_pcd('n')} * {_pcd('sxy')} - {_pcd('sx')} * {_pcd('sy')})"
    f" / (sqrt({_pcd('n')} * {_pcd('sxx')} - {_pcd('sx')} * {_pcd('sx')})"
    f" * sqrt({_pcd('n')} * {_pcd('syy')} - {_pcd('sy')} * {_pcd('sy')})))"
)
_PC_RXZ = (
    f"(({_pcd('n')} * {_pcd('sxz')} - {_pcd('sx')} * {_pcd('sz')})"
    f" / (sqrt({_pcd('n')} * {_pcd('sxx')} - {_pcd('sx')} * {_pcd('sx')})"
    f" * sqrt({_pcd('n')} * {_pcd('szz')} - {_pcd('sz')} * {_pcd('sz')})))"
)
_PC_RYZ = (
    f"(({_pcd('n')} * {_pcd('syz')} - {_pcd('sy')} * {_pcd('sz')})"
    f" / (sqrt({_pcd('n')} * {_pcd('syy')} - {_pcd('sy')} * {_pcd('sy')})"
    f" * sqrt({_pcd('n')} * {_pcd('szz')} - {_pcd('sz')} * {_pcd('sz')})))"
)
_PC_PARTIAL = (
    f"ROUND(({_PC_RXY} - {_PC_RXZ} * {_PC_RYZ})"
    f" / sqrt((1.0 - {_PC_RXZ} * {_PC_RXZ})"
    f"        * (1.0 - {_PC_RYZ} * {_PC_RYZ})), 6)"
)


def _partial_corr_oracle() -> str:
    return f"""
    WITH iu AS (
      SELECT l_returnflag,
             CAST(ROUND(l_quantity, 0) AS BIGINT) AS x,
             CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS y,
             CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS z
      FROM lineitem),
    mom AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             SUM(CAST(y AS DECIMAL(18,0))) AS sy,
             CAST(SUM(z) AS BIGINT) AS sz,
             SUM(CAST(x * y AS DECIMAL(18,0))) AS sxy,
             CAST(SUM(x * z) AS BIGINT) AS sxz,
             SUM(CAST(y * z AS DECIMAL(18,0))) AS syz,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             SUM(CAST(y * y AS DECIMAL(18,0))) AS syy,
             CAST(SUM(z * z) AS BIGINT) AS szz
      FROM iu GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           ROUND({_PC_RXY}, 6) AS r_qty_price,
           {_PC_PARTIAL} AS partial_r_given_discount
    FROM mom ORDER BY l_returnflag
    """


@query("stats_partial_corr_qty_price", oracle=_partial_corr_oracle())
def stats_partial_corr_qty_price(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-order partial correlation: qty↔price with discount
    partialled out, r_xy.z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)),
    per return flag — the confounder-controlled sibling of
    agg_corr_from_moments. Moments are exact integer-unit sums (qty /
    price-cents / discount-points — correlation is scale-invariant),
    DECIMAL-accumulated where int64 lacks headroom (y², x·y, y·z:
    decimal(28,0) holds to ~sf 140,000 ≈ 100 TB, vs the old bigint
    accumulator that sat at 80% of int64 at sf0.1); both engines then
    evaluate the SAME textual composition over the named moment
    columns via scale-0 CAST(. AS DOUBLE), ROUND 6.

    Scale shape: one lineitem scan, map-side-combined moment
    partials, a 3-row fold — nothing but the scan is data-sized.
    Round 14: keyed :func:`spread` fans the integer-unit rounds + 10
    moment products off the single-row-group scan task (solo
    1.03 -> 0.74s); plan no-op on multi-row-group layouts."""
    from ..operators.partitioning import spread

    l = spread(
        read_table(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            "l_returnflag",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ),
        by=["l_orderkey"],
    )
    iu = l.select(
        "l_returnflag",
        F.round(F.col("l_quantity"), 0).cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("y"),
        F.round(F.col("l_discount") * 100, 0).cast("bigint").alias("z"),
    )
    d18 = "decimal(18,0)"
    mom = iu.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("y").cast(d18)).alias("sy"),
        F.sum("z").cast("bigint").alias("sz"),
        F.sum((F.col("x") * F.col("y")).cast(d18)).alias("sxy"),
        F.sum(F.col("x") * F.col("z")).cast("bigint").alias("sxz"),
        F.sum((F.col("y") * F.col("z")).cast(d18)).alias("syz"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(d18)).alias("syy"),
        F.sum(F.col("z") * F.col("z")).cast("bigint").alias("szz"),
    )
    return mom.selectExpr(
        "l_returnflag",
        "n",
        f"ROUND({_PC_RXY}, 6) AS r_qty_price",
        f"{_PC_PARTIAL} AS partial_r_given_discount",
    ).orderBy("l_returnflag")


# Durbin-Watson over hourly-count OLS residuals: slope/intercept from
# exact integer moments, residuals as ONE shared double expression,
# DW rounded 6 (the residual sums are order-sensitive doubles — the
# composed-float rule; the exact-integer moments keep a & b aligned).
_DW_B_NUM = "CAST(n * sty - st * sy AS DOUBLE)"
_DW_DEN = "CAST(n * stt - st * st AS DOUBLE)"
_DW_E = (
    f"(CAST(x AS DOUBLE) - (CAST(sy AS DOUBLE) / n"
    f" - ({_DW_B_NUM} / {_DW_DEN}) * (CAST(st AS DOUBLE) / n))"
    f" - ({_DW_B_NUM} / {_DW_DEN}) * CAST(t AS DOUBLE))"
)


@query(
    "stats_durbin_watson_hourly",
    oracle=f"""
    WITH hr AS (
      SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1),
    s AS (
      SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY h) AS BIGINT) AS t
      FROM hr),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(t) AS BIGINT) AS st,
             CAST(SUM(x) AS BIGINT) AS sy,
             CAST(SUM(t * x) AS BIGINT) AS sty,
             CAST(SUM(t * t) AS BIGINT) AS stt
      FROM s),
    res AS (
      SELECT t, {_DW_E} AS e FROM s, mom),
    diffs AS (
      SELECT e, e - LAG(e) OVER (ORDER BY t) AS de FROM res)
    SELECT (SELECT n FROM mom) AS n_hours,
           ROUND(SUM(de * de) / SUM(e * e), 6) AS durbin_watson
    FROM diffs
    """,
)
def stats_durbin_watson_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic of the residuals from an OLS fit of
    hourly event counts on the hour index — the classic
    autocorrelation-of-residuals diagnostic (DW≈2 none, →0 positive,
    →4 negative) that tells you whether a linear detrend left serial
    structure an i.i.d. assumption would miss. Slope/intercept come
    from exact int64 moments; each residual is ONE shared double
    expression; DW rounds to 6 (residual sums are order-sensitive
    doubles — composed-float rule).

    Scale shape: hour-grain aggregate, bounded-frame window for the
    lag, one scalar fold."""
    from ..plans.pin import pin

    e = read_events(spark, sf_dir)
    hr = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    wt = Window.orderBy("h")  # bounded: one row per hour
    s = hr.select(
        "x", F.row_number().over(wt).cast("bigint").alias("t")
    )
    s = pin(s)  # moments AND residuals read one materialization
    mom = s.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("st"),
        F.sum("x").cast("bigint").alias("sy"),
        F.sum(F.col("t") * F.col("x")).cast("bigint").alias("sty"),
        F.sum(F.col("t") * F.col("t")).cast("bigint").alias("stt"),
    )
    res = s.crossJoin(F.broadcast(mom)).selectExpr(
        "t", "n", f"{_DW_E} AS e"
    )
    # hour-index grain: bounded (one row per hour)
    wlag = Window.orderBy("t")
    diffs = res.select(
        "n", "e", (F.col("e") - F.lag("e").over(wlag)).alias("de")
    )
    return diffs.groupBy("n").agg(
        F.round(
            F.sum(F.col("de") * F.col("de")) / F.sum(F.col("e") * F.col("e")),
            6,
        ).alias("durbin_watson")
    ).select(F.col("n").alias("n_hours"), "durbin_watson")


# Bartlett's test composed over NAMED per-group moment columns; the
# group variances are identical doubles from exact integer moments,
# and the k-row fold rounds to 6 (composed-float rule).
_BT_S2 = (
    "(CAST(n * sxx - sx * sx AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)))"
)
_BT_T = (
    "ROUND(((nn - k) * ln(s2p) - sls)"
    " / (1.0 + (sinv - 1.0 / (nn - k)) / (3.0 * (k - 1))), 6)"
)


@query(
    "stats_bartlett_variance_test",
    oracle=f"""
    WITH mom AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx
      FROM lineitem GROUP BY l_returnflag),
    g AS (
      SELECT l_returnflag, n, {_BT_S2} AS s2 FROM mom),
    fold AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM((n - 1) * s2) AS ss,
             SUM((n - 1) * ln(s2)) AS sls,
             SUM(1.0 / (n - 1)) AS sinv
      FROM g),
    t AS (
      SELECT nn, k, ss / (nn - k) AS s2p, sls, sinv FROM fold)
    SELECT nn AS n_rows, k AS n_groups,
           ROUND(s2p, 6) AS pooled_variance,
           {_BT_T} AS bartlett_t
    FROM t
    """,
)
def stats_bartlett_variance_test(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bartlett's test for variance homogeneity of l_quantity across
    return flags — the parametric sibling of the registered
    Levene/Brown-Forsythe (Bartlett is more powerful under normality,
    notoriously fragile otherwise; shipping both is the honest kit).
    Group variances come from exact int64 moments (quantity is
    integral), the k-row fold and statistic are ONE shared textual
    composition, ROUND 6.

    Scale shape: one scan, 3-group map-side-combined moments, a 3-row
    fold — scan-bound at any scale."""
    l = read_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    mom = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(q).cast("bigint").alias("sx"),
        F.sum(q * q).cast("bigint").alias("sxx"),
    )
    g = mom.selectExpr("l_returnflag", "n", f"{_BT_S2} AS s2")
    fold = g.selectExpr(
        "n", "s2"
    ).agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum((F.col("n") - 1) * F.col("s2")).alias("ss"),
        F.sum((F.col("n") - 1) * F.log("s2")).alias("sls"),
        F.sum(F.lit(1.0) / (F.col("n") - 1)).alias("sinv"),
    )
    t = fold.selectExpr("nn", "k", "ss / (nn - k) AS s2p", "sls", "sinv")
    return t.selectExpr(
        "nn AS n_rows",
        "k AS n_groups",
        "ROUND(s2p, 6) AS pooled_variance",
        f"{_BT_T} AS bartlett_t",
    )


@query(
    "stats_two_proportion_ztest",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
      GROUP BY o_orderpriority),
    w AS (
      SELECT MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN x END) AS x1,
             MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN n END) AS n1,
             MAX(CASE WHEN o_orderpriority = '5-LOW' THEN x END) AS x2,
             MAX(CASE WHEN o_orderpriority = '5-LOW' THEN n END) AS n2
      FROM c)
    SELECT x1, n1, x2, n2,
           (CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
             / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                    * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                    * (1.0 / n1 + 1.0 / n2)) AS z
    FROM w
    """,
)
def stats_two_proportion_ztest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-proportion z-test: is the fulfilled-order ('F') rate
    different between URGENT and LOW priority orders? Pooled-variance
    z over exact integer counts — the A/B-test workhorse (the
    one-sample interval sibling is stats_wilson_ci_return_rate).
    Every input is an exact int64 count and z is one identical
    expression — no rounding.

    Scale shape: one scan with an IN pushdown, 2-group fold, 1-row
    pivot."""
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    c = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("o_orderstatus") == "F").cast("int"))
        .cast("bigint")
        .alias("x"),
    )
    urgent = F.col("o_orderpriority") == "1-URGENT"
    low = F.col("o_orderpriority") == "5-LOW"
    w = c.agg(
        F.max(F.when(urgent, F.col("x"))).alias("x1"),
        F.max(F.when(urgent, F.col("n"))).alias("n1"),
        F.max(F.when(low, F.col("x"))).alias("x2"),
        F.max(F.when(low, F.col("n"))).alias("n2"),
    )
    return w.selectExpr(
        "x1", "n1", "x2", "n2",
        "(CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)"
        " / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))"
        "        * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))"
        "        * (1.0 / n1 + 1.0 / n2)) AS z",
    )


# ---------------------------------------------------------------------------
# Round-13: extreme-value (Gumbel) fit of daily block maxima
# ---------------------------------------------------------------------------

# Method-of-moments Gumbel fit composed over NAMED exact-int moment
# columns (n, sx, sxx over daily-max cents) — one shared textual
# fragment both engines evaluate identically (stats_ols_two_factor
# rule). beta = s·sqrt(6)/pi, mu = mean − gamma·beta, return level
# R(p) = mu − beta·ln(−ln p). gamma = Euler–Mascheroni.
_GUM_MEAN = "(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
_GUM_SD = (
    "sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))"
)
_GUM_BETA = f"({_GUM_SD} * sqrt(6.0) / pi())"
_GUM_MU = f"({_GUM_MEAN} - 0.57721566490153286 * {_GUM_BETA})"


@query(
    "stats_gumbel_block_maxima_fit",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             MAX(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS mx
      FROM events GROUP BY 1),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(mx) AS BIGINT) AS sx,
             CAST(SUM(mx * mx) AS BIGINT) AS sxx
      FROM daily)
    SELECT n AS n_blocks,
           ROUND({_GUM_MU}, 6) AS gumbel_mu_cents,
           ROUND({_GUM_BETA}, 6) AS gumbel_beta_cents,
           ROUND({_GUM_MU} - {_GUM_BETA} * ln(-ln(0.99)), 6)
             AS return_level_p99_cents
    FROM mom
    """,
)
def stats_gumbel_block_maxima_fit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Extreme-value analysis: Gumbel fit of DAILY BLOCK MAXIMA of the
    event value (method of moments — β̂ = s·√6/π, μ̂ = x̄ − γβ̂) plus
    the 99% return level μ̂ − β̂·ln(−ln 0.99), the EVT-grounded outlier
    fence for "how big a daily spike is once-in-100-days normal" —
    what z-score fences get wrong for max-statistics (maxima are
    Gumbel, not normal). Block maxima are exact cents (value is
    2-decimal); the moments are exact int64 sums over the day grain
    (mx ≤ ~1e5 cents, mx² ≤ 1e10, days ≪ 2^43 — headroom to
    centuries); both engines evaluate ONE shared fragment over the
    named moments, ROUND 6.

    Scale shape: one events scan → day-grain max (map-side
    combinable) → 3-moment fold of a bounded (days) frame. Nothing
    but the scan is data-sized."""
    e = read_events(spark, sf_dir)
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.max(_cents("value")).alias("mx")
    )
    mom = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("mx").cast("bigint").alias("sx"),
        F.sum(F.col("mx") * F.col("mx")).cast("bigint").alias("sxx"),
    )
    return mom.selectExpr(
        "n AS n_blocks",
        f"ROUND({_GUM_MU}, 6) AS gumbel_mu_cents",
        f"ROUND({_GUM_BETA}, 6) AS gumbel_beta_cents",
        f"ROUND({_GUM_MU} - {_GUM_BETA} * ln(-ln(0.99)), 6)"
        " AS return_level_p99_cents",
    )
