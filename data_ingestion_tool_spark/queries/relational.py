"""Relational query inventory: scan/filter/project, the join zoo,
aggregation, windows, sort/limit, set ops, scalar functions.

Reference parity: R3 scan+projection (`backend/main.py:176`), R4
comma/theta join + opaque WHERE (`backend/main.py:178-180`). Everything
past those two is north-star relational completeness — all stock
DataFrame ops, so Catalyst supplies pushdown/pruning/join-selection and
AQE handles skew at scale.

Scale notes (local[32] numbers verify correctness; design targets a
1000-executor cluster):
- joins are expressed as equi-joins (or recovered to equi-joins from the
  faithful comma-join form by Catalyst) so they hash-partition instead
  of nested-looping;
- small dimension tables (nation/region/customer-at-small-SF) ride
  broadcast joins — AQE demotes to shuffle join if the build side grows;
- aggregations are partial-aggregated map-side by Spark automatically;
- top-k uses rank-within-partition (no global sort of the full input:
  Spark's TakeOrderedAndProject handles ORDER BY + LIMIT without a full
  shuffle-sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..api.models import ColumnSelection, build_export_dataframe
from ..sources.parquet_io import read_table
from .registry import davg, dsum, fsum, query, sql_davg, sql_dsum, sql_fsum

# --- scan / filter / project (reference R3, R4's WHERE) -------------------


@query(
    "scan_parquet_project",
    oracle="SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders",
)
def scan_parquet_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3: table scan + caller-chosen projection (main.py:176). Catalyst
    prunes the Parquet scan to exactly these three columns."""
    return read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


@query(
    "filter_comparison",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity > 30.0 AND (l_discount < 0.02 OR l_tax > 0.06)
    """,
)
def filter_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 30.0)
        & ((F.col("l_discount") < 0.02) | (F.col("l_tax") > 0.06))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@query(
    "filter_in_like_between_null",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderstatus IN ('F', 'O')
      AND o_orderpriority LIKE '%URGENT%'
      AND o_totalprice BETWEEN 50000.0 AND 300000.0
      AND o_orderdate IS NOT NULL
    """,
)
def filter_in_like_between_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "O")
        & F.col("o_orderpriority").like("%URGENT%")
        & F.col("o_totalprice").between(50000.0, 300000.0)
        & F.col("o_orderdate").isNotNull()
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


@query(
    "project_expressions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           l_quantity * 2.0 + 1.0 AS qty2
    FROM lineitem
    """,
)
def project_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns stay per-row IEEE double ops — bit-identical on
    both engines, no rounding needed."""
    li = read_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        (net * (F.lit(1) + F.col("l_tax"))).alias("charge"),
        (F.col("l_quantity") * 2.0 + 1.0).alias("qty2"),
    )


# --- joins (reference R4 + standard zoo) ----------------------------------


@query(
    "join_theta_comma",
    oracle="""
    SELECT c_name, o_orderkey, o_totalprice
    FROM orders, customer
    WHERE o_custkey = c_custkey AND o_totalprice > 150000.0
    """,
)
def join_theta_comma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Faithful R4 (main.py:178-180): comma-join + opaque condition
    string, via the API façade's builder. Catalyst recovers the
    equality inside the predicate into a real equi-join — check
    ``.explain()``: this runs as a broadcast/sort-merge hash join, not a
    cartesian product."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    read_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    sel = ColumnSelection(
        table="orders",
        columns=["c_name", "o_orderkey", "o_totalprice"],
        join_tables=["customer"],
        join_condition="o_custkey = c_custkey AND o_totalprice > 150000.0",
    )
    return build_export_dataframe(spark, sel)


@query(
    "join_equi_inner",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 100000.0
    """,
)
def join_equi_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000.0)
    c = read_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_multiway",
    oracle="""
    SELECT c_name, n_name, o_orderkey, l_linenumber, l_quantity
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_totalprice > 300000.0
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4 with >=2 join_tables, as a 4-table chain. ``nation`` (25 rows
    at every SF) is explicitly broadcast; the fact-side joins shuffle on
    their keys and AQE reorders/sizes at runtime."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_name", "n_name", "o_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 400000.0
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 400000.0)
    return c.join(o, cond, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no high-value order (every customer has *some*
    order in this data, so the unfiltered anti-join would be trivially
    empty)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_range_nonequi",
    oracle="""
    SELECT p_partkey, p_size, l_orderkey, l_linenumber, l_quantity
    FROM lineitem JOIN part
      ON l_partkey = p_partkey AND l_quantity > CAST(p_size AS DOUBLE) + 20.0
    """,
)
def join_range_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed equi + theta join: the equality hash-partitions both sides
    (no cartesian blow-up at scale); the range predicate is evaluated as
    the join's residual condition."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    cond = (li.l_partkey == p.p_partkey) & (
        li.l_quantity > p.p_size.cast("double") + 20.0
    )
    return li.join(p, cond).select(
        "p_partkey", "p_size", "l_orderkey", "l_linenumber", "l_quantity"
    )


# --- aggregation ----------------------------------------------------------


@query(
    "agg_groupby_basic",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_fsum('l_quantity')} AS sum_qty,
           {sql_fsum('l_extendedprice')} AS sum_base_price,
           {sql_fsum('l_discount')} / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape. Partial (map-side) aggregation is automatic; the
    shuffle carries only 6 groups x partial states, not rows."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            fsum("l_quantity").alias("sum_qty"),
            fsum("l_extendedprice").alias("sum_base_price"),
            (fsum("l_discount") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS distinct_custs,
           COUNT(*) AS cnt
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("distinct_custs"),
        F.count(F.lit(1)).alias("cnt"),
    )


@query(
    "agg_having",
    oracle=f"""
    SELECT o_custkey, {sql_dsum('o_totalprice')} AS total_spent,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey
    HAVING {sql_dsum('o_totalprice')} > 1500000.0
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            dsum("o_totalprice").alias("total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .filter(F.col("total_spent") > 1500000.0)
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS cnt, {sql_dsum('o_totalprice')} AS sum_price
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum("o_totalprice").alias("sum_price"),
    )


@query(
    "dedup_exact",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup = hash-groupBy on the key columns (north star)."""
    return (
        read_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
    )


# --- window / sort / limit ------------------------------------------------


@query(
    "window_rank_topk_per_group",
    oracle="""
    SELECT o_orderstatus, o_orderkey, o_totalprice, rn FROM (
      SELECT o_orderstatus, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY o_orderstatus
               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def window_rank_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via rank-within-partition — each group's rows are
    co-partitioned by the window shuffle; no global sort. Unique-key
    tie-break (o_orderkey) keeps row_number deterministic in value."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_orderstatus",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spent
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_spent"),
    )


@query(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT. Spark plans this as
    TakeOrderedAndProject: per-partition top-100 then a driver-side
    merge of 100-row heaps — no full global sort even at 100 TB."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --- set operations -------------------------------------------------------


@query(
    "set_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer
    UNION ALL
    SELECT s_nationkey, s_acctbal FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.col("c_acctbal").alias("acctbal")
    )
    s = read_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.col("s_acctbal").alias("acctbal")
    )
    return c.unionAll(s)


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = read_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = read_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.exceptAll(s)


# --- scalar functions -----------------------------------------------------


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS up_name,
           LOWER(c_mktsegment) AS low_seg,
           SUBSTR(c_name, 1, 8) AS name_prefix,
           CONCAT(c_mktsegment, '_', c_name) AS tagged,
           CAST(LENGTH(c_name) AS BIGINT) AS name_len,
           TRIM(c_name) AS trimmed
    FROM customer
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up_name"),
        F.lower("c_mktsegment").alias("low_seg"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("_", "c_mktsegment", "c_name").alias("tagged"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.trim(F.col("c_name")).alias("trimmed"),
    )


@query(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
           CAST(MONTH(o_orderdate) AS BIGINT) AS order_month,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(DATE_DIFF('day', o_orderdate, TIMESTAMP '2001-12-31 00:00:00')
                AS BIGINT) AS days_to_eoy
    FROM orders
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.lit("2001-12-31").cast("date"), F.col("o_orderdate"))
        .cast("bigint")
        .alias("days_to_eoy"),
    )


@query(
    "scalar_math_case",
    oracle="""
    SELECT o_orderkey,
           ABS(o_totalprice - 100000.0) AS dist,
           CAST(FLOOR(o_totalprice) AS DOUBLE) AS floor_price,
           CAST(CEIL(o_totalprice) AS DOUBLE) AS ceil_price,
           SQRT(o_totalprice) AS root_price,
           o_orderkey % 7 AS k7,
           CASE WHEN o_totalprice > 300000.0 THEN 'big'
                WHEN o_totalprice > 100000.0 THEN 'mid'
                ELSE 'small' END AS bucket
    FROM orders
    """,
)
def scalar_math_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.abs(F.col("o_totalprice") - 100000.0).alias("dist"),
        F.floor("o_totalprice").cast("double").alias("floor_price"),
        F.ceil("o_totalprice").cast("double").alias("ceil_price"),
        F.sqrt("o_totalprice").alias("root_price"),
        (F.col("o_orderkey") % 7).alias("k7"),
        F.when(F.col("o_totalprice") > 300000.0, "big")
        .when(F.col("o_totalprice") > 100000.0, "mid")
        .otherwise("small")
        .alias("bucket"),
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT n.n_name, c.c_custkey, c.c_acctbal
    FROM customer c RIGHT JOIN nation n ON c.c_nationkey = n.n_nationkey
      AND c.c_acctbal < 0
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join with a join-side (not WHERE) predicate: every
    nation survives even when no negative-balance customer matches —
    the predicate placement distinction (ON vs WHERE filters) that
    outer joins make semantic, not stylistic."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    return c.join(
        n,
        (c.c_nationkey == n.n_nationkey) & (c.c_acctbal < 0),
        "right",
    ).select("n_name", "c_custkey", "c_acctbal")
