"""Composite TPC-H-shaped analytics (Q1/Q3/Q4/Q5/Q6/Q10/Q12/Q14/Q18/Q19
adapted to the test schema — it lacks o_shippriority/partsupp/
l_shipmode/l_commitdate/l_receiptdate/p_container, so those columns are
substituted; the join/agg shapes are the classic ones).

These are the realistic multi-join benchmark queries: fact⋈fact
(lineitem⋈orders) resolves via AQE-planned joins, every dim side
broadcasts, revenue aggregates use the registry's decimal-exact
pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet_io import read_table
from .registry import fsum, query, sql_fsum

# revenue = disc_price summed fixed-point: price/discount are exactly
# 2-decimal so the product has exactly 4 — fsum's long adds beat the
# decimal accumulate ~2x and stay deterministic (see registry.fsum).
REVENUE = sql_fsum("l_extendedprice * (1 - l_discount)", 4)


def _revenue() -> F.Column:
    return fsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey, {REVENUE} AS revenue, o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: unshipped-order revenue for one segment, top 10. Customer
    (filtered, small) broadcasts into orders; the lineitem⋈orders
    fact join is the only shuffle pair; top-10 is a
    TakeOrderedAndProject merge, not a global sort."""
    c = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-03-15"
    )
    l = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-03-15"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_revenue().alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {REVENUE} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name ORDER BY revenue DESC
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: six-table join, revenue by nation where supplier and
    customer share a nation. Every dim (supplier/nation/region/
    customer) broadcasts; only lineitem⋈orders shuffles."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    l = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_revenue().alias("revenue"))
        .orderBy(F.col("revenue").desc())
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, {REVENUE} AS revenue, c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: top 20 customers by returned-item revenue in a quarter."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    l = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = read_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_revenue().alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
      {sql_fsum('l_quantity')} AS sum_qty,
      {sql_fsum('l_extendedprice')} AS sum_base_price,
      {sql_fsum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
      {sql_fsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
      {sql_fsum('l_quantity')} / COUNT(*) AS avg_qty,
      {sql_fsum('l_extendedprice')} / COUNT(*) AS avg_price,
      {sql_fsum('l_discount')} / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: full pricing summary report — the classic scan-heavy
    single-table aggregate. One pass over lineitem, map-side partial
    agg into 6 groups.

    All sums are fixed-point (:func:`registry.fsum` — codegen'd long
    adds, ~2.2x faster than the decimal-exact pattern at sf0.1): every
    measure here is exactly-decimal (qty/price/disc/tax are 2-decimal,
    so disc_price has 4 and charge 6 exact decimals), the rounded
    scaled values are the same integer in both engines, and group sums
    x 10^scale stay < 2^53 through sf0.1. avgs derive from the same
    exact sums."""
    l = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "2000-09-02"
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    cnt = F.count(F.lit(1))
    sum_qty = fsum("l_quantity")
    sum_price = fsum("l_extendedprice")
    sum_disc = fsum("l_discount")
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_qty.alias("sum_qty"),
            sum_price.alias("sum_base_price"),
            fsum(disc_price, 4).alias("sum_disc_price"),
            fsum(charge, 6).alias("sum_charge"),
            (sum_qty / cnt).alias("avg_qty"),
            (sum_price / cnt).alias("avg_price"),
            (sum_disc / cnt).alias("avg_disc"),
            cnt.cast("bigint").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 adapted (schema lacks l_commitdate/l_receiptdate: "late" =
    shipped >30 days after order date): orders-per-priority having at
    least one late line. Instead of a semi join that would shuffle the
    whole lineitem table, the quarter-filtered orders slice (tiny)
    BROADCASTS into the lineitem scan and count_distinct(o_orderkey)
    deduplicates — shuffle carries only distinct (priority, orderkey)
    pairs after partial agg."""
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01")
    )
    l = read_table(spark, sf_dir, "lineitem")
    late = l.join(
        F.broadcast(o),
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count_distinct("o_orderkey").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q6_revenue_forecast",
    oracle=f"""
    SELECT {sql_fsum('l_extendedprice * l_discount', 4)} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: pure filter + global aggregate — the predicate-pushdown
    showcase. All four predicates reach the parquet scan as
    PushedFilters; no shuffle at all (partial agg → single-row final)."""
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        fsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )


@query(
    "tpch_q12_late_shipment_priority",
    oracle="""
    SELECT l_linestatus,
      SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS high_line_count,
      SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def tpch_q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 adapted (no l_shipmode/l_commitdate: groups by l_linestatus,
    "late" = shipped >60 days after order): priority-split line counts
    for late shipments. Year-filtered lineitem joins orders on the
    orderkey; the late predicate is a post-join theta filter Catalyst
    keeps with the equi-join."""
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(
            o,
            (l.l_orderkey == o.o_orderkey)
            & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "tpch_q14_promo_revenue",
    oracle=f"""
    SELECT ROUND(
      100.0 * ({sql_fsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 4)})
      / ({REVENUE}),
      6) AS promo_pct,
      {REVENUE} AS total_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: promo revenue share for one month (p_type = 'PROMO' — the
    test schema's p_type is the bare class, no trailing words). Part
    broadcasts into the month-filtered lineitem; ratio of two
    fixed-point-exact double sums is ROUNDed to 6 on both sides
    because the division orders differ."""
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01")
        & (F.col("l_shipdate") < "1997-10-01")
    )
    p = read_table(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = fsum(
        F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0)), 4
    )
    total = _revenue()
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(F.lit(100.0) * promo / total, 6).alias("promo_pct"),
            total.alias("total_revenue"),
        )
    )


@query(
    "tpch_q18_large_volume_customer",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {sql_fsum('l_quantity')} AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 200)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: top-100 large-volume orders (total qty > 200). The HAVING
    subquery's key set is a ~0.9% slice of orders — it self-aggregates
    lineitem then BROADCASTS back as a semi-join filter (bound: ~1% of
    orders even at 100 TB, well under broadcast limits; quantities are
    integral doubles so the >200 compare is exact). Tie-break on
    o_orderkey makes the LIMIT deterministic."""
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 200)
        .select("l_orderkey")
    )
    return (
        l.join(F.broadcast(big), "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(fsum("l_quantity").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
    SELECT {REVENUE} AS revenue, COUNT(*) AS n_lines
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND (
         (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
      OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
      OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30))
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 adapted (no p_container/l_shipmode: brand+size+quantity
    bands): revenue under a 3-way disjunctive join predicate. Part
    pre-filters to the brand union (pushed to its scan), broadcasts,
    and the disjunction evaluates inside the broadcast hash join —
    no CartesianProduct (checked in tests/test_plans.py)."""
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#13", "Brand#23", "Brand#25")
    )
    band = (
        ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#25") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return (
        l.join(F.broadcast(p), (l.l_partkey == p.p_partkey) & band)
        .agg(
            _revenue().alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )
