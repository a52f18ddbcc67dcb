"""Composite TPC-H-shaped analytics (Q1/Q3-Q8/Q10/Q12-Q15/Q17-Q19/Q21/Q22
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

from ..operators.partitioning import spread
from ..sources.parquet_io import read_table
from .registry import davg, fsum, query, sql_davg, sql_fsum

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
    exact sums.

    Round 14: keyed :func:`spread` after the narrowest projection —
    the single-row-group local scan otherwise runs all 7 fixed-point
    accumulations' map side on one core (guide §2.5; plan no-op on a
    multi-row-group cluster layout). A/B solo: 0.958 → 0.865 s."""
    l = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= "2000-09-02")
        .select(
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_orderkey", "l_linenumber",
        )
    )
    l = spread(l, by=["l_orderkey", "l_linenumber"])
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
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
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
    o_orderkey makes the LIMIT deterministic.

    Round 14: the HAVING branch spreads its 2-column projection before
    the per-order partial agg (guide §2.5 + §2.3 — the single-row-group
    scan ran the whole map-side combine on one core; plan no-op at
    cluster layouts). A/B solo: 1.271 → 1.041 s."""
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    big = (
        spread(l.select("l_orderkey", "l_quantity"), by=["l_orderkey"])
        .groupBy("l_orderkey")
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


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {REVENUE} AS revenue FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice, l_discount
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
    ) GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: bilateral trade volume between two nations per ship year.
    Both nation dims broadcast twice (supplier side, customer side);
    the disjunctive nation-pair predicate evaluates post-join; only
    lineitem⋈orders shuffles."""
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    n1 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("bigint"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_revenue().alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT o_year,
      ROUND(({sql_fsum("CASE WHEN supp_nation = 'NATION_0' THEN volume ELSE 0 END", 4)})
        / ({sql_fsum('volume', 4)}), 6) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <= TIMESTAMP '1997-12-31'
        AND p_type = 'STANDARD'
    ) GROUP BY o_year ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: one nation's share of STANDARD-part volume sold into the
    AMERICA region per order year. Eight-table star: every dim
    broadcasts; the share is a ratio of two fixed-point-exact sums
    (ROUND 6 on both sides — the division orders differ).

    Round 14 (guide §2.3 — filter before the exchange): the selective
    STANDARD part broadcast join moved BEFORE the lineitem⋈orders fact
    join, so the fact join sees ~1/6 of lineitem. A/B solo
    1.08 → 0.94 s locally; at scale it shrinks the SMJ shuffle bytes
    by the same factor."""
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") <= "1997-12-31")
    )
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    n1 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = fsum(
        F.when(F.col("supp_nation") == "NATION_0", volume).otherwise(F.lit(0.0)), 4
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("bigint"))
        .groupBy("o_year")
        .agg(F.round(target / fsum(volume, 4), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 adapted (no o_comment: the excluded class is '1-URGENT'
    orders): order-count histogram over customers including zeros.
    Scale shape: orders pre-aggregates to (custkey, count) BEFORE
    touching customers (map-side combine shrinks the fact to one row
    per customer), then the LEFT join against the customer dim fills
    zeros — joining raw orders to customers first would shuffle the
    whole fact and need the fact side broadcast at scale."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust_orders = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    per_cust = c.join(
        per_cust_orders, c.c_custkey == F.col("o_custkey"), "left"
    ).select(F.coalesce("n_orders", F.lit(0)).alias("c_count"))
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no, {REVENUE} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue0
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    ORDER BY s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with max quarterly revenue. The per-supplier
    revenue aggregate is computed ONCE (the classic view); its max
    rides back as a one-row broadcast (no second lineitem scan on the
    comparison side), and the equality is exact because both values
    are the same fixed-point-exact double."""
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    s = read_table(spark, sf_dir, "supplier")
    revenue0 = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _revenue().alias("total_revenue")
    )
    mx = revenue0.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue0.join(F.broadcast(mx), F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle=f"""
    SELECT {sql_fsum('l_extendedprice')} / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_brand = 'Brand#13'
      AND l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey)
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 adapted (no p_container: brand-only part filter): revenue
    lost to small-quantity orders. The correlated per-part average
    decorrelates to an aggregate over ONLY the brand's parts (semi-join
    pruned before the avg). The explicit broadcasts are sized for bench
    scale factors — a 1/25 brand slice at 100 TB is hundreds of
    millions of part rows, NOT broadcastable; at production scale drop
    the hints and let AQE pick shuffle joins (the decorrelation shape —
    prune-then-aggregate, one stats row per brand part — is what
    carries over). Quantities are integral doubles, so the average and
    the 0.2x threshold compare identically on both engines."""
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    keys = p.select("p_partkey")
    part_avg = (
        l.join(F.broadcast(keys), l.l_partkey == keys.p_partkey, "left_semi")
        .groupBy("l_partkey")
        .agg((F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(part_avg), "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (fsum("l_extendedprice") / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


@query(
    "tpch_q21_suppliers_who_kept_waiting",
    oracle="""
    WITH lo AS (
      SELECT l_orderkey, l_suppkey,
             MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                 THEN 1 ELSE 0 END) AS supp_late
      FROM lineitem, orders
      WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F'
      GROUP BY l_orderkey, l_suppkey
    ),
    po AS (
      SELECT l_orderkey, COUNT(*) AS n_supp, SUM(supp_late) AS n_late
      FROM lo GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM lo, po, supplier, nation
    WHERE lo.l_orderkey = po.l_orderkey AND lo.supp_late = 1
      AND po.n_supp >= 2 AND po.n_late = 1
      AND s_suppkey = lo.l_suppkey AND s_nationkey = n_nationkey
      AND n_name = 'NATION_5'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name LIMIT 100
    """,
)
def tpch_q21_suppliers_who_kept_waiting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Q21 adapted (no l_receiptdate/l_commitdate: "late" = shipped
    >60 days after order date): suppliers who were the SOLE late
    supplier on a finished multi-supplier order. The classic
    EXISTS/NOT-EXISTS pair decorrelates to two aggregates — per
    (order, supplier) lateness, then per-order counts. Round 14 (guide
    §2.4 — two operations keyed the same way share one exchange): the
    per-order counts ride a WINDOW over the (order, supplier) frame
    instead of a second aggregate joined back — the old shape paid an
    extra exchange of the pair frame plus a sort-merge join; the window
    computes the identical exact-integer counts on one orderkey
    exchange, join gone."""
    from pyspark.sql import Window

    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    late = F.when(
        l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS"), 1
    ).otherwise(0)
    lo = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("supp_late"))
    )
    w = Window.partitionBy("l_orderkey")
    lo = lo.select(
        "l_orderkey",
        "l_suppkey",
        "supp_late",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum("supp_late").over(w).alias("n_late"),
    )
    return (
        lo.filter(
            (F.col("supp_late") == 1)
            & (F.col("n_supp") >= 2)
            & (F.col("n_late") == 1)
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@query(
    "tpch_q22_global_sales_opportunity",
    oracle=f"""
    SELECT n_name, COUNT(*) AS numcust,
           {sql_fsum('c_acctbal')} AS totacctbal
    FROM customer, nation,
         (SELECT {sql_davg('c_acctbal')} AS ab
          FROM customer WHERE c_acctbal > 0.0) avg_bal
    WHERE c_nationkey = n_nationkey AND c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
    GROUP BY n_name ORDER BY n_name
    """,
)
def tpch_q22_global_sales_opportunity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Q22 adapted (no c_phone: grouped by nation; and in this data
    every customer has SOME order, so "never ordered" becomes "never
    placed an URGENT order"): wealthy low-engagement customers. The
    scalar average rides a one-row broadcast (decimal-exact: raw
    double averages differ in final ulps between engines and would
    flip boundary customers); the NOT EXISTS is an anti-join on the
    urgent-order custkeys."""
    c = read_table(spark, sf_dir, "customer")
    o = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    n = read_table(spark, sf_dir, "nation")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal").alias("ab")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            fsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# partsupp (derived): the testdata ships no partsupp table, so the five
# partsupp TPC-H shapes (Q2/Q9/Q11/Q16/Q20) run against a DERIVED one:
# the distinct (l_partkey, l_suppkey) pairs actually traded in lineitem,
# with availqty/supplycost as fixed hash formulas of the key pair —
# deterministic, engine-independent integer math, generated identically
# in the Spark helper and the oracle CTE. The query SHAPES (join
# topology, correlated min, having-over-total, not-in, semi-join
# threshold) are the classic ones; only the table's provenance differs.
# ---------------------------------------------------------------------------

_SQL_PARTSUPP = """
      SELECT ps_partkey, ps_suppkey,
             (ps_partkey * 17 + ps_suppkey * 31) % 9999 + 1 AS ps_availqty,
             (ps_partkey * 7919 + ps_suppkey * 104729) % 99900 + 100
               AS ps_supplycost_cents
      FROM (SELECT DISTINCT l_partkey AS ps_partkey,
                            l_suppkey AS ps_suppkey
            FROM lineitem)
"""


def _ps_availqty(pk: F.Column, sk: F.Column) -> F.Column:
    """partsupp availqty — a pure hash formula of the (part, supp) key
    pair (module comment). Being key-determined, any equi-join against
    partsupp on the full pair key can attach it WITHOUT the join: the
    round-14 q9/q20 rewrites compute it in place (guide §2.4 — the
    distinct + join was a no-op enrichment because every lineitem pair
    is, by construction, present in the derived partsupp)."""
    return (pk * 17 + sk * 31) % 9999 + 1


def _ps_supplycost_cents(pk: F.Column, sk: F.Column) -> F.Column:
    """partsupp supplycost — same key-determined formula discipline as
    :func:`_ps_availqty`."""
    return (pk * 7919 + sk * 104729) % 99900 + 100


def _partsupp(
    spark: SparkSession, sf_dir: str, pre_filter=None
) -> DataFrame:
    """Derived partsupp (see module comment): distinct traded pairs +
    hash-formula attributes. One distinct shuffle on the pair key;
    at 100 TB this is the same shape as any pair-grain dedup.

    ``pre_filter(pairs) -> pairs`` applies a ROW-LEVEL restriction
    (semi-join on a key subset) BEFORE the distinct — filters commute
    with DISTINCT, so consumers that only need a key-sliced partsupp
    (q2's filtered parts × EUROPE suppliers, q11's one-nation
    suppliers) shuffle only the surviving pairs (guide §2.3: shuffle
    fewer bytes — filter before the exchange)."""
    li = read_table(spark, sf_dir, "lineitem")
    pairs = li.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    )
    if pre_filter is not None:
        pairs = pre_filter(pairs)
    pairs = pairs.distinct()
    return pairs.select(
        "ps_partkey",
        "ps_suppkey",
        _ps_availqty(F.col("ps_partkey"), F.col("ps_suppkey")).alias(
            "ps_availqty"
        ),
        _ps_supplycost_cents(F.col("ps_partkey"), F.col("ps_suppkey")).alias(
            "ps_supplycost_cents"
        ),
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH partsupp AS ({_SQL_PARTSUPP}),
    eu AS (
      SELECT ps.ps_partkey, ps.ps_suppkey, ps.ps_supplycost_cents,
             s.s_acctbal, s.s_name, n.n_name
      FROM partsupp ps, supplier s, nation n, region r
      WHERE s.s_suppkey = ps.ps_suppkey AND s.s_nationkey = n.n_nationkey
        AND n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
    ),
    m AS (
      SELECT ps_partkey, MIN(ps_supplycost_cents) AS min_cost
      FROM eu GROUP BY ps_partkey
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_brand,
           e.ps_suppkey, e.ps_supplycost_cents
    FROM eu e
    JOIN m ON e.ps_partkey = m.ps_partkey
          AND e.ps_supplycost_cents = m.min_cost
    JOIN part p ON p.p_partkey = e.ps_partkey
    WHERE p.p_size = 15 AND p.p_type = 'ECONOMY'
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey, e.ps_suppkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: the cheapest EUROPE supplier for each ECONOMY size-15 part —
    the correlated-MIN shape (min supplycost per part within the
    region, re-joined on equality; suppliers tied at the min all
    qualify). Costs are exact integers, the ORDER BY carries a full
    tie-break chain, LIMIT 100.

    Scale shape (round 14, guide §2.3 — filter before the exchange):
    the part filter (p_size/p_type, ~1/250 of parts) and the EUROPE
    supplier restriction both commute with the pair DISTINCT — they are
    row-level key predicates — so they push BELOW it as broadcast
    semi-joins via ``_partsupp(pre_filter=...)``: the distinct shuffles
    only surviving pairs instead of every traded pair. Per-part MIN is
    unchanged (groups survive whole: the part filter drops whole
    groups, the supplier filter is the same EU restriction the oracle's
    ``eu`` applies before its MIN). The min join-back broadcasts.
    Top-100 is TakeOrdered, no global sort. (partsupp is the derived
    table — module comment.)
    """
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    sn = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY")
    )

    def keep(pairs: DataFrame) -> DataFrame:
        return pairs.join(
            F.broadcast(p.select("p_partkey")),
            pairs.ps_partkey == F.col("p_partkey"),
            "left_semi",
        ).join(
            F.broadcast(sn.select("s_suppkey")),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )

    from pyspark.sql import Window

    ps = _partsupp(spark, sf_dir, pre_filter=keep)
    eu = ps.join(F.broadcast(sn), ps.ps_suppkey == sn.s_suppkey).select(
        "ps_partkey", "ps_suppkey", "ps_supplycost_cents",
        "s_acctbal", "s_name", "n_name",
    )
    # correlated MIN as a window over the (already tiny) filtered pair
    # frame: one exchange on ps_partkey, no second derivation of eu, no
    # min join-back (the old agg + equality join re-derived the whole
    # pre-filtered distinct lineage on both branches)
    min_cost = F.min("ps_supplycost_cents").over(
        Window.partitionBy("ps_partkey")
    )
    out = (
        eu.withColumn("min_cost", min_cost)
        .filter(F.col("ps_supplycost_cents") == F.col("min_cost"))
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            "ps_suppkey", "ps_supplycost_cents",
        )
    )
    return out.orderBy(
        F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey", "ps_suppkey"
    ).limit(100)


@query(
    "tpch_q9_product_type_profit",
    oracle=f"""
    WITH partsupp AS ({_SQL_PARTSUPP})
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000, 0)
                    AS BIGINT)
               - CAST(ROUND((ps.ps_supplycost_cents / 100.0) * l.l_quantity
                            * 10000, 0) AS BIGINT)) / 10000.0 AS profit
    FROM lineitem l, part p, supplier s, partsupp ps, orders o, nation n
    WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
      AND ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
      AND o.o_orderkey = l.l_orderkey AND s.s_nationkey = n.n_nationkey
      AND p.p_name LIKE '%red%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9: profit on red parts by supplier nation and order year —
    revenue minus supply cost across the 6-table join. The amount is
    accumulated as ONE fixed-point bigint per row (scale-4: both the
    4-decimal discounted price and cost·quantity round to the same
    integers on both engines), summed exactly, divided once — the
    fsum discipline applied to a difference. Group sums stay < 2^53
    at sf0.1×100 margins; switch to the decimal path beyond.

    Scale shape (round 14, guide §2.4 — remove shuffles outright): the
    lineitem⋈partsupp pair join is GONE. partsupp's attributes are pure
    hash formulas of the (partkey, suppkey) pair, and partsupp IS the
    distinct pairs of this same lineitem, so the inner equi-join on the
    full pair key matched every row exactly once and attached a value
    computable in place — supplycost is now :func:`_ps_supplycost_cents`
    over lineitem's own columns (bit-identical values, one fewer fact
    scan, no pair-distinct shuffle, no pair broadcast). The only
    remaining fact-fact join is lineitem⋈orders.
    """
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    o = read_table(spark, sf_dir, "orders")
    cost_cents = _ps_supplycost_cents(F.col("l_partkey"), F.col("l_suppkey"))
    amount = (
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
        ).cast("bigint")
        - F.round(
            (cost_cents / 100.0) * F.col("l_quantity") * 10000,
            0,
        ).cast("bigint")
    )
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
    )
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").alias("o_year"),
    ).agg((F.sum(amount) / 10000.0).alias("profit"))


@query(
    "tpch_q11_important_stock",
    oracle=f"""
    WITH partsupp AS ({_SQL_PARTSUPP}),
    nat AS (
      SELECT ps.ps_partkey,
             CAST(SUM(ps.ps_supplycost_cents * ps.ps_availqty) AS BIGINT)
               AS value_cents
      FROM partsupp ps, supplier s, nation n
      WHERE ps.ps_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
        AND n.n_name = 'NATION_7'
      GROUP BY ps.ps_partkey
    ),
    tot AS (SELECT CAST(SUM(value_cents) AS BIGINT) AS total_cents FROM nat)
    SELECT ps_partkey, value_cents
    FROM nat, tot
    WHERE value_cents * 5000 > total_cents
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11: parts whose stock value held by NATION_7 suppliers exceeds
    0.02% of that nation's total stock value. The share threshold is
    the integer cross-product value·5000 > total (never a float
    fraction at the boundary); stock value is exact integer
    cents·units.

    Scale shape (round 14, guide §2.3): the NATION_7 supplier
    restriction is a row-level suppkey predicate, so it commutes with
    the pair DISTINCT and pushes BELOW it via
    ``_partsupp(pre_filter=...)`` — the distinct shuffles only that
    nation's pairs (~1/n_nations of the traded pairs). Per-part sum is
    map-side combinable; the total is a 1-row broadcast back onto the
    part-grain frame (the BNLJ-scalar pattern).
    """
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey"
    )
    ps = _partsupp(
        spark,
        sf_dir,
        pre_filter=lambda pairs: pairs.join(
            F.broadcast(sn),
            pairs.ps_suppkey == F.col("s_suppkey"),
            "left_semi",
        ),
    )
    nat = (
        ps.groupBy("ps_partkey")
        .agg(
            F.sum(F.col("ps_supplycost_cents") * F.col("ps_availqty"))
            .cast("bigint")
            .alias("value_cents")
        )
    )
    tot = nat.agg(F.sum("value_cents").cast("bigint").alias("total_cents"))
    return (
        nat.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") * 5000 > F.col("total_cents"))
        .select("ps_partkey", "value_cents")
    )


@query(
    "tpch_q16_supplier_part_counts",
    oracle=f"""
    WITH partsupp AS ({_SQL_PARTSUPP})
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS INT) AS p_size,
           CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp ps, part p
    WHERE p.p_partkey = ps.ps_partkey
      AND p.p_brand <> 'Brand#3' AND p.p_type <> 'MEDIUM'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND ps.ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16: how many suppliers can serve each (brand, type, size)
    bucket, excluding one brand, one type, off-grid sizes, and
    blacklisted suppliers (adapted: negative account balance stands in
    for the complaints LIKE — the testdata supplier has no comment
    column). NOT IN is planned as a broadcast anti-join (s_suppkey is
    non-null, so NOT-IN null semantics don't bite).

    Scale shape (round 14, guide §2.4): the pair-grain DISTINCT of the
    derived partsupp is REDUNDANT under COUNT(DISTINCT suppkey) — the
    count is set-based per (brand, type, size), so raw (possibly
    repeated) lineitem pairs yield the identical supplier sets. The
    query now runs straight off lineitem's pair projection with the
    part filter (8 of the sizes, ~1/6 of pairs) and the blacklist
    anti-join applied BEFORE the one distinct-aggregate shuffle
    (§2.3 — both commute with DISTINCT as row-level key predicates).
    One fact-wide exchange removed, the remaining one ~6x smaller.
    """
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "MEDIUM")
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    )
    bad = read_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    )
    kept = li.join(
        F.broadcast(bad),
        li.ps_suppkey == F.col("s_suppkey"),
        "left_anti",
    )
    return (
        kept.join(F.broadcast(p), kept.ps_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", F.col("p_size").cast("int").alias("p_size"))
        .agg(F.countDistinct("ps_suppkey").cast("bigint").alias("supplier_cnt"))
    )


@query(
    "tpch_q20_excess_stock_suppliers",
    oracle=f"""
    WITH partsupp AS ({_SQL_PARTSUPP}),
    q AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
               AS qty_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey AND p.p_name LIKE '%red%'
    JOIN q ON q.l_partkey = ps.ps_partkey AND q.l_suppkey = ps.ps_suppkey
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
                 AND n.n_name = 'NATION_3'
    WHERE ps.ps_availqty * 200 > q.qty_cents
    """,
)
def tpch_q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20: NATION_3 suppliers holding more than half a year's shipped
    volume of some red part — the stock-vs-demand threshold semi-join.
    The 50% comparison is integer (availqty·2·100 vs quantity-cents);
    quantities accumulate in exact cents.

    Scale shape (round 14, guide §2.4 + §2.3): the partsupp⋈q pair
    join is GONE — q's pairs are a subset of partsupp's by
    construction (lineitem-derived), so the inner pair join attached
    only the availqty formula, now computed in place on q's own group
    keys. The red-part and NATION_3-supplier restrictions move BELOW
    the demand aggregation as broadcast semi-joins (both are group-key
    predicates — group sums are untouched), so the one remaining
    shuffle carries only qualifying pairs.
    """
    p = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "s_name"
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    q = (
        li.join(
            F.broadcast(p.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .join(
            F.broadcast(sn.select("s_suppkey")),
            li.l_suppkey == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.round(F.col("l_quantity") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("qty_cents")
        )
    )
    hits = q.filter(
        _ps_availqty(F.col("l_partkey"), F.col("l_suppkey")) * 200
        > F.col("qty_cents")
    ).join(F.broadcast(sn), F.col("l_suppkey") == sn.s_suppkey)
    return hits.select("s_suppkey", "s_name").distinct()
