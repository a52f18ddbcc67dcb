"""Reference-implementation unit tests for the round-11 statistics:
Kruskal-Wallis, Friedman, Cochran-Armitage, Grubbs, Page-Hinkley, and
the position-based attribution credit layout. The DuckDB oracle proves
cross-engine agreement; these prove the FORMULAS against independent
pure-Python computations on tiny fixtures (scipy is absent here, so
the references are hand-rolled from the textbook definitions).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _kw_reference(groups):
    """Textbook tie-corrected Kruskal-Wallis H over {name: [values]}."""
    allv = sorted(v for vs in groups.values() for v in vs)
    n = len(allv)
    # average ranks per value
    ranks = {}
    i = 0
    while i < len(allv):
        j = i
        while j < len(allv) and allv[j] == allv[i]:
            j += 1
        avg = (i + 1 + j) / 2  # ranks i+1..j
        ranks[allv[i]] = avg
        i = j
    h = 0.0
    for vs in groups.values():
        r = sum(ranks[v] for v in vs)
        h += (r - len(vs) * (n + 1) / 2) ** 2 / len(vs)
    h *= 12 / (n * (n + 1))
    # tie correction
    from collections import Counter

    t = Counter(allv)
    corr = 1 - sum(c**3 - c for c in t.values()) / (n**3 - n)
    return h / corr


def test_kruskal_wallis_matches_reference(spark):
    rows = []
    groups = {
        "a": [10, 20, 20, 30, 55],
        "b": [15, 20, 35, 40],
        "c": [5, 25, 45, 50, 50, 60],
    }
    for g, vs in groups.items():
        rows += [(g, v) for v in vs]
    df = spark.createDataFrame(rows, "grp string, cents bigint")

    # replicate the registered construction on the fixture
    from data_ingestion_tool_spark.operators.ranking import (
        with_global_prefix_sum,
    )
    from data_ingestion_tool_spark.queries.statistics import (
        _KW_C,
        _KW_H,
        _KW_SUMTERM,
    )

    grain = df.groupBy("grp", "cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    vg = grain.groupBy("cents").agg(
        F.sum("cnt").cast("bigint").alias("t_cnt")
    )
    g = with_global_prefix_sum(
        vg, ["cents"], "t_cnt", rn="__rn", cum="cum_t"
    ).select(
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
        .groupBy()
        .agg(
            F.max("k").alias("k"),
            F.max("n").alias("n"),
            F.expr(_KW_SUMTERM).alias("sum_term"),
        )
    )
    h = (
        dev.crossJoin(F.broadcast(ties))
        .selectExpr(f"{_KW_H} / {_KW_C} AS h")
        .collect()[0]
        .h
    )
    assert abs(h - _kw_reference(groups)) < 1e-9


def test_friedman_reference_small(spark, sf_dir=None):
    """Friedman chi2 on a 4-block, 3-treatment fixture vs the textbook
    formula (no ties within blocks)."""
    # blocks: rank patterns
    data = {  # (block, treatment) -> value
        (1, "x"): 1, (1, "y"): 5, (1, "z"): 9,
        (2, "x"): 2, (2, "y"): 6, (2, "z"): 4,
        (3, "x"): 3, (3, "y"): 8, (3, "z"): 7,
        (4, "x"): 1, (4, "y"): 9, (4, "z"): 5,
    }
    # reference: rank within block, chi2 = 12/(nk(k+1)) sum Rj^2 - 3n(k+1)
    from collections import defaultdict

    ranks = defaultdict(float)
    blocks = {b for b, _ in data}
    treats = sorted({t for _, t in data})
    for b in blocks:
        vals = sorted((data[(b, t)], t) for t in treats)
        for r, (_, t) in enumerate(vals, 1):
            ranks[t] += r
    n, k = len(blocks), len(treats)
    chi2_ref = 12 / (n * k * (k + 1)) * sum(
        r**2 for r in ranks.values()
    ) - 3 * n * (k + 1)

    # engine construction: cross-multiplication ranks over (n=1, s=v)
    rows = [(b, t, 1, v) for (b, t), v in data.items()]
    c = spark.createDataFrame(rows, "day int, event_type string, n bigint, s bigint")
    b2 = c.select(
        F.col("day"), F.col("n").alias("nb"), F.col("s").alias("sb")
    )
    r = (
        c.join(b2, "day")
        .groupBy("day", "event_type")
        .agg(
            (
                2 * F.sum(F.when(F.col("sb") * F.col("n") < F.col("s") * F.col("nb"), 1).otherwise(0))
                + F.sum(F.when(F.col("sb") * F.col("n") == F.col("s") * F.col("nb"), 1).otherwise(0))
                + 1
            ).cast("bigint").alias("r2")
        )
    )
    per = r.groupBy("event_type").agg(
        F.sum("r2").cast("bigint").alias("s2"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    rows = per.collect()
    sum_d2 = sum((x.s2 - n * (k + 1)) ** 2 for x in rows)
    chi2 = 3 * sum_d2 / (n * k * (k + 1))
    assert abs(chi2 - chi2_ref) < 1e-9


def test_cochran_armitage_reference():
    """z on a tiny 3-group table vs the direct formula."""
    # groups s=1,2,3 with (n_j, r_j)
    table = [(1, 10, 2), (2, 10, 5), (3, 10, 8)]
    n = sum(t[1] for t in table)
    r = sum(t[2] for t in table)
    s1 = sum(s * nj for s, nj, _ in table)
    s2 = sum(s * s * nj for s, nj, _ in table)
    sr = sum(s * rj for s, _, rj in table)
    pbar = r / n
    t_num = sr - r * s1 / n
    var = pbar * (1 - pbar) * (s2 - s1 * s1 / n)
    z_ref = t_num / math.sqrt(var)

    from data_ingestion_tool_spark.queries.statistics import _CA_Z
    import duckdb

    z = duckdb.sql(
        f"SELECT {_CA_Z} AS z FROM (SELECT CAST({n} AS BIGINT) n,"
        f" CAST({r} AS BIGINT) r, CAST({s1} AS BIGINT) s1,"
        f" CAST({s2} AS BIGINT) s2, CAST({sr} AS BIGINT) sr)"
    ).fetchall()[0][0]
    assert abs(z - z_ref) < 1e-12


def test_grubbs_reference():
    import duckdb

    vals = [10, 12, 11, 13, 12, 40]  # 40 is the outlier
    n = len(vals)
    mean = sum(vals) / n
    sd = math.sqrt(sum((v - mean) ** 2 for v in vals) / (n - 1))
    g_ref = max(max(vals) - mean, mean - min(vals)) / sd

    from data_ingestion_tool_spark.queries.statistics import _GRUBBS_G

    g = duckdb.sql(
        f"SELECT {_GRUBBS_G} AS g FROM (SELECT CAST({n} AS BIGINT) n,"
        f" CAST({sum(vals)} AS BIGINT) s1,"
        f" CAST({sum(v * v for v in vals)} AS BIGINT) q,"
        f" CAST({max(vals)} AS BIGINT) maxc,"
        f" CAST({min(vals)} AS BIGINT) minc)"
    ).fetchall()[0][0]
    assert abs(g - g_ref) < 1e-12


def test_position_based_credits_sum_to_unit(spark):
    """Every purchase's micro credits must total exactly 1,000,000 for
    any touch count n >= 1 (incl. the remainder-to-first-middle rule)."""
    rows = []
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    pid = 0
    for n in [1, 2, 3, 4, 5, 7, 11]:
        pid += 1
        # one purchase with n preceding touches, 1 minute apart
        rows.append((pid + 100000, pid, base, "purchase", 10.0))
        for i in range(n):
            rows.append(
                (
                    pid * 1000 + i,
                    pid,
                    base - dt.timedelta(minutes=i + 1),
                    "click",
                    0.0,
                )
            )
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp,"
        " event_type string, value double"
    )
    import data_ingestion_tool_spark.queries.analytics as A

    orig = A.read_events
    A.read_events = lambda s, d: df
    try:
        out = A.events_attribution_position_based(spark, "ignored")
        total_micro = sum(r.micro_total for r in out.collect())
    finally:
        A.read_events = orig
    assert total_micro == 7 * 1000000
