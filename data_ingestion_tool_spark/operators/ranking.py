"""Scale-safe global ranking: distributed ``row_number``/``ntile``/
``percent_rank``/prefix-sum over a TOTAL order with no ``PARTITION BY``.

The naive form — ``Window.orderBy(...)`` with no partitioning — is the
canonical single-task wall: Spark plans it as ``Exchange
SinglePartition`` + one sort task holding EVERY row. Fine at sf0.1;
at 100 TB the whole table funnels through one executor and the job is
effectively serial.

This module computes identical semantics with a fully parallel plan:

1. ``repartitionByRange(P, keys)`` — ONE range shuffle. Partition *i*
   holds keys wholly ≤ partition *i+1*'s. ``P`` is explicit
   (REPARTITION_BY_NUM) so AQE never re-coalesces, guaranteeing both
   readers below observe the same partitioning of the ONE reused
   exchange.
2. ``sortWithinPartitions(keys)`` — parallel per-partition sorts.
3. Local (within-partition) row index decoded from
   ``monotonically_increasing_id()`` = ``pid·2³³ + row_index`` — no
   extra shuffle, no per-partition window.
4. Per-partition row counts: a P-row aggregate branching off the SAME
   exchange (reused, so partition contents are identical across
   branches within one execution). Exclusive prefix offsets come from
   a window over that P-row frame — the only single-partition window
   in the plan runs over P rows of aggregate, never over data — and
   are broadcast-joined back on partition id.

``global row_number = partition row offset + local index + 1``.

Determinism: the output does not depend on where the sampled range
bounds land — for ANY split of a totally ordered dataset, offset +
local index reproduces the global rank. Callers MUST supply a total
order (unique tie-break key), per the repo-wide window rule.

Bounds: ≤ 2³³ rows per range partition (monotonically_increasing_id
packing); ntile/percent_rank integer math is exact for n < 2⁵³.

Reference parity: the reference engine has no window functions at all
(`/root/reference/backend/main.py` delegates SQL strings verbatim);
this operator exists for the engine's own analytics surface.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

_MID_MASK = (1 << 33) - 1  # monotonically_increasing_id: pid<<33 | row_idx


def _cols(order_cols: Iterable[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_cols]


def _ranged(
    df: DataFrame, order_cols: Iterable[Column | str], num_partitions: int | None
) -> tuple[DataFrame, int]:
    """Range-partition and PIN the partitioning with a lazy
    localCheckpoint.

    The pin is load-bearing, not an optimization: the offsets branch
    and the data branch prune different columns, so without it Catalyst
    plans two NON-identical range exchanges that each sample their own
    partition bounds — the offsets would describe a different
    partitioning than the rows they're joined to (observed as wrong
    ranks at sf0.01). ``localCheckpoint(eager=False)`` materializes the
    shuffled partitions once in the block manager (MEMORY_AND_DISK,
    cleaned by the ContextCleaner when the frame is unreferenced) and
    both branches read the SAME physical partitions — the exact design
    of RDD ``zipWithIndex``, which runs its count job against a pinned
    RDD. Cost: one materialization of the (column-pruned) input, the
    unavoidable price of stable two-pass global ranking.
    """
    sess = df.sparkSession
    p = num_partitions or int(sess.conf.get("spark.sql.shuffle.partitions"))
    parted = df.repartitionByRange(p, *_cols(order_cols)).localCheckpoint(eager=False)
    return parted, p


def _offsets(parted: DataFrame, sum_col: str | None = None) -> DataFrame:
    """(pid, exclusive row offset, total rows[, exclusive sum offset,
    total sum]) — a ≤P-row frame derived from the reused exchange."""
    aggs = [F.count(F.lit(1)).alias("__cnt")]
    if sum_col is not None:
        aggs.append(F.sum(F.col(sum_col).cast("bigint")).alias("__psum"))
    counts = (
        parted.select(
            F.spark_partition_id().alias("__pid"),
            *([sum_col] if sum_col is not None else []),
        )
        .groupBy("__pid")
        .agg(*aggs)
    )
    w = Window.orderBy("__pid")
    excl = w.rowsBetween(Window.unboundedPreceding, -1)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    sel = [
        F.col("__pid"),
        F.coalesce(F.sum("__cnt").over(excl), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(full).alias("__ntot"),
    ]
    if sum_col is not None:
        sel.append(F.coalesce(F.sum("__psum").over(excl), F.lit(0)).alias("__soff"))
        sel.append(F.sum("__psum").over(full).alias("__stot"))
    return counts.select(*sel)


def with_global_row_number(
    df: DataFrame,
    order_cols: Iterable[Column | str],
    *,
    rn: str = "rn",
    n_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 1-based global ``row_number`` (bigint) over ``order_cols``
    (which must be a TOTAL order), optionally a total-count column.

    Plan shape: one range shuffle (parallel sort), a P-row offsets
    aggregate on the reused exchange, one broadcast join. No
    single-partition window over data.
    """
    order_cols = list(order_cols)
    parted, _ = _ranged(df, order_cols, num_partitions)
    offs = _offsets(parted)
    local = (
        parted.sortWithinPartitions(*_cols(order_cols))
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__mid", F.monotonically_increasing_id())
    )
    out = local.join(F.broadcast(offs), "__pid").withColumn(
        rn,
        (
            F.col("__off") + F.col("__mid").bitwiseAND(F.lit(_MID_MASK)) + F.lit(1)
        ).cast("bigint"),
    )
    if n_col is not None:
        out = out.withColumn(n_col, F.col("__ntot").cast("bigint"))
    return out.drop("__pid", "__mid", "__off", "__ntot")


def with_global_prefix_sum(
    df: DataFrame,
    order_cols: Iterable[Column | str],
    sum_col: str,
    *,
    rn: str = "rn",
    cum: str = "cum",
    n_col: str | None = None,
    total_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add global row_number AND inclusive prefix sum of an INTEGER
    column over a total order — the distributed ``SUM(...) OVER (ORDER
    BY ... ROWS UNBOUNDED PRECEDING)``.

    The within-partition running sum is a vectorized int64 cumsum in
    ``mapInPandas`` (per-partition imperative logic — the legitimate
    Arrow-batched escape hatch); cross-partition offsets come from the
    same reused-exchange P-row aggregate as
    :func:`with_global_row_number`. ``sum_col`` must fit int64 totals;
    integer accumulation keeps the result engine-exact.
    """
    order_cols = list(order_cols)
    parted, _ = _ranged(df, order_cols, num_partitions)
    offs = _offsets(parted, sum_col=sum_col)
    local = parted.sortWithinPartitions(*_cols(order_cols)).withColumn(
        "__pid", F.spark_partition_id()
    )
    schema = StructType(
        local.schema.fields
        + [StructField("__lrn", LongType()), StructField("__lcum", LongType())]
    )

    def add_local(batches: Iterator) -> Iterator:
        import numpy as np

        rn_off = 0
        cum_off = 0
        for pdf in batches:
            k = len(pdf)
            if k == 0:
                continue
            vals = pdf[sum_col].to_numpy(dtype="int64")
            lcum = vals.cumsum() + cum_off
            pdf = pdf.assign(
                __lrn=np.arange(rn_off + 1, rn_off + k + 1, dtype="int64"),
                __lcum=lcum,
            )
            rn_off += k
            cum_off = int(lcum[-1])
            yield pdf

    out = (
        local.mapInPandas(add_local, schema)
        .join(F.broadcast(offs), "__pid")
        .withColumn(rn, (F.col("__off") + F.col("__lrn")).cast("bigint"))
        .withColumn(cum, (F.col("__soff") + F.col("__lcum")).cast("bigint"))
    )
    if n_col is not None:
        out = out.withColumn(n_col, F.col("__ntot").cast("bigint"))
    if total_col is not None:
        out = out.withColumn(total_col, F.col("__stot").cast("bigint"))
    return out.drop("__pid", "__lrn", "__lcum", "__off", "__soff", "__ntot", "__stot")


def ntile_from_rn(rn: Column | str, n: Column | str, k: int) -> Column:
    """SQL ``NTILE(k)`` reconstructed from a 1-based global row number
    and the total count: the first ``n % k`` buckets take one extra
    row. Pure integer comparisons (exact for n < 2⁵³) — matches Spark
    and DuckDB NTILE bit-for-bit under a total order."""
    rn_c = F.col(rn) if isinstance(rn, str) else rn
    n_c = F.col(n) if isinstance(n, str) else n
    rem = n_c % F.lit(k)
    base = ((n_c - rem) / F.lit(k)).cast("bigint")  # exact multiple / k
    bucket: Column = F.lit(1).cast("bigint")
    for j in range(1, k):
        cum_j = F.lit(j) * base + F.least(F.lit(j).cast("bigint"), rem)
        bucket = bucket + F.when(rn_c > cum_j, 1).otherwise(0)
    return bucket.cast("bigint")


def percent_rank_from_rn(rn: Column | str, n: Column | str) -> Column:
    """``PERCENT_RANK()`` = (rank−1)/(n−1) for a TOTAL order (rank ==
    row_number when there are no ties); 0.0 for n == 1 as SQL defines."""
    rn_c = F.col(rn) if isinstance(rn, str) else rn
    n_c = F.col(n) if isinstance(n, str) else n
    return (
        F.when(
            n_c > 1,
            (rn_c - 1).cast("double") / (n_c - 1).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("pct")
    )


def with_global_ntile(
    df: DataFrame,
    order_cols: Iterable[Column | str],
    k: int,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """``NTILE(k) OVER (ORDER BY ...)`` without the single-task sort:
    one range shuffle + closed-form bucket math. Chainable (each call
    re-ranges on its own keys)."""
    d = with_global_row_number(
        df, order_cols, rn="__gn_rn", n_col="__gn_n", num_partitions=num_partitions
    )
    return d.withColumn(out_col, ntile_from_rn("__gn_rn", "__gn_n", k)).drop(
        "__gn_rn", "__gn_n"
    )


def with_global_prefix_sums(
    df: DataFrame,
    order_cols: Iterable[Column | str],
    sum_cols: Iterable[str],
    *,
    rn: str = "rn",
    cum_prefix: str = "cum_",
    tot_prefix: str | None = None,
    n_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Multi-column sibling of :func:`with_global_prefix_sum`: one range
    shuffle, one reused-exchange P-row offsets aggregate, and a single
    vectorized ``mapInPandas`` pass produce the global row number plus
    an inclusive integer prefix sum ``{cum_prefix}{c}`` for EVERY column
    in ``sum_cols`` (and, when ``tot_prefix`` is set, the grand total
    ``{tot_prefix}{c}`` on every row). Needed by two-sample statistics
    (KS, Mann-Whitney) where both groups' ECDFs advance over the same
    total order — running the single-column operator twice would pay
    the range shuffle per column.

    Same bounds as the single-column form: each ``sum_cols`` entry must
    be integer-typed with int64-safe totals; ``order_cols`` must be a
    total order of the frame.
    """
    order_cols = list(order_cols)
    sum_cols = list(sum_cols)
    parted, _ = _ranged(df, order_cols, num_partitions)

    aggs = [F.count(F.lit(1)).alias("__cnt")] + [
        F.sum(F.col(c).cast("bigint")).alias(f"__ps_{c}") for c in sum_cols
    ]
    counts = (
        parted.select(F.spark_partition_id().alias("__pid"), *sum_cols)
        .groupBy("__pid")
        .agg(*aggs)
    )
    w = Window.orderBy("__pid")
    excl = w.rowsBetween(Window.unboundedPreceding, -1)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    sel = [
        F.col("__pid"),
        F.coalesce(F.sum("__cnt").over(excl), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(full).alias("__ntot"),
    ]
    for c in sum_cols:
        sel.append(
            F.coalesce(F.sum(f"__ps_{c}").over(excl), F.lit(0)).alias(f"__soff_{c}")
        )
        sel.append(F.sum(f"__ps_{c}").over(full).alias(f"__stot_{c}"))
    offs = counts.select(*sel)

    local = parted.sortWithinPartitions(*_cols(order_cols)).withColumn(
        "__pid", F.spark_partition_id()
    )
    schema = StructType(
        local.schema.fields
        + [StructField("__lrn", LongType())]
        + [StructField(f"__lc_{c}", LongType()) for c in sum_cols]
    )

    def add_local(batches: Iterator) -> Iterator:
        import numpy as np

        rn_off = 0
        cum_off = {c: 0 for c in sum_cols}
        for pdf in batches:
            k = len(pdf)
            if k == 0:
                continue
            assigns = {
                "__lrn": np.arange(rn_off + 1, rn_off + k + 1, dtype="int64")
            }
            for c in sum_cols:
                lcum = pdf[c].to_numpy(dtype="int64").cumsum() + cum_off[c]
                assigns[f"__lc_{c}"] = lcum
                cum_off[c] = int(lcum[-1])
            rn_off += k
            yield pdf.assign(**assigns)

    out = (
        local.mapInPandas(add_local, schema)
        .join(F.broadcast(offs), "__pid")
        .withColumn(rn, (F.col("__off") + F.col("__lrn")).cast("bigint"))
    )
    drop = ["__pid", "__lrn", "__off", "__ntot"]
    for c in sum_cols:
        out = out.withColumn(
            f"{cum_prefix}{c}",
            (F.col(f"__soff_{c}") + F.col(f"__lc_{c}")).cast("bigint"),
        )
        if tot_prefix is not None:
            out = out.withColumn(tot_prefix + c, F.col(f"__stot_{c}").cast("bigint"))
        drop += [f"__lc_{c}", f"__soff_{c}", f"__stot_{c}"]
    if n_col is not None:
        out = out.withColumn(n_col, F.col("__ntot").cast("bigint"))
    return out.drop(*drop)


def with_grouped_global_row_number(
    df: DataFrame,
    group_cols: Iterable[Column | str],
    order_cols: Iterable[Column | str],
    *,
    rn: str = "rn",
    n_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-GROUP global ``row_number`` (and group size) without a
    per-group single-task sort — the grouped sibling of
    :func:`with_global_row_number`, for the LOW-CARDINALITY-group /
    huge-rows regime (rank prices within 3 return flags at 100 TB).

    ``Window.partitionBy(grp).orderBy(...)`` routes each group's ENTIRE
    row set through one task — fine when groups are many and small,
    serial when groups are few and huge. Here instead:

    1. ONE range shuffle on ``(group, order)`` — each group occupies a
       contiguous run of partitions, sorted within; pinned with a lazy
       localCheckpoint exactly like :func:`_ranged` (two consumers must
       see identical partition contents).
    2. Per-partition local indices that RESET at group boundaries — a
       vectorized pandas groupby-cumcount inside ``mapInPandas``.
    3. A (partition, group) count frame (≤ P + G rows: groups are
       contiguous, so each adds at most one partial partition) whose
       per-group exclusive prefix over partition id gives each
       (pid, group) its starting offset; broadcast back.

    Bound: the offsets frame is O(P + G) rows and is BROADCAST — use
    this operator when G (group cardinality) is bounded (enum-ish
    keys). For large-G/small-group data the plain partitioned window
    is already parallel and strictly cheaper.

    Ties in ``order_cols`` get an arbitrary-but-valid order within the
    rank (same contract as ``row_number`` over a non-unique ORDER BY):
    positions are deterministic as VALUES — value-at-index reads
    (quantiles) are exact; do not pair row identities across two
    different rankings (the CLAUDE.md lineitem rule).
    """
    group_cols = list(group_cols)
    order_cols = list(order_cols)
    all_cols = group_cols + order_cols
    sess = df.sparkSession
    p = num_partitions or int(sess.conf.get("spark.sql.shuffle.partitions"))
    parted = df.repartitionByRange(p, *_cols(all_cols)).localCheckpoint(
        eager=False
    )
    gnames = [c if isinstance(c, str) else c._jc.toString() for c in group_cols]

    counts = (
        parted.select(F.spark_partition_id().alias("__pid"), *gnames)
        .groupBy("__pid", *gnames)
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    wg = Window.partitionBy(*gnames).orderBy("__pid")
    offs = counts.select(
        "__pid",
        *gnames,
        F.coalesce(
            F.sum("__cnt").over(wg.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__off"),
        F.sum("__cnt")
        .over(
            wg.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        .alias("__gtot"),
    )

    local = parted.sortWithinPartitions(*_cols(all_cols)).withColumn(
        "__pid", F.spark_partition_id()
    )
    schema = StructType(local.schema.fields + [StructField("__lrn", LongType())])

    def add_local(batches: Iterator) -> Iterator:
        import numpy as np

        carry = None  # group key of the previous batch's LAST row
        carry_n = 0  # rows of that group seen so far in this partition
        for pdf in batches:
            if not len(pdf):
                continue
            lrn = pdf.groupby(gnames, sort=False).cumcount().to_numpy("int64")
            if carry is not None:
                # groups are sorted, so any continuation of the carried
                # group is a PREFIX run — vectorized equality + cumprod
                eq = np.ones(len(pdf), dtype=bool)
                for g, v in zip(gnames, carry):
                    eq &= pdf[g].to_numpy() == v
                run = np.logical_and.accumulate(eq)
                lrn = lrn + run * carry_n
            carry = tuple(pdf.iloc[-1][g] for g in gnames)
            # sorted ⇒ the last row is the max cumcount of its group
            carry_n = int(lrn[-1]) + 1
            yield pdf.assign(__lrn=lrn + 1)

    out = local.mapInPandas(add_local, schema).join(
        F.broadcast(offs), ["__pid", *gnames]
    )
    out = out.withColumn(rn, (F.col("__off") + F.col("__lrn")).cast("bigint"))
    if n_col is not None:
        out = out.withColumn(n_col, F.col("__gtot").cast("bigint"))
    return out.drop("__pid", "__lrn", "__off", "__gtot")


def with_grouped_lead(
    df: DataFrame,
    group_cols: Iterable[Column | str],
    order_cols: Iterable[Column | str],
    lead_map: dict[str, str],
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group ``lead(col, 1)`` over a total order without the
    per-group single-task sort — the SEQUENCE sibling of
    :func:`with_grouped_global_row_number` for the low-cardinality-
    group / huge-rows regime (lag-1 series ops per enum key).

    Plan: one pinned range shuffle on ``(group, order)`` + local
    vectorized shifts, then the only cross-partition traffic is a
    ≤P-row BOUNDARY frame (each partition's first row per its leading
    group), broadcast back onto the rows that end a group-run at a
    partition edge. No driver collect, no full-data second shuffle.

    ``lead_map`` maps source column → output lead column. The final row
    of each group gets NULL leads (SQL ``lead`` semantics). Order must
    be total (unique tie-break) for deterministic neighbors.
    """
    import numpy as np
    import pandas as pd

    group_cols = list(group_cols)
    order_cols = list(order_cols)
    gnames = [c if isinstance(c, str) else c._jc.toString() for c in group_cols]
    srcs = list(lead_map)
    all_cols = group_cols + order_cols
    sess = df.sparkSession
    p = num_partitions or int(sess.conf.get("spark.sql.shuffle.partitions"))
    parted = (
        df.repartitionByRange(p, *_cols(all_cols))
        .sortWithinPartitions(*_cols(all_cols))
        .localCheckpoint(eager=False)
    )
    local = parted.withColumn("__pid", F.spark_partition_id())

    # each partition's FIRST row (its leading group's head) — ≤P rows
    first_schema = StructType(
        [local.schema["__pid"]]
        + [local.schema[g] for g in gnames]
        + [
            StructField(f"__b_{src}", local.schema[src].dataType)
            for src in srcs
        ]
    )

    def first_rows(batches: Iterator) -> Iterator:
        for pdf in batches:
            if not len(pdf):
                continue
            head = pdf.iloc[[0]]
            out = {"__pid": head["__pid"].values}
            for g in gnames:
                out[g] = head[g].values
            for src in srcs:
                out[f"__b_{src}"] = head[src].values
            yield pd.DataFrame(out)
            break  # only the first batch of the partition holds row 0

    # Key each boundary row by the PREVIOUS NON-EMPTY partition id, not
    # a blind __pid - 1: range partitioning can leave an empty partition
    # between two populated ones holding the same group (sample-derived
    # bounds landing in a gap of the distribution), and the tail row of
    # partition q must see the first row of the next NON-EMPTY
    # partition. The boundary frame has exactly one row per non-empty
    # partition, so a lag over it (≤P rows, single-task window on P
    # aggregate rows — same bounded shape as the offsets branch) yields
    # precisely that mapping.
    wb = Window.orderBy("__pid")
    boundary = (
        local.mapInPandas(first_rows, first_schema)
        .withColumn("__prev_pid", F.lag("__pid").over(wb))
        .where(F.col("__prev_pid").isNotNull())
        .drop("__pid")
        .withColumnRenamed("__prev_pid", "__pid")
    )

    # local shifted leads + end-of-group-run flag (streamed with a
    # one-batch lookahead: batch N's last row peeks batch N+1's first)
    shift_schema = StructType(
        local.schema.fields
        + [
            StructField(f"__l_{src}", local.schema[src].dataType)
            for src in srcs
        ]
        + [StructField("__endrun", LongType())]
    )

    def _shift_one(pdf, next_first):
        same_next = np.ones(len(pdf), dtype=bool)
        for g in gnames:
            v = pdf[g].to_numpy()
            same_next[:-1] &= v[:-1] == v[1:]
        tail_same = next_first is not None and all(
            pdf.iloc[-1][g] == next_first[g] for g in gnames
        )
        same_next[-1] = bool(tail_same)
        assigns = {}
        for src in srcs:
            shifted = pdf[src].shift(-1)
            if tail_same:
                shifted.iloc[-1] = next_first[src]
            assigns[f"__l_{src}"] = shifted.where(same_next)
        # __endrun marks only TRUE end-of-run rows at the partition tail
        # (the per-batch stitching above already handled intra-partition
        # continuation)
        assigns["__endrun"] = (~same_next).astype("int64")
        return pdf.assign(**assigns)

    def add_shift(batches: Iterator) -> Iterator:
        prev = None
        for pdf in batches:
            if not len(pdf):
                continue
            if prev is not None:
                yield _shift_one(prev, pdf.iloc[0])
            prev = pdf
        if prev is not None:
            yield _shift_one(prev, None)

    shifted = local.mapInPandas(add_shift, shift_schema)
    out = shifted.join(F.broadcast(boundary), ["__pid", *gnames], "left")
    for src, dst in lead_map.items():
        out = out.withColumn(
            dst,
            F.when(F.col("__endrun") == 0, F.col(f"__l_{src}")).otherwise(
                F.col(f"__b_{src}")  # NULL when no same-group successor
            ),
        )
    drop = ["__pid", "__endrun"] + [f"__l_{s}" for s in srcs] + [
        f"__b_{s}" for s in srcs
    ]
    return out.drop(*drop)
