"""As-of (time-travel) join — a temporal operator Spark lacks built-in.

``asof_join(left, right, ...)`` matches each left row to the most
recent right row with ``right.ts <= left.ts`` within the same key —
the classic "price as of trade time" / "latest order before this
event" join (DuckDB spells it ``ASOF JOIN``, which is the oracle).

Spark-first plan — union + ordered window, NOT a range join:

    left(key, ts, ...)  ─┐
                         ├─ unionByName ─ Window(partitionBy key,
    right(key, ts, ...) ─┘                 orderBy ts, side)
                                           last(right_payload,
                                                ignorenulls=True)
                                           → filter(side = left)

One shuffle (by key), one sort within partitions, then a linear pass —
O(n log n) per partition and no row-pair blowup. The naive alternative
(non-equi join ``l.ts >= r.ts`` + argmax) materializes every
(left, earlier-right) pair: quadratic per key, plan death at 100 TB.
Skewed keys follow the same AQE skew-split path as any windowed op.

Determinism note: when several right rows share (key, ts), which one's
payload wins is tie-ordered by the payload itself (greatest wins) so the
result is deterministic; DuckDB's ASOF has the same ambiguity and the
oracle queries carry tie-insensitive payloads (e.g. the matched
timestamp).
"""

from __future__ import annotations
from ..plans.pin import pin

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    right_on: str | None = None,
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Left as-of join, inclusive either direction:

    - ``direction="backward"`` (default): most recent right row with
      ``right_ts <= left_ts`` (DuckDB ``ASOF JOIN`` / pandas
      ``merge_asof(direction="backward")``);
    - ``direction="forward"``: earliest right row with
      ``right_ts >= left_ts`` (pandas ``direction="forward"``; the
      "next event after" join — DuckDB has no forward ASOF, so oracles
      use a correlated MIN subquery).

    ``on``: key column on the left; ``right_on``: key on the right
    (defaults to ``on``). ``payload`` maps right column → output alias
    for the columns carried from the matched right row. Left rows with
    no matching right row keep NULL payload (LEFT ASOF semantics).
    Both directions are the same one-shuffle union + ordered-window
    plan (module docstring); forward just scans the other way.

    ``tolerance_us`` (backward/forward only — pandas ``merge_asof``'s
    ``tolerance``): a match further than this many microseconds from
    the left timestamp is nulled out AFTER the scan (the matched
    right timestamp rides inside the payload struct, so the check is
    a cheap post-projection filter — no plan change, no second scan).
    """
    if direction == "nearest":
        if tolerance_us is not None:
            raise ValueError("tolerance_us supports backward/forward only")
        return _asof_nearest(
            left, right, on=on, right_on=right_on, left_ts=left_ts,
            right_ts=right_ts, payload=payload,
        )
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    # All payload columns ride ONE never-null struct per right row, so
    # `last(ignorenulls=True)` skips only rows of the wrong side — a
    # genuinely-NULL payload value in the matched right row stays NULL
    # (and every output column comes from the SAME matched row; filling
    # per-column would silently substitute older rows' values).
    lhs = left.select(
        "*",
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).alias("__p"),
    )
    rhs = right.select(
        F.col(right_on or on).alias(on),
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        # __rts (the matched right timestamp) leads the struct for the
        # tolerance check; it never changes tie-breaks, because struct
        # comparison only reaches it for rows with EQUAL __ts — where
        # __rts is equal too and ordering falls through to the payload.
        F.struct(
            F.col(right_ts).alias("__rts"),
            *[F.col(src).alias(dst) for src, dst in payload.items()],
        ).alias("__p"),
    )
    for c in lhs.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None))
    u = lhs.unionByName(rhs.select(*lhs.columns))

    # Backward: right rows sort before left rows at equal ts → inclusive
    # <=, scan back with last(ignorenulls). Forward: right rows sort
    # AFTER left rows at equal ts → inclusive >=, scan ahead with
    # first(ignorenulls). The struct as trailing sort key pins
    # (key, ts)-ties deterministically (greatest payload struct wins in
    # both directions, matching the oracle note above).
    if direction == "backward":
        w = (
            Window.partitionBy(on)
            .orderBy("__ts", "__side", "__p")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fill = F.last("__p", ignorenulls=True)
    else:
        w = (
            Window.partitionBy(on)
            .orderBy("__ts", F.col("__side").desc(), F.col("__p").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        fill = F.first("__p", ignorenulls=True)
    filled = u.select("*", fill.over(w).alias("__m"))
    matched = F.col("__m")
    if tolerance_us is not None:
        gap = F.abs(
            F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__m.__rts"))
        )
        matched = F.when(gap <= F.lit(tolerance_us), F.col("__m"))
    return filled.filter(F.col("__side") == 1).select(
        *left.columns,
        *[matched.getField(dst).alias(dst) for dst in payload.values()],
    )


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    right_on: str | None,
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
) -> DataFrame:
    """direction="nearest": the right row minimizing |right_ts −
    left_ts|, ties resolved to the BACKWARD (earlier) match — pandas
    ``merge_asof(direction="nearest")`` semantics. Implemented as the
    backward and forward passes stitched per left row (the left frame
    gets a transient row id, so no unique key is required of the
    caller); both passes carry the matched timestamp internally to
    arbitrate the distance.

    Scale shape: two one-shuffle as-of passes on the same key + one
    row-id-partitioned stitch join — 3 shuffles total, each on a key
    the next stage reuses.
    """
    from pyspark.sql import functions as F

    # The row id MUST be assigned once and pinned: __lid is
    # nondeterministic (partition-layout-dependent), and three lineage
    # branches (b, f, and the stitch join) reference it. Without the
    # pin, a left frame downstream of a shuffle/window could present
    # different partition contents to each recomputation, silently
    # misaligning the stitch. The lazy localCheckpoint materializes the
    # id'd frame once in the block manager (ContextCleaner-collected)
    # and every branch reads the SAME physical rows — cf. the identical
    # pin in operators/ranking.py.
    lid = left.withColumn("__lid", F.monotonically_increasing_id()).transform(pin)
    # Arbitrate by the matched right timestamp; reuse the caller's own
    # payload alias when right_ts is already carried (adding a second
    # entry under the same source column would clobber theirs).
    pay = dict(payload)
    match_alias = pay.get(right_ts)
    if match_alias is None:
        pay[right_ts] = match_alias = "__match_ts"
    b = asof_join(
        lid, right, on=on, right_on=right_on, left_ts=left_ts,
        right_ts=right_ts, payload=pay, direction="backward",
    ).select(
        "__lid",
        F.col(match_alias).alias("__b_ts"),
        *[F.col(dst).alias(f"__b_{dst}") for dst in payload.values()],
    )
    f = asof_join(
        lid, right, on=on, right_on=right_on, left_ts=left_ts,
        right_ts=right_ts, payload=pay, direction="forward",
    ).select(
        "__lid",
        F.col(match_alias).alias("__f_ts"),
        *[F.col(dst).alias(f"__f_{dst}") for dst in payload.values()],
    )
    j = lid.join(b, "__lid", "left").join(f, "__lid", "left")
    lts = F.col(left_ts)
    d_b = F.unix_micros(lts) - F.unix_micros(F.col("__b_ts"))
    d_f = F.unix_micros(F.col("__f_ts")) - F.unix_micros(lts)
    use_b = F.col("__f_ts").isNull() | (
        F.col("__b_ts").isNotNull() & (d_b <= d_f)
    )
    out_cols = [
        F.when(use_b, F.col(f"__b_{dst}")).otherwise(F.col(f"__f_{dst}")).alias(dst)
        for dst in payload.values()
    ]
    return j.select(*left.columns, *out_cols)
