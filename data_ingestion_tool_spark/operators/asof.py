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
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
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
        F.struct(
            *[F.col(src).alias(dst) for src, dst in payload.items()]
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
    return filled.filter(F.col("__side") == 1).select(
        *left.columns,
        *[F.col(f"__m.{dst}").alias(dst) for dst in payload.values()],
    )
