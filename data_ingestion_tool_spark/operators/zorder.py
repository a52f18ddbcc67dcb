"""Z-order (Morton-curve) layout — multi-column data clustering so
parquet min/max stats prune on EVERY clustered column, not just the
first sort key.

A plain ``ORDER BY a, b`` write clusters perfectly on ``a`` but leaves
``b`` spread across the full range in every file — a filter on ``b``
prunes nothing. Interleaving the bits of (a, b) into one Morton key and
range-partition-sorting by it gives every file a tight bounding BOX in
(a, b) space: point/range predicates on EITHER column skip most files
via footer stats, before any row is read. This is the lakehouse
OPTIMIZE ZORDER BY primitive (Delta/Iceberg), built here from stock
Spark: normalize → bit-interleave (pure codegen bitwise ops) →
``repartitionByRange`` + ``sortWithinPartitions`` → write.

Normalization is min-max to ``bits``-bit integer ranks via a ONE-ROW
broadcast of per-column bounds (no global sort, no sampling pass
beyond the bounds aggregate). Monotone min-max keeps order, which is
all a space-filling curve needs; heavy skew would want quantile ranks
instead (the hook is the ``ranked`` expression — swap in ntile ranks
when the distribution demands it).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(ranks: list[Column], bits: int = 16) -> Column:
    """Interleave ``bits``-bit integer rank columns into one Morton
    key: bit i of column j lands at position i*ncols + j. Pure bitwise
    expressions — whole-stage-codegen, no UDF."""
    ncols = len(ranks)
    parts = [
        F.shiftleft(
            F.shiftright(r, i).bitwiseAND(F.lit(1)).cast("long"),
            i * ncols + j,
        )
        for j, r in enumerate(ranks)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts).alias("__zkey")


def zorder_write(
    df: DataFrame,
    cols: list[str],
    dest_path: str,
    *,
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Write ``df`` to ``dest_path`` Z-ordered on ``cols``: each output
    file covers a tight bounding box in the clustered dimensions, so
    parquet footer stats prune reads on any of them. The bounds
    aggregate is one row, broadcast into the rank expressions."""
    if len(cols) < 2:
        raise ValueError("zorder needs >=2 columns (one column: just sort)")
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"__mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__mx_{c}") for c in cols],
    )
    top = (1 << bits) - 1
    with_bounds = df.crossJoin(F.broadcast(bounds))
    ranks = [
        F.least(
            F.lit(top),
            F.floor(
                (F.col(c).cast("double") - F.col(f"__mn_{c}"))
                / F.greatest(
                    F.col(f"__mx_{c}") - F.col(f"__mn_{c}"), F.lit(1e-12)
                )
                * top
            ).cast("long"),
        )
        for c in cols
    ]
    keyed = with_bounds.withColumn("__zkey", morton_key(ranks, bits))
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop(
            "__zkey",
            *[f"__mn_{c}" for c in cols],
            *[f"__mx_{c}" for c in cols],
        )
        .write.mode("overwrite")
        .parquet(dest_path)
    )
