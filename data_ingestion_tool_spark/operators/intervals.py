"""Time-bucketed interval join — the scale-safe plan for "points inside
intervals" when there is NO equi-key to hash-partition on.

A naive ``a.start <= b.ts AND b.ts <= a.end`` join with no equality
component plans as a broadcast nested loop (or worse, a cartesian) —
every (interval, point) pair is tested, O(n·m) at 100 TB. Bucketing
restores an equi-key from time itself:

1. each interval is exploded onto EVERY bucket its [start, end] span
   touches (``sequence(bucket(start), bucket(end))`` — correctness
   never depends on the width; an interval spanning k buckets lands in
   all k);
2. each point lands in exactly one bucket;
3. hash-join on the bucket id, then apply the exact range predicate as
   the join residual.

Every true match shares a bucket, so recall is exact by construction.
``bucket_width_s`` is a PERFORMANCE knob: fan-out per interval is
``len/width + 1`` (pick width ~ the typical interval length so most
intervals touch 1-2 buckets), and join degree is rows-per-bucket (time
locality), not corpus size — the same shuffle shape as any equi-join,
AQE-skew-splittable if one time bucket runs hot.

No counterpart in the reference (`backend/main.py` has no temporal
ops); this is the standard time-series/observability primitive
("events near an incident", "readings during a deployment window").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_of(ts: Column, width_s: int) -> Column:
    return F.floor(F.unix_timestamp(ts) / width_s).cast("long")


def bucketed_interval_join(
    intervals: DataFrame,
    points: DataFrame,
    *,
    start: str,
    end: str,
    point_ts: str,
    bucket_width_s: int,
    how: str = "inner",
) -> DataFrame:
    """Join every ``points`` row whose ``point_ts`` falls in
    ``[start, end]`` (inclusive) of an ``intervals`` row, via time
    buckets of ``bucket_width_s`` seconds. Column names must not
    collide across the two frames. ``how`` is ``inner`` or ``left``
    (left keeps intervals with no points, NULL point columns).

    The operator is fully lazy — no driver-side jobs; see the module
    docstring for the width-vs-fan-out trade."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if bucket_width_s <= 0:
        raise ValueError(f"bucket_width_s must be positive, got {bucket_width_s}")
    clash = set(intervals.columns) & set(points.columns)
    if clash:
        raise ValueError(f"column names collide across frames: {sorted(clash)}")

    pt = points.withColumn("__bkt", _bucket_of(F.col(point_ts), bucket_width_s))
    # surrogate id so `left` can recover intervals that matched nothing;
    # inner ignores it. monotonically_increasing_id is partition-stable,
    # which is all the anti-join needs.
    iv_id = intervals.withColumn("__iid", F.monotonically_increasing_id())
    ivx = iv_id.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                _bucket_of(F.col(start), bucket_width_s),
                _bucket_of(F.col(end), bucket_width_s),
            )
        ),
    )
    m = ivx.join(pt, "__bkt").filter(
        (F.col(point_ts) >= F.col(start)) & (F.col(point_ts) <= F.col(end))
    )
    if how == "inner":
        return m.drop("__bkt", "__iid")
    unmatched = iv_id.join(m.select("__iid").distinct(), "__iid", "left_anti")
    for c, t in points.dtypes:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(t))
    return m.drop("__bkt", "__iid").unionByName(unmatched.drop("__iid"))
