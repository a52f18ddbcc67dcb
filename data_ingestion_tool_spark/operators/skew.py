"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE's skew-join splitting (on in session.py) handles skewed *joins* at
runtime, but nothing built-in saves a ``groupBy`` whose hot key routes
30% of a 100 TB table through one reducer. The classic fix is salting —
spread each hot key across N sub-keys, aggregate twice:

    phase 1: groupBy(key, salt)  — N-way parallel, absorbs the hot key
    phase 2: groupBy(key)        — merges N tiny partials

Salts are DETERMINISTIC (hash of a unique column, not ``rand()``) so
results are reproducible and retried tasks don't double-count — a
``rand()`` salt breaks exactly-once semantics under task retry, because
a retried map task would re-salt rows differently than the partial
aggregates already shuffled from its first attempt.

For joins where one side's hot keys are known (or AQE is unavailable),
:func:`salted_join` replicates the small side N× and salts the big side
— the general pre-AQE pattern, kept here because it also works for
aggregation-like join fan-ins AQE can't split.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deterministic_salt(unique_col: str | Column, n_salts: int) -> Column:
    c = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return F.pmod(F.hash(c), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    *,
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (input column, fn) where fn ∈
    {sum, count, min, max}. Phase-1 partials per (key, salt), phase-2
    merge per key: sum/count re-sum, min/max re-min/max. (avg would
    decompose to sum+count — compose it from those.)
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    p1 = [
        (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(src)).alias(out)
        for out, (src, fn) in aggs.items()
    ]
    partial = (
        df.withColumn("__salt", deterministic_salt(salt_from, n_salts))
        .groupBy(*keys, "__salt")
        .agg(*p1)
    )
    p2 = [
        merge_fn[fn](out).alias(out) for out, (_, fn) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*p2)


def sentinel_bypass_join(
    big: DataFrame,
    right: DataFrame,
    on: str,
    right_on: str,
    sentinel,
) -> DataFrame:
    """LEFT equi-join where rows whose key is NULL or equals
    ``sentinel`` bypass the join entirely.

    The classic fact⋈fact skew killer is a surrogate "unknown" key —
    anonymous users, unparsed ids — carried by a large fraction of the
    big fact. Those rows can never match (the sentinel has no row on
    the right), yet a plain join shuffles ALL of them onto one reducer:
    at 100 TB with a 40% sentinel share, one task gets 40 TB. Since
    their LEFT-join output is statically known (right payload = NULL),
    route them AROUND the shuffle with a union and join only real keys
    — the join's key distribution is then the organic one, no single
    partition bound to the hot key. AQE skew-split can't save this
    case as cheaply: it would still shuffle + sort the sentinel rows,
    splitting them across tasks of the same sort-merge join.

    Output columns: ``big.* + right payload`` (right columns minus its
    key). Equivalent SQL: ``big LEFT JOIN right ON on = right_on``
    (assuming the right side never carries the sentinel key — caller's
    contract, like a dimension of real users only).
    """
    if sentinel is None:
        # F.col(on) == lit(None) is NULL for every non-null key, which
        # would drop those rows from BOTH branches (filter(hot) and
        # filter(~hot) each exclude NULL conditions) — silent data loss.
        # NULL keys always ride the bypass anyway, so a None sentinel
        # adds nothing a real sentinel value doesn't.
        raise ValueError(
            "sentinel_bypass_join: sentinel must be a concrete value "
            "(NULL keys are always routed around the join)"
        )
    overlap = set(big.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"sentinel_bypass_join: column name collision {sorted(overlap)} — "
            "the equality condition would be ambiguous; alias the right "
            "side's columns first"
        )
    payload = [c for c in right.columns if c != right_on]
    hot = F.col(on).isNull() | (F.col(on) == F.lit(sentinel))
    # `hot` is never NULL: isNull() short-circuits the NULL comparison
    matched = (
        big.filter(~hot)
        .join(right, F.col(on) == F.col(right_on), "left")
        .select(*big.columns, *payload)
    )
    bypass = big.filter(hot).select(
        *big.columns,
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in payload
        ],
    )
    return matched.unionByName(bypass)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salt_from: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side deterministically,
    replicate the small side across all salts, join on (key, salt).
    The hot key's rows land on ``n_salts`` reducers instead of one;
    the small side grows N× (fine — it's small).

    Only big-side-preserving joins are supported: the small side is
    replicated N×, so 'right'/'full' would emit every unmatched
    small-side row n_salts times.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "semi",
               "left_anti", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the replicated "
            f"small side would duplicate unmatched rows; use one of "
            f"{sorted(allowed)}"
        )
    b = big.withColumn("__salt", deterministic_salt(salt_from, n_salts))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, [on, "__salt"], how).drop("__salt")
