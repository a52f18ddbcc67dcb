"""Table profiling — the data-quality gate an ingest pipeline runs
before trusting a load.

No counterpart in the reference (its ingest loads blind,
`backend/main.py:258-286`); this is the validation layer a switcher
gets on top: per-column completeness (nulls), cardinality (distinct),
and range (min/max), computed in ONE pass over the table.

Scale shape: a single aggregate job — every per-column metric is one
aggregate expression in the same `agg()`, so a 100 TB table is scanned
once with map-side partial aggregation, not once per column. Output is
long-format (one row per column) so downstream expectation checks are
plain filters over a tiny frame.

Numeric ranges are reported as doubles and string ranges as strings
(separate columns) — cross-engine double→string formatting is NOT
stable, so the profile never stringifies numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Long-format profile: (col_name, n_rows, n_nulls, n_distinct,
    min_num, max_num, min_str, max_str) — one row per profiled column,
    one scan total. Decimal columns profile through double; other
    non-numeric, non-string types (dates, timestamps) profile counts
    only (range columns NULL) to stay engine-portable."""
    names = cols or df.columns
    dtypes = dict(df.dtypes)
    kind = {
        c: (
            "num"
            if dtypes[c] in _NUMERIC or dtypes[c].startswith("decimal")
            else "str" if dtypes[c] == "string" else "other"
        )
        for c in names
    }
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in names:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
        if kind[c] == "num":
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__mn_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__mx_{c}"))
        elif kind[c] == "str":
            aggs.append(F.min(F.col(c)).alias(f"__mns_{c}"))
            aggs.append(F.max(F.col(c)).alias(f"__mxs_{c}"))
    wide = df.agg(*aggs)

    rows = []
    for c in names:
        is_num = kind[c] == "num"
        is_str = kind[c] == "str"
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n_rows").cast("bigint").alias("n_rows"),
                F.col(f"__nn_{c}").cast("bigint").alias("n_nulls"),
                F.col(f"__nd_{c}").cast("bigint").alias("n_distinct"),
                (F.col(f"__mn_{c}") if is_num else F.lit(None).cast("double")).alias(
                    "min_num"
                ),
                (F.col(f"__mx_{c}") if is_num else F.lit(None).cast("double")).alias(
                    "max_num"
                ),
                (
                    F.col(f"__mns_{c}") if is_str
                    else F.lit(None).cast("string")
                ).alias("min_str"),
                (
                    F.col(f"__mxs_{c}") if is_str
                    else F.lit(None).cast("string")
                ).alias("max_str"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def expect(
    profile: DataFrame,
    column: str,
    *,
    max_null_fraction: float | None = None,
    unique: bool = False,
    min_num: float | None = None,
    max_num: float | None = None,
) -> DataFrame:
    """Expectation check over a :func:`profile_table` result: returns
    the (tiny) frame of VIOLATIONS — empty means the expectation holds.
    Runs driver-light: the profile is one row per column already.

    Misconfigured expectations fail LOUDLY instead of passing: a column
    absent from the profile (typo, not in the profiled ``cols``) raises,
    and a numeric-range expectation on a column with no numeric range
    (string/temporal or all-NULL) raises — an empty violations frame
    must always mean the data was actually checked."""
    p = profile.filter(F.col("col_name") == column)
    rows = p.collect()
    if not rows:
        raise ValueError(
            f"expect: column {column!r} is not in the profile — "
            "check the name and the profiled cols list"
        )
    if (min_num is not None or max_num is not None) and (
        rows[0].min_num is None or rows[0].max_num is None
    ):
        raise ValueError(
            f"expect: column {column!r} has no numeric range in the "
            "profile (non-numeric or all-NULL) — a min_num/max_num "
            "expectation cannot be checked"
        )
    conds = []
    if max_null_fraction is not None:
        conds.append(
            F.col("n_nulls").cast("double") / F.col("n_rows") > max_null_fraction
        )
    if unique:
        conds.append(F.col("n_distinct") + F.col("n_nulls") < F.col("n_rows"))
    if min_num is not None:
        conds.append(F.col("min_num") < min_num)
    if max_num is not None:
        conds.append(F.col("max_num") > max_num)
    if not conds:
        return p.limit(0)
    bad = conds[0]
    for c in conds[1:]:
        bad = bad | c
    return p.filter(bad)
