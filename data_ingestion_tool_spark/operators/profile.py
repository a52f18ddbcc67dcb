"""Table profiling — the data-quality gate an ingest pipeline runs
before trusting a load.

No counterpart in the reference (its ingest loads blind,
`backend/main.py:258-286`); this is the validation layer a switcher
gets on top: per-column completeness (nulls), cardinality (distinct),
and range (min/max), computed in ONE pass over the table.

Scale shape: a single aggregate job — every per-column metric is one
aggregate expression in the same `agg()`, so a 100 TB table is scanned
once with map-side partial aggregation, not once per column.

Cardinality is ``approx_count_distinct`` (HyperLogLog++) by DEFAULT:
exact ``count_distinct`` over k columns makes Catalyst plan an Expand
that replicates every input row once per distinct aggregate (~k× the
shuffle volume) and shuffles every distinct value of every column —
at 100 TB that is k full-table shuffles for a "profiling pass". The
HLL sketch is one pass, fixed width (no Expand, no extra shuffle), at
a configurable relative error (default rsd=0.02, i.e. ~2% typical
error). Pass ``exact_distinct=True`` only when exact cardinality is
worth k× the I/O (small tables, oracle checks, uniqueness audits).

Output is long-format (one row per column) so downstream expectation
checks are plain filters over a tiny frame.

Numeric ranges are reported as doubles and string ranges as strings
(separate columns) — cross-engine double→string formatting is NOT
stable, so the profile never stringifies numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    exact_distinct: bool = False,
    rsd: float = 0.02,
) -> DataFrame:
    """Long-format profile: (col_name, n_rows, n_nulls, n_distinct,
    min_num, max_num, min_str, max_str) — one row per profiled column,
    one scan total. Decimal columns profile through double; other
    non-numeric, non-string types (dates, timestamps) profile counts
    only (range columns NULL) to stay engine-portable.

    ``n_distinct`` is HLL-approximate by default (see module docstring
    for the Expand-cost rationale); ``exact_distinct=True`` opts into
    exact ``count_distinct`` (k× shuffle volume for k columns — fine on
    small/medium tables, not for a 100 TB profiling pass). ``rsd`` is
    the HLL maximum relative standard deviation (ignored when exact).
    """
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
        if exact_distinct:
            aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c), rsd).alias(f"__nd_{c}"))
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

    The profile job runs exactly ONCE: the single row for ``column`` is
    collected here, the conditions are evaluated in Python against it,
    and the returned frame is rebuilt from that row via
    ``createDataFrame`` — so counting/collecting the result does NOT
    re-trigger the profile scan (it would otherwise re-run the full
    one-pass aggregate per evaluation).

    ``unique`` compares ``n_distinct + n_nulls`` against ``n_rows`` —
    on a default (HLL-approximate) profile this check is approximate
    too; build the profile with ``exact_distinct=True`` for uniqueness
    audits.

    Misconfigured expectations fail LOUDLY instead of passing: a column
    absent from the profile (typo, not in the profiled ``cols``) raises,
    and a numeric-range expectation on a column with no numeric range
    (string/temporal or all-NULL) raises — an empty violations frame
    must always mean the data was actually checked."""
    rows = profile.filter(F.col("col_name") == column).collect()
    if not rows:
        raise ValueError(
            f"expect: column {column!r} is not in the profile — "
            "check the name and the profiled cols list"
        )
    r = rows[0]
    if (min_num is not None or max_num is not None) and (
        r.min_num is None or r.max_num is None
    ):
        raise ValueError(
            f"expect: column {column!r} has no numeric range in the "
            "profile (non-numeric or all-NULL) — a min_num/max_num "
            "expectation cannot be checked"
        )
    violated = False
    if max_null_fraction is not None and r.n_rows:
        violated = violated or (r.n_nulls / r.n_rows > max_null_fraction)
    if unique:
        violated = violated or (r.n_distinct + r.n_nulls < r.n_rows)
    if min_num is not None:
        violated = violated or (r.min_num < min_num)
    if max_num is not None:
        violated = violated or (r.max_num > max_num)
    spark = profile.sparkSession
    return spark.createDataFrame([r] if violated else [], profile.schema)


def observed_write_metrics(
    df,
    dest: str,
    *,
    count_cols: tuple[str, ...] = (),
    sum_cents_col: str | None = None,
):
    """Write ``df`` to parquet while piggybacking validation metrics on
    the SAME job via the Observation API — the zero-extra-scan version
    of "count it after you load it" (the reference re-counts the table
    after ingest, `backend/main.py:289-291`; at 100 TB a second scan
    for a row count is a real bill).

    Returns ``(metrics_dict)`` with ``n_rows``, per-column non-null
    counts (``n_<col>``) and, if requested, an exact integer cents sum
    of ``sum_cents_col`` — all computed by the executors as rows flow
    into the files.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in count_cols:
        aggs.append(F.count(F.col(c)).alias(f"n_{c}"))
    if sum_cents_col is not None:
        aggs.append(
            F.sum(
                F.expr(
                    f"CAST(CAST({sum_cents_col} AS DECIMAL(18,2)) * 100 AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("sum_cents")
        )
    obs = Observation("ingest_metrics")
    df.observe(obs, *aggs).write.mode("overwrite").parquet(dest)
    return dict(obs.get)
