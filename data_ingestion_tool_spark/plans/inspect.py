"""Physical-plan introspection — the engine's scale-readiness checks.

The reference has no planner (its whole "planning" is SQL string
concatenation, `/root/reference/backend/main.py:176-180`); in this
engine Catalyst owns planning, and these helpers make its decisions
*testable*: predicate pushdown reached the parquet scan, column pruning
shrank ReadSchema, a dimension join broadcast instead of shuffling, a
comma-join was recovered to an equi-join rather than a cartesian
product, and the hot path stayed inside whole-stage codegen.

Used by ``tests/test_plans.py`` — every flagship plan property that
matters at 100 TB is pinned there, so a regression that silently turns
a broadcast join into a cartesian product fails CI instead of a
1000-executor cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The ``explain('formatted')`` text of the optimized physical plan."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings of every file scan (column pruning)."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", formatted_plan(df))


def scan_columns(df: DataFrame) -> set[str]:
    """Union of column names actually read from files."""
    cols: set[str] = set()
    for s in read_schemas(df):
        cols.update(re.findall(r"(\w+):", s))
    return cols


def join_strategies(df: DataFrame) -> list[str]:
    """Physical join node names in plan order."""
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        simple_plan(df),
    )


def has_cartesian_product(df: DataFrame) -> bool:
    return "CartesianProduct" in simple_plan(df)


def codegen_subtree_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees (``explain('codegen')``).

    >0 means the hot path compiles to fused JVM bytecode; 0 means the
    plan fell off codegen entirely (e.g. everything inside a Python UDF).
    """
    text = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    return int(m.group(1)) if m else 0


def executed_plan(df: DataFrame) -> str:
    """The FINAL adaptive physical plan, after running the query.

    `formatted_plan` shows the static plan AQE starts from; the
    decisions that matter at scale (broadcast demotion/promotion, skew
    split, partition coalescing) are made at runtime per shuffle stage.
    Executing through the Dataset's own QueryExecution finalizes its
    AdaptiveSparkPlan, so the returned string carries
    ``isFinalPlan=true`` plus the re-planned operators (AQEShuffleRead,
    ``skew=true`` SMJ variants...). Collects — call on bounded results
    only (tests).
    """
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when the plan contains a map-side (partial) HashAggregate —
    the pre-shuffle combine that keeps a 100 TB groupBy's shuffle small."""
    return "partial_" in formatted_plan(df)


def single_task_global_windows(df: DataFrame) -> int:
    """Count Window nodes that funnel UNAGGREGATED data through one
    task — the ``Window [ORDER BY ...]`` (no PARTITION BY) scale wall.

    Detected as the physical shape ``Window → Sort → Exchange
    SinglePartition → <non-aggregate child>``. A single-partition
    window whose exchange child IS an aggregate (e.g. the ≤P-row
    offsets frame in operators/ranking.py, or a per-group rollup) is
    allowed: those frames are bounded by group/partition cardinality,
    not data volume.
    """
    lines = simple_plan(df).splitlines()
    hits = 0
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        above = lines[max(0, i - 2) : i]
        if not any("Sort" in a for a in above):
            continue
        if not any("Window" in a for a in above):
            continue
        child = lines[i + 1] if i + 1 < len(lines) else ""
        if "Aggregate" in child:
            continue
        hits += 1
    return hits


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (broadcast excluded).

    The scale currency: every Exchange is a full network repartition of
    its input. Plans should reuse one partitioning across window +
    groupBy stages instead of re-shuffling.
    """
    return len(re.findall(r"(?<!Broadcast)Exchange", simple_plan(df)))
