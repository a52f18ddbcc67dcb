from .inspect import (
    codegen_subtree_count,
    exchange_count,
    executed_plan,
    formatted_plan,
    has_cartesian_product,
    has_partial_aggregation,
    join_strategies,
    pushed_filters,
    read_schemas,
    scan_columns,
    simple_plan,
    single_task_global_windows,
)

__all__ = [
    "codegen_subtree_count",
    "exchange_count",
    "executed_plan",
    "formatted_plan",
    "has_cartesian_product",
    "has_partial_aggregation",
    "join_strategies",
    "pushed_filters",
    "read_schemas",
    "scan_columns",
    "simple_plan",
    "single_task_global_windows",
]
