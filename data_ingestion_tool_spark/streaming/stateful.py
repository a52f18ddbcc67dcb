"""Custom stateful streaming operators via ``applyInPandasWithState``.

The arbitrary-stateful escape hatch for operators the built-in windowed
aggregations can't express: per-key state lives in the streaming state
store, updates arrive as Arrow batches per key, and the operator decides
what to emit each micro-batch. At cluster scale the state is partitioned
by grouping key across executors and checkpointed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_MAX_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("max_value", DoubleType()),
        StructField("n_seen", LongType()),
    ]
)
RUNNING_MAX_STATE = StructType(
    [StructField("max_value", DoubleType()), StructField("n_seen", LongType())]
)


def running_max_per_key(
    stream: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Running (max, count) per key with explicit state — the canonical
    custom stateful operator shape."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        mx, n = state.get if state.exists else (float("-inf"), 0)
        for pdf in pdfs:
            vals = pdf[value_col]
            if len(vals):
                mx = max(mx, float(vals.max()))
                n += int(len(vals))
        state.update((mx, n))
        yield pd.DataFrame(
            {"user_id": [key[0]], "max_value": [mx], "n_seen": [n]}
        )

    return (
        stream.select(key_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_MAX_OUTPUT,
            stateStructType=RUNNING_MAX_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


CUSUM_STATE = "acc_hi double, acc_lo double, n bigint"
CUSUM_OUTPUT = (
    "user_id bigint, n_events bigint, cusum_hi double, cusum_lo double"
)


def cusum_per_key(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    order_col: str = "event_id",
    allowance: float = 5.0,
) -> DataFrame:
    """Streaming CUSUM change-point state per key: S⁺ = max(0, S⁺ + x − k),
    S⁻ = min(0, S⁻ − x + k), carried in the state store across
    micro-batches. Rows are sorted by (ts, order_col) WITHIN each
    micro-batch; cross-batch correctness assumes in-order arrival (the
    standard contract for sequential detectors on streams — a
    watermark-buffered reorder stage would relax it)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        hi, lo, n = state.get if state.exists else (0.0, 0.0, 0)
        parts = [pdf for pdf in pdfs if len(pdf)]
        if parts:
            batch = pd.concat(parts).sort_values([ts_col, order_col])
            for v in batch[value_col].to_numpy():
                hi = max(0.0, hi + float(v) - allowance)
                lo = min(0.0, lo - float(v) + allowance)
            n += int(len(batch))
        state.update((hi, lo, n))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "cusum_hi": [hi],
                "cusum_lo": [lo],
            }
        )

    return (
        stream.select(key_col, value_col, ts_col, order_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=CUSUM_OUTPUT,
            stateStructType=CUSUM_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
