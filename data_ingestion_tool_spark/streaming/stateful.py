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


VELOCITY_STATE = "ts_buf array<bigint>, peak bigint, n bigint"
VELOCITY_OUTPUT = "user_id bigint, peak_10min bigint, n_events bigint"


def velocity_per_key(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_s: int = 600,
) -> DataFrame:
    """Streaming velocity monitor: per key, the PEAK number of events
    inside any trailing ``window_s``-second window, carried across
    micro-batches in explicit state — the rate-limit / fraud-velocity
    operator as a stream. State = the event-second buffer still inside
    the trailing window of the newest seen event (bounded by the key's
    in-window event count, the same bound the batch RANGE frame pays)
    plus the running peak. Rows sort by epoch second within each batch;
    cross-batch correctness assumes in-order arrival per key (the CUSUM
    contract — a watermark reorder stage relaxes it).

    Batch twin: events_velocity_flags' RANGE-frame peak — inclusive
    [t − window_s, t] exactly like the frame, which is what makes the
    availableNow run oracle-checkable."""
    import numpy as np

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            buf, peak, n = state.get
            buf = list(buf)
        else:
            buf, peak, n = [], 0, 0
        secs: list[int] = []
        for pdf in pdfs:
            secs.extend(int(v) for v in pdf["sec"])
        secs.sort()
        if secs:
            all_ts = np.array(buf + secs, dtype=np.int64)
            new = np.array(secs, dtype=np.int64)
            # count in [t - window_s, t] inclusive both ends:
            # index of first element >= t - window_s .. index past t
            lo = np.searchsorted(all_ts, new - window_s, side="left")
            hi = np.searchsorted(all_ts, new, side="right")
            peak = max(peak, int((hi - lo).max()))
            n += len(secs)
            cutoff = int(all_ts.max()) - window_s
            buf = [int(t) for t in all_ts[all_ts >= cutoff]]
        state.update((buf, peak, n))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "peak_10min": [peak],
                "n_events": [n],
            }
        )

    from pyspark.sql import functions as F

    return (
        stream.select(
            key_col,
            F.expr(f"CAST(unix_micros({ts_col}) AS BIGINT) DIV 1000000")
            .alias("sec"),
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=VELOCITY_OUTPUT,
            stateStructType=VELOCITY_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def distinct_types_per_key_tws(
    stream: DataFrame, key_col: str = "user_id", type_col: str = "event_type"
) -> DataFrame:
    """Per-key DISTINCT-value tracker on the ``transformWithState``
    API (Spark 4's typed-state successor to ``applyInPandasWithState``):
    the seen-set lives in a MapState (one state-store entry per
    distinct value — set-union semantics across micro-batches, never a
    growing blob value), the event count in a ValueState.  Emits the
    running (n_distinct_types, n_events) per key each micro-batch; in
    ``update`` output mode the sink's last row per key is the final
    answer, equal to the batch COUNT(DISTINCT) — the oracle.

    Scale: state is hash-partitioned by key across the state-store
    width; per-key state size is the distinct-value cardinality (here
    bounded by the event-type domain), and MapState keys make the
    union idempotent under replay.

    DEPENDENCY GATE: the transformWithState Python worker speaks a
    protobuf state-server protocol, so executing the returned stream
    requires ``google.protobuf`` (not bundled in every environment —
    pyspark declares it only as an optional 'connect' extra).
    Constructing the plan needs nothing; tests/test_streaming_tws.py
    runs it when protobuf is importable and skips otherwise, so the
    operator stays exercised wherever the dependency exists."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class DistinctTracker(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getMapState(
                "seen", "t string", "one tinyint"
            )
            self._n = handle.getValueState("n", "n_events bigint")

        def handleInputRows(self, key, rows, timerValues):
            n = self._n.get()[0] if self._n.exists() else 0
            for pdf in rows:
                n += int(len(pdf))
                for t in pdf[type_col].drop_duplicates():
                    if not self._seen.containsKey((str(t),)):
                        self._seen.updateValue((str(t),), (1,))
            self._n.update((n,))
            n_distinct = sum(1 for _ in self._seen.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_distinct_types": [n_distinct],
                    "n_events": [n],
                }
            )

        def close(self) -> None:
            pass

    return (
        stream.select(key_col, type_col)
        .groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=DistinctTracker(),
            outputStructType=(
                "user_id bigint, n_distinct_types bigint, n_events bigint"
            ),
            outputMode="Update",
            timeMode="None",
        )
    )
