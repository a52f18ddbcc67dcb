"""Statistical / profiling queries: histograms, order-statistic
quantiles + IQR outliers, per-group mode, percent ranks, Markov event
transitions, lag-1 autocorrelation, EWMA smoothing, and a blocked
fuzzy (edit-distance) self-join.

These are the column/series-statistics questions a data-quality or
feature-engineering pass asks of a 100 TB lake; the reference's scope
is the ingest bridge (`backend/main.py`), so these extend SURVEY §2.B
the same way the event-analytics family does.

Determinism strategy (CLAUDE.md rules, applied):
- every quantity that feeds a comparison or a hash is integer math
  (cents via DECIMAL(18,2)→BIGINT) or an identical-expression double on
  both engines (quotients/products of identical integers are bit-equal
  under IEEE round-to-nearest);
- order statistics are value-at-index (type-1 quantile), never
  interpolated — engines disagree on percentile_cont interpolation
  order, but "the k-th smallest value" is exact;
- integer division: operands are kept non-negative, where Spark's
  ``DIV`` (truncating) and DuckDB's ``//`` (flooring) agree;
- the EWMA fold is a left fold in (ts, event_id) order on both engines
  with the identical recurrence, rounded to 9 decimals (composed float).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet_io import read_events, read_table
from .registry import query
from ..plans.pin import pin