"""The engine's declared query inventory (SURVEY.md §2.B).

Every operator the engine claims is registered here twice:

- ``QUERIES[name]``: a callable ``(spark, sf_dir) -> DataFrame`` built
  with the DataFrame API (the engine's native surface);
- ``ORACLES[name]``: the equivalent ANSI SQL for the DuckDB differential
  oracle (omitted only for genuinely non-SQL-expressible operators,
  which the driver checks rows-only).

Column names are aliased identically on both sides — the driver's
compare sorts columns by name before hashing values.

Determinism rules used throughout (SURVEY.md §2.B notes):
- double aggregates go through ``DECIMAL(18,s)`` so the sum is exact and
  order-independent, then cast back to double (identical on both
  engines; a raw double sum differs in final ulps with partition order);
- every window/top-k ``ORDER BY`` carries a unique-key tie-break;
- integer-ish function results (length, year, row_number, ...) are cast
  to bigint on both sides so schemas agree.
"""

from .registry import ORACLES, QUERIES, query
from . import relational  # noqa: F401  (registers itself)
from . import sources_sinks  # noqa: F401
from . import text  # noqa: F401
from . import dedup  # noqa: F401
from . import similarity  # noqa: F401
from . import streaming  # noqa: F401
from . import multimodal  # noqa: F401
from . import advanced  # noqa: F401
from . import temporal  # noqa: F401
from . import tpch  # noqa: F401
from . import sql_surface  # noqa: F401
from . import analytics  # noqa: F401
from . import statistics  # noqa: F401
from . import mixing  # noqa: F401
from . import sketches  # noqa: F401  (last: window rotation favors older unverified keys)

__all__ = ["ORACLES", "QUERIES", "query"]
