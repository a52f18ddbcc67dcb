"""Request models + query builder mirroring the reference API surface.

The reference's four endpoints take two pydantic models
(`/root/reference/backend/main.py:38-62`):

- ``ClickHouseConnection{host, port, database, username, password}`` with
  a host regex ``^[\\w\\.-]+$`` (main.py:46-50). In a Spark engine the
  connection collapses into the shared SparkSession, but we keep the
  model + validation for API-compatible errors.
- ``ColumnSelection{table, columns(min 1), join_tables?, join_condition?}``
  with identifier regex ``^[a-zA-Z_][a-zA-Z0-9_]*$`` on every table name
  (main.py:52-62).

The reference then *string-concatenates SQL* (main.py:176-180):
``SELECT cols FROM t`` or ``SELECT cols FROM t1, t2, ... WHERE cond``.
:func:`build_export_dataframe` re-expresses that as a DataFrame plan —
``crossJoin`` + ``filter(expr(cond))`` — which Catalyst rewrites to a
broadcast/sort-merge equi-join whenever the opaque condition contains
equality predicates, so the faithful comma-join semantics cost nothing
at scale. The reference's injection surface (raw column/condition
interpolation, main.py:176,180) disappears: columns go through
``F.col`` and the condition through ``F.expr`` on registered views only.
Plain dataclasses carry the same validation semantics as the reference's
pydantic models without adding the dependency to the engine core.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HOST_RE = re.compile(r"^[\w\.-]+$")  # main.py:46-50
IDENT_RE = re.compile(r"^[a-zA-Z_][a-zA-Z0-9_]*$")  # main.py:58-62


@dataclass
class ConnectionInfo:
    host: str = "localhost"
    port: int = 8123
    database: str = "default"
    username: str = "default"
    password: str = ""

    def __post_init__(self) -> None:
        if not HOST_RE.match(self.host):
            raise ValueError("Invalid host format")

    @property
    def pool_key(self) -> str:
        # Reference caches clients by host:port:db:user — password
        # deliberately excluded (main.py:68).
        return f"{self.host}:{self.port}:{self.database}:{self.username}"


@dataclass
class ColumnSelection:
    table: str
    columns: list[str]
    join_tables: list[str] | None = None
    join_condition: str | None = None

    def __post_init__(self) -> None:
        if not self.columns:
            raise ValueError("At least one column must be selected")  # main.py:54
        for t in [self.table, *(self.join_tables or [])]:
            if not IDENT_RE.match(t):
                raise ValueError(f"Invalid table name: {t}")


def build_export_dataframe(spark: SparkSession, sel: ColumnSelection) -> DataFrame:
    """The reference's only 'planner' (main.py:174-180), as a DataFrame.

    Single table → scan + projection (R3). With ``join_tables`` AND
    ``join_condition`` → comma-join + WHERE (R4): cross join reduced by
    the opaque predicate. Mirrors the reference's quirk that setting
    only one of the two silently falls back to the single-table branch.
    """
    if sel.join_tables and sel.join_condition:
        df = spark.table(sel.table)
        for t in sel.join_tables:
            df = df.crossJoin(spark.table(t))
        df = df.filter(F.expr(sel.join_condition))
    else:
        df = spark.table(sel.table)
    return df.select(*[F.col(c) for c in sel.columns])
