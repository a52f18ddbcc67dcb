"""Engine function library.

Column-expression functions live in ``operators`` (text, similarity,
dedup signatures); this package adds the SQL-callable surface.
"""

from .register import SQL_FUNCTIONS, register_sql_functions

__all__ = ["SQL_FUNCTIONS", "register_sql_functions"]
