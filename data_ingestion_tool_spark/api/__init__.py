from .models import ColumnSelection, ConnectionInfo, build_export_dataframe
from .service import (
    ApiError,
    connect,
    export_flatfile,
    get_columns,
    health,
    import_flatfile,
)

__all__ = [
    "ApiError",
    "ColumnSelection",
    "ConnectionInfo",
    "build_export_dataframe",
    "connect",
    "export_flatfile",
    "get_columns",
    "health",
    "import_flatfile",
]
