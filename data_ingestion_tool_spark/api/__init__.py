from .models import ColumnSelection, ConnectionInfo, build_export_dataframe

__all__ = ["ColumnSelection", "ConnectionInfo", "build_export_dataframe"]
