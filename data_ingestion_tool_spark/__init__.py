"""data_ingestion_tool_spark — a PySpark-native analytics engine with the
capability surface of `Lakshit15/data-ingestion-tool` (reference at
/root/reference), extended with the LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) and
designed for 100 TB scale.

Blueprint: /root/repo/SURVEY.md. The declared, driver-verified query
inventory lives in :mod:`data_ingestion_tool_spark.queries`.
"""

from .session import apply_session_defaults, get_spark

__all__ = ["apply_session_defaults", "get_spark"]

__version__ = "0.1.0"
