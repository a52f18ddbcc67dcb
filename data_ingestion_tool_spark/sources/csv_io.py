"""CSV source/sink with reference-compatible semantics.

Reference behavior being re-expressed (all cites into
`/root/reference/backend/main.py`):

- Ingest reads with ``pd.read_csv(..., delimiter=d, dtype=str,
  na_filter=False)`` (main.py:234-239): every column is a string and an
  empty cell stays ``''`` — never NULL. Spark's CSV reader maps empty to
  null by default, so compat mode pins ``inferSchema=False`` and maps
  nulls back to ``''`` post-read (Spark 4 treats an unquoted empty field
  as null regardless of ``emptyValue``).
- Only ``.csv`` / ``.txt`` uploads are accepted (main.py:227-231).
- Export emits UTF-8 **with BOM** (``encoding='utf-8-sig'``,
  main.py:194), header row = exactly the selected column list, no index.

Scale note: :func:`read_csv_compat`/:func:`read_csv_inferred` are
distributed scans (executors read splits — the reference's
whole-file-into-backend-memory at main.py:233 is gone).
:func:`export_csv_string` intentionally collects (it reproduces the
reference's inline-response API for small results); :func:`write_csv` is
the scale path.
"""

from __future__ import annotations

import io

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ALLOWED_UPLOAD_EXTENSIONS = (".csv", ".txt")


def validate_upload_extension(filename: str) -> None:
    """Extension gate, reference main.py:227-231."""
    if not filename.lower().endswith(ALLOWED_UPLOAD_EXTENSIONS):
        raise ValueError("Only CSV and TXT files are supported")


def read_csv_compat(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    header: bool = True,
    multiline: bool = False,
) -> DataFrame:
    """All-string read; empty cells are ``''``, never NULL (compat with
    ``dtype=str, na_filter=False``).

    Quoting is RFC-4180 (``""`` inside a quoted field = one ``"``),
    matching pandas' reader in the reference (main.py:234) -- Spark's
    default backslash escape would mis-read doubled quotes.

    ``multiline=True`` additionally accepts quoted embedded newlines --
    but makes files UNSPLITTABLE (one task per file, no intra-file
    parallelism), so it's opt-in: the API-compat upload path uses it
    (single bounded file), the 100 TB scan path must not.

    Known limitation: NUL bytes (``\\x00``) inside QUOTED fields are
    stripped by Spark's uniVocity parser ('\\0' is its internal
    "no character" sentinel; no read option disables that). Unquoted
    NULs survive. Data with embedded NULs should use parquet/JSON.
    """
    df = (
        spark.read.option("header", header)
        .option("sep", delimiter)
        .option("inferSchema", False)
        .option("nullValue", "\u0000NEVER\u0000")  # nothing maps to null
        .option("emptyValue", "")
        .option("escape", '"')
        .option("multiLine", multiline)
        .csv(path)
    )
    # Spark still yields null for truly-missing trailing fields; pin ''.
    return df.select(
        *[F.coalesce(F.col(c).cast("string"), F.lit("")).alias(c) for c in df.columns]
    )


def read_csv_inferred(
    spark: SparkSession, path: str, delimiter: str = ",", header: bool = True
) -> DataFrame:
    """Real schema inference — what the reference's dead pandas→CH
    type-mapping (main.py:250-256) intended."""
    return (
        spark.read.option("header", header)
        .option("sep", delimiter)
        .option("inferSchema", True)
        .option("escape", '"')
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, delimiter: str = ",") -> None:
    """Distributed CSV sink (the 100 TB path — one file per task).
    Writes RFC-4180 quote doubling so round-trips through
    :func:`read_csv_compat` (and pandas/DuckDB readers) are lossless."""
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("sep", delimiter)
        .option("escape", '"')
        # Spark's CSV *writer* trims cell whitespace by default --
        # pandas' to_csv (the reference exporter) does not; be lossless
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(path)
    )


def export_csv_string(df: DataFrame, columns: list[str] | None = None) -> str:
    """API-compatible inline export: UTF-8 with BOM, header = selected
    columns, no index (reference main.py:193-194). Collects — use only
    for bounded results, like the reference's inline JSON responses."""
    pdf = df.select(*columns).toPandas() if columns else df.toPandas()
    buf = io.StringIO()
    pdf.to_csv(buf, index=False)
    return "\ufeff" + buf.getvalue()
