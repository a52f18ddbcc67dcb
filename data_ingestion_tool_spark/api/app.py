"""Optional FastAPI wrapper — byte-compatible routes over ``service``.

The reference is a FastAPI app (`/root/reference/backend/main.py:22-36`);
this module reproduces its route table when ``fastapi`` is installed.
The container this engine is developed in does not ship FastAPI, so the
module is import-guarded: ``create_app()`` raises a clear error if the
dependency is missing, and nothing else in the engine imports this file.

Route parity (same paths, same request models, same response dicts,
same status codes):

    POST /connect-clickhouse     → service.connect
    POST /get-columns            → service.get_columns
    POST /clickhouse-to-flatfile → service.export_flatfile
    POST /flatfile-to-clickhouse → service.import_flatfile
    GET  /health                 → service.health

CORS mirrors main.py:28-36 (localhost:3000 frontend).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import service
from .models import ColumnSelection, ConnectionInfo

try:
    from fastapi import FastAPI, File, HTTPException, UploadFile
    from fastapi.middleware.cors import CORSMiddleware
    from pydantic import BaseModel, Field

    HAVE_FASTAPI = True
except ImportError:  # pragma: no cover - container has no fastapi
    HAVE_FASTAPI = False


def create_app(spark: SparkSession):
    """Build the FastAPI app bound to ``spark``."""
    if not HAVE_FASTAPI:
        raise ImportError(
            "fastapi is not installed; the engine API is usable directly "
            "via data_ingestion_tool_spark.api.service"
        )

    class ConnectionBody(BaseModel):
        host: str = "localhost"
        port: int = 8123
        database: str = "default"
        username: str = "default"
        password: str = ""

    class SelectionBody(BaseModel):
        table: str
        columns: list[str] = Field(min_length=1)
        join_tables: list[str] | None = None
        join_condition: str | None = None

    def _conn(b: ConnectionBody) -> ConnectionInfo:
        try:
            return ConnectionInfo(b.host, b.port, b.database, b.username, b.password)
        except ValueError as e:
            raise HTTPException(400, str(e)) from e

    def _sel(b: SelectionBody) -> ColumnSelection:
        try:
            return ColumnSelection(b.table, b.columns, b.join_tables, b.join_condition)
        except ValueError as e:
            raise HTTPException(400, str(e)) from e

    app = FastAPI(
        title="ClickHouse Data Ingestion API",
        description="Bidirectional data transfer between ClickHouse and flat files",
        version="1.0.0",
    )
    app.add_middleware(
        CORSMiddleware,
        allow_origins=["http://localhost:3000"],
        allow_credentials=True,
        allow_methods=["*"],
        allow_headers=["*"],
    )

    def run(fn, *args):
        try:
            return fn(*args)
        except service.ApiError as e:
            raise HTTPException(e.status_code, e.detail) from e

    @app.post("/connect-clickhouse", response_model=dict)
    async def connect_clickhouse(conn: ConnectionBody):
        return run(service.connect, spark, _conn(conn))

    @app.post("/get-columns", response_model=dict)
    async def get_columns(conn: ConnectionBody, table: str):
        return run(service.get_columns, spark, _conn(conn), table)

    @app.post("/clickhouse-to-flatfile", response_model=dict)
    async def clickhouse_to_flatfile(conn: ConnectionBody, selection: SelectionBody):
        return run(service.export_flatfile, spark, _conn(conn), _sel(selection))

    @app.post("/flatfile-to-clickhouse", response_model=dict)
    async def flatfile_to_clickhouse(
        conn: ConnectionBody,
        file: UploadFile = File(...),
        table: str = "imported_data",
        delimiter: str = ",",
    ):
        contents = await file.read()
        return run(
            service.import_flatfile, spark, _conn(conn),
            file.filename or "", contents, table, delimiter,
        )

    @app.get("/health", response_model=dict)
    async def health_check():
        return run(service.health, spark)

    return app
