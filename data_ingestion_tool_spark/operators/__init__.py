"""Operator library: dedup, similarity search, text analysis, multimodal.

These are the north-star extensions (`/root/repo/BASELINE.json`) beyond
the reference's ingest/export surface — the operations a large-scale
training-data pipeline needs. All hot paths stay JVM-side
(`pyspark.sql.functions`); Python appears only as Arrow-batched Pandas
UDFs where built-ins genuinely can't express the semantics.
"""
