"""Sources — the lift of the reference's file-scan surface (S1/S5,
``/root/reference/src/vision_parse/parser.py:152-165``).

At production scale the input is an Iceberg table
(``spark.read.format("iceberg").load(...)``); in this sandbox the
same shape is read from parquet.  ``documents_as_transcripts`` adapts
the driver's ``documents`` testdata table to the transcripts shape so
the flagship pipeline can run against it (FIXTURES.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_transcripts(spark: SparkSession, source: str) -> DataFrame:
    """Read a transcripts table.  ``source`` is an Iceberg table name
    (``db.table``) when an Iceberg catalog is configured, else a
    parquet path."""
    if "/" not in source and "." in source:
        try:
            return spark.read.format("iceberg").load(source)
        except Exception:
            pass  # no Iceberg catalog in this sandbox — parquet fallback
    return spark.read.parquet(source)


def documents_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map the driver's documents table to the transcripts shape:
    conv = source, turn_idx = rank of doc_id within source.

    The window is per-``source`` (20 small groups) — at real scale this
    mapping wouldn't exist (transcripts arrive keyed); it is test
    plumbing only.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = Window.partitionBy("source").orderBy("doc_id")
    return docs.select(
        F.col("source").alias("conv_id"),
        (F.row_number().over(w) - F.lit(1)).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit("").alias("tool"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
    )
